"""mapInArrow decode path (operators/multimodal.decode_stats_arrow):
bit-identical to the mapInPandas path on both codecs — the Arrow-native
variant must be a pure representation change, never a semantic one."""

import numpy as np

from crawler_spark.functions.codecs import png_encode, qdct_encode
from crawler_spark.operators.multimodal import decode_stats, decode_stats_arrow


def test_arrow_path_bit_identical(spark):
    rows = []
    for i in range(12):
        rng = np.random.default_rng(i)
        px = rng.integers(0, 255, size=(24 + i, 32 + i), dtype=np.uint8)
        if i % 2:
            rows.append((f"im-{i}", bytearray(png_encode(px)), "png"))
        else:
            rows.append((f"im-{i}", bytearray(qdct_encode(px)), "qdct"))
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    a = sorted(map(tuple, decode_stats(df).collect()))
    b = sorted(map(tuple, decode_stats_arrow(df.repartition(5)).collect()))
    assert a == b
