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


def test_native_dims_match_decode_on_real_images(spark):
    from crawler_spark.operators.multimodal import native_image_dims

    rows = []
    for i in range(10):
        rng = np.random.default_rng(100 + i)
        px = rng.integers(0, 255, size=(20 + 3 * i, 40 + 5 * i), dtype=np.uint8)
        fmt = "png" if i % 2 else "qdct"
        enc = png_encode(px) if fmt == "png" else qdct_encode(px)
        rows.append((f"r-{i}", bytearray(enc), fmt))
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    nat = {r["image_id"]: (r["w"], r["h"]) for r in native_image_dims(df).collect()}
    dec = {r["image_id"]: (r["w"], r["h"]) for r in decode_stats(df).collect()}
    assert nat == dec
