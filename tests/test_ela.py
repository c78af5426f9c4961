"""Error-level analysis (operators/multimodal.py ela_scores):
a spliced patch with a different compression history pops the quadrant
ratio; homogeneous images stay flat."""

import numpy as np

from crawler_spark.functions.codecs import decode, encode
from crawler_spark.operators.multimodal import ela_scores


def _textured(seed, shape=(32, 32)):
    return np.random.RandomState(seed).randint(0, 256, shape).astype(np.uint8)


def test_ela_flags_spliced_quadrant(spark):
    # base: one qdct (lossy) generation everywhere -> re-compressing
    # again loses little, uniformly
    base = decode(encode(_textured(0), "qdct"), "qdct")
    # spliced: paste a NEVER-compressed patch into one quadrant — that
    # region still has its full high-frequency content and re-loses much
    # more than the rest
    spliced = base.copy()
    spliced[:16, :16] = _textured(1, (16, 16))
    clean_b = encode(base, "png")  # png is lossless: preserves history
    splice_b = encode(spliced, "png")
    df = spark.createDataFrame(
        [("clean", bytearray(clean_b), "png"), ("spliced", bytearray(splice_b), "png")],
        "image_id string, bytes binary, fmt string",
    )
    got = {r["image_id"]: r for r in ela_scores(df, ratio_above=2.0).collect()}
    assert not got["clean"]["splice_suspect"]
    assert got["spliced"]["splice_suspect"]
    assert got["spliced"]["quad_ratio"] > got["clean"]["quad_ratio"]
    # direct numpy parity for the mean on the clean image
    re_px = decode(encode(base, "qdct"), "qdct").astype(np.float64)
    expect = round(float(np.abs(base.astype(np.float64) - re_px).mean()), 4)
    assert got["clean"]["ela_mean"] == expect
