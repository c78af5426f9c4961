"""pHash stability report: identity is 0, distinct content separates,
and the augmentation-variant query has the right shape and bounds."""

import numpy as np

import __spark_entry__ as entry
from crawler_spark.functions.codecs import phash64, png_decode, png_encode


def test_phash_identity_and_separation():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, size=(48, 48), dtype=np.uint8)
    b = rng.integers(0, 256, size=(48, 48), dtype=np.uint8)
    ha, hb = phash64(a), phash64(b)
    assert ha == phash64(png_decode(png_encode(a)))  # lossless round trip
    assert bin(ha ^ hb).count("1") > 0  # unrelated content separates


def test_phash_stability_query_shape(spark):
    rows = {r["variant"]: r for r in entry.q_phash_stability(spark, "unused").collect()}
    assert set(rows) == {"hflip", "crop75"}
    for r in rows.values():
        assert r["n"] == 32
        assert 0.0 <= r["mean_hamming"] <= 64.0
        assert 0 <= r["max_hamming"] <= 64
        assert 0 <= r["n_within_band3"] <= 32
