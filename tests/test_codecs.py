"""Codec invariants: PNG lossless roundtrip; qdct PSNR >= 40 dB (input_hint)."""

import numpy as np

from crawler_spark.functions.codecs import (
    decode,
    encode,
    phash64,
    png_decode,
    png_encode,
    psnr,
    qdct_decode,
    qdct_encode,
)


def _img(seed, h=48, w=64):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def test_png_roundtrip_exact():
    for seed in range(5):
        px = _img(seed)
        assert np.array_equal(png_decode(png_encode(px)), px)


def test_qdct_psnr_over_40():
    for seed in range(5):
        px = _img(seed)
        rec = qdct_decode(qdct_encode(px))
        assert psnr(px, rec) >= 40.0
        assert rec.shape == px.shape


def test_dispatch_and_phash_stability():
    px = _img(7)
    assert np.array_equal(decode(encode(px, "png"), "png"), px)
    p1, p2 = phash64(px), phash64(px.copy())
    assert p1 == p2
    assert -(1 << 63) <= p1 < (1 << 63)
    # similar images -> same/near phash, different images -> different
    assert phash64(_img(8)) != p1
