"""SSIM metric (functions/codecs.ssim) and the SSIM pair-verify
operator: closed-form cases, the brightness-shift property PSNR gets
wrong, and the verify stage end to end."""

import numpy as np
from pyspark.sql import functions as F

from crawler_spark.functions.codecs import encode, psnr, ssim


def _img(seed, shape=(32, 32)):
    return np.random.RandomState(seed).randint(0, 256, shape).astype(np.uint8)


def test_ssim_closed_forms():
    a = _img(0)
    assert ssim(a, a) == 1.0
    # constant images: windows have zero variance -> luminance term only
    c1 = np.full((16, 16), 100, np.uint8)
    c2 = np.full((16, 16), 110, np.uint8)
    mx, my = 100.0, 110.0
    k1 = (0.01 * 255) ** 2
    expect = (2 * mx * my + k1) / (mx * mx + my * my + k1)
    assert abs(ssim(c1, c2) - expect) < 1e-12
    # independent noise ~ 0, inversion ~ -1
    assert abs(ssim(a, _img(1))) < 0.15
    assert ssim(a, 255 - a) < -0.9


def test_ssim_vs_psnr_brightness_shift():
    """The case SSIM exists for: +25 brightness is perceptually a dup
    (SSIM high) but PSNR ~20 dB flunks the 30 dB near-dup bar."""
    a = _img(2)
    shifted = np.clip(a.astype(int) + 25, 0, 255).astype(np.uint8)
    assert psnr(a, shifted) < 25.0
    assert ssim(a, shifted) > 0.95


def test_verify_pairs_ssim_operator(spark):
    from crawler_spark.operators.multimodal import verify_pairs_ssim

    base = _img(3)
    shifted = np.clip(base.astype(int) + 25, 0, 255).astype(np.uint8)
    other = _img(4)
    small = _img(5, (16, 16))
    images = spark.createDataFrame(
        [
            ("1", bytearray(encode(base, "png")), "png"),
            ("2", bytearray(encode(shifted, "png")), "png"),
            ("3", bytearray(encode(other, "png")), "png"),
            ("4", bytearray(encode(small, "png")), "png"),
        ],
        "image_id string, bytes binary, fmt string",
    )
    pairs = spark.createDataFrame(
        [("1", "2", 3), ("1", "3", 3), ("1", "4", 3)],
        "doc_a string, doc_b string, hamming long",
    )
    out = verify_pairs_ssim(pairs, images, min_ssim=0.7).collect()
    kept = {(r["doc_a"], r["doc_b"]): r["ssim"] for r in out}
    assert ("1", "2") in kept and kept[("1", "2")] > 0.95  # shift survives
    assert ("1", "3") not in kept  # unrelated content rejected
    assert ("1", "4") not in kept  # shape mismatch rejected (-1)
    # unfiltered run agrees with the direct metric
    all_rows = {
        (r["doc_a"], r["doc_b"]): r["ssim"]
        for r in verify_pairs_ssim(pairs, images, min_ssim=-2.0).collect()
    }
    assert all_rows[("1", "2")] == round(float(ssim(base, shifted)), 4)
    assert all_rows[("1", "4")] == -1.0
