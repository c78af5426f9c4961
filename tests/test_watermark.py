"""Watermark/overlay heuristic: flags exactly the stamped images."""

import numpy as np

from crawler_spark.functions.codecs import png_encode
from crawler_spark.operators.multimodal import watermark_scores


def _gradient(h=48, w=48):
    # linear ramp: second derivative (Laplacian) is ~0 everywhere
    return np.clip(
        np.linspace(0, 200, w)[None, :] + np.linspace(0, 40, h)[:, None], 0, 255
    ).astype(np.uint8)


def _stamp_checker(px, size=12):
    out = px.copy()
    yy, xx = np.mgrid[0:size, 0:size]
    out[-size:, -size:] = ((yy + xx) % 2) * 255
    return out


def test_watermark_flags_only_stamped_corner(spark):
    rng = np.random.default_rng(7)
    clean = _gradient()
    stamped = _stamp_checker(_gradient())
    noisy = rng.integers(0, 256, size=(48, 48), dtype=np.uint8)
    flat = np.full((48, 48), 90, dtype=np.uint8)
    images = spark.createDataFrame(
        [
            ("clean", bytearray(png_encode(clean)), "png"),
            ("stamped", bytearray(png_encode(stamped)), "png"),
            ("noisy", bytearray(png_encode(noisy)), "png"),
            ("flat", bytearray(png_encode(flat)), "png"),
        ],
        "image_id string, bytes binary, fmt string",
    )
    got = {r["image_id"]: r for r in watermark_scores(images).collect()}
    assert got["stamped"]["has_overlay"]
    assert got["stamped"]["region"] == "bottom_right"
    assert not got["clean"]["has_overlay"]
    assert not got["flat"]["has_overlay"]
    # spatially-stationary texture: region ~= global, score ~= 1
    assert not got["noisy"]["has_overlay"]
    assert 0.5 < got["noisy"]["overlay_score"] < 2.0
    assert got["stamped"]["overlay_score"] > 3.0
