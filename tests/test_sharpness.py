"""Laplacian-variance sharpness: blurred copies score strictly lower."""

import numpy as np

from crawler_spark.functions.codecs import png_encode
from crawler_spark.operators.multimodal import sharpness_scores


def _box_blur(px: np.ndarray) -> np.ndarray:
    p = px.astype(np.float64)
    v = p.copy()
    v[1:] += p[:-1]
    v[:-1] += p[1:]
    v /= 3.0
    h = v.copy()
    h[:, 1:] += v[:, :-1]
    h[:, :-1] += v[:, 1:]
    return np.clip(h / 3.0, 0, 255).astype(np.uint8)


def test_sharpness_orders_textured_blurred_flat(spark):
    rng = np.random.default_rng(11)
    textured = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
    blurred = _box_blur(textured)
    flat = np.full((24, 24), 128, dtype=np.uint8)
    images = spark.createDataFrame(
        [
            ("textured", bytearray(png_encode(textured)), "png"),
            ("blurred", bytearray(png_encode(blurred)), "png"),
            ("flat", bytearray(png_encode(flat)), "png"),
        ],
        "image_id string, bytes binary, fmt string",
    )
    got = {
        r["image_id"]: (r["sharpness"], r["is_blurry"])
        for r in sharpness_scores(images, blur_below=30.0).collect()
    }
    assert got["flat"][0] == 0.0 and got["flat"][1]
    assert got["blurred"][0] < got["textured"][0]
    assert not got["textured"][1]
    # numpy cross-check of the exact Laplacian variance
    p = textured.astype(np.float64)
    lap = (
        -4 * p[1:-1, 1:-1] + p[:-2, 1:-1] + p[2:, 1:-1]
        + p[1:-1, :-2] + p[1:-1, 2:]
    )
    assert got["textured"][0] == float(lap.var())
