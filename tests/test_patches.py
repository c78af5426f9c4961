"""ViT patch extraction: grid shape, offsets, and pixel exactness."""

import numpy as np

from crawler_spark.functions.codecs import png_decode, png_encode
from crawler_spark.operators.multimodal import image_patches


def test_patches_pixel_exact_grid(spark):
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(40, 56), dtype=np.uint8)  # crops to 32x48
    images = spark.createDataFrame(
        [("img", bytearray(png_encode(px)), "png")],
        "image_id string, bytes binary, fmt string",
    )
    rows = image_patches(images, patch=16).collect()
    assert len(rows) == (40 // 16) * (56 // 16) == 6
    seen = set()
    for r in rows:
        seen.add((r["patch_row"], r["patch_col"]))
        assert (r["py"], r["px"]) == (r["patch_row"] * 16, r["patch_col"] * 16)
        tile = png_decode(bytes(r["bytes"]))
        assert tile.shape == (16, 16)
        # png is lossless: the re-encoded tile equals the source slice
        want = px[r["py"] : r["py"] + 16, r["px"] : r["px"] + 16]
        assert np.array_equal(tile, want)
        assert r["mean_px"] == round(float(want.mean()), 6)
    assert seen == {(i, j) for i in range(2) for j in range(3)}


def test_patches_small_image_yields_no_rows(spark):
    px = np.full((8, 8), 42, dtype=np.uint8)
    images = spark.createDataFrame(
        [("tiny", bytearray(png_encode(px)), "png")],
        "image_id string, bytes binary, fmt string",
    )
    assert image_patches(images, patch=16).count() == 0
