"""Format transcoding: PSNR audit honors the codec contracts."""

import numpy as np

from crawler_spark.functions.codecs import decode, png_encode, qdct_encode
from crawler_spark.operators.multimodal import transcode_images


def _images(spark):
    rng = np.random.default_rng(19)
    smooth = np.clip(
        np.linspace(0, 220, 32)[None, :] + np.linspace(0, 30, 32)[:, None], 0, 255
    ).astype(np.uint8)
    textured = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    return spark.createDataFrame(
        [
            ("smooth_png", bytearray(png_encode(smooth)), "png"),
            ("tex_png", bytearray(png_encode(textured)), "png"),
            ("smooth_qdct", bytearray(qdct_encode(smooth)), "qdct"),
        ],
        "image_id string, bytes binary, fmt string",
    ), smooth


def test_transcode_to_qdct_meets_psnr_floor(spark):
    images, _ = _images(spark)
    got = {r["image_id"]: r for r in transcode_images(images, "qdct").collect()}
    # lossy target: the north-rule floor holds for natural (smooth) content
    assert got["smooth_png"]["psnr_db"] >= 40.0
    assert got["smooth_qdct"]["psnr_db"] >= 40.0
    for r in got.values():
        assert r["dst_fmt"] == "qdct" and r["dst_bytes"] > 0


def test_transcode_to_png_is_lossless_of_decoded_pixels(spark):
    images, smooth = _images(spark)
    got = {r["image_id"]: r for r in transcode_images(images, "png").collect()}
    # png is lossless: decoded source pixels re-encode exactly -> 99 cap
    assert got["smooth_png"]["psnr_db"] == 99.0
    assert got["tex_png"]["psnr_db"] == 99.0
    assert got["smooth_qdct"]["psnr_db"] == 99.0
    back = decode(bytes(got["smooth_png"]["bytes"]), "png")
    assert np.array_equal(back, smooth)
