"""Augmentation plumbing: pixel-exact flips/crops through the png codec,
PSNR-bounded through the lossy qdct codec."""

import numpy as np

from crawler_spark.functions.codecs import decode, png_encode, psnr, qdct_encode
from crawler_spark.operators.multimodal import augment_images


def test_augment_png_pixel_exact(spark):
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(32, 24), dtype=np.uint8)
    images = spark.createDataFrame(
        [("a", bytearray(png_encode(px)), "png")],
        "image_id string, bytes binary, fmt string",
    )
    got = {r["variant"]: r for r in augment_images(images).collect()}
    assert set(got) == {"orig", "hflip", "crop75"}

    orig = decode(bytes(got["orig"]["bytes"]), "png")
    assert np.array_equal(orig, px)

    flip = decode(bytes(got["hflip"]["bytes"]), "png")
    assert np.array_equal(flip, np.fliplr(px))
    assert (got["hflip"]["w"], got["hflip"]["h"]) == (24, 32)

    crop = decode(bytes(got["crop75"]["bytes"]), "png")
    ch, cw = 32 // 8, 24 // 8
    assert np.array_equal(crop, px[ch : 32 - ch, cw : 24 - cw])
    assert (got["crop75"]["w"], got["crop75"]["h"]) == (24 - 2 * cw, 32 - 2 * ch)


def test_augment_qdct_psnr_envelope(spark):
    rng = np.random.default_rng(9)
    # smooth gradient + mild noise: the quantized-DCT codec's home turf
    base = np.linspace(0, 255, 32 * 32).reshape(32, 32)
    px = np.clip(base + rng.normal(0, 4, (32, 32)), 0, 255).astype(np.uint8)
    images = spark.createDataFrame(
        [("q", bytearray(qdct_encode(px)), "qdct")],
        "image_id string, bytes binary, fmt string",
    )
    got = {r["variant"]: r for r in augment_images(images).collect()}
    src = decode(qdct_encode(px), "qdct")  # codec's own reconstruction
    flip = decode(bytes(got["hflip"]["bytes"]), "qdct")
    # flipping commutes with the codec up to its quantization envelope
    assert psnr(flip, np.fliplr(src)) >= 40.0
    assert got["hflip"]["fmt"] == "qdct"
