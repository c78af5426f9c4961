"""Exposure/entropy gates: planted images hit closed-form statistics."""

import numpy as np

from crawler_spark.functions.codecs import png_encode
from crawler_spark.operators.multimodal import exposure_entropy_gates


def test_exposure_gates_planted_images(spark):
    rng = np.random.default_rng(5)
    black = np.zeros((16, 16), dtype=np.uint8)
    white = np.full((16, 16), 255, dtype=np.uint8)
    # exact-uniform histogram: every value 0..255 exactly once -> 8 bits
    uniform = np.arange(256, dtype=np.uint8).reshape(16, 16)
    noise = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    images = spark.createDataFrame(
        [
            ("black", bytearray(png_encode(black)), "png"),
            ("white", bytearray(png_encode(white)), "png"),
            ("uniform", bytearray(png_encode(uniform)), "png"),
            ("noise", bytearray(png_encode(noise)), "png"),
        ],
        "image_id string, bytes binary, fmt string",
    )
    got = {r["image_id"]: r for r in exposure_entropy_gates(images).collect()}

    b = got["black"]
    assert b["mean_luma"] == 0.0 and b["clip_low_frac"] == 1.0
    assert b["entropy_bits"] == 0.0 and b["dynamic_range"] == 0
    assert not b["well_exposed"] and not b["has_detail"]

    w = got["white"]
    assert w["mean_luma"] == 255.0 and w["clip_high_frac"] == 1.0
    assert not w["well_exposed"] and not w["has_detail"]

    u = got["uniform"]
    assert u["entropy_bits"] == 8.0  # 256 equiprobable bins exactly
    assert u["mean_luma"] == 127.5
    # p5 = 12.75, p95 = 242.25 (linear interpolation) -> int diff 229
    assert u["dynamic_range"] == int(
        np.percentile(np.arange(256), 95) - np.percentile(np.arange(256), 5)
    )
    # 1/256 of pixels at each of 0,1,2 -> clip_low = 3/256 < 0.25
    assert u["well_exposed"] and u["has_detail"]

    n = got["noise"]
    assert n["well_exposed"] and n["has_detail"]
    assert n["entropy_bits"] > 7.0
    # numpy mirror of the exact entropy
    hist = np.bincount(noise.reshape(-1), minlength=256) / noise.size
    p = hist[hist > 0]
    assert n["entropy_bits"] == float(-(p * np.log2(p)).sum())


def test_exposure_gate_thresholds_are_dials(spark):
    grey = np.full((8, 8), 128, dtype=np.uint8)
    images = spark.createDataFrame(
        [("grey", bytearray(png_encode(grey)), "png")],
        "image_id string, bytes binary, fmt string",
    )
    strict = exposure_entropy_gates(images, min_entropy_bits=0.0).first()
    assert strict["well_exposed"] and strict["has_detail"]
    assert strict["entropy_bits"] == 0.0
