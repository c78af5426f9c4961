"""Intensity-histogram near-dup (operators/multimodal.py luma_hist +
hist_intersection_pairs).

Parity: the Spark pipeline's histograms and pair intersections must
match a brute-force numpy replica exactly (same decode, same binning).
Recall: planted +1-brightness twins score near-1 intersection and all
survive the 0.9 gate; structurally different images do not pair up.
"""

import numpy as np
import pytest

from crawler_spark.functions.codecs import decode, encode
from crawler_spark.operators.multimodal import (
    hist_intersection_pairs,
    luma_hist,
)
from crawler_spark.sources.synth import T1_SMOKE


def _np_hist(px: np.ndarray, n_bins: int = 16) -> np.ndarray:
    counts = np.bincount((px.ravel() // (256 // n_bins)).astype(np.int64), minlength=n_bins)
    return counts.astype(np.float64) / counts.sum()


def _images(n=24, n_twins=8):
    urls = [f"http://host-0.test/p0/d0/img-{i}" for i in range(n)]
    rows = [
        (r["image_id"], r["bytes"], r["fmt"])
        for r in (T1_SMOKE.payload(u) for u in urls)
    ]
    twins = []
    for image_id, data, fmt in rows[:n_twins]:
        px = decode(data, fmt).astype(np.int16)
        px = np.clip(px + 1, 0, 255)
        twins.append((image_id + "-v", encode(px.astype(np.uint8), "png"), "png"))
    return rows + twins


def test_luma_hist_matches_numpy(spark):
    imgs = _images()
    df = spark.createDataFrame(imgs, "image_id string, bytes binary, fmt string")
    got = {r.image_id: (r.hist, r.dominant_bin) for r in luma_hist(df).collect()}
    assert len(got) == len(imgs)
    for image_id, data, fmt in imgs:
        want = _np_hist(decode(data, fmt))
        hist, dom = got[image_id]
        assert np.allclose(hist, want, atol=1e-12), image_id
        assert dom == int(want.argmax())
        assert sum(hist) == pytest.approx(1.0, abs=1e-9)


def test_hist_intersection_recalls_brightness_twins(spark):
    imgs = _images(n=24, n_twins=8)
    df = spark.createDataFrame(imgs, "image_id string, bytes binary, fmt string")
    pairs = {
        (r.image_a, r.image_b): r.intersection
        for r in hist_intersection_pairs(luma_hist(df), 0.9).collect()
    }
    px = {i: decode(d, f) for i, d, f in imgs}
    # every planted twin pair survives the gate with near-1 intersection
    twin_ids = [i for i, _, _ in imgs if i.endswith("-v")]
    assert len(twin_ids) == 8
    for tid in twin_ids:
        orig = tid[: -len("-v")]
        key = tuple(sorted((orig, tid)))
        assert key in pairs, key
        assert pairs[key] >= 0.95
    # scores equal the numpy brute-force intersection for every
    # emitted pair (same blocking notwithstanding: verify value only)
    for (a, b), got in pairs.items():
        want = float(np.minimum(_np_hist(px[a]), _np_hist(px[b])).sum())
        assert got == pytest.approx(round(want, 6), abs=2e-6), (a, b)


def test_luma_hist_rejects_bad_bins():
    with pytest.raises(ValueError):
        luma_hist(None, n_bins=10)
