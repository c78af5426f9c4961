"""Landmark audio fingerprinting (operators/audio.py audio_landmarks +
landmark_match): planted frame-aligned excerpts must match their source
track at the exact frame offset, foreign probes must NOT clear the vote
gate, and results must be invariant to input partitioning (the
determinism contract: stable peak sort, ordered pairing, deterministic
tie-breaks in the vote window).
"""

import numpy as np
import pytest

from crawler_spark.operators.audio import audio_landmarks, landmark_match

SR = 8000
N = 3 * SR
FRAME = 512


def _wave(seed):
    # frequency-hopping multi-tone: each frame gets its own bin-exact
    # tone triple (bin spacing SR/FRAME), so frames are distinguishable
    # and offset votes can only concentrate at the true alignment
    rng = np.random.default_rng(500 + seed)
    n_fr = N // FRAME
    hops = rng.integers(8, 200, size=(n_fr, 3)) * (SR / FRAME)
    tl = np.arange(FRAME) / SR
    x = np.concatenate(
        [
            sum(
                (1500 + 300 * k) * np.sin(2 * np.pi * f * tl)
                for k, f in enumerate(hops[j])
            )
            for j in range(n_fr)
        ]
    )
    x = x + rng.normal(0, 60, n_fr * FRAME)
    return np.clip(np.rint(x), -32768, 32767).astype("<i2")


@pytest.fixture(scope="module")
def matched(spark):
    tracks = [(f"trk-{i}", bytearray(_wave(i).tobytes())) for i in range(10)]
    # excerpt: frames 16..32 (bytes are 2/sample, frame-aligned slice)
    probes = [
        (f"probe-{i}", bytearray(_wave(i).tobytes()[2 * 16 * FRAME : 2 * 32 * FRAME]))
        for i in range(4)
    ] + [("probe-foreign", bytearray(_wave(77).tobytes()[: 2 * 16 * FRAME]))]
    index = audio_landmarks(
        spark.createDataFrame(tracks, "audio_id string, bytes binary")
    )
    probe = audio_landmarks(
        spark.createDataFrame(probes, "audio_id string, bytes binary")
    )
    return {
        r["probe_id"]: r for r in landmark_match(index, probe).collect()
    }


def test_planted_excerpts_recover_track_and_offset(matched):
    for i in range(4):
        r = matched[f"probe-{i}"]
        assert r["track_id"] == f"trk-{i}"
        assert r["offset"] == 16
        assert r["votes"] >= 5


def test_foreign_probe_rejected(matched):
    assert "probe-foreign" not in matched


def test_partitioning_invariance(spark):
    tracks = [(f"trk-{i}", bytearray(_wave(i).tobytes())) for i in range(6)]
    tdf = spark.createDataFrame(tracks, "audio_id string, bytes binary")
    a = {
        (r["audio_id"], r["t"], r["h"])
        for r in audio_landmarks(tdf.coalesce(1)).collect()
    }
    b = {
        (r["audio_id"], r["t"], r["h"])
        for r in audio_landmarks(tdf.repartition(5)).collect()
    }
    assert a == b and len(a) > 0
