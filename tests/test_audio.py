"""PCM audio operators: exact stats on synthesized waveforms."""

import numpy as np
import pytest

from crawler_spark.operators.audio import downsample_pcm, pcm_stats


def _sine(freq, sr, secs, amp):
    t = np.arange(int(sr * secs)) / sr
    return np.rint(amp * np.sin(2 * np.pi * freq * t)).astype("<i2")


def test_pcm_stats_known_waveforms(spark):
    sr = 8000
    tone = _sine(440, sr, 2.0, 10000)
    # 1 s tone + 1 s digital silence -> silence_ratio 0.5 exactly
    half = np.concatenate([_sine(440, sr, 1.0, 10000), np.zeros(sr, "<i2")])
    clipped = np.full(sr, 32767, "<i2")
    df = spark.createDataFrame(
        [
            ("tone", bytearray(tone.tobytes()), sr),
            ("half", bytearray(half.tobytes()), sr),
            ("clip", bytearray(clipped.tobytes()), sr),
        ],
        "audio_id string, bytes binary, sample_rate int",
    )
    got = {r["audio_id"]: r.asDict() for r in pcm_stats(df).collect()}
    assert got["tone"]["duration_s"] == pytest.approx(2.0)
    # sine RMS = amp/sqrt(2), within rounding of the int16 quantization
    assert got["tone"]["rms"] == pytest.approx(10000 / np.sqrt(2), rel=1e-3)
    assert got["tone"]["clip_ratio"] == 0.0
    assert got["tone"]["silence_ratio"] == 0.0
    assert got["half"]["silence_ratio"] == pytest.approx(0.5)
    assert got["clip"]["clip_ratio"] == 1.0
    assert got["clip"]["peak"] == 32767
    # numpy cross-check of the exact RMS
    x = tone.astype(np.float64)
    assert got["tone"]["rms"] == float(np.sqrt((x * x).mean()))


def test_downsample_pcm_halves_rate_and_length(spark):
    sr = 8000
    tone = _sine(200, sr, 1.0, 8000)
    df = spark.createDataFrame(
        [("a", bytearray(tone.tobytes()), sr)],
        "audio_id string, bytes binary, sample_rate int",
    )
    (row,) = downsample_pcm(df, factor=2).collect()
    assert row["sample_rate"] == 4000
    assert row["n_samples"] == len(tone) // 2
    y = np.frombuffer(bytes(row["bytes"]), dtype="<i2")
    # box-filtered decimation preserves a low tone's envelope: the
    # downsampled RMS stays within 2% of the original
    x = tone.astype(np.float64)
    assert np.sqrt((y.astype(np.float64) ** 2).mean()) == pytest.approx(
        np.sqrt((x * x).mean()), rel=0.02
    )
    # decode -> stats over the resampled output still reports 1 s
    df2 = spark.createDataFrame(
        [("a", bytearray(y.tobytes()), 4000)],
        "audio_id string, bytes binary, sample_rate int",
    )
    (s,) = pcm_stats(df2).collect()
    assert s["duration_s"] == pytest.approx(1.0)


def test_vad_segments_exact_boundaries(spark):
    """Planted bursts: exact frame-aligned boundaries, gap bridging,
    and min-length blip rejection."""
    import numpy as np

    from crawler_spark.operators.audio import vad_segments

    sr = 1000  # frame_ms=10 -> flen=10 samples, boundaries exact
    tone = lambda n: np.full(n, 5000.0)
    sil = lambda n: np.zeros(n)
    # a: 200ms tone, 300ms silence, 200ms tone -> two segments
    a = np.concatenate([tone(200), sil(300), tone(200)])
    # b: 200ms tone, 30ms pause (3 frames <= max_gap 5 -> bridged), 200ms tone
    b = np.concatenate([tone(200), sil(30), tone(200)])
    # c: a 50ms blip (5 frames < min_len 10) -> dropped entirely
    c = np.concatenate([sil(100), tone(50), sil(100)])
    rows = [
        ("a", bytearray(x.astype("<i2").tobytes()), sr)
        for name, x in [("a", a)]
    ] + [
        ("b", bytearray(b.astype("<i2").tobytes()), sr),
        ("c", bytearray(c.astype("<i2").tobytes()), sr),
    ]
    df = spark.createDataFrame(
        rows, "audio_id string, bytes binary, sample_rate int"
    )
    segs = {}
    for r in vad_segments(df).collect():
        segs.setdefault(r.audio_id, []).append((r.seg_idx, r.start_s, r.end_s))
    assert sorted(segs["a"]) == [(0, 0.0, 0.2), (1, 0.5, 0.7)]
    assert sorted(segs["b"]) == [(0, 0.0, 0.43)]  # bridged into one
    assert "c" not in segs  # blip dropped
    # seg_rms of a pure constant-amplitude segment is the amplitude
    got = vad_segments(df).filter("audio_id = 'a'").first()
    assert abs(got.seg_rms - 5000.0) < 1e-9


def test_spectral_features_planted_tones(spark):
    """Bin-exact FFT features: a pure tone at an exact FFT bin lands
    its full energy there (dominant == centroid == rolloff == f0, one
    band holds ~everything, flatness ~0); white-ish noise is flat."""
    from crawler_spark.operators.audio import spectral_features

    sr, frame = 8000, 1024
    # 500 Hz is NOT a bin; use bin-exact f0 = k * sr / frame
    f0 = 32 * sr / frame  # = 250.0 Hz exactly (bin 32)
    tone = _sine(f0, sr, 2.0, 10000)
    rng_vals = (
        np.random.default_rng(7)
        .integers(-20000, 20000, sr * 2)
        .astype("<i2")
    )  # seeded white noise (deterministic)
    two = _sine(f0, sr, 2.0, 10000) + _sine(8 * f0, sr, 2.0, 3000)
    df = spark.createDataFrame(
        [
            ("tone", bytearray(tone.tobytes()), sr),
            ("noise", bytearray(rng_vals.tobytes()), sr),
            ("two", bytearray(two.astype("<i2").tobytes()), sr),
        ],
        "audio_id string, bytes binary, sample_rate int",
    )
    got = {
        r["audio_id"]: r.asDict()
        for r in spectral_features(df, frame=frame).collect()
    }
    t = got["tone"]
    assert t["n_frames"] == (sr * 2) // frame
    assert t["dominant_hz"] == pytest.approx(f0)
    assert t["spectral_centroid_hz"] == pytest.approx(f0, rel=1e-6)
    assert t["spectral_rolloff_hz"] == pytest.approx(f0)
    assert t["spectral_flatness"] < 1e-6
    assert max(t["band_energies"]) > 0.999  # all energy in one band
    n = got["noise"]
    assert n["spectral_flatness"] > 0.5  # near-flat spectrum
    assert 0.3 * sr / 2 < n["spectral_centroid_hz"] < 0.7 * sr / 2
    d = got["two"]  # dominant still the strong tone; harmonic pulls
    assert d["dominant_hz"] == pytest.approx(f0)
    assert d["spectral_centroid_hz"] > t["spectral_centroid_hz"]


def test_spectral_features_degenerate(spark):
    from crawler_spark.operators.audio import spectral_features

    sr = 8000
    short = _sine(440, sr, 0.05, 1000)  # 400 samples < one frame
    silent = np.zeros(4096, "<i2")
    df = spark.createDataFrame(
        [
            ("short", bytearray(short.tobytes()), sr),
            ("silent", bytearray(silent.tobytes()), sr),
        ],
        "audio_id string, bytes binary, sample_rate int",
    )
    got = {
        r["audio_id"]: r.asDict()
        for r in spectral_features(df).collect()
    }
    assert got["short"]["n_frames"] == 0
    assert got["short"]["band_energies"] is None
    assert got["silent"]["spectral_flatness"] == 1.0
    assert got["silent"]["dominant_hz"] == 0.0
