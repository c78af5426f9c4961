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
