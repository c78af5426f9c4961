"""Streaming CUSUM (streaming/cusum.py): cross-batch state carry, one
alarm per crossing with re-arm, and exact parity with a sequential
mirror of the pinned recursion."""

import glob
import math
import shutil


def _mirror(series, target, slack, h):
    def p9(v):
        return math.floor(v * 1e9 + 0.5) / 1e9

    sp = sn = 0.0
    alarms = []
    for seq, x in series:
        sp = max(0.0, sp + p9(x - target - slack))
        sn = max(0.0, sn - p9(x - target + slack))
        if sp > h:
            alarms.append((seq, "up", sp))
            sp = 0.0
        if sn > h:
            alarms.append((seq, "down", sn))
            sn = 0.0
    return alarms


def test_streaming_cusum_carries_state_and_rearms(spark, tmp_path):
    from crawler_spark.streaming.cusum import METRIC_SCHEMA, run_cusum_stream

    # host A drifts +1 above target from seq 10: with slack 0.5 the
    # statistic grows 0.5/step and crosses h=3.0 mid-SECOND-batch —
    # the alarm only fires if state survives the batch boundary.
    # Host B stays in control (no alarms). A second drift segment
    # after the alarm proves the detector re-armed.
    a1 = [("A", i, 10.0) for i in range(10)] + [("A", i, 11.0) for i in range(10, 14)]
    a2 = [("A", i, 11.0) for i in range(14, 24)]
    b = [("B", i, 10.0 + (0.2 if i % 2 else -0.2)) for i in range(24)]
    batch1 = a1 + b[:12]
    batch2 = a2 + b[12:]
    d = tmp_path / "cusum_stream"
    d.mkdir()
    for i, batch in enumerate([batch1, batch2]):
        staged = str(tmp_path / f"cstage{i}")
        spark.createDataFrame(batch, METRIC_SCHEMA).coalesce(1).write.parquet(staged)
        shutil.copy(glob.glob(f"{staged}/part-*.parquet")[0], d / f"b{i}.parquet")
    name = run_cusum_stream(spark, str(d), target=10.0, slack=0.5, h=3.0)
    rows = sorted(
        spark.table(name).collect(), key=lambda r: (r["host"], r["seq"])
    )
    got = [(r["host"], r["seq"], r["side"], r["stat"]) for r in rows]
    series_a = sorted([(s, x) for (_, s, x) in a1 + a2])
    expect_a = [("A", s, side, st) for (s, side, st) in _mirror(series_a, 10.0, 0.5, 3.0)]
    assert [g for g in got if g[0] == "A"] == expect_a
    assert len(expect_a) == 2  # crossed, re-armed, crossed again
    assert expect_a[0][1] >= 14  # first alarm lands in batch 2's rows
    assert not [g for g in got if g[0] == "B"]


def test_streaming_cusum_folds_late_rows(spark, tmp_path):
    """Rows arriving in a later batch with smaller seq are late data:
    they still fold into the statistic rather than being dropped —
    enough late evidence alone must trigger the alarm."""
    import glob
    import shutil

    from crawler_spark.streaming.cusum import METRIC_SCHEMA, run_cusum_stream

    batch1 = [("A", i, 12.0) for i in range(100, 104)]
    batch2 = [("A", i, 12.0) for i in range(0, 4)]  # late, same drift
    d = tmp_path / "cusum_late"
    d.mkdir()
    for i, batch in enumerate([batch1, batch2]):
        staged = str(tmp_path / f"lstage{i}")
        spark.createDataFrame(batch, METRIC_SCHEMA).coalesce(1).write.parquet(staged)
        shutil.copy(glob.glob(f"{staged}/part-*.parquet")[0], d / f"b{i}.parquet")
    # drift 1.5/step after slack: 8 rows x 1.5 = 12 > h=10 only if the
    # late batch's rows contributed
    name = run_cusum_stream(
        spark, str(d), target=10.0, slack=0.5, h=10.0, name="cusum_late_out"
    )
    rows = spark.table(name).collect()
    assert len(rows) == 1 and rows[0]["side"] == "up"
