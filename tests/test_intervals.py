"""Bucketed interval join (operators/intervals.py): half-open boundary
semantics, multi-bucket intervals, and the no-nested-loop plan property
that is the operator's whole reason to exist."""

import datetime as dt

from crawler_spark.operators.intervals import interval_join


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minute, seconds=second)


def _dfs(spark):
    points = spark.createDataFrame(
        [(1, _ts(0)),    # == start of 10: included
         (2, _ts(4, 59)),  # inside 10 and 20
         (3, _ts(5)),    # == end of 10: excluded (half-open); inside 20
         (4, _ts(59)),   # inside the long interval only
         (5, _ts(70))],  # after both: in no interval
        "pid long, p_ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(10, _ts(0), _ts(5)),     # 5-minute interval
         (20, _ts(3), _ts(60))],   # spans many 60 s buckets
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    return points, intervals


def test_interval_join_half_open_and_multibucket(spark):
    points, intervals = _dfs(spark)
    out = interval_join(points, intervals, bucket_seconds=60)
    pairs = sorted((r.pid, r.iid) for r in out.collect())
    assert pairs == [(1, 10), (2, 10), (2, 20), (3, 20), (4, 20)]


def test_interval_join_no_duplicate_pairs(spark):
    """A point lives in one bucket, so no pair can meet twice even when
    the interval explodes across every bucket."""
    points, intervals = _dfs(spark)
    out = interval_join(points, intervals, bucket_seconds=7)  # width coprime to everything
    pairs = [(r.pid, r.iid) for r in out.collect()]
    assert len(pairs) == len(set(pairs))
    assert sorted(pairs) == [(1, 10), (2, 10), (2, 20), (3, 20), (4, 20)]


def test_interval_join_is_hash_join(spark):
    points, intervals = _dfs(spark)
    plan = (
        interval_join(points, intervals, bucket_seconds=60)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan
