"""Bucketed interval (range) join — points matched into time intervals
without a nested-loop join.

Spark turns a bare range predicate (`p.ts >= i.start AND p.ts < i.end`)
into BroadcastNestedLoop/Cartesian — O(|points| x |intervals|), dead at
scale. The standard fix: quantize time into fixed-width buckets, explode
each interval onto the buckets it covers (sequence()), map each point to
its single bucket, hash-join on bucket id, then re-check the exact
predicate. Join cost becomes O(matches + intervals x span/width); width
trades explosion factor against join selectivity and should be ~ the
typical interval length.

No dedup step is needed: a point lives in exactly one bucket, so each
(point, interval) pair meets at most once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "_iv_bucket"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    bucket_seconds: int,
    point_ts: str = "p_ts",
    start: str = "start_ts",
    end: str = "end_ts",
) -> DataFrame:
    """Inner-join every point to every interval with
    start <= point_ts < end (half-open). Column names of the two inputs
    must be disjoint; both timestamp columns are real timestamps."""

    def bucket(col: str):
        return F.floor(F.unix_timestamp(F.col(col)) / bucket_seconds)

    p = points.withColumn(_BUCKET, bucket(point_ts))
    i = intervals.withColumn(
        _BUCKET,
        F.explode(F.sequence(bucket(start), bucket(end))),
    )
    return (
        p.join(i, _BUCKET)
        .filter((F.col(point_ts) >= F.col(start)) & (F.col(point_ts) < F.col(end)))
        .drop(_BUCKET)
    )
