"""As-of (point-in-time) join — a classic time-series operator Spark has
no native form of, built as a composition of existing DataFrame ops.

The union-and-carry construction: tag both inputs, union them by name,
and run ONE window per key ordered by (ts, tag) with
`last(..., ignorenulls=True)` carrying the most recent right-side values
forward onto each left row. Backward-inclusive semantics (largest
right ts <= left ts wins, equal ts matches) — identical to DuckDB's
`ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts`, which is the oracle.

Scale notes: exactly one shuffle (hash by key), no range explosion, no
per-row Python, and the window is partitioned by the join key — never
global. This beats the naive theta-join (`l.ts >= r.ts` inside a key
group = O(|l|x|r|) per key) that Catalyst would produce from the SQL
form; skewed keys can reuse the politeness salting if a single key's
timeline outgrows a partition.

The right side must be unique per (key, ts) — dedup upstream (e.g.
max_by) — otherwise which same-timestamp row wins is nondeterministic
in any engine's as-of.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "_asof_tag"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] = ("value",),
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row gains `{prefix}ts` and
    `{prefix}{c}` for each value col — the right row with the largest
    right_ts <= left_ts within the same `on` key (nulls when none)."""
    carried = [f"{prefix}ts"] + [f"{prefix}{c}" for c in value_cols]
    r = right.select(
        F.col(on),
        F.col(right_ts).alias(left_ts),
        F.col(right_ts).alias(f"{prefix}ts"),
        *[F.col(c).alias(f"{prefix}{c}") for c in value_cols],
        F.lit(0).alias(_TAG),
    )
    l = left.withColumn(_TAG, F.lit(1))
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(left_ts).asc(), F.col(_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *[c for c in l.columns if c != _TAG],
        F.col(_TAG),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in carried],
    )
    return filled.filter(F.col(_TAG) == 1).drop(_TAG)
