"""Exact distributed skyline (Pareto frontier) over two criteria.

The recrawl scheduler constantly faces multi-criteria selection with no
single scalarization everyone agrees on: pick pages that are BOTH
high-value and very stale, hosts that are BOTH fast and under-crawled.
The skyline is the exact answer set — every row not strictly dominated
on (x, y) — and feeds the priority column without committing to a
weighting (the weighted scalarizations in rank.py pick ONE point of
this frontier; the skyline hands the scheduler all of them).

Scale shape (the textbook two-phase distributed skyline, e.g.
Balke et al. EDBT'04 lineage): the skyline operator distributes for
free because it is algebraic over unions —

    skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B))

so phase 1 computes a local skyline inside each partition and phase 2
a global skyline over the union of the survivors. Correctness is
PARTITION-INDEPENDENT (any grouping gives the same final set), so the
phase-1 key is just pmod(xxhash64(id), B) to bound phase-2's input;
at 10^10 rows phase 2 sees B x (local skyline size), typically a few
hundred rows, while the dominated bulk never crosses the wire.

Within a group the 2-D sweep is pure native window code (no Python):
sort by (x DESC, y DESC); a distinct point survives iff its y strictly
exceeds the running max-y of every point sorted before it — any such
predecessor has x' > x (or x' = x with y' > y), i.e. dominates it.
Whole-stage codegen end to end; the only shuffles are the two window
hash-partitionings (bucket, then the single-group global pass over
the tiny phase-1 output).

Dominance is the standard strict form: q dominates p iff q >= p on
both dims and q > p on at least one. Exact duplicates (x, y) dominate
nothing and are collapsed by the distinct-points projection; callers
who need row identity join the value pair back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_BUCKETS = 32


def _sweep(df: DataFrame, part_cols: list[str]) -> DataFrame:
    """One skyline sweep per `part_cols` group over distinct (x, y):
    keep rows whose y beats the running max-y of all (x DESC, y DESC)
    predecessors in the group."""
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col("x").desc(), F.col("y").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.max("y").over(w)
    return df.withColumn("_pm", prev).filter(
        F.col("_pm").isNull() | (F.col("y") > F.col("_pm"))
    ).drop("_pm")


def skyline2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_buckets: int = N_BUCKETS,
    bucket_expr: str | None = None,
) -> DataFrame:
    """Maximal (x, y) value pairs of `df` under strict Pareto dominance.

    `bucket_expr` overrides the phase-1 grouping key (any expression
    works — the union property above makes the result identical for
    every choice, including n_buckets=1, which the tests assert); the
    default hashes the value pair itself so no id column is required.
    Output: distinct skyline points (x, y), one row each.
    """
    pts = df.select(
        F.col(x_col).alias("x"), F.col(y_col).alias("y")
    ).distinct()
    bkt = (
        F.expr(bucket_expr)
        if bucket_expr
        else F.pmod(F.xxhash64(F.col("x"), F.col("y")), F.lit(n_buckets))
    )
    local = _sweep(pts.withColumn("_b", bkt), ["_b"]).drop("_b")
    # phase 2: single-group sweep over the (tiny) union of local skylines
    return _sweep(local.withColumn("_g", F.lit(0)), ["_g"]).drop("_g")


def skyline_py(points: list[tuple]) -> set[tuple]:
    """Reference brute-force skyline for tests: O(n^2) dominance scan."""
    pts = set(points)
    out = set()
    for p in pts:
        dominated = any(
            q != p and q[0] >= p[0] and q[1] >= p[1] and (q[0] > p[0] or q[1] > p[1])
            for q in pts
        )
        if not dominated:
            out.add(p)
    return out
