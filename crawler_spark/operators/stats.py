"""Optimizer statistics: equi-depth histograms and range-selectivity
estimation — the cost-model layer next to the sketch-based join-size
forecast (operators/sketches.countmin_join_size).

Every cost-based planner decision (join order, broadcast-vs-shuffle,
skew handling) starts from a selectivity estimate, and the industry
answer since System R / Piatetsky-Shapiro & Connell (SIGMOD'84) is the
equi-depth histogram: B buckets holding ~1/B of the rows each, range
selectivity = covered buckets + linear interpolation inside partially
covered ones (worst-case error ~ 1/B + sample noise, independent of the
value distribution — equi-WIDTH buckets degrade arbitrarily on skew).

Scale shape: statistics are always built from a BOUNDED sample — Spark's
own ANALYZE TABLE, Postgres' default_statistics_target, and DuckDB all
do this — because an exact global sort of 10^10 rows to place 16 fences
is absurd. The sample here is a deterministic md5-Bernoulli draw on the
ROW KEY (value-independent, so value skew cannot bias inclusion), sized
by ``sample_permille`` so it fits one task by construction; the single
ntile window over the sample is bounded the same way the politeness
rank's salt buckets are. Both engines draw the identical sample, so the
histogram — and every estimate derived from it — is oracle-exact.

Reference parity: the reference has no optimizer (it walks cursors);
this layer exists because a declarative 100 TB engine must pick plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def equi_depth_histogram(
    df: DataFrame,
    value_col: str,
    key_col: str,
    n_buckets: int = 16,
    sample_permille: int = 100,
) -> DataFrame:
    """Equi-depth histogram of ``value_col`` from a deterministic
    Bernoulli sample on ``key_col``: (bucket 1..B, lo, hi, n_rows,
    est_frac). ``est_frac`` sums to 1 over buckets; each bucket holds
    ~sample/B rows (exactly ntile's split). lo/hi are the sample min
    and max inside the bucket — adjacent buckets may share a fence
    value when ties straddle it (standard; the interpolation in
    `range_selectivity` treats a zero-width bucket as an impulse)."""
    h = F.expr(
        f"cast(conv(substring(md5(concat('edh:', cast({key_col} as string)"
        f")), 1, 15), 16, 10) as bigint)"
    )
    s = df.select(F.col(value_col).alias("v"), F.col(key_col).alias("k")).filter(
        F.pmod(h, F.lit(1000)) < sample_permille
    )
    w = Window.orderBy("v", "k")
    by_bucket = (
        s.withColumn("bucket", F.ntile(n_buckets).over(w))
        .groupBy("bucket")
        .agg(
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.count("*").alias("n_rows"),
        )
    )
    tot = by_bucket.agg(F.sum("n_rows").alias("n_tot"))
    return (
        by_bucket.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "lo",
            "hi",
            F.col("n_rows").cast("long").alias("n_rows"),
            (F.col("n_rows") / F.col("n_tot")).alias("est_frac"),
        )
    )


def range_selectivity(
    hist: DataFrame, preds: DataFrame
) -> DataFrame:
    """Estimated selectivity of range predicates ``[p_lo, p_hi]``
    (inclusive) from an equi-depth histogram: per predicate, sum each
    bucket's est_frac scaled by the linearly-interpolated overlap of
    [p_lo, p_hi] with [lo, hi] (the uniform-within-bucket assumption
    of SIGMOD'84). A zero-width bucket (lo == hi, a heavy value pinned
    by ties) contributes all-or-nothing. ``preds``: (pred_id, p_lo,
    p_hi) — dimension-sized, broadcast onto the B-row histogram; the
    fact table is never touched."""
    j = F.broadcast(preds).crossJoin(hist)
    ovl = F.when(
        F.col("hi") > F.col("lo"),
        F.greatest(
            F.lit(0.0),
            (
                F.least(F.col("p_hi"), F.col("hi"))
                - F.greatest(F.col("p_lo"), F.col("lo"))
            )
            / (F.col("hi") - F.col("lo")),
        ),
    ).otherwise(
        (
            (F.col("lo") >= F.col("p_lo")) & (F.col("lo") <= F.col("p_hi"))
        ).cast("double")
    )
    # per-bucket terms pinned to the 1e-9 grid and summed as DECIMAL so
    # the estimate is independent of partial-aggregation order (SCALE.md
    # determinism rule) and bit-equal on the oracle
    term = F.floor(
        F.col("est_frac") * F.col("ovl") * F.lit(1e9) + F.lit(0.5)
    ).cast("double") / F.lit(1e9)
    return (
        j.withColumn("ovl", F.least(F.lit(1.0), ovl))
        .withColumn("term", term.cast("decimal(28, 9)"))
        .groupBy("pred_id", "p_lo", "p_hi")
        .agg(F.sum("term").cast("double").alias("est_sel"))
    )
