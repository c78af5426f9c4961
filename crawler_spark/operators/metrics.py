"""Stats queries over the results table — the ``--mode stats`` analog
(reference: src/database.py:166-204, main.py:223-249): scalar count,
filtered count, group-by counts, join+group-by, derived ratio."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def results_stats(results: DataFrame) -> DataFrame:
    """One-row summary: A1 total, A2 filtered count, A5 ratio."""
    return results.agg(
        F.count("*").alias("total_results"),
        F.sum((F.col("fmt") == "png").cast("long")).alias("png_count"),
        F.round(
            F.sum((F.col("fmt") == "png").cast("long")) * 100.0
            / F.greatest(F.count("*"), F.lit(1)),
            2,
        ).alias("png_pct"),
        F.count_distinct("host").alias("n_hosts"),
    )


def results_by_host(results: DataFrame) -> DataFrame:
    """A3: group-by counts (stores-per-category analog)."""
    return (
        results.groupBy("host")
        .agg(
            F.count("*").alias("n_images"),
            F.round(F.avg(F.col("w") * F.col("h")), 2).alias("avg_pixels"),
        )
        .orderBy("host")
    )


def rolling_median_flags(
    df: DataFrame,
    key_col: str = "host",
    order_col: str = "seq",
    val_col: str = "lat_ms",
    window: int = 5,
    k: float = 3.0,
) -> DataFrame:
    """Per-key trailing rolling-median spike detection — the fetch-loop
    health monitor: a latency above ``k`` x its host's rolling median is
    an anomaly the AIMD backoff should react to before the tail
    percentiles even move. Rolling median is the textbook grouped-map
    case Spark's native windows cannot express (no median frame
    aggregate), so this is ``groupBy(key).applyInPandas`` — one shuffle
    on the key, each group processed as a pandas frame with a vectorized
    ``rolling(window).median()``. Medians of <= ``window`` doubles are
    exact midpoint averages, so an ANSI window-median oracle
    (quantile_cont over ROWS BETWEEN) agrees bit-for-bit. At 10^10 rows
    a mega-host group would need the salted pre-split politeness_select
    uses; fetch-log keys (host, day) stay bounded."""
    import pandas as pd  # noqa: F401 (documents the grouped-map dependency)

    out_schema = (
        f"{key_col} string, {order_col} long, {val_col} double, "
        "roll_med double, spike boolean"
    )

    def flag(pdf):
        pdf = pdf.sort_values(order_col)
        med = pdf[val_col].rolling(window, min_periods=1).median()
        return pdf.assign(roll_med=med, spike=pdf[val_col] > k * med)[
            [key_col, order_col, val_col, "roll_med", "spike"]
        ]

    return df.select(key_col, order_col, val_col).groupBy(key_col).applyInPandas(
        flag, schema=out_schema
    )


def round_summary(metrics: DataFrame) -> DataFrame:
    """A6: per-round totals from the per-partition metrics table."""
    return (
        metrics.groupBy("round_id")
        .agg(
            F.sum("scheduled").alias("scheduled"),
            F.sum("results").alias("results"),
            F.sum("failed").alias("failed"),
            F.sum("links").alias("links"),
        )
        .orderBy("round_id")
    )


def decayed_counts(
    df,
    group_col: str,
    day_col: str,
    half_life_days: int = 1,
    max_age_days: int = 30,
):
    """Recency-weighted activity counts: each event contributes
    2^(-age/half_life) and the per-group sum ranks "active lately"
    above "active once, long ago" — the frontier-priority prior that
    plain counts (forever-memory) and fixed windows (cliff-edge) both
    get wrong.

    EXACTNESS BY BIT BUDGET, not pinning: with integer ages and
    half_life 1, every weight is a dyadic 2^-k (IEEE-exact in any
    engine); ages quantize to whole half-lives (floor) and cap at ``max_age_days`` (=30) so weights span 30
    bits, and a group of up to 2^23 events keeps every partial sum
    inside the 53-bit mantissa — the float aggregation is then exact
    under ANY association order, so no decimal accumulator is needed.
    (Raise max_age and the event bound shrinks bit-for-bit; the
    docstring is the budget.) One map-side-combinable groupBy; the
    reference day is the corpus max, a broadcast scalar.

    Returns (group, n_events, decayed, rank) ranked by decayed desc.
    """
    from pyspark.sql import Window

    mx = df.agg(F.max(F.col(day_col)).alias("_mx"))
    # age quantizes to WHOLE half-lives (floor div) so the exponent is
    # always an integer and the weight always an exact dyadic
    age_hl = F.expr(f"(_mx - {day_col}) div {int(half_life_days)}")
    w = F.pow(
        F.lit(2.0),
        -F.least(age_hl, F.lit(max_age_days)).cast("double"),
    )
    agg = (
        df.crossJoin(F.broadcast(mx))
        .withColumn("_w", w)
        .groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("_w").alias("decayed"),
        )
    )
    wr = Window.orderBy(F.desc("decayed"), group_col)
    return agg.withColumn("rank", F.row_number().over(wr).cast("long"))
