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
