"""Registrable-domain (eTLD+1) extraction — the unit a polite crawler
actually budgets by.

Per-host politeness under-throttles sites that spread content across
subdomains (img1.example.co.uk, img2.example.co.uk, ...): the
registrable domain (public-suffix rules: longest matching suffix from
the suffix list, plus one label) is the correct rollup key. The
reference never needs this (single API host); at web scale it is the
difference between 10^7 budget rows and 10^9.

Implemented as a broadcast longest-suffix-match join (the J5 two-tier
lookup shape): each host emits its last-k label suffixes (k = 1..max
suffix depth, a tiny fixed fan-out), one hash join against the suffix
dimension, max-labels-wins per host. No UDF, no regex backtracking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Minimal deterministic suffix list (public-suffix-list stand-in: the
# real list is ~9k rows — still broadcast-sized).
DEFAULT_SUFFIXES = [
    ("com", 1),
    ("org", 1),
    ("net", 1),
    ("test", 1),
    ("uk", 1),
    ("co.uk", 2),
    ("org.uk", 2),
    ("jp", 1),
    ("co.jp", 2),
    ("io", 1),
]


def suffix_dim(spark: SparkSession, suffixes=None) -> DataFrame:
    rows = suffixes if suffixes is not None else DEFAULT_SUFFIXES
    return spark.createDataFrame(rows, "suffix string, n_labels int")


def with_registrable_domain(
    hosts: DataFrame, suffixes: DataFrame, host_col: str = "host"
) -> DataFrame:
    """Adds ``registrable_domain``: longest public suffix + one label;
    hosts with no matching suffix (or nothing left of the suffix) keep
    the full host — the conservative fallback the PSL algorithm
    prescribes."""
    max_depth = 3  # candidate suffixes of 1..3 labels cover the dim
    labels = F.split(F.col(host_col), "\\.")
    cands = hosts.withColumn("_labels", labels).withColumn(
        "_cand",
        F.expr(
            f"transform(sequence(1, least(size(_labels), {max_depth})), "
            "k -> array_join(slice(_labels, size(_labels) - k + 1, k), '.'))"
        ),
    )
    exploded = cands.select(
        "*", F.explode("_cand").alias("_suffix")
    ).join(
        F.broadcast(suffixes),
        F.col("_suffix") == F.col("suffix"),
        "left_semi",
    )
    best = exploded.groupBy(host_col).agg(
        F.max(F.expr("size(split(_suffix, '\\\\.'))")).alias("_best_n")
    )
    out = (
        hosts.join(F.broadcast(best), host_col, "left")
        .withColumn("_labels", labels)
        .withColumn(
            "registrable_domain",
            F.when(
                F.col("_best_n").isNotNull()
                & (F.size("_labels") > F.col("_best_n")),
                F.expr(
                    "array_join(slice(_labels, size(_labels) - _best_n, "
                    "_best_n + 1), '.')"
                ),
            ).otherwise(F.col(host_col)),
        )
        .drop("_labels", "_best_n")
    )
    return out
