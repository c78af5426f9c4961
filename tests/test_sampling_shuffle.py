"""Priority sampling (Duffield-Lund-Thorup) and the epoch-deterministic
training shuffle manifest.

The estimator tests mirror the JACM'07 guarantees that matter
operationally: exactness when k covers the group (tau = 0 branch), and
bounded relative error on a skewed population when it does not. The
shuffle tests pin the reproducibility contract: same (corpus, epoch) ->
bit-identical manifest regardless of partitioning; different epochs ->
different permutations.
"""

import math

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.corpus import epoch_shuffle_manifest
from crawler_spark.operators.stats import priority_sample_estimate


def _pop(spark, n, n_groups=2):
    return spark.range(n).select(
        (F.col("id") % n_groups).cast("string").alias("g"),
        F.col("id").alias("k"),
        # skewed weights: a few heavy rows dominate the total
        (
            F.when(F.col("id") % 97 == 0, F.lit(5000)).otherwise(
                (F.col("id") % 13) + 1
            )
        ).alias("w"),
    )


def test_exact_when_k_covers_group(spark):
    df = _pop(spark, 40, n_groups=2)  # 20 rows per group < k
    out = priority_sample_estimate(df, "g", "k", "w", k=64).collect()
    assert len(out) == 2
    for r in out:
        assert r["n_sampled"] == r["n_pop"]
        assert r["tau6"] == 0.0
        assert r["est_total6"] == pytest.approx(r["exact_total6"], abs=1e-6)


def test_estimator_error_bounded_on_skew(spark):
    df = _pop(spark, 4000, n_groups=2)
    out = priority_sample_estimate(df, "g", "k", "w", k=64).collect()
    for r in out:
        assert r["n_sampled"] == 64
        assert r["tau6"] > 0.0
        rel = abs(r["est_total6"] - r["exact_total6"]) / r["exact_total6"]
        # DLT variance ~ exact^2/(k-1) worst case; on this mix the
        # heavy rows are always sampled (w=5000 >> tau), so the
        # estimator should land well inside +-35%
        assert rel < 0.35, (r["g"], rel)


def test_estimate_partitioning_invariant(spark):
    df = _pop(spark, 2000, n_groups=1)
    a = priority_sample_estimate(df.repartition(1), "g", "k", "w", k=32)
    b = priority_sample_estimate(df.repartition(16), "g", "k", "w", k=32)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def _docs(spark, n):
    return spark.range(n).select(
        F.col("id").alias("doc_id"), ((F.col("id") % 7) + 1).alias("n_tok")
    )


def test_epoch_manifest_partition_and_rerun_stable(spark):
    docs = _docs(spark, 1000)
    m1 = epoch_shuffle_manifest(docs.repartition(2), "doc_id", "n_tok", 3)
    m2 = epoch_shuffle_manifest(docs.repartition(13), "doc_id", "n_tok", 3)
    assert sorted(map(tuple, m1.collect())) == sorted(map(tuple, m2.collect()))


def test_epoch_manifest_blocks_cover_exactly(spark):
    n, block = 1000, 256
    m = epoch_shuffle_manifest(_docs(spark, n), "doc_id", "n_tok", 0)
    rows = {r["block_id"]: r for r in m.collect()}
    assert set(rows) == set(range(math.ceil(n / block)))
    assert sum(r["n_rows"] for r in rows.values()) == n
    # all blocks full except the tail
    for b, r in rows.items():
        assert r["n_rows"] == (block if b < n // block else n % block)
    # hash fences are disjoint and ordered: block b's range sits wholly
    # below block b+1's (consecutive rank ranges of one sorted order)
    fences = [rows[b] for b in sorted(rows)]
    for lo, hi in zip(fences, fences[1:]):
        assert lo["h_hi"] < hi["h_lo"]


def test_epochs_differ_but_totals_match(spark):
    docs = _docs(spark, 1000)
    m0 = epoch_shuffle_manifest(docs, "doc_id", "n_tok", 0)
    m1 = epoch_shuffle_manifest(docs, "doc_id", "n_tok", 1)
    f0 = sorted((r["h_lo"], r["h_hi"]) for r in m0.collect())
    f1 = sorted((r["h_lo"], r["h_hi"]) for r in m1.collect())
    assert f0 != f1  # a genuinely different permutation
    tot0 = m0.agg(F.sum("weight_sum"), F.sum("n_rows")).collect()[0]
    tot1 = m1.agg(F.sum("weight_sum"), F.sum("n_rows")).collect()[0]
    assert tot0 == tot1  # ... of the same corpus
