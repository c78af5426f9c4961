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


# ---- Kaplan-Meier survival ------------------------------------------------

def _km_obs(spark, rows):
    return spark.createDataFrame(rows, "g string, t long, ev int")


def test_km_matches_hand_computed_curve(spark):
    from crawler_spark.operators.robust import kaplan_meier

    # textbook cohort of 10: deaths at t=1 (2), t=3 (1), t=5 (2);
    # censored at t=2 (1), t=4 (1); 3 survive to study end t=6 (censored)
    rows = (
        [("a", 1, 1)] * 2 + [("a", 2, 0)] + [("a", 3, 1)]
        + [("a", 4, 0)] + [("a", 5, 1)] * 2 + [("a", 6, 0)] * 3
    )
    out = {r["t"]: r for r in kaplan_meier(
        _km_obs(spark, rows), "g", "t", "ev"
    ).collect()}
    assert set(out) == {1, 3, 5}  # event times only
    # S(1) = 8/10; S(3) = 8/10 * 6/7; S(5) = that * 3/5
    assert out[1]["n_risk"] == 10 and out[1]["n_events"] == 2
    assert abs(out[1]["survival6"] - 0.8) < 2e-6
    assert out[3]["n_risk"] == 7
    assert abs(out[3]["survival6"] - 0.8 * 6 / 7) < 2e-6
    assert out[5]["n_risk"] == 5
    assert abs(out[5]["survival6"] - 0.8 * (6 / 7) * (3 / 5)) < 2e-6


def test_km_censoring_is_not_death(spark):
    from crawler_spark.operators.robust import kaplan_meier

    # same death pattern, but cohort b's extra members are CENSORED at
    # t=2 rather than dead: survival at t=3 must be HIGHER for b than
    # for the cohort where those members died
    a = [("a", 1, 1), ("a", 2, 1), ("a", 2, 1), ("a", 3, 1), ("a", 9, 0)]
    b = [("b", 1, 1), ("b", 2, 0), ("b", 2, 0), ("b", 3, 1), ("b", 9, 0)]
    out = kaplan_meier(_km_obs(spark, a + b), "g", "t", "ev")
    s3 = {
        (r["g"]): r["survival6"] for r in out.filter("t = 3").collect()
    }
    assert s3["b"] > s3["a"]


def test_km_total_death_hits_exact_zero(spark):
    from crawler_spark.operators.robust import kaplan_meier

    rows = [("a", 1, 1), ("a", 2, 1), ("a", 2, 1)]
    out = {r["t"]: r["survival6"] for r in kaplan_meier(
        _km_obs(spark, rows), "g", "t", "ev"
    ).collect()}
    assert out[2] == 0.0
