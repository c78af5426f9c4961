"""Distributed Misra-Gries (operators/sketches.py) — guarantee bounds,
python-mirror parity, and partitioning invariance."""

from collections import Counter

from pyspark.sql import functions as F

from crawler_spark.operators.sketches import (
    mg_merge,
    misra_gries,
    misra_gries_fold,
)


def _skewed_df(spark, n=4000):
    # zipf-ish: item j appears ~ n/2^j times, plus a long tail of
    # singletons — heavy items way above n/(k+1), tail far below
    return spark.range(n).select(
        F.col("id").alias("rid"),
        F.when(F.col("id") % 2 == 0, "hot-0")
        .when(F.col("id") % 4 == 1, "hot-1")
        .when(F.col("id") % 8 == 3, "hot-2")
        .when(F.col("id") % 16 == 7, "hot-3")
        .otherwise(F.concat(F.lit("tail-"), F.col("id")))
        .alias("item"),
    )


def test_mg_guarantees_and_mirror(spark):
    k, n = 8, 4000
    df = _skewed_df(spark, n)
    got = {
        r["item"]: r["mg_count"]
        for r in misra_gries(df, "item", "rid", k=k, n_buckets=16).collect()
    }
    truth = Counter(r["item"] for r in df.collect())
    bound = n // (k + 1)
    # every reported count is a lower bound within n/(k+1)
    for it, est in got.items():
        assert est <= truth[it]
        assert truth[it] - est <= bound, it
    # every item with true frequency > n/(k+1) is present
    for it, cnt in truth.items():
        if cnt > bound:
            assert it in got, it
    # python mirror over the SAME deterministic bucketing
    rows = (
        df.select(
            F.pmod(F.xxhash64("rid"), F.lit(16)).alias("b"), "item", "rid"
        )
        .collect()
    )
    buckets = {}
    for r in rows:
        buckets.setdefault(r["b"], []).append((r["rid"], r["item"]))
    partials = {
        b: misra_gries_fold((it for _, it in sorted(v)), k)
        for b, v in buckets.items()
    }
    ref = mg_merge((partials[b] for b in sorted(partials)), k)
    assert got == ref


def test_mg_partitioning_invariance(spark):
    df = _skewed_df(spark, 2000)
    a = {
        r["item"]: r["mg_count"]
        for r in misra_gries(df.repartition(3), "item", "rid", k=6).collect()
    }
    b = {
        r["item"]: r["mg_count"]
        for r in misra_gries(df.repartition(17), "item", "rid", k=6).collect()
    }
    assert a == b


def test_fold_textbook_case():
    # classic decrement behavior: k=2 over a b c a b a -> a survives
    c = misra_gries_fold(list("abcaba"), 2)
    assert c.get("a", 0) >= 1
    # total decrements bounded: n/(k+1) = 2 per item
    truth = Counter("abcaba")
    for it, est in c.items():
        assert 0 < est <= truth[it]
        assert truth[it] - est <= 2
