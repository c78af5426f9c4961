"""Keyed two-sample KS and the Benjamini-Hochberg FDR gate."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.stats import bh_fdr, ks_two_sample_by


def _obs(spark, rows):
    return spark.createDataFrame(rows, "k string, g int, v double")


def test_ks_by_matches_scalar_per_key(spark):
    from crawler_spark.operators.stats import ks_two_sample

    rows = []
    for i in range(200):
        rows.append(("quiet", i % 2, float(i % 37)))
        rows.append(("shifted", i % 2, float(i % 37 + (30 if i % 2 else 0))))
    df = _obs(spark, rows)
    keyed = {
        r["k"]: r
        for r in ks_two_sample_by(df, "k", "g", "v", 0, 1).collect()
    }
    for key in ("quiet", "shifted"):
        scalar = ks_two_sample(
            df.filter(F.col("k") == key), "g", "v", 0, 1
        ).collect()[0]
        kr = keyed[key]
        assert kr["ks_d9"] == scalar["ks_d9"]
        assert kr["at_value"] == scalar["at_value"]
        assert kr["p_approx6"] == scalar["p_approx6"]
        assert kr["reject_05"] == scalar["reject_05"]
    assert keyed["shifted"]["reject_05"] and not keyed["quiet"]["reject_05"]


def test_ks_by_drops_one_sided_keys(spark):
    rows = [("only_a", 0, 1.0), ("only_a", 0, 2.0), ("both", 0, 1.0),
            ("both", 1, 2.0)]
    out = ks_two_sample_by(_obs(spark, rows), "k", "g", "v", 0, 1)
    assert [r["k"] for r in out.collect()] == ["both"]


def _tests_df(spark, pvals):
    return spark.createDataFrame(
        [(f"k{i:03d}", p) for i, p in enumerate(pvals)], "key string, p double"
    )


def test_bh_textbook_example(spark):
    # Benjamini-Hochberg's own worked example shape: m=10, alpha=0.05;
    # sorted p: .001 .009 .019 .021 .041 .06 .29 .31 .9 .95
    # k/m*alpha: .005 .010 .015 .020 .025 .030 ... -> largest k with
    # p_(k) <= k*alpha/m is k=4 (.021 > .020? no -> check: rank4 thr
    # .020, p=.021 fails; rank2 thr .010, p=.009 passes) => k*=2? walk:
    # r1 .001<=.005 T; r2 .009<=.010 T; r3 .019>.015 F; r4 .021>.020 F;
    # r5 .041>.025 F ... k* = 2 -> discover exactly the two smallest.
    ps = [0.001, 0.009, 0.019, 0.021, 0.041, 0.06, 0.29, 0.31, 0.9, 0.95]
    out = bh_fdr(_tests_df(spark, ps), "key", "p", alpha=0.05).collect()
    disc = sorted(r["p"] for r in out if r["discovered"])
    assert disc == [0.001, 0.009]
    for r in out:
        assert r["m"] == 10
        assert r["bh_thr9"] == pytest.approx(r["rank"] * 0.05 / 10, abs=1e-9)


def test_bh_discovers_below_cutoff_even_if_locally_failing(spark):
    # the defining BH subtlety: a p-value can FAIL its own rank's
    # threshold yet be discovered because a LARGER rank passes
    ps = [0.010, 0.012, 0.014, 0.020]  # m=4, alpha=0.05
    # thresholds: .0125 .025 .0375 .05 -> rank1 .010<=.0125 T,
    # rank2 T, rank3 T, rank4 .020<=.05 T => all discovered
    out = bh_fdr(_tests_df(spark, ps), "key", "p", alpha=0.05).collect()
    assert all(r["discovered"] for r in out)


def test_bh_no_discoveries_on_uniform_ish(spark):
    ps = [0.3, 0.5, 0.62, 0.77, 0.81, 0.95]
    out = bh_fdr(_tests_df(spark, ps), "key", "p", alpha=0.05).collect()
    assert not any(r["discovered"] for r in out)


def test_bh_partitioning_invariant(spark):
    ps = [0.001 * (i % 97) + 0.0001 for i in range(300)]
    a = bh_fdr(_tests_df(spark, ps).repartition(1), "key", "p")
    b = bh_fdr(_tests_df(spark, ps).repartition(13), "key", "p")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_bh_fuzz_against_reference(spark):
    """Randomized families vs the textbook BH procedure computed in
    plain python — 8 random (m, alpha) schedules."""
    import random

    rnd = random.Random(11)
    for trial in range(8):
        m = rnd.randrange(1, 40)
        ps = [round(rnd.random(), 4) for _ in range(m)]
        alpha = rnd.choice([0.01, 0.05, 0.1])
        out = bh_fdr(_tests_df(spark, ps), "key", "p", alpha=alpha).collect()
        # reference: sort ascending, largest k with p_(k) <= k*alpha/m
        order = sorted(ps)
        kstar = 0
        for k, p in enumerate(order, start=1):
            if p <= k * alpha / m:
                kstar = k
        expect_disc = sorted(order[:kstar])
        got_disc = sorted(r["p"] for r in out if r["discovered"])
        assert got_disc == expect_disc, (trial, m, alpha)
