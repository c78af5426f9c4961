"""Optimizer statistics: equi-depth histogram + range selectivity
(operators/stats.py). The histogram must hold ~1/B per bucket with
monotone fences even under heavy value skew (where equi-width would
collapse), and estimates must respect the ~1/B + sample-noise bound."""

from pyspark.sql import functions as F

from crawler_spark.operators.stats import equi_depth_histogram, range_selectivity


def _preds(spark, triples):
    return spark.createDataFrame(triples, "pred_id int, p_lo double, p_hi double")


def test_histogram_depth_and_fences(spark):
    df = spark.range(10000).select(
        F.col("id").alias("k"), (F.col("id") * F.col("id")).cast("double").alias("v")
    )
    h = equi_depth_histogram(df, "v", "k", n_buckets=8, sample_permille=1000)
    rows = sorted(h.collect(), key=lambda r: r["bucket"])
    assert [r["bucket"] for r in rows] == list(range(1, 9))
    # full sample (permille=1000): every bucket holds n/B ± 1 rows
    assert all(abs(r["n_rows"] - 1250) <= 1 for r in rows)
    # fences monotone
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] <= b["lo"]
    assert abs(sum(r["est_frac"] for r in rows) - 1.0) < 1e-9


def test_selectivity_close_on_skewed_data(spark):
    # zipf-ish skew: value = floor(10000 / (id+1)) — a few huge heavy
    # values, long tail; equi-depth must still estimate within ~1/B+noise
    df = spark.range(8000).select(
        F.col("id").alias("k"),
        F.floor(10000 / (F.col("id") + 1)).cast("double").alias("v"),
    )
    h = equi_depth_histogram(df, "v", "k", n_buckets=16, sample_permille=1000)
    preds = _preds(spark, [(1, 0.0, 2.0), (2, 3.0, 10.0), (3, 100.0, 10000.0)])
    est = {r["pred_id"]: r["est_sel"] for r in range_selectivity(h, preds).collect()}
    n = df.count()
    for pid, lo, hi in [(1, 0.0, 2.0), (2, 3.0, 10.0), (3, 100.0, 10000.0)]:
        actual = df.filter((F.col("v") >= lo) & (F.col("v") <= hi)).count() / n
        assert abs(est[pid] - actual) < 1.5 / 16 + 0.02, (pid, est[pid], actual)


def test_zero_width_bucket_is_impulse(spark):
    # 90% of rows share one value: several buckets collapse to lo == hi;
    # a predicate covering the heavy value must see their full mass, one
    # missing it must see none of it
    rows = [(i, 5.0) for i in range(900)] + [(900 + i, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "k long, v double")
    h = equi_depth_histogram(df, "v", "k", n_buckets=10, sample_permille=1000)
    est = {
        r["pred_id"]: r["est_sel"]
        for r in range_selectivity(
            h, _preds(spark, [(1, 4.9, 5.1), (2, 60.0, 200.0)])
        ).collect()
    }
    # pure-impulse buckets all counted; the two BOUNDARY buckets mixing
    # the heavy value with tail values interpolate away up to ~2/B of
    # the mass (actual 0.9, worst-case error 1/B) — inherent to the
    # uniform-within-bucket model, not a bug
    assert est[1] > 0.9 - 1.0 / 10 - 0.01
    assert est[2] < 0.10  # none of them leak into a disjoint range


def test_join_order_ranking_follows_selectivity(spark):
    """System R chain costing prefers joining the SELECTIVE side first:
    with a tiny A, (A*B)*C must rank 1; with a tiny C, (B*C)*A must."""
    from crawler_spark.operators.stats import system_r_chain_costs

    def mk(n, key_mod, kname):
        return spark.range(n).select(
            (F.col("id") % key_mod).alias(kname), F.col("id").alias(f"pay{kname}")
        )

    # A tiny (10 rows), B big bridges k1->k2, C big
    a = mk(10, 1000, "k1")
    b = spark.range(5000).select(
        (F.col("id") % 1000).alias("k1"), (F.col("id") % 500).alias("k2")
    )
    c_big = mk(5000, 500, "k2")
    r = {
        x["plan"]: x["rank"]
        for x in system_r_chain_costs(
            [("A", a, "k1"), ("B", b, "k2"), ("C", c_big, None)]
        ).collect()
    }
    assert r["(A*B)*C"] == 1
    # symmetric: C tiny
    a_big = mk(5000, 1000, "k1")
    c_tiny = mk(10, 500, "k2")
    r2 = {
        x["plan"]: x["rank"]
        for x in system_r_chain_costs(
            [("A", a_big, "k1"), ("B", b, "k2"), ("C", c_tiny, None)]
        ).collect()
    }
    assert r2["(B*C)*A"] == 1


def test_join_cost_formula_matches_hand_calc(spark):
    from crawler_spark.operators.stats import system_r_chain_costs

    a = spark.createDataFrame([(1,), (2,), (2,)], "k1 long")
    b = spark.createDataFrame([(1, 7), (2, 8), (3, 8)], "k1 long, k2 long")
    c = spark.createDataFrame([(7,), (8,), (8,), (9,)], "k2 long")
    rows = {
        r["plan"]: r
        for r in system_r_chain_costs(
            [("A", a, "k1"), ("B", b, "k2"), ("C", c, None)]
        ).collect()
    }
    # |A|=3 |B|=3 ndv_a(k1)=2 ndv_b(k1)=3 -> est_ab = 9/3 = 3
    assert rows["(A*B)*C"]["est_inter"] == 3.0
    # est cost adds 3 * |C| / max(ndv_b(k2)=2, ndv_c(k2)=3) = 3*4/3
    assert abs(rows["(A*B)*C"]["est_cost"] - (3.0 + 4.0)) < 1e-12


def test_psi_stable_vs_shifted(spark):
    """PSI ~ 0 for identically-distributed waves; well past 0.25 for a
    mean-shifted wave; symmetric in its arguments; empty bins are
    finite via Laplace smoothing."""
    from crawler_spark.operators.stats import psi_bins

    a = spark.range(4000).select((F.col("id") % 10).cast("int").alias("bin"))
    b = spark.range(4000).select(
        (((F.col("id") % 10) + 0) % 10).cast("int").alias("bin")
    )
    shifted = spark.range(4000).select(
        F.least((F.col("id") % 10) + 4, F.lit(9)).cast("int").alias("bin")
    )
    stable = psi_bins(a, b, "bin", 10).collect()[0]["psi"]
    assert abs(stable) < 0.01
    drifted = psi_bins(a, shifted, "bin", 10).collect()[0]["psi"]
    assert drifted > 0.25
    sym = psi_bins(shifted, a, "bin", 10).collect()[0]["psi"]
    assert abs(sym - drifted) < 1e-6  # PSI is symmetric
    import math

    assert math.isfinite(drifted)


def test_ht_estimates_are_unbiased_scale_ups(spark):
    """HT: each stratum's estimated row count is the sampled count
    times exactly 1000/permille, independent of the value column, and
    strata sampled at rate 1000 reproduce exact totals to the pin."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.stats import ht_total_estimate

    pop = spark.range(3000).select(
        F.when(F.col("id") % 3 == 0, "a").when(F.col("id") % 3 == 1, "b")
        .otherwise("c").alias("s"),
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    rates = spark.createDataFrame(
        [("a", 1000), ("b", 250), ("c", 100)], "s string, permille int"
    )
    out = {r["s"]: r for r in ht_total_estimate(pop, rates, "s", "k", "v").collect()}
    assert out["a"]["n_sampled"] == out["a"]["exact_rows"] == 1000
    assert abs(out["a"]["est_total"] - out["a"]["exact_total"]) < 1e-6
    for st in ("b", "c"):
        r = out[st]
        assert abs(r["est_rows"] - r["n_sampled"] * 1000.0 / dict(
            b=250, c=100)[st]) < 1e-6
        # estimate within sampling noise of the truth (loose bound)
        assert abs(r["est_rows"] - r["exact_rows"]) / r["exact_rows"] < 0.25
        assert abs(r["est_total"] - r["exact_total"]) / r["exact_total"] < 0.3


def test_neyman_allocation_properties(spark):
    from crawler_spark.operators.stats import neyman_allocation

    # planted heteroscedastic strata: equal sizes, very different spread
    rows = []
    for i in range(300):
        rows.append(("calm", 100.0 + (i % 3)))        # sd ~ 0.8
        rows.append(("wild", 100.0 + (i % 100) * 5))  # sd ~ 144
        rows.append(("mid", 100.0 + (i % 10)))        # sd ~ 2.9
    df = spark.createDataFrame(rows, "stratum string, value double")
    out = {
        r["stratum"]: r
        for r in neyman_allocation(df, "stratum", "value", total_n=200).collect()
    }
    # allocations sum EXACTLY to the budget (largest-remainder)
    assert sum(r["n_alloc"] for r in out.values()) == 200
    # equal sizes -> allocation ordered by spread
    assert out["wild"]["n_alloc"] > out["mid"]["n_alloc"] > out["calm"]["n_alloc"]
    # the wild stratum dominates the budget
    assert out["wild"]["n_alloc"] > 150
    # shares are consistent with n_pop * sd weights
    for r in out.values():
        assert 0.0 <= r["share6"] <= 1.0


def test_ks_two_sample(spark):
    import math

    from crawler_spark.operators.stats import ks_two_sample

    # group A: values 0..99 each once; group B: same but shifted +30
    # for the top half -> a real distribution shift
    rows = [("a", float(i % 100)) for i in range(400)]
    rows += [
        ("b", float(i % 100) + (30.0 if i % 100 >= 50 else 0.0))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = ks_two_sample(df, "g", "v", "a", "b").collect()[0]
    assert out["n_a"] == 400 and out["n_b"] == 400

    # python mirror: exact D over pooled values
    from collections import Counter

    ca = Counter(v for g, v in rows if g == "a")
    cb = Counter(v for g, v in rows if g == "b")
    vals = sorted(set(ca) | set(cb))
    cum_a = cum_b = 0
    best = (0.0, None)
    for v in vals:
        cum_a += ca.get(v, 0)
        cum_b += cb.get(v, 0)
        gap = math.floor(abs(cum_a / 400 - cum_b / 400) * 1e9 + 0.5) / 1e9
        if gap > best[0]:
            best = (gap, v)
    assert out["ks_d9"] == best[0]
    assert out["at_value"] == best[1]
    assert out["reject_05"]  # the shift is blatant

    # identical distributions: D = 0, p = 1, no rejection
    same = spark.createDataFrame(
        [("a", float(i % 50)) for i in range(200)]
        + [("b", float(i % 50)) for i in range(200)],
        "g string, v double",
    )
    out2 = ks_two_sample(same, "g", "v", "a", "b").collect()[0]
    assert out2["ks_d9"] == 0.0
    assert out2["p_approx6"] == 1.0
    assert not out2["reject_05"]


def test_poisson_bootstrap_ci(spark):
    import math

    from pyspark.sql import functions as F

    from crawler_spark.operators.stats import poisson_bootstrap_ci

    # values 0..999: mean 499.5, sd ~288.7 -> se ~9.1
    df = spark.range(1000).select(
        F.col("id").alias("rid"), F.col("id").cast("double").alias("v")
    )
    out = poisson_bootstrap_ci(df, "rid", "v", n_reps=32).collect()[0]
    assert out["n"] == 1000
    assert out["mean6"] == 499.5
    se = math.sqrt(sum((i - 499.5) ** 2 for i in range(1000)) / 1000 / 1000)
    # the interval brackets the mean and has the right order of width
    assert out["ci_lo6"] < 499.5 < out["ci_hi6"]
    width = out["ci_hi6"] - out["ci_lo6"]
    assert 1.0 * se < width < 8.0 * se, (width, se)
    # deterministic across runs
    out2 = poisson_bootstrap_ci(df, "rid", "v", n_reps=32).collect()[0]
    assert (out["ci_lo6"], out["ci_hi6"]) == (out2["ci_lo6"], out2["ci_hi6"])


def test_equi_depth_histogram_distributed_rank_matches_windowed_ntile(spark):
    """Round-3 VERDICT perf finding #2: the histogram must not funnel its
    sample through one single-partition global window. The distributed
    rank (range-repartition + broadcast offsets) must reproduce ntile's
    split law BIT-EXACTLY — verified against an inline windowed-ntile
    reference across C % B != 0, C < B, and heavy-ties shapes."""
    import numpy as np
    from pyspark.sql import Window

    from crawler_spark.operators.sequence import assign_dense_seq

    rng = np.random.default_rng(21)
    for n_rows, n_buckets in [(977, 16), (7, 10), (500, 7), (64, 16)]:
        vals = np.where(
            rng.random(n_rows) < 0.3, 42.0, rng.normal(0, 10, n_rows)
        )
        df = spark.createDataFrame(
            [(float(v), i) for i, v in enumerate(vals)], "v double, k long"
        )
        got = {
            r["bucket"]: (r["lo"], r["hi"], r["n_rows"], round(r["est_frac"], 12))
            for r in equi_depth_histogram(
                df, "v", "k", n_buckets=n_buckets, sample_permille=1000
            ).collect()
        }
        # the exact plan the old implementation ran (fine at test sizes)
        s = df.select("v", "k")
        w = Window.orderBy("v", "k")
        ref = (
            s.withColumn("bucket", F.ntile(n_buckets).over(w))
            .groupBy("bucket")
            .agg(
                F.min("v").alias("lo"),
                F.max("v").alias("hi"),
                F.count("*").alias("n_rows"),
            )
        )
        tot = float(n_rows)
        want = {
            r["bucket"]: (r["lo"], r["hi"], r["n_rows"],
                          round(r["n_rows"] / tot, 12))
            for r in ref.collect()
        }
        assert got == want, (n_rows, n_buckets)

    # plan shape of the ranking machinery: the only Window is partitioned
    # by _pid — NO Exchange SinglePartition anywhere in the plan
    sample = spark.range(0, 10000).select(
        (F.col("id") % 997).cast("double").alias("v"), F.col("id").alias("k")
    )
    ranked, _, handle = assign_dense_seq(sample, ["v", "k"], "_r")
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    handle.unpersist()
    assert "SinglePartition" not in plan, plan
