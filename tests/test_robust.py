"""Robust statistics (operators/robust.py): MAD outlier gate and
Theil-Sen trend — both must shrug off the contamination that breaks
their mean/OLS counterparts, and both pin their medians as order
statistics (no interpolation)."""

from pyspark.sql import functions as F

from crawler_spark.operators.robust import mad_outliers, theil_sen_trend


def test_mad_flags_spike_mean_z_would_not(spark):
    # 20 quiet points + 5 huge spikes: MAD flags exactly the spikes.
    # The classic MASKING failure: at 20% contamination the spikes
    # inflate mean and stddev so much that a 3.5-sigma gate flags
    # NOTHING — the outliers hide each other.
    rows = [("h", i, 100.0 + (i % 7)) for i in range(20)]
    rows += [("h", 1000 + j, 10000.0) for j in range(5)]
    df = spark.createDataFrame(rows, "g string, i long, x double")
    out = mad_outliers(df, "g", "i", "x").collect()
    flagged = {r["i"] for r in out if r["is_outlier"]}
    assert flagged == {1000 + j for j in range(5)}
    import statistics

    xs = [r[2] for r in rows]
    mu, sd = statistics.mean(xs), statistics.pstdev(xs)
    naive = {i for (_, i, x) in rows if abs(x - mu) / sd > 3.5}
    assert naive == set()  # the naive gate is masked by its own outliers


def test_mad_zero_flags_nothing(spark):
    # >50% identical values -> MAD = 0 -> no flags (z defined as 0)
    rows = [("h", i, 10.0) for i in range(10)] + [("h", 99, 9999.0)]
    df = spark.createDataFrame(rows, "g string, i long, x double")
    out = mad_outliers(df, "g", "i", "x").collect()
    assert not any(r["is_outlier"] for r in out)


def test_theil_sen_recovers_slope_under_contamination(spark):
    # y = 3x + 5 with 25% of points corrupted to a constant: Theil-Sen
    # stays at 3; OLS on the same points is pulled far off.
    pts = []
    for i in range(40):
        y = 3.0 * i + 5.0 if i % 4 else -500.0
        pts.append(("h", float(i), y))
    df = spark.createDataFrame(pts, "g string, x double, y double")
    r = theil_sen_trend(df, "g", "x", "y").collect()[0]
    assert abs(r["slope"] - 3.0) < 1e-9
    assert r["n_points"] == 40
    ols = df.agg(
        F.expr("regr_slope(y, x)").alias("b")
    ).first()["b"]
    assert abs(ols - 3.0) > 0.5  # OLS visibly pulled; Theil-Sen exact


def test_theil_sen_degenerate_groups(spark):
    # single point and all-equal-x: slope NULL, n_pairs 0
    df = spark.createDataFrame(
        [("a", 1.0, 2.0), ("b", 5.0, 1.0), ("b", 5.0, 9.0)],
        "g string, x double, y double",
    )
    rows = {r["g"]: r for r in theil_sen_trend(df, "g", "x", "y").collect()}
    assert rows["a"]["slope"] is None and rows["a"]["n_pairs"] == 0
    assert rows["b"]["slope"] is None and rows["b"]["n_pairs"] == 0


def test_cusum_matches_sequential_recursion_and_alarms_on_shift(spark):
    """The window closed form equals Page's sequential recursion
    exactly (pinned arithmetic), stays quiet on in-control data, and
    alarms after a sustained small shift a 3.5-sigma threshold would
    never see."""
    import math

    from crawler_spark.operators.robust import cusum_alarms

    # in-control around 10, then a +0.8 shift from t=30 (within
    # single-point 3.5-sigma noise, but sustained)
    vals = [10.0 + ((i * 7) % 5 - 2) * 0.3 for i in range(30)]
    vals += [10.8 + ((i * 7) % 5 - 2) * 0.3 for i in range(30, 60)]
    rows = [("h", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, o long, x double")
    out = {
        r["o"]: r
        for r in cusum_alarms(
            df, "g", "o", "x", target=10.0, slack=0.3, h=5.0
        ).collect()
    }
    # sequential mirror with identical pinning
    def p9(x):
        return math.floor(x * 1e9 + 0.5) / 1e9

    sp = sn = 0.0
    for i, v in enumerate(vals):
        sp = max(0.0, sp + p9(v - 10.0 - 0.3))
        sn = max(0.0, sn - p9(v - 10.0 + 0.3))
        got = out[i]
        assert abs(got["s_pos6"] - math.floor(sp * 1e6 + 0.5) / 1e6) < 2e-6, i
        assert abs(got["s_neg6"] - math.floor(sn * 1e6 + 0.5) / 1e6) < 2e-6, i
    assert not any(out[i]["alarm"] for i in range(30))  # quiet in control
    assert any(out[i]["alarm"] for i in range(30, 60))  # shift caught
    # a 3.5-sigma pointwise gate never fires on the shifted points
    import statistics

    mu, sd = statistics.mean(vals[:30]), statistics.pstdev(vals[:30])
    assert all(abs(v - mu) / sd < 3.5 for v in vals[30:])


def test_mann_kendall_detects_monotone_and_respects_ties(spark):
    """MK: strong monotone series flags trending with S near max;
    constant series has S=0, all-tied variance 0, z=0, not trending;
    alternating noise is not trending. Variance matches the
    tie-corrected hand formula."""
    from crawler_spark.operators.robust import mann_kendall

    rows = (
        [("up", float(i), float(i) * 2.0) for i in range(20)]
        + [("flat", float(i), 7.0) for i in range(20)]
        + [("noise", float(i), float(i % 2)) for i in range(20)]
    )
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in mann_kendall(df, "g", "x", "y").collect()}
    assert out["up"]["s_stat"] == 190 and out["up"]["trending"]
    assert out["up"]["var_s18"] == 20 * 19 * 45  # no ties
    assert out["flat"]["s_stat"] == 0 and not out["flat"]["trending"]
    assert out["flat"]["var_s18"] == 0 and out["flat"]["z"] == 0.0
    assert not out["noise"]["trending"]
    # noise ties: two groups of 10 -> tie_term = 2 * 10*9*25
    assert out["noise"]["var_s18"] == 20 * 19 * 45 - 2 * 10 * 9 * 25
