"""Robust statistics for crawl-ops series — outlier gating and trend
estimation that survive the heavy-tailed, spike-ridden distributions
fetch metrics actually have (mean/stddev-based gates are ruined by the
very outliers they are meant to catch; one stuck host drags a fleet
z-score arbitrarily).

* `mad_outliers` — the Iglewicz & Hoaglin (1993) modified z-score:
  z = 0.6745 (x - median) / MAD, flag |z| > 3.5. Median and MAD have a
  50% breakdown point vs 0% for mean/stddev.
* `theil_sen_trend` — Theil ('50) / Sen ('68) slope: the median of all
  pairwise slopes, robust to ~29% corrupted points vs 0% for OLS (the
  zipf_fit/ols family next door); the right "is this host slowing
  down" estimator when retries and timeouts pollute the series.

Engine-portability discipline: every "median" here is the LOWER-MEDIAN
ORDER STATISTIC (rank (n+1) div 2 in a total order with explicit
tie-breaks) — selecting an element, not interpolating between two,
sidesteps the percentile-interpolation differences between engines the
same way exact_rank_select does. Slopes are 1e-9-pinned before
ranking so equal-by-grid slopes order identically everywhere.

Scale shape: both operators window PER GROUP over bounded series (a
host's metric retention window, not the corpus); Theil-Sen's pairwise
stage is O(m^2) per group and is fed a deterministic md5 sample by the
callers — the textbook mitigation, keeping m in the hundreds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.functions.num import pin6, pin9


def _lower_median(
    df: DataFrame, group_col: str, value_col: str, order_cols: list[str]
) -> DataFrame:
    """Per-group lower-median order statistic of ``value_col`` under
    the total order ``order_cols``: the row with row_number equal to
    (n+1) div 2. Returns (group_col, med)."""
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    wn = Window.partitionBy(group_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(wn))
        .filter(F.col("_rn") == F.expr("(_n + 1) div 2"))
        .select(F.col(group_col), F.col(value_col).alias("med"))
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
    z_thresh: float = 3.5,
) -> DataFrame:
    """Modified-z outlier flags per group (Iglewicz & Hoaglin '93):
    z = 0.6745 (x - med) / MAD with med/MAD as lower-median order
    statistics; |z| > z_thresh flags. A group whose MAD is 0 (over
    half the series identical — common for quantized latencies) flags
    nothing (z undefined -> 0), matching the reference treatment.

    Returns every input row as (group, id, value, z6, is_outlier) with
    z6 pinned at 1e-6. Two per-group windows over the bounded series;
    the medians join back as a broadcast group dimension.
    """
    vals = df.select(
        F.col(group_col).alias("g"),
        F.col(id_col).alias("i"),
        F.col(value_col).cast("double").alias("x"),
    )
    med = _lower_median(vals, "g", "x", ["x", "i"])
    dev = vals.join(F.broadcast(med), "g").withColumn(
        "d", F.abs(F.col("x") - F.col("med"))
    )
    mad = _lower_median(dev.select("g", "i", "d"), "g", "d", ["d", "i"]).select(
        "g", F.col("med").alias("mad")
    )
    z = F.when(
        F.col("mad") > 0,
        F.lit(0.6745) * (F.col("x") - F.col("med")) / F.col("mad"),
    ).otherwise(F.lit(0.0))
    p6 = pin6(z)
    return (
        dev.join(F.broadcast(mad), "g")
        .select(
            F.col("g").alias(group_col),
            F.col("i").alias(id_col),
            F.col("x").alias(value_col),
            p6.alias("z6"),
            (F.abs(z) > z_thresh).alias("is_outlier"),
        )
    )


def theil_sen_trend(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Theil-Sen slope per group: the lower-median of all pairwise
    slopes (y_b - y_a)/(x_b - x_a) over x_a < x_b (equal-x pairs are
    excluded — vertical slopes are undefined). Slopes are 1e-9-pinned
    before ranking; the median's total order is (slope, x_a, x_b, y_a, y_b) so
    the selected element is engine-identical. Callers pre-sample the
    series (md5 draw) to keep the per-group pair count bounded.

    Returns (group, n_points, n_pairs, slope) — slope NULL for groups
    with < 2 distinct x.
    """
    pts = df.select(
        F.col(group_col).alias("g"),
        F.col(x_col).cast("double").alias("px"),
        F.col(y_col).cast("double").alias("py"),
    )
    a = pts.select("g", F.col("px").alias("xa"), F.col("py").alias("ya"))
    b = pts.select("g", F.col("px").alias("xb"), F.col("py").alias("yb"))
    slopes = (
        a.join(b, "g")
        .filter(F.col("xa") < F.col("xb"))
        .withColumn(
            "s",
            pin9((F.col("yb") - F.col("ya")) / (F.col("xb") - F.col("xa"))),
        )
    )
    w = Window.partitionBy("g").orderBy("s", "xa", "xb", "ya", "yb")
    wn = Window.partitionBy("g")
    med = (
        slopes.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(wn))
        .filter(F.col("_rn") == F.expr("(_n + 1) div 2"))
        .select("g", F.col("s").alias("slope"), F.col("_n").alias("n_pairs"))
    )
    npts = pts.groupBy("g").agg(F.count("*").alias("n_points"))
    return (
        npts.join(med, "g", "left")
        .select(
            F.col("g").alias(group_col),
            F.col("n_points").cast("long").alias("n_points"),
            F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long").alias("n_pairs"),
            "slope",
        )
    )


def cusum_alarms(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    target: float,
    slack: float = 0.5,
    h: float = 5.0,
) -> DataFrame:
    """Two-sided CUSUM changepoint detector (Page '54) per group — the
    classic "this host's latency regime SHIFTED" alarm that a plain
    threshold misses (small sustained drifts) and EWMA smears.

      S+_t = max(0, S+_{t-1} + (x_t - target - slack))
      S-_t = max(0, S-_{t-1} - (x_t - target + slack))

    alarm when either exceeds ``h``. The recursion looks sequential,
    but Page's statistic has a closed window form: with C_t the prefix
    sum of (x_t - target - slack), S+_t = C_t - min_{0<=j<=t} C_j (C_0 = 0) — a
    cumulative sum and a running min, both plain per-group windows, so
    the whole detector is native (no stateful UDF, whole-stage
    codegen). Prefix sums accumulate 1e-9-pinned DECIMAL terms; the
    running min then compares exact values, so alarm sets are
    engine-identical.

    Returns every row: (group, order, value, s_pos, s_neg, alarm) with
    the statistics pinned at 1e-6. At 10^10 rows the windows are per
    group over the metric retention span — the same bound every
    trailing-window query here relies on.
    """
    rows = df.select(
        F.col(group_col).alias("g"),
        F.col(order_col).alias("o"),
        F.col(value_col).cast("double").alias("x"),
    )
    up = pin9(F.col("x") - F.lit(float(target)) - F.lit(float(slack)))
    dn = pin9(F.col("x") - F.lit(float(target)) + F.lit(float(slack)))
    wc = (
        Window.partitionBy("g")
        .orderBy("o")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    staged = (
        rows.withColumn(
            "cu", F.sum(up.cast("decimal(28,9)")).over(wc).cast("double")
        )
        .withColumn(
            "cd", F.sum(dn.cast("decimal(28,9)")).over(wc).cast("double")
        )
        # the prefix extremum must include the EMPTY prefix (C_0 = 0):
        # S_0 = 0 seeds the recursion, so clamp with 0
        .withColumn("mu", F.least(F.lit(0.0), F.min("cu").over(wc)))
        .withColumn("md", F.greatest(F.lit(0.0), F.max("cd").over(wc)))
    )
    s_pos = F.greatest(F.lit(0.0), F.col("cu") - F.col("mu"))
    s_neg = F.greatest(F.lit(0.0), F.col("md") - F.col("cd"))
    return staged.select(
        F.col("g").alias(group_col),
        F.col("o").alias(order_col),
        F.col("x").alias(value_col),
        pin6(s_pos).alias("s_pos6"),
        pin6(s_neg).alias("s_neg6"),
        ((s_pos > h) | (s_neg > h)).alias("alarm"),
    )


def mann_kendall(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Mann-Kendall trend TEST per group — the significance companion
    to `theil_sen_trend` (same pairwise shape; Theil-Sen says how
    steep, MK says whether a monotone trend exists at all):
    S = sum over pairs of sign(y_b - y_a) for x_a < x_b, an exact
    integer; Var(S) = [n(n-1)(2n+5) - sum_ties t(t-1)(2t+5)] / 18 with
    the tie correction over tied y groups; z = (S -/+ 1)/sqrt(Var)
    (continuity-corrected), |z| > 1.96 rejects "no trend" at 5%.

    S and the variance are integer arithmetic end to end (the /18 and
    sqrt happen once per group on exact integers), so the statistic is
    engine-exact with no pinning. Callers pre-sample like Theil-Sen to
    bound the O(m^2) pair stage. Returns (group, n_points, s_stat,
    var_s18 (=18*Var, integer), z, trending).
    """
    pts = df.select(
        F.col(group_col).alias("g"),
        F.col(x_col).cast("double").alias("px"),
        F.col(y_col).cast("double").alias("py"),
    )
    a = pts.select("g", F.col("px").alias("xa"), F.col("py").alias("ya"))
    b = pts.select("g", F.col("px").alias("xb"), F.col("py").alias("yb"))
    s = (
        a.join(b, "g")
        .filter(F.col("xa") < F.col("xb"))
        .groupBy("g")
        .agg(
            F.sum(F.signum(F.col("yb") - F.col("ya")).cast("long")).alias(
                "s_stat"
            )
        )
    )
    n = pts.groupBy("g").agg(F.count("*").alias("n"))
    ties = (
        pts.groupBy("g", "py")
        .agg(F.count("*").alias("t"))
        .filter(F.col("t") > 1)
        .groupBy("g")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    z = F.when(
        F.col("var_s18") > 0,
        F.when(F.col("s_stat") > 0, F.col("s_stat") - 1)
        .when(F.col("s_stat") < 0, F.col("s_stat") + 1)
        .otherwise(F.lit(0))
        .cast("double")
        / F.sqrt(F.col("var_s18").cast("double") / F.lit(18.0)),
    ).otherwise(F.lit(0.0))
    return (
        n.join(s, "g", "left")
        .join(ties, "g", "left")
        .select(
            F.col("g").alias(group_col),
            F.col("n").cast("long").alias("n_points"),
            F.coalesce("s_stat", F.lit(0)).cast("long").alias("s_stat"),
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.coalesce("tie_term", F.lit(0))
            ).cast("long").alias("var_s18"),
        )
        .withColumn("z", z)
        .withColumn("trending", F.abs(F.col("z")) > 1.96)
    )


def kaplan_meier(
    df: DataFrame,
    group_col: str,
    time_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan-Meier product-limit survival estimator (Kaplan & Meier,
    JASA 1958) per group — the page-LIFETIME question the change-rate
    estimators next door cannot answer: ``change_rate`` models how often
    a living page mutates; this models how long pages LIVE. Revisit
    waves observe each URL until it 404s/410s (an event at ``time_col``)
    or until the study ends with the page still alive (``event_col`` =
    0: right-censored — the observation that naive "average observed
    lifetime" arithmetic silently treats as a death, biasing lifetimes
    low exactly on the healthiest hosts). KM handles censoring exactly:
    S(t) = prod over event times t_i <= t of (1 - d_i / n_i), with d_i
    deaths at t_i and n_i the at-risk count (still observed at t_i-).
    The crawl read: per-host survival curves set recrawl/GC budgets —
    a host whose URLs half-die in 3 waves deserves revisits, not
    archive trust.

    Shape: one O(n) fact aggregation to the (group, t) event/censor
    table; everything after — the reverse-cumulative at-risk counts and
    the running product — windows over the DISTINCT-TIME dimension only
    (waves are small integers by construction), never the corpus.
    Determinism: d_i/n_i are exact small-int ratios; each ln(1 - d/n)
    term is 1e-9-pinned, the running sum is DECIMAL (order-independent),
    and S(t) = exp(sum) pins at 6 — the `lm_perplexity` ln/exp
    contract. Returns (group, t, n_risk, n_events, n_censored,
    survival6) for event times only (censoring times change n_risk but
    emit no curve step, per the estimator's definition).
    """
    base = df.select(
        F.col(group_col).alias("g"),
        F.col(time_col).cast("long").alias("t"),
        F.col(event_col).cast("int").alias("ev"),
    )
    per_t = base.groupBy("g", "t").agg(
        F.sum("ev").cast("long").alias("d"),
        F.sum(1 - F.col("ev")).cast("long").alias("c"),
        F.count("*").cast("long").alias("leaving"),
    )
    # at-risk at t = everyone whose observation time is >= t: a reverse
    # running sum over the per-group time dimension (rows = distinct
    # observation times, never the population)
    w_rev = (
        Window.partitionBy("g")
        .orderBy(F.desc("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("g")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = per_t.withColumn("n_risk", F.sum("leaving").over(w_rev))
    # d == n_risk (everyone still at risk dies) would put ln(0) = -inf
    # into the decimal sum; that row's survival is emitted as exact 0
    # below instead, so its term never enters the accumulator
    ln_term = F.when(
        (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
        pin9(
            F.log(
                F.lit(1.0)
                - F.col("d").cast("double") / F.col("n_risk").cast("double")
            )
        ),
    ).otherwise(F.lit(0.0))
    curve = (
        risk.withColumn(
            "_lnS",
            F.sum(ln_term.cast("decimal(28,9)")).over(w_fwd).cast("double"),
        )
        # S(t) hits exact 0 when d == n_risk (everyone left dies):
        # ln(0) is -inf, which decimal cannot carry — emit 0 directly
        .withColumn(
            "_dead",
            F.max((F.col("d") == F.col("n_risk")).cast("int")).over(w_fwd),
        )
        .filter(F.col("d") > 0)
        .select(
            F.col("g").alias(group_col),
            "t",
            "n_risk",
            F.col("d").alias("n_events"),
            F.col("c").alias("n_censored"),
            F.when(F.col("_dead") == 1, F.lit(0.0))
            .otherwise(pin6(F.exp(F.col("_lnS"))))
            .alias("survival6"),
        )
    )
    return curve
