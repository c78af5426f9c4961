"""Per-host politeness budget as a salted window rank.

Reference parity: the reference enforces politeness with hard sleeps
(CRAWL_DELAY=8.0s etc.; reference: src/config.py:49-50, sleeps all over
src/crawler/crawler.py). A distributed engine must not sleep: instead each
round grants every host a budget ``B = floor(round_seconds /
crawl_delay_s)`` and schedules at most the first B pending URLs per host
in the frontier's total order ``(priority, depth, discovery_seq,
url_hash)``. Unscheduled rows stay pending and keep their order -> the
sequence of fetches is exactly what a single polite crawler would do,
computed as a batch.

Skew: a mega-host with 10^8 pending URLs would put 10^8 rows in one
window partition. Two-phase select fixes it (north_rule: "salted
repartition by host"):

  phase 1: rank within (host, salt=pmod(url_hash, S)) — every partition
           holds ~1/S of a host's rows; keep rank <= B. This is a strict
           superset of the true per-host top-B (any row in the true top-B
           is within the top-B of its own salt slice).
  phase 2: exact rank within host over the <= S*B survivors — bounded
           input per host, no skew, exact result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ORDER_COLS = ["priority", "depth", "discovery_seq", "url_hash"]


def _order(order_cols: list[str] | None = None):
    return [F.col(c).asc() for c in (order_cols or ORDER_COLS)]


def politeness_select(
    allowed: DataFrame,
    budget_col: str = "budget",
    n_salt: int = 16,
    order_cols: list[str] | None = None,
    key_col: str = "host",
) -> DataFrame:
    """Keep the first ``budget`` pending rows per politeness key in
    frontier order.

    ``allowed`` must carry ``key_col`` (host by default; ``ip_id`` for
    the Mercator shared-IP refinement), the order columns and an int
    ``budget_col`` (constant per key). ``order_cols`` overrides the
    default ORDER_COLS total order (run_round passes the aged effective
    key). Returns the scheduled rows (budget columns kept).
    """
    salted = allowed.withColumn("_salt", F.pmod(F.col("url_hash"), F.lit(n_salt)))
    w1 = Window.partitionBy(key_col, "_salt").orderBy(*_order(order_cols))
    survivors = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= F.col(budget_col))
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy(key_col).orderBy(*_order(order_cols))
    return (
        survivors.withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= F.col(budget_col))
        .drop("_r2")
    )


def robots_gate(
    pending: DataFrame, robots: DataFrame, round_seconds: float
) -> tuple[DataFrame, DataFrame]:
    """Broadcast-join the robots dimension; split (allowed, denied).

    Reference parity: the one-time consent/filter-popup gate
    (src/crawler/crawler.py:65-117) -> per-host allow/deny dimension,
    broadcast once per round (north_rule). Missing hosts: allowed,
    crawl_delay 1.0s.
    Returns allowed rows with a per-host int ``budget`` column.
    """
    joined = pending.join(
        F.broadcast(robots.select("host", "deny_prefixes", "crawl_delay_s")),
        on="host",
        how="left",
    )
    path = F.regexp_replace(F.col("url_canon"), r"^[a-z]+://[^/]+", "")
    denied_pred = F.exists(
        F.coalesce(F.col("deny_prefixes"), F.array()),
        lambda p: path.startswith(p),
    )
    with_flag = joined.withColumn("_denied", denied_pred)
    allowed = (
        with_flag.filter(~F.col("_denied"))
        .withColumn(
            "budget",
            F.greatest(
                F.lit(1),
                F.floor(
                    F.lit(round_seconds) / F.coalesce(F.col("crawl_delay_s"), F.lit(1.0))
                ),
            ).cast("int"),
        )
        .drop("_denied", "deny_prefixes", "crawl_delay_s")
    )
    denied = with_flag.filter(F.col("_denied")).drop(
        "_denied", "deny_prefixes", "crawl_delay_s"
    )
    return allowed, denied


def adaptive_budgets(
    outcomes: DataFrame,
    base_budget: int = 8,
    min_budget: int = 1,
    max_budget: int = 32,
    fail_threshold: float = 0.2,
    base_delay_ms: int = 1000,
) -> DataFrame:
    """AIMD per-host budget adaptation from the previous round's fetch
    outcomes (host, ok): hosts failing above `fail_threshold` halve
    their budget (multiplicative decrease), healthy hosts gain +2
    (additive increase), clamped to [min_budget, max_budget]; the
    politeness delay stretches linearly with the failure rate.

    One groupBy over (host) — the output is one row per host, broadcast-
    sized for the next round's politeness_select join. The reference
    backs off per-request with fixed sleeps (base_crawler.py retry loop);
    at fleet scale the equivalent signal is this per-host feedback.
    Failure rate compares as an exact integer cross-product
    (n_fail * 10 > n * 2 for threshold 0.2) so no float ratio can
    diverge between engines."""
    thr_num = int(round(fail_threshold * 10))
    agg = outcomes.groupBy("host").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("ok"), 0).otherwise(1)).alias("n_fail"),
    )
    unhealthy = F.col("n_fail") * 10 > F.col("n") * thr_num
    return agg.select(
        "host",
        "n",
        "n_fail",
        F.when(
            unhealthy,
            F.greatest(F.lit(min_budget), F.floor(F.lit(base_budget) / 2).cast("int")),
        )
        .otherwise(F.least(F.lit(max_budget), F.lit(base_budget + 2)))
        .cast("int")
        .alias("next_budget"),
        F.floor(
            F.lit(float(base_delay_ms))
            * (F.lit(1.0) + F.lit(9.0) * F.col("n_fail") / F.col("n"))
        ).alias("next_delay_ms"),
    )


def apply_adaptive_delays(
    robots: DataFrame,
    budgets: DataFrame,
    round_seconds: float = 16.0,
) -> DataFrame:
    """Fold AIMD feedback (``adaptive_budgets`` output) into the robots
    dimension for the NEXT round: a host's effective crawl delay becomes
    max(its robots.txt delay, round_seconds / next_budget), i.e. the
    feedback can only slow a host down further than its declared delay,
    never override the site's own politeness floor. Hosts without
    feedback keep their current delay. One broadcast left join on the
    (tiny) dimension — the fact side is untouched."""
    fb = budgets.select(
        "host",
        (F.lit(float(round_seconds)) / F.col("next_budget")).alias("_fb_delay"),
    )
    return (
        robots.join(F.broadcast(fb), "host", "left")
        .withColumn(
            "crawl_delay_s",
            F.when(
                F.col("_fb_delay").isNotNull(),
                F.greatest(F.coalesce(F.col("crawl_delay_s"), F.lit(1.0)), F.col("_fb_delay")),
            ).otherwise(F.col("crawl_delay_s")),
        )
        .drop("_fb_delay")
    )


def rfc9309_gate(
    urls: DataFrame,
    rules: DataFrame,
    id_col: str = "url_hash",
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Full RFC 9309 §2.2.2-2.2.3 path gating: Allow AND Disallow rules
    with ``*`` wildcards and the trailing ``$`` anchor, longest-match
    (most-octets) precedence, Allow winning exact ties, and
    no-matching-rule defaulting to allowed.

    ``rules`` is :func:`functions.robots.robots_matcher_dim`'s output
    (host, pattern, like_pattern, allow) — broadcast-sized (a handful of
    rules per host). The match itself is native ``LIKE ... ESCAPE`` on a
    column pattern, so the whole gate stays JVM-side and is expressible
    verbatim in any ANSI oracle. Per-URL verdict = max_by over matching
    rules of (pattern length, allow, pattern) — a total order, so the
    argmax is deterministic in every engine.

    Output: urls + (allowed boolean, matched_pattern string|null).
    Shape at scale: one broadcast join + one map-side-combinable argmax
    per URL; the fact side never shuffles on a low-cardinality key.
    """
    r = rules.select(
        F.col("host").alias("_rhost"),
        "pattern",
        "like_pattern",
        "allow",
        F.length("pattern").alias("_plen"),
    )
    matched = (
        urls.select(id_col, host_col, path_col)
        .join(F.broadcast(r), F.col(host_col) == F.col("_rhost"))
        .filter(F.expr(f"{path_col} LIKE like_pattern ESCAPE '!'"))
        .groupBy(id_col)
        .agg(
            F.max_by(
                F.struct(F.col("allow"), F.col("pattern")),
                F.struct(
                    F.col("_plen"),
                    F.col("allow").cast("int"),
                    F.col("pattern"),
                ),
            ).alias("_best")
        )
    )
    return (
        urls.join(matched, id_col, "left")
        .withColumn("allowed", F.coalesce(F.col("_best.allow"), F.lit(True)))
        .withColumn("matched_pattern", F.col("_best.pattern"))
        .drop("_best")
    )


def stride_schedule(
    frontier: DataFrame,
    weights: DataFrame,
    budget: int,
    host_col: str = "host",
    order_cols: list[str] | None = None,
    weight_scale: int = 10080,
) -> DataFrame:
    """Weighted-fair (stride/WFQ) frontier admission: each host owns a
    virtual-time stream; its k-th URL finishes at vf = k * S / weight
    (S = ``weight_scale``, a highly-composite constant so common small
    weights divide it EXACTLY — integer virtual times, no float drift
    cross-engine). Admitting the globally earliest ``budget`` virtual
    finishes gives each host throughput proportional to its weight
    (stride scheduling; Waldspurger & Weihl OSDI'94), the
    generalization of the flat per-host politeness budget when hosts
    have unequal value (link-rank, sitemap priority, paid sources).

    Dataflow: per-host row_number (the same doc-sized window family as
    ``politeness_select``; at 10^10 rows the identical salted two-phase
    construction applies), integer vf, then a global TakeOrdered on
    (vf, host, k) — orderBy+limit compiles to TakeOrderedAndProject:
    only ``budget`` rows cross to the driver-side merge, the frontier
    is never globally sorted.

    ``weights`` is a (host, weight:int) dimension, broadcast. Hosts
    absent from it weigh 1. Ties are total: (vf, host, k).
    """
    oc = order_cols or ["priority", "depth", "discovery_seq"]
    w = Window.partitionBy(host_col).orderBy(*[F.col(c) for c in oc])
    ranked = (
        frontier.join(F.broadcast(weights), host_col, "left")
        .withColumn("weight", F.coalesce(F.col("weight"), F.lit(1)))
        .withColumn("k", F.row_number().over(w))
        .withColumn(
            "vf",
            (F.col("k").cast("long") * F.lit(weight_scale) / F.col("weight"))
            .cast("long"),
        )
    )
    return ranked.orderBy("vf", host_col, "k").limit(budget)


# lcm of f*(f+1) for f in 1..8 — keeps every marginal gain an exact int64
REFRESH_GAIN_SCALE = 2520


def refresh_allocation(
    hosts: DataFrame,
    budget: int,
    f_max: int = 8,
    host_col: str = "host",
    rate_col: str = "lam",
    value_col: str = "val",
) -> DataFrame:
    """Optimal refresh-frequency allocation under a global revisit
    budget (Cho & Garcia-Molina, TODS'03 "Effective page refresh
    policies"): spend B revisits/period across hosts so total
    value-weighted freshness is maximized.

    Objective per host: granting n visits to a host with change rate
    lam and value val earns val*lam*n/(n+1) (diminishing returns — the
    rational surrogate of the Poisson freshness curve, same concavity).
    The marginal gain of the f-th visit is val*lam*(1/f - 1/(f+1)) =
    val*lam/(f*(f+1)): strictly decreasing in f, so the greedy that
    grants the B globally-largest marginals is exactly optimal (matroid
    exchange on a concave separable objective), and every host's grant
    set is a prefix 1..n_visits. Gains are scaled by 2520 =
    lcm{f*(f+1): f<=8} so all arithmetic is int64 — rank order is
    engine-exact, no float ties.

    Plan shape: explode hosts x f_max marginal rows (map-side, no
    shuffle), then ``orderBy(gain desc, host, f).limit(B)`` — Spark
    executes TakeOrderedAndProject (per-partition top-B + driver
    merge), no global sort. At 10^8 hosts with B in the millions,
    swap the tail for a two-pass threshold select (approx_percentile
    to bracket the B-th gain, exact rank only inside the bracket);
    the marginal-row construction is unchanged.
    """
    if f_max * (f_max + 1) > REFRESH_GAIN_SCALE or REFRESH_GAIN_SCALE % (
        f_max * (f_max + 1)
    ):
        raise ValueError("f_max must keep gains integral (f*(f+1) | 2520)")
    marginals = hosts.select(
        F.col(host_col).alias("host"),
        F.col(rate_col).cast("long").alias("lam"),
        F.col(value_col).cast("long").alias("val"),
        F.explode(F.sequence(F.lit(1), F.lit(f_max))).alias("f"),
    ).withColumn(
        # integer `div`: the scale is an exact multiple of f*(f+1), so
        # this is exact int64 end-to-end (never touches doubles)
        "gain_scaled",
        F.expr(
            f"(val * lam * {REFRESH_GAIN_SCALE}L) div (f * (f + 1))"
        ),
    )
    top = marginals.orderBy(
        F.col("gain_scaled").desc(), F.col("host"), F.col("f")
    ).limit(budget)
    return (
        top.groupBy("host")
        .agg(
            F.count("*").cast("long").alias("n_visits"),
            F.sum("gain_scaled").alias("freshness_gain_scaled"),
        )
        .select("host", "n_visits", "freshness_gain_scaled")
    )


def aimd_trajectory(
    outcomes: DataFrame,
    init_rate: int = 4,
    max_rate: int = 64,
    min_rate: int = 1,
) -> DataFrame:
    """Stateless replay of the AIMD congestion controller over each
    host's full round history: rate <- rate+1 after a clean round
    (additive increase), rate <- max(min, rate div 2) after any failed
    fetch (multiplicative decrease) — TCP's fairness-converging rule
    applied to crawl admission (Chiu & Jain '89). ``adaptive_budgets``
    is the controller's one ONLINE step; this operator replays the
    whole trajectory from the outcome log in one batch pass, which is
    how a resumed or re-planned crawl recovers every host's converged
    rate WITHOUT per-round state tables.

    Input: one row per (host, round_id, n_failed). Plan shape: one
    groupBy(host) packing the history into an ordered array (rounds
    per host is a small constant — the crawl's round count, not data
    volume), then the entire recurrence runs inside one higher-order
    ``aggregate`` fold per row: no iteration, no driver loop, no
    Python, one shuffle total. All arithmetic is int64 (`div`), so the
    SQL oracle replays bit-equal.

    Output per host: final_rate, n_increase, n_decrease, peak_rate —
    the converged budget plus the oscillation profile (a host pinned
    at min_rate is the politeness analog of a congested link).
    """
    hist = outcomes.groupBy("host").agg(
        F.sort_array(
            F.collect_list(F.struct("round_id", "n_failed"))
        ).alias("h")
    )
    # fold state packed as one struct: (rate, n_inc, n_dec, peak)
    fold = F.expr(
        f"""aggregate(
             h,
             named_struct('rate', {init_rate}L, 'inc', 0L, 'dec', 0L,
                          'peak', {init_rate}L),
             (s, o) -> IF(
               o.n_failed > 0,
               named_struct(
                 'rate', greatest({min_rate}L, s.rate div 2),
                 'inc', s.inc, 'dec', s.dec + 1L, 'peak', s.peak),
               named_struct(
                 'rate', least({max_rate}L, s.rate + 1L),
                 'inc', s.inc + 1L, 'dec', s.dec,
                 'peak', greatest(s.peak, least({max_rate}L, s.rate + 1L))))
           )"""
    )
    return hist.select(
        "host",
        F.size("h").alias("n_rounds"),
        fold.alias("_s"),
    ).select(
        "host",
        "n_rounds",
        F.col("_s.rate").alias("final_rate"),
        F.col("_s.inc").alias("n_increase"),
        F.col("_s.dec").alias("n_decrease"),
        F.col("_s.peak").alias("peak_rate"),
    )


def wfq_schedule(
    jobs: DataFrame,
    weights: DataFrame,
    host_col: str = "host",
    size_col: str = "size",
    order_cols: list[str] | None = None,
    top_n: int | None = None,
) -> DataFrame:
    """Weighted fair queueing dispatch order (Demers, Keshav & Shenker
    SIGCOMM'89) over a batch frontier: host h's k-th job finishes at
    virtual time F = (cumulative size through k) / weight_h, and the
    fleet dispatches in ascending F — so over ANY prefix of the
    schedule each host's share of dispatches is proportional to its
    weight (the property round-robin politeness lacks: it can't give a
    high-value host 3x the slots without starving the rest; WFQ can,
    provably). With all jobs present at t=0 the classic virtual-clock
    recursion collapses to a per-host prefix sum — one window — and
    the global order is (F, host, k): TakeOrdered when ``top_n`` is
    set, never a global sort.

    ``weights``: (host_col, w) — a broadcast dimension; dyadic weights
    keep every finish time an exact double. Sizes are integers (bytes,
    cost units). Returns (host, k, size, vfinish[, dispatch_rank]).
    """
    w = Window.partitionBy(host_col).orderBy(*(order_cols or [size_col]))
    # LEFT join + default weight 1: a host missing from the weights
    # dimension must still be served (the stride scheduler's contract)
    # — an inner join would silently starve it
    t = (
        jobs.join(F.broadcast(weights), host_col, "left")
        .withColumn("w", F.coalesce(F.col("w"), F.lit(1.0)))
        .withColumn("k", F.row_number().over(w).cast("long"))
        .withColumn(
            "vfinish",
            F.sum(F.col(size_col).cast("double")).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            )
            / F.col("w"),
        )
    )
    out = t.select(host_col, "k", F.col(size_col).alias("size"), "vfinish")
    if top_n is None:
        return out
    ranked = out.orderBy("vfinish", host_col, "k").limit(top_n)
    wr = Window.orderBy("vfinish", host_col, "k")
    return ranked.withColumn(
        "dispatch_rank", F.row_number().over(wr).cast("long")
    )
