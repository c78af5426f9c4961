"""Probabilistic summary sketches over the corpus — deterministic,
SQL-portable constructions so the DuckDB oracle can reproduce every bit.

A 100 TB pipeline needs cheap cardinality and frequency answers without a
full distinct/groupBy shuffle of the raw keys:

* HyperLogLog (Flajolet et al. 2007) — distinct-count estimate from m=2^p
  max-rank registers. Built here as ONE groupBy over p-bit register ids
  (shuffle carries at most m rows per partition after partial agg), so
  the shuffle volume is O(m), not O(n_distinct). The harmonic-mean
  denominator is computed in INTEGER arithmetic (sum of 2^(53-rho), each
  term exact) so the estimate is order-independent and bit-identical on
  any engine; a float sum of 2^-rho would be summation-order dependent.
* Count-Min (Cormode & Muthukrishnan 2005) — d x w counter grid; point
  estimate = min over d rows. Built as one explode -> groupBy (row, col);
  the grid is d*w rows total regardless of corpus size, so it broadcasts
  for the estimate join.

Hashing is md5-digit arithmetic (same idiom as operators/pairs.py) so the
oracle mirrors it verbatim — no engine-specific hash in the plan.

Reference parity: the reference keeps only an exact seen-set
(src/database.py:126-136); these sketches are the scale path the survey's
dedup/metrics sections call for when exact state no longer fits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 60-bit hash from the first 15 md5 hex digits: portable to DuckDB as
# CAST(concat('0x', substring(md5(x), 1, 15)) AS BIGINT).
def _h60(expr: str) -> F.Column:
    return F.expr(f"cast(conv(substring(md5({expr}), 1, 15), 16, 10) as bigint)")


# ------------------------------------------------------------------ HLL

HLL_P = 8  # 2^8 = 256 registers; expected rel. error ~ 1.04/sqrt(m) = 6.5%
HLL_M = 1 << HLL_P
# bias constant alpha_m for m >= 128 (Flajolet et al., Fig. 3)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hll_registers(df: DataFrame, key_expr: str) -> DataFrame:
    """Registers (idx, rho_max) of an HLL sketch over `key_expr`.

    idx  = low p bits of the 60-bit hash
    rho  = 1-based position of the lowest set bit of the remaining 52
           bits (the max-trailing-zero variant — same estimator guarantees
           as leading-zero, but expressible with `x & -x` + bin-length,
           which both Spark and DuckDB evaluate identically), capped at
           53 when the suffix is all zeros.
    """
    h = _h60(key_expr)
    hw = df.select(h.alias("h")).select(
        (F.col("h") % HLL_M).cast("int").alias("idx"),
        F.expr(f"shiftright(h, {HLL_P})").alias("w"),
    )
    reg = hw.select(
        "idx",
        F.when(F.col("w") == 0, F.lit(53))
        .otherwise(F.length(F.bin(F.col("w").bitwiseAND(-F.col("w")))))
        .alias("rho"),
    )
    return reg.groupBy("idx").agg(F.max("rho").alias("rho_max"))


def hll_estimate(registers: DataFrame) -> DataFrame:
    """Raw HLL estimate alpha*m^2 / sum(2^-rho) from a register table.

    Unseen registers contribute 2^0 = 1 to the harmonic denominator; the
    sum is scaled by 2^53 and kept integral (each 2^(53-rho) term is an
    exact int64; 256 terms < 2^61) so it is order-independent. The one
    float division happens once at the end. Small-range / large-range
    bias corrections are intentionally omitted (documented raw estimator)
    so the oracle is a literal transcription.
    """
    return registers.agg(
        (
            F.sum(F.expr("shiftleft(1L, 53 - rho_max)"))
            + (F.lit(HLL_M) - F.count(F.lit(1)))  # absent registers: rho=0
            * F.lit(1 << 53).cast("long")
        ).alias("denom_scaled")
    ).select(
        F.round(
            F.lit(HLL_ALPHA * HLL_M * HLL_M)
            * F.pow(F.lit(2.0), 53)
            / F.col("denom_scaled"),
            3,
        ).alias("hll_estimate")
    )


# ------------------------------------------------------------ Count-Min

CM_DEPTH = 4
CM_WIDTH = 256


def _cm_col(row: int, key: str) -> F.Column:
    """Column index 0..255 for sketch row `row`: two md5 hex digits of the
    salted key — portable digit arithmetic, no engine hash."""
    salted = f"concat('cm{row}:', {key})"
    d1 = f"(instr('0123456789abcdef', substring(md5({salted}), 1, 1)) - 1)"
    d2 = f"(instr('0123456789abcdef', substring(md5({salted}), 2, 1)) - 1)"
    return F.expr(f"cast({d1} * 16 + {d2} as int)")


def countmin_build(df: DataFrame, key_col: str, weight_col: str | None = None) -> DataFrame:
    """d x w Count-Min grid as (cm_row, cm_col, cnt): each key occurrence
    increments one cell per row. One explode (d copies) + one groupBy —
    output is CM_DEPTH*CM_WIDTH rows max, independent of input size."""
    w = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    # ONE scan: each row posexplodes its d cell coordinates (a union of d
    # branches would rescan the input d times at corpus scale)
    cells = df.select(
        F.posexplode(F.array(*[_cm_col(r, key_col) for r in range(CM_DEPTH)])).alias(
            "cm_row", "cm_col"
        ),
        w.alias("w"),
    )
    return cells.groupBy("cm_row", "cm_col").agg(F.sum("w").alias("cnt"))


def countmin_estimate(sketch: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """Point estimates: min over the d cells a key hashes to. The sketch
    is tiny (d*w rows) -> broadcast join, no shuffle of the key set."""
    probes = keys.select(
        F.col(key_col),
        F.posexplode(F.array(*[_cm_col(r, key_col) for r in range(CM_DEPTH)])).alias(
            "cm_row", "cm_col"
        ),
    )
    return (
        probes.join(F.broadcast(sketch), ["cm_row", "cm_col"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("cm_est"))
    )


AMS_K = 16  # ±1 counters; estimate = median of k counter squares


def _ams_sign(j: int, key: str) -> F.Column:
    """±1 four-wise-ish sign for counter j: parity of one md5 hex digit
    of the salted key — portable digit arithmetic, no engine hash."""
    salted = f"concat('ams{j}:', {key})"
    d = f"(instr('0123456789abcdef', substring(md5({salted}), 1, 1)) - 1)"
    return F.expr(f"cast(1 - 2 * ({d} % 2) as long)")


def ams_f2(df: DataFrame, key_expr: str, k: int = AMS_K) -> DataFrame:
    """AMS second-frequency-moment sketch (Alon, Matias & Szegedy
    STOC'96): F2 = sum_x f_x^2 — the self-join size of a key column,
    the number a join planner needs to size a shuffle BEFORE running
    it. Each counter j accumulates sum_x sign_j(x) over one scan
    (int64, exact); counter^2 is an unbiased F2 estimate and the
    median of k counters concentrates it. Everything through the
    median is integer arithmetic, so the SQL oracle matches exactly.

    One posexplode (k copies per row) + one k-row aggregate — sketch
    size independent of input; at 10^10 rows this is the cheapest way
    to know whether a host-key shuffle will be skewed (F2 >> n means
    heavy keys) without a groupBy.

    Returns one row: (f2_exact, f2_est, counters used) — exact side
    computed alongside for the accuracy-envelope readout.
    """
    signs = df.select(
        F.posexplode(
            F.array(*[_ams_sign(j, key_expr) for j in range(k)])
        ).alias("j", "s")
    )
    counters = signs.groupBy("j").agg(F.sum("s").alias("c"))
    # median over k=even counters: mean of the two middle order stats,
    # exact in integer *2 space; emit both to stay integral
    sq = counters.select((F.col("c") * F.col("c")).alias("c2"))
    w = Window.orderBy("c2")  # k rows total — driver-sized, not a scale sort
    mid = sq.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn").isin(k // 2, k // 2 + 1)
    )
    est = mid.agg(F.sum("c2").alias("est2x"))  # 2 * median (integral)
    exact = (
        df.select(F.expr(key_expr).alias("key"))
        .groupBy("key")
        .agg(F.count("*").alias("f"))
        .agg(F.sum(F.col("f") * F.col("f")).alias("f2_exact"))
    )
    return exact.crossJoin(est).select(
        F.col("f2_exact").cast("long"),
        F.col("est2x").cast("long").alias("f2_est_2x"),
        F.lit(k).cast("int").alias("k"),
    )


# ------------------------------------------------- per-group HLL

def hll_registers_by(
    df: DataFrame, group_cols: list[str], key_expr: str
) -> DataFrame:
    """Per-group HLL registers: one sketch per `group_cols` value over
    `key_expr`. The shuffle carries at most m=256 register rows per
    group after map-side partial agg — the per-group approximate
    distinct count that replaces count_distinct's full key shuffle
    when groups are hot (10^6 URLs per host x 10^7 hosts). Same
    hash/rho recipe as the global sketch, so the oracle transcribes."""
    hw = df.select(*group_cols, _h60(key_expr).alias("h")).select(
        *group_cols,
        (F.col("h") % HLL_M).cast("int").alias("idx"),
        F.expr(f"shiftright(h, {HLL_P})").alias("w"),
    )
    reg = hw.select(
        *group_cols,
        "idx",
        F.when(F.col("w") == 0, F.lit(53))
        .otherwise(F.length(F.bin(F.col("w").bitwiseAND(-F.col("w")))))
        .alias("rho"),
    )
    return reg.groupBy(*group_cols, "idx").agg(F.max("rho").alias("rho_max"))


def hll_estimate_by(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Per-group raw HLL estimate from grouped registers — the same
    integer-scaled harmonic denominator as the global estimator
    (order-independent, engine-exact), one row per group."""
    return registers.groupBy(*group_cols).agg(
        (
            F.sum(F.expr("shiftleft(1L, 53 - rho_max)"))
            + (F.lit(HLL_M) - F.count(F.lit(1)))
            * F.lit(1 << 53).cast("long")
        ).alias("denom_scaled")
    ).select(
        *group_cols,
        F.round(
            F.lit(HLL_ALPHA * HLL_M * HLL_M)
            * F.pow(F.lit(2.0), 53)
            / F.col("denom_scaled"),
            3,
        ).alias("hll_estimate"),
    )


def countmin_join_size(
    a: DataFrame, a_key: str, b: DataFrame, b_key: str
) -> DataFrame:
    """Equi-join cardinality forecast from two Count-Min sketches
    (the AGMS/fast-AGMS inner-product estimator, Alon et al. '99 /
    Cormode & Garofalakis '05): |A JOIN B on k| = sum_k fA(k)*fB(k),
    upper-bounded by min over the d sketch rows of the row-wise inner
    product sum_col cntA*cntB. Two O(input) scans build the d*w grids;
    the estimate itself is a d*w-row join — the number a planner wants
    BEFORE committing a shuffle join at 10^10 rows (paired with ams_f2
    for the self-join case). Integer arithmetic end-to-end; exact join
    size co-computed from grouped counts as the accuracy witness."""
    sa = countmin_build(a, a_key)
    sb = countmin_build(b, b_key)
    ip = (
        sa.join(sb.withColumnRenamed("cnt", "cnt_b"), ["cm_row", "cm_col"])
        .groupBy("cm_row")
        .agg(F.sum(F.col("cnt") * F.col("cnt_b")).alias("ip"))
    )
    # a sketch row with NO colliding cells has inner product 0 (the
    # correct — and tightest — estimate); a bare min over the inner
    # join would skip it and return NULL on disjoint key spaces
    est = (
        sa.select("cm_row")
        .distinct()
        .join(ip, "cm_row", "left")
        .agg(F.min(F.coalesce(F.col("ip"), F.lit(0))).alias("join_size_est"))
    )
    fa = a.select(F.expr(a_key).alias("k")).groupBy("k").agg(
        F.count("*").alias("fa")
    )
    fb = b.select(F.expr(b_key).alias("k")).groupBy("k").agg(
        F.count("*").alias("fb")
    )
    exact = fa.join(fb, "k").agg(
        F.coalesce(F.sum(F.col("fa") * F.col("fb")), F.lit(0)).alias(
            "join_size_exact"
        )
    )
    return exact.crossJoin(est).select(
        F.col("join_size_exact").cast("long"),
        F.col("join_size_est").cast("long"),
    )


# ------------------------------------ HDR log-linear quantile sketch

HDR_SUB = 16  # mantissa sub-buckets per octave -> rel. error <= 1/(2*16)


def hdr_buckets(
    df: DataFrame, value_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Mergeable log-linear quantile histogram (the HdrHistogram /
    DDSketch log-bucket idea, Tene; Masson et al. VLDB'19) with
    INTEGER-EXACT bucket math so any engine reproduces it bit-for-bit.

    A positive integer value v lands in bucket (e, m):

      e = floor(log2(v))           computed as length(bin(v)) - 1 —
                                   pure string/integer ops, no float log
                                   whose last ulp could flip the bucket
      m = ((v - 2^e) * SUB) div 2^e   linear sub-bucket within the octave

    Bucket width is 2^e/SUB, so a midpoint estimate carries relative
    error <= 1/(2*SUB) by construction. Sketch state is at most
    64*SUB rows per group REGARDLESS of n — the groupBy partial-
    aggregates map-side, so shuffle volume is bounded by
    groups x buckets, not by rows. Merging sketches = summing counts
    per (e, m): per-host sketches roll up to a fleet sketch without
    re-reading raw data (the property approx_percentile's t-digest
    gives you opaquely; this one is SQL-portable and oracle-exact).

    Values < 1 are dropped (callers measure positive latencies);
    the caller owns any offset shift for zero/negative domains.
    """
    gcols = list(group_cols or [])
    v = F.col(value_col).cast("long")
    based = (
        df.filter(v >= 1)
        .select(*gcols, v.alias("v"))
        .withColumn("e", (F.length(F.bin(F.col("v"))) - F.lit(1)).cast("int"))
        .withColumn(
            "m",
            F.expr(f"cast(((v - shiftleft(1L, e)) * {HDR_SUB}) div shiftleft(1L, e) as int)"),
        )
    )
    return based.groupBy(*gcols, "e", "m").agg(F.count(F.lit(1)).alias("cnt"))


def hdr_quantiles(
    buckets: DataFrame,
    group_cols: list[str],
    q_permille: tuple[int, ...] = (500, 950, 990),
) -> DataFrame:
    """Quantile extraction from an hdr_buckets sketch: nearest-rank
    (rank = ceil(q*n) in integer arithmetic), located by a cumulative
    window over the BUCKET dimension (<= 64*SUB rows per group — the
    window never sees raw data). The estimate is the bucket midpoint
    2^e * (2*SUB + 2m + 1) / (2*SUB): an int64 numerator over a
    power-of-two denominator, hence exact in IEEE doubles — no rounding
    pin needed. Output: group_cols, q_permille, n, rnk, est_mid.
    """
    wg = Window.partitionBy(*group_cols)
    wc = wg.orderBy("e", "m").rowsBetween(Window.unboundedPreceding, 0)
    qarr = F.array(*[F.lit(int(q)) for q in q_permille])
    return (
        buckets.withColumn("n", F.sum("cnt").over(wg))
        .withColumn("cum", F.sum("cnt").over(wc))
        .withColumn("q_permille", F.explode(qarr))
        .withColumn("rnk", F.expr("(q_permille * n + 999) div 1000"))
        .filter((F.col("cum") >= F.col("rnk")) & (F.col("cum") - F.col("cnt") < F.col("rnk")))
        .select(
            *group_cols,
            "q_permille",
            F.col("n").cast("long").alias("n"),
            F.col("rnk").cast("long").alias("rnk"),
            (
                F.expr(f"shiftleft(1L, e) * ({2 * HDR_SUB} + 2 * m + 1)")
                / F.lit(2.0 * HDR_SUB)
            ).alias("est_mid"),
        )
    )


# --------------------------------------------- KMV / theta set algebra

KMV_K = 64  # expected rel. error ~ 1/sqrt(k-1) = 12.6%; sketch = 64 rows


def kmv_sketch(
    df: DataFrame,
    key_expr: str,
    group_cols: list[str],
    k: int = KMV_K,
    n_salts: int = 32,
) -> DataFrame:
    """K-Minimum-Values sketch (Bar-Yossef et al. RANDOM'02; Beyer et
    al. SIGMOD'07) per group: the k smallest 60-bit hash values of the
    group's distinct keys. Unlike HLL registers (hll_registers_by),
    KMV sketches support SET ALGEBRA — union AND intersection
    cardinalities (`kmv_set_algebra`), which no register sketch can
    intersect. This is the vocabulary-overlap / audience-overlap
    primitive: |tokens(src A) ∩ tokens(src B)| across 10^10 docs from
    two k-row summaries.

    Shape: one distinct on (group, h) — the only O(n) shuffle — then
    the k-smallest per group via the salted two-phase window
    (politeness.py's pattern): rank within (group, pmod(h, n_salts))
    keep <= k, then rank the surviving <= n_salts*k rows per group.
    A single giant group never funnels through one task.

    Output: (group_cols..., rnk 1..k, h, u) with u = h / 2^60 in
    [0, 1). Hash collisions collapse in hash space (standard KMV
    semantics); ordering is total because h is distinct within a group.
    """
    hashed = (
        df.select(*group_cols, F.expr(key_expr).alias("_k"))
        .withColumn("h", _h60("_k"))
        .select(*group_cols, "h")
        .distinct()
    )
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy("h")
    w2 = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashed.withColumn("_salt", F.pmod("h", F.lit(n_salts)))
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
        .select(
            *group_cols,
            "rnk",
            "h",
            (F.col("h") / F.lit(float(1 << 60))).alias("u"),
        )
    )


def kmv_estimate(
    sketch: DataFrame, group_cols: list[str], k: int = KMV_K
) -> DataFrame:
    """Distinct-count estimate per group from a `kmv_sketch`:
    (k-1)/u_k (the unbiased KMV estimator), falling back to the exact
    kept count when the group has fewer than k distinct hashes (then
    the sketch IS the distinct set). Returns (group_cols..., n_kept,
    theta, est_distinct)."""
    return (
        sketch.groupBy(*group_cols)
        .agg(F.count("*").alias("n_kept"), F.max("u").alias("theta"))
        .select(
            *group_cols,
            F.col("n_kept").cast("long").alias("n_kept"),
            "theta",
            F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
            .otherwise(F.lit(float(k - 1)) / F.col("theta"))
            .alias("est_distinct"),
        )
    )


def kmv_set_algebra(
    sketch: DataFrame, group_col: str, k: int = KMV_K
) -> DataFrame:
    """Theta-sketch set algebra over every pair of groups in a
    `kmv_sketch` table: estimated |A ∪ B|, |A ∩ B|, and Jaccard from
    the two k-row sketches alone — O(groups^2 * k) work on
    dimension-sized inputs, never touching the raw keys again.

    Union: the k smallest of the merged hash sets -> (k-1)/u_k.
    Intersection (theta-sketch rule, Dasgupta et al. / DataSketches):
    theta = min(theta_A, theta_B) with theta_X = 1 when X kept fewer
    than k (its sketch is exhaustive); matched hashes below theta form
    the intersection sample; est = |sample| / theta.

    Output per pair (a < b): (set_a, set_b, est_union, est_inter,
    est_jaccard) — doubles, unpinned (callers pin for display).
    """
    g = F.col(group_col)
    stats = (
        sketch.groupBy(group_col)
        .agg(F.count("*").alias("cnt"), F.max("u").alias("mx"))
        .withColumn(
            "theta",
            F.when(F.col("cnt") < k, F.lit(1.0)).otherwise(F.col("mx")),
        )
    )
    a = sketch.select(
        g.alias("set_a"), F.col("h").alias("ha"), F.col("u").alias("ua")
    )
    b = sketch.select(
        g.alias("set_b"), F.col("h").alias("hb"), F.col("u").alias("ub")
    )
    # union sketch per pair: k smallest distinct h of A ∪ B
    pairs = (
        stats.select(F.col(group_col).alias("set_a"))
        .crossJoin(stats.select(F.col(group_col).alias("set_b")))
        .filter(F.col("set_a") < F.col("set_b"))
    )
    merged = (
        pairs.join(a, "set_a")
        .select("set_a", "set_b", F.col("ha").alias("h"), F.col("ua").alias("u"))
        .unionByName(
            pairs.join(b, "set_b").select(
                "set_a", "set_b", F.col("hb").alias("h"), F.col("ub").alias("u")
            )
        )
        .distinct()
    )
    wu = Window.partitionBy("set_a", "set_b").orderBy("h")
    union_est = (
        merged.withColumn("rnk", F.row_number().over(wu))
        .filter(F.col("rnk") <= k)
        .groupBy("set_a", "set_b")
        .agg(F.count("*").alias("ucnt"), F.max("u").alias("utheta"))
        .select(
            "set_a",
            "set_b",
            F.when(F.col("ucnt") < k, F.col("ucnt").cast("double"))
            .otherwise(F.lit(float(k - 1)) / F.col("utheta"))
            .alias("est_union"),
        )
    )
    ta = stats.select(F.col(group_col).alias("set_a"), F.col("theta").alias("tha"))
    tb = stats.select(F.col(group_col).alias("set_b"), F.col("theta").alias("thb"))
    inter_est = (
        a.join(b, F.col("ha") == F.col("hb"))
        .filter(F.col("set_a") < F.col("set_b"))
        .join(ta, "set_a")
        .join(tb, "set_b")
        .withColumn("theta", F.least("tha", "thb"))
        .filter(F.col("ua") < F.col("theta"))
        .groupBy("set_a", "set_b", "theta")
        .agg(F.count("*").alias("icnt"))
        .select(
            "set_a",
            "set_b",
            (F.col("icnt") / F.col("theta")).alias("est_inter"),
        )
    )
    return (
        union_est.join(inter_est, ["set_a", "set_b"], "left")
        .select(
            "set_a",
            "set_b",
            "est_union",
            F.coalesce("est_inter", F.lit(0.0)).alias("est_inter"),
            (
                F.coalesce("est_inter", F.lit(0.0)) / F.col("est_union")
            ).alias("est_jaccard"),
        )
    )


# ------------------------------------------ DGIM sliding-window counting


def dgim_counts(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    bit_expr: str,
    window_n: int,
) -> DataFrame:
    """DGIM sliding-window bit counting (Datar, Gionis, Indyk, Motwani
    SODA'02): per group, estimate how many of the LAST ``window_n``
    events satisfied ``bit_expr`` using O(log^2 N) state — the "error
    rate over the last million fetches per host" counter a fetcher
    fleet keeps where an exact ring buffer of 10^6 timestamps per host
    would not fit. Buckets hold power-of-two counts of 1s, at most two
    per size; when a third appears the two older merge; estimate =
    full buckets + half the oldest overlapping bucket, with relative
    error <= 50% by construction (the oldest bucket contributes at
    most half its size in uncertainty).

    The recursion is inherently sequential per group, so this is an
    ``applyInPandas`` grouped map — the legitimate Python seam: state
    is O(log^2 N) per group, each group's series arrives as one Arrow
    batch, and groups parallelize across the cluster. Deterministic
    (no sampling), so results are stable across partitionings; there
    is no SQL oracle by nature (bucket merging is a fold) — exactness
    is pinned by the pytest mirror and the in-operator exact witness.

    Returns per group: (group_cols..., n_events, est_ones, exact_ones,
    n_buckets) with exact_ones computed from the same tail for the
    sandbox witness (dropped at scale — it is the thing DGIM avoids
    storing).
    """
    import pandas as pd

    from pyspark.sql import types as T

    out_fields = [df.schema[c] for c in group_cols]
    schema = T.StructType(
        list(out_fields)
        + [
            T.StructField("n_events", T.LongType()),
            T.StructField("est_ones", T.LongType()),
            T.StructField("exact_ones", T.LongType()),
            T.StructField("n_buckets", T.IntegerType()),
        ]
    )
    src = df.select(
        *group_cols,
        F.col(order_col).alias("_o"),
        F.expr(bit_expr).cast("int").alias("_b"),
    )

    def go(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_o")
        buckets: list[tuple[int, int]] = []  # (end_time, size), newest first
        t = 0
        bits = []
        for b in pdf["_b"]:
            t += 1
            bits.append(int(b))
            if b:
                buckets.insert(0, (t, 1))
                # enforce <= 2 buckets per size, merging oldest pair
                i = 0
                while i + 2 < len(buckets):
                    if buckets[i][1] == buckets[i + 1][1] == buckets[i + 2][1]:
                        # merge the two OLDER ones (i+1, i+2)
                        merged = (buckets[i + 1][0], buckets[i + 1][1] * 2)
                        buckets[i + 1 : i + 3] = [merged]
                    else:
                        i += 1
            # expire buckets whose end fell out of the window
            while buckets and buckets[-1][0] <= t - window_n:
                buckets.pop()
        est = 0
        for j, (_, sz) in enumerate(buckets):
            est += sz if j < len(buckets) - 1 else (sz + 1) // 2
        exact = sum(bits[-window_n:])
        head = {c: pdf.iloc[0][c] for c in group_cols}
        return pd.DataFrame(
            [
                {
                    **head,
                    "n_events": len(bits),
                    "est_ones": int(est),
                    "exact_ones": int(exact),
                    "n_buckets": len(buckets),
                }
            ]
        )

    return src.groupBy(*group_cols).applyInPandas(go, schema=schema)


def trailing_distinct_hll(
    df: DataFrame,
    day_col: str,
    key_expr: str,
    window_days: int = 7,
) -> DataFrame:
    """Trailing-N-day distinct counts from MERGEABLE per-day HLL
    sketches: build one register set per day (the only pass over the
    facts), then merge each day's trailing window by taking the
    per-register max over a RANGE frame — the sliding-window distinct
    a 10^10-event stream cannot answer exactly without keeping every
    (day, key) pair hot. Register merge = max is exactly HLL union, so
    the trailing estimate equals the sketch built directly on the
    window's union (mergeability, tested for KMV and HLL alike).

    Dataflow: facts -> per-(day, idx) registers (shuffle carries <=
    m rows/day after partial agg); a (day x m) DIMENSION grid
    left-joins the registers so absent registers still ride the
    window; one range-frame window per register index; the estimator
    reuses `hll_estimate_by`. Day gaps are safe — the frame is
    value-ranged, not row-counted.

    ``day_col`` must be an integer day number. Returns (day,
    hll_estimate) — one row per day present in ``df``.
    """
    spark = df.sparkSession
    regs = hll_registers_by(
        df.select(F.col(day_col).alias("_day"), F.expr("*")), ["_day"], key_expr
    )
    days = regs.select("_day").distinct()
    grid = days.crossJoin(
        F.broadcast(
            spark.range(HLL_M).select(F.col("id").cast("int").alias("idx"))
        )
    )
    j = grid.join(regs, ["_day", "idx"], "left")
    w = (
        Window.partitionBy("idx")
        .orderBy("_day")
        .rangeBetween(-(window_days - 1), 0)
    )
    merged = j.withColumn("rho_t", F.max("rho_max").over(w)).filter(
        F.col("rho_t").isNotNull()
    )
    return hll_estimate_by(
        merged.select("_day", "idx", F.col("rho_t").alias("rho_max")),
        ["_day"],
    ).select(F.col("_day").alias("day"), "hll_estimate")


def misra_gries_fold(items, k: int):
    """Pure sequential Misra-Gries(k) fold (shared by operator and
    tests): returns dict of up to k counters. Decrement-all when a new
    item arrives with k counters live."""
    c: dict = {}
    for it in items:
        if it in c:
            c[it] += 1
        elif len(c) < k:
            c[it] = 1
        else:
            dead = []
            for key2 in c:
                c[key2] -= 1
                if c[key2] == 0:
                    dead.append(key2)
            for key2 in dead:
                del c[key2]
    return c


def mg_merge(summaries, k: int):
    """Merge Misra-Gries summaries (Agarwal et al., PODS'12): sum
    matching counters, then subtract the (k+1)-th largest count and
    drop non-positive — the combined summary keeps the n/(k+1) error
    bound of a single pass over the concatenated stream. `summaries`
    iterates dicts in a DETERMINISTIC order supplied by the caller."""
    tot: dict = {}
    for s in summaries:
        for it, n in s.items():
            tot[it] = tot.get(it, 0) + n
    if len(tot) > k:
        # deterministic selection: count desc, item asc
        ordered = sorted(tot.items(), key=lambda kv: (-kv[1], str(kv[0])))
        cut = ordered[k][1]
        tot = {it: n - cut for it, n in ordered if n - cut > 0}
    return tot


def misra_gries(
    df: DataFrame,
    item_col: str,
    order_col: str,
    k: int = 8,
    n_buckets: int = 16,
) -> DataFrame:
    """Distributed Misra-Gries heavy hitters — the DETERMINISTIC-
    guarantee member of the frequency-sketch family: unlike Count-Min
    (probabilistic overestimates, countmin_build above), an MG summary
    of size k UNDERestimates every count by at most n/(k+1), and every
    item with true frequency > n/(k+1) is guaranteed present. The
    price is a fold, not an algebraic aggregate — so the Spark shape
    is: rows hash into ``n_buckets`` DETERMINISTIC buckets by
    xxhash64(order_col) (row-stable: independent of physical
    partitioning), each bucket folds MG(k) sequentially over its rows
    in order_col order (applyInPandas — bounded O(k) state per task at
    ANY key cardinality, the thing exact counting can't promise), and
    the <= n_buckets*k counter rows merge once with the PODS'12
    mergeable-summaries rule (error bound preserved end to end).

    No SQL oracle by nature (two nested folds); exactness of the
    plumbing is pinned by the pytest mirror, the guarantee bounds, and
    the partitioning-invariance test. Returns (item, mg_count) —
    mg_count is a LOWER bound on the true count, within n/(k+1).
    """
    import pandas as pd

    spark = df.sparkSession
    bucketed = df.select(
        F.pmod(F.xxhash64(F.col(order_col)), F.lit(n_buckets)).alias("_b"),
        F.col(item_col).alias("_it"),
        F.col(order_col).alias("_o"),
    )

    def fold_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_o", kind="mergesort")
        c = misra_gries_fold(pdf["_it"], k)
        return pd.DataFrame(
            {
                "_b": pd.array([pdf["_b"].iloc[0]] * len(c), dtype="int64"),
                "item": list(c.keys()),
                "cnt": pd.array(list(c.values()), dtype="int64"),
            }
        )

    partials = bucketed.groupBy("_b").applyInPandas(
        fold_bucket, "_b long, item string, cnt long"
    )

    def merge_all(pdf: pd.DataFrame) -> pd.DataFrame:
        by_bucket: dict = {}
        for b, it, n in zip(pdf["_b"], pdf["item"], pdf["cnt"]):
            by_bucket.setdefault(int(b), {})[it] = int(n)
        merged = mg_merge(
            (by_bucket[b] for b in sorted(by_bucket)), k
        )
        return pd.DataFrame(
            {
                "item": list(merged.keys()),
                "mg_count": pd.array(list(merged.values()), dtype="int64"),
            }
        )

    return (
        partials.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(
            lambda pdf: merge_all(pdf), "item string, mg_count long"
        )
    )


def _cs_col(r: int, key_col: str):
    """Count-sketch column for hash row r: md5 hex pair -> 0..255."""
    return (
        (F.expr(f"instr('0123456789abcdef', substring(md5(concat('cs{r}:', {key_col})), 1, 1)) - 1") * 16)
        + F.expr(f"instr('0123456789abcdef', substring(md5(concat('cs{r}:', {key_col})), 2, 1)) - 1")
    )


def _cs_sign(r: int, key_col: str):
    """Count-sketch sign for hash row r: +1/-1 from an md5 hex digit."""
    d = F.expr(
        f"instr('0123456789abcdef', substring(md5(concat('cs{r}:', {key_col})), 3, 1)) - 1"
    )
    return F.when(d % 2 == 0, F.lit(1)).otherwise(F.lit(-1)).cast("long")


def countsketch_build(
    df: DataFrame, key_col: str, depth: int = 4
) -> DataFrame:
    """Count-Sketch grid (Charikar, Chen, Farach-Colton ICALP'02) —
    the UNBIASED member of the frequency-sketch family: Count-Min's
    estimates are always >= truth (every collision adds), Count-Sketch
    gives each key a random +/-1 sign per row so colliding keys CANCEL
    in expectation and the per-row estimate sign(k)*cell is unbiased;
    the median over rows concentrates it. The practical difference:
    CM's bias scales with total stream mass (heavy-tailed streams
    inflate every estimate), Count-Sketch's error scales with the L2
    norm — much smaller on skewed token streams.

    Same scale shape as countmin_build: one posexplode scan (depth
    copies), one combinable groupBy; the grid is depth x 256 rows
    regardless of input. Deterministic md5 columns and signs.
    """
    # one posexplode of (col, sign) structs — a single scan carries
    # both coordinates and signs
    cells = df.select(
        F.posexplode(
            F.array(
                *[
                    F.struct(
                        _cs_col(r, key_col).alias("c"),
                        _cs_sign(r, key_col).alias("s"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cs_row", "cs")
    ).select("cs_row", F.col("cs.c").alias("cs_col"), F.col("cs.s").alias("sgn"))
    return cells.groupBy("cs_row", "cs_col").agg(
        F.sum("sgn").alias("cell")
    )


def countsketch_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, depth: int = 4
) -> DataFrame:
    """Point estimates: MEDIAN over rows of sign(k, r) * cell[r, col(k,
    r)] — lower median (no interpolation: engine-identical order
    statistic, the repo's robust-stats convention). Sketch is tiny ->
    broadcast join."""
    probes = keys.select(
        F.col(key_col),
        F.posexplode(
            F.array(
                *[
                    F.struct(
                        _cs_col(r, key_col).alias("c"),
                        _cs_sign(r, key_col).alias("s"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cs_row", "cs"),
    ).select(
        key_col, "cs_row", F.col("cs.c").alias("cs_col"), F.col("cs.s").alias("sgn")
    )
    vals = probes.join(F.broadcast(sketch), ["cs_row", "cs_col"]).select(
        key_col, (F.col("sgn") * F.col("cell")).alias("v")
    )
    # lower median of `depth` values: element at index ceil(d/2) of the
    # ascending sort (1-based) — engine-identical, no interpolation
    idx = (depth + 1) // 2
    return vals.groupBy(key_col).agg(
        F.element_at(F.array_sort(F.collect_list("v")), idx).alias("cs_est")
    )
