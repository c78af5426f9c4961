"""Sketch accuracy envelopes: the 100 TB substitutes for exact
distinct-count and exact percentiles.

At sandbox scale the engine's shipped queries use exact forms
(count(DISTINCT), interpolated percentile in `length_quantiles`) so the
DuckDB oracle can hash-match them. At 10^10 rows, exact distinct is a
full shuffle of the key universe and exact percentiles a global sort —
both replaced by one-pass mergeable sketches (HyperLogLog++ via
`approx_count_distinct`, KLL-style via `percentile_approx`). These
tests pin the error envelope we rely on when making that swap, on the
same testdata tables the exact queries run over.
"""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_hll_distinct_within_rsd(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    rsd = 0.02
    got = e.agg(
        F.approx_count_distinct("user_id", rsd).alias("approx"),
        F.count_distinct("user_id").alias("exact"),
    ).first()
    # HLL++ standard error ~ rsd; 5x headroom keeps this deterministic
    assert abs(got["approx"] - got["exact"]) <= max(5, 5 * rsd * got["exact"])


def test_hll_distinct_per_group_within_rsd(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    rows = (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx"),
            F.count_distinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert len(rows) == 5
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= max(5, 0.1 * r["exact"])


def test_percentile_approx_brackets_exact(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    got = d.agg(
        F.percentile_approx("n_chars", [0.5, 0.9], 10000).alias("approx"),
        F.expr("percentile(n_chars, array(0.5, 0.9))").alias("exact"),
    ).first()
    n = d.count()
    # accuracy parameter 10000 => rank error <= n/10000
    tol_rank = max(1, n // 10000)
    for a, x in zip(got["approx"], got["exact"]):
        # approx returns an actual data value within tol_rank ranks;
        # bound the VALUE error by the exact quantile neighborhood
        lo = d.filter(F.col("n_chars") <= a).count()
        want_lo = d.filter(F.col("n_chars") <= x).count()
        assert abs(lo - want_lo) <= max(tol_rank, int(0.01 * n))


def test_sketches_are_mergeable_across_partitions(spark):
    """The property that makes sketches the scale path: partial
    per-partition sketches merged == one global sketch (no second
    full-data pass). Spark guarantees this internally; assert it
    end-to-end by comparing a repartitioned run to a single-partition
    run — identical estimates, not merely close ones."""
    e = spark.read.parquet(f"{SF}/events.parquet")
    a = e.repartition(16).agg(
        F.approx_count_distinct("user_id", 0.02).alias("x")
    ).first()["x"]
    b = e.coalesce(1).agg(
        F.approx_count_distinct("user_id", 0.02).alias("x")
    ).first()["x"]
    assert a == b


def test_own_hll_estimate_error_and_mergeability(spark):
    """The from-scratch deterministic HLL (operators/sketches.py): the
    estimate lands within 4x the theoretical RSD (1.04/sqrt(256) = 6.5%),
    and registers built on disjoint halves merge (max per idx) to exactly
    the registers of the whole — the property that lets partial sketches
    combine across partitions/executors without rescanning."""
    from crawler_spark.operators.sketches import hll_estimate, hll_registers

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    keys = docs.select(F.col("doc_id").cast("string").alias("k"))
    est = hll_estimate(hll_registers(keys, "k")).first()["hll_estimate"]
    exact = keys.distinct().count()
    assert abs(est - exact) / exact < 4 * 1.04 / (256 ** 0.5)

    lo = keys.filter(F.col("k").cast("long") % 2 == 0)
    hi = keys.filter(F.col("k").cast("long") % 2 == 1)
    merged = (
        hll_registers(lo, "k")
        .unionByName(hll_registers(hi, "k"))
        .groupBy("idx")
        .agg(F.max("rho_max").alias("rho_max"))
    )
    whole = hll_registers(keys, "k")
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_own_countmin_never_undercounts(spark):
    """CM point estimates dominate exact counts (the one-sided error
    guarantee) and the grid stays at most depth*width rows."""
    from crawler_spark.operators.sketches import (
        CM_DEPTH,
        CM_WIDTH,
        countmin_build,
        countmin_estimate,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = docs.select(
        F.explode(F.split(F.lower(F.trim("text")), "\\s+")).alias("tok")
    ).filter(F.length("tok") > 0)
    sketch = countmin_build(toks, "tok")
    assert sketch.count() <= CM_DEPTH * CM_WIDTH
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = countmin_estimate(sketch, exact.select("tok"), "tok")
    bad = exact.join(est, "tok").filter(F.col("cm_est") < F.col("exact_cnt"))
    assert bad.count() == 0


def _py_ams(keys, k=16):
    import hashlib

    cs = [0] * k
    for key in keys:
        for j in range(k):
            d = int(hashlib.md5(f"ams{j}:{key}".encode()).hexdigest()[0], 16)
            cs[j] += 1 - 2 * (d % 2)
    sq = sorted(c * c for c in cs)
    est2x = sq[k // 2 - 1] + sq[k // 2]
    from collections import Counter

    f2 = sum(v * v for v in Counter(keys).values())
    return f2, est2x


def test_ams_f2_matches_pure_python_and_concentrates(spark):
    from crawler_spark.operators.sketches import ams_f2

    # skewed key stream: one heavy key + uniform tail (the shape the
    # sketch exists to flag)
    keys = ["hot"] * 120 + [f"k{i}" for i in range(80)]
    df = spark.createDataFrame([(x,) for x in keys], "host string")
    r = ams_f2(df, "host").collect()[0]
    f2, est2x = _py_ams(keys)
    assert (r.f2_exact, r.f2_est_2x, r.k) == (f2, est2x, 16)
    # estimate concentrates: median-of-16 within 3x on this stream
    assert f2 / 3 <= est2x / 2 <= 3 * f2


def test_kmv_estimate_error_and_small_set_exactness(spark):
    """KMV distinct estimate lands within ~4/sqrt(k-1) of truth for a
    large set; a set smaller than k is returned EXACTLY (the sketch is
    then the whole distinct set). Estimates are partitioning-invariant
    (k-smallest is a total order on distinct hashes)."""
    from crawler_spark.operators.sketches import (
        kmv_estimate,
        kmv_set_algebra,
        kmv_sketch,
    )

    k = 64
    rows = [(f"big", f"key{i}") for i in range(5000)] + [
        ("small", f"key{i}") for i in range(40)
    ]
    df = spark.createDataFrame(rows, "grp string, key string")
    for parts in (1, 7):
        sk = kmv_sketch(df.repartition(parts), "key", ["grp"], k=k)
        est = {r["grp"]: r for r in kmv_estimate(sk, ["grp"], k=k).collect()}
        assert est["small"]["est_distinct"] == 40.0  # exact below k
        assert abs(est["big"]["est_distinct"] - 5000) / 5000 < 4 / (k - 1) ** 0.5


def test_kmv_set_algebra_brackets_exact_overlap(spark):
    """Union/intersection/Jaccard estimates from sketches alone bracket
    the planted truth: A = 0..2999, B = 2000..4999 (overlap 1000,
    union 5000, jaccard 0.2)."""
    from crawler_spark.operators.sketches import kmv_set_algebra, kmv_sketch

    rows = [("A", f"k{i}") for i in range(3000)] + [
        ("B", f"k{i}") for i in range(2000, 5000)
    ]
    df = spark.createDataFrame(rows, "grp string, key string")
    sk = kmv_sketch(df, "key", ["grp"], k=64)
    r = kmv_set_algebra(sk, "grp", k=64).collect()[0]
    assert r["set_a"] == "A" and r["set_b"] == "B"
    assert abs(r["est_union"] - 5000) / 5000 < 0.5
    assert abs(r["est_inter"] - 1000) / 1000 < 0.6
    assert 0.05 < r["est_jaccard"] < 0.5


def test_kmv_sketch_merges_across_waves(spark):
    """KMV is a mergeable summary: re-k-min of the UNION of two waves'
    sketches equals the sketch of the combined corpus — the property
    that lets a daily crawl maintain per-source vocabulary sketches
    incrementally without rescanning history."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from crawler_spark.operators.sketches import kmv_sketch

    k = 32
    wave1 = [("s", f"k{i}") for i in range(0, 800)]
    wave2 = [("s", f"k{i}") for i in range(500, 1500)]
    d1 = spark.createDataFrame(wave1, "grp string, key string")
    d2 = spark.createDataFrame(wave2, "grp string, key string")
    full = kmv_sketch(d1.union(d2), "key", ["grp"], k=k)
    s1 = kmv_sketch(d1, "key", ["grp"], k=k)
    s2 = kmv_sketch(d2, "key", ["grp"], k=k)
    merged = (
        s1.select("grp", "h", "u")
        .unionByName(s2.select("grp", "h", "u"))
        .distinct()
        .withColumn(
            "rnk",
            F.row_number().over(Window.partitionBy("grp").orderBy("h")),
        )
        .filter(F.col("rnk") <= k)
    )
    a = {(r["rnk"], r["h"]) for r in full.collect()}
    b = {(r["rnk"], r["h"]) for r in merged.collect()}
    assert a == b


def test_dgim_error_bound_state_size_and_partition_invariance(spark):
    """DGIM invariants: estimate within 50% of the true trailing-window
    count, state O(log^2 N) buckets, and identical output for any input
    partitioning (the fold is per-group, order-keyed)."""
    from crawler_spark.operators.sketches import dgim_counts

    # deterministic bursty bit stream per host
    rows = []
    for g in ("a", "b"):
        for i in range(5000):
            bit = 1 if (i * 2654435761 + (7 if g == "a" else 13)) % 97 < 31 else 0
            rows.append((g, i, bit))
    df = spark.createDataFrame(rows, "g string, o long, b int")
    for parts in (1, 8):
        out = {
            r["g"]: r
            for r in dgim_counts(
                df.repartition(parts), ["g"], "o", "b = 1", window_n=1000
            ).collect()
        }
        for g in ("a", "b"):
            r = out[g]
            assert r["n_events"] == 5000
            assert r["exact_ones"] > 0
            err = abs(r["est_ones"] - r["exact_ones"]) / r["exact_ones"]
            assert err <= 0.5, (g, r)
            # 2 buckets per size, sizes <= window -> O(log^2) state
            import math

            assert r["n_buckets"] <= 2 * (int(math.log2(1000)) + 2)
        if parts == 1:
            first = {g: (out[g]["est_ones"], out[g]["n_buckets"]) for g in out}
        else:
            assert first == {
                g: (out[g]["est_ones"], out[g]["n_buckets"]) for g in out
            }


def test_trailing_hll_equals_direct_union_sketch(spark):
    """Mergeability, the property the window merge relies on: each
    day's trailing estimate equals the estimate of a sketch built
    DIRECTLY on the trailing window's union of keys."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.sketches import (
        hll_estimate_by,
        hll_registers_by,
        trailing_distinct_hll,
    )

    rows = [(d, f"u{(d * 37 + i) % 500}") for d in range(10) for i in range(120)]
    df = spark.createDataFrame(rows, "day int, k string")
    got = {
        r["day"]: r["hll_estimate"]
        for r in trailing_distinct_hll(df, "day", "k", window_days=3).collect()
    }
    for d in range(10):
        win = df.filter((F.col("day") >= d - 2) & (F.col("day") <= d)).select(
            F.lit(d).alias("day"), "k"
        )
        direct = hll_estimate_by(
            hll_registers_by(win, ["day"], "k"), ["day"]
        ).collect()[0]["hll_estimate"]
        assert got[d] == direct, d


def test_decayed_counts_exact_and_recency_ordering(spark):
    """Decayed counts equal the hand-computed dyadic sums exactly
    (float aggregation exact by bit budget) and rank a recently-active
    group above a historically-heavier but stale one; partitioning
    doesn't change a single bit."""
    from crawler_spark.operators.metrics import decayed_counts

    rows = (
        [("stale", 0) for _ in range(100)]       # 100 events, 10 days old
        + [("fresh", 10) for _ in range(5)]      # 5 events today
        + [("mid", 8) for _ in range(20)]        # 20 events, 2 days old
    )
    df = spark.createDataFrame(rows, "g string, day int")
    for parts in (1, 7):
        out = {
            r["g"]: r
            for r in decayed_counts(
                df.repartition(parts), "g", "day"
            ).collect()
        }
        assert out["stale"]["decayed"] == 100 * 2.0 ** -10
        assert out["fresh"]["decayed"] == 5.0
        assert out["mid"]["decayed"] == 20 * 2.0 ** -2
        # mid = 5.0 and fresh = 5.0 tie exactly; lexicographic break
        assert out["fresh"]["rank"] == 1 and out["mid"]["rank"] == 2
        assert out["stale"]["rank"] == 3    # heaviest history, lowest recency


def test_countsketch_unbiased_vs_countmin_overcount(spark):
    """Count-Sketch point estimates straddle the truth (signed
    collisions cancel) where Count-Min only overcounts; heavy keys are
    recovered closely on a skewed stream."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.sketches import (
        countsketch_build,
        countsketch_estimate,
    )

    n = 20000
    # zipf-ish: hot-0 50%, hot-1 25%, rest a long tail
    df = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, "hot-0")
        .when(F.col("id") % 4 == 1, "hot-1")
        .otherwise(F.concat(F.lit("tail-"), (F.col("id") % 512).cast("string")))
        .alias("tok")
    )
    truth = {r["tok"]: r["c"] for r in df.groupBy("tok").agg(F.count("*").alias("c")).collect()}
    sk = countsketch_build(df, "tok", depth=4)
    keys = df.select("tok").distinct()
    est = {
        r["tok"]: r["cs_est"]
        for r in countsketch_estimate(sk, keys, "tok", depth=4).collect()
    }
    # heavy hitters recovered within the L2 error envelope
    import math

    l2 = math.sqrt(sum(v * v for v in truth.values()))
    for hot in ("hot-0", "hot-1"):
        assert abs(est[hot] - truth[hot]) <= 3 * l2 / math.sqrt(256), hot
    # signed estimates go BOTH ways across the tail (unbiased), unlike
    # Count-Min which can only overcount
    diffs = [est[t] - truth[t] for t in truth if t.startswith("tail-")]
    assert any(d < 0 for d in diffs) and any(d > 0 for d in diffs)
    # determinism
    est2 = {
        r["tok"]: r["cs_est"]
        for r in countsketch_estimate(sk, keys, "tok", depth=4).collect()
    }
    assert est == est2
