"""salted_join (operators/skew.py): row-for-row parity with the plain
join, deterministic salts, and the hot-keys-only replication path.

Skew context: a crawl frontier always has hot hosts (SCALE.md §Skew);
salting is the planner-independent fallback when AQE's runtime skew
split can't apply. Parity with the unsalted join is the whole contract
— the operator must be invisible in the result.
"""

from pyspark.sql import functions as F

from crawler_spark.operators.skew import SALT_COL, salted_join


def _sides(spark):
    # 80% of probe rows on key 0, multiple build rows per key.
    probe = spark.range(0, 4000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 5 < 4, F.lit(0))
        .otherwise((F.col("id") % 7).cast("int"))
        .alias("k"),
        (F.col("id") * 3 % 101).alias("v"),
    )
    build = spark.range(0, 70).select(
        (F.col("id") % 7).cast("int").alias("k"),
        (F.col("id") * 11 % 13).alias("w"),
    )
    return probe, build


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_inner_parity(spark):
    probe, build = _sides(spark)
    plain = probe.join(build, "k").select("row_id", "k", "v", "w")
    salted = salted_join(probe, build, "k", F.col("row_id"), n_salts=8).select(
        "row_id", "k", "v", "w"
    )
    assert _canon(salted) == _canon(plain)
    assert SALT_COL not in salted.columns


def test_salted_left_parity_keeps_unmatched(spark):
    probe, build = _sides(spark)
    b5 = build.filter(F.col("k") < 5)  # keys 5,6 unmatched on build side
    plain = probe.join(b5, "k", "left").select("row_id", "k", "v", "w")
    salted = salted_join(probe, b5, "k", F.col("row_id"), how="left", n_salts=4).select(
        "row_id", "k", "v", "w"
    )
    assert _canon(salted) == _canon(plain)


def test_hot_keys_only_limits_replication(spark):
    probe, build = _sides(spark)
    plain = probe.join(build, "k").select("row_id", "k", "v", "w")
    salted = salted_join(
        probe, build, "k", F.col("row_id"), n_salts=8, hot_keys=[0]
    ).select("row_id", "k", "v", "w")
    assert _canon(salted) == _canon(plain)
    # cold keys carry exactly one build replica (salt 0)
    b = build.withColumn(
        SALT_COL,
        F.explode(
            F.when(F.col("k").isin([0]), F.sequence(F.lit(0), F.lit(7)))
            .otherwise(F.array(F.lit(0)))
        ),
    )
    per_key = {r["k"]: r["n"] for r in b.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    base = {r["k"]: r["n"] for r in build.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    for k, n in per_key.items():
        assert n == base[k] * (8 if k == 0 else 1)


def test_salt_in_join_keys_and_deterministic(spark):
    probe, build = _sides(spark)
    out = salted_join(probe, build, "k", F.col("row_id"), n_salts=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert SALT_COL in plan  # the shuffle really spreads on (k, salt)
    # xxhash64-derived salts: identical across reruns
    a = _canon(out.select("row_id", "k", "v", "w"))
    b = _canon(
        salted_join(probe, build, "k", F.col("row_id"), n_salts=8).select(
            "row_id", "k", "v", "w"
        )
    )
    assert a == b


def test_politeness_two_phase_exact_under_single_host_skew(spark):
    """Pathological frontier: EVERY pending URL on one mega-host. The
    salted two-phase select must (a) return exactly the true top-B in
    frontier order — the strict-superset construction loses nothing —
    and (b) actually run as two Window phases with the salt in phase 1,
    so no single window partition ever holds the whole host."""
    import random

    from crawler_spark.operators.politeness import ORDER_COLS, politeness_select

    rng = random.Random(7)
    n, budget = 5000, 7
    rows = [
        (
            "mega.test",
            rng.randrange(3),            # priority
            rng.randrange(4),            # depth
            i,                           # discovery_seq (unique)
            rng.randrange(-2**62, 2**62),  # url_hash
            budget,
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows,
        "host string, priority int, depth int, discovery_seq long, "
        "url_hash long, budget int",
    ).repartition(16)
    got = politeness_select(df).collect()
    want = sorted(rows, key=lambda r: (r[1], r[2], r[3], r[4]))[:budget]
    got_keys = sorted((r.priority, r.depth, r.discovery_seq, r.url_hash) for r in got)
    assert got_keys == sorted((r[1], r[2], r[3], r[4]) for r in want)

    plan = politeness_select(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") >= 2  # both phases survive optimization
    assert "_salt" in plan  # phase 1 partitions by (host, salt)


def test_exact_rank_select_matches_sorted(spark):
    from crawler_spark.operators.skew import exact_rank_select

    import random

    rng = random.Random(7)
    vals = [rng.randrange(-500, 500) for _ in range(1001)] + [-500, 499]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    srt = sorted(vals)
    n = len(vals)
    for k in (1, 2, (n + 1) // 2, n - 1, n):
        r = exact_rank_select(df, "x", rank=k, bin_width=64).collect()[0]
        assert (r.n, r.rank, r.value) == (n, k, srt[k - 1]), k
    # default = lower median
    r = exact_rank_select(df, "x").collect()[0]
    assert r.value == srt[(n + 1) // 2 - 1]


def test_exact_rank_select_bin_boundaries(spark):
    from crawler_spark.operators.skew import exact_rank_select

    # values exactly at multiples of the bin width, incl. negatives
    vals = [-128, -64, -1, 0, 1, 63, 64, 128]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    srt = sorted(vals)
    for k in range(1, len(vals) + 1):
        r = exact_rank_select(df, "x", rank=k, bin_width=64).collect()[0]
        assert r.value == srt[k - 1], k


def test_bloom_semi_reduce_exact_and_selective(spark):
    from pyspark.sql import functions as F

    from crawler_spark.operators.skew import bloom_semi_reduce

    big = spark.range(20000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 100).alias("payload")
    )
    # selective dim: 50 keys out of 20000
    small = spark.range(50).select((F.col("id") * 400).alias("k"))
    reduced = bloom_semi_reduce(big, small, "k")
    # no false negatives: the reduced side joined == the plain join
    got = sorted(
        (r["k"], r["payload"]) for r in reduced.join(small, "k").collect()
    )
    ref = sorted((r["k"], r["payload"]) for r in big.join(small, "k").collect())
    assert got == ref and len(ref) == 50
    # the prune is real: far fewer rows reach the join than the fact size
    n_reduced = reduced.count()
    assert 50 <= n_reduced < 2000, n_reduced  # fpr ~ tiny at 2^20 bits
