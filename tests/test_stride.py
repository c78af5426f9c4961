"""Stride/WFQ weighted-fair frontier admission — proportional-share and
ordering properties."""

from pyspark.sql import functions as F

from crawler_spark.operators.politeness import stride_schedule


def _frontier(spark, per_host=40, hosts=("a", "b", "c")):
    rows = [
        (h, f"http://{h}/{i}", 0, 0, j * len(hosts) + k)
        for k, h in enumerate(hosts)
        for j, i in enumerate(range(per_host))
    ]
    return spark.createDataFrame(
        rows, "host string, url string, priority int, depth int, discovery_seq long"
    )


def test_stride_admission_proportional_to_weight(spark):
    f = _frontier(spark, per_host=60)
    wts = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "host string, weight int"
    )
    out = stride_schedule(f, wts, budget=60)
    counts = {
        r["host"]: r["n"]
        for r in out.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    # stride guarantee: admitted counts proportional to weights within 1
    assert abs(counts["a"] - 10) <= 1
    assert abs(counts["b"] - 20) <= 1
    assert abs(counts["c"] - 30) <= 1
    assert sum(counts.values()) == 60


def test_stride_within_host_order_and_vf_integrality(spark):
    f = _frontier(spark, per_host=20)
    wts = spark.createDataFrame([("a", 3), ("b", 7)], "host string, weight int")
    out = stride_schedule(f, wts, budget=30).collect()
    # every admitted row's virtual finish is exact: k*10080 % weight == 0
    for r in out:
        assert r["k"] * 10080 % r["weight"] == 0
        assert r["vf"] == r["k"] * 10080 // r["weight"]
    # within a host, admitted ks are a prefix 1..n (no skips)
    for h in ("a", "b", "c"):
        ks = sorted(r["k"] for r in out if r["host"] == h)
        assert ks == list(range(1, len(ks) + 1))


def test_stride_default_weight_is_one(spark):
    f = _frontier(spark, per_host=10, hosts=("a", "b"))
    wts = spark.createDataFrame([("a", 1)], "host string, weight int")
    out = stride_schedule(f, wts, budget=10)
    counts = {
        r["host"]: r["n"]
        for r in out.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert counts["a"] == 5 and counts["b"] == 5  # absent host weighs 1


def test_wfq_prefix_shares_track_weights(spark):
    """WFQ's defining property: over any schedule prefix, each host's
    dispatch count is proportional to its weight (within rounding) —
    a 4x-weight host gets ~4x the slots of a 1x host, with nobody
    starved. Equal-size jobs isolate the weighting."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.politeness import wfq_schedule

    jobs = spark.createDataFrame(
        [(f"h{h}", i, 100) for h in range(4) for i in range(200)],
        "host string, seq long, size long",
    )
    weights = spark.createDataFrame(
        [("h0", 1.0), ("h1", 2.0), ("h2", 4.0), ("h3", 1.0)],
        "host string, w double",
    )
    out = wfq_schedule(
        jobs, weights, order_cols=["seq"], top_n=160
    ).collect()
    counts = {}
    for r in sorted(out, key=lambda r: r["dispatch_rank"]):
        counts[r["host"]] = counts.get(r["host"], 0) + 1
    # weights 1:2:4:1 over 160 slots -> expected 20:40:80:20
    assert abs(counts["h2"] - 80) <= 2, counts
    assert abs(counts["h1"] - 40) <= 2, counts
    assert abs(counts["h0"] - 20) <= 2 and abs(counts["h3"] - 20) <= 2, counts
    # and within a host dispatches preserve per-host order
    ks = [r["k"] for r in sorted(out, key=lambda r: r["dispatch_rank"])
          if r["host"] == "h2"]
    assert ks == sorted(ks)


def test_wfq_default_weight_for_unlisted_host(spark):
    """A host missing from the weights dimension is served at weight 1
    (stride's contract) — never silently dropped."""
    from crawler_spark.operators.politeness import wfq_schedule

    jobs = spark.createDataFrame(
        [("known", i, 100) for i in range(5)]
        + [("unlisted", i, 100) for i in range(5)],
        "host string, seq long, size long",
    )
    weights = spark.createDataFrame([("known", 1.0)], "host string, w double")
    out = wfq_schedule(jobs, weights, order_cols=["seq"]).collect()
    hosts = {r["host"] for r in out}
    assert hosts == {"known", "unlisted"}
    vf = {(r["host"], r["k"]): r["vfinish"] for r in out}
    assert vf[("unlisted", 1)] == vf[("known", 1)] == 100.0
