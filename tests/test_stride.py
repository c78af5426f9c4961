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
