"""Rendezvous (HRW) assignment: pure-python mirror, balance, and the
minimal-disruption property that justifies the scheme."""

from __future__ import annotations

import hashlib

import pytest

from crawler_spark.operators.assign import hrw_assign, hrw_assign_workers


def _py_hrw(key: str, workers: list[str], salt: str = "hrw") -> str:
    return max(
        workers,
        key=lambda w: hashlib.md5(f"{salt}:{key}:{w}".encode()).hexdigest(),
    )


def test_hrw_matches_pure_python(spark):
    keys = [(f"host-{i}.example",) for i in range(200)]
    df = spark.createDataFrame(keys, "host string")
    got = {
        r.host: r.worker_id
        for r in hrw_assign(df, "host", n_workers=8).collect()
    }
    for (h,) in keys:
        assert got[h] == int(_py_hrw(h, [str(i) for i in range(8)])), h


def test_hrw_balance(spark):
    df = spark.range(4000).select(F_col_str())
    out = hrw_assign(df, "k", n_workers=10)
    counts = {r.worker_id: r.n for r in out.groupBy("worker_id").count().withColumnRenamed("count", "n").collect()}
    assert set(counts) == set(range(10))
    # hash uniformity: every worker within 2.5x of the mean at n=4000
    mean = 400.0
    for w, n in counts.items():
        assert 0.4 * mean <= n <= 2.5 * mean, (w, n)


def F_col_str():
    from pyspark.sql import functions as F

    return F.concat(F.lit("k"), F.col("id").cast("string")).alias("k")


def test_hrw_minimal_disruption(spark):
    """Removing one worker moves ONLY that worker's keys: every key
    whose owner survives keeps its owner (each survivor's score set is
    unchanged, so its argmax among survivors is unchanged)."""
    df = spark.range(1000).select(F_col_str())
    workers = [f"fetcher-{i}" for i in range(6)]
    before = {
        r.k: r.worker
        for r in hrw_assign_workers(df, "k", workers).collect()
    }
    removed = "fetcher-3"
    survivors = [w for w in workers if w != removed]
    after = {
        r.k: r.worker
        for r in hrw_assign_workers(df, "k", survivors).collect()
    }
    moved = {k for k in before if after[k] != before[k]}
    assert moved == {k for k, w in before.items() if w == removed}
    # and the orphaned keys scatter across survivors, not onto one node
    landing = {after[k] for k in moved}
    assert len(landing) >= 3


def test_hrw_deterministic_across_plans(spark):
    """Same key -> same worker regardless of how the DataFrame was
    built (no per-partition or per-run state)."""
    a = hrw_assign(
        spark.createDataFrame([("x",)], "k string"), "k", 16
    ).first()["worker_id"]
    a2 = (
        hrw_assign(spark.createDataFrame([("y",), ("x",)], "k string"), "k", 16)
        .filter("k = 'x'")
        .first()["worker_id"]
    )
    assert a == a2


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
