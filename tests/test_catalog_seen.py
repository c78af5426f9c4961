"""Snapshot catalog semantics (T2/T3/K8/K9) + bloom/anti-join (J1)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.seen import NumpyBloom, anti_join_seen, build_bloom
from crawler_spark.sources.catalog import SnapshotCatalog


def test_commit_atomicity_and_time_travel(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "c"), spark)
    df1 = spark.range(5).withColumnRenamed("id", "x")
    cat.stage_append("t", df1)
    assert not cat.exists("t")  # staged != visible
    s1 = cat.commit()
    assert cat.read("t").count() == 5

    cat.stage_append("t", spark.range(3).withColumnRenamed("id", "x"))
    s2 = cat.commit()
    assert cat.read("t").count() == 8
    assert cat.read("t", snapshot=s1).count() == 5  # time travel

    cat.stage_overwrite("t", spark.range(2).withColumnRenamed("id", "x"))
    cat.commit()
    assert cat.read("t").count() == 2
    assert cat.read("t", snapshot=s2).count() == 8


def test_rollback_staged(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "c"), spark)
    cat.stage_append("t", spark.range(5))
    cat.rollback_staged()
    cat.commit()
    assert not cat.exists("t")


def test_expire_snapshots(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "c"), spark)
    for i in range(5):
        cat.stage_overwrite("t", spark.range(i + 1))
        cat.commit()
    removed = cat.expire_snapshots(keep_last=2)
    assert removed > 0
    assert cat.read("t").count() == 5  # latest intact
    with pytest.raises(FileNotFoundError):
        cat._manifest(0)


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(7)
    keys = rng.integers(-(2**62), 2**62, size=20000, dtype=np.int64)
    bl = NumpyBloom(m_bits=1 << 20, k=5)
    bl.add_many(keys)
    assert bl.contains_many(keys).all()  # zero false negatives, ever
    probe = rng.integers(-(2**62), 2**62, size=20000, dtype=np.int64)
    fresh = probe[~np.isin(probe, keys)]
    fpr = bl.contains_many(fresh).mean()
    assert fpr < 0.05  # m/n = 52 bits/key -> tiny FPR


def test_anti_join_seen_exact_with_bloom(spark):
    seen = spark.createDataFrame(
        [(i, f"u{i}") for i in range(0, 100, 2)], "url_hash long, url_canon string"
    )
    cand = spark.createDataFrame(
        [(i, f"u{i}") for i in range(100)], "url_hash long, url_canon string"
    )
    bloom = build_bloom(seen)
    out = {r["url_hash"] for r in anti_join_seen(cand, seen, bloom).collect()}
    assert out == set(range(1, 100, 2))  # exactly the odd (unseen) keys
    out2 = {r["url_hash"] for r in anti_join_seen(cand, seen, None).collect()}
    assert out2 == out  # bloom path == plain anti-join path


def test_anti_join_seen_exact_with_bucketed_bloom(spark):
    from crawler_spark.operators.seen import (
        BucketedBloom,
        bloom_delta_rows,
        merge_bloom_rows,
    )

    seen = spark.createDataFrame(
        [(i, f"u{i}") for i in range(0, 100, 2)], "url_hash long, url_canon string"
    )
    cand = spark.createDataFrame(
        [(i, f"u{i}") for i in range(100)], "url_hash long, url_canon string"
    )
    cfg = {"n_buckets": 4, "m_bits": 1 << 16, "k": 5}
    rows = merge_bloom_rows(bloom_delta_rows(seen, **cfg)).collect()
    bloom = BucketedBloom.from_rows(rows, **cfg)
    out = {r["url_hash"] for r in anti_join_seen(cand, seen, bloom).collect()}
    assert out == set(range(1, 100, 2))


def test_bloom_table_incremental_matches_rebuild(spark, tmp_path):
    """The crawl maintains the persisted bucketed bloom by OR-ing in only
    each round's new keys. After a full crawl the incrementally-built
    slices must be bitwise identical to a from-scratch build over the
    final seen table — proof that no key was ever missed without any
    full-seen rescan happening per round."""
    from crawler_spark.operators.seen import (
        BucketedBloom,
        bloom_delta_rows,
        merge_bloom_rows,
    )
    from crawler_spark.plans.rounds import run_crawl
    from crawler_spark.sources.synth import T1_SMOKE

    catalog, _ = run_crawl(
        spark, str(tmp_path / "c"), T1_SMOKE, round_seconds=8.0, use_bloom=True
    )
    cfg = catalog.meta()["bloom"]
    incremental = BucketedBloom.from_rows(catalog.read("bloom").collect(), **cfg)
    rebuilt = BucketedBloom.from_rows(
        merge_bloom_rows(bloom_delta_rows(catalog.read("seen"), **cfg)).collect(),
        **cfg,
    )
    assert set(incremental.bits_by_bucket) == set(rebuilt.bits_by_bucket)
    for b in rebuilt.bits_by_bucket:
        assert np.array_equal(
            incremental.bits_by_bucket[b], rebuilt.bits_by_bucket[b]
        ), f"bucket {b} diverged"


def test_compact_merges_files_preserves_rows_and_time_travel(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat"), spark)
    for k in range(5):
        cat.stage_append(
            "t", spark.range(10 * k, 10 * k + 10).withColumnRenamed("id", "v")
        )
        cat.commit()
    pre_snap = cat.current_id()
    assert len(cat.tables()["t"]) == 5
    pre = sorted(r.v for r in cat.read("t").collect())

    sid = cat.compact("t")
    assert sid == pre_snap + 1
    dirs = cat.tables()["t"]
    assert len(dirs) == 1
    import glob
    assert len(glob.glob(f"{dirs[0]}/*.parquet")) == 1  # one target-size file
    assert sorted(r.v for r in cat.read("t").collect()) == pre
    # old layout still readable at the pre-compaction snapshot
    assert len(cat.tables(snapshot=pre_snap)["t"]) == 5
    assert sorted(r.v for r in cat.read("t", snapshot=pre_snap).collect()) == pre


def test_read_incremental_returns_appended_delta_only(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat"), spark)
    snaps = []
    for k in range(4):
        cat.stage_append(
            "t", spark.range(10 * k, 10 * k + 10).withColumnRenamed("id", "v")
        )
        snaps.append(cat.commit())
    # delta between consecutive snapshots is exactly that round's rows
    got = sorted(r.v for r in cat.read_incremental("t", snaps[1], snaps[2]).collect())
    assert got == list(range(20, 30))
    # open-ended: everything after snapshot 0
    got = sorted(r.v for r in cat.read_incremental("t", snaps[0]).collect())
    assert got == list(range(10, 40))
    # same-snapshot window is empty but keeps the schema
    empty = cat.read_incremental("t", snaps[3], snaps[3])
    assert empty.count() == 0 and empty.columns == ["v"]
    # compaction rewrites file identity -> incremental across it raises
    cat.compact("t")
    with pytest.raises(ValueError, match="incremental read unsound"):
        cat.read_incremental("t", snaps[2])


def test_schema_evolution_on_append(spark, tmp_path):
    """Columns added by later appends survive reads (schema evolution);
    pre-evolution rows surface NULL for the new column, and time travel
    to the pre-evolution snapshot still shows the narrow schema."""
    cat = SnapshotCatalog(str(tmp_path / "cat"), spark)
    cat.stage_append("t", spark.range(3).withColumnRenamed("id", "v"))
    s1 = cat.commit()
    cat.stage_append(
        "t",
        spark.range(3, 6).withColumnRenamed("id", "v").withColumn(
            "extra", F.concat(F.lit("x"), F.col("v").cast("string"))
        ),
    )
    cat.commit()
    got = cat.read("t")
    assert set(got.columns) == {"v", "extra"}
    rows = {r.v: r.extra for r in got.collect()}
    assert rows[0] is None and rows[5] == "x5"
    assert cat.read("t", snapshot=s1).columns == ["v"]


def test_rollback_to_restores_state_preserving_history(spark, tmp_path):
    """Iceberg-style rollback: a NEW snapshot re-points at the target's
    file sets — O(1) manifest write, no data movement, bad snapshots
    stay time-travelable, and a later expiry keeps the restored files
    because the current manifest references them."""
    import pytest

    cat = SnapshotCatalog(str(tmp_path / "c"), spark)
    cat.stage_overwrite("t", spark.range(5).withColumnRenamed("id", "x"))
    good = cat.commit(meta={"next_seq": 5})
    cat.stage_overwrite("t", spark.range(99).withColumnRenamed("id", "x"))
    cat.stage_append("u", spark.range(2).withColumnRenamed("id", "y"))
    bad = cat.commit(meta={"next_seq": 99})
    assert cat.read("t").count() == 99

    rid = cat.rollback_to(good)
    assert rid == bad + 1
    assert cat.read("t").count() == 5  # restored state
    assert not cat.exists("u")  # table born in the bad snapshot is gone
    assert cat.meta()["next_seq"] == 5  # meta restored too
    assert cat.read("t", snapshot=bad).count() == 99  # history preserved

    # staged work built against the abandoned state is rejected
    cat.stage_append("t", spark.range(1).withColumnRenamed("id", "x"))
    with pytest.raises(RuntimeError):
        cat.rollback_to(good)
    cat.rollback_staged()

    # expiry after rollback keeps the restored files (referenced by the
    # current manifest) while dropping the bad snapshot's orphans
    cat.stage_append("t", spark.range(1).withColumnRenamed("id", "x"))
    cat.commit()
    cat.expire_snapshots(keep_last=2)
    assert cat.read("t").count() == 6
    with pytest.raises(FileNotFoundError):
        cat.read("t", snapshot=bad)
