"""Bucket-pruned sidecar loading (round-3 VERDICT finding #1, SCALE.md
§URL-seen lines 20-45): a round loads ONLY the bloom/cuckoo buckets its
candidate links touch — the In(bucket_id, ...) predicate is pushed into
the parquet scan, the slices deserialize per-bucket on executor tasks,
and the whole filter never materializes on the driver."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.cuckoo import BucketedCuckoo
from crawler_spark.operators.seen import (
    LAST_PRUNE_STATS,
    BucketedBloom,
    NumpyBloom,
    anti_join_seen,
    anti_join_seen_pruned,
    bucket_expr,
    flag_maybe_seen_bucketed,
    touched_bucket_ids,
)
from crawler_spark.sources.catalog import SnapshotCatalog


def _route(h: np.ndarray, n: int) -> np.ndarray:
    return (h.astype(np.uint64) % np.uint64(n)).astype(np.int64)


def test_bucket_expr_matches_numpy_routing(spark):
    """The JVM-side Column must route EXACTLY like the numpy uint64 mod
    the filter builders use — including negative hashes and both int64
    extremes — for every bucket-count shape (power-of-two and not)."""
    rng = np.random.default_rng(11)
    h = np.concatenate(
        [
            rng.integers(-(2**63), 2**63 - 1, size=5000, dtype=np.int64),
            np.array([0, -1, 1, 2**63 - 1, -(2**63)], dtype=np.int64),
        ]
    )
    df = spark.createDataFrame([(int(x),) for x in h], "url_hash long")
    for n in (3, 4, 7, 4096):
        got = (
            df.select("url_hash", bucket_expr("url_hash", n).alias("b"))
            .collect()
        )
        want = dict(zip(h.tolist(), _route(h, n).tolist()))
        for r in got:
            assert r["b"] == want[r["url_hash"]], (r, n)


@pytest.mark.parametrize("kind", ["bloom", "cuckoo"])
def test_flag_parity_with_whole_filter(spark, kind):
    """Per-bucket executor-side flagging == the whole-filter driver-side
    contains_many, bit for bit, on every candidate."""
    rng = np.random.default_rng(5)
    seen_keys = rng.integers(-(2**62), 2**62, size=4000, dtype=np.int64)
    probes = np.concatenate(
        [seen_keys[:1000],
         rng.integers(-(2**62), 2**62, size=3000, dtype=np.int64)]
    )
    if kind == "bloom":
        cfg = {"n_buckets": 8, "m_bits": 1 << 16, "k": 5}
        filt = BucketedBloom(**cfg)
        b = _route(seen_keys, 8)
        for bb in np.unique(b):
            sl = NumpyBloom(cfg["m_bits"], cfg["k"])
            sl.add_many(seen_keys[b == bb])
            filt.bits_by_bucket[int(bb)] = sl.bits
        rows = spark.createDataFrame(
            filt.to_rows(), "bucket_id int, bits binary"
        )
    else:
        cfg = {"n_buckets": 8, "n_slots": 1 << 10, "slot_width": 4}
        filt = BucketedCuckoo(**cfg)
        filt.insert_many(seen_keys)
        rows = spark.createDataFrame(
            filt.to_rows(), "bucket_id int, tbl binary, stash binary"
        )
    cand = spark.createDataFrame(
        [(int(x), f"u{i}") for i, x in enumerate(probes)],
        "url_hash long, url_canon string",
    )
    got = {
        r["url_hash"]: r["_maybe"]
        for r in flag_maybe_seen_bucketed(cand, rows, kind, cfg).collect()
    }
    want = dict(zip(probes.tolist(), filt.contains_many(probes).tolist()))
    assert got == want
    # every inserted key must flag positive (no false negatives — the
    # invariant that makes filter-negative rows safe to skip the join)
    assert all(got[int(k)] for k in probes[:1000])


def test_pruned_antijoin_reads_only_touched_buckets(spark, tmp_path):
    """End-to-end over a catalog table: candidates touching 2 of 8
    buckets -> (a) exactly those 2 slice rows are scanned, (b) the
    In(bucket_id) predicate reaches the parquet scan as a pushed
    filter, (c) the result is IDENTICAL to the plain exact anti-join."""
    rng = np.random.default_rng(9)
    seen_keys = rng.integers(-(2**62), 2**62, size=4000, dtype=np.int64)
    cfg = {"n_buckets": 8, "m_bits": 1 << 16, "k": 5}
    filt = BucketedBloom(**cfg)
    b = _route(seen_keys, 8)
    for bb in np.unique(b):
        sl = NumpyBloom(cfg["m_bits"], cfg["k"])
        sl.add_many(seen_keys[b == bb])
        filt.bits_by_bucket[int(bb)] = sl.bits
    cat = SnapshotCatalog(str(tmp_path / "c"), spark)
    cat.stage_overwrite(
        "bloom",
        spark.createDataFrame(filt.to_rows(), "bucket_id int, bits binary"),
    )
    seen_df = spark.createDataFrame(
        [(int(x), f"s{int(x)}") for x in seen_keys],
        "url_hash long, url_canon string",
    )
    cat.stage_overwrite("seen", seen_df)
    cat.commit()

    # candidates confined to buckets {2, 5}: half seen keys, half fresh
    pool = np.concatenate(
        [seen_keys, rng.integers(-(2**62), 2**62, size=8000, dtype=np.int64)]
    )
    cand_keys = pool[np.isin(_route(pool, 8), [2, 5])]
    assert len(cand_keys) > 100
    cand = spark.createDataFrame(
        [(int(x), f"s{int(x)}" if x in set(seen_keys.tolist()) else f"c{int(x)}")
         for x in cand_keys],
        "url_hash long, url_canon string",
    )

    touched = touched_bucket_ids(cand, 8)
    assert touched == [2, 5]
    pruned_scan = cat.read("bloom").filter(F.col("bucket_id").isin(touched))
    # (a) row-count metric: the pruned load is 2 of the table's 8 rows
    assert pruned_scan.count() == 2
    assert cat.read("bloom").count() == 8
    # (b) the predicate is pushed INTO the scan (file-level pruning at
    # design scale, where slices are row-group/partition aligned)
    plan = pruned_scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(bucket_id" in plan, plan

    got = anti_join_seen_pruned(
        cand, cat.read("seen"), cat.read("bloom"), "bloom", cfg
    )
    want = anti_join_seen(cand, cat.read("seen"), None)
    assert {r["url_hash"] for r in got.collect()} == {
        r["url_hash"] for r in want.collect()
    }
    assert LAST_PRUNE_STATS == {
        "kind": "bloom", "touched": [2, 5], "n_buckets": 8
    }


def test_run_round_goes_through_pruned_path_and_leaves_no_cache(spark, tmp_path):
    """The crawl round itself now loads the sidecar through the pruned
    path (LAST_PRUNE_STATS populated by run_round), its schedule/seen
    output is unchanged (the rounds-oracle suite proves exact parity;
    here: bloom-on == bloom-off), and — round-3 VERDICT item 7 — no
    persisted RDD handle survives the round loop."""
    from crawler_spark.plans.rounds import run_crawl
    from crawler_spark.sources.synth import T1_SMOKE

    LAST_PRUNE_STATS.clear()
    cat, _ = run_crawl(
        spark, str(tmp_path / "a"), T1_SMOKE, round_seconds=8.0
    )
    assert LAST_PRUNE_STATS.get("kind") == "bloom"
    assert LAST_PRUNE_STATS["touched"], "pruned path not exercised"
    cat2, _ = run_crawl(
        spark, str(tmp_path / "b"), T1_SMOKE, round_seconds=8.0,
        use_bloom=False,
    )
    key = ["round_id", "eff_priority", "depth", "discovery_seq"]
    s1 = [tuple(r) for r in
          cat.read("schedule_log").orderBy(*key).select(*key, "url_canon").collect()]
    s2 = [tuple(r) for r in
          cat2.read("schedule_log").orderBy(*key).select(*key, "url_canon").collect()]
    assert s1 == s2
    seen1 = {r["url_canon"] for r in cat.read("seen").collect()}
    seen2 = {r["url_canon"] for r in cat2.read("seen").collect()}
    assert seen1 == seen2
    # persist-handle hygiene: every persist() in the round loop must be
    # released once its staged writes have materialized
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0


def test_expire_urls_pruned_parity(spark, tmp_path):
    """Distributed per-bucket expiry == driver-side BucketedCuckoo
    delete: same removed count, same post-delete membership, and slice
    rows in UNTOUCHED buckets are byte-identical (they were passed
    through, not rebuilt)."""
    from crawler_spark.plans.rounds import expire_urls

    rng = np.random.default_rng(3)
    keys = rng.integers(-(2**62), 2**62, size=3000, dtype=np.int64)
    cfg = {"n_buckets": 8, "n_slots": 1 << 10, "slot_width": 4}
    filt = BucketedCuckoo(**cfg)
    filt.insert_many(keys)
    cat = SnapshotCatalog(str(tmp_path / "c"), spark)
    cat.stage_overwrite(
        "cuckoo",
        spark.createDataFrame(
            filt.to_rows(), "bucket_id int, tbl binary, stash binary"
        ),
    )
    cat.commit(meta={"cuckoo": cfg})
    before = {
        r["bucket_id"]: (bytes(r["tbl"]), bytes(r["stash"]))
        for r in cat.read("cuckoo").collect()
    }

    victims = keys[_route(keys, 8) == 3][:40]  # all route to bucket 3
    shadow = BucketedCuckoo(**cfg)
    shadow.insert_many(keys)
    want_removed = shadow.delete_many(victims)

    got_removed = expire_urls(cat, [int(x) for x in victims])
    assert got_removed == want_removed == len(victims)

    after_rows = cat.read("cuckoo").collect()
    after = BucketedCuckoo.from_rows(after_rows, **cfg)
    assert not after.contains_many(victims).any()
    survivors = keys[~np.isin(keys, victims)]
    assert after.contains_many(survivors).all()  # no collateral damage
    for r in after_rows:  # untouched buckets: byte-identical passthrough
        if r["bucket_id"] != 3:
            assert (bytes(r["tbl"]), bytes(r["stash"])) == before[r["bucket_id"]]
