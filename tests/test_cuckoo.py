"""Cuckoo-filter URL-seen sidecar (the delete-capable half of the north
rule's "bloom/cuckoo"): membership guarantees, distributed build/merge,
anti-join integration, and the recrawl expiry path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.cuckoo import (
    BucketedCuckoo,
    NumpyCuckoo,
    cuckoo_delta_rows,
    merge_cuckoo_rows,
)
from crawler_spark.operators.seen import anti_join_seen


def _keys(n, seed=7):
    rng = np.random.default_rng(seed)
    return rng.choice(2**63 - 1, size=n, replace=False).astype(np.int64) - 2**62


def test_cuckoo_no_false_negatives_at_high_load():
    # 60k keys into 2^14 x 4 slots = 91.5% load — eviction chains and
    # (possibly) the stash engage; membership must still never miss,
    # because filter-negative rows skip the exact anti-join.
    keys = _keys(60000)
    c = NumpyCuckoo(n_slots=1 << 14, slot_width=4)
    c.insert_many(keys)
    assert c.contains_many(keys).all()
    fresh = _keys(60000, seed=11)
    fresh = fresh[~np.isin(fresh, keys)]
    fpr = c.contains_many(fresh).mean()
    assert fpr < 0.002  # theory: 2*4/2^16 ~ 1.2e-4


def test_cuckoo_delete_removes_only_the_deleted():
    keys = _keys(20000)
    c = NumpyCuckoo(n_slots=1 << 13, slot_width=4)
    c.insert_many(keys)
    gone, kept = keys[:10000], keys[10000:]
    assert c.delete_many(gone) == len(gone)
    # deleted keys read present only at FPR rate (fingerprint collisions
    # with surviving keys), never systematically
    assert c.contains_many(gone).mean() < 0.005
    # survivors are untouched — distinct keys colliding on (index, fp)
    # each held their own copy, so deletes can't un-member a neighbor
    assert c.contains_many(kept).all()
    # re-insert after delete works (the recrawl self-heal direction)
    c.insert_many(gone[:100])
    assert c.contains_many(gone[:100]).all()


def test_cuckoo_serialization_roundtrip():
    keys = _keys(5000)
    c = NumpyCuckoo(n_slots=1 << 12, slot_width=4)
    c.insert_many(keys)
    tbl, stash = c.to_bytes()
    c2 = NumpyCuckoo.from_bytes(tbl, stash, 1 << 12, 4)
    assert c2.contains_many(keys).all()
    assert np.array_equal(c.table, c2.table) and c.stash == c2.stash


def test_cuckoo_distributed_build_matches_direct(spark):
    keys = _keys(8000)
    df = spark.createDataFrame(
        [(int(k),) for k in keys], "url_hash long"
    ).repartition(8)
    cfg = {"n_buckets": 4, "n_slots": 1 << 12, "slot_width": 4}
    rows = merge_cuckoo_rows(
        cuckoo_delta_rows(df, **cfg), cfg["n_slots"], cfg["slot_width"]
    ).collect()
    dist = BucketedCuckoo.from_rows(rows, **cfg)
    assert dist.contains_many(keys).all()  # merge-by-relocation lost nothing
    direct = BucketedCuckoo(**cfg)
    direct.insert_many(keys)
    fresh = _keys(8000, seed=3)
    fresh = fresh[~np.isin(fresh, keys)]
    # same FPR ballpark as a single-pass build (no blow-up from merging)
    assert dist.contains_many(fresh).mean() <= direct.contains_many(fresh).mean() + 0.005


def test_anti_join_seen_exact_with_cuckoo(spark):
    seen = spark.createDataFrame(
        [(i, f"u{i}") for i in range(0, 100, 2)], "url_hash long, url_canon string"
    )
    cand = spark.createDataFrame(
        [(i, f"u{i}") for i in range(100)], "url_hash long, url_canon string"
    )
    filt = BucketedCuckoo(n_buckets=4, n_slots=1 << 10, slot_width=4)
    filt.insert_many(np.arange(0, 100, 2, dtype=np.int64))
    out = {r["url_hash"] for r in anti_join_seen(cand, seen, filt).collect()}
    assert out == set(range(1, 100, 2))  # cuckoo path == exact semantics


def test_expired_keys_read_unseen_even_while_in_seen_table(spark):
    # THE point of the cuckoo: deleting a fingerprint makes the URL
    # fetchable again without touching the 10^10-row seen table —
    # filter-negative rows bypass the exact join by contract.
    seen = spark.createDataFrame(
        [(i, f"u{i}") for i in range(0, 100, 2)], "url_hash long, url_canon string"
    )
    cand = spark.createDataFrame(
        [(i, f"u{i}") for i in range(100)], "url_hash long, url_canon string"
    )
    filt = BucketedCuckoo(n_buckets=4, n_slots=1 << 10, slot_width=4)
    filt.insert_many(np.arange(0, 100, 2, dtype=np.int64))
    expired = np.array([0, 10, 20], dtype=np.int64)
    assert filt.delete_many(expired) == 3
    out = {r["url_hash"] for r in anti_join_seen(cand, seen, filt).collect()}
    assert out == set(range(1, 100, 2)) | {0, 10, 20}


def test_crawl_with_cuckoo_matches_bloom(spark, tmp_path):
    """Swapping the prefilter must not change crawl semantics: identical
    schedule (round, seq, url) history and identical final seen set."""
    from crawler_spark.plans.rounds import run_crawl
    from crawler_spark.sources.synth import T1_SMOKE

    runs = {}
    for name in ("bloom", "cuckoo"):
        cat, _ = run_crawl(
            spark, str(tmp_path / name), T1_SMOKE, round_seconds=8.0,
            seen_filter=name,
        )
        sched = [
            (r["round_id"], r["discovery_seq"], r["url_canon"])
            for r in cat.read("schedule_log")
            .orderBy("round_id", "discovery_seq")
            .collect()
        ]
        seen = {r["url_canon"] for r in cat.read("seen").collect()}
        runs[name] = (sched, seen)
    assert runs["bloom"] == runs["cuckoo"]


def test_recrawl_expire_then_rediscover_refetches_once(spark, tmp_path):
    """Full recrawl wave: crawl to exhaustion, expire a fetched URL's
    fingerprint, requeue the seeds. The next wave rediscovers the
    expired URL (reads unseen -> re-enters the frontier and is fetched
    again), non-expired URLs stay blocked, and the filter self-heals so
    a THIRD wave does not refetch it again."""
    from crawler_spark.plans.rounds import (
        expire_urls,
        requeue_urls,
        run_crawl,
        run_round,
    )
    from crawler_spark.sources.synth import T1_SMOKE

    cat, _ = run_crawl(
        spark, str(tmp_path / "c"), T1_SMOKE, round_seconds=8.0,
        seen_filter="cuckoo",
    )
    log = cat.read("schedule_log")
    seeds = [
        (r["url_hash"], r["url_canon"])
        for r in log.filter(F.col("depth") == 0).collect()
    ]
    # expire one depth-1 URL (a seed outlink: rediscovered when seeds refetch)
    victim = (
        log.filter(F.col("depth") == 1).orderBy("discovery_seq").first()
    )
    assert expire_urls(cat, [victim["url_hash"]]) == 1

    # bloom-backed catalogs must refuse expiry (documents WHY cuckoo exists)
    cat_bloom, _ = run_crawl(
        spark, str(tmp_path / "b"), T1_SMOKE, round_seconds=8.0,
        seen_filter="bloom",
    )
    with pytest.raises(ValueError, match="cuckoo"):
        expire_urls(cat_bloom, [victim["url_hash"]])

    # wave 2: requeue seeds; their outlinks are rediscovered
    assert requeue_urls(cat, [h for h, _ in seeds]) == len(seeds)
    wave2 = [run_round(cat, T1_SMOKE, round_seconds=8.0)]
    while wave2[-1]["scheduled"] > 0:
        wave2.append(run_round(cat, T1_SMOKE, round_seconds=8.0))
    first_new_round = wave2[0]["round_id"]
    resched = (
        cat.read("schedule_log")
        .filter(F.col("round_id") >= first_new_round)
        .select("url_canon")
    )
    resched_urls = {r["url_canon"] for r in resched.collect()}
    seed_urls = {u for _, u in seeds}
    # exactly the seeds (requeued) + the expired victim (rediscovered)
    assert resched_urls == seed_urls | {victim["url_canon"]}

    # filter self-healed: wave 3 (requeue seeds again) refetches ONLY seeds
    assert requeue_urls(cat, [h for h, _ in seeds]) == len(seeds)
    wave3_start = cat.current_id() + 1
    stats = run_round(cat, T1_SMOKE, round_seconds=8.0)
    while stats["scheduled"] > 0:
        stats = run_round(cat, T1_SMOKE, round_seconds=8.0)
    wave3 = {
        r["url_canon"]
        for r in cat.read("schedule_log")
        .filter(F.col("round_id") >= wave3_start)
        .collect()
    }
    assert wave3 == seed_urls


# ---- property-based fuzzing (hypothesis) -----------------------------------
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:

    def _h(key_id: int) -> np.int64:
        # fixed id->hash map with good spread (golden-ratio multiply)
        return np.int64((key_id * 0x9E3779B97F4A7C15) % (2**63))

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.tuples(st.sampled_from(["ins", "del"]), st.integers(0, 300)),
            max_size=120,
        )
    )
    def test_cuckoo_fuzz_interleaved_insert_delete_no_false_negative(ops):
        """Cuckoo contract under arbitrary interleavings: any key whose
        inserts outnumber its deletes MUST read present (negatives skip
        the exact join, so one false negative is a lost URL). Deletes
        are only issued for currently-inserted keys (standard
        cuckoo-filter precondition) and must each remove exactly one
        copy. Tiny table (2^8 x 2 slots) so eviction chains and the
        stash engage constantly."""
        filt = NumpyCuckoo(n_slots=1 << 8, slot_width=2)
        live: dict[int, int] = {}
        for op, k in ops:
            if op == "ins":
                filt.insert_many(np.array([_h(k)], dtype=np.int64))
                live[k] = live.get(k, 0) + 1
            elif live.get(k, 0) > 0:
                assert filt.delete_many(np.array([_h(k)], dtype=np.int64)) == 1
                live[k] -= 1
        alive = [k for k, n in live.items() if n > 0]
        if alive:
            got = filt.contains_many(np.array([_h(k) for k in alive], dtype=np.int64))
            assert got.all(), f"false negative among live keys {alive}"
