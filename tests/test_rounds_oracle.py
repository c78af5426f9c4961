"""The correctness gate (BASELINE.json north_rule): the Spark engine's
crawl ordering and final URL-seen set must match the sequential
reference-semantics oracle exactly, on the same seed list + politeness
budget; payload rows must satisfy PSNR/caption invariants; resume from a
snapshot must not change anything."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark.functions.codecs import decode, psnr
from crawler_spark.plans.oracle import OracleCrawler
from crawler_spark.plans.rounds import init_crawl, resume_crawl, run_crawl, run_round
from crawler_spark.sources.catalog import SnapshotCatalog
from crawler_spark.sources.synth import T1_SMOKE, T2_CORRECTNESS, T3_DEEP, T4_FLAKY

ROUND_S = 8.0
ORDER = ["priority", "depth", "discovery_seq", "url_hash"]


def _engine_schedule(catalog):
    rows = (
        catalog.read("schedule_log")
        .orderBy("round_id", *ORDER)
        .select("round_id", "url_canon")
        .collect()
    )
    return [(r["round_id"], r["url_canon"]) for r in rows]


@pytest.mark.parametrize("web,use_bloom", [(T1_SMOKE, False), (T2_CORRECTNESS, True)])
def test_ordering_and_seen_match_oracle(spark, tmp_path, web, use_bloom):
    catalog, history = run_crawl(
        spark, str(tmp_path / "cat"), web, round_seconds=ROUND_S, use_bloom=use_bloom
    )
    oracle = OracleCrawler(web, round_seconds=ROUND_S)
    oracle.run()

    # crawl ordering: exact (round, url) sequence match
    assert _engine_schedule(catalog) == oracle.schedule

    # final URL-seen set: exact match
    engine_seen = {
        r["url_canon"] for r in catalog.read("seen").select("url_canon").collect()
    }
    assert engine_seen == oracle.seen

    # results + failures match
    engine_results = {
        r["url_canon"] for r in catalog.read("results").select("url_canon").collect()
    }
    assert engine_results == set(oracle.results)
    engine_fail = {
        r["url_canon"]
        for r in catalog.read("fetch_failures").select("url_canon").collect()
    }
    assert engine_fail == {u for u, _ in oracle.failures}


def test_deep_web_dense_seq_no_overflow(spark, tmp_path):
    """Depth-9 chains across 16 seeds: exact ordering + seen match, and
    discovery_seq stays dense (bounded by the URL count). The previous
    positional-radix encoding (parent_seq*4096+sibling, 12 bits per
    depth level) needed >100 bits for these paths — int64 overflow that
    Spark 4's ANSI mode would turn into a hard error mid-crawl."""
    web = T3_DEEP
    catalog, history = run_crawl(
        spark, str(tmp_path / "deep"), web, round_seconds=ROUND_S,
        max_rounds=64, use_bloom=True,
    )
    oracle = OracleCrawler(web, round_seconds=ROUND_S)
    oracle.run(max_rounds=64)
    assert max(r for r, _ in oracle.schedule) >= 9  # actually went deep
    assert _engine_schedule(catalog) == oracle.schedule
    engine_seen = {
        r["url_canon"] for r in catalog.read("seen").select("url_canon").collect()
    }
    assert engine_seen == oracle.seen
    mx = catalog.read("frontier").agg(F.max("discovery_seq")).first()[0]
    assert mx == len(oracle.seen) - 1  # dense: seqs are 0..n_urls-1


def test_retry_budget_oracle_match(spark, tmp_path):
    """T3 fetch retry budget (reference: base_crawler.py:33,232-284):
    transiently-failing URLs are re-queued and succeed on attempt 2;
    permanent failures become terminal with attempts == max_attempts.
    Exact schedule (including the retry rows) + seen set vs oracle."""
    web = T4_FLAKY
    catalog, _ = run_crawl(
        spark, str(tmp_path / "flaky"), web, round_seconds=ROUND_S, use_bloom=True
    )
    oracle = OracleCrawler(web, round_seconds=ROUND_S)
    oracle.run()

    # some URLs genuinely flaked and were retried (schedule has dups)
    sched = oracle.schedule
    assert len(sched) > len({u for _, u in sched}), "fixture has no flaky URLs"
    assert _engine_schedule(catalog) == sched

    engine_seen = {
        r["url_canon"] for r in catalog.read("seen").select("url_canon").collect()
    }
    assert engine_seen == oracle.seen
    # flaky URLs succeed on retry -> they are results, not failures
    engine_results = {
        r["url_canon"] for r in catalog.read("results").select("url_canon").collect()
    }
    assert engine_results == set(oracle.results)
    flaky = {u for u in engine_results if web.fetch_error(u, attempt=1) is not None}
    assert flaky, "no retried URL reached results"
    # terminal failures carry the exhausted budget
    fails = catalog.read("fetch_failures").select("url_canon", "attempts").collect()
    assert {r["url_canon"] for r in fails} == {u for u, _ in oracle.failures}
    assert fails and all(r["attempts"] == 2 for r in fails)


def test_payload_invariants(spark, tmp_path):
    """input_hint per-row invariant: decoded pixels allclose (PSNR>=40dB
    for lossy fmt) + caption equality vs ground truth."""
    web = T1_SMOKE
    catalog, _ = run_crawl(spark, str(tmp_path / "cat"), web, round_seconds=ROUND_S)
    rows = catalog.read("results").collect()
    assert rows, "crawl produced no results"
    seen_fmts = set()
    for r in rows:
        truth = web.pixels(r["url_canon"])
        got = decode(bytes(r["bytes"]), r["fmt"])
        assert got.shape == (r["h"], r["w"]) == truth.shape
        seen_fmts.add(r["fmt"])
        if r["fmt"] == "png":
            assert np.array_equal(got, truth)
        else:
            assert psnr(truth, got) >= 40.0
        assert r["caption"] == web.payload(r["url_canon"])["caption"]
        assert r["phash"] == web.payload(r["url_canon"])["phash"]
    assert seen_fmts == {"png", "qdct"}


def test_politeness_budget_respected(spark, tmp_path):
    web = T2_CORRECTNESS
    catalog, _ = run_crawl(
        spark, str(tmp_path / "cat"), web, round_seconds=ROUND_S, use_bloom=True
    )
    robots = {r["host"]: r for r in web.robots_rows()}
    per = (
        catalog.read("schedule_log")
        .groupBy("round_id", "host")
        .count()
        .collect()
    )
    import math

    for r in per:
        budget = max(1, math.floor(ROUND_S / robots[r["host"]]["crawl_delay_s"]))
        assert r["count"] <= budget, (r["host"], r["round_id"])


def test_resume_from_snapshot(spark, tmp_path):
    """Stop after k rounds, resume in a fresh catalog object: identical
    ordering + seen-set as an uninterrupted run (T2/T3 semantics)."""
    web = T1_SMOKE
    root = str(tmp_path / "resume")
    catalog = SnapshotCatalog(root, spark)
    init_crawl(catalog, web)
    run_round(catalog, web, round_seconds=ROUND_S)
    run_round(catalog, web, round_seconds=ROUND_S)
    del catalog  # "crash"

    catalog2, _ = resume_crawl(spark, root, web, round_seconds=ROUND_S)
    oracle = OracleCrawler(web, round_seconds=ROUND_S)
    oracle.run()
    assert _engine_schedule(catalog2) == oracle.schedule
    seen2 = {r["url_canon"] for r in catalog2.read("seen").select("url_canon").collect()}
    assert seen2 == oracle.seen


def test_determinism_two_runs(spark, tmp_path):
    web = T1_SMOKE
    c1, _ = run_crawl(spark, str(tmp_path / "a"), web, round_seconds=ROUND_S)
    c2, _ = run_crawl(spark, str(tmp_path / "b"), web, round_seconds=ROUND_S)
    assert _engine_schedule(c1) == _engine_schedule(c2)
    # order-insensitive checksum; bit_xor can't overflow under ANSI mode
    h1 = c1.read("results").select(
        F.bit_xor(F.xxhash64("image_id", "caption", "phash"))
    ).first()[0]
    h2 = c2.read("results").select(
        F.bit_xor(F.xxhash64("image_id", "caption", "phash"))
    ).first()[0]
    assert h1 == h2


def test_metrics_reconciliation(spark, tmp_path):
    """Count reconciliation — the reference's own oracle
    (crawler.py:617-631): per-round metrics sums equal table deltas."""
    web = T1_SMOKE
    catalog, history = run_crawl(spark, str(tmp_path / "cat"), web, round_seconds=ROUND_S)
    m = (
        catalog.read("round_metrics")
        .groupBy("round_id")
        .agg(
            F.sum("scheduled").alias("scheduled"),
            F.sum("results").alias("results"),
            F.sum("failed").alias("failed"),
        )
        .collect()
    )
    by_round = {r["round_id"]: r for r in m}
    for h in history:
        if h["scheduled"] == 0:
            continue
        r = by_round[h["round_id"]]
        assert r["scheduled"] == h["scheduled"]
        assert r["results"] == h["results"]
        assert r["failed"] == h["failed"]
