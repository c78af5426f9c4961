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
# the key a row actually schedules under: eff_priority is the AGED
# priority when aging_every is on and == priority otherwise
# (plans/rounds.py schedule_log)
ORDER = ["eff_priority", "depth", "discovery_seq", "url_hash"]


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
    from crawler_spark.plans.rounds import read_frontier

    mx = read_frontier(catalog).agg(F.max("discovery_seq")).first()[0]
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


def test_target_host_filter_oracle_match(spark, tmp_path):
    """F9 single-region targeting (reference: crawler.py:1205-1226):
    targeted rounds schedule only matching hosts while other pending rows
    stay untouched; a following untargeted crawl completes; the full
    schedule matches the oracle with the same targeting sequence."""
    web = T1_SMOKE
    catalog = SnapshotCatalog(str(tmp_path / "t"), spark)
    init_crawl(catalog, web)
    run_round(catalog, web, round_seconds=ROUND_S, target_host_contains="host-1")
    run_round(catalog, web, round_seconds=ROUND_S, target_host_contains="host-1")
    for _ in range(24):
        if run_round(catalog, web, round_seconds=ROUND_S)["scheduled"] == 0:
            break

    oracle = OracleCrawler(web, round_seconds=ROUND_S)
    oracle.run_round(1, target_host_contains="host-1")
    oracle.run_round(2, target_host_contains="host-1")
    r = 3
    while oracle.run_round(r) > 0 and r < 26:
        r += 1

    sched = oracle.schedule
    assert _engine_schedule(catalog) == sched
    hosts_r1 = {u.split("//")[1].split("/")[0] for rid, u in sched if rid == 1}
    assert hosts_r1 == {"host-1.test"}  # the filter actually filtered
    all_hosts = {u.split("//")[1].split("/")[0] for _, u in sched}
    assert len(all_hosts) == web.n_hosts  # untargeted rounds caught up


def test_stop_on_found_early_exit(spark, tmp_path):
    """Stop-on-found (reference: crawler.py:1149-1157): the crawl halts
    after the round that lands a result matching the target caption —
    identical early-exit point and schedule as the oracle."""
    web = T1_SMOKE
    full = OracleCrawler(web, round_seconds=ROUND_S)
    full.run()
    full_rounds = max(r for r, _ in full.schedule)
    # target = the unique image id of a result from the FIRST results
    # round, so the crawl provably stops early
    first_result_round = min(
        r for r, u in full.schedule if u in set(full.results)
    )
    target_url = next(
        u for r, u in full.schedule
        if r == first_result_round and u in set(full.results)
    )
    target = web.payload(target_url)["image_id"]

    catalog, history = run_crawl(
        spark, str(tmp_path / "s"), web, round_seconds=ROUND_S,
        stop_on_caption_contains=target,
    )
    oracle = OracleCrawler(web, round_seconds=ROUND_S)
    oracle.run(stop_on_caption_contains=target)
    assert _engine_schedule(catalog) == oracle.schedule
    assert history[-1]["target_hits"] > 0
    assert len(history) == first_result_round < full_rounds


def test_frontier_merge_on_read(spark, tmp_path):
    """Merge-on-read frontier: with compaction disabled, the base table's
    files are byte-identical across rounds (only O(round) delta rows ever
    write); with compaction forced every round, the crawl still matches
    the oracle exactly."""
    import glob
    import hashlib
    import os

    web = T1_SMOKE

    def base_hashes(cat):
        out = {}
        for d in cat.tables()["frontier"]:
            for f in sorted(glob.glob(os.path.join(d, "**", "*"), recursive=True)):
                if os.path.isfile(f):
                    with open(f, "rb") as fh:
                        out[f] = hashlib.md5(fh.read()).hexdigest()
        return out

    catalog = SnapshotCatalog(str(tmp_path / "m"), spark)
    init_crawl(catalog, web)
    h0 = base_hashes(catalog)
    run_round(catalog, web, round_seconds=ROUND_S, compact_min=10**9)
    run_round(catalog, web, round_seconds=ROUND_S, compact_min=10**9)
    assert base_hashes(catalog) == h0  # base untouched, bit for bit
    assert catalog.exists("frontier_updates")

    c2, _ = run_crawl(
        spark, str(tmp_path / "m2"), web, round_seconds=ROUND_S, compact_min=0
    )
    oracle = OracleCrawler(web, round_seconds=ROUND_S)
    oracle.run()
    assert _engine_schedule(c2) == oracle.schedule
    seen2 = {r["url_canon"] for r in c2.read("seen").select("url_canon").collect()}
    assert seen2 == oracle.seen


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


def test_incremental_read_yields_exactly_each_rounds_results(spark, tmp_path):
    """CDC integration: a downstream consumer reading
    read_incremental("results", snap_{r-1}, snap_r) must see exactly the
    rows round r appended — so index builders / training-shard writers
    can follow the crawl without rescanning the full results table."""
    web = T1_SMOKE
    catalog = SnapshotCatalog(str(tmp_path / "cdc"), spark)
    init_crawl(catalog, web)
    snaps = [catalog.current_id()]
    n_rounds = 5  # T1_SMOKE's leaves sit at depth 3: results from round 4
    for _ in range(n_rounds):
        run_round(catalog, web, round_seconds=ROUND_S, compact_min=10**9)
        snaps.append(catalog.current_id())
    results = catalog.read("results")
    total = 0
    for r in range(1, n_rounds + 1):
        want = sorted(
            x.url_canon
            for x in results.filter(F.col("round_id") == r)
            .select("url_canon")
            .collect()
        )
        delta = catalog.read_incremental("results", snaps[r - 1], snaps[r])
        got = sorted(x.url_canon for x in delta.select("url_canon").collect())
        assert got == want, f"round {r} delta mismatch"
        total += len(got)
    assert total > 0  # later rounds reach leaf pages; the crawl did fetch


def test_host_priority_queue_drives_ordering(spark, tmp_path):
    """OPIC-style priority queue, actually driven: a host -> priority
    map (lower first) reorders the crawl; engine schedule == the
    priority-aware sequential oracle exactly; the order genuinely
    differs from the unprioritized crawl while coverage (seen set,
    results) is unchanged on a fully drained web."""
    pr = {"host-0.test": 2, "host-1.test": 1, "host-2.test": 0}
    catalog, _ = run_crawl(
        spark, str(tmp_path / "prio"), T1_SMOKE, round_seconds=ROUND_S,
        host_priorities=pr,
    )
    oracle = OracleCrawler(T1_SMOKE, round_seconds=ROUND_S, host_priorities=pr)
    oracle.run()
    assert _engine_schedule(catalog) == oracle.schedule
    engine_seen = {
        r["url_canon"] for r in catalog.read("seen").select("url_canon").collect()
    }
    assert engine_seen == oracle.seen

    base = OracleCrawler(T1_SMOKE, round_seconds=ROUND_S)
    base.run()
    assert oracle.schedule != base.schedule  # priorities took effect
    assert oracle.seen == base.seen          # ...without changing coverage


def test_rank_fed_two_wave_crawl(spark, tmp_path):
    """The full adaptive loop: crawl a wave, rank hosts from its own
    results, quantize ranks into priority bands, and crawl again with
    the learned priorities — the re-crawl matches the priority-aware
    oracle exactly. This is the composition the north rule's OPIC
    priority queue exists for."""
    from crawler_spark.operators.rank import rank_to_priorities

    cat1, _ = run_crawl(
        spark, str(tmp_path / "wave1"), T1_SMOKE, round_seconds=ROUND_S
    )
    per_host = (
        cat1.read("results")
        .groupBy("host")
        .agg(F.count("*").cast("double").alias("rank"))
    )
    pr_rows = rank_to_priorities(per_host, "host", "rank", n_bands=2).collect()
    pr = {r["host"]: r["priority"] for r in pr_rows}
    assert len(set(pr.values())) > 1  # bands actually split the hosts

    cat2, _ = run_crawl(
        spark, str(tmp_path / "wave2"), T1_SMOKE, round_seconds=ROUND_S,
        host_priorities=pr,
    )
    oracle = OracleCrawler(T1_SMOKE, round_seconds=ROUND_S, host_priorities=pr)
    oracle.run()
    assert _engine_schedule(cat2) == oracle.schedule
    seen2 = {
        r["url_canon"] for r in cat2.read("seen").select("url_canon").collect()
    }
    assert seen2 == oracle.seen


def test_adaptive_politeness_oracle_match(spark, tmp_path):
    """Closed-loop politeness: a host with any fetch failure crawls at
    half budget the NEXT round (floor, min 1) — engine matches the
    adaptive oracle exactly on the flaky web, and the adaptive schedule
    genuinely differs from the fixed-budget crawl while final coverage
    is unchanged on a fully drained web."""
    catalog, _ = run_crawl(
        spark, str(tmp_path / "ad"), T4_FLAKY, round_seconds=ROUND_S,
        adaptive=True,
    )
    oracle = OracleCrawler(T4_FLAKY, round_seconds=ROUND_S, adaptive=True)
    oracle.run()
    assert _engine_schedule(catalog) == oracle.schedule
    engine_seen = {
        r["url_canon"] for r in catalog.read("seen").select("url_canon").collect()
    }
    assert engine_seen == oracle.seen
    engine_fail = {
        r["url_canon"]
        for r in catalog.read("fetch_failures").select("url_canon").collect()
    }
    assert engine_fail == {u for u, _ in oracle.failures}

    fixed = OracleCrawler(T4_FLAKY, round_seconds=ROUND_S)
    fixed.run()
    assert oracle.schedule != fixed.schedule  # halving took effect
    assert oracle.seen == fixed.seen          # coverage unchanged


def test_all_features_combined_oracle_match(spark, tmp_path):
    """Kitchen-sink interaction gate: transient failures (retry budget),
    priority-queue host map, adaptive politeness feedback, priority
    aging, and the bloom prefilter — ALL enabled in one crawl. Feature
    pairs are each oracle-tested above; this pins the full product of
    interactions (e.g. a retried URL re-entering an AGED frontier under
    an adaptively-halved budget) to the sequential oracle exactly."""
    web = T4_FLAKY
    pr = {"host-0.test": 2, "host-1.test": 1, "host-5.test": 3}
    kw = dict(
        round_seconds=ROUND_S,
        max_attempts=2,
        host_priorities=pr,
        adaptive=True,
        aging_every=2,
    )
    catalog, _ = run_crawl(
        spark, str(tmp_path / "combo"), web, use_bloom=True, **kw
    )
    oracle = OracleCrawler(web, **kw)
    oracle.run()

    sched = oracle.schedule
    assert _engine_schedule(catalog) == sched
    # the scenario is non-degenerate: retries happened (dup schedule
    # rows) AND aging/priorities actually reordered vs the plain run
    assert len(sched) > len({u for _, u in sched})
    plain = OracleCrawler(web, round_seconds=ROUND_S, max_attempts=2)
    plain.run()
    assert sched != plain.schedule
    assert oracle.seen == plain.seen  # coverage invariant under reordering

    engine_seen = {
        r["url_canon"] for r in catalog.read("seen").select("url_canon").collect()
    }
    assert engine_seen == oracle.seen
    engine_results = {
        r["url_canon"] for r in catalog.read("results").select("url_canon").collect()
    }
    assert engine_results == set(oracle.results)
    fails = catalog.read("fetch_failures").select("url_canon", "attempts").collect()
    assert {r["url_canon"] for r in fails} == {u for u, _ in oracle.failures}
    assert all(r["attempts"] == 2 for r in fails)


def test_host_quota_oracle_match(spark, tmp_path):
    """Cumulative host quota (max_pages_per_host, the Heritrix host-quota
    control): a host that has consumed its lifetime schedule slots never
    schedules again; its surplus rows stay pending and the loop drains.
    Engine schedule + seen-set must match the sequential oracle exactly,
    and the quota must actually bind."""
    web = T2_CORRECTNESS
    quota = 4
    kw = dict(round_seconds=ROUND_S, max_pages_per_host=quota)
    catalog, _ = run_crawl(spark, str(tmp_path / "quota"), web, use_bloom=True, **kw)
    oracle = OracleCrawler(web, **kw)
    oracle.run()

    assert _engine_schedule(catalog) == oracle.schedule
    engine_seen = {
        r["url_canon"] for r in catalog.read("seen").select("url_canon").collect()
    }
    assert engine_seen == oracle.seen

    # non-degenerate: the cap binds (some host consumed exactly `quota`
    # slots, none exceeded it) and the capped crawl fetched strictly
    # fewer slots than the unlimited baseline
    assert oracle.host_served and max(oracle.host_served.values()) == quota
    assert all(v <= quota for v in oracle.host_served.values())
    plain = OracleCrawler(web, round_seconds=ROUND_S)
    plain.run()
    assert len(oracle.schedule) < len(plain.schedule)

    # engine's own quota-state table agrees with the oracle's counter
    served = {
        r["host"]: r["n"]
        for r in catalog.read("host_served")
        .groupBy("host")
        .agg(F.sum("n_scheduled").alias("n"))
        .collect()
    }
    assert served == oracle.host_served


def test_host_quota_resume(spark, tmp_path):
    """Quota crawls are resumable: the host_served state table is part of
    the snapshot, so stop-after-k-rounds + resume with the same flag is
    schedule-identical to an uninterrupted quota crawl."""
    web = T2_CORRECTNESS
    quota = 4
    root = str(tmp_path / "quota_resume")
    catalog = SnapshotCatalog(root, spark)
    init_crawl(catalog, web)
    run_round(catalog, web, round_seconds=ROUND_S, max_pages_per_host=quota)
    run_round(catalog, web, round_seconds=ROUND_S, max_pages_per_host=quota)
    del catalog  # "crash"

    catalog2, _ = resume_crawl(
        spark, root, web, round_seconds=ROUND_S, max_pages_per_host=quota
    )
    oracle = OracleCrawler(web, round_seconds=ROUND_S, max_pages_per_host=quota)
    oracle.run()
    assert _engine_schedule(catalog2) == oracle.schedule
    seen2 = {
        r["url_canon"] for r in catalog2.read("seen").select("url_canon").collect()
    }
    assert seen2 == oracle.seen


def test_ip_politeness_oracle_match(spark, tmp_path):
    """Mercator shared-IP politeness (politeness_by='ip'): hostnames map
    onto n_ips shared servers (xxhash64 pmod), the admission window keys
    by IP, and an IP's budget is the min of its member hosts' budgets.
    Engine schedule + seen-set match the sequential oracle exactly; the
    shared budget slows the crawl relative to host-keyed politeness
    without changing coverage."""
    from crawler_spark.functions.xxh import xxh64_str

    web = T2_CORRECTNESS
    kw = dict(round_seconds=ROUND_S, politeness_by="ip", n_ips=2)
    catalog, _ = run_crawl(spark, str(tmp_path / "ip"), web, **kw)
    oracle = OracleCrawler(web, **kw)
    oracle.run()

    assert _engine_schedule(catalog) == oracle.schedule
    engine_seen = {
        r["url_canon"] for r in catalog.read("seen").select("url_canon").collect()
    }
    assert engine_seen == oracle.seen

    # non-degenerate: hosts actually share IPs, and the shared budget
    # reordered the schedule vs host-keyed politeness (same coverage)
    hosts = {h for _, u in oracle.schedule for h in [u.split("://")[1].split("/")[0]]}
    assert len(hosts) > len({xxh64_str(h) % 2 for h in hosts})
    plain = OracleCrawler(web, round_seconds=ROUND_S)
    plain.run()
    assert oracle.schedule != plain.schedule
    assert oracle.seen == plain.seen


def test_reprioritize_mid_crawl_matches_oracle(spark, tmp_path):
    """Rank-feedback loop: after two rounds under priority map A, the
    map is REPLACED (reprioritize) — pending rows re-key via a
    merge-on-read delta, new discoveries follow the new map — and the
    remaining rounds' exact schedule + final seen set still match the
    sequential oracle performing the same flip."""
    from crawler_spark.plans.rounds import reprioritize

    web = T2_CORRECTNESS
    # map A favors high-numbered hosts; map B flips it and drops some
    # hosts entirely (fallback-to-0 must agree between engine + oracle)
    prio_a = {f"host-{i}.test": (9 - i) % 4 for i in range(10)}
    prio_b = {f"host-{i}.test": i % 3 for i in range(7)}

    catalog = SnapshotCatalog(str(tmp_path / "repri"), spark)
    init_crawl(catalog, web, host_priorities=prio_a)
    oracle = OracleCrawler(web, round_seconds=ROUND_S, host_priorities=prio_a)

    round_id = 0
    for _ in range(2):
        round_id += 1
        stats = run_round(
            catalog, web, round_seconds=ROUND_S, host_priorities=prio_a
        )
        oracle.run_round(round_id)
        assert stats["scheduled"] > 0
    n_rekeyed = reprioritize(catalog, prio_b)
    assert n_rekeyed > 0  # the flip touched real pending rows
    oracle.reprioritize(prio_b)
    for _ in range(30):
        round_id += 1
        stats = run_round(
            catalog, web, round_seconds=ROUND_S, host_priorities=prio_b
        )
        oracle.run_round(round_id)
        if stats["scheduled"] == 0:
            break

    # engine rounds advance by 2 per oracle round (reprioritize commits
    # its own snapshot) — compare order-of-scheduling, not raw ids
    eng = [u for _, u in _engine_schedule(catalog)]
    want = [u for _, u in oracle.schedule]
    assert eng == want
    # and per-round grouping must still agree: round boundaries are the
    # same partition of the sequence on both sides
    from itertools import groupby

    eng_rounds = [
        [u for _, u in g]
        for _, g in groupby(_engine_schedule(catalog), key=lambda t: t[0])
    ]
    want_rounds = [
        [u for _, u in g] for _, g in groupby(oracle.schedule, key=lambda t: t[0])
    ]
    assert eng_rounds == want_rounds
    engine_seen = {
        r["url_canon"] for r in catalog.read("seen").select("url_canon").collect()
    }
    assert engine_seen == oracle.seen


def test_trap_gate_drains_calendar_trap_and_matches_oracle(spark, tmp_path):
    """T5_TRAP: host-1's root links into an infinite /cal/2024/... chain.
    With the pathological-path gate armed (repeat >= 3) the crawl DRAINS,
    the chain is cut at the first 3-repeat URL, and ordering/seen/trapped
    all match the oracle applying the identical rule."""
    from crawler_spark.sources.synth import T5_TRAP

    catalog, history = run_crawl(
        spark, str(tmp_path / "trap"), T5_TRAP, round_seconds=ROUND_S,
        max_rounds=24, trap_max_seg_repeat=3,
    )
    assert history[-1]["scheduled"] == 0  # drained, not round-capped
    assert sum(h.get("trapped", 0) for h in history) >= 1
    oracle = OracleCrawler(T5_TRAP, round_seconds=ROUND_S, trap_max_seg_repeat=3)
    oracle.run(max_rounds=24)
    assert _engine_schedule(catalog) == oracle.schedule
    engine_seen = {
        r["url_canon"] for r in catalog.read("seen").select("url_canon").collect()
    }
    assert engine_seen == oracle.seen
    # trapped rows recorded terminally with matching URLs
    from crawler_spark.plans.rounds import read_frontier

    engine_trapped = {
        r["url_canon"]
        for r in read_frontier(catalog).filter(F.col("status") == "trapped").collect()
    }
    assert engine_trapped == set(oracle.trapped)
    assert engine_trapped  # the chain actually tripped the gate
    # nothing scheduled ever repeated a segment 3+ times
    for _, url in oracle.schedule:
        segs = [s for s in url.split("://", 1)[1].split("/")[1:] if s]
        if segs:
            from collections import Counter

            assert max(Counter(segs).values()) < 3, url


def test_ungated_calendar_trap_never_drains(spark, tmp_path):
    """The same web WITHOUT the gate keeps scheduling the chain every
    round until max_rounds — the trap is real, not an artifact."""
    from crawler_spark.sources.synth import T5_TRAP

    catalog, history = run_crawl(
        spark, str(tmp_path / "untrap"), T5_TRAP, round_seconds=ROUND_S,
        max_rounds=12,
    )
    assert len(history) == 12
    assert all(h["scheduled"] >= 1 for h in history)
    # and the engine still matches the oracle even while looping
    oracle = OracleCrawler(T5_TRAP, round_seconds=ROUND_S)
    oracle.run(max_rounds=12)
    assert _engine_schedule(catalog) == oracle.schedule
