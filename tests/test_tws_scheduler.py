"""Back-queue frontier scheduler (streaming/tws.py): in-state requeue
semantics vs a pure-Python mirror, serve-slot continuity, lifetime
quota clamp; the transformWithStateInPandas twin runs when its
protobuf dependency is present (skips honestly otherwise)."""

import os

import pytest

from crawler_spark.streaming.tws import have_tws_deps


def _mirror(batches, budget, quota=None):
    """Sequential replay of the scheduler's contract."""
    backlog = {}  # host -> list of (priority, depth, seq, url, requeued)
    served = {}
    out = []
    for batch in batches:
        byhost = {}
        for host, url, pr, dp, seq in batch:
            byhost.setdefault(host, [])
            if url is not None:  # null url = tick (drain trigger only)
                byhost[host].append((pr, dp, seq, url, False))
        # a grouped stateful operator runs only for keys present in the
        # batch — backlog drains only when the host arrives or ticks
        for host in byhost:
            merged = sorted(
                backlog.get(host, []) + byhost.get(host, []),
                key=lambda t: t[:3],
            )
            n = min(budget, len(merged))
            if quota is not None:
                n = min(n, max(0, quota - served.get(host, 0)))
            for i, (pr, dp, seq, url, rq) in enumerate(merged[:n]):
                out.append(
                    (host, url, pr, dp, seq, served.get(host, 0) + i + 1, rq)
                )
            served[host] = served.get(host, 0) + n
            backlog[host] = [
                (pr, dp, seq, url, True) for pr, dp, seq, url, _ in merged[n:]
            ]
    return sorted(out)


def _write_batches(spark, tmpdir, batches):
    d = os.path.join(tmpdir, "urls")
    for batch in batches:
        spark.createDataFrame(
            batch,
            "host string, url string, priority long, depth long, discovery_seq long",
        ).coalesce(1).write.mode("append").parquet(d)
    return d


def _batches():
    # host a: 5 urls at once (3 defer), then a HIGHER-priority arrival
    # that must beat the waiting backlog; host b trickles 1 per batch;
    # batches 3-4 drain host a's remaining backlog via tick rows (null
    # url) — the host has no fresh arrivals but its queue must empty
    return [
        [
            ("a", "a0", 1, 0, 0), ("a", "a1", 1, 0, 1), ("a", "a2", 1, 0, 2),
            ("a", "a3", 1, 0, 3), ("a", "a4", 1, 0, 4),
            ("b", "b0", 0, 0, 5),
        ],
        [("a", "hot", 0, 0, 9), ("b", "b1", 0, 0, 6)],
        [("a", None, 0, 0, 0), ("b", "b2", 0, 0, 7)],
        [("a", None, 0, 0, 0)],
    ]


def _run(spark, tmp_path, budget, quota=None, impl="apply"):
    from crawler_spark.streaming.tws import run_backqueue_stream

    d = _write_batches(spark, str(tmp_path), _batches())
    name = run_backqueue_stream(
        spark, d, budget_per_batch=budget, max_per_host=quota,
        name=f"bq_{impl}_{budget}_{quota}", impl=impl,
    )
    rows = spark.sql(f"select * from {name}").collect()
    return sorted(
        (r.host, r.url, r.priority, r.depth, r.discovery_seq,
         r.serve_slot, r.requeued)
        for r in rows
    )


def test_backqueue_matches_mirror(spark, tmp_path):
    """Deferred URLs re-compete from state: the batch-2 'hot' arrival
    (priority 0) is admitted before the batch-1 backlog, and backlog
    survivors carry requeued=True when they finally admit."""
    got = _run(spark, tmp_path, budget=2)
    want = _mirror(_batches(), budget=2)
    assert got == want
    # an admission from the in-state back-queue, not its arrival batch
    assert any(r[6] for r in got), "no requeued admission exercised"
    slot = {r[1]: r[5] for r in got if r[0] == "a"}
    assert slot["hot"] < slot["a2"]


def test_serve_slot_contiguous_per_host(spark, tmp_path):
    got = _run(spark, tmp_path, budget=2)
    for host in ("a", "b"):
        slots = sorted(r[5] for r in got if r[0] == host)
        assert slots == list(range(1, len(slots) + 1))


def test_lifetime_quota_clamps(spark, tmp_path):
    """max_per_host=3: host a admits exactly 3 over all batches even
    though 6 URLs arrived and the per-batch budget alone would admit
    more; the backlog stays parked in state (never emitted)."""
    got = _run(spark, tmp_path, budget=2, quota=3)
    want = _mirror(_batches(), budget=2, quota=3)
    assert got == want
    assert sum(1 for r in got if r[0] == "a") == 3


@pytest.mark.skipif(
    not have_tws_deps(),
    reason="transformWithStateInPandas needs protobuf (not in container)",
)
def test_tws_twin_matches_apply_impl(spark, tmp_path):
    """The transformWithStateInPandas form produces the identical
    admission sequence (same shared core, typed ListState back-queue)."""
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        got = _run(spark, tmp_path, budget=2, impl="tws")
    finally:
        if old:
            spark.conf.set(key, old)
        else:
            spark.conf.unset(key)
    assert got == _mirror(_batches(), budget=2)
