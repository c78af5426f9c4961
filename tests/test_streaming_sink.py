"""Exactly-once foreachBatch sink (streaming/sink.py).

At-least-once replays must not duplicate rows: the batch id commits in
the same snapshot as its data, so a replayed micro-batch (same or older
batch_id) is a no-op — including a full re-run of the stream from a
fresh checkpoint over already-ingested input.
"""

from datetime import datetime

from crawler_spark.sources.catalog import SnapshotCatalog
from crawler_spark.streaming.sink import exactly_once_sink, run_stream_to_catalog


def _urls(spark, lo, hi):
    rows = [
        (f"http://h{i % 3}.test/p{i}", i, f"h{i % 3}.test", datetime(2026, 1, 1, 0, i))
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(
        rows, "url_canon string, url_hash long, host string, ts timestamp"
    )


def test_replayed_batch_is_a_noop(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat"), spark)
    wb = exactly_once_sink(cat, "results", "s1")
    wb(_urls(spark, 0, 5), 0)
    assert cat.read("results").count() == 5
    wb(_urls(spark, 0, 5), 0)  # crash-recovery replay of batch 0
    assert cat.read("results").count() == 5
    wb(_urls(spark, 5, 8), 1)  # next batch appends normally
    assert cat.read("results").count() == 8
    # the marker travels with the snapshot: time travel sees the old one
    assert cat.meta()["sink_last_batch:s1:results"] == 1
    assert cat.meta(snapshot=0)["sink_last_batch:s1:results"] == 0


def test_full_stream_rerun_does_not_duplicate(spark, tmp_path):
    src = str(tmp_path / "in")
    for k in range(3):
        _urls(spark, 10 * k, 10 * k + 10).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    cat = SnapshotCatalog(str(tmp_path / "cat"), spark)
    run_stream_to_catalog(spark, src, cat, table="stream_results", sink_id="u1")
    n1 = cat.read("stream_results").count()
    assert n1 == 30
    # same input, FRESH checkpoint: batch ids restart at 0, every batch
    # is at or below the committed marker -> entire rerun is a no-op
    run_stream_to_catalog(spark, src, cat, table="stream_results", sink_id="u1")
    assert cat.read("stream_results").count() == 30


def test_stream_static_robots_gate(spark, tmp_path):
    """Stream-static join: denied hosts are dropped mid-stream, known
    hosts carry their crawl delay, unknown hosts default to allowed."""
    from crawler_spark.streaming.events import run_robots_gate_stream

    src = str(tmp_path / "in")
    for k in range(2):
        _urls(spark, 10 * k, 10 * k + 10).coalesce(1).write.mode("append").parquet(src)
    robots = spark.createDataFrame(
        [("h0.test", True, 2.0), ("h1.test", False, 5.0)],
        "host string, denied boolean, crawl_delay_s double",
    )
    name = run_robots_gate_stream(spark, src, robots)
    out = spark.table(name).collect()
    hosts = {r.host for r in out}
    assert "h0.test" not in hosts            # denied host gone
    assert {"h1.test", "h2.test"} <= hosts   # allowed + unknown pass
    delays = {r.host: r.crawl_delay_s for r in out}
    assert delays["h1.test"] == 5.0
    assert delays["h2.test"] == 1.0          # unknown host default
    # every input row for allowed hosts survived (20 rows, h0 drops 1/3)
    assert len(out) == sum(1 for i in range(20) if i % 3 != 0)
