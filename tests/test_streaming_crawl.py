"""Continuous (Structured Streaming) crawl: a seed stream drives the
same snapshot-committed round loop as the batch engine — single-batch
parity with run_crawl, incremental seed arrival, and replay idempotence
through the URL-seen gate."""

from __future__ import annotations

import pytest

from crawler_spark.plans.rounds import run_crawl
from crawler_spark.sources.catalog import SnapshotCatalog
from crawler_spark.sources.synth import T1_SMOKE
from crawler_spark.streaming.crawl import SEEDS_SCHEMA, continuous_crawl

ROUND_S = 8.0
ORDER = ["priority", "depth", "discovery_seq", "url_hash"]


def _normalized_schedule(catalog):
    """(round_ordinal, url) pairs — snapshot ids differ between batch and
    streaming (streaming spends a snapshot on seed ingestion), so rounds
    are compared by ordinal position, not raw id."""
    rows = (
        catalog.read("schedule_log")
        .orderBy("round_id", *ORDER)
        .select("round_id", "url_canon")
        .collect()
    )
    ids = sorted({r["round_id"] for r in rows})
    ordinal = {rid: i for i, rid in enumerate(ids)}
    return [(ordinal[r["round_id"]], r["url_canon"]) for r in rows]


def _seen(catalog):
    return {
        r["url_canon"] for r in catalog.read("seen").select("url_canon").collect()
    }


def _results(catalog):
    return {
        r["url_canon"] for r in catalog.read("results").select("url_canon").collect()
    }


def _write_seeds(spark, path, urls, seq0=0):
    """Drop ONE flat parquet file at ``path`` — the streaming file source
    lists a directory of files, it does not recurse into the directory a
    DataFrame write would create."""
    import glob
    import os
    import shutil
    import tempfile

    d = tempfile.mkdtemp()
    spark.createDataFrame(
        [(u, seq0 + i) for i, u in enumerate(urls)], SEEDS_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(d)
    part = glob.glob(os.path.join(d, "part-*.parquet"))[0]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    shutil.move(part, path)
    shutil.rmtree(d, ignore_errors=True)


def _run_stream(spark, root, in_dir, ckpt):
    stream = spark.readStream.schema(SEEDS_SCHEMA).parquet(in_dir)
    q = continuous_crawl(
        spark, root, T1_SMOKE, stream, ckpt, round_seconds=ROUND_S
    )
    q.awaitTermination(300)
    assert not q.isActive


def test_streaming_single_batch_matches_batch_crawl(spark, tmp_path):
    seeds = T1_SMOKE.seeds_raw()
    in_dir = str(tmp_path / "in")
    _write_seeds(spark, f"{in_dir}/f0.parquet", seeds)
    _run_stream(spark, str(tmp_path / "scat"), in_dir, str(tmp_path / "ck"))
    scat = SnapshotCatalog(str(tmp_path / "scat"), spark)

    bcat, _ = run_crawl(
        spark, str(tmp_path / "bcat"), T1_SMOKE, round_seconds=ROUND_S
    )
    assert _normalized_schedule(scat) == _normalized_schedule(bcat)
    assert _seen(scat) == _seen(bcat)
    assert _results(scat) == _results(bcat)


def test_streaming_incremental_seeds_then_replay_noop(spark, tmp_path):
    all_seeds = T1_SMOKE.seeds_raw()
    in_dir = str(tmp_path / "in")
    root = str(tmp_path / "cat")
    # batch 1: two of the three hosts
    _write_seeds(spark, f"{in_dir}/f0.parquet", all_seeds[:2])
    _run_stream(spark, root, in_dir, str(tmp_path / "ck"))
    cat = SnapshotCatalog(root, spark)
    seen_after_1 = _seen(cat)
    host2_root = "http://host-2.test/"
    assert host2_root not in seen_after_1

    # batch 2: the third host PLUS a duplicate of an already-crawled seed
    _write_seeds(spark, f"{in_dir}/f1.parquet", [all_seeds[2], all_seeds[0]], seq0=100)
    _run_stream(spark, root, in_dir, str(tmp_path / "ck"))
    seen_after_2 = _seen(cat)
    assert host2_root in seen_after_2
    assert seen_after_1 < seen_after_2

    # final state matches a from-scratch batch crawl of all three hosts
    bcat, _ = run_crawl(
        spark, str(tmp_path / "bcat"), T1_SMOKE, round_seconds=ROUND_S
    )
    assert seen_after_2 == _seen(bcat)
    assert _results(cat) == _results(bcat)
    # no duplicate seen rows despite the re-submitted seed
    n = cat.read("seen").count()
    assert n == cat.read("seen").select("url_canon").distinct().count()

    # replay: FRESH checkpoint over the same files — the seen gate makes
    # re-ingestion a no-op (no marker bookkeeping to drift)
    snap_before = cat.current_id()
    _run_stream(spark, root, in_dir, str(tmp_path / "ck_fresh"))
    assert _seen(cat) == seen_after_2
    assert _results(cat) == _results(bcat)
    assert cat.read("seen").count() == n
    # the replay committed snapshots but scheduled nothing new
    log = cat.read("schedule_log")
    assert log.filter(f"round_id > {snap_before}").count() == 0




def test_streamed_seeds_respect_host_priorities(spark, tmp_path):
    """A priority-mapped streaming crawl schedules streamed seeds
    exactly where the equivalent batch crawl would — single-batch parity
    under a host-priority map."""
    pr = {"host-0.test": 2, "host-1.test": 1, "host-2.test": 0}
    in_dir = str(tmp_path / "in")
    _write_seeds(spark, f"{in_dir}/f0.parquet", T1_SMOKE.seeds_raw())
    stream = spark.readStream.schema(SEEDS_SCHEMA).parquet(in_dir)
    q = continuous_crawl(
        spark, str(tmp_path / "scat"), T1_SMOKE, stream,
        str(tmp_path / "ck"), round_seconds=ROUND_S, host_priorities=pr,
    )
    q.awaitTermination(300)
    assert not q.isActive
    scat = SnapshotCatalog(str(tmp_path / "scat"), spark)
    bcat, _ = run_crawl(
        spark, str(tmp_path / "bcat"), T1_SMOKE, round_seconds=ROUND_S,
        host_priorities=pr,
    )
    assert _normalized_schedule(scat) == _normalized_schedule(bcat)
    assert _seen(scat) == _seen(bcat)


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
