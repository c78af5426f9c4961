"""Continuous crawl: the batch round loop driven by Structured Streaming.

The batch engine (plans/rounds.py) crawls a FIXED seed list to
exhaustion. A production crawler is never done — new seeds keep arriving
(operator submissions, sitemap discoveries, recrawl expiries). This
module runs the same snapshot-committed round loop as a streaming job:
a ``readStream`` of seed batches, ``foreachBatch`` ingesting each batch
into the frontier and then running rounds until the frontier drains.

Exactly-once WITHOUT markers: seed ingestion is idempotent by
construction, because :func:`add_seeds` routes every candidate through
the same URL-seen gate as discovered outlinks — a replayed micro-batch
(crash before the checkpoint advanced, or a fresh checkpoint over old
files) anti-joins to zero rows and commits an empty delta. The URL-seen
set IS the exactly-once mechanism; that is true of every real crawler,
and it means no (sink_id, batch_id) bookkeeping can drift out of sync
with crawl state.

Scale notes: a seed micro-batch is processed with the identical plans as
a round's link expansion — canonicalize, first-wins dedup, bloom/cuckoo
prefiltered anti-join, dense sequence assignment, O(batch) appended
delta rows — so a million-URL sitemap drop is as distributed as any
crawl round; nothing is collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark.functions.canon import with_url_cols
from crawler_spark.operators.cuckoo import (
    BucketedCuckoo,
    cuckoo_delta_rows,
    merge_cuckoo_rows,
)
from crawler_spark.operators.seen import (
    BucketedBloom,
    anti_join_seen,
    anti_join_seen_pruned,
    bloom_delta_rows,
    merge_bloom_rows,
)
from crawler_spark.operators.sequence import assign_dense_seq
from crawler_spark.plans.rounds import (
    _frontier_select,
    _priority_col,
    init_crawl,
    run_round,
)
from crawler_spark.sources.catalog import SnapshotCatalog
from crawler_spark.sources.synth import SynthWeb

SEEDS_SCHEMA = "url string, seq long"


def add_seeds(
    catalog: SnapshotCatalog,
    seeds: DataFrame,
    host_priorities: dict[str, int] | None = None,
) -> int:
    """Distributed, idempotent seed ingestion: canonicalize, first-wins
    dedup within the batch (min ``seq`` wins — the producer's submission
    order), anti-join the URL-seen set (sidecar-prefiltered), assign
    dense discovery sequence numbers continuing the global counter, and
    commit the new pending rows as an O(batch) frontier delta.

    Returns the number of genuinely-new URLs added. Re-ingesting any
    already-seen URL (including a whole replayed batch) adds nothing."""
    meta = catalog.meta()
    canon = with_url_cols(seeds)
    new_urls = canon.groupBy("url_canon").agg(
        F.min("seq").alias("ord"),
        F.any_value("url_hash").alias("url_hash"),
        F.any_value("host").alias("host"),
    )
    # bucket-pruned sidecar load: only the slices this batch's hashes
    # touch are read, each deserialized on its own executor task — the
    # filter never materializes on the driver (same path as run_round)
    bloom_cfg = meta.get("bloom")
    cuckoo_cfg = meta.get("cuckoo")
    sidecar = None
    if cuckoo_cfg and catalog.exists("cuckoo"):
        sidecar = ("cuckoo", catalog.read("cuckoo"), cuckoo_cfg)
    elif bloom_cfg and catalog.exists("bloom"):
        sidecar = ("bloom", catalog.read("bloom"), bloom_cfg)
    if sidecar is not None:
        kind, sdf, scfg = sidecar
        unseen_raw = anti_join_seen_pruned(
            new_urls, catalog.read("seen"), sdf, kind, scfg
        )
    else:
        unseen_raw = anti_join_seen(new_urls, catalog.read("seen"), None)
    offset = int(meta.get("next_seq", 0))
    seqd, n_new, handle = assign_dense_seq(
        unseen_raw, order_cols=["ord"], seq_col="discovery_seq", offset=offset
    )
    if n_new == 0:
        if handle is not None:
            handle.unpersist()
        return 0
    round_id = catalog.current_id() + 1
    rows = (
        seqd.drop("ord")
        .withColumn("priority", _priority_col(host_priorities))
        .withColumn("depth", F.lit(0))
        .withColumn("discovery_ts", F.timestamp_micros(F.col("discovery_seq")))
        .withColumn("status", F.lit("pending"))
        .withColumn("round_id", F.lit(round_id))
        .withColumn("attempts", F.lit(0))
        .withColumn("born_round", F.lit(round_id))
    ).persist()
    catalog.stage_append("frontier_updates", _frontier_select(rows))
    catalog.stage_append("seen", rows.select("url_hash", "url_canon"))
    if bloom_cfg and catalog.exists("bloom"):
        delta = bloom_delta_rows(rows.select("url_hash"), **bloom_cfg)
        catalog.stage_overwrite(
            "bloom", merge_bloom_rows(catalog.read("bloom").unionByName(delta))
        )
    if cuckoo_cfg and catalog.exists("cuckoo"):
        delta = cuckoo_delta_rows(rows.select("url_hash"), **cuckoo_cfg)
        catalog.stage_overwrite(
            "cuckoo",
            merge_cuckoo_rows(
                catalog.read("cuckoo").unionByName(delta),
                cuckoo_cfg["n_slots"], cuckoo_cfg["slot_width"],
            ),
        )
    new_meta = {"next_seq": offset + n_new}
    if meta.get("frontier_rows") is not None:
        new_meta["frontier_rows"] = meta["frontier_rows"] + n_new
        new_meta["frontier_delta_rows"] = (
            meta.get("frontier_delta_rows", 0) + n_new
        )
    catalog.commit(meta=new_meta)
    rows.unpersist()
    if handle is not None:
        handle.unpersist()
    return n_new


def continuous_crawl(
    spark: SparkSession,
    root: str,
    web: SynthWeb,
    seeds_stream: DataFrame,
    checkpoint_dir: str,
    round_seconds: float = 16.0,
    max_rounds_per_batch: int = 16,
    **round_kw,
):
    """Run the crawl as a streaming query over a seed stream.

    ``seeds_stream``: a streaming DataFrame of (url string, seq long) —
    seq is the producer's submission order (ties broken by the first-
    wins canonical dedup). Each micro-batch: idempotent seed ingestion,
    then rounds until the frontier drains or ``max_rounds_per_batch``.
    Returns the started StreamingQuery (caller awaits/stops)."""
    catalog = SnapshotCatalog(root, spark)
    if catalog.current_id() < 0:
        init_crawl(
            catalog, web, seeds_raw=[],
            host_priorities=round_kw.get("host_priorities"),
        )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        # seeds take the same host-priority map the rounds crawl under,
        # so a streamed seed schedules exactly where a batch seed would
        add_seeds(catalog, batch_df, round_kw.get("host_priorities"))
        for _ in range(max_rounds_per_batch):
            stats = run_round(catalog, web, round_seconds=round_seconds, **round_kw)
            if stats["scheduled"] == 0:
                break

    return (
        seeds_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
