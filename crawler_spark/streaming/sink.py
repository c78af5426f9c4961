"""Exactly-once streaming sink into the snapshot catalog.

Structured Streaming's foreachBatch gives at-least-once delivery: after
a crash the last micro-batch is REPLAYED with the same batch_id, so a
naive append sink duplicates rows. The standard fix (what Delta's
txnAppId/txnVersion and Iceberg's commit-dedup do) is to make the sink
transactional on (sink_id, batch_id): record the last committed batch id
atomically WITH the data, and skip any batch at or below it.

Here the transaction is a SnapshotCatalog commit — the same atomic
manifest-pointer swap the batch crawl rounds use (sources/catalog.py:95)
— so streaming crawl results land in the very tables the batch engine
reads, with one snapshot per micro-batch and replay-safe resume.

Scale notes: the dedup check is one dict lookup in the manifest meta (no
data read); each micro-batch writes its own immutable files, so commit
cost is O(1) in table size. Snapshot count grows with batches —
expire_snapshots is the existing GC. The reference's analog is the
re-runnable crawl callable + saved state pointer (base_crawler.py:
151-160, 232-284); this is its continuous-ingestion form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from crawler_spark.sources.catalog import SnapshotCatalog


def exactly_once_sink(catalog: SnapshotCatalog, table: str, sink_id: str = "stream"):
    """Return a foreachBatch callable appending each micro-batch to
    ``table`` exactly once, keyed on (sink_id, batch_id).

    Use: ``df.writeStream.foreachBatch(exactly_once_sink(cat, "results"))``.
    Replays (same or older batch_id after a failure) are no-ops; the
    batch id is committed in the SAME snapshot as its data, so there is
    no window where data is visible but the marker is not.
    """
    key = f"sink_last_batch:{sink_id}:{table}"

    def write_batch(df: DataFrame, batch_id: int) -> None:
        last = catalog.meta().get(key, -1)
        if batch_id <= last:
            return
        catalog.stage_append(table, df)
        catalog.commit(meta={key: batch_id})

    return write_batch


def run_stream_to_catalog(
    spark,
    parquet_dir: str,
    catalog: SnapshotCatalog,
    table: str = "stream_results",
    sink_id: str = "stream",
):
    """Drive a file stream (one file per micro-batch) into the catalog
    through the exactly-once sink; returns the last committed snapshot."""
    from crawler_spark.streaming.events import URLS_SCHEMA

    src = (
        spark.readStream.schema(URLS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(parquet_dir)
    )
    q = src.writeStream.foreachBatch(
        exactly_once_sink(catalog, table, sink_id)
    ).start()
    q.processAllAvailable()
    q.stop()
    return catalog.current_id()
