"""Structured Streaming analogs of the engine's stateful behaviors.

The crawl itself is batch rounds by design (north_rule: "each crawl round
is a batch DataFrame job"), but the engine also ships streaming variants
for continuous ingestion: windowed fetch-metrics aggregation with
watermarked late-data handling (T4), and a streaming frontier feed.
Tested with the memory sink + processAllAvailable (synchronous batch
drive), per the Structured Streaming docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts per event_type — the streaming
    form of the per-round metrics aggregation (A6)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )


def run_events_stream(spark: SparkSession, parquet_dir: str, name: str = "stream_out"):
    """Drive the windowed agg over a parquet directory as a stream;
    returns the completed in-memory result table name."""
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(parquet_dir)
    )
    agg = windowed_event_counts(src)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return name
