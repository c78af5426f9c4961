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


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_SESS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def stateful_sessionize(events: DataFrame, gap_seconds: int = 1800,
                        watermark: str = "2 hours") -> DataFrame:
    """Custom stateful streaming operator: per-user session windows with
    an inactivity gap, via ``applyInPandasWithState`` — the pattern for
    stateful semantics the built-in windowed aggs can't express (the
    frontier's per-host politeness state machine uses the same shape on
    a real continuous crawl).

    State per user = (session start, last event time, count, sum). An
    event past the gap closes the session (emitted) and opens a new one;
    the state times out GroupStateTimeout.EventTimeTimeout at the
    watermark, flushing the final open session. Emitted rows are closed
    sessions only — deterministic under replay because event-time, not
    wall-clock, drives every transition.
    """
    import pandas as pd  # local: executors import lazily
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        out = []

        def emit(s):
            out.append(
                (user_id, s[0], s[1], int(s[2]), float(s[3]))
            )

        if state.hasTimedOut:
            if state.exists:
                emit(state.get)
                state.remove()
        else:
            cur = list(state.get) if state.exists else None
            rows = pd.concat(list(pdfs), ignore_index=True)
            rows = rows.sort_values("ts")
            for ts, val in zip(rows["ts"], rows["value"]):
                us = int(ts.value // 1000)  # pandas ns -> us
                if cur is None:
                    cur = [us, us, 1, float(val)]
                elif us - cur[1] > gap_us:
                    emit(cur)
                    cur = [us, us, 1, float(val)]
                else:
                    cur[1] = max(cur[1], us)
                    cur[2] += 1
                    cur[3] += float(val)
            if cur is not None:
                state.update(tuple(cur))
                # timeout once the watermark passes the session gap
                state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": pd.array([o[0] for o in out], dtype="Int64"),
                    "session_start": pd.to_datetime(
                        [o[1] for o in out], unit="us", utc=True
                    ).tz_localize(None),
                    "session_end": pd.to_datetime(
                        [o[2] for o in out], unit="us", utc=True
                    ).tz_localize(None),
                    "n_events": pd.array([o[3] for o in out], dtype="Int64"),
                    "total_value": pd.array([o[4] for o in out], dtype="Float64"),
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_SESS_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


POLITE_URLS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("url_canon", T.StringType()),
        T.StructField("priority", T.IntegerType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("discovery_seq", T.LongType()),
    ]
)

POLITE_OUT_SCHEMA = T.StructType(
    POLITE_URLS_SCHEMA.fields
    + [
        T.StructField("decision", T.StringType()),
        T.StructField("serve_slot", T.LongType()),
    ]
)

_POLITE_STATE_SCHEMA = T.StructType([T.StructField("served", T.LongType())])


def streaming_politeness(urls: DataFrame, budget_per_batch: int = 2) -> DataFrame:
    """Per-host politeness budget as a custom stateful streaming
    operator — the continuous-crawl form of the batch round's salted
    two-phase window (T1, operators/politeness.py).

    Each micro-batch admits at most ``budget_per_batch`` URLs per host
    in frontier order (priority, depth, discovery_seq) and emits the
    overflow as ``decision='deferred'`` (a real frontier keeps deferred
    rows pending for the next wave). State per host is a single long —
    how many URLs the host has ever been served — so admitted rows
    carry a per-host ``serve_slot`` that is contiguous across
    micro-batches and deterministic under replay (no wall clock, no
    processing-time anywhere). The grouping key partitions hosts across
    executors exactly like the batch window's partitionBy(host)."""
    import pandas as pd  # local: executors import lazily
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        served = int(state.get[0]) if state.exists else 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        # mergesort = stable, so equal (priority, depth) ties stay in
        # discovery order exactly like the batch ORDER_COLS window
        rows = rows.sort_values(
            ["priority", "depth", "discovery_seq"], kind="mergesort"
        ).reset_index(drop=True)
        n_admit = min(budget_per_batch, len(rows))
        n_defer = len(rows) - n_admit
        state.update((served + n_admit,))
        yield rows.assign(
            decision=["admitted"] * n_admit + ["deferred"] * n_defer,
            serve_slot=pd.array(
                [served + i + 1 for i in range(n_admit)] + [-1] * n_defer,
                dtype="Int64",
            ),
        )

    return urls.groupBy("host").applyInPandasWithState(
        fn,
        outputStructType=POLITE_OUT_SCHEMA,
        stateStructType=_POLITE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_politeness_stream(
    spark: SparkSession, parquet_dir: str, budget_per_batch: int = 2,
    name: str = "polite_out",
):
    """Drive the streaming politeness gate over a parquet dir, one file
    per micro-batch, so the cross-batch serve_slot continuity is
    exercised."""
    src = (
        spark.readStream.schema(POLITE_URLS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(parquet_dir)
    )
    q = (
        streaming_politeness(src, budget_per_batch=budget_per_batch)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return name


def run_sessionize_stream(
    spark: SparkSession, parquet_dir: str, gap_seconds: int = 1800,
    name: str = "sessions_out",
):
    """Drive the stateful sessionizer over a parquet dir as a stream."""
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(parquet_dir)
    )
    q = (
        stateful_sessionize(src, gap_seconds=gap_seconds)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return name


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


def stream_stream_attribution(
    left: DataFrame,
    right: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream inner join with a time-bound: attribute each
    right-side event (purchase / fetch-result) to the same user's
    left-side event (click / scheduled URL) that preceded it within
    `horizon`. Both sides are watermarked and the join condition carries
    the event-time range — that pair is what lets the state store
    evict: a buffered left row can be dropped once the right watermark
    passes `l.ts + horizon`, so state is bounded by the horizon's
    working set, not the stream's history. Without the range condition
    Spark would (correctly) refuse unbounded-state append joins.

    Returns (user_id, left_ts, right_ts, left_value, right_value);
    with the default inner join the result equals the batch join of the
    same inputs — asserted in tests.

    ``how="left_outer"`` is the unattributed-work detector (clicks that
    never converted; scheduled URLs that never produced a result): an
    unmatched left row is held in state until the RIGHT watermark
    passes ``left_ts + horizon`` — only then can Spark prove no match
    can still arrive — and is then emitted once with NULL right
    columns. Emission is therefore watermark-driven (a later batch must
    advance the clock); state stays bounded exactly as in the inner
    form. The timing semantics are pinned in
    test_stream_stream_left_outer_emits_after_watermark.
    """
    l = left.withWatermark("ts", watermark).select(
        F.col("user_id"),
        F.col("ts").alias("left_ts"),
        F.col("value").alias("left_value"),
    )
    r = right.withWatermark("ts", watermark).select(
        F.col("user_id").alias("r_user_id"),
        F.col("ts").alias("right_ts"),
        F.col("value").alias("right_value"),
    )
    return l.join(
        r,
        F.expr(
            f"user_id = r_user_id AND right_ts >= left_ts "
            f"AND right_ts <= left_ts + INTERVAL {horizon}"
        ),
        how,
    ).select("user_id", "left_ts", "right_ts", "left_value", "right_value")


def run_attribution_stream(
    spark: SparkSession,
    parquet_dir: str,
    left_type: str = "click",
    right_type: str = "purchase",
    horizon: str = "30 minutes",
    name: str = "attribution_out",
    how: str = "inner",
):
    """Drive the stream-stream join: two readStreams over the same
    parquet dir, filtered to the two event types, one file per
    micro-batch so the join buffers state across batches."""

    def src():
        return (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(parquet_dir)
        )

    out = stream_stream_attribution(
        src().filter(F.col("event_type") == left_type),
        src().filter(F.col("event_type") == right_type),
        horizon=horizon,
        how=how,
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return name


URLS_SCHEMA = T.StructType(
    [
        T.StructField("url_canon", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("host", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def streaming_url_dedup(urls: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of the batch URL-seen gate (J1): first sighting of
    each url_hash within the watermark horizon passes, replays and
    cross-batch repeats are dropped by the state store. This is the
    continuous-ingestion form of the frontier's anti-join — state is
    bounded by the watermark (expired keys age out), so a 10^10-URL
    stream holds only the horizon's working set per partition, not the
    full history; the durable full-history filter stays the persisted
    bucketed bloom + exact anti-join of the batch rounds.
    """
    return urls.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["url_hash"]
    )


def run_url_dedup_stream(
    spark: SparkSession, parquet_dir: str, name: str = "url_dedup_out",
    watermark: str = "2 hours",
):
    """Drive the streaming URL dedup over a parquet dir, one file per
    micro-batch (so cross-batch duplicate suppression is exercised)."""
    src = (
        spark.readStream.schema(URLS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(parquet_dir)
    )
    q = (
        streaming_url_dedup(src, watermark=watermark)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return name


def streaming_robots_gate(
    urls: DataFrame, robots_dim: DataFrame
) -> DataFrame:
    """Stream-static enrichment: gate a continuous URL stream against
    the robots dimension (T5's streaming twin). Structured Streaming
    re-resolves the static side every micro-batch, so robots refreshes
    land without restarting the query; the dim is broadcast (hosts are
    ~10^7 rows — small next to the stream) and unknown hosts default to
    allowed with the default delay, exactly like the batch gate."""
    dim = robots_dim.select(
        "host",
        F.col("denied").alias("_denied"),
        F.col("crawl_delay_s").alias("_delay"),
    )
    return (
        urls.join(F.broadcast(dim), "host", "left")
        .filter(~F.coalesce(F.col("_denied"), F.lit(False)))
        .select(
            "url_canon",
            "url_hash",
            "host",
            "ts",
            F.coalesce(F.col("_delay"), F.lit(1.0)).alias("crawl_delay_s"),
        )
    )


def run_robots_gate_stream(
    spark: SparkSession, parquet_dir: str, robots_dim: DataFrame,
    name: str = "robots_gate_out",
):
    """Drive the stream-static robots gate over a parquet URL stream."""
    src = (
        spark.readStream.schema(URLS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(parquet_dir)
    )
    q = (
        streaming_robots_gate(src, robots_dim)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return name
