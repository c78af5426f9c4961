"""Token-bucket rate limiting as a custom stateful streaming operator.

The politeness family in this repo shapes WHICH urls are served per
round (budget windows, WFQ, stride); a fetcher fleet also needs the
classic traffic-shaping primitive: each host owns a bucket of
``capacity`` tokens refilled at ``refill_per_sec``; a fetch spends
``cost`` tokens or is throttled with an exact retry-after. This is the
burst-tolerant limiter (a quiet host saves up capacity for a burst)
that a fixed per-round budget cannot express.

Determinism contract (same as streaming/events.streaming_politeness):
the bucket is driven by EVENT TIME only — no wall clock, no
processing time — so replays and batch-boundary changes produce
bit-identical decisions; arithmetic is integer millitokens, so refill
is exact (no float drift across state round trips). State per host is
two longs. Grouping by host partitions the state across executors
exactly like the batch politeness window's partitionBy(host).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

RL_IN_SCHEMA = "host string, url string, ts long, cost int"
RL_OUT_SCHEMA = (
    "host string, url string, ts long, cost int, "
    "decision string, tokens_after_milli long, retry_after_ms long"
)
_RL_STATE_SCHEMA = "tokens_milli long, last_ts long"


def token_bucket_decisions(
    rows,  # iterable of (url, ts, cost) sorted by caller
    capacity_milli: int,
    refill_milli_per_sec: int,
    tokens_milli: int,
    last_ts: int,
):
    """Pure sequential fold (shared by the operator and tests): returns
    (decisions, tokens_milli, last_ts). Each decision is (url, ts,
    cost, decision, tokens_after_milli, retry_after_ms)."""
    out = []
    for url, ts, cost in rows:
        if ts > last_ts:
            tokens_milli = min(
                capacity_milli,
                tokens_milli + (ts - last_ts) * refill_milli_per_sec,
            )
            last_ts = ts
        need = cost * 1000
        if tokens_milli >= need:
            tokens_milli -= need
            out.append((url, ts, cost, "admitted", tokens_milli, 0))
        else:
            deficit = need - tokens_milli
            # ceil-divide: milliseconds until the bucket covers the cost
            retry_ms = (
                deficit * 1000 + refill_milli_per_sec - 1
            ) // refill_milli_per_sec
            out.append((url, ts, cost, "throttled", tokens_milli, retry_ms))
    return out, tokens_milli, last_ts


def streaming_token_bucket(
    fetches: DataFrame,
    capacity: int = 4,
    refill_per_sec: float = 1.0,
) -> DataFrame:
    """Per-host token bucket over a stream of (host, url, ts, cost).

    Buckets start FULL (a new host can burst to ``capacity``
    immediately — the standard warm-start, and the deterministic
    choice: an empty start would make the first batch's decisions
    depend on how long the bucket had notionally existed). Rows inside
    a micro-batch are folded in (ts, url) order — event order, with a
    total tie-break — so output is independent of arrival order within
    the batch.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    cap_m = int(capacity) * 1000
    refill_m = int(round(float(refill_per_sec) * 1000))
    if refill_m <= 0:
        raise ValueError("refill_per_sec must round to >= 1 millitoken/s")

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            tokens_m, last_ts = int(state.get[0]), int(state.get[1])
        else:
            tokens_m, last_ts = cap_m, -(1 << 62)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "url"], kind="mergesort").reset_index(
            drop=True
        )
        decisions, tokens_m, last_ts = token_bucket_decisions(
            zip(rows["url"], rows["ts"].astype(int), rows["cost"].astype(int)),
            cap_m,
            refill_m,
            tokens_m,
            last_ts,
        )
        state.update((tokens_m, last_ts))
        yield pd.DataFrame(
            {
                "host": [key[0]] * len(decisions),
                "url": [d[0] for d in decisions],
                "ts": pd.array([d[1] for d in decisions], dtype="int64"),
                "cost": pd.array([d[2] for d in decisions], dtype="int32"),
                "decision": [d[3] for d in decisions],
                "tokens_after_milli": pd.array(
                    [d[4] for d in decisions], dtype="int64"
                ),
                "retry_after_ms": pd.array(
                    [d[5] for d in decisions], dtype="int64"
                ),
            }
        )

    return fetches.groupBy("host").applyInPandasWithState(
        fn,
        outputStructType=RL_OUT_SCHEMA,
        stateStructType=_RL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_token_bucket_stream(
    spark: SparkSession,
    parquet_dir: str,
    capacity: int = 4,
    refill_per_sec: float = 1.0,
    name: str = "bucket_out",
):
    """Drive the limiter over a parquet dir, one file per micro-batch,
    so cross-batch bucket carry (drain in batch 1, refill by batch 2's
    event times) is exercised."""
    src = (
        spark.readStream.schema(RL_IN_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(parquet_dir)
    )
    q = (
        streaming_token_bucket(
            src, capacity=capacity, refill_per_sec=refill_per_sec
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return name
