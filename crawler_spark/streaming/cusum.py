"""Streaming CUSUM changepoint alarms — the continuous twin of
operators/robust.cusum_alarms.

The batch form exploits the prefix-sum closed form; a continuous
monitor can't (the prefix grows forever), so this is the O(1)-state
recursion itself on ``applyInPandasWithState``: per host, state =
(s_pos, s_neg, high-water seq), each micro-batch's rows fold in event
order (late rows fold on arrival — contributed, never dropped),
and a threshold crossing EMITS one alarm row and resets the statistic
(the operational form: after paging the operator the detector re-arms;
the batch query instead reports the statistic everywhere). State never
times out — it is three scalars per host, the cheapest possible
stateful operator, exactly the politeness-gate/back-queue shape.

Determinism: arithmetic is the same floor(x*1e9+0.5)/1e9-pinned update
as the batch operator, transitions are driven by the event sequence
(never wall clock), and rows sort by ``seq`` within each batch — so a
replay from checkpoint reproduces the identical alarm set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from crawler_spark.functions.num import pin9f as _p9

METRIC_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("x", T.DoubleType()),
    ]
)

ALARM_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("side", T.StringType()),
        T.StructField("stat", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("s_pos", T.DoubleType()),
        T.StructField("s_neg", T.DoubleType()),
        T.StructField("last_seq", T.LongType()),
    ]
)


def streaming_cusum(
    metrics: DataFrame,
    target: float,
    slack: float = 0.5,
    h: float = 5.0,
) -> DataFrame:
    """Two-sided CUSUM over a metric stream: emits one row per
    threshold crossing (side 'up'/'down', the crossing statistic),
    then re-arms. Input columns: (host, seq, x)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        (host,) = key
        sp, sn, last = (state.get if state.exists else (0.0, 0.0, -1))
        out = []
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("seq")
        # no dedup guard needed: state-store commits are transactional
        # with the micro-batch, so a failure replay re-runs the WHOLE
        # batch against the pre-batch state (each row folds exactly
        # once). Rows arriving in a later batch with smaller seq are
        # LATE DATA — they still fold (in their batch's seq order)
        # rather than being silently dropped.
        for seq, x in zip(rows["seq"], rows["x"]):
            seq, x = int(seq), float(x)
            last = max(last, seq)
            sp = max(0.0, sp + _p9(x - target - slack))
            sn = max(0.0, sn - _p9(x - target + slack))
            if sp > h:
                out.append((host, seq, x, "up", sp))
                sp = 0.0
            if sn > h:
                out.append((host, seq, x, "down", sn))
                sn = 0.0
        state.update((float(sp), float(sn), int(last)))
        if out:
            yield pd.DataFrame(
                out, columns=["host", "seq", "x", "side", "stat"]
            )

    return metrics.groupBy("host").applyInPandasWithState(
        fn,
        outputStructType=ALARM_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_cusum_stream(
    spark: SparkSession,
    parquet_dir: str,
    target: float,
    slack: float = 0.5,
    h: float = 5.0,
    name: str = "cusum_out",
):
    """Drive the streaming CUSUM over a parquet dir, one file per
    micro-batch, so cross-batch state carry is exercised."""
    src = (
        spark.readStream.schema(METRIC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(parquet_dir)
    )
    q = (
        streaming_cusum(src, target=target, slack=slack, h=h)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return name
