"""Continuous frontier scheduling with an in-state per-host back-queue.

The plain politeness gate (streaming/events.py `streaming_politeness`)
carries ONE value per host — the lifetime served count — and EMITS
over-budget URLs as 'deferred' for some external frontier to re-queue.
Here the overflow stays INSIDE the operator: deferred URLs are stored
in per-host state and re-compete (by frontier order) against every
later batch's arrivals — the actual Mercator back-queue discipline. A
host's queue persists across waves, admission is always from the
merged queue, and nothing is dropped.

Two implementations over one shared admission core:

* ``backqueue_scheduler`` — applyInPandasWithState; the back-queue
  rides as parallel arrays inside the state struct. Runs everywhere
  (no extra deps), used by the tests as the semantics anchor.
* ``tws_frontier_scheduler`` — Spark 4's transformWithStateInPandas
  (StatefulProcessor with a typed ValueState + ListState). The new
  API's win is operational, not semantic: the list state is updated
  per element in RocksDB instead of rewriting one monolithic struct
  per key per batch, and state variables can evolve independently
  (add a TTL, add a MapState) without a state-schema migration.
  REQUIRES protobuf (the transformWithState driver worker speaks a
  proto protocol to the JVM); this container does not ship it, so the
  class is import-gated and its e2e test skips when the dependency is
  absent — the admission core it delegates to is the same one the
  always-on implementation proves.

Determinism: no wall clock and no processing-time anywhere; mergesort
keeps equal (priority, depth, discovery_seq) keys in insertion order
exactly like the batch window's ORDER_COLS, so checkpoint replay and
the pure-Python mirror in the tests agree bit-for-bit.

Scale shape: state is per-host and the stream hash-partitions by host
exactly like the batch round's partitionBy(host) window; the back-queue
is bounded by the host's own pending set (the bound the batch frontier
already carries), and Arrow moves each group's rows in one batch.
"""

from __future__ import annotations

import sys

import pandas as pd
from pyspark.sql import DataFrame

TWS_URLS_SCHEMA = (
    "host string, url string, priority long, depth long, discovery_seq long"
)
TWS_OUT_SCHEMA = (
    "host string, url string, priority long, depth long, discovery_seq long, "
    "serve_slot long, requeued boolean"
)
_QUEUE_SCHEMA = (
    "url string, priority long, depth long, discovery_seq long, requeued boolean"
)
_ORDER = ["priority", "depth", "discovery_seq"]
_QCOLS = ["url", "priority", "depth", "discovery_seq", "requeued"]
_OUT_COLS = [
    "host", "url", "priority", "depth", "discovery_seq", "serve_slot",
    "requeued",
]


def _admit(
    backlog: pd.DataFrame,
    fresh: pd.DataFrame,
    served: int,
    budget: int,
    quota: int | None,
) -> tuple[pd.DataFrame, pd.DataFrame, int]:
    """Shared admission core: merge the back-queue with this batch's
    arrivals in frontier order, admit up to `budget` (clamped by the
    remaining lifetime `quota`), requeue the rest. Returns
    (admitted, new_backlog, n_admitted); both frames carry _QCOLS.

    Null-url rows are TICKS: a grouped stateful operator only runs for
    keys present in the micro-batch, so a host with a parked back-queue
    but no new arrivals would never drain. A tick row (host, NULL url)
    triggers the host's admission pass and contributes nothing — the
    deterministic batch analog of a processing-time timer (which the
    transformWithState API offers natively, at the cost of wall-clock
    nondeterminism under replay)."""
    fresh = fresh[fresh["url"].notna()]
    merged = (
        pd.concat([backlog, fresh], ignore_index=True)
        .sort_values(_ORDER, kind="mergesort")
        .reset_index(drop=True)
    )
    n = min(budget, len(merged))
    if quota is not None:
        n = min(n, max(0, quota - served))
    rest = merged.iloc[n:].assign(requeued=True)
    return merged.iloc[:n], rest, n


def _emit(admitted: pd.DataFrame, host: str, served: int) -> pd.DataFrame:
    out = admitted.assign(
        host=host,
        serve_slot=pd.array(
            range(served + 1, served + len(admitted) + 1), dtype="Int64"
        ),
    )
    return out[_OUT_COLS]


# ------------------------------------------------ applyInPandasWithState

_BQ_STATE_SCHEMA = (
    "served long, q_url array<string>, q_priority array<long>, "
    "q_depth array<long>, q_seq array<long>, q_requeued array<boolean>"
)


def backqueue_scheduler(
    urls: DataFrame, budget_per_batch: int = 2, max_per_host: int | None = None
) -> DataFrame:
    """Back-queue politeness scheduler on applyInPandasWithState: the
    per-host pending queue lives in the state struct as parallel
    arrays. Admitted rows only; `requeued` marks rows that waited at
    least one batch; `serve_slot` is contiguous per host."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    budget, quota = int(budget_per_batch), max_per_host

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            served, q_url, q_pr, q_dp, q_seq, q_rq = state.get
            backlog = pd.DataFrame(
                {
                    "url": list(q_url), "priority": list(q_pr),
                    "depth": list(q_dp), "discovery_seq": list(q_seq),
                    "requeued": list(q_rq),
                }
            )
            served = int(served)
        else:
            served, backlog = 0, pd.DataFrame(columns=_QCOLS)
        fresh = pd.concat(list(pdfs), ignore_index=True)[
            ["url", "priority", "depth", "discovery_seq"]
        ].assign(requeued=False)
        admitted, rest, n = _admit(backlog, fresh, served, budget, quota)
        state.update(
            (
                served + n,
                rest["url"].tolist(),
                [int(x) for x in rest["priority"]],
                [int(x) for x in rest["depth"]],
                [int(x) for x in rest["discovery_seq"]],
                [bool(x) for x in rest["requeued"]],
            )
        )
        yield _emit(admitted, key[0], served)

    return urls.groupBy("host").applyInPandasWithState(
        fn,
        outputStructType=TWS_OUT_SCHEMA,
        stateStructType=_BQ_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------- transformWithStateInPandas

def have_tws_deps() -> bool:
    """transformWithState's python<->JVM state protocol is protobuf."""
    try:  # pragma: no cover - env probe
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


try:
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    # The transformWithState driver worker is a FRESH python process
    # launched by the JVM; unlike executor UDF workers it does not
    # inherit the driver's cwd on sys.path, so a StatefulProcessor
    # pickled by reference hits ModuleNotFoundError there. Ship the
    # class by value instead (the property a spark-submit --py-files
    # deploy gives a packaged job).
    try:  # pragma: no cover - depends on cloudpickle internals
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:  # noqa: BLE001
        pass

    class FrontierScheduler(StatefulProcessor):
        """Per-host budgeted admission with the back-queue in a typed
        ListState (element-wise RocksDB updates) and the served count
        in a ValueState — same contract as backqueue_scheduler."""

        def __init__(
            self, budget_per_batch: int = 2, max_per_host: int | None = None
        ):
            self.budget = int(budget_per_batch)
            self.quota = max_per_host

        def init(self, handle: StatefulProcessorHandle) -> None:
            self.served = handle.getValueState("served", "served long")
            self.deferred = handle.getListState("deferred", _QUEUE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            fresh = pd.concat(list(rows), ignore_index=True)[
                ["url", "priority", "depth", "discovery_seq"]
            ].assign(requeued=False)
            backlog = (
                pd.DataFrame(list(self.deferred.get()), columns=_QCOLS)
                if self.deferred.exists()
                else pd.DataFrame(columns=_QCOLS)
            )
            served = int(self.served.get()[0]) if self.served.exists() else 0
            admitted, rest, n = _admit(
                backlog, fresh, served, self.budget, self.quota
            )
            self.served.update((served + n,))
            self.deferred.clear()
            if len(rest):
                self.deferred.put(
                    [
                        (str(u), int(p), int(d), int(s), bool(r))
                        for u, p, d, s, r in rest[_QCOLS].itertuples(index=False)
                    ]
                )
            yield _emit(admitted, key[0], served)

        def close(self) -> None:
            pass

    def tws_frontier_scheduler(
        urls: DataFrame,
        budget_per_batch: int = 2,
        max_per_host: int | None = None,
    ) -> DataFrame:
        return urls.groupBy("host").transformWithStateInPandas(
            statefulProcessor=FrontierScheduler(budget_per_batch, max_per_host),
            outputStructType=TWS_OUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )

except ImportError:  # pragma: no cover - pre-4.0 pyspark
    FrontierScheduler = None  # type: ignore[assignment]
    tws_frontier_scheduler = None  # type: ignore[assignment]


def run_backqueue_stream(
    spark,
    parquet_dir: str,
    budget_per_batch: int = 2,
    max_per_host: int | None = None,
    name: str = "bq_out",
    impl: str = "apply",
) -> str:
    """Drive a back-queue scheduler over a parquet dir, one file per
    micro-batch, into a memory sink. impl='tws' selects the
    transformWithStateInPandas form (requires protobuf + RocksDB
    state store)."""
    src = (
        spark.readStream.schema(TWS_URLS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(parquet_dir)
    )
    op = backqueue_scheduler if impl == "apply" else tws_frontier_scheduler
    q = (
        op(src, budget_per_batch, max_per_host)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return name
