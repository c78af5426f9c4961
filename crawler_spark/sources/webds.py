"""Custom Python DataSource (Spark 4 API): the deterministic synth web
as a first-class `spark.read.format("synthweb")` relation — batch with
partition-pruning filter pushdown, plus a streaming reader that emits
the crawl frontier one BFS LEVEL per micro-batch.

Why this exists: the engine's other sources are files the driver
already wrote; a real deployment's crawl seeds/page feeds arrive from
an external system. Spark 4's Python DataSource API is the idiomatic
seam for that — the source declares partitions (one per host: the
web's natural parallelism unit), executors walk their host's page tree
independently, and `pushFilters` lets Catalyst push `host = 'x'` /
`host IN (...)` / `depth <= k` predicates INTO the source so pruned
hosts are never walked at all (observable in the plan as fewer input
partitions, and in the partition count test).

The streaming half models continuous discovery: offset = BFS level;
each micro-batch is the next frontier wave (exactly the unit the round
driver consumes), partitioned per host like the batch side. Offsets
are deterministic, so checkpoint replay regenerates identical batches.

Rows: (url string, host string, depth int, parent string,
is_leaf boolean) — canonical URLs (functions/canon.normalize_url, the
same pure function the sequential oracle trusts).

Register per session:  spark.dataSource.register(SynthWebDataSource)
then  spark.read.format("synthweb").option("n_hosts", 5).load().
"""

from __future__ import annotations

import sys
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    EqualTo,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

# Python-DataSource worker processes import this module from the
# cloudpickled reader object; ship it by value so registration works
# from any cwd (same seam as streaming/tws.py).
try:  # pragma: no cover
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # noqa: BLE001
    pass

SCHEMA = "url string, host string, depth int, parent string, is_leaf boolean"


def _web(options):
    from crawler_spark.sources.synth import SynthWeb

    return SynthWeb(
        n_hosts=int(options.get("n_hosts", 3)),
        deep_levels=int(options.get("deep_levels", 0)),
    )


def _walk_host(web, i: int, max_depth: int | None):
    """Deterministic BFS of host i's page tree: yields
    (url, host, depth, parent, is_leaf) in level order, first-discovery
    dedup on the canonical form — one host is one partition's work."""
    from crawler_spark.functions.canon import normalize_url

    host = web.host(i)
    root = normalize_url(web.root(i))
    seen = {root}
    level = [(root, None)]
    depth = 0
    while level:
        nxt = []
        for url, parent in level:
            leaf = web.is_leaf(url)
            yield (url, host, depth, parent, leaf)
            if leaf or (max_depth is not None and depth >= max_depth):
                continue
            for raw in web.outlinks_raw(url):
                c = normalize_url(raw)
                if c not in seen:
                    seen.add(c)
                    nxt.append((c, url))
        level = nxt
        depth += 1


class HostPartition(InputPartition):
    def __init__(self, host_idx: int):
        self.host_idx = host_idx


class SynthWebReader(DataSourceReader):
    def __init__(self, options):
        self.options = options
        self.n_hosts = int(options.get("n_hosts", 3))
        self.host_allow: set[str] | None = None  # None = all
        self.max_depth: int | None = (
            int(options["max_depth"]) if "max_depth" in options else None
        )

    def pushFilters(self, filters):
        """Accept host equality/IN (partition pruning — pruned hosts are
        never walked) and depth upper bounds (the walk stops early);
        everything else is returned for Spark to evaluate."""
        for f in filters:
            cols = getattr(f, "attribute", ())
            if isinstance(f, EqualTo) and tuple(cols) == ("host",):
                allow = {f.value}
                self.host_allow = (
                    allow if self.host_allow is None
                    else self.host_allow & allow
                )
            elif isinstance(f, In) and tuple(cols) == ("host",):
                allow = set(f.value)
                self.host_allow = (
                    allow if self.host_allow is None
                    else self.host_allow & allow
                )
            elif isinstance(f, LessThanOrEqual) and tuple(cols) == ("depth",):
                d = int(f.value)
                self.max_depth = d if self.max_depth is None else min(
                    self.max_depth, d
                )
            elif isinstance(f, LessThan) and tuple(cols) == ("depth",):
                d = int(f.value) - 1
                self.max_depth = d if self.max_depth is None else min(
                    self.max_depth, d
                )
            else:
                yield f  # unsupported -> Spark evaluates it post-scan

    def partitions(self):
        from crawler_spark.sources.synth import SynthWeb

        web = SynthWeb(n_hosts=self.n_hosts)
        return [
            HostPartition(i)
            for i in range(self.n_hosts)
            if self.host_allow is None or web.host(i) in self.host_allow
        ]

    def read(self, partition: HostPartition) -> Iterator[tuple]:
        web = _web(self.options)
        yield from _walk_host(web, partition.host_idx, self.max_depth)


class SynthWebStreamReader(DataSourceStreamReader):
    """Frontier-wave stream: offset = BFS level; batch (a, b] = levels
    a+1..b of every host's walk. Deterministic per offset range, so a
    checkpoint replay regenerates byte-identical batches."""

    def __init__(self, options):
        self.options = options
        self.n_hosts = int(options.get("n_hosts", 3))
        self.final_level = int(options.get("max_depth", 3))
        self._cur = -1

    def initialOffset(self):
        return {"level": -1}

    def latestOffset(self):
        # advance ONE level per poll: each micro-batch is exactly one
        # frontier wave (the unit the round driver consumes), not the
        # whole remaining walk in a single batch
        self._cur = min(self._cur + 1, self.final_level)
        return {"level": self._cur}

    def partitions(self, start, end):
        return [
            _LevelPartition(i, start["level"] + 1, end["level"])
            for i in range(self.n_hosts)
        ]

    def read(self, partition) -> Iterator[tuple]:
        web = _web(self.options)
        for row in _walk_host(web, partition.host_idx, partition.hi):
            if partition.lo <= row[2] <= partition.hi:
                yield row

    def commit(self, end):
        pass

    def stop(self):
        pass


class _LevelPartition(InputPartition):
    def __init__(self, host_idx: int, lo: int, hi: int):
        self.host_idx = host_idx
        self.lo = lo
        self.hi = hi


class SynthWebDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthweb"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return SynthWebReader(self.options)

    def streamReader(self, schema):
        return SynthWebStreamReader(self.options)


# ------------------------------------------------------------- WARC sink

class _WarcCommit(WriterCommitMessage):
    def __init__(self, path: str, n_records: int):
        self.path = path
        self.n_records = n_records


class WarcSinkWriter(DataSourceWriter):
    """Per-task writer: serializes its partition's (uri, status, body)
    rows as one concatenated WARC blob under a temp name; the driver's
    commit() publishes all task files atomically via a manifest (the
    two-phase protocol every exactly-once sink uses — a failed/
    speculative task's file is simply never listed)."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, rows):
        import os
        import uuid

        recs = []
        for r in rows:
            recs.append(
                f"WARC/1.0\nWARC-Target-URI: {r.uri}\n"
                f"HTTP-Status: {r.status}\n\n{r.body}\n"
            )
        os.makedirs(os.path.join(self.path, "_temporary"), exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.warc"
        tmp = os.path.join(self.path, "_temporary", name)
        with open(tmp, "w") as f:
            f.write("".join(recs))
        return _WarcCommit(name, len(recs))

    def commit(self, messages):
        import json
        import os

        names = []
        total = 0
        for m in messages:
            if m is None:
                continue
            src = os.path.join(self.path, "_temporary", m.path)
            dst = os.path.join(self.path, m.path)
            os.replace(src, dst)
            names.append(m.path)
            total += m.n_records
        man = os.path.join(self.path, "_MANIFEST.json")
        with open(man + ".tmp", "w") as f:
            json.dump({"files": sorted(names), "n_records": total}, f)
        os.replace(man + ".tmp", man)

    def abort(self, messages):
        import os
        import shutil

        shutil.rmtree(
            os.path.join(self.path, "_temporary"), ignore_errors=True
        )


class WarcSinkDataSource(DataSource):
    """`df.write.format("warcsink").option("path", d).save()` — crawl
    results out as WARC blobs with an atomic manifest; readable back
    via sources/warc.parse_records for the round trip."""

    @classmethod
    def name(cls):
        return "warcsink"

    def schema(self):
        return "uri string, status int, body string"

    def writer(self, schema, overwrite):
        return WarcSinkWriter(self.options)
