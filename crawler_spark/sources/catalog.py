"""Iceberg-style snapshot catalog over parquet (no Iceberg jars in this
environment; the API mirrors what ``df.writeTo(tbl).append()`` would do on
a real cluster, so the engine swaps to real Iceberg by replacing this
module only).

Layout under ``root/``::

    <table>/data/<snap>-<name>-<uuid>/part-*.parquet   (immutable files)
    snapshots/<id>.json     one manifest per snapshot:
                            {"id": n, "parent": n-1, "tables": {t: [dirs]}}
    _current                atomic pointer to the latest committed id

Semantics the crawl rounds need (SURVEY.md §2.8 T2/T3):

* **atomic multi-table commit** — a round stages writes for frontier /
  seen / results / failures / metrics, then commits ONE snapshot. A crash
  mid-round leaves staged files unreferenced -> invisible -> re-running
  the round is idempotent (the reference's recovery re-runs the whole
  callable, base_crawler.py:232-284).
* **time travel / resume** — ``read(table, snapshot=k)`` reconstructs any
  committed state; resume = read latest.
* **lineage** — each staged write records the round + table in the dir
  name; per-partition metrics live in the metrics table itself.

Reference parity: save_crawling_state (base_crawler.py:151-160) ->
snapshot pointer; create_backup/cleanup_old_files (csv_handler.py:186-250)
-> snapshots are free, expiry = dropping old manifests.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# File-level column bounds are only kept for cheap, order-comparable
# types; strings longer than this are skipped (Iceberg instead truncates
# with an upper-bound adjustment — same effect: bounded manifest size).
_STATS_MAX_STR = 64


def _file_column_bounds(path: str) -> dict[str, list]:
    """Per-file (min, max) for every top-level int/float/string column,
    read from the parquet FOOTER only (row-group statistics written by
    the writer) — no data pages are touched, so cost is O(KB) per file.

    On a real cluster these bounds come back from the writer tasks /
    Iceberg manifest entries; reading footers driver-side is the
    sandbox analog with identical semantics. Columns with missing or
    unusable stats are simply absent (= never pruned on)."""
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(path).metadata
    bounds: dict[str, list] = {}
    bad: set[str] = set()  # any row group lacking stats poisons the column
    for rg in range(meta.num_row_groups):
        g = meta.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if "." in name or name in bad:  # nested leaves: top-level only
                continue
            st = col.statistics
            lo = hi = None
            if st is not None and st.has_min_max:
                lo, hi = st.min, st.max
                if isinstance(lo, bytes):
                    try:
                        lo, hi = lo.decode("utf-8"), hi.decode("utf-8")
                    except UnicodeDecodeError:
                        lo = None
                if (
                    not isinstance(lo, (int, float, str))
                    or isinstance(lo, bool)
                    or (isinstance(lo, float) and (lo != lo or hi != hi))
                    or (
                        isinstance(lo, str)
                        and (len(lo) > _STATS_MAX_STR or len(hi) > _STATS_MAX_STR)
                    )
                ):
                    lo = None
            if lo is None:
                bad.add(name)
                bounds.pop(name, None)
                continue
            if name in bounds:
                b = bounds[name]
                b[0], b[1] = min(b[0], lo), max(b[1], hi)
            else:
                bounds[name] = [lo, hi]
    return bounds


class SnapshotCatalog:
    def __init__(self, root: str, spark: SparkSession):
        self.root = root
        self.spark = spark
        os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)
        self._staged: dict[str, list[str]] = {}
        self._staged_stats: dict[str, dict] = {}  # dir -> {file: {col: [lo, hi]}}
        self._staged_schemas: dict[str, str] = {}  # dir -> StructType json
        self._staged_deletes: dict[str, list[str]] = {}
        # stage_* may be called from concurrent driver threads (the round
        # driver overlaps its independent table writes to backfill idle
        # cores between job tails)
        self._lock = threading.Lock()

    # ---- snapshot bookkeeping ---------------------------------------
    def current_id(self) -> int:
        p = os.path.join(self.root, "_current")
        if not os.path.exists(p):
            return -1
        with open(p) as f:
            return int(f.read().strip())

    def _manifest(self, sid: int) -> dict:
        with open(os.path.join(self.root, "snapshots", f"{sid}.json")) as f:
            return json.load(f)

    def tables(self, snapshot: int | None = None) -> dict[str, list[str]]:
        sid = self.current_id() if snapshot is None else snapshot
        if sid < 0:
            return {}
        return self._manifest(sid)["tables"]

    def deletes(self, snapshot: int | None = None) -> dict[str, list[str]]:
        """Equality-delete file dirs per table (Iceberg v2 merge-on-read
        analog) — empty for snapshots written before deletes existed."""
        sid = self.current_id() if snapshot is None else snapshot
        if sid < 0:
            return {}
        return self._manifest(sid).get("deletes", {})

    @staticmethod
    def _dir_seq(d: str) -> int:
        """Data sequence number of a staged dir — the snapshot id encoded
        in its name (``s<id>-<uuid>``). Equality deletes apply to data
        dirs with STRICTLY SMALLER sequence (Iceberg's rule: a delete
        never hits rows committed at or after it)."""
        return int(os.path.basename(d).split("-", 1)[0][1:])

    @classmethod
    def _delete_groups(
        cls, data_dirs: list[str], delete_dirs: list[str]
    ) -> dict[tuple, list[str]]:
        """Group data dirs by their applicable-delete set under the
        sequence rule (a delete dir applies only to data dirs with
        strictly smaller sequence) — at most |delete seqs|+1 groups.
        Shared by ``read()`` and ``read_with_positions()`` so the two
        views can never disagree on scoping."""
        groups: dict[tuple, list[str]] = {}
        for dd in data_dirs:
            s = cls._dir_seq(dd)
            appl = tuple(d for d in delete_dirs if cls._dir_seq(d) > s)
            groups.setdefault(appl, []).append(dd)
        return groups

    def meta(self, snapshot: int | None = None) -> dict:
        """Small scalar state carried with each snapshot (e.g. the global
        discovery-sequence counter) — the Iceberg snapshot-summary analog.
        Avoids recomputing aggregates over 10^10-row tables per round."""
        sid = self.current_id() if snapshot is None else snapshot
        if sid < 0:
            return {}
        return self._manifest(sid).get("meta", {})

    # ---- staged writes ------------------------------------------------
    def stage_append(self, table: str, df: DataFrame) -> None:
        """Write df to immutable files, visible only after commit().

        Per-file column (min, max) bounds are collected from the written
        parquet footers and staged into the manifest — the Iceberg
        data-file stats analog that lets ``read(..., where=...)`` prune
        files without opening them (the feature that turns a 10^10-row
        "read rounds 98-99 of the metrics table" into a 2-file scan)."""
        d = os.path.join(
            self.root, table, "data", f"s{self.current_id() + 1}-{uuid.uuid4().hex[:8]}"
        )
        df.write.mode("overwrite").parquet(d)
        stats = {}
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                b = _file_column_bounds(os.path.join(d, f))
                if b:
                    stats[f] = b
        with self._lock:
            self._staged.setdefault(table, []).append(d)
            if stats:
                self._staged_stats[d] = stats
            # schema recorded in the manifest (Iceberg resolves schema
            # from metadata, never from data-file footers): read() can
            # then open ZERO footers — at 10^10 scale a table holds
            # thousands of files and the footer-union job per read is
            # pure constant overhead
            self._staged_schemas[d] = df.schema.json()

    def stage_overwrite(self, table: str, df: DataFrame) -> None:
        """Replace the table's file set at the next commit."""
        self.stage_append(table, df)
        with self._lock:
            self._staged[table].insert(0, "__OVERWRITE__")

    def stage_delete(self, table: str, keys_df: DataFrame) -> None:
        """Merge-on-read equality delete (Iceberg v2 delete-file analog):
        stage a key set whose matching rows disappear from reads at the
        next commit — WITHOUT rewriting a single data file. ``keys_df``'s
        columns name the equality columns; a data row is deleted when it
        matches some key row on ALL of them. At 10^10 rows this is the
        only sane delete: the write is O(|keys|), the read pays one
        anti-join until ``compact()`` materializes the delete and drops
        the delete files. Sequence semantics match Iceberg: the delete
        applies only to data dirs committed STRICTLY BEFORE it, so
        re-appending a deleted key later resurrects it (proven in
        test_catalog_deletes)."""
        d = os.path.join(
            self.root,
            table,
            "deletes",
            f"s{self.current_id() + 1}-{uuid.uuid4().hex[:8]}",
        )
        keys_df.write.mode("overwrite").parquet(d)
        with self._lock:
            self._staged_deletes.setdefault(table, []).append(d)
            self._staged_schemas[d] = keys_df.schema.json()

    def read_with_positions(
        self, table: str, snapshot: int | None = None
    ) -> DataFrame:
        """``read()`` plus the (_file, _pos) VIRTUAL columns (Spark's
        ``_metadata.file_path`` / ``row_index``) — the handles a caller
        filters and passes to `stage_position_delete`. Positions are
        only meaningful against the exact files of this snapshot; a
        compaction invalidates them (exactly Iceberg's contract)."""
        from functools import reduce

        from pyspark.sql import functions as F

        dirs = self.tables(snapshot).get(table, [])
        if not dirs:
            raise KeyError(f"unknown table {table!r}")

        def withpos(dd: list[str]) -> DataFrame:
            base = self._read_dirs(dd, snapshot)
            return base.withColumn(
                "_file", F.col("_metadata.file_path")
            ).withColumn("_pos", F.col("_metadata.row_index"))

        dels = self.deletes(snapshot).get(table, [])
        if not dels:
            return withpos(dirs)
        # sequence scoping MUST match read(): a delete applies only to
        # data dirs committed strictly before it. Applying all deletes
        # unscoped here would hide rows re-appended after a delete —
        # and a position-delete selection taken from this view would
        # then silently miss them (bug found by the delete-interleaving
        # fuzz test, round-4).
        parts = [
            self._apply_eq_deletes(withpos(dd), list(appl), snapshot)
            for appl, dd in self._delete_groups(dirs, dels).items()
        ]
        return reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), parts
        )

    def stage_position_delete(self, table: str, pos_df: DataFrame) -> None:
        """Merge-on-read POSITION delete (Iceberg v2's second delete
        form): delete specific physical rows by (file, row index) —
        what a takedown needs when the key columns alone over-match
        (delete THIS corrupted copy, keep the re-fetched one), and
        what engines emit for MERGE/UPDATE row replacement. Stored as
        a delete file whose columns are exactly (_file, _pos); the
        reader recognizes that column set and anti-joins against the
        scan's metadata columns. Same sequence scoping and
        compact()-clears-deletes lifecycle as equality deletes."""
        cols = set(pos_df.columns)
        if cols != {"_file", "_pos"}:
            raise ValueError(
                f"position delete needs exactly (_file, _pos), got {cols}"
            )
        self.stage_delete(table, pos_df)

    def commit(self, meta: dict | None = None, publish: bool = True) -> int:
        """Atomically publish all staged writes as one snapshot.

        ``meta`` entries are merged over the parent snapshot's meta.

        ``publish=False`` is WRITE-AUDIT-PUBLISH (Iceberg's WAP
        pattern): the snapshot manifest is written durably but the
        current pointer does NOT move — production readers keep the old
        state while auditors ``read(..., snapshot=sid)`` the staged
        round; ``publish_snapshot(sid)`` later flips the pointer
        atomically (or the snapshot is simply never published — an
        audit failure costs nothing). The unpublished snapshot is
        auto-tagged ``wap-<sid>`` so expire_snapshots cannot GC it
        while the audit runs; publish drops the tag."""
        # id allocation must skip over UNPUBLISHED manifests (the
        # pointer doesn't advance for them), or the next commit would
        # overwrite an in-audit snapshot file
        snaps = os.path.join(self.root, "snapshots")
        existing = [
            int(f[:-5]) for f in os.listdir(snaps) if f.endswith(".json")
        ]
        sid = max([self.current_id()] + existing) + 1
        tables = {k: list(v) for k, v in self.tables().items()}
        deletes = {k: list(v) for k, v in self.deletes().items()}
        for t, dirs in self._staged.items():
            if dirs and dirs[0] == "__OVERWRITE__":
                tables[t] = dirs[1:]
                # an overwrite replaces content wholesale: carried and
                # same-commit staged deletes for it are void
                deletes.pop(t, None)
                self._staged_deletes.pop(t, None)
            else:
                tables.setdefault(t, []).extend(dirs)
        for t, dd in self._staged_deletes.items():
            deletes.setdefault(t, []).extend(dd)
        deletes = {t: v for t, v in deletes.items() if v}
        # carry file stats for every dir still referenced; staged dirs add
        # theirs, dirs dropped by overwrite/expiry fall out of the map
        prev_stats = {}
        prev_schemas = {}
        if self.current_id() >= 0:
            head = self._manifest(self.current_id())
            prev_stats = head.get("stats", {})
            prev_schemas = head.get("schemas", {})
        live = {d for dirs in tables.values() for d in dirs}
        live_del = {d for dirs in deletes.values() for d in dirs}
        stats = {
            d: s
            for d, s in {**prev_stats, **self._staged_stats}.items()
            if d in live
        }
        # delete dirs keep their schemas too: _apply_eq_deletes needs
        # each delete file's equality-column set without opening it
        schemas = {
            d: s
            for d, s in {**prev_schemas, **self._staged_schemas}.items()
            if d in live or d in live_del
        }
        man = {
            "id": sid,
            # parent = the head this snapshot was BUILT FROM (with WAP
            # snapshots in flight, ids can skip, so sid-1 is wrong)
            "parent": self.current_id(),
            "tables": tables,
            "deletes": deletes,
            "meta": {**self.meta(), **(meta or {})},
            "stats": stats,
            "schemas": schemas,
        }
        if publish:
            self._publish(man)
        else:
            mp = os.path.join(self.root, "snapshots", f"{sid}.json")
            tmp = mp + ".tmp"
            with open(tmp, "w") as f:
                json.dump(man, f)
            os.replace(tmp, mp)
            self.tag(f"wap-{sid}", sid)
        self._staged = {}
        self._staged_stats = {}
        self._staged_schemas = {}
        self._staged_deletes = {}
        return sid

    def publish_snapshot(self, sid: int) -> int:
        """Publish a previously audited WAP snapshot: validate that its
        parent is STILL the current head (someone publishing a
        different round in between is the lost-update race WAP must
        refuse — rebase by re-staging instead), then atomically move
        the pointer and drop the protective wap tag."""
        man = self._manifest(sid)
        head = self.current_id()
        if man.get("parent") != head:
            raise ValueError(
                f"snapshot {sid} was audited against parent "
                f"{man.get('parent')} but head is now {head}: "
                "re-stage against the new head instead of publishing"
            )
        cp = os.path.join(self.root, "_current")
        with open(cp + ".tmp", "w") as f:
            f.write(str(sid))
        os.replace(cp + ".tmp", cp)
        try:
            self.drop_tag(f"wap-{sid}")
        except FileNotFoundError:
            pass
        return sid

    def _publish(self, man: dict) -> None:
        """Durably write a manifest, then swap the current pointer —
        the atomic step shared by commit() and rollback_to()."""
        sid = man["id"]
        mp = os.path.join(self.root, "snapshots", f"{sid}.json")
        tmp = mp + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, mp)
        cp = os.path.join(self.root, "_current")
        with open(cp + ".tmp", "w") as f:
            f.write(str(sid))
        os.replace(cp + ".tmp", cp)  # atomic pointer swap = the commit

    def rollback_to(self, snapshot: int) -> int:
        """Iceberg-style rollback: publish a NEW snapshot whose table
        state (file sets, meta, file stats) is the target snapshot's.
        History is preserved — the snapshots being undone stay
        time-travelable until expire_snapshots drops them — and no data
        file moves or is rewritten; the operation is one manifest write
        + pointer swap regardless of table size (the property that
        makes "undo last night's bad crawl round" an O(1) action at
        10^10 rows). Pending staged writes are rejected: they were
        built against the state being abandoned and would silently
        graft onto the restored one."""
        if self._staged or self._staged_deletes:
            raise RuntimeError(
                "staged writes pending; commit() or rollback_staged() "
                "before rollback_to()"
            )
        man = self._manifest(snapshot)  # KeyError-equivalent if expired
        snaps = os.path.join(self.root, "snapshots")
        existing = [
            int(f[:-5]) for f in os.listdir(snaps) if f.endswith(".json")
        ]
        sid = max([self.current_id()] + existing) + 1
        self._publish(
            {
                "id": sid,
                "parent": self.current_id(),
                "rolled_back_to": snapshot,
                "tables": man["tables"],
                "deletes": man.get("deletes", {}),
                "meta": man.get("meta", {}),
                "stats": man.get("stats", {}),
            }
        )
        return sid

    # ---- named refs (Iceberg tag analog) ------------------------------
    def tag(self, name: str, snapshot: int | None = None) -> int:
        """Pin a snapshot under a human name (Iceberg tag analog):
        ``tag("pre-migration")`` then ``read(t, snapshot=ref(...))``
        forever after. Tagged snapshots are PROTECTED from
        expire_snapshots — the property that makes a tag a retention
        contract, not just a bookmark. One tiny file per tag; re-tagging
        a name moves it."""
        sid = self.current_id() if snapshot is None else snapshot
        if sid < 0:
            raise ValueError("nothing committed yet; no snapshot to tag")
        self._manifest(sid)  # must exist (and not be expired)
        d = os.path.join(self.root, "refs")
        os.makedirs(d, exist_ok=True)
        p = os.path.join(d, name)
        with open(p + ".tmp", "w") as f:
            f.write(str(sid))
        os.replace(p + ".tmp", p)
        return sid

    def ref(self, name: str) -> int:
        with open(os.path.join(self.root, "refs", name)) as f:
            return int(f.read().strip())

    def refs(self) -> dict[str, int]:
        d = os.path.join(self.root, "refs")
        if not os.path.isdir(d):
            return {}
        return {n: self.ref(n) for n in sorted(os.listdir(d))}

    def drop_tag(self, name: str) -> None:
        os.remove(os.path.join(self.root, "refs", name))

    def rollback_staged(self) -> None:
        for dirs in self._staged.values():
            for d in dirs:
                if d != "__OVERWRITE__":
                    shutil.rmtree(d, ignore_errors=True)
        for dirs in self._staged_deletes.values():
            for d in dirs:
                shutil.rmtree(d, ignore_errors=True)
        self._staged = {}
        self._staged_stats = {}
        self._staged_deletes = {}

    # ---- reads ----------------------------------------------------------
    def exists(self, table: str, snapshot: int | None = None) -> bool:
        return bool(self.tables(snapshot).get(table))

    def _schemas(self, snapshot: int | None = None) -> dict[str, str]:
        """dir -> StructType json recorded at write time (manifest
        metadata; empty for catalogs written before schemas existed)."""
        sid = self.current_id() if snapshot is None else snapshot
        if sid < 0:
            return {}
        return self._manifest(sid).get("schemas", {})

    @staticmethod
    def _merge_schemas(jsons: list[str]) -> T.StructType | None:
        """Union the recorded per-dir schemas (mergeSchema semantics:
        field order of first appearance, later dirs append new fields).
        None on a type conflict — the caller falls back to the footer
        union, which raises Spark's own detailed error."""
        fields: dict[str, T.StructField] = {}
        order: list[str] = []
        for sj in jsons:
            st = T.StructType.fromJson(json.loads(sj))
            for f in st.fields:
                prev = fields.get(f.name)
                if prev is None:
                    fields[f.name] = f
                    order.append(f.name)
                elif prev.dataType != f.dataType:
                    return None
        # nullable everywhere: a dir written before a column was added
        # legitimately lacks it, and the scan fills nulls
        return T.StructType(
            [T.StructField(n, fields[n].dataType, True) for n in order]
        )

    def _read_dirs(
        self, dirs: list[str], snapshot: int | None = None
    ) -> DataFrame:
        """Scan data dirs with schema-evolution semantics. When every
        dir has a manifest-recorded schema the union is computed from
        metadata and the scan opens ZERO footers (Iceberg's behavior);
        otherwise fall back to Spark's mergeSchema footer-union job.
        Column evolution still works either way: columns added by later
        appends surface as nulls for older dirs."""
        rec = self._schemas(snapshot)
        jsons = [rec.get(d) for d in dirs]
        if all(jsons):
            merged = self._merge_schemas(jsons)  # type: ignore[arg-type]
            if merged is not None:
                return self.spark.read.schema(merged).parquet(*dirs)
        return self.spark.read.option("mergeSchema", "true").parquet(*dirs)

    def read(self, table: str, snapshot: int | None = None) -> DataFrame:
        dirs = self.tables(snapshot).get(table)
        if not dirs:
            raise KeyError(f"table {table!r} absent at snapshot {snapshot}")
        # schema evolution: columns added by later appends must not
        # silently vanish. Resolved from manifest-recorded schemas when
        # available (no footer reads), footer union otherwise.
        dels = self.deletes(snapshot).get(table, [])
        if not dels:
            return self._read_dirs(dirs, snapshot)
        return self._read_with_deletes(dirs, dels, snapshot)

    def _read_with_deletes(
        self,
        data_dirs: list[str],
        delete_dirs: list[str],
        snapshot: int | None = None,
    ) -> DataFrame:
        """Merge-on-read: anti-join equality-delete keys into the scan,
        honoring sequence numbers — a delete dir applies only to data
        dirs with a strictly smaller sequence. Data dirs are grouped by
        their applicable-delete set (at most |delete seqs|+1 groups, a
        handful in practice since compaction clears deletes), each group
        pays one anti-join, and the groups union back. The anti-join is
        a plain shuffle join on the equality columns — AQE broadcasts it
        when the key set is small; nothing here is driver-side."""
        from functools import reduce

        groups = self._delete_groups(data_dirs, delete_dirs)
        parts = []
        for appl, dd in groups.items():
            df = self._read_dirs(dd, snapshot)
            parts.append(self._apply_eq_deletes(df, list(appl), snapshot))
        return reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), parts
        )

    def _apply_eq_deletes(
        self,
        df: DataFrame,
        delete_dirs: list[str],
        snapshot: int | None = None,
    ) -> DataFrame:
        """Apply equality-delete dirs to ``df``, one anti-join per
        distinct equality-column set — Iceberg semantics: each delete
        file deletes on ITS OWN key columns, so delete files keyed on
        e.g. (host) and (url_hash) must not be schema-merged into one
        frame (the union would null-pad and the single anti-join would
        match nothing / the wrong rows). Dirs sharing a column set are
        still read together (one scan, one shuffle per key set)."""
        if not delete_dirs:
            return df
        from pyspark.sql import functions as F

        rec = self._schemas(snapshot)
        by_cols: dict[tuple, list[str]] = {}
        for d in delete_dirs:
            # equality-column set from the manifest-recorded schema when
            # available; footer read only for pre-schema catalogs
            if d in rec:
                st = T.StructType.fromJson(json.loads(rec[d]))
                cols = tuple(sorted(f.name for f in st.fields))
            else:
                cols = tuple(sorted(self.spark.read.parquet(d).columns))
            by_cols.setdefault(cols, []).append(d)
        # POSITION deletes ((_file, _pos) column set) resolve against
        # the scan's hidden metadata columns, which stop being
        # referenceable after a join — apply them FIRST (deletes
        # commute, so ordering is semantics-free)
        pos_key = ("_file", "_pos")
        if pos_key in by_cols:
            keys = self.spark.read.parquet(*by_cols.pop(pos_key)).dropDuplicates()
            had_cols = "_file" in df.columns
            if not had_cols:
                df = df.withColumn(
                    "_file", F.col("_metadata.file_path")
                ).withColumn("_pos", F.col("_metadata.row_index"))
            df = df.join(keys, on=["_file", "_pos"], how="left_anti")
            if not had_cols:
                df = df.drop("_file", "_pos")
        for cols, dd in sorted(by_cols.items()):
            keys = self.spark.read.parquet(*dd).dropDuplicates()
            df = df.join(keys, on=list(cols), how="left_anti")
        return df

    def plan_scan(
        self,
        table: str,
        where: dict[str, tuple] | None = None,
        snapshot: int | None = None,
    ) -> tuple[list[str], int]:
        """Manifest-only scan planning: return (surviving file paths,
        total file count) for ``table`` under conjunctive range
        predicates ``where = {col: (lo, hi)}`` (either bound may be
        None). A file survives unless its recorded (min, max) for some
        predicate column is provably disjoint from [lo, hi]; files or
        columns without stats always survive — pruning is a strict
        superset of the answer, never a filter."""
        where = where or {}
        sid = self.current_id() if snapshot is None else snapshot
        stats = self._manifest(sid).get("stats", {}) if sid >= 0 else {}
        kept: list[str] = []
        total = 0
        for d in self.tables(snapshot).get(table, []):
            dstats = stats.get(d, {})
            for f in sorted(os.listdir(d)):
                if not f.endswith(".parquet"):
                    continue
                total += 1
                b = dstats.get(f, {})
                dead = False
                for col, (lo, hi) in where.items():
                    if col not in b:
                        continue
                    fmin, fmax = b[col]
                    try:
                        if (hi is not None and fmin > hi) or (
                            lo is not None and fmax < lo
                        ):
                            dead = True
                            break
                    except TypeError:  # predicate/stat type mismatch
                        continue
                if not dead:
                    kept.append(os.path.join(d, f))
        return kept, total

    def read_where(
        self,
        table: str,
        where: dict[str, tuple],
        snapshot: int | None = None,
    ) -> DataFrame:
        """Range-predicate read with manifest-level file skipping: plan
        the scan from file stats (``plan_scan``), read only surviving
        files, and apply the exact predicate on top (pruning is
        superset-safe; the residual filter also reaches the parquet
        row-group reader as a pushed filter). Empty survivor set -> an
        empty DataFrame with the table's schema."""
        from pyspark.sql import functions as F

        kept, _ = self.plan_scan(table, where, snapshot)
        if not kept:
            return self.read(table, snapshot).limit(0)
        dels = self.deletes(snapshot).get(table, [])
        if dels:
            # group surviving FILES by their dir's sequence and apply the
            # same strictly-older delete rule as read()
            by_dir: dict[str, list[str]] = {}
            for f in kept:
                by_dir.setdefault(os.path.dirname(f), []).append(f)
            from functools import reduce

            parts = []
            for d, files in by_dir.items():
                s = self._dir_seq(d)
                appl = [x for x in dels if self._dir_seq(x) > s]
                g = self.spark.read.option("mergeSchema", "true").parquet(*files)
                parts.append(self._apply_eq_deletes(g, appl, snapshot))
            df = reduce(
                lambda a, b: a.unionByName(b, allowMissingColumns=True), parts
            )
        else:
            df = self.spark.read.option("mergeSchema", "true").parquet(*kept)
        for col, (lo, hi) in where.items():
            if lo is not None:
                df = df.filter(F.col(col) >= lo)
            if hi is not None:
                df = df.filter(F.col(col) <= hi)
        return df

    def read_incremental(
        self, table: str, from_snapshot: int, to_snapshot: int | None = None
    ) -> DataFrame:
        """Rows appended to ``table`` AFTER ``from_snapshot``, up to
        ``to_snapshot`` (default: current) — the Iceberg incremental-scan
        analog that lets downstream consumers (index builders, training
        shard writers) process each crawl round's delta instead of
        rescanning a 10^10-row table.

        Appends are diffable from manifests alone (immutable dirs: new
        minus old). A compaction or overwrite in the window rewrites
        file identity, so the dir diff would double-count — that case
        raises, and the consumer falls back to a full read (exactly
        Iceberg's behavior for non-append snapshots).
        """
        old = self.tables(from_snapshot).get(table, [])
        new = self.tables(to_snapshot).get(table, [])
        if not set(old) <= set(new):
            raise ValueError(
                f"table {table!r} was overwritten/compacted between snapshots "
                f"{from_snapshot} and {to_snapshot}: incremental read unsound"
            )
        if self.deletes(from_snapshot).get(table, []) != self.deletes(
            to_snapshot
        ).get(table, []):
            raise ValueError(
                f"table {table!r} acquired equality deletes between snapshots "
                f"{from_snapshot} and {to_snapshot}: append-diff CDC would "
                "miss the removals (Iceberg raises on non-append snapshots "
                "the same way)"
            )
        delta = [d for d in new if d not in set(old)]
        if not delta:
            return self.read(table, to_snapshot).limit(0)
        return self._read_dirs(delta, to_snapshot)

    def compact(
        self,
        table: str,
        target_bytes: int = 128 << 20,
        zorder_by: tuple[str, str] | None = None,
        zorder_bits: int = 16,
        layout: str = "zorder",
    ) -> int:
        """Small-file compaction (Iceberg rewrite_data_files analog).

        Every crawl round and every streaming micro-batch appends its own
        directory; at 10^10-URL scale a hot table accumulates thousands
        of sub-target files whose per-file open/footer cost dominates
        scans. This rewrites the table into ceil(bytes/target_bytes)
        files via ONE coalesce job (no shuffle — coalesce only merges
        read splits) and commits the new layout as a snapshot, so the
        rewrite is atomic, crash-safe, and time-travel keeps the old
        layout readable. The target file count comes from manifest-side
        fs metadata — no data pass.

        ``zorder_by=(x, y)`` additionally clusters the rewrite by a
        space-filling-curve key of two integer columns (Delta OPTIMIZE
        ZORDER BY analog): one range shuffle instead of coalesce,
        buying row-group min/max pruning on BOTH columns for every
        future scan. ``layout`` picks the curve: "zorder" (Morton) or
        "hilbert" (continuous — strictly tighter per-file boxes, see
        functions/zorder.py and test_hilbert).

        Returns the new snapshot id.
        """
        current_bytes = 0
        for d in self.tables().get(table, []):
            for root_, _, files in os.walk(d):
                current_bytes += sum(
                    os.path.getsize(os.path.join(root_, f))
                    for f in files
                    if f.endswith(".parquet")
                )
        n_files = max(1, -(-current_bytes // target_bytes))
        df = self.read(table)
        if zorder_by is not None:
            from crawler_spark.functions.zorder import hilbert_layout, zorder_layout

            fn = {"zorder": zorder_layout, "hilbert": hilbert_layout}[layout]
            df = fn(df, zorder_by[0], zorder_by[1], n_files, zorder_bits)
        else:
            df = df.coalesce(n_files)
        self.stage_overwrite(table, df)
        return self.commit()

    def expire_snapshots(self, keep_last: int = 3) -> int:
        """GC analog of the reference's cleanup_old_files
        (csv_handler.py:186-212): drop old manifests, keep files referenced
        by surviving snapshots."""
        cur = self.current_id()
        snaps = sorted(
            int(f[:-5])
            for f in os.listdir(os.path.join(self.root, "snapshots"))
            if f.endswith(".json")
        )
        pinned = set(self.refs().values())
        doomed = [s for s in snaps if s <= cur - keep_last and s not in pinned]
        keep_dirs: set[str] = set()
        for s in snaps:
            if s not in doomed:
                m = self._manifest(s)
                for dirs in m["tables"].values():
                    keep_dirs.update(dirs)
                for dirs in m.get("deletes", {}).values():
                    keep_dirs.update(dirs)
        removed = 0
        for s in doomed:
            m = self._manifest(s)
            for part in (m["tables"], m.get("deletes", {})):
                for dirs in part.values():
                    for d in dirs:
                        if d not in keep_dirs and os.path.exists(d):
                            shutil.rmtree(d, ignore_errors=True)
                            removed += 1
            os.remove(os.path.join(self.root, "snapshots", f"{s}.json"))
        return removed
