"""Partitioned cuckoo-filter URL-seen sidecar — the DELETE-capable half of
the north rule's "bloom/cuckoo URL-seen".

Role and contract are identical to the bucketed bloom in
``operators/seen.py``: an advisory prefilter in front of the exact
anti-join backstop. Filter-NEGATIVE rows are treated as provably unseen
and skip the shuffle join; filter-POSITIVE rows are confirmed by the
exact ``left_anti`` join, so false positives cost a probe, never a
wrongly-dropped URL.

Why a cuckoo when the bloom already works: **delete**. A recrawl
scheduler that wants a URL refetched must make it look unseen again.
Deleting one row from a 10^10-row seen table is an expensive MERGE;
deleting its fingerprint from a cuckoo slice is an O(1) slot update —
and because filter-negative rows bypass the exact join entirely, a
deleted key immediately reads as unseen even while its row still sits in
the seen table (the intended override direction: refetching a seen URL
is exactly what recrawl means). The reference has no recrawl path at all
(``store_exists`` is insert-only, reference: src/database.py:126-136);
this is the scale extension the north rule names explicitly.

No-false-negative guarantee (mandatory, because negatives skip the
exact join): inserts that exhaust the eviction chain land in a per-slice
stash that every lookup also consults, so membership can never silently
fail at high load. Deletes follow standard cuckoo-filter rules: only
keys that were previously inserted may be deleted — ours come from the
seen table, inserted by construction. Distinct keys that collide on
(index, fingerprint) each hold their own copy, so deleting one never
un-members the other.

Scale layout mirrors the bloom (SCALE.md §URL-seen): ``n_buckets``
independent slices routed by ``unsigned(url_hash) % n_buckets``; slices
build in parallel (``mapInPandas`` partial tables -> per-bucket
``applyInPandas`` merge), persist as a catalog table, and are maintained
incrementally with O(round's-new-keys) work. Cuckoo tables merge without
the original keys: an entry (i, f) re-inserts anywhere in {i, alt(i,f)}
because the alternate index is ``i XOR H(f)`` — an involution.

16-bit fingerprints at slot_width=4 give ~(16/0.95 + stash) ≈ 17-18
bits/key at 95% load with FPR ≈ 2*4/2^16 ≈ 1.2e-4 — denser than a
same-FPR bloom, plus deletability.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_M64 = 0xFFFFFFFFFFFFFFFF
_MIX1 = 0xBF58476D1CE4E5B9
_MIX2 = 0x94D049BB133111EB
_FP_MIX = 0x5BD1E995  # MurmurHash2 constant: spreads the 16-bit fp over indexes

CUCKOO_CFG = {"n_buckets": 4, "n_slots": 1 << 14, "slot_width": 4}

CUCKOO_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("bucket_id", T.IntegerType()),
        T.StructField("tbl", T.BinaryType()),
        T.StructField("stash", T.BinaryType()),
    ]
)


def _mix(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over int64 keys -> well-mixed uint64."""
    x = h.astype(np.uint64)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(_MIX1)) & np.uint64(_M64)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(_MIX2)) & np.uint64(_M64)
    return x ^ (x >> np.uint64(31))


def _fp_and_index(h: np.ndarray, n_slots: int) -> tuple[np.ndarray, np.ndarray]:
    """(fingerprint in 1..65535, primary index) per key."""
    m = _mix(h)
    f = (m & np.uint64(0xFFFF)).astype(np.uint16)
    f = np.where(f == 0, np.uint16(1), f)  # 0 marks an empty slot
    i = ((m >> np.uint64(16)) & np.uint64(n_slots - 1)).astype(np.int64)
    return f, i


def _alt_index(i: np.ndarray | int, f: np.ndarray | int, n_slots: int):
    """Partial-key alternate: i XOR H(f). An involution, so either index
    recovers the other without the original key — what makes tables
    mergeable and entries relocatable."""
    hf = (np.uint64(_FP_MIX) * np.asarray(f, dtype=np.uint64)) & np.uint64(_M64)
    return (np.asarray(i, dtype=np.uint64) ^ hf).astype(np.int64) & (n_slots - 1)


def _stash_code(i, f, n_slots: int) -> np.ndarray:
    """Canonical uint64 code for a stash entry: min(i, alt) << 16 | f —
    canonicalized so lookups from either index find it."""
    i = np.asarray(i, dtype=np.int64)
    f = np.asarray(f)
    alt = _alt_index(i, f, n_slots)
    canon = np.minimum(i, alt).astype(np.uint64)
    return (canon << np.uint64(16)) | f.astype(np.uint64)


class NumpyCuckoo:
    """One cuckoo-filter slice over int64 hashes.

    Table is (n_slots, slot_width) uint16; fingerprint 0 = empty; rows
    are kept LEFT-PACKED (inserts append at the first zero, deletes
    re-pack) so the vectorized bulk-insert can place keys by occupancy
    count alone.
    """

    def __init__(self, n_slots: int = 1 << 14, slot_width: int = 4,
                 max_kicks: int = 500,
                 table: np.ndarray | None = None,
                 stash: set[int] | None = None):
        assert n_slots & (n_slots - 1) == 0, "n_slots must be a power of two"
        self.n_slots = n_slots
        self.slot_width = slot_width
        self.max_kicks = max_kicks
        self.table = (
            table if table is not None
            else np.zeros((n_slots, slot_width), dtype=np.uint16)
        )
        self.stash: set[int] = stash if stash is not None else set()

    # ---- insert ---------------------------------------------------------

    def insert_many(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        f, i1 = _fp_and_index(np.asarray(hashes, dtype=np.int64), self.n_slots)
        # vectorized fast path: within each primary-index run, key k gets
        # slot occ(row) + rank-in-run; keys that fit are scattered in one
        # shot, only overflow walks the per-key eviction path.
        order = np.argsort(i1, kind="stable")
        si, sf = i1[order], f[order]
        run_start = np.flatnonzero(np.r_[True, si[1:] != si[:-1]])
        rank = np.arange(len(si)) - np.repeat(run_start, np.diff(np.r_[run_start, len(si)]))
        occ = (self.table[si] != 0).sum(axis=1)
        slot = occ + rank
        fits = slot < self.slot_width
        self.table[si[fits], slot[fits]] = sf[fits]
        for i, fp in zip(si[~fits], sf[~fits]):
            self._insert_fp(int(i), int(fp))

    def _insert_fp(self, i: int, fp: int) -> None:
        """Place fingerprint fp whose valid homes are {i, alt(i,fp)};
        evict up to max_kicks, then stash (never drop: negatives skip
        the exact join, so a dropped entry would be a false negative)."""
        for idx in (i, int(_alt_index(i, fp, self.n_slots))):
            row = self.table[idx]
            free = np.flatnonzero(row == 0)
            if len(free):
                row[free[0]] = fp
                return
        cur_i, cur_f = int(_alt_index(i, fp, self.n_slots)), fp
        for kick in range(self.max_kicks):
            s = kick % self.slot_width
            victim = int(self.table[cur_i, s])
            self.table[cur_i, s] = cur_f
            cur_f = victim
            cur_i = int(_alt_index(cur_i, cur_f, self.n_slots))
            row = self.table[cur_i]
            free = np.flatnonzero(row == 0)
            if len(free):
                row[free[0]] = cur_f
                return
        self.stash.add(int(_stash_code(cur_i, cur_f, self.n_slots)))

    # ---- lookup ---------------------------------------------------------

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        h = np.asarray(hashes, dtype=np.int64)
        f, i1 = _fp_and_index(h, self.n_slots)
        i2 = _alt_index(i1, f, self.n_slots)
        hit = (self.table[i1] == f[:, None]).any(axis=1)
        hit |= (self.table[i2] == f[:, None]).any(axis=1)
        if self.stash:
            codes = _stash_code(i1, f, self.n_slots)
            hit |= np.isin(codes, np.fromiter(self.stash, dtype=np.uint64))
        return hit

    # ---- delete ---------------------------------------------------------

    def delete_many(self, hashes: np.ndarray) -> int:
        """Remove one copy per previously-inserted key; rows stay
        left-packed. Returns how many were found and removed."""
        removed = 0
        h = np.asarray(hashes, dtype=np.int64)
        f, i1 = _fp_and_index(h, self.n_slots)
        i2 = _alt_index(i1, f, self.n_slots)
        for a, b, fp in zip(i1, i2, f):
            done = False
            for idx in (int(a), int(b)):
                row = self.table[idx]
                at = np.flatnonzero(row == fp)
                if len(at):
                    row[at[0]:-1] = row[at[0] + 1:]  # re-pack left
                    row[-1] = 0
                    removed += 1
                    done = True
                    break
            if not done:
                code = int(_stash_code(int(a), int(fp), self.n_slots))
                if code in self.stash:
                    self.stash.discard(code)
                    removed += 1
        return removed

    # ---- merge / serialization ------------------------------------------

    def merge_entries(self, table: np.ndarray, stash_codes: np.ndarray) -> None:
        """Fold another slice's entries in, keys not needed: every
        occupied (index, fp) re-inserts via its {i, alt} pair."""
        idx, slot = np.nonzero(table)
        for i, s in zip(idx, slot):
            self._insert_fp(int(i), int(table[i, s]))
        for code in stash_codes:
            c = np.uint64(code)
            self._insert_fp(int(c >> np.uint64(16)), int(c & np.uint64(0xFFFF)))

    def to_bytes(self) -> tuple[bytes, bytes]:
        stash = np.fromiter(sorted(self.stash), dtype=np.uint64, count=len(self.stash))
        return self.table.tobytes(), stash.tobytes()

    @classmethod
    def from_bytes(cls, tbl: bytes, stash: bytes, n_slots: int,
                   slot_width: int) -> "NumpyCuckoo":
        table = np.frombuffer(bytes(tbl), dtype=np.uint16).reshape(
            n_slots, slot_width
        ).copy()
        codes = set(np.frombuffer(bytes(stash), dtype=np.uint64).tolist())
        return cls(n_slots, slot_width, table=table, stash=codes)


class BucketedCuckoo:
    """n_buckets independent slices; a key routes to slice
    unsigned(hash) % n_buckets — same layout/persistence contract as
    ``seen.BucketedBloom`` so the crawl round can maintain either."""

    def __init__(self, n_buckets: int = 4, n_slots: int = 1 << 14,
                 slot_width: int = 4,
                 slices: dict[int, NumpyCuckoo] | None = None):
        self.n_buckets = n_buckets
        self.n_slots = n_slots
        self.slot_width = slot_width
        self.slices = slices if slices is not None else {}

    def _bucket_of(self, hashes: np.ndarray) -> np.ndarray:
        return (np.asarray(hashes).astype(np.uint64)
                % np.uint64(self.n_buckets)).astype(np.int64)

    def _slice(self, b: int) -> NumpyCuckoo:
        if b not in self.slices:
            self.slices[b] = NumpyCuckoo(self.n_slots, self.slot_width)
        return self.slices[b]

    def insert_many(self, hashes: np.ndarray) -> None:
        h = np.asarray(hashes, dtype=np.int64)
        buckets = self._bucket_of(h)
        for b in np.unique(buckets):
            self._slice(int(b)).insert_many(h[buckets == b])

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        h = np.asarray(hashes, dtype=np.int64)
        buckets = self._bucket_of(h)
        out = np.zeros(len(h), dtype=bool)
        for b in np.unique(buckets):
            sl = self.slices.get(int(b))
            if sl is None:
                continue  # empty slice: provably unseen
            mask = buckets == b
            out[mask] = sl.contains_many(h[mask])
        return out

    def delete_many(self, hashes: np.ndarray) -> int:
        h = np.asarray(hashes, dtype=np.int64)
        buckets = self._bucket_of(h)
        removed = 0
        for b in np.unique(buckets):
            sl = self.slices.get(int(b))
            if sl is not None:
                removed += sl.delete_many(h[buckets == b])
        return removed

    def to_rows(self) -> list[tuple[int, bytes, bytes]]:
        out = []
        for b in sorted(self.slices):
            tbl, stash = self.slices[b].to_bytes()
            out.append((b, tbl, stash))
        return out

    @classmethod
    def from_rows(cls, rows, n_buckets: int, n_slots: int,
                  slot_width: int) -> "BucketedCuckoo":
        slices = {
            int(r["bucket_id"]): NumpyCuckoo.from_bytes(
                r["tbl"], r["stash"], n_slots, slot_width
            )
            for r in rows
        }
        return cls(n_buckets, n_slots, slot_width, slices)


def cuckoo_delta_rows(
    df: DataFrame, hash_col: str = "url_hash",
    n_buckets: int = 4, n_slots: int = 1 << 14, slot_width: int = 4,
) -> DataFrame:
    """One distributed pass over df: per-partition, per-bucket partial
    cuckoo tables as (bucket_id, tbl, stash) rows. Traffic is bounded by
    n_partitions * touched_buckets * table size — independent of row
    count; the per-round input is only the round's NEW keys, so the
    incremental update is O(round), not O(total seen)."""

    def part_tables(batches):
        filt = BucketedCuckoo(n_buckets, n_slots, slot_width)
        any_rows = False
        for pdf in batches:
            if len(pdf):
                any_rows = True
                filt.insert_many(pdf[hash_col].to_numpy(dtype=np.int64))
        if any_rows:
            rows = filt.to_rows()
            yield pd.DataFrame(
                {
                    "bucket_id": pd.array([r[0] for r in rows], dtype="Int64"),
                    "tbl": pd.array([r[1] for r in rows], dtype=object),
                    "stash": pd.array([r[2] for r in rows], dtype=object),
                }
            )

    return df.select(hash_col).mapInPandas(part_tables, schema=CUCKOO_ROWS_SCHEMA)


def merge_cuckoo_rows(rows: DataFrame, n_slots: int = 1 << 14,
                      slot_width: int = 4) -> DataFrame:
    """Distributed per-bucket fold of (bucket_id, tbl, stash) rows —
    grouped by bucket so each slice reduces on its own executor. Merge
    needs no keys: entries relocate via the (i, alt) involution."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        acc: NumpyCuckoo | None = None
        for tbl, stash in zip(pdf["tbl"], pdf["stash"]):
            if acc is None:
                acc = NumpyCuckoo.from_bytes(tbl, stash, n_slots, slot_width)
            else:
                table = np.frombuffer(bytes(tbl), dtype=np.uint16).reshape(
                    n_slots, slot_width
                )
                codes = np.frombuffer(bytes(stash), dtype=np.uint64)
                acc.merge_entries(table, codes)
        tbl_b, stash_b = acc.to_bytes()
        return pd.DataFrame(
            {
                "bucket_id": [int(pdf["bucket_id"].iloc[0])],
                "tbl": [tbl_b],
                "stash": [stash_b],
            }
        )

    return rows.groupBy("bucket_id").applyInPandas(fold, schema=CUCKOO_ROWS_SCHEMA)
