"""URL-seen set: bloom prefilter + exact anti-join backstop.

Reference parity: ``store_exists(name, address, region_id)`` runs an exact
DB lookup before every insert (reference: src/database.py:126-136, call
site src/crawler/base_crawler.py:385-389). The reference is EXACT, so our
bloom filter is advisory only — every candidate that the bloom flags as
"maybe seen" is confirmed by an exact ``left_anti`` join on
``(url_hash, url_canon)``; bloom false positives therefore cost a join
probe, never a dropped URL, and false negatives are impossible by
construction (we only skip the join for rows the bloom PROVES unseen...
actually the safe direction is the reverse: bloom-negative rows are
provably unseen and skip the shuffle join; bloom-positive rows go through
the exact join).

Scale design (10^10 URLs): the seen table is hash-bucketed by
``pmod(url_hash, n_buckets)``; each bucket gets its own bloom slice, so no
single filter needs 10^10 capacity and buckets build in parallel. The
bitmap for each slice is OR-reduced from per-partition numpy bitmaps
(``mapInPandas`` -> driver OR -> broadcast), i.e. one pass over the seen
table, no collect of raw keys. In this sandbox Spark's
``bloom_filter_agg`` SQL expression is not registered, hence the numpy
implementation; on a cluster the same two-phase shape holds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# two derived probe positions per key via splitmix-style remixing
_MIX1 = 0xBF58476D1CE4E5B9
_MIX2 = 0x94D049BB133111EB
_M64 = 0xFFFFFFFFFFFFFFFF


def _probes(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """k probe positions per hash (double hashing, Kirsch-Mitzenmacher)."""
    x = h.astype(np.uint64)
    a = ((x ^ (x >> np.uint64(30))) * np.uint64(_MIX1)) & np.uint64(_M64)
    b = ((a ^ (a >> np.uint64(27))) * np.uint64(_MIX2)) & np.uint64(_M64)
    pos = np.empty((k, len(h)), dtype=np.uint64)
    for i in range(k):
        pos[i] = (a + np.uint64(i) * b) % np.uint64(m_bits)
    return pos


class NumpyBloom:
    """Fixed-size bloom over int64 hashes; vectorized add/contains."""

    def __init__(self, m_bits: int = 1 << 23, k: int = 5, bits: np.ndarray | None = None):
        self.m_bits = m_bits
        self.k = k
        self.bits = bits if bits is not None else np.zeros(m_bits // 8, dtype=np.uint8)

    def add_many(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        pos = _probes(hashes, self.m_bits, self.k).reshape(-1)
        np.bitwise_or.at(self.bits, (pos >> np.uint64(3)).astype(np.int64),
                         np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        pos = _probes(hashes, self.m_bits, self.k)
        hit = np.ones(len(hashes), dtype=bool)
        for i in range(self.k):
            p = pos[i]
            hit &= (self.bits[(p >> np.uint64(3)).astype(np.int64)]
                    >> (p & np.uint64(7)).astype(np.uint8)) & 1 == 1
        return hit


class BucketedBloom:
    """``n_buckets`` independent bloom slices; a key routes to slice
    ``unsigned(hash) % n_buckets``. This is the 10^10-scale layout from
    SCALE.md §URL-seen: no single filter needs full-corpus capacity,
    slices build/update in parallel, and (critically) the slices PERSIST
    as a catalog table that is incrementally OR-updated with each
    round's new keys — never rebuilt from a full seen-table scan."""

    def __init__(self, n_buckets: int = 4, m_bits: int = 1 << 21, k: int = 5,
                 bits_by_bucket: dict[int, np.ndarray] | None = None):
        self.n_buckets = n_buckets
        self.m_bits = m_bits
        self.k = k
        self.bits_by_bucket = bits_by_bucket if bits_by_bucket is not None else {}

    def _bucket_of(self, hashes: np.ndarray) -> np.ndarray:
        return (hashes.astype(np.uint64) % np.uint64(self.n_buckets)).astype(np.int64)

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        buckets = self._bucket_of(hashes)
        out = np.zeros(len(hashes), dtype=bool)
        for b in np.unique(buckets):
            bits = self.bits_by_bucket.get(int(b))
            if bits is None:
                continue  # empty slice: provably unseen
            mask = buckets == b
            bl = NumpyBloom(self.m_bits, self.k, bits=bits)
            out[mask] = bl.contains_many(hashes[mask])
        return out

    def to_rows(self) -> list[tuple[int, bytes]]:
        return [(int(b), bits.tobytes()) for b, bits in sorted(self.bits_by_bucket.items())]

    @classmethod
    def from_rows(cls, rows, n_buckets: int, m_bits: int, k: int) -> "BucketedBloom":
        by = {
            int(r["bucket_id"]): np.frombuffer(bytes(r["bits"]), dtype=np.uint8).copy()
            for r in rows
        }
        return cls(n_buckets, m_bits, k, by)

    def or_delta_rows(self, rows) -> None:
        """OR per-bucket delta bitmaps (same m_bits/k) into this filter."""
        for r in rows:
            b = int(r["bucket_id"])
            delta = np.frombuffer(bytes(r["bits"]), dtype=np.uint8)
            if b in self.bits_by_bucket:
                self.bits_by_bucket[b] |= delta
            else:
                self.bits_by_bucket[b] = delta.copy()


def bloom_delta_rows(
    df: DataFrame, hash_col: str = "url_hash",
    n_buckets: int = 4, m_bits: int = 1 << 21, k: int = 5,
) -> DataFrame:
    """One distributed pass over ``df``: per-partition, per-bucket delta
    bitmaps as (bucket_id, bits) rows. Driver/table traffic is bounded by
    n_partitions * touched_buckets * m/8 bytes — independent of row
    count. The per-round input here is only the round's NEW keys, so the
    incremental update cost is O(round), not O(total seen)."""
    schema = T.StructType(
        [T.StructField("bucket_id", T.IntegerType()), T.StructField("bits", T.BinaryType())]
    )

    def part_bitmaps(batches):
        blooms: dict[int, NumpyBloom] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            h = pdf[hash_col].to_numpy(dtype=np.int64)
            buckets = (h.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int64)
            for b in np.unique(buckets):
                bl = blooms.setdefault(int(b), NumpyBloom(m_bits, k))
                bl.add_many(h[buckets == b])
        if blooms:
            yield pd.DataFrame(
                {
                    "bucket_id": pd.array(sorted(blooms), dtype="Int64"),
                    "bits": pd.array(
                        [blooms[b].bits.tobytes() for b in sorted(blooms)], dtype=object
                    ),
                }
            )

    return df.select(hash_col).mapInPandas(part_bitmaps, schema=schema)


def merge_bloom_rows(rows: DataFrame) -> DataFrame:
    """Distributed per-bucket OR of (bucket_id, bits) rows — grouped by
    bucket, so at 10^10 scale each of the 4096 slices reduces on its own
    executor; no slice ever funnels through the driver."""
    schema = T.StructType(
        [T.StructField("bucket_id", T.IntegerType()), T.StructField("bits", T.BinaryType())]
    )

    def or_group(pdf: pd.DataFrame) -> pd.DataFrame:
        acc: np.ndarray | None = None
        for b in pdf["bits"]:
            a = np.frombuffer(bytes(b), dtype=np.uint8)
            acc = a.copy() if acc is None else (acc | a)
        return pd.DataFrame(
            {"bucket_id": [int(pdf["bucket_id"].iloc[0])], "bits": [acc.tobytes()]}
        )

    return rows.groupBy("bucket_id").applyInPandas(or_group, schema=schema)


def build_bloom(seen: DataFrame, hash_col: str = "url_hash",
                m_bits: int = 1 << 23, k: int = 5) -> NumpyBloom:
    """One distributed pass: per-partition bitmaps OR-reduced on the driver.

    Each partition emits its m/8-byte bitmap once (not its keys), so driver
    traffic is n_partitions * m/8 bytes regardless of row count. At 10^10
    scale this runs per hash-bucket with m sized for the bucket.
    """
    schema = T.StructType([T.StructField("bits", T.BinaryType())])

    def part_bitmap(batches):
        bl = NumpyBloom(m_bits, k)
        any_rows = False
        for pdf in batches:
            if len(pdf):
                any_rows = True
                bl.add_many(pdf[hash_col].to_numpy(dtype=np.int64))
        if any_rows:
            yield pd.DataFrame({"bits": [bl.bits.tobytes()]})

    parts = seen.select(hash_col).mapInPandas(part_bitmap, schema=schema).collect()
    out = NumpyBloom(m_bits, k)
    for r in parts:
        out.bits |= np.frombuffer(r["bits"], dtype=np.uint8)
    return out


# ---- bucket-pruned sidecar loading ---------------------------------------
# SCALE.md's cluster story: "a round builds/loads only the buckets its
# candidate links touch". The functions below are that load path — the
# whole-filter `.collect()` never happens; driver traffic is O(n_buckets
# ints) and each executor task deserializes exactly one bucket's slice.


def bucket_expr(hash_col: str, n_buckets: int):
    """``unsigned(hash) % n_buckets`` as a JVM-side Column — the exact
    numpy routing ``hash.astype(uint64) % n_buckets`` used by the filter
    builders, expressed in signed arithmetic: for h < 0 the unsigned
    value is h + 2^64, so its residue is (pmod(h,n) + 2^64 mod n) mod n."""
    h = F.col(hash_col)
    r = F.pmod(h, F.lit(n_buckets))
    return (
        F.when(h >= 0, r)
        .otherwise(F.pmod(r + F.lit((1 << 64) % n_buckets), F.lit(n_buckets)))
        .cast("int")
    )


def touched_bucket_ids(df: DataFrame, n_buckets: int,
                       hash_col: str = "url_hash") -> list[int]:
    """Distinct bucket ids the candidate hashes route to — at most
    ``n_buckets`` ints, the ONLY driver-side piece of the pruned load
    path. One cheap job: per-partition partial distinct (≤ n_buckets
    rows each), then a tiny exchange."""
    rows = (
        df.select(bucket_expr(hash_col, n_buckets).alias("bucket_id"))
        .distinct()
        .collect()
    )
    return sorted(int(r["bucket_id"]) for r in rows)


def flag_maybe_seen_bucketed(
    candidates: DataFrame, slices: DataFrame, kind: str, cfg: dict,
    hash_col: str = "url_hash", flag_col: str = "_maybe",
) -> DataFrame:
    """Executor-side bucketed membership flagging: candidates
    repartition by bucket id and cogroup with the persisted
    ``(bucket_id, ...)`` slice rows; each task deserializes ONLY its own
    bucket's slice — never the whole filter, never on the driver.

    ``kind``: "bloom" (slices carry ``bits``; cfg has m_bits, k) or
    "cuckoo" (slices carry ``tbl``/``stash``; cfg has n_slots,
    slot_width). A bucket with no slice row is provably unseen (nothing
    was ever inserted there), matching Bucketed{Bloom,Cuckoo} semantics."""
    n_buckets = int(cfg["n_buckets"])
    cand = candidates.withColumn("_sb", bucket_expr(hash_col, n_buckets))
    out_schema = T.StructType(
        list(cand.schema.fields) + [T.StructField(flag_col, T.BooleanType())]
    )

    def flag_group(key, cand_pdf: pd.DataFrame, slice_pdf: pd.DataFrame):
        out = cand_pdf.copy()
        if not len(cand_pdf):
            out[flag_col] = pd.Series([], dtype=bool)
            return out
        h = cand_pdf[hash_col].to_numpy(dtype=np.int64)
        if not len(slice_pdf):
            maybe = np.zeros(len(h), dtype=bool)
        elif kind == "cuckoo":
            from crawler_spark.operators.cuckoo import NumpyCuckoo

            r = slice_pdf.iloc[0]
            sl = NumpyCuckoo.from_bytes(
                bytes(r["tbl"]), bytes(r["stash"]),
                int(cfg["n_slots"]), int(cfg["slot_width"]),
            )
            maybe = sl.contains_many(h)
        else:
            r = slice_pdf.iloc[0]
            bl = NumpyBloom(
                int(cfg["m_bits"]), int(cfg["k"]),
                bits=np.frombuffer(bytes(r["bits"]), dtype=np.uint8),
            )
            maybe = bl.contains_many(h)
        out[flag_col] = maybe
        return out

    return (
        cand.groupBy("_sb")
        .cogroup(slices.groupBy("bucket_id"))
        .applyInPandas(flag_group, schema=out_schema)
        .drop("_sb")
    )


# test observability: shape of the most recent pruned sidecar load
LAST_PRUNE_STATS: dict = {}


def anti_join_seen_pruned(
    candidates: DataFrame, seen: DataFrame, sidecar: DataFrame,
    kind: str, cfg: dict, hash_col: str = "url_hash",
) -> DataFrame:
    """The 10^10-scale anti-join: (1) collect the candidates' touched
    bucket ids (≤ n_buckets ints), (2) read ONLY those sidecar rows —
    the ``In(bucket_id, ...)`` predicate pushes into the parquet scan,
    so untouched slices are never even deserialized, (3) flag per-bucket
    executor-side via cogroup, (4) exact ``left_anti`` backstop on the
    flagged suspects (false positives cost a probe, never a dropped
    URL; negatives skip the shuffle join — same contract as
    :func:`anti_join_seen`).

    Replaces the whole-filter ``catalog.read(...).collect()`` load:
    driver traffic is O(n_buckets ints), not O(filter bytes) — at the
    documented design point (~12 GB of slices at 10^10 keys) the old
    path OOMs the driver; this one never materializes a slice there."""
    touched = touched_bucket_ids(candidates, int(cfg["n_buckets"]), hash_col)
    LAST_PRUNE_STATS.clear()
    LAST_PRUNE_STATS.update(
        kind=kind, touched=touched, n_buckets=int(cfg["n_buckets"])
    )
    if not touched:  # no candidates at all — nothing can be unseen
        return candidates
    slices = sidecar.filter(F.col("bucket_id").isin(touched))
    flagged = flag_maybe_seen_bucketed(candidates, slices, kind, cfg, hash_col)
    clean = flagged.filter(~F.col("_maybe")).drop("_maybe")
    suspect = (
        flagged.filter(F.col("_maybe"))
        .drop("_maybe")
        .join(seen.select("url_hash", "url_canon"),
              on=["url_hash", "url_canon"], how="left_anti")
    )
    return clean.unionByName(suspect)


def anti_join_seen(candidates: DataFrame, seen: DataFrame,
                   bloom: "NumpyBloom | BucketedBloom | None" = None) -> DataFrame:
    """Exact NOT-EXISTS of candidates against the seen set.

    With a bloom (flat or bucketed): rows the bloom proves unseen bypass
    the shuffle join entirely (at real scale that is the vast majority of
    new outlinks); only "maybe seen" rows join. Without: plain left_anti.
    Join keys: (url_hash, url_canon) — hash for partitioning, the string
    as the exactness backstop against 64-bit collisions at 10^10 rows.
    """
    if bloom is None:
        return candidates.join(
            seen.select("url_hash", "url_canon"),
            on=["url_hash", "url_canon"],
            how="left_anti",
        )
    if isinstance(bloom, BucketedBloom):
        payload = (
            "bucketed", bloom.n_buckets, bloom.m_bits, bloom.k,
            [(b, bits.tobytes()) for b, bits in bloom.bits_by_bucket.items()],
        )
    elif isinstance(bloom, NumpyBloom):
        payload = ("flat", 0, bloom.m_bits, bloom.k, bloom.bits.tobytes())
    else:
        # any other membership filter exposing contains_many (e.g.
        # operators/cuckoo.BucketedCuckoo) ships whole via broadcast
        payload = ("obj", 0, 0, 0, bloom)
    bc = candidates.sparkSession.sparkContext.broadcast(payload)

    @F.pandas_udf(T.BooleanType())
    def maybe_seen(h: pd.Series) -> pd.Series:
        kind, n_buckets, m_bits, k, data = bc.value
        if kind == "bucketed":
            bl = BucketedBloom(
                n_buckets, m_bits, k,
                {b: np.frombuffer(raw, dtype=np.uint8) for b, raw in data},
            )
        elif kind == "obj":
            bl = data
        else:
            bl = NumpyBloom(m_bits, k, bits=np.frombuffer(data, dtype=np.uint8))
        return pd.Series(bl.contains_many(h.to_numpy(dtype=np.int64)))

    flagged = candidates.withColumn("_maybe", maybe_seen(F.col("url_hash")))
    clean = flagged.filter(~F.col("_maybe")).drop("_maybe")
    suspect = (
        flagged.filter(F.col("_maybe"))
        .drop("_maybe")
        .join(seen.select("url_hash", "url_canon"),
              on=["url_hash", "url_canon"], how="left_anti")
    )
    return clean.unionByName(suspect)
