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


def anti_join_seen(candidates: DataFrame, seen: DataFrame,
                   bloom: NumpyBloom | None = None) -> DataFrame:
    """Exact NOT-EXISTS of candidates against the seen set.

    With a bloom: rows the bloom proves unseen bypass the shuffle join
    entirely (at real scale that is the vast majority of new outlinks);
    only "maybe seen" rows join. Without: plain left_anti.
    Join keys: (url_hash, url_canon) — hash for partitioning, the string
    as the exactness backstop against 64-bit collisions at 10^10 rows.
    """
    if bloom is None:
        return candidates.join(
            seen.select("url_hash", "url_canon"),
            on=["url_hash", "url_canon"],
            how="left_anti",
        )
    bc = candidates.sparkSession.sparkContext.broadcast(
        (bloom.bits.tobytes(), bloom.m_bits, bloom.k)
    )

    @F.pandas_udf(T.BooleanType())
    def maybe_seen(h: pd.Series) -> pd.Series:
        bits, m_bits, k = bc.value
        bl = NumpyBloom(m_bits, k, bits=np.frombuffer(bits, dtype=np.uint8))
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
