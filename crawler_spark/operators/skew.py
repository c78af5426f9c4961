"""Salted join for skewed large-large joins.

When one join key carries a disproportionate share of rows (a hot host,
a viral URL, an empty-string caption), a plain hash join sends the whole
hot key to one reducer and the stage runs at the speed of that single
task. AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`,
on by default in our session) is the first resort — it splits oversized
partitions at runtime *when the non-skewed side can be replicated
per-split*. Salting is the explicit, planner-independent version of the
same idea, and the only option when AQE can't kick in (e.g. the join is
followed by a window that pins the partitioning, or the build side
arrives pre-shuffled from a previous stage and AQE sees no skewed
shuffle to split).

Mechanics: the skewed (probe) side derives a deterministic salt in
``[0, n_salts)`` from a row-unique column; the other (build) side is
replicated ``n_salts`` times via ``explode(sequence(...))``. Joining on
``(key, salt)`` spreads each hot key over ``n_salts`` reducers. Row
multiplicity is exactly preserved: every probe row lands in one salt
bucket and meets exactly the one replica of each matching build row
that carries its salt — so the result is row-for-row identical to the
unsalted join (the oracle for `skewed_join_counts` is the plain join).

Cost model at scale: build-side shuffle volume multiplies by
``n_salts``, so salt only the keys that need it — at 100 TB, pass
``hot_keys`` (from a cheap approximate top-k pre-pass) and the operator
salts those keys while the long tail joins unsalted, keeping the
replication factor on >99% of the build rows at 1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt_src: Column,
    n_salts: int = 8,
    how: str = "inner",
    hot_keys: list | None = None,
) -> DataFrame:
    """Join `probe` (skewed side) with `build` on `key`, spreading each
    key across `n_salts` reducers.

    salt_src: any probe-side expression that varies within a key (a
    row id, a url hash) — salts are derived with xxhash64 so they are
    deterministic across reruns and cluster sizes (unlike F.rand()).
    hot_keys: if given, only these key values are salted/replicated;
    the rest join with a constant salt of 0 (replication factor 1).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    is_hot = F.col(key).isin(hot_keys) if hot_keys is not None else F.lit(True)
    salt = F.pmod(F.xxhash64(salt_src), F.lit(n_salts)).cast("int")
    p = probe.withColumn(SALT_COL, F.when(is_hot, salt).otherwise(F.lit(0)))
    b = build.withColumn(
        SALT_COL,
        F.explode(
            F.when(is_hot, F.sequence(F.lit(0), F.lit(n_salts - 1)))
            .otherwise(F.array(F.lit(0)))
        ),
    )
    # shuffle_hash: the whole point is distributing the shuffle; a
    # broadcast of the replicated build side would hide the mechanism
    # (and a build side big enough to need salting never broadcasts).
    return p.join(b.hint("shuffle_hash"), [key, SALT_COL], how).drop(SALT_COL)


def exact_rank_select(
    df: DataFrame,
    col: str,
    rank: int | None = None,
    bin_width: int = 64,
) -> DataFrame:
    """Exact global order statistic WITHOUT a global sort — the k-th
    smallest value of an integer column in two scans (the classic
    histogram-bisection selection; Blum et al.'s selection problem done
    as dataflow). A global `orderBy` materializes a total order of
    10^10 rows to answer one number; this does:

      pass 1: histogram on `value div bin_width` (map-side combined,
              output = #occupied bins, data-independent small), then a
              cumulative window over the BIN DIMENSION (not the data)
              locates the bin holding rank k;
      pass 2: filter to that one bin (predicate-pushdown-friendly) and
              TakeOrdered the within-bin remainder.

    rank defaults to the lower median (n+1)//2. Returns one row
    (n, rank, value). Exact for any integer column; ties are benign
    (equal values are interchangeable at equal rank). For repeated
    quantiles at scale, amortize pass 1 across all ranks — the
    histogram serves every k.
    """
    vals = df.select(F.col(col).cast("long").alias("v"))
    n = vals.count()
    if n == 0:
        raise ValueError("exact_rank_select on empty input")
    k = rank if rank is not None else (n + 1) // 2
    if not 1 <= k <= n:
        raise ValueError(f"rank {k} out of 1..{n}")
    # floor division (Spark's `div` truncates toward zero, which would
    # fold negative values into bin 0)
    fd = (
        f"(v div {bin_width}) - (case when v % {bin_width} < 0 "
        "then 1 else 0 end)"
    )
    hist = vals.groupBy(F.expr(fd).alias("b")).agg(F.count("*").alias("c"))
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    located = (
        hist.withColumn("cum_before", F.coalesce(F.sum("c").over(wb), F.lit(0)))
        .filter(
            (F.col("cum_before") < k) & (F.col("cum_before") + F.col("c") >= k)
        )
        .select("b", "cum_before")
    )
    b_row = located.collect()[0]  # one row — the located bin
    within = vals.filter(F.expr(fd) == b_row.b)
    hit = within.orderBy("v").limit(k - b_row.cum_before)
    out = hit.agg(F.max("v").alias("value"))
    return out.select(
        F.lit(n).cast("long").alias("n"),
        F.lit(k).cast("long").alias("rank"),
        F.col("value").cast("long"),
    )


def bloom_semi_reduce(
    big: DataFrame,
    small: DataFrame,
    on: str,
    small_on: str | None = None,
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Runtime-filter (bloom) semi-join reduction — the pre-shuffle
    prune every distributed engine wants on a selective join: build a
    Bloom filter over the SMALL side's join keys (one distributed pass,
    per-partition bitmaps OR-reduced — driver traffic is bitmaps, not
    keys; operators/seen.build_bloom) and drop big-side rows the filter
    PROVES unmatched before they ever reach the exchange. False
    positives survive to the exact join (superset-safe); true matches
    are never dropped (no false negatives). When the join is selective,
    the shuffle moves the match fraction instead of the whole fact
    table — the same economics as the URL-seen gate, applied to any
    equi-join. Keys are xxhash64-hashed, so any key type works; the
    downstream join stays the exactness backstop for 64-bit collisions.

    Returns the reduced big side (same schema). Compose as
    ``bloom_semi_reduce(fact, dim, "key").join(dim, "key")``;
    ``small_on`` names the dim-side key when the columns differ
    (fact.l_partkey vs dim.p_partkey).
    """
    import pandas as pd

    from crawler_spark.operators.seen import NumpyBloom, build_bloom

    keys = small.select(
        F.xxhash64(F.col(small_on or on)).alias("url_hash")
    )
    bloom = build_bloom(keys, m_bits=m_bits, k=k)
    bc = big.sparkSession.sparkContext.broadcast(
        (bloom.m_bits, bloom.k, bloom.bits.tobytes())
    )

    # no type hints: skew.py uses postponed annotations, under which
    # string hints don't resolve for locally-imported pandas
    @F.pandas_udf("boolean")
    def might_match(h):
        import numpy as np

        m, kk, raw = bc.value
        bl = NumpyBloom(m, kk, bits=np.frombuffer(raw, dtype=np.uint8))
        return pd.Series(bl.contains_many(h.to_numpy(dtype=np.int64)))

    return big.filter(might_match(F.xxhash64(F.col(on))))
