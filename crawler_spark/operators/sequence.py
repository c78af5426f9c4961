"""Distributed order-preserving dense sequence assignment.

The DataFrame analog of ``RDD.zipWithIndex``: assign each row a dense
``offset + rank`` integer in the total order of ``order_cols`` WITHOUT a
single-partition global window (the classic ``Window.orderBy`` with no
partitionBy is a scale-killer — every row funnels through one task).

Shape (two jobs over one range shuffle):

  1. ``repartitionByRange(order_cols)`` + ``sortWithinPartitions`` —
     every partition holds a contiguous, sorted key range. Persisted
     (MEMORY_AND_DISK) so the partition layout is stable across the two
     jobs, exactly the contract RDD.zipWithIndex relies on.
  2. per-partition row counts -> driver (n_partitions ints, not rows) ->
     cumulative offsets broadcast back as a tiny dimension.
  3. within-partition ``row_number`` (parallel — partitioned window)
     plus the partition's offset.

This replaces the positional-radix encoding the crawl frontier used for
``discovery_seq`` (parent_seq * 4096 + sibling), which consumed 12 bits
per depth level and overflowed int64 at depth >= 6 with >= 8 seeds. A
dense counter is bounded by the number of URLs ever discovered, so it
fits int64 up to 9.2e18 discoveries — effectively forever at 10^10 scale.

Why this matches a sequential crawler: the reference appends newly
discovered work to its pending list in encounter order (reference:
src/crawler/crawler.py:1204-1334); a dense global discovery counter IS
that encounter order, computed as a batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_dense_seq(
    df: DataFrame,
    order_cols: list[str],
    seq_col: str,
    offset: int = 0,
    n_parts: int | None = None,
) -> tuple[DataFrame, int, DataFrame]:
    """Assign ``seq_col`` = offset + dense rank of the row in the total
    order of ``order_cols``.

    Returns ``(result_df, n_rows, persisted_handle)`` — the caller owns
    unpersisting the handle once the result has been consumed (the
    persist pins the range-partition layout; dropping it early would let
    a recompute re-sample range bounds between the count job and the
    window job).
    """
    spark = df.sparkSession
    if n_parts is None:
        n_parts = spark.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    ranged = (
        df.repartitionByRange(n_parts, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offs: list[tuple[int, int]] = []
    acc = offset
    for pid in sorted(counts):
        offs.append((int(pid), int(acc)))
        acc += int(counts[pid])
    n_rows = acc - offset
    off_df = spark.createDataFrame(offs or [], "_pid int, _poff long")
    w = Window.partitionBy("_pid").orderBy(*cols)
    out = (
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn(
            seq_col,
            (F.row_number().over(w) - F.lit(1) + F.col("_poff")).cast("long"),
        )
        .drop("_pid", "_poff")
    )
    return out, n_rows, ranged
