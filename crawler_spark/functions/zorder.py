"""Z-order (Morton) clustering key for multi-dimension data skipping.

At 100 TB the scan you avoid is the one you win: parquet row-group
min/max pruning only skips on columns the file layout is clustered by.
Sorting by one column (say `w`) leaves every other filter column's
min/max spanning the full domain. Interleaving the bits of two columns
into one Morton key and range-partitioning/sorting by it keeps BOTH
columns' per-file ranges tight — the standard lakehouse Z-ORDER
(Delta OPTIMIZE ZORDER BY, Iceberg sort-order z-curve).

Built as a single native expression (a sum of shift-mask terms inside
whole-stage codegen — no UDF), with a DuckDB twin for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zvalue_sql(x: str, y: str, bits: int = 16) -> str:
    """Spark SQL expression interleaving the low `bits` bits of two
    non-negative integer expressions: x owns even bit positions, y odd.
    Values must fit in `bits` bits (callers clamp/scale first)."""
    terms = []
    for i in range(bits):
        terms.append(f"(shiftright({x}, {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(shiftright({y}, {i}) & 1) * {1 << (2 * i + 1)}")
    return "cast(" + " + ".join(terms) + " as bigint)"


def zvalue_duckdb_sql(x: str, y: str, bits: int = 16) -> str:
    """DuckDB twin of zvalue_sql (identical arithmetic, `>>` shifts)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({y} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zvalue(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    x_sql = x if isinstance(x, str) else x._jc.toString()
    y_sql = y if isinstance(y, str) else y._jc.toString()
    return F.expr(zvalue_sql(x_sql, y_sql, bits))


def zorder_layout(df, x: str, y: str, n_files: int, bits: int = 16):
    """Cluster df into n_files write splits by the Morton key of (x, y):
    repartitionByRange keeps key ranges disjoint per split (what makes
    min/max pruning effective), then an intra-partition sort tightens
    row-group stats within each file."""
    keyed = df.withColumn("_zkey", zvalue(x, y, bits))
    return (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )
