"""Local mimic of the driver's CORRECTNESS gate: run every queries()[name]
on Spark and oracle_sql()[name] on DuckDB at the same sf, compare
row-count / column names / order-insensitive values.

Usage: python tools/driver_check.py [--tolerant] [sf_dir] [only_query ...]

Comparison is EXACT by default — the driver's gate hashes stringified
values, so a 1e-17 double drift or a DECIMAL-typed column fails there;
a tolerant local check would mask it (it did once: snm_blocking_pairs'
DECIMAL jaccard). --tolerant restores the 1e-9 epsilon for debugging
only.
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from crawler_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "datetime" in str(df[c].dtype):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def values_equal(
    a: pd.DataFrame, b: pd.DataFrame, tol: float = 0.0
) -> tuple[bool, str]:
    if list(a.columns) != list(b.columns):
        return False, f"cols {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return False, f"rows {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            af = av.astype(float)
            bf = bv.astype(float)
            ok = ((af == bf) | (abs(af - bf) <= tol) | (af.isna() & bf.isna())).all()
        except (ValueError, TypeError):
            ok = (av.astype(str) == bv.astype(str)).all()
        if not ok:
            bad = (av.astype(str) != bv.astype(str))
            i = bad[bad].index[0]
            return False, f"col {c} differs at row {i}: {av[i]!r} vs {bv[i]!r}"
    return True, ""


def main():
    argv = list(sys.argv[1:])
    tol = 0.0
    if "--tolerant" in argv:
        argv.remove("--tolerant")
        tol = 1e-9
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark(app="driver_check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only check, {len(sdf)} rows")
            if len(sdf) == 0:
                print(f"WARN {name}: zero rows")
            n_pass += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        ok, msg = values_equal(normalize(sdf), normalize(odf), tol)
        if ok:
            print(f"PASS {name}: {len(sdf)} rows")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
