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


# ---------------------------------------------------------------------------
# Hilbert curve: the locality upgrade over the Morton key above. Z-order
# takes O(sqrt(area)) "seam jumps" where consecutive keys are far apart
# in (x, y); the Hilbert curve is CONTINUOUS (consecutive keys are
# always grid neighbors), so range-partitioned files get strictly
# tighter per-file bounding boxes on both dimensions — fewer row groups
# survive min/max pruning for the same box filter.
#
# Implemented as the standard 4-state quadrant automaton: at each bit
# level the raw top bits (bx, by) index a digit LUT and a next-state
# LUT, where the state is the dihedral transform the recursion has
# composed so far. The LUTs are DERIVED at import time from the
# textbook rot()-based recursion (not hand-copied), and the whole key
# is ONE native aggregate() fold over bit levels — a runtime loop, so
# the expression tree stays linear in `bits` (a naive unrolled
# coordinate-mutating expression triples per level and blows up
# Catalyst analysis past ~8 bits).
# ---------------------------------------------------------------------------


def _derive_hilbert_luts() -> tuple[list[int], list[int]]:
    """Digit + next-state tables for the Hilbert quadrant automaton,
    derived from the classic recursion: state = the dihedral transform
    (swap, flip-x, flip-y) accumulated by rot(); effective quadrant
    bits = state applied to raw bits; digit = (3*ex) ^ ey; next state
    composes rot(ex, ey) onto the current transform."""
    import itertools

    def apply(e, b):
        sw, fx, fy = e
        x, y = b[0] ^ fx, b[1] ^ fy
        return (y, x) if sw else (x, y)

    corners = [(0, 0), (0, 1), (1, 0), (1, 1)]

    def compose(e2, e1):
        for cand in itertools.product((0, 1), (0, 1), (0, 1)):
            if all(apply(cand, b) == apply(e2, apply(e1, b)) for b in corners):
                return cand
        raise AssertionError("dihedral composition not closed")

    def rot_elem(ex, ey):
        if ey == 1:
            return (0, 0, 0)  # identity
        if ex == 0:
            return (1, 0, 0)  # swap
        return (1, 1, 1)  # reflect both then swap

    states = {(0, 0, 0): 0}
    order = [(0, 0, 0)]
    digits: list[int] = []
    nexts: list[int] = []
    i = 0
    while i < len(order):
        e = order[i]
        for bx, by in ((0, 0), (0, 1), (1, 0), (1, 1)):
            ex, ey = apply(e, (bx, by))
            digits.append((3 * ex) ^ ey)
            nxt = compose(rot_elem(ex, ey), e)
            if nxt not in states:
                states[nxt] = len(order)
                order.append(nxt)
            nexts.append(states[nxt])
        i += 1
    # table rows are indexed state*4 + bx*2 + by; pad is impossible —
    # the automaton closes over exactly the reachable states
    return digits, nexts


_H_DIGITS, _H_NEXTS = _derive_hilbert_luts()


def hvalue_sql(x: str, y: str, bits: int = 16) -> str:
    """Spark SQL expression for the Hilbert index of two non-negative
    integer expressions over a 2^bits x 2^bits grid (values must fit in
    `bits` bits; callers clamp/scale first). One aggregate() fold —
    state and key carried in a struct, LUTs as literal arrays."""
    d_arr = ", ".join(str(v) for v in _H_DIGITS)
    s_arr = ", ".join(str(v) for v in _H_NEXTS)
    q = f"(shiftright({x}, k) & 1) * 2 + (shiftright({y}, k) & 1)"
    return (
        f"aggregate(sequence({bits - 1}, 0, -1), "
        "named_struct('st', 0, 'd', cast(0 as bigint)), "
        "(acc, k) -> named_struct("
        f"'st', element_at(array({s_arr}), acc.st * 4 + {q} + 1), "
        f"'d', acc.d * 4 + cast(element_at(array({d_arr}), "
        f"acc.st * 4 + {q} + 1) as bigint)), "
        "acc -> acc.d)"
    )


def hvalue(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    x_sql = x if isinstance(x, str) else x._jc.toString()
    y_sql = y if isinstance(y, str) else y._jc.toString()
    return F.expr(hvalue_sql(x_sql, y_sql, bits))


def hvalue_duckdb_ctes(
    from_cte: str, x: str, y: str, bits: int = 16, out: str = "hkey"
) -> str:
    """DuckDB twin of hvalue_sql as an unrolled CTE chain (DuckDB's
    list_reduce carries no loop index, so the fold unrolls — linear in
    bits, same integer arithmetic). Emits CTEs `_hb0.._hb{bits}`; the
    final one exposes every `from_cte` column plus `{out}`."""
    d_arr = "list_value(" + ", ".join(str(v) for v in _H_DIGITS) + ")"
    s_arr = "list_value(" + ", ".join(str(v) for v in _H_NEXTS) + ")"
    parts = [f"_hb0 AS (SELECT *, 0 AS _st0, CAST(0 AS BIGINT) AS _d0 FROM {from_cte})"]
    for i in range(1, bits + 1):
        k = bits - i
        q = f"(({x} >> {k}) & 1) * 2 + (({y} >> {k}) & 1)"
        parts.append(
            f"_hb{i} AS (SELECT *, "
            f"{s_arr}[_st{i - 1} * 4 + {q} + 1] AS _st{i}, "
            f"_d{i - 1} * 4 + CAST({d_arr}[_st{i - 1} * 4 + {q} + 1] AS BIGINT)"
            f" AS _d{i} FROM _hb{i - 1})"
        )
    cols = f"* EXCLUDE ({', '.join(f'_st{j}' for j in range(bits + 1))}, " + ", ".join(
        f"_d{j}" for j in range(bits + 1)
    ) + ")"
    parts.append(
        f"_hbout AS (SELECT {cols}, _d{bits} AS {out} FROM _hb{bits})"
    )
    return ",\n".join(parts)


def hilbert_layout(df, x: str, y: str, n_files: int, bits: int = 16):
    """zorder_layout's twin on the Hilbert key: range-partition into
    n_files write splits + intra-partition sort, tight per-file boxes
    on both dimensions with no Morton seam jumps."""
    keyed = df.withColumn("_hkey", hvalue(x, y, bits))
    return (
        keyed.repartitionByRange(n_files, "_hkey")
        .sortWithinPartitions("_hkey")
        .drop("_hkey")
    )
