"""The repo's numeric-determinism primitives, in ONE place.

The load-bearing rule: cross-engine floats are pinned to a decimal grid
with floor(x * 10^d + 0.5) / 10^d — never round(), whose half-boundary
mode differs between engines, and never a bare float sum, whose
association order differs between partial-aggregation plans. Every
operator that feeds the exact oracle gate uses these helpers (or bakes
pinned Python literals into both plans); a change here is a change to
the determinism contract documented in SCALE.md.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def pin9(c: Column) -> Column:
    """Pin a double Column to the 1e-9 grid (floor rule)."""
    return F.floor(c * F.lit(1e9) + F.lit(0.5)).cast("double") / F.lit(1e9)


def pin6(c: Column) -> Column:
    """Pin a double Column to the 1e-6 grid (floor rule) — the display
    precision the oracle gate hashes."""
    return F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("double") / F.lit(1e6)


def pin9f(x: float) -> float:
    """Python-side twin of pin9 — for literals baked into both engines'
    plans and for sequential mirrors in stateful operators."""
    return math.floor(x * 1e9 + 0.5) / 1e9
