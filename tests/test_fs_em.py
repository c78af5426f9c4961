"""EM fitting of Fellegi-Sunter m/u (operators/dedup.py fs_em_fit)
vs an exact sequential Python mirror, plus the separation property:
on a corpus with a clear dup cluster, fitted m rises above u."""

import math

import pytest

from crawler_spark.operators.dedup import fs_em_fit


def _pin9(x):
    return math.floor(x * 1e9 + 0.5) / 1e9


def _mirror(patterns, f, n_iter=3, p0=0.2, m0=0.8, u0=0.2):
    """patterns: list of (gamma_tuple, n)."""
    p = p0
    m = [m0] * f
    u = [u0] * f
    nn = sum(n for _, n in patterns)
    for _ in range(n_iter):
        s_w = s_nw = 0
        s_w_g = [0] * f
        s_nw_g = [0] * f
        for g, n in patterns:
            pm = 1.0
            pu = 1.0
            for j in range(f):
                pm *= m[j] if g[j] else 1.0 - m[j]
                pu *= u[j] if g[j] else 1.0 - u[j]
            w9 = math.floor(p * pm / (p * pm + (1.0 - p) * pu) * 1e9 + 0.5)
            s_w += n * w9
            s_nw += n * (1_000_000_000 - w9)
            for j in range(f):
                if g[j]:
                    s_w_g[j] += n * w9
                    s_nw_g[j] += n * (1_000_000_000 - w9)
        p = _pin9(s_w / (nn * 1e9))
        m = [_pin9(s_w_g[j] / s_w) for j in range(f)]
        u = [_pin9(s_nw_g[j] / s_nw) for j in range(f)]
    return p, m, u


# a mixture: ~20% of pairs are "matches" (agree on most fields)
PATTERNS = [
    ((True, True, True), 180),
    ((True, True, False), 30),
    ((True, False, True), 25),
    ((False, True, True), 20),
    ((True, False, False), 150),
    ((False, True, False), 160),
    ((False, False, True), 140),
    ((False, False, False), 300),
]


def _pairs_df(spark):
    rows = []
    i = 0
    for g, n in PATTERNS:
        for _ in range(n):
            rows.append((i, *g))
            i += 1
    return spark.createDataFrame(
        rows, "pair_id long, g0 boolean, g1 boolean, g2 boolean"
    )


def test_em_matches_python_mirror(spark):
    got = {
        r["field"]: (r["m"], r["u"], r["p"])
        for r in fs_em_fit(_pairs_df(spark), ["g0", "g1", "g2"]).collect()
    }
    p, m, u = _mirror(PATTERNS, 3)
    for j, col in enumerate(["g0", "g1", "g2"]):
        assert got[col] == (m[j], u[j], p), col


def test_em_separates_m_above_u(spark):
    out = fs_em_fit(_pairs_df(spark), ["g0", "g1", "g2"], n_iter=5).collect()
    for r in out:
        # the mixture has real structure: the match class must end up
        # with higher per-field agreement than the non-match class
        assert r["m"] > r["u"], r["field"]
        assert 0.0 < r["p"] < 1.0


def test_em_field_count_validated(spark):
    df = _pairs_df(spark)
    with pytest.raises(ValueError):
        fs_em_fit(df, [])
