"""Skyline (Pareto frontier) operator: brute-force parity, the
algebraic partition-independence property, and fold parity for the
AIMD trajectory + grouped-HLL sketches added alongside it."""

import hashlib

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.skyline import skyline2d, skyline_py


def _points(n=400):
    """Deterministic pseudo-random points with planted duplicates and
    ties on each axis."""
    pts = []
    for i in range(n):
        h = hashlib.md5(f"sky:{i}".encode()).hexdigest()
        x = int(h[:4], 16) % 50
        y = int(h[4:8], 16) % 50
        pts.append((x, y))
    pts += pts[:25]  # exact duplicates
    pts.append((49, 49))  # a dominating corner exists in every run
    return pts


def _run(spark, pts, **kw):
    df = spark.createDataFrame(pts, "x long, y long")
    out = skyline2d(df, "x", "y", **kw)
    return {(r.x, r.y) for r in out.collect()}


def test_skyline_matches_bruteforce(spark):
    pts = _points()
    assert _run(spark, pts) == skyline_py(pts)


def test_skyline_partition_independent(spark):
    """skyline(A ∪ B) == skyline(skyline(A) ∪ skyline(B)): any bucket
    count — and any bucket EXPRESSION — yields the identical set."""
    pts = _points(200)
    base = _run(spark, pts)
    assert _run(spark, pts, n_buckets=1) == base
    assert _run(spark, pts, n_buckets=7) == base
    assert _run(spark, pts, bucket_expr="pmod(x + y, 5)") == base


def test_skyline_antichain_and_coverage(spark):
    """No skyline point dominates another, and every input point is
    dominated-or-equal by some skyline point."""
    pts = _points(150)
    sky = _run(spark, pts)
    for p in sky:
        for q in sky:
            assert not (
                q != p
                and q[0] >= p[0]
                and q[1] >= p[1]
                and (q[0] > p[0] or q[1] > p[1])
            )
    for p in set(pts):
        assert any(q[0] >= p[0] and q[1] >= p[1] for q in sky)


def test_skyline_degenerate(spark):
    # single point; all-identical points; a pure antichain (diagonal)
    assert _run(spark, [(3, 4)]) == {(3, 4)}
    assert _run(spark, [(2, 2)] * 5) == {(2, 2)}
    diag = [(i, 10 - i) for i in range(11)]
    assert _run(spark, diag) == set(diag)


# ---------------------------------------------------------------- AIMD

def _aimd_py(history, init=4, mx=64, mn=1):
    rate, inc, dec, peak = init, 0, 0, init
    for _, n_failed in sorted(history):
        if n_failed > 0:
            rate = max(mn, rate // 2)
            dec += 1
        else:
            rate = min(mx, rate + 1)
            inc += 1
            peak = max(peak, rate)
    return rate, inc, dec, peak


@pytest.mark.parametrize("pattern", ["alternating", "fail_burst", "clean"])
def test_aimd_trajectory_matches_python(spark, pattern):
    from crawler_spark.operators.politeness import aimd_trajectory

    rows = []
    hist = {}
    for hid in range(6):
        hist[hid] = []
        for r in range(1, 15):
            if pattern == "alternating":
                failed = 1 if (hid + r) % 3 == 0 else 0
            elif pattern == "fail_burst":
                failed = 1 if 5 <= r <= 9 else 0
            else:
                failed = 0
            rows.append((f"h{hid}", r, failed))
            hist[hid].append((r, failed))
    df = spark.createDataFrame(rows, "host string, round_id int, n_failed int")
    got = {
        r.host: (r.final_rate, r.n_increase, r.n_decrease, r.peak_rate)
        for r in aimd_trajectory(df).collect()
    }
    for hid in range(6):
        assert got[f"h{hid}"] == _aimd_py(hist[hid])


def test_aimd_clamps(spark):
    """Long clean run clamps at max_rate; long fail run floors at
    min_rate."""
    from crawler_spark.operators.politeness import aimd_trajectory

    rows = [("up", r, 0) for r in range(1, 200)] + [
        ("down", r, 1) for r in range(1, 200)
    ]
    df = spark.createDataFrame(rows, "host string, round_id int, n_failed int")
    got = {r.host: r for r in aimd_trajectory(df).collect()}
    assert got["up"].final_rate == 64 and got["up"].peak_rate == 64
    assert got["down"].final_rate == 1


# ---------------------------------------------------------- grouped HLL

def test_hll_grouped_equals_global_per_group(spark):
    """The grouped sketch of group g == the global sketch run on g's
    rows alone — per-group registers and estimates are independent."""
    from crawler_spark.operators.sketches import (
        hll_estimate,
        hll_estimate_by,
        hll_registers,
        hll_registers_by,
    )

    rows = [(f"g{i % 3}", f"key-{i % 40}-{i % 7}") for i in range(500)]
    df = spark.createDataFrame(rows, "g string, k string")
    grouped = {
        r.g: r.hll_estimate
        for r in hll_estimate_by(hll_registers_by(df, ["g"], "k"), ["g"]).collect()
    }
    for g in ("g0", "g1", "g2"):
        solo = hll_estimate(
            hll_registers(df.filter(F.col("g") == g), "k")
        ).first()[0]
        assert grouped[g] == solo
