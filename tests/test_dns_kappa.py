"""DNS TTL refresh planning and Cohen's-kappa gate agreement."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.assign import dns_refresh_plan
from crawler_spark.operators.evals import filter_agreement_kappa


def _hosts(spark, rows):
    return spark.createDataFrame(
        rows, "host string, ttl_s long, resolved_wave int"
    )


def test_dns_status_classification(spark):
    # wave 8, 600 s/wave: age = (8 - resolved) * 600
    rows = [
        ("a.test", 300, 7),    # age 600 >= 300        -> expired
        ("b.test", 1200, 7),   # age 600, next 1200    -> due_soon
        ("c.test", 86400, 0),  # age 4800, next 5400   -> fresh
        ("d.test", 4800, 0),   # age 4800 >= 4800      -> expired
        ("e.test", 5400, 0),   # age 4800, next 5400   -> due_soon
    ]
    out = dns_refresh_plan(
        _hosts(spark, rows), current_wave=8, wave_seconds=600, n_shards=4
    ).collect()
    by_status = {}
    for r in out:
        by_status.setdefault(r["status"], 0)
        by_status[r["status"]] += r["n_hosts"]
    assert by_status == {"expired": 2, "due_soon": 2, "fresh": 1}
    # fresh hosts carry no resolver shard
    assert all(
        (r["shard"] == -1) == (r["status"] == "fresh") for r in out
    )


def test_dns_shards_balance_and_cover(spark):
    rows = [(f"h{i}.test", 300, 0) for i in range(400)]  # all expired
    out = dns_refresh_plan(
        _hosts(spark, rows), current_wave=8, wave_seconds=600, n_shards=8
    ).collect()
    assert sum(r["n_hosts"] for r in out) == 400
    loads = [r["n_hosts"] for r in out]
    assert len(loads) == 8  # every resolver gets work
    assert max(loads) <= 2 * min(loads)  # hash balance, loose bound


def _dec(spark, rows):
    return spark.createDataFrame(rows, "g string, a boolean, b boolean")


def test_kappa_perfect_and_inverted(spark):
    perfect = [("p", x, x) for x in [True] * 5 + [False] * 5]
    inverted = [("i", x, not x) for x in [True] * 5 + [False] * 5]
    out = {
        r["g"]: r
        for r in filter_agreement_kappa(
            _dec(spark, perfect + inverted), "g", "a", "b"
        ).collect()
    }
    assert out["p"]["kappa6"] == pytest.approx(1.0, abs=1e-6)
    assert out["i"]["kappa6"] == pytest.approx(-1.0, abs=1e-6)


def test_kappa_chance_floor_beats_raw_agreement(spark):
    # both gates keep 9/10 independently: raw agreement is high, kappa
    # near 0 — the exact illusion the metric exists to kill. Build the
    # independent 2x2: n11=81, n10=9, n01=9, n00=1.
    rows = (
        [("g", True, True)] * 81
        + [("g", True, False)] * 9
        + [("g", False, True)] * 9
        + [("g", False, False)] * 1
    )
    r = filter_agreement_kappa(_dec(spark, rows), "g", "a", "b").collect()[0]
    assert r["p_o6"] == pytest.approx(0.82, abs=1e-6)
    assert abs(r["kappa6"]) < 1e-6  # independence -> exactly 0 here


def test_kappa_degenerate_constant_gates(spark):
    rows = [("g", True, True)] * 7  # p_e == 1: kappa defined as 0
    r = filter_agreement_kappa(_dec(spark, rows), "g", "a", "b").collect()[0]
    assert r["kappa6"] == 0.0 and r["p_o6"] == 1.0


def test_kappa_python_mirror(spark):
    import random

    rnd = random.Random(3)
    rows = [
        ("g", rnd.random() < 0.6, rnd.random() < 0.4) for _ in range(500)
    ]
    r = filter_agreement_kappa(_dec(spark, rows), "g", "a", "b").collect()[0]
    n = len(rows)
    n11 = sum(1 for _, a, b in rows if a and b)
    n10 = sum(1 for _, a, b in rows if a and not b)
    n01 = sum(1 for _, a, b in rows if not a and b)
    n00 = n - n11 - n10 - n01
    po = (n11 + n00) / n
    pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / (n * n)
    kappa = (po - pe) / (1 - pe)
    assert r["kappa6"] == pytest.approx(kappa, abs=2e-6)
