"""Cho & Garcia-Molina refresh-budget allocation: greedy-by-marginals
optimality (exact brute-force comparison) and prefix-closure."""

import itertools

import pytest


def _objective(alloc, rates):
    # total scaled freshness: sum val*lam*2520*n/(n+1)
    return sum(
        v * lam * 2520 * n // (n + 1) for (lam, v), n in zip(rates, alloc)
    )


def _brute_best(rates, budget, f_max):
    best = -1
    n = len(rates)
    for alloc in itertools.product(range(f_max + 1), repeat=n):
        if sum(alloc) <= budget:
            best = max(best, _objective(alloc, rates))
    return best


@pytest.mark.parametrize("budget", [1, 5, 9, 24])
def test_refresh_allocation_is_optimal(spark, budget):
    from crawler_spark.operators.politeness import refresh_allocation

    # (lam, val) with deliberate ties and dominance inversions
    rates = [(7, 1), (3, 3), (12, 1), (1, 5), (7, 1)]
    hosts = spark.createDataFrame(
        [(f"h{i}", lam, v) for i, (lam, v) in enumerate(rates)],
        "host string, lam long, val long",
    )
    got = {
        r.host: (r.n_visits, r.freshness_gain_scaled)
        for r in refresh_allocation(hosts, budget=budget, f_max=6).collect()
    }
    alloc = [got.get(f"h{i}", (0, 0))[0] for i in range(len(rates))]
    # budget exhausted exactly (enough marginal rows exist)
    assert sum(alloc) == min(budget, 6 * len(rates))
    # greedy == exact optimum from full enumeration
    assert _objective(alloc, rates) == _brute_best(rates, budget, 6)
    # per-host gain is the telescoped prefix sum val*lam*2520*n/(n+1)
    for i, (lam, v) in enumerate(rates):
        n_vis, gain = got.get(f"h{i}", (0, 0))
        assert gain == v * lam * 2520 * n_vis // (n_vis + 1)


def test_refresh_allocation_deterministic_ties(spark):
    from crawler_spark.operators.politeness import refresh_allocation

    # identical hosts force tie-breaks: (gain desc, host asc, f asc)
    hosts = spark.createDataFrame(
        [("a", 4, 1), ("b", 4, 1), ("c", 4, 1)],
        "host string, lam long, val long",
    )
    got = {
        r.host: r.n_visits
        for r in refresh_allocation(hosts, budget=4, f_max=4).collect()
    }
    # f=1 marginals (3 ties -> a,b,c each granted), 4th grant is a's f=2
    assert got == {"a": 2, "b": 1, "c": 1}


def test_refresh_allocation_rejects_bad_fmax(spark):
    from crawler_spark.operators.politeness import refresh_allocation

    hosts = spark.createDataFrame(
        [("a", 1, 1)], "host string, lam long, val long"
    )
    with pytest.raises(ValueError):
        refresh_allocation(hosts, budget=1, f_max=11)


def test_refresh_requeue_closes_the_loop(spark, tmp_path):
    """allocation -> refresh_requeue -> next round refetches EXACTLY the
    per-host most-stale fetched rows the grants cover, as revisit rows;
    seen-gate keeps their outlinks from re-entering the frontier."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.politeness import refresh_allocation
    from crawler_spark.plans.rounds import (
        read_frontier,
        refresh_requeue,
        run_crawl,
        run_round,
    )
    from crawler_spark.sources.synth import T1_SMOKE

    catalog, history = run_crawl(
        spark, str(tmp_path / "refresh"), T1_SMOKE, round_seconds=8.0
    )
    n_results_before = catalog.read("results").count()
    frontier_rows = read_frontier(catalog).collect()
    assert all(r["status"] != "pending" for r in frontier_rows)

    # deterministic host value/rate dimension; budget 4 visits, <=2/host
    hosts = spark.createDataFrame(
        [("host-0.test", 3, 5), ("host-1.test", 2, 4), ("host-2.test", 1, 1)],
        "host string, lam int, val int",
    )
    alloc = refresh_allocation(hosts, budget=4, f_max=2)
    grants = {r["host"]: r["n_visits"] for r in alloc.collect()}
    assert sum(grants.values()) == 4

    # expected: per granted host, its n most-stale fetched rows
    expected = set()
    for host, n in grants.items():
        rows = sorted(
            (r for r in frontier_rows if r["host"] == host and r["status"] == "fetched"),
            key=lambda r: (r["round_id"], r["priority"], r["depth"],
                           r["discovery_seq"], r["url_hash"]),
        )[:n]
        expected |= {r["url_canon"] for r in rows}

    assert refresh_requeue(catalog, alloc) == len(expected)
    stats = run_round(catalog, T1_SMOKE, round_seconds=8.0)
    assert stats["scheduled"] == len(expected)
    last_round = catalog.read("schedule_log").agg(F.max("round_id")).first()[0]
    got = {
        r["url_canon"]
        for r in catalog.read("schedule_log")
        .filter(F.col("round_id") == last_round)
        .collect()
    }
    assert got == expected
    # refetches appended revisit result rows; no new frontier growth
    assert stats["new_links"] == 0
    n_results_after = catalog.read("results").count()
    leaf_expected = {
        u for u in expected if T1_SMOKE.is_leaf(u)
    }
    assert n_results_after == n_results_before + len(leaf_expected)
