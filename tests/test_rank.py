"""Link-rank frontier prior (operators/rank.py).

Checks the fixed-iteration PageRank against an independent pure-Python
replica of the same formula, and the structural properties a crawl
scheduler relies on (authority concentrates on heavily-linked hosts,
total mass bounded by 1).
"""

import pytest

from crawler_spark.operators.rank import link_rank


def _pure_python_rank(edges, n_iter=3, damping=0.85):
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = float(len(nodes))
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0.0) + float(w)
    ranks = {v: round(1.0 / n, 9) for v in nodes}
    for _ in range(n_iter):
        inflow = {}
        for s, d, w in edges:
            inflow[d] = inflow.get(d, 0.0) + ranks[s] * (float(w) / outw[s])
        ranks = {
            v: round((1.0 - damping) / n + damping * inflow.get(v, 0.0), 9)
            for v in nodes
        }
    return ranks


def test_link_rank_matches_pure_python(spark):
    edges = [
        (1, 2, 3),
        (1, 3, 1),
        (2, 3, 2),
        (3, 1, 1),
        (4, 3, 5),  # 4 is a pure source; 3 is the hub
    ]
    df = spark.createDataFrame(edges, "src long, dst long, weight long")
    got = {r.node: r.rank for r in link_rank(df, n_iter=3).collect()}
    want = _pure_python_rank(edges, n_iter=3)
    assert set(got) == set(want)
    for v in want:
        # 2e-9 tolerance: Spark rounds HALF_UP, Python HALF_EVEN
        assert got[v] == pytest.approx(want[v], abs=2e-9)
    # a pure source earns only teleport mass (0.15/4); total mass <= 1
    # (node 3's inflow leaks to the dangling drop)
    assert got[4] == min(got.values()) == pytest.approx(0.0375, abs=1e-9)
    assert sum(got.values()) <= 1.0 + 1e-6


def test_link_rank_uniform_cycle_stays_uniform(spark):
    # a weight-balanced cycle is the PageRank fixpoint: ranks stay 1/N
    edges = [(i, (i + 1) % 4, 1) for i in range(4)]
    df = spark.createDataFrame(edges, "src long, dst long, weight long")
    got = {r.node: r.rank for r in link_rank(df, n_iter=5).collect()}
    for v, r in got.items():
        assert r == pytest.approx(0.25, abs=1e-8), (v, r)


def _pure_python_opic(edges, n_iter=3):
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = float(len(nodes))
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0.0) + float(w)
    cash = {v: round(1.0 / n, 9) for v in nodes}
    hist = {v: 0.0 for v in nodes}
    for _ in range(n_iter):
        pot = sum(cash[v] for v in nodes if v not in outw)
        inflow = {}
        for s, d, w in edges:
            inflow[d] = inflow.get(d, 0.0) + cash[s] * (float(w) / outw[s])
        new_cash = {
            v: round(inflow.get(v, 0.0) + pot / n, 9) for v in nodes
        }
        hist = {v: round(hist[v] + cash[v], 9) for v in nodes}
        cash = new_cash
    return {
        v: round((hist[v] + cash[v]) / (n_iter + 1.0), 9) for v in nodes
    }


def test_opic_matches_pure_python(spark):
    from crawler_spark.operators.rank import opic_importance

    edges = [
        (1, 2, 3),
        (1, 3, 1),
        (2, 3, 2),
        (3, 1, 1),
        (4, 3, 5),  # 4 is dangling-free source; no dangling here
        (5, 1, 1),
        (2, 5, 1),  # 5 has an out-edge; make 6 dangling via 3->6
        (3, 6, 1),  # 6 never links out: dangling, pays the virtual page
    ]
    df = spark.createDataFrame(edges, "src long, dst long, weight long")
    got = {r.node: r.importance for r in opic_importance(df, n_iter=3).collect()}
    want = _pure_python_opic(edges, n_iter=3)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=5e-9), v
    # OPIC conserves mass: importance is a probability distribution
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_opic_uniform_cycle_stays_uniform(spark):
    from crawler_spark.operators.rank import opic_importance

    edges = [(i, (i + 1) % 4, 1) for i in range(4)]
    df = spark.createDataFrame(edges, "src long, dst long, weight long")
    got = {r.node: r.importance for r in opic_importance(df, n_iter=4).collect()}
    for v, r in got.items():
        assert r == pytest.approx(0.25, abs=1e-8), (v, r)


def test_opic_all_dangling_redistributes_uniformly(spark):
    from crawler_spark.operators.rank import opic_importance

    # star: 1 -> 2,3,4; 2/3/4 dangling. Their cash returns via the
    # virtual page every wave; everything stays strictly positive.
    edges = [(1, 2, 1), (1, 3, 1), (1, 4, 1)]
    df = spark.createDataFrame(edges, "src long, dst long, weight long")
    got = {r.node: r.importance for r in opic_importance(df, n_iter=3).collect()}
    want = _pure_python_opic(edges, n_iter=3)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=5e-9), v
    assert min(got.values()) > 0.0
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def _pure_python_trust(edges, seeds, n_iter=3, damping=0.85):
    def pin(x, k=9):
        import math

        sc = float(10**k)
        return math.floor(x * sc + 0.5) / sc

    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    seeds = [v for v in nodes if v in set(seeds)]
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0.0) + float(w)
    d0 = {v: (1.0 / len(seeds) if v in set(seeds) else 0.0) for v in nodes}
    trust = {v: pin(d0[v]) for v in nodes}
    for _ in range(n_iter):
        inflow = {}
        for s, d, w in edges:
            inflow[d] = inflow.get(d, 0.0) + trust[s] * (float(w) / outw[s])
        trust = {
            v: pin((1.0 - damping) * d0[v] + damping * inflow.get(v, 0.0))
            for v in nodes
        }
    return trust


def test_trust_rank_matches_pure_python(spark):
    from crawler_spark.operators.rank import trust_rank

    edges = [
        (1, 2, 3),
        (1, 3, 1),
        (2, 3, 2),
        (3, 1, 1),
        (4, 3, 5),  # 4 is an unvetted pure source
        (5, 4, 1),  # 5 -> 4: a chain no seed points at
    ]
    df = spark.createDataFrame(edges, "src long, dst long, weight long")
    seeds = spark.createDataFrame([(1,), (2,)], "node long")
    got = {r.node: r.trust for r in trust_rank(df, seeds, n_iter=3).collect()}
    want = _pure_python_trust(edges, [1, 2], n_iter=3)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=2e-9), v
    # trust only reaches nodes downstream of the seed set: 4 and 5 get
    # no teleport and no seed-reachable in-edges -> exactly zero
    assert got[4] == 0.0 and got[5] == 0.0
    # total trust never exceeds the injected teleport mass (<= 1)
    assert 0.0 < sum(got.values()) <= 1.0 + 1e-9


def test_trust_rank_starves_link_farm_that_pagerank_rewards(spark):
    from crawler_spark.operators.rank import link_rank, trust_rank

    # two seeds (0, 1) cross-linking, plus a 3-node farm (10,11,12)
    # densely boosting node 12; PageRank rewards 12, TrustRank starves it
    edges = [
        (0, 1, 1),
        (1, 0, 1),
        (10, 12, 5),
        (11, 12, 5),
        (12, 10, 1),
        (12, 11, 1),
    ]
    df = spark.createDataFrame(edges, "src long, dst long, weight long")
    seeds = spark.createDataFrame([(0,), (1,)], "node long")
    pr = {r.node: r.rank for r in link_rank(df, n_iter=3).collect()}
    tr = {r.node: r.trust for r in trust_rank(df, seeds, n_iter=3).collect()}
    assert pr[12] == max(pr.values())  # the farm wins raw PageRank
    assert tr[12] == 0.0  # but earns zero trust
    assert tr[0] > 0 and tr[1] > 0


def test_anchor_text_authority_beats_repetition(spark):
    """One low-authority source repeating an anchor many times must
    score below a few high-authority sources using a different term;
    missing-authority sources count zero; top-k per dst is stable."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.rank import anchor_text_index

    edges = spark.createDataFrame(
        [("spam", "t", "buy")] * 50
        + [("good1", "t", "news"), ("good2", "t", "news"), ("good3", "t", "news")]
        + [("ghost", "t", "junk")],  # no authority row -> weight 0
        "src string, dst string, term string",
    )
    auth = spark.createDataFrame(
        [("spam", 0.01), ("good1", 1.0), ("good2", 1.0), ("good3", 0.9)],
        "src string, auth double",
    )
    rows = {r["term"]: r for r in anchor_text_index(edges, auth, k=3).collect()}
    assert rows["news"]["rnk"] == 1 and rows["news"]["n_src"] == 3
    assert rows["buy"]["rnk"] == 2 and rows["buy"]["n_links"] == 50
    assert abs(rows["buy"]["score"] - 0.5) < 1e-9
    assert rows["junk"]["score"] == 0.0
