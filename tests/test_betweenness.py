"""Bounded-distance betweenness (operators/graph.py betweenness_bounded)
vs an exact sequential Brandes mirror with the same pinning."""

import math
from collections import defaultdict, deque

from crawler_spark.operators.graph import betweenness_bounded

# two hubs bridged by node 5: 0-4 star around 1; 6-9 star around 7;
# bridge path 1 -> 5 -> 7 (directed both ways for symmetric traffic)
EDGES = (
    [(1, x) for x in (0, 2, 3, 4)]
    + [(x, 1) for x in (0, 2, 3, 4)]
    + [(7, x) for x in (6, 8, 9)]
    + [(x, 7) for x in (6, 8, 9)]
    + [(1, 5), (5, 1), (5, 7), (7, 5)]
)


def _pin9(x):
    return math.floor(x * 1e9 + 0.5) / 1e9


def _mirror(edges, max_depth):
    adj = defaultdict(list)
    nodes = set()
    for u, v in set(edges):
        if u != v:
            adj[u].append(v)
        nodes.update((u, v))
    bc = defaultdict(float)
    for s in sorted(nodes):
        dist = {s: 0}
        sigma = {s: 1}
        order = []
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            if dist[u] == max_depth:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    sigma[v] = 0
                    q.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] += sigma[u]
        delta = defaultdict(float)
        # accumulate level by level, deepest first, pinning per level
        # exactly like the operator (terms pinned, per-node sums exact)
        for d in range(max_depth - 1, -1, -1):
            for v in [n for n in dist if dist[n] == d]:
                terms = [
                    _pin9(sigma[v] / sigma[w] * (1.0 + delta[w]))
                    for w in adj[v]
                    if dist.get(w) == d + 1
                ]
                delta[v] = round(sum(terms), 9)
                if v != s:
                    bc[v] += delta[v]
    return {
        n: math.floor(bc.get(n, 0.0) * 1e6 + 0.5) / 1e6 for n in nodes
    }


def _df(spark):
    return spark.createDataFrame(EDGES, "src long, dst long")


def test_betweenness_matches_mirror(spark):
    got = {
        r["node"]: r["betweenness"]
        for r in betweenness_bounded(_df(spark), max_depth=4).collect()
    }
    ref = _mirror(EDGES, 4)
    assert set(got) == set(ref)
    for n in ref:
        assert abs(got[n] - ref[n]) < 2e-6, (n, got[n], ref[n])


def test_bridge_scores_highest(spark):
    got = {
        r["node"]: r["betweenness"]
        for r in betweenness_bounded(_df(spark), max_depth=4).collect()
    }
    # the cut vertex 5 carries all cross-hub traffic: it must beat
    # every leaf; hubs 1 and 7 also rank above leaves
    leaves = [0, 2, 3, 4, 6, 8, 9]
    assert all(got[5] > got[x] for x in leaves)
    assert all(got[1] > got[x] for x in leaves)
    # leaves have zero brokerage
    assert all(got[x] == 0.0 for x in leaves)


def test_sampled_sources_subset(spark):
    # estimator path: only sources {1, 7} — deterministic, and the
    # bridge still dominates
    srcs = spark.createDataFrame([(1,), (7,)], "source long")
    got = {
        r["node"]: r["betweenness"]
        for r in betweenness_bounded(
            _df(spark), max_depth=4, sources=srcs
        ).collect()
    }
    assert got[5] > 0.0
    assert got[0] == 0.0
