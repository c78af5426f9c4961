"""Pointer-doubling redirect resolution vs a sequential Python walk;
HITS hubs/authorities vs a dense numpy reference."""

import numpy as np
import pytest

from crawler_spark.operators.graph import hits_scores, resolve_redirects


def _walk(step: dict, src, max_hops: int):
    cur, hops = step[src], 1
    while cur in step and hops <= max_hops:
        cur, hops = step[cur], hops + 1
    if cur in step or hops > max_hops:
        return (None, None, False)
    return (cur, hops, True)


@pytest.mark.parametrize("max_hops", [8, 5])
def test_resolve_redirects_matches_sequential_walk(spark, max_hops):
    # chain 12 -> 11 -> ... -> 0 (length 12 from src 12: crosses any
    # budget < 12), a 2-cycle 100 <-> 101, an entry into it (99 -> 100),
    # and a 1-hop redirect onto a terminal (200 -> 201)
    step = {i: i - 1 for i in range(1, 13)}
    step.update({100: 101, 101: 100, 99: 100, 200: 201})
    edges = spark.createDataFrame(
        sorted(step.items()), "src long, dst long"
    )
    got = {
        r["src"]: (r["final"], r["n_hops"], r["resolved"])
        for r in resolve_redirects(edges, max_hops=max_hops).collect()
    }
    want = {s: _walk(step, s, max_hops) for s in step}
    assert got == want
    # explicit spot checks so a broken walk can't hide a broken test
    assert want[1] == (0, 1, True)
    assert want[100] == (None, None, False)
    assert want[99] == (None, None, False)
    if max_hops >= 12:
        assert want[12] == (0, 12, True)
    else:
        assert want[12] == (None, None, False)
    assert want[max_hops] == (0, max_hops, True)
    assert want[max_hops + 1] == (None, None, False)


def test_hits_matches_dense_numpy(spark):
    # tiny web: 0 and 1 are hubs pointing at authorities 2,3,4;
    # 2 also points at 3 (mixed role); 5 is an isolated-ish leaf target
    edges = [(0, 2), (0, 3), (0, 4), (1, 2), (1, 3), (2, 3), (4, 5)]
    nodes = sorted({x for e in edges for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s, d in edges:
        A[idx[s], idx[d]] = 1.0
    h = np.ones(len(nodes))
    for _ in range(3):
        a = A.T @ h
        a /= np.linalg.norm(a)
        h = A @ a
        h /= np.linalg.norm(h)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["authority"], r["hub"])
        for r in hits_scores(df, iters=3).collect()
    }
    assert set(got) == set(nodes)
    for n in nodes:
        assert got[n][0] == pytest.approx(a[idx[n]], abs=1e-12)
        assert got[n][1] == pytest.approx(h[idx[n]], abs=1e-12)
    # authorities ranked 3 > 2 > 4 > 5; hubs dominated by 0 then 1
    ranked = sorted(nodes, key=lambda n: -got[n][0])
    assert ranked[:3] == [3, 2, 4]
    assert got[0][1] > got[1][1] > got[2][1]


def test_resolve_redirects_log_join_count(spark):
    # the scale contract: every doubling round is checkpointed, so the
    # returned plan holds ONLY the terminal-check join — the build side
    # can never inline (and recompute) the prior rounds' subtree
    edges = spark.createDataFrame([(1, 0)], "src long, dst long")
    plan = (
        resolve_redirects(edges, max_hops=8)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("Join") == 1, plan


def _pure_python_lpa(edges, n_iter=3):
    und = {}
    for s, d, w in edges:
        und[(s, d)] = und.get((s, d), 0) + w
        und[(d, s)] = und.get((d, s), 0) + w
    nodes = sorted({s for s, _ in und})
    labels = {v: v for v in nodes}
    for _ in range(n_iter):
        new = {}
        for v in nodes:
            votes = {}
            for (s, d), w in und.items():
                if s == v:
                    lbl = labels[d]
                    votes[lbl] = votes.get(lbl, 0) + w
            new[v] = min(votes, key=lambda l: (-votes[l], l))
        labels = new
    return labels


def test_label_propagation_matches_pure_python(spark):
    from crawler_spark.operators.graph import label_propagation

    # barbell: two K4-ish dense clusters {0..3} and {10..13} joined by
    # one weak bridge 3-10. Connected components would merge them; LPA
    # must keep two communities.
    edges = []
    for grp in (range(0, 4), range(10, 14)):
        grp = list(grp)
        for i in grp:
            for j in grp:
                if i < j:
                    edges.append((i, j, 3))
    edges.append((3, 10, 1))  # the bridge
    df = spark.createDataFrame(edges, "src long, dst long, weight long")
    got = {r.node: r.community for r in label_propagation(df, n_iter=3).collect()}
    want = _pure_python_lpa(edges, n_iter=3)
    assert got == want
    left = {got[v] for v in range(0, 4)}
    right = {got[v] for v in range(10, 14)}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_label_propagation_weight_beats_degree(spark):
    from crawler_spark.operators.graph import label_propagation

    # node 5 has TWO unit edges into {1,2} (same label side after
    # round 1? no — distinct labels) and ONE weight-5 edge to 9:
    # max-incident-weight must pull 5 toward 9, not the popular side
    edges = [(1, 5, 1), (2, 5, 1), (5, 9, 5), (1, 2, 4)]
    df = spark.createDataFrame(edges, "src long, dst long, weight long")
    got = {r.node: r.community for r in label_propagation(df, n_iter=3).collect()}
    want = _pure_python_lpa(edges, n_iter=3)
    assert got == want


def _py_hyperball(edges, n_iter):
    """Pure-python HyperBall mirror: per-node HLL registers over exact
    synchronous ball growth, same md5/60-bit/rho recipe as
    operators/sketches.hll_registers and the integer-scaled raw
    estimator of hll_estimate."""
    import hashlib

    M, P = 256, 8
    alpha = 0.7213 / (1.0 + 1.079 / M)

    def reg(node):
        h = int(hashlib.md5(str(node).encode()).hexdigest()[:15], 16)
        idx, w = h % M, h >> P
        rho = 53 if w == 0 else (w & -w).bit_length()
        return idx, rho

    nodes = sorted({x for e in edges for x in e})
    regs = {v: dict([reg(v)]) for v in nodes}

    def est(r):
        import math

        denom = sum(1 << (53 - rho) for rho in r.values())
        denom += (M - len(r)) * (1 << 53)
        raw = alpha * M * M * 2.0**53 / denom
        if raw <= 2.5 * M and len(r) < M:  # linear-counting small range
            return round(float(M) * math.log(float(M) / (M - len(r))), 3)
        return round(raw, 3)

    out = {(v, 0): est(regs[v]) for v in nodes}
    for t in range(1, n_iter + 1):
        new = {}
        for v in nodes:
            merged = dict(regs[v])
            for s, d in edges:
                if s == v:
                    for idx, rho in regs[d].items():
                        if rho > merged.get(idx, 0):
                            merged[idx] = rho
            new[v] = merged
        regs = new
        for v in nodes:
            out[(v, t)] = est(regs[v])
    return out


def test_hyperball_matches_pure_python_registers(spark):
    from crawler_spark.operators.graph import hyperball_balls

    # two chains joined at a hub + a cycle: balls grow at different
    # rates per node so every round changes some estimate
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (5, 1), (6, 5),
             (7, 8), (8, 9), (9, 7), (4, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r.node, r.t): r.ball_est
        for r in hyperball_balls(df, n_iter=4).collect()
    }
    want = _py_hyperball(edges, n_iter=4)
    assert got == want
    # monotone in t for every node (registers only grow)
    for v in sorted({x for e in edges for x in e}):
        seq = [got[(v, t)] for t in range(5)]
        assert seq == sorted(seq)
    # chain head 6 reaches {6,5,1,2,3,4,0} by t=4: strictly more than
    # cycle node 7 (ball saturates at 3 nodes by t=2)
    assert got[(6, 4)] > got[(7, 4)]
    assert got[(7, 2)] == got[(7, 4)]


def test_harmonic_from_balls_matches_pure_python(spark):
    from crawler_spark.operators.graph import (
        harmonic_from_balls,
        hyperball_balls,
    )

    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (5, 1), (6, 5),
             (7, 8), (8, 9), (9, 7), (4, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    n_iter = 4
    got = {
        r.node: r.harmonic
        for r in harmonic_from_balls(
            hyperball_balls(df, n_iter=n_iter), n_iter=n_iter
        ).collect()
    }
    balls = _py_hyperball(edges, n_iter)
    import math

    lcm = math.lcm(*range(1, n_iter + 1))
    want = {}
    for v in sorted({x for e in edges for x in e}):
        sc = {t: round(balls[(v, t)] * 1000) for t in range(n_iter + 1)}
        num = sum((sc[t] - sc[t - 1]) * (lcm // t) for t in range(1, n_iter + 1))
        want[v] = round(num / (1000.0 * lcm), 6)
    assert got == want
    # every term is >= 0, so harmonic >= 0; the hub-chain head beats
    # the saturated 3-cycle members
    assert all(h >= 0 for h in got.values())
    assert got[6] > got[7]


def test_effective_diameter_matches_pure_python(spark):
    from crawler_spark.operators.graph import (
        effective_diameter,
        hyperball_balls,
    )

    # directed 6-cycle: balls grow by exactly one node per hop, so the
    # neighborhood function climbs linearly and the 90% crossing lands
    # strictly between two integer t values (real interpolation)
    edges = [(i, (i + 1) % 6) for i in range(6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    n_iter = 4
    got = effective_diameter(
        hyperball_balls(df, n_iter=n_iter), n_iter=n_iter, q_permille=900
    ).collect()
    assert len(got) == 1
    balls = _py_hyperball(edges, n_iter)
    nf = {
        t: sum(round(balls[(v, t)] * 1000) for v in range(6))
        for t in range(n_iter + 1)
    }
    t_hi = min(t for t in nf if 1000 * nf[t] >= 900 * nf[n_iter])
    want = round(
        (t_hi - 1) + (nf[n_iter] * 0.9 - nf[t_hi - 1]) / (nf[t_hi] - nf[t_hi - 1]),
        6,
    ) if t_hi else 0.0
    r = got[0]
    assert (r.t_lo, r.t_hi, r.eff_diameter) == (max(t_hi - 1, 0), t_hi, want)
    assert 0 < r.eff_diameter <= n_iter
    # interpolation is genuinely fractional here, not an integer hit
    assert r.eff_diameter != float(r.t_hi) and r.eff_diameter != float(r.t_lo)


def _py_bowtie(edges):
    """Pure-python bow-tie census: pivot = max degree (tie: min id)."""
    from collections import defaultdict

    es = {(a, b) for a, b in edges if a != b}
    nodes = {v for e in es for v in e}
    deg = defaultdict(int)
    for a, b in es:
        deg[a] += 1
        deg[b] += 1
    pivot = min(nodes, key=lambda v: (-deg[v], v))
    fwd_adj, bwd_adj = defaultdict(set), defaultdict(set)
    for a, b in es:
        fwd_adj[a].add(b)
        bwd_adj[b].add(a)

    def reach(adj):
        seen, stack = {pivot}, [pivot]
        while stack:
            v = stack.pop()
            for u in adj[v]:
                if u not in seen:
                    seen.add(u)
                    stack.append(u)
        return seen

    f, b = reach(fwd_adj), reach(bwd_adj)
    return {
        v: ("SCC" if v in f and v in b else "IN" if v in b
            else "OUT" if v in f else "OTHER")
        for v in nodes
    }


def test_bowtie_classes_matches_pure_python(spark):
    from crawler_spark.operators.graph import bowtie_classes

    # core 3-cycle + in-chain + out-chain + disjoint 2-cycle + a tendril
    # hanging off IN (classified OTHER: reaches IN but never the core
    # ... no — reaching IN reaches the core, so it's IN; the genuinely
    # OTHER tendril hangs off OUT)
    edges = [
        (0, 1), (1, 2), (2, 0),      # SCC (pivot has max degree here)
        (3, 0), (4, 3),              # IN chain
        (1, 5), (5, 6),              # OUT chain
        (7, 8), (8, 7),              # disjoint 2-cycle -> OTHER
        (6, 6),                      # self-loop dropped
        (9, 4),                      # tendril into IN -> IN
        (5, 5),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.cls for r in bowtie_classes(df, max_hops=8).collect()}
    want = _py_bowtie(edges)
    assert got == want
    assert want[0] == "SCC" and want[4] == "IN" and want[9] == "IN"
    assert want[6] == "OUT" and want[7] == "OTHER"


def test_bowtie_census_topology(spark):
    from crawler_spark.operators.graph import bowtie_classes

    # the shipped query's 32-host family: 8-ring core, 8 in, 8 out,
    # disjoint second ring
    edges = (
        [(i, (i + 1) % 8) for i in range(8)]
        + [(i + 8, i) for i in range(8)]
        + [(i, i + 16) for i in range(8)]
        + [(24 + i, 24 + (i + 1) % 8) for i in range(8)]
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.cls for r in bowtie_classes(df, max_hops=10).collect()}
    census = {}
    for cls in got.values():
        census[cls] = census.get(cls, 0) + 1
    assert census == {"SCC": 8, "IN": 8, "OUT": 8, "OTHER": 8}


def test_adjacency_gap_bits_exact(spark):
    from crawler_spark.operators.graph import adjacency_gap_bits

    # hand-checkable: node 5 -> [2, 7, 9]; first gap signed (2-5=-3 ->
    # nat 2*3-1=5, gamma(6)=2*2+1=5 bits), then 7-2-1=4 (gamma(5)=5),
    # 9-7-1=1 (gamma(2)=3). node 0 -> [1]: nat 2, gamma(3)=3.
    edges = [(5, 2), (5, 7), (5, 9), (0, 1), (0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.host_id: r for r in adjacency_gap_bits(df).collect()}
    # n_nodes = 6 distinct -> flat width = len(bin(5)) = 3 bits
    assert (got[5].deg, got[5].bits_gamma, got[5].bits_flat) == (3, 13, 9)
    assert (got[0].deg, got[0].bits_gamma, got[0].bits_flat) == (1, 3, 3)


def test_adjacency_gap_bits_beats_flat_on_clustered(spark):
    from crawler_spark.operators.graph import adjacency_gap_bits

    # consecutive successor runs (the locality BV exploits): gaps all 0
    # after the first -> gamma 1 bit each, far below the flat width
    edges = [(0, d) for d in range(1, 64)] + [(1, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = {x.host_id: x for x in adjacency_gap_bits(df).collect()}[0]
    assert r.deg == 63
    # first gap nat=2*1=2 -> gamma(3)=3 bits; 62 runs of gamma(1)=1
    assert r.bits_gamma == 3 + 62
    assert r.bits_flat == 63 * 6  # 64 nodes -> len(bin(63)) = 6
    assert r.bits_gamma < r.bits_flat / 5


def test_salsa_matches_dense_numpy(spark):
    from crawler_spark.operators.graph import salsa_scores

    # same tiny web as the HITS test, but under SALSA's degree-normalized
    # walk: each hub spreads 1/outdeg per out-edge, each authority
    # returns 1/indeg per in-edge, and both sides are L1-normalized
    edges = [(0, 2), (0, 3), (0, 4), (1, 2), (1, 3), (2, 3), (4, 5)]
    nodes = sorted({x for e in edges for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    od = {s: sum(1 for e in edges if e[0] == s) for s, _ in edges}
    indeg = {d: sum(1 for e in edges if e[1] == d) for _, d in edges}
    Wf = np.zeros((n, n))  # forward: hub u spreads h(u)/outdeg(u)
    Wb = np.zeros((n, n))  # backward: authority v returns a(v)/indeg(v)
    for s, d in edges:
        Wf[idx[s], idx[d]] = 1.0 / od[s]
        Wb[idx[s], idx[d]] = 1.0 / indeg[d]
    h = np.ones(n)
    for _ in range(3):
        a = Wf.T @ h
        a /= a.sum()
        h = Wb @ a
        h /= h.sum()
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["authority"], r["hub"])
        for r in salsa_scores(df, iters=3).collect()
    }
    assert set(got) == set(nodes)
    for m in nodes:
        assert got[m][0] == pytest.approx(a[idx[m]], abs=1e-12)
        assert got[m][1] == pytest.approx(h[idx[m]], abs=1e-12)
    # the scores are occupancy distributions: each side sums to 1
    assert sum(v[0] for v in got.values()) == pytest.approx(1.0)
    assert sum(v[1] for v in got.values()) == pytest.approx(1.0)
    # TKC resistance vs HITS: node 3 (indeg 3) still tops authorities,
    # but 4 and 2 (indeg 1 vs 2) stay proportionate, not crushed
    ranked = sorted(nodes, key=lambda m: -got[m][0])
    assert ranked[0] == 3
    assert got[2][0] > got[4][0] > 0


# ------------------------------------------ large-star / small-star CC


def _cc_truth(edges):
    """Union-find ground truth: node -> component minimum."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_cc_star_matches_min_propagation_and_truth(spark):
    from crawler_spark.operators.dedup import dedup_clusters
    from crawler_spark.operators.graph import cc_star

    rng = np.random.default_rng(7)
    n = 200
    edges = sorted(
        {
            (int(min(a, b)), int(max(a, b)))
            for a, b in rng.integers(0, n, size=(260, 2))
            if a != b
        }
    )
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    want = _cc_truth(edges)
    stats = {}
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in cc_star(pairs, stats=stats).collect()
    }
    assert got == want
    # interface parity with the min-propagation operator on the same input
    prop = {
        r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()
    }
    assert got == prop
    assert stats["rounds"] >= 1


def test_cc_star_long_chain_converges_in_log_rounds(spark):
    from crawler_spark.operators.graph import cc_star

    # a 64-hop duplicate chain: min-propagation needs 64 rounds (one hop
    # per round); star contraction must flatten it in O(log n)
    edges = [(i, i + 1) for i in range(64)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    stats = {}
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in cc_star(pairs, max_iter=10, stats=stats).collect()
    }
    assert got == {i: 0 for i in range(65)}
    assert stats["rounds"] <= 8, stats


def test_cc_star_disjoint_components_and_isolated_pair(spark):
    from crawler_spark.operators.graph import cc_star

    edges = [(10, 11), (11, 12), (30, 31), (50, 51), (51, 50)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["cluster_id"] for r in cc_star(pairs).collect()
    }
    assert got == {10: 10, 11: 10, 12: 10, 30: 30, 31: 30, 50: 50, 51: 50}


def test_dedup_clusters_star_dispatch(spark):
    from crawler_spark.operators.dedup import dedup_clusters

    edges = [(1, 2), (2, 3), (10, 11)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(pairs, algorithm="star").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup_clusters(pairs, algorithm="bogus")


def test_seed_attribution_matches_python_mirror(spark):
    """Attribution equals a sequential multi-source BFS mirror with the
    (hop, seed) first-wins tie rule on a graph where two seeds compete
    for the same component; unreached nodes are absent."""
    from crawler_spark.operators.graph import seed_attribution

    edges = [
        (0, 2), (2, 3), (3, 4),      # seed 0's chain
        (1, 4), (4, 5),              # seed 1 reaches 4 in one hop
        (1, 6), (6, 2),              # seed 1 also reaches 2 at hop 2 (loses)
        (8, 9),                      # disconnected
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (1,)], "node long")
    got = {
        r["node"]: (r["seed"], r["dist"])
        for r in seed_attribution(df, seeds, max_hops=8, directed=True).collect()
    }
    # sequential mirror
    from collections import deque

    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    attr = {0: (0, 0), 1: (1, 0)}
    frontier = {0: 0, 1: 1}
    hop = 0
    while frontier:
        hop += 1
        nxt = {}
        for node, seed in frontier.items():
            for b in adj.get(node, []):
                if b in attr:
                    continue
                nxt[b] = min(nxt.get(b, seed), seed)
        for b, seed in nxt.items():
            attr[b] = (seed, hop)
        frontier = nxt
    assert got == attr
    assert 8 not in got and 9 not in got
    assert got[2] == (0, 1)   # seed 0 wins node 2 (hop 1 beats hop 2)
    assert got[4] == (1, 1)   # seed 1 wins node 4 (hop 1 beats hop 3)


def test_densest_subgraph_peel_finds_planted_clique(spark):
    from crawler_spark.operators.graph import densest_subgraph_peel

    # sparse chain 0..19 plus a dense K6 clique on 100..105
    chain = [(i, i + 1) for i in range(19)]
    clique = [
        (100 + a, 100 + b) for a in range(6) for b in range(6) if a < b
    ]
    bridge = [(19, 100)]
    edges = spark.createDataFrame(
        chain + clique + bridge, "src long, dst long"
    )
    prof = densest_subgraph_peel(edges, max_rounds=8).collect()
    by_round = {r["round"]: r for r in prof}
    # round 0 is the full graph
    assert by_round[0]["n_nodes"] == 26 and by_round[0]["n_edges"] == 35
    best = [r for r in prof if r["is_best"]]
    assert len(best) == 1
    # the peel isolates the planted K6: density 15/6 = 2.5
    assert best[0]["n_nodes"] == 6
    assert best[0]["n_edges"] == 15
    assert best[0]["density6"] == 2.5
    # density profile is the 2(1+eps) guarantee witness: best >= true/2.5
    assert best[0]["density6"] >= 2.5 / 2.5


def test_cc_star_incremental_equals_full_recompute(spark):
    """incremental(labels(P1), P2) must equal cc_star(P1 ∪ P2) EXACTLY
    (labels are component minima, preserved by contraction)."""
    from crawler_spark.operators.graph import cc_star, cc_star_incremental

    # wave 1: clusters {1,2,3}, {10,11}, singleton via self-less pair
    p1 = [(1, 2), (2, 3), (10, 11), (20, 21)]
    # wave 2: merges {1..3} with {10,11} via 3-10; brand-new pair
    # (30,31); attaches 40 to the untouched cluster {20,21}
    p2 = [(3, 10), (30, 31), (21, 40)]
    df1 = spark.createDataFrame(p1, "doc_a long, doc_b long")
    df2 = spark.createDataFrame(p2, "doc_a long, doc_b long")
    labels1 = cc_star(df1)
    inc = {
        r["doc_id"]: r["cluster_id"]
        for r in cc_star_incremental(labels1, df2).collect()
    }
    full = {
        r["doc_id"]: r["cluster_id"]
        for r in cc_star(df1.unionByName(df2)).collect()
    }
    assert inc == full
    # semantic spot checks: the merge unified both old clusters at the
    # global min; untouched cluster kept its label; new docs clustered
    assert inc[11] == 1 and inc[1] == 1
    assert inc[20] == 20 and inc[40] == 20
    assert inc[30] == 30 and inc[31] == 30


def test_cc_star_incremental_no_new_edges_is_identity(spark):
    from crawler_spark.operators.graph import cc_star, cc_star_incremental

    df1 = spark.createDataFrame([(5, 6), (7, 8)], "doc_a long, doc_b long")
    labels1 = cc_star(df1)
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    inc = {
        r["doc_id"]: r["cluster_id"]
        for r in cc_star_incremental(labels1, empty).collect()
    }
    base = {r["doc_id"]: r["cluster_id"] for r in labels1.collect()}
    assert inc == base
