"""SCC decomposition: Tarjan-mirror parity, planted structures, and
the trim/coloring paths each exercised."""

import hashlib

from crawler_spark.operators.graph import scc_decompose


def _tarjan(edges):
    """Reference SCC (iterative Tarjan); returns {node: min-id of SCC}."""
    adj = {}
    nodes = set()
    for a, b in edges:
        nodes.update((a, b))
        adj.setdefault(a, []).append(b)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    out = {}
    counter = [0]

    def strongconnect(v0):
        work = [(v0, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            for i in range(pi, len(adj.get(v, []))):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            work.pop()
            if work:
                p, _ = work[-1]
                low[p] = min(low[p], low[v])

    for v in sorted(nodes):
        if v not in index:
            strongconnect(v)
    return out


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r.node: r.scc_id for r in scc_decompose(df, **kw).collect()
    }


def test_scc_planted_structures(spark):
    """Two cycles joined by a one-way bridge, a chain tendril, and a
    self-loop: the cycles stay separate SCCs, everything acyclic is a
    singleton."""
    c1 = [(0, 1), (1, 2), (2, 0)]           # SCC {0,1,2}
    c2 = [(10, 11), (11, 12), (12, 13), (13, 10)]  # SCC {10..13}
    bridge = [(2, 10)]                       # one-way: no merge
    chain = [(20, 21), (21, 22)]             # singletons (trim path)
    loop = [(30, 30)]                        # self-loop singleton
    got = _run(spark, c1 + c2 + bridge + chain + loop)
    assert got == _tarjan(c1 + c2 + bridge + chain + loop)
    assert got[0] == got[1] == got[2] == 0
    assert got[10] == got[11] == got[12] == got[13] == 10
    assert len({got[20], got[21], got[22]}) == 3
    assert got[30] == 30


def test_scc_matches_tarjan_on_hashed_graph(spark):
    """Deterministic pseudo-random digraph (32 nodes, ~64 edges):
    bit-for-bit agreement with the sequential Tarjan reference."""
    edges = []
    for i in range(64):
        h = hashlib.md5(f"scc:{i}".encode()).hexdigest()
        edges.append((int(h[:2], 16) % 32, int(h[2:4], 16) % 32))
    edges = sorted(set(edges))
    assert _run(spark, edges) == _tarjan(edges)


def test_scc_nested_sccs_behind_dag(spark):
    """An SCC reachable only THROUGH another SCC (forces a second
    coloring round: the upstream component's color floods the
    downstream one, which must wait for round 2)."""
    up = [(0, 1), (1, 0)]        # SCC {0,1}
    mid = [(1, 5)]               # dag edge into...
    down = [(5, 6), (6, 7), (7, 5)]  # SCC {5,6,7} colored 0 in round 1
    edges = up + mid + down
    got = _run(spark, edges)
    assert got == _tarjan(edges)
    assert got[5] == got[6] == got[7] == 5
    assert got[0] == got[1] == 0
