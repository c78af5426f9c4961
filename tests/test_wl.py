"""Weisfeiler-Lehman color refinement (operators/graph.py wl_colors):
python-mirror parity and the structural-equivalence property."""

import hashlib

from crawler_spark.operators.graph import wl_colors

# a star (center 0, leaves 1..3), a 4-cycle (10-13), and a second
# identical star (center 20, leaves 21..23)
EDGES = (
    [(0, leaf) for leaf in (1, 2, 3)]
    + [(10, 11), (11, 12), (12, 13), (13, 10)]
    + [(20, leaf) for leaf in (21, 22, 23)]
)


def _mirror(edges, n_iter):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    c = {n: "0" for n in nodes}
    for _ in range(n_iter):
        nc = {}
        for n in nodes:
            ins = sorted(c[u] for u, v in edges if v == n)
            outs = sorted(c[v] for u, v in edges if u == n)
            s = "|".join([c[n], ",".join(ins), ",".join(outs)])
            nc[n] = hashlib.md5(s.encode()).hexdigest()
        c = nc
    return c


def _df(spark):
    return spark.createDataFrame(EDGES, "src long, dst long")


def test_wl_matches_python_mirror(spark):
    got = {
        r["node"]: (r["wl_color"], r["class_size"])
        for r in wl_colors(_df(spark), n_iter=3).collect()
    }
    ref = _mirror(EDGES, 3)
    assert set(got) == set(ref)
    from collections import Counter

    sizes = Counter(ref.values())
    for n, color in ref.items():
        assert got[n] == (color, sizes[color]), n


def test_wl_structural_classes(spark):
    got = {r["node"]: r["wl_color"] for r in wl_colors(_df(spark), 3).collect()}
    # the two star centers are structurally identical across components
    assert got[0] == got[20]
    # all six leaves share one class
    assert len({got[n] for n in (1, 2, 3, 21, 22, 23)}) == 1
    # cycle nodes are all alike but distinct from stars
    assert len({got[n] for n in (10, 11, 12, 13)}) == 1
    assert got[10] != got[0] and got[10] != got[1]
    # center vs leaf distinguished
    assert got[0] != got[1]
