"""Temporal (time-respecting) BFS: earliest arrivals vs a Python
mirror, and the static-BFS-overstates-reachability case."""

from crawler_spark.operators.graph import temporal_bfs

# seed 0. Edge times: the 0->1->2 chain has INCREASING times (walkable);
# the 0->3->4 chain has DECREASING times (3 reachable, 4 is NOT: the
# 3->4 link appeared before 3 was discovered); 5 reachable two ways,
# the later-but-shorter journey must not hide the earlier arrival.
EDGES = [
    (0, 1, 1), (1, 2, 3),
    (0, 3, 5), (3, 4, 2),          # 4 blocked in time
    (0, 5, 4), (1, 5, 2),          # 5: via 1 at t=2 beats direct t=4
    (9, 2, 1),                     # edge from an unseeded component
]
SEEDS = [0]


def _mirror(edges, seeds, rounds):
    nodes = {n for e in edges for n in e[:2]} | set(seeds)
    arr = {n: (0 if n in seeds else None) for n in nodes}
    for _ in range(rounds):
        nxt = dict(arr)
        for u, v, t in edges:
            if arr[u] is not None and t >= arr[u]:
                if nxt[v] is None or t < nxt[v]:
                    nxt[v] = t
        arr = nxt
    return arr


def test_temporal_bfs_matches_mirror_and_blocks_time_travel(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long, t long")
    seeds = spark.createDataFrame([(s,) for s in SEEDS], "node long")
    got = {
        r["node"]: r["arrival"]
        for r in temporal_bfs(edges, seeds, rounds=4).collect()
    }
    assert got == _mirror(EDGES, SEEDS, 4)
    # the chain in time order works
    assert got[1] == 1 and got[2] == 3
    # 3 is reached at t=5; the 3->4 edge (t=2) predates that: blocked
    assert got[3] == 5 and got[4] is None
    # earliest journey wins even when a direct edge exists
    assert got[5] == 2
    # unseeded component never acquires an arrival
    assert got[9] is None
