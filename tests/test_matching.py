"""Deterministic maximal matching (operators/graph.py maximal_matching):
matching validity, maximality, 1/2-approximation, mirror parity,
partitioning invariance."""

import hashlib

import pytest

from crawler_spark.operators.graph import maximal_matching

EDGES = [
    (1, 2), (2, 3), (3, 4), (4, 5), (5, 6),  # path
    (10, 11), (10, 12), (10, 13),            # star: at most one picked
    (20, 21),                                # isolated pair
]


def _prio(a, b):
    return hashlib.md5(f"{a}-{b}".encode()).hexdigest()


def _mirror(edges, max_rounds=8):
    alive = {(a, b): _prio(a, b) for a, b in edges if a != b}
    picked = []
    for rnd in range(1, max_rounds + 1):
        if not alive:
            break
        vmin = {}
        for (a, b), p in alive.items():
            for v in (a, b):
                vmin[v] = min(vmin.get(v, "~"), p)
        sel = [
            (a, b)
            for (a, b), p in alive.items()
            if vmin[a] == p and vmin[b] == p
        ]
        picked += [(a, b, rnd) for a, b in sel]
        matched = {v for ab in sel for v in ab}
        alive = {
            (a, b): p
            for (a, b), p in alive.items()
            if a not in matched and b not in matched
        }
    assert not alive
    return sorted(picked)


def _df(spark, edges=EDGES):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def test_matching_valid_maximal_and_mirror(spark):
    got = sorted(
        (r["doc_a"], r["doc_b"], r["round"])
        for r in maximal_matching(_df(spark)).collect()
    )
    assert got == _mirror(EDGES)
    # validity: no document appears twice
    seen = [v for a, b, _ in got for v in (a, b)]
    assert len(seen) == len(set(seen))
    # maximality: every input edge touches a matched endpoint
    matched = set(seen)
    for a, b in EDGES:
        assert a in matched or b in matched, (a, b)
    # 1/2-approximation: path(6)+star+pair has max matching 5
    assert len(got) >= 5 / 2


def test_matching_partitioning_invariant(spark):
    a = sorted(
        (r["doc_a"], r["doc_b"])
        for r in maximal_matching(_df(spark).repartition(7)).collect()
    )
    b = sorted(
        (r["doc_a"], r["doc_b"])
        for r in maximal_matching(_df(spark).repartition(2)).collect()
    )
    assert a == b


def test_matching_empty_input(spark):
    out = maximal_matching(
        spark.createDataFrame([], "doc_a long, doc_b long")
    ).collect()
    assert out == []


def test_matching_self_loops_dropped(spark):
    out = maximal_matching(_df(spark, [(7, 7), (1, 2)])).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in out] == [(1, 2)]
