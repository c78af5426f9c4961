"""Pointer-doubling redirect resolution vs a sequential Python walk."""

import pytest

from crawler_spark.operators.graph import resolve_redirects


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
