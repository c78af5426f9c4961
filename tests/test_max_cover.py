"""Greedy max-coverage (operators/corpus.py greedy_max_cover):
python-mirror parity, the (1-1/e) guarantee vs brute-force OPT, and
deterministic tie-breaks."""

import itertools

from crawler_spark.operators.corpus import greedy_max_cover

SETS = {
    "s_big": {1, 2, 3, 4, 5, 6},
    "s_a": {1, 2, 7, 8},
    "s_b": {3, 4, 9, 10},
    "s_c": {5, 6, 7, 9},
    "s_d": {11, 12},
    "s_dup": {1, 2, 3},  # fully inside s_big after pick 1
}


def _mirror(sets, k):
    remaining = {s: set(v) for s, v in sets.items()}
    covered = set()
    out = []
    cum = 0
    for t in range(1, k + 1):
        gains = {s: len(v - covered) for s, v in remaining.items()}
        # deterministic: gain desc, set_id asc
        best_s = sorted(gains.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        s, g = best_s
        if g == 0:
            break
        covered |= sets[s]
        cum += g
        out.append((t, s, g, cum))
    return out


def _df(spark):
    rows = [(s, e) for s, v in SETS.items() for e in v]
    return spark.createDataFrame(rows, "set_id string, elem int")


def test_greedy_matches_mirror(spark):
    got = [
        (r["pick_order"], r["set_id"], r["marginal"], r["cumulative"])
        for r in greedy_max_cover(_df(spark), k=4, elem_col="elem")
        .orderBy("pick_order")
        .collect()
    ]
    assert got == _mirror(SETS, 4)
    # first pick is the biggest set; later marginals shrink (submodular)
    assert got[0][1] == "s_big" and got[0][2] == 6
    margs = [g for _, _, g, _ in got]
    assert margs == sorted(margs, reverse=True)


def test_guarantee_vs_bruteforce_opt(spark):
    k = 3
    got = (
        greedy_max_cover(_df(spark), k=k, elem_col="elem")
        .orderBy("pick_order")
        .collect()
    )
    greedy_cov = got[-1]["cumulative"]
    opt = max(
        len(set().union(*(SETS[s] for s in combo)))
        for combo in itertools.combinations(SETS, k)
    )
    assert greedy_cov >= (1 - 1 / 2.718281828459045) * opt
    assert greedy_cov <= opt


def test_exhaustion_stops_early(spark):
    rows = [("x", 1), ("y", 1)]
    df = spark.createDataFrame(rows, "set_id string, elem int")
    out = greedy_max_cover(df, k=5).collect()
    # after pick 1 covers elem 1, no set has positive marginal gain...
    # except 'y' still holds a row until the anti-join removes it —
    # the operator deletes covered ELEMENTS, so y's gain drops to 0
    # and coverage stops at one pick
    assert len(out) == 1
    assert out[0]["set_id"] == "x"  # tie on gain=1 broken by set_id asc
