"""Sorted-neighborhood blocking (operators/dedup.py snm_candidate_pairs):
candidate set equals the brute-force rank-window enumeration, and the
distributed rank path (assign_dense_seq — range shuffle, NO
single-partition window) produces it at any partitioning.
"""

import pytest

from crawler_spark.operators.dedup import snm_candidate_pairs


@pytest.fixture(scope="module")
def keyed(spark):
    rows = [
        (i, k)
        for i, k in enumerate(
            [
                "apple pie recipe",
                "apple pie recipes",  # near-dup of above, adjacent sort
                "apple tart",
                "banana bread",
                "banana bread easy",
                "cherry cake",
                "cherry cake",  # exact dup key, distinct ids
                "zebra stripes",
            ]
        )
    ]
    return rows


def brute_pairs(rows, window):
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    out = set()
    for i, (ida, ka) in enumerate(ordered):
        for j in range(i + 1, min(i + window, len(ordered))):
            idb, kb = ordered[j]
            out.add((ida, idb, j - i))
    return out


@pytest.mark.parametrize("window", [2, 4])
def test_pairs_match_bruteforce(spark, keyed, window):
    for nparts in (1, 5):
        df = spark.createDataFrame(keyed, "doc_id long, k string").repartition(
            nparts
        )
        got = {
            (r["id_a"], r["id_b"], r["gap"])
            for r in snm_candidate_pairs(df, "k", "doc_id", window).collect()
        }
        assert got == brute_pairs(keyed, window)


def test_rank_order_is_key_then_id(spark, keyed):
    # the exact-dup keys must tie-break on id: (5,6) at gap 1, never (6,5)
    df = spark.createDataFrame(keyed, "doc_id long, k string")
    got = {
        (r["id_a"], r["id_b"])
        for r in snm_candidate_pairs(df, "k", "doc_id", 2).collect()
    }
    assert (5, 6) in got and (6, 5) not in got


def test_window_below_two_rejected(spark):
    """window=1 has no neighbor gaps; F.sequence(1, 0) would step -1 and
    emit gap-0 self-pairs, so the operator must refuse instead."""
    import pytest

    from crawler_spark.operators.dedup import snm_candidate_pairs

    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, i int")
    with pytest.raises(ValueError, match="window >= 2"):
        snm_candidate_pairs(df, "k", "i", window=1)


def test_fs_scores_match_hand_weights_and_decisions(spark):
    """Fellegi-Sunter weights equal the hand-computed log-likelihood
    ratios; the two-threshold rule assigns all three decisions; and an
    invalid m/u ordering is rejected."""
    import math

    import pytest

    from crawler_spark.operators.dedup import fs_match_scores

    pairs = spark.createDataFrame(
        [(1, 2, True, True), (1, 3, True, False), (1, 4, False, False)],
        "a long, b long, f1 boolean, f2 boolean",
    )
    fields = [("f1", 0.9, 0.1), ("f2", 0.8, 0.05)]
    out = {(r["a"], r["b"]): r for r in fs_match_scores(
        pairs, fields, upper=3.0, lower=0.0
    ).collect()}

    def p9(x):
        return math.floor(x * 1e9 + 0.5) / 1e9

    w1a, w1d = p9(math.log(9.0)), p9(math.log(0.1 / 0.9))
    w2a, w2d = p9(math.log(16.0)), p9(math.log(0.2 / 0.95))
    assert out[(1, 2)]["score"] == p9(w1a + w2a)
    assert out[(1, 2)]["decision"] == "match"
    assert out[(1, 3)]["score"] == p9(w1a + w2d)
    assert out[(1, 3)]["decision"] == "possible"
    assert out[(1, 4)]["decision"] == "non_match"
    with pytest.raises(ValueError, match="0 < u < m < 1"):
        fs_match_scores(pairs, [("f1", 0.1, 0.9)])
