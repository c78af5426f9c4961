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
