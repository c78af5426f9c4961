"""Suffix-array prefix doubling vs a direct Python suffix sort."""

import pytest

from crawler_spark.operators.suffix import (
    adjacent_lcp,
    repeated_substrings,
    suffix_array,
)

CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "pack my box with five dozen liquor jugs THE QUICK BROWN FOX"),
    (2, "the quick brown fox is a pangram staple"),
    (3, "zzz"),
    (4, ""),  # empty: contributes no suffixes
    (5, "ab"),  # shorter than the seed q-gram
    # identical short TAILS across docs: adjacent equal sub-cap heads,
    # whose lcp must clamp to the string length, not the cap
    (6, "first ends x"),
    (7, "second also ends x"),
]


def _py_suffixes(cap):
    out = []
    for did, txt in CORPUS:
        t = txt.lower()
        for pos in range(1, len(t) + 1):
            out.append((t[pos - 1 : pos - 1 + cap], did, pos))
    out.sort()
    return out


def _df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_suffix_array_matches_python_sort(spark):
    cap = 32
    sa = suffix_array(_df(spark), cap=cap).collect()
    got = {(r["doc_id"], r["pos"]): r["rank"] for r in sa}
    ref = _py_suffixes(cap)
    assert len(got) == len(ref)
    # rank order must agree with the python sort, with ties exactly
    # where capped heads are equal
    prev_head, prev_rank = None, None
    for head, did, pos in ref:
        rank = got[(did, pos)]
        if prev_head is not None:
            if head == prev_head:
                assert rank == prev_rank, f"tie broken at {head!r}"
            else:
                assert rank > prev_rank, f"order violated at {head!r}"
        prev_head, prev_rank = head, rank


def test_adjacent_lcp_exact(spark):
    cap = 16
    docs = _df(spark)
    sa = suffix_array(docs, cap=cap)
    rows = adjacent_lcp(docs, sa, cap=cap).collect()
    ref = _py_suffixes(cap)
    assert len(rows) == len(ref) - 1
    by_pair = {
        ((r["doc_a"], r["pos_a"]), (r["doc_b"], r["pos_b"])): r["lcp"]
        for r in rows
    }
    for (ha, da, pa), (hb, db, pb) in zip(ref, ref[1:]):
        lcp = 0
        while lcp < min(len(ha), len(hb)) and ha[lcp] == hb[lcp]:
            lcp += 1
        assert by_pair[((da, pa), (db, pb))] == lcp


def test_repeated_substrings_finds_cross_doc_repeat(spark):
    # "the quick brown fox" (19 chars) occurs in docs 0, 1 (uppercase
    # folds), 2 — three occurrences of every 12-gram inside it
    out = repeated_substrings(_df(spark), min_len=12, cap=16).collect()
    hits = {r["snippet"]: (r["n_occurrences"], r["n_docs"]) for r in out}
    assert hits["the quick br"] == (3, 3)
    assert hits["e quick brow"] == (3, 3)
    # python ground truth: every 12-gram's exact occurrence count
    grams = {}
    for did, txt in CORPUS:
        t = txt.lower()
        for i in range(len(t) - 11):
            grams.setdefault(t[i : i + 12], set()).add((did, i))
    for snip, (n_occ, n_docs) in hits.items():
        occ = grams[snip]
        assert n_occ == len(occ), snip
        assert n_docs == len({d for d, _ in occ}), snip
    # completeness: every 12-gram with >=2 occurrences is reported
    for g, occ in grams.items():
        if len(occ) >= 2:
            assert g in hits, g


def test_cap_validation(spark):
    with pytest.raises(ValueError):
        suffix_array(_df(spark), cap=24)  # not q * 2^j
    with pytest.raises(ValueError):
        repeated_substrings(_df(spark), min_len=40, cap=32)
