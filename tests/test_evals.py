"""Evaluation-layer operators: fairness math on planted distributions,
LSH dedup eval on planted duplicates, retrieval eval against a pure-
Python rank mirror."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.evals import (
    crossmodal_retrieval_eval,
    fairness_report,
    lsh_dedup_eval,
)


def test_fairness_even_and_skewed(spark):
    even = spark.createDataFrame(
        [(f"h{i}", 10) for i in range(4)], "host string, n long"
    )
    r = fairness_report(even, "host", "n").first()
    assert r["n_keys"] == 4 and r["total"] == 40
    assert r["jain_index"] == 1.0 and r["gini"] == 0.0
    assert r["top_share"] == 0.25

    skew = spark.createDataFrame(
        [("a", 97), ("b", 1), ("c", 1), ("d", 1)], "host string, n long"
    )
    r = fairness_report(skew, "host", "n").first()
    # jain = 100^2 / (4 * (97^2 + 3)) ; gini over ascending [1,1,1,97]
    assert r["jain_index"] == round(10000 / (4 * (97 * 97 + 3)), 6)
    assert r["gini"] == round((2 * (1 + 2 + 3 + 4 * 97) - 5 * 100) / 400, 6)
    assert r["top_share"] == 0.97


def test_lsh_dedup_eval_planted_duplicates(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, "totally different words here now ok"),
         (3, "another unrelated document text body four"),
         (4, base + " extra tail tokens appended onto it")],
        "doc_id long, text string",
    )
    r = lsh_dedup_eval(docs, threshold=0.9).first()
    # (0,1) is an exact duplicate: identical shingle sets -> identical
    # minhash signatures (predicted) AND jaccard 1.0 (truth)
    assert r["n_hit"] >= 1 and r["n_truth"] >= 1
    assert r["recall"] == 1.0  # exact dup can never be missed by minhash
    assert 0.0 < r["precision"] <= 1.0
    assert r["f1"] == round(
        2.0 * r["n_hit"] / (r["n_pred"] + r["n_truth"]), 6
    )


def _cap_vec(text: str) -> list[float]:
    h = hashlib.md5(text.encode()).hexdigest()
    return [int(c, 16) / 7.5 - 1.0 for c in h]


def test_retrieval_eval_matches_python_rank_mirror(spark):
    """Exact recall@k/MRR parity with a brute-force python mirror over
    the same caption-projection family (sample_mod=1: every image is a
    query)."""
    import numpy as np

    rng = np.random.RandomState(7)
    n = 24
    texts = [(i, f"caption number {i} about topic {i % 5}") for i in range(n)]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    embs = [(i, [float(x) for x in rng.randn(32)]) for i in range(n)]
    emb = spark.createDataFrame(embs, "vec_id long, embedding array<float>")

    out = crossmodal_retrieval_eval(docs, emb, sample_mod=1).first()

    caps = {i: _cap_vec(t) for i, t in texts}
    ranks = []
    for i, v in embs:
        iv = [float(x) for x in np.asarray(v, dtype=np.float32)][:32]

        def cos(a, b):
            dot = round(sum(x * y for x, y in zip(a, b)), 9)
            na = math.sqrt(round(sum(x * x for x in a), 9))
            nb = math.sqrt(round(sum(y * y for y in b), 9))
            return round(dot / (na * nb), 6)

        scored = sorted(
            ((cos(iv, cv), -c) for c, cv in caps.items()), reverse=True
        )
        ranks.append(1 + [(-c) for _, c in scored].index(i))
    assert out["n_queries"] == n
    assert out["recall_at_1"] == round(
        sum(r <= 1 for r in ranks) / n, 6
    )
    assert out["recall_at_5"] == round(sum(r <= 5 for r in ranks) / n, 6)
    assert out["mrr_at_10"] == round(
        sum(1.0 / r if r <= 10 else 0.0 for r in ranks) / n, 6
    )




def test_ann_recall_probe_all_cells_is_exact(spark):
    """Probing every cell degrades IVF to brute force: recall must be
    exactly 1.0 for every query; probing fewer cells can only lose."""
    import numpy as np

    from crawler_spark.operators.evals import ann_recall_eval

    rng = np.random.RandomState(13)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.randn(16)]) for i in range(120)],
        "vec_id long, embedding array<float>",
    )
    full = ann_recall_eval(emb, sample_mod=40, k=5, n_cells=4, n_probe=4)
    rows = full.collect()
    assert len(rows) == 3  # vec_id 0, 40, 80
    assert all(r["recall"] == 1.0 and r["n_hit"] == 5 for r in rows)

    part = ann_recall_eval(emb, sample_mod=40, k=5, n_cells=4, n_probe=1)
    assert all(r["recall"] <= 1.0 and r["n_hit"] >= 1 for r in part.collect())




def test_bpe_train_greedy_merges_hand_computed(spark):
    """3 BPE training iterations on a corpus small enough to hand-run:
    greedy argmax each round, lexicographic ties, and the shared
    literal-replace apply semantics (consecutive occurrences separated
    by a single space alternate-skip, same as bpe_apply)."""
    from crawler_spark.operators.corpus import bpe_train

    docs = spark.createDataFrame(
        [(0, "a b a b c"), (1, "a b c c")], "doc_id long, text string"
    )
    got = [
        (r["merge_rank"], r["a"], r["b"], r["n_pairs"])
        for r in bpe_train(docs, n_merges=3).orderBy("merge_rank").collect()
    ]
    # iter0: (a,b) x3 wins; apply merges doc0's FIRST occurrence only
    # (the replace scan consumes the shared space) and doc1's one.
    # iter1: all pairs tie at 1 -> lexicographic ('a','b') again.
    # iter2: (a_b,c) x2 wins.
    assert got == [
        (0, "a", "b", 3),
        (1, "a", "b", 1),
        (2, "a_b", "c", 2),
    ]




def test_bpe_train_matches_python_mirror_fuzz(spark):
    """Differential check: bpe_train's distributed greedy loop equals a
    pure-python mirror (collections.Counter + str.replace — the same
    left-to-right non-overlapping scan) on several small corpora."""
    from collections import Counter

    from crawler_spark.operators.corpus import bpe_train

    def mirror(texts, n_merges):
        import re

        strs = [" " + re.sub(r"\s+", " ", t.lower().strip()) + " " for t in texts]
        out = []
        for k in range(n_merges):
            c = Counter()
            for s in strs:
                toks = s.strip().split(" ")
                for i in range(len(toks) - 1):
                    c[(toks[i], toks[i + 1])] += 1
            (a, b), n = min(
                c.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            out.append((k, a, b, n))
            strs = [
                s.replace(f" {a} {b} ", f" {a}_{b} ") for s in strs
            ]
        return out

    vocab = ["aa", "bb", "cc", "dd"]
    corpora = [
        ["aa bb aa bb", "bb cc", "aa bb cc dd"],
        ["cc cc cc cc cc", "dd cc dd cc"],
        ["aa aa aa bb", "bb aa aa", "aa bb aa"],
        [" ".join(vocab[(i * 7 + j) % 4] for j in range(9)) for i in range(6)],
    ]
    for texts in corpora:
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = [
            (r["merge_rank"], r["a"], r["b"], r["n_pairs"])
            for r in bpe_train(docs, n_merges=3).orderBy("merge_rank").collect()
        ]
        assert got == mirror(texts, 3), f"corpus {texts}"


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))


def test_rrf_fusion_properties(spark):
    """RRF: a doc in BOTH lists outranks docs with one slightly-better
    single-list rank (the consensus property); scores are exact pinned
    sums of 1/(k+rank); ties break on id."""
    from crawler_spark.operators.evals import rrf_fuse

    rows = [
        # query 1: doc 10 is rank 3 in both lists; doc 20 is rank 1 in
        # one list only -> 2/(60+3) = 0.0317 > 1/61 = 0.0164
        (1, 10, 3), (1, 20, 1), (1, 30, 2),
        (1, 10, 3), (1, 40, 1),
    ]
    df = spark.createDataFrame(rows, "query_id long, doc_id long, rnk long")
    out = {r["doc_id"]: r for r in rrf_fuse(df, k_const=60, top_k=10).collect()}
    assert out[10]["n_lists"] == 2
    assert out[10]["fused_rank"] == 1  # consensus beats single-list head
    import math

    def p9(x):
        return math.floor(x * 1e9 + 0.5) / 1e9

    assert out[10]["rrf"] == p9(1 / 63) + p9(1 / 63)
    # ties: docs 20 and 40 both have 1/(60+1); lower id first
    assert out[20]["fused_rank"] < out[40]["fused_rank"]


def test_auc_exact_against_sklearn_free_mirror(spark):
    """AUC via midrank rank-sum == the direct pairwise definition
    (P[score_pos > score_neg] + 0.5 P[tie]), including ties."""
    from crawler_spark.operators.evals import auc_exact

    rows = [
        (0.9, 1), (0.8, 1), (0.8, 0), (0.7, 1), (0.5, 0),
        (0.5, 1), (0.5, 0), (0.3, 0), (0.2, 1), (0.1, 0),
    ]
    df = spark.createDataFrame(rows, "score double, label_bin int")
    out = auc_exact(df, "score", "label_bin").collect()[0]
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    num = sum(
        1.0 if p > q else (0.5 if p == q else 0.0) for p in pos for q in neg
    )
    expect = num / (len(pos) * len(neg))
    import math

    assert out["n_pos"] == len(pos) and out["n_neg"] == len(neg)
    assert out["auc6"] == math.floor(expect * 1e6 + 0.5) / 1e6
    # degenerate sanity: perfect ranking -> 1.0, inverted -> 0.0
    perfect = spark.createDataFrame(
        [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)], "score double, label_bin int"
    )
    assert auc_exact(perfect, "score", "label_bin").collect()[0]["auc6"] == 1.0
    inverted = spark.createDataFrame(
        [(0.1, 1), (0.9, 0)], "score double, label_bin int"
    )
    assert auc_exact(inverted, "score", "label_bin").collect()[0]["auc6"] == 0.0
