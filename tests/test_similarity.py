"""Similarity search: brute-force exactness + IVF recall sanity."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.similarity import cosine_topk, ivf_topk, make_centroids

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _qvec(emb):
    return [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]


def test_cosine_topk_exact(emb):
    q = _qvec(emb)
    top = cosine_topk(emb, q, k=5).collect()
    assert len(top) == 5
    # query vector itself must rank first with cosine ~ 1
    assert top[0]["vec_id"] == 0 and abs(top[0]["cosine"] - 1.0) < 1e-5
    scores = [r["cosine"] for r in top]
    assert scores == sorted(scores, reverse=True)


def test_ivf_recall_vs_bruteforce(emb):
    q = _qvec(emb)
    exact = {r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()}
    # probing ALL cells must equal brute force (exhaustive IVF == exact)
    approx_all = {r["vec_id"] for r in ivf_topk(emb, q, k=10, n_cells=4, n_probe=4).collect()}
    assert approx_all == exact
    # probing fewer cells still finds most of the true top-k
    approx = {r["vec_id"] for r in ivf_topk(emb, q, k=10, n_cells=4, n_probe=2).collect()}
    assert len(approx & exact) >= 5


def test_centroids_shape(emb):
    c = make_centroids(emb, n_cells=4).collect()
    assert len(c) == 4
    dim = len(emb.first()["embedding"])
    assert all(len(r["centroid"]) == dim for r in c)


def test_ivf_kmeans_recall(emb):
    """Lloyd refinement (n_iter=2) must keep exhaustive-probe exactness
    and not degrade partial-probe recall below the unrefined seeding."""
    from crawler_spark.operators.similarity import kmeans_refine

    q = _qvec(emb)
    exact = {r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()}
    refined_all = {
        r["vec_id"]
        for r in ivf_topk(emb, q, k=10, n_cells=4, n_probe=4, n_iter=2).collect()
    }
    assert refined_all == exact  # probing every cell == brute force
    refined = {
        r["vec_id"]
        for r in ivf_topk(emb, q, k=10, n_cells=4, n_probe=2, n_iter=2).collect()
    }
    assert len(refined & exact) >= 5
    # refined centroids keep full dimension and <= n_cells cells
    c = kmeans_refine(emb, make_centroids(emb, n_cells=4), n_iter=2).collect()
    dim = len(emb.first()["embedding"])
    assert 0 < len(c) <= 4 and all(len(r["centroid"]) == dim for r in c)
