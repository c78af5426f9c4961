"""Winnowing fingerprints (Schleimer et al. SIGMOD 2003) and BFS seed
distance — property tests against pure-Python mirrors.

The paper's two guarantees are tested directly:
  1. any shared token run of length >= w + k - 1 yields a shared
     selected fingerprint (detection guarantee), and
  2. selection density trends toward 2/(w+1) on random text.
"""

import hashlib

from pyspark.sql import functions as F

from crawler_spark.operators.dedup import winnow_fingerprints, winnow_overlap_pairs
from crawler_spark.operators.graph import bfs_distances

K, W = 4, 4


def _py_winnow(text: str, k: int = K, w: int = W) -> set[tuple[str, int]]:
    """Reference winnowing: min hash per window, ties -> rightmost."""
    ws = text.strip().lower().split()
    grams = [
        hashlib.md5(" ".join(ws[i : i + k]).encode()).hexdigest()
        for i in range(len(ws) - k + 1)
    ]
    out: set[tuple[str, int]] = set()
    for j in range(len(grams) - w + 1):
        win = grams[j : j + w]
        mn = min(win)
        # rightmost occurrence of the min within the window
        pos = j + max(i for i, g in enumerate(win) if g == mn)
        out.add((mn, pos))
    return out


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "a completely different document about spark shuffles and joins"),
    # shares an exact 7-token run (w + k - 1 = 7) with doc 0:
    (2, "prefix words here quick brown fox jumps over the lazy suffix tail"),
    (3, "the quick brown fox jumps over the lazy dog near the river bank"),
    (4, "short doc"),  # < k tokens: no grams at all
    (5, "one two three four five six"),  # 3 grams < w: no full window
]


def test_winnow_matches_python_mirror(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r["doc_id"], r["fp"], r["fp_pos"])
        for r in winnow_fingerprints(df, k=K, w=W).collect()
    }
    want = {
        (i, fp, pos)
        for i, text in DOCS
        for fp, pos in _py_winnow(text)
    }
    assert got == want


def test_winnow_detection_guarantee_and_noise_floor(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in winnow_overlap_pairs(df, k=K, w=W).collect()
    }
    # guarantee: docs 0 and 2 share a >= w+k-1 = 7-token run -> detected
    assert (0, 2) in pairs
    # identical docs share everything
    assert (0, 3) in pairs and pairs[(0, 3)] >= pairs[(0, 2)]
    # unrelated docs share nothing
    assert (0, 1) not in pairs and (1, 2) not in pairs
    # docs with no full window emit no fingerprints at all
    fps = winnow_fingerprints(df, k=K, w=W)
    assert fps.filter(F.col("doc_id").isin(4, 5)).count() == 0


def test_winnow_density_near_theoretical(spark):
    # random-ish text via hash-derived tokens: density -> 2/(w+1) = 0.4
    rows = [
        (
            i,
            " ".join(
                hashlib.md5(f"{i}-{j}".encode()).hexdigest()[:6]
                for j in range(300)
            ),
        )
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    agg = (
        winnow_fingerprints(df, k=K, w=W)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_fps"), F.any_value("n_grams").alias("n_grams"))
        .collect()
    )
    for r in agg:
        density = r["n_fps"] / (r["n_grams"] - W + 1)
        assert 0.3 < density < 0.5, density


def _py_bfs(edges, seeds, max_hops):
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        nxt = set()
        for n in frontier:
            for m in adj.get(n, ()):
                if m not in dist:
                    dist[m] = h
                    nxt.add(m)
        if not nxt:
            break
        frontier = nxt
    return dist


def test_bfs_distances_matches_python(spark):
    # two components + a cycle + a long path that exceeds the hop budget
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (10, 11), (11, 12)] + [
        (i, i + 1) for i in range(20, 30)
    ]
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (20,)], "node long")
    for hops in (2, 8):
        got = {
            r["node"]: r["dist"]
            for r in bfs_distances(e, seeds, max_hops=hops).collect()
        }
        assert got == _py_bfs(edges, [0, 20], hops), hops


def test_bfs_unreachable_component_absent(spark):
    e = spark.createDataFrame([(0, 1), (5, 6)], "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["dist"] for r in bfs_distances(e, seeds).collect()}
    assert got == {0: 0, 1: 1}


# ------------------------- property fuzz (hypothesis) ---------------------

try:
    from hypothesis import given, settings, strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False

if HAVE_HYP:
    _tok = st.sampled_from([f"t{i}" for i in range(12)])  # small alphabet
    _doc = st.lists(_tok, min_size=K + W - 1, max_size=40)

    @settings(max_examples=25, deadline=None)
    @given(a=_doc, b=_doc, run=st.lists(_tok, min_size=W + K - 1, max_size=W + K + 3))
    def test_winnow_guarantee_fuzz(spark, a, b, run):
        """Detection guarantee under fuzz: planting the same run of
        >= w+k-1 tokens into two random docs ALWAYS yields a shared
        selected fingerprint hash (Schleimer et al. Theorem: no miss)."""
        da = " ".join(a + run)
        db = " ".join(run + b)
        fa = {fp for fp, _ in _py_winnow(da)}
        fb = {fp for fp, _ in _py_winnow(db)}
        assert fa & fb, (da, db)

    @settings(max_examples=15, deadline=None)
    @given(doc=st.lists(_tok, min_size=K + W - 1, max_size=60))
    def test_winnow_spark_equals_python_fuzz(spark, doc):
        """Spark operator == pure-python mirror on random token docs."""
        text = " ".join(doc)
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        got = {
            (r["fp"], r["fp_pos"])
            for r in winnow_fingerprints(df, k=K, w=W).collect()
        }
        assert got == _py_winnow(text)
