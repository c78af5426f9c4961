"""Consistent weighted sampling (ICWS) — python-mirror parity and the
collision-probability property vs exact weighted Jaccard."""

import hashlib
import math
from collections import Counter

from crawler_spark.operators.dedup import cws_pair_estimate, cws_signatures

DOCS = [
    (0, "cheap pills " * 50 + "buy now"),
    (1, "cheap pills " * 50 + "order today"),  # heavy overlap w/ 0
    (2, "cheap pills buy now"),                # SET-identical to 0, low J_w
    (3, "completely different content here"),
]


def _pin9(x):
    return math.floor(x * 1e9 + 0.5) / 1e9


def _py_sig(txt, k):
    w = Counter(t for t in txt.lower().strip().split() if t)
    out = {}
    for slot in range(k):
        best = None
        for tok, cnt in w.items():
            h = hashlib.md5(f"cws{slot}:{tok}".encode()).hexdigest()
            u = [(int(h[4 * i : 4 * i + 4], 16) + 0.5) / 65536.0 for i in range(5)]
            r = _pin9(-(math.log(u[0]) + math.log(u[1])))
            c = _pin9(-(math.log(u[2]) + math.log(u[3])))
            beta = u[4]
            lnw = _pin9(math.log(float(cnt)))
            t = math.floor(lnw / r + beta)
            y = _pin9(math.exp(r * (t - beta)))
            a = _pin9(c / (y * _pin9(math.exp(r))))
            if best is None or (a, tok) < best:
                best = (a, tok, t)
        out[slot] = (best[1], best[2])
    return out


def _exact_jw(t1, t2):
    w1 = Counter(t1.lower().split())
    w2 = Counter(t2.lower().split())
    mins = sum(min(w1[t], w2[t]) for t in set(w1) | set(w2))
    maxs = sum(max(w1[t], w2[t]) for t in set(w1) | set(w2))
    return mins / maxs


def test_cws_matches_python_mirror(spark):
    k = 8
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r["doc_id"], r["slot"]): (r["feature"], r["t"])
        for r in cws_signatures(df, k=k).collect()
    }
    for did, txt in DOCS:
        ref = _py_sig(txt, k)
        for slot in range(k):
            assert got[(did, slot)] == ref[slot], (did, slot)


def test_cws_collision_tracks_weighted_jaccard(spark):
    k = 64
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    sigs = cws_signatures(df, k=k)
    est = {
        (r["doc_a"], r["doc_b"]): r["n_match"] / k
        for r in cws_pair_estimate(sigs, k=k).collect()
    }
    jw_01 = _exact_jw(DOCS[0][1], DOCS[1][1])
    jw_02 = _exact_jw(DOCS[0][1], DOCS[2][1])
    # heavy-overlap pair: estimate within 3 sigma of binomial(k, jw)
    sd = math.sqrt(jw_01 * (1 - jw_01) / k)
    assert abs(est[(0, 1)] - jw_01) <= 3 * sd + 1e-9
    # the REPETITION-honest property: doc 2 is set-identical to doc 0
    # but weight-poor; the FULL (feature, t) sample's collision law is
    # exactly J_w, so the estimate sits near 0.04, nowhere near the
    # set-Jaccard of 1.0
    assert jw_02 < 0.1
    sd02 = math.sqrt(jw_02 * (1 - jw_02) / k)
    assert abs(est.get((0, 2), 0.0) - jw_02) <= 3 * sd02 + 1e-9
    # unrelated docs share nothing
    assert (0, 3) not in est
