"""Dedup + text-analysis operator unit tests (planted fixtures with known
answers — testdata-scale equivalence vs DuckDB is covered by the driver
gate / tools/driver_check.py)."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.functions.text import fingerprint, lang_id, quality_score, token_count
from crawler_spark.operators.dedup import (
    dedup_exact,
    embedding_neardup_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_signatures,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup
        (4, "completely different text about spark engines"),
        (5, "el gato la casa de que los"),  # spanish markers
        (6, "tiny"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_exact(docs):
    out = {r["keep_id"]: r["n_copies"] for r in dedup_exact(docs).collect()}
    assert out[1] == 2  # docs 1+2 collapse, keeper = min id
    assert out[3] == 1 and out[4] == 1


def test_ngram_jaccard(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(1, 2)] == 1.0  # identical
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0  # near dup
    assert (1, 4) not in pairs


def test_ngram_jaccard_df_cap(docs):
    """max_df drops hot shingles from CANDIDATE generation only: (1,2)
    still pairs via their df<=2 shingles with an exact full-set Jaccard
    of 1.0, while (1,3) — whose shared shingles all have df=3 — stops
    being a candidate at max_df=2."""
    uncapped = {(r["doc_a"], r["doc_b"]) for r in
                ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert (1, 3) in uncapped
    capped = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
              ngram_jaccard_pairs(docs, threshold=0.5, max_df=2).collect()}
    assert capped[(1, 2)] == 1.0  # exact Jaccard over FULL shingle sets
    assert (1, 3) not in capped


def test_minhash_banded_pairs(docs):
    from crawler_spark.operators.dedup import minhash_banded_pairs

    pairs = {(r["doc_a"], r["doc_b"]): r["n_bands"] for r in
             minhash_banded_pairs(docs, n_bands=4, rows_per_band=2).collect()}
    assert pairs[(1, 2)] == 4  # exact dups agree on every band
    assert (4, 5) not in pairs  # disjoint docs share no band


def test_minhash_lsh_recall(docs):
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             minhash_lsh_pairs(docs, n_hashes=8, min_band_matches=8).collect()}
    assert (1, 2) in pairs  # exact dups agree on all bands
    assert (4, 5) not in pairs


def test_simhash(docs):
    sig = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    assert sig[1] == sig[2]  # identical text -> identical signature
    assert sig[1] != sig[4]
    assert all(0 <= v < (1 << 16) for v in sig.values())


def test_embedding_neardup(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.99, 0.01, 0.0, 0.0]),  # near dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),    # orthogonal
        (4, [-1.0, 0.0, 0.0, 0.0]),   # antipodal: no band can agree
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {(r["id_a"], r["id_b"]) for r in
             embedding_neardup_pairs(emb, threshold=0.95).collect()}
    assert (1, 2) in pairs  # near-identical vectors share every SRP band
    assert (1, 3) not in pairs and (1, 4) not in pairs


def test_simhash64_hamming_pairs(docs):
    from crawler_spark.operators.dedup import (
        simhash64_band_signatures,
        simhash64_hamming_pairs,
    )

    sig = simhash64_band_signatures(docs).collect()
    by_doc = {}
    for r in sig:
        by_doc.setdefault(r["doc_id"], {})[r["band_id"]] = r["band_val"]
    assert all(len(v) == 4 for v in by_doc.values())  # 4 bands per doc
    assert all(0 <= bv < (1 << 16) for v in by_doc.values() for bv in v.values())
    assert by_doc[1] == by_doc[2]  # identical text -> identical signature

    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in
             simhash64_hamming_pairs(docs, max_hamming=3).collect()}
    assert pairs[(1, 2)] == 0  # exact dup: Hamming 0
    # the one-word near-dup (1,3) measures Hamming 8 spread over all 4
    # bands — outside the k<=3 radius the banding guarantees (pigeonhole:
    # <=3 flipped bits can't touch all 4 bands), so it must NOT pair
    assert (1, 3) not in pairs
    assert (4, 5) not in pairs
    assert all(h <= 3 for h in pairs.values())


def test_lang_id_and_quality(docs):
    out = {r["doc_id"]: r for r in docs.select(
        "doc_id",
        lang_id(F.col("text")).alias("lang"),
        quality_score(F.col("text")).alias("q"),
        token_count(F.col("text")).alias("n"),
        fingerprint(F.col("text")).alias("fp"),
    ).collect()}
    assert out[1]["lang"] == "en"
    assert out[5]["lang"] == "es"
    assert out[6]["lang"] == "und"
    assert 0.0 <= out[1]["q"] <= 1.0
    assert out[1]["n"] == 9
    assert out[1]["fp"] == out[2]["fp"] != out[3]["fp"]


def test_hamming64_pairs_bruteforce_parity(spark):
    """Banded candidate generation must be EXACT (pigeonhole, k <
    n_bands): pairs == brute-force cross-join pairs at Hamming <= 7,
    over signatures with planted 0/1/7/8-bit-flip neighbors."""
    from crawler_spark.operators.dedup import hamming64_pairs

    def i64(v):  # wrap to signed int64 (Spark LongType)
        v &= (1 << 64) - 1
        return v - (1 << 64) if v >= (1 << 63) else v

    base = 0x5A5A_1234_ABCD_EF01
    rows = [
        (10, base),
        (11, base),                                  # hamming 0
        (12, base ^ 0x1),                            # hamming 1
        (13, base ^ 0b1111111),                      # hamming 7 (boundary in)
        (14, base ^ 0b11111111),                     # hamming 8 (boundary out)
        (15, i64(base ^ ((1 << 63) | (1 << 62)))),   # high bits / sign flip
        (16, -1),
        (17, 0),
    ]
    sigs = spark.createDataFrame(rows, "doc_id long, sig64 long")
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in hamming64_pairs(sigs, sig_col="sig64", max_hamming=7, n_bands=8).collect()
    }
    want = {}
    for i, (ida, sa) in enumerate(rows):
        for idb, sb in rows[i + 1:]:
            d = bin((sa ^ sb) & ((1 << 64) - 1)).count("1")
            if d <= 7:
                want[(ida, idb)] = d
    assert got == want
    assert got[(10, 11)] == 0 and got[(10, 13)] == 7 and (10, 14) not in got


def test_dedup_clusters_transitive(spark):
    """Transitive chains collapse to the component-minimum label even
    when no direct pair links the endpoints (diameter > 1)."""
    from crawler_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (6, 5), (9, 8)], "doc_a long, doc_b long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 8: 8, 9: 8}


def test_phash_neardup_query_recalls_variants(spark):
    """The image-axis near-dup query finds every planted variant pair
    with the expected Hamming gap (uniform-shift twins at exactly 0),
    and the PSNR verify stage scores them as true near-dups: clipped
    +1 brightness >= 48.13 dB, half-image +4 >= ~39 dB — both over
    the 30 dB keep threshold."""
    import __spark_entry__ as entry

    rows = entry.q_image_phash_neardup(spark, "/root/testdata/sf0.001").collect()
    pairs = {(r["doc_a"], r["doc_b"]): (r["hamming"], r["psnr_db"]) for r in rows}
    twin = [(a, b) for (a, b) in pairs if b == a + "-v"]
    assert len(twin) >= 12  # most planted variants recalled at k=7
    # +1-brightness twins (odd trailing hex digit): hamming 0, psnr>=48;
    # +4 half-image twins: psnr ~39 (may or may not flip bits)
    bright = [(a, b) for (a, b) in twin if int(a[-1], 16) % 2]
    assert bright
    assert all(pairs[p][0] == 0 and pairs[p][1] >= 48.13 for p in bright)
    assert all(pairs[p][1] >= 38.0 for p in twin)


def test_incremental_corpus_select_equals_one_shot(spark):
    """Wave-by-wave curation against the seen-hash table must reproduce
    the one-shot corpus_select pipeline row-for-row: cross-wave
    duplicates are suppressed by the anti-join (kept OR rejected — a
    gate-failing text must not resurface via a later-wave copy), and
    within-wave duplicates by the first-wins dedup."""
    from crawler_spark.functions.text import lang_id, quality_score, token_count
    from crawler_spark.operators.corpus import incremental_corpus_select
    from crawler_spark.operators.dedup import dedup_exact

    good = "the quick brown fox jumps over the lazy dog again and again"
    alt = "a different perfectly reasonable sentence with many common words"
    bad = "zzz qqq xxx"  # fails the language/quality gates
    rows = []
    for i in range(300):
        if i % 50 == 7:
            text = good  # cross- and within-wave duplicates of a keeper
        elif i % 50 == 9:
            text = bad  # duplicated rejected text
        else:
            text = f"{alt} number {i} of the corpus stream"
        rows.append((i, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # one-shot reference: global first-wins dedup, then the gates
    keep = dedup_exact(docs).select(F.col("keep_id").alias("doc_id"))
    one_shot = (
        docs.select(
            "doc_id",
            lang_id(F.col("text")).alias("lang_pred"),
            quality_score(F.col("text")).alias("quality"),
            token_count(F.col("text")).cast("long").alias("n_tokens"),
        )
        .filter(
            (F.col("lang_pred") != "und")
            & (F.col("quality") >= 0.55)
            & (F.col("n_tokens") >= 5)
        )
        .join(keep, "doc_id", "left_semi")
    )
    want = sorted(tuple(r) for r in one_shot.collect())

    seen = spark.createDataFrame([], "text_md5 string")
    got = []
    for lo in (0, 100, 200):  # ascending-id waves (append-only order)
        wave = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 100))
        sel, wave_hashes = incremental_corpus_select(wave, seen)
        got.extend(tuple(r) for r in sel.collect())
        seen = seen.unionByName(wave_hashes).distinct().localCheckpoint()

    assert sorted(got) == want
    # the duplicated keeper survives exactly once, in its first wave
    keeper_ids = [r[0] for r in got if r[0] % 50 == 7]
    assert keeper_ids == [7]
    # the rejected text never appears, from any wave
    assert all(r[0] % 50 != 9 for r in got)


def test_substring_overlap_pairs(spark):
    from crawler_spark.operators.dedup import substring_overlap_pairs

    rows = [
        # docs 1 and 2 share the exact 7-token run "a b c d e f g"
        # embedded in different surroundings -> 3 shared 5-windows
        (1, "x a b c d e f g y z q"),
        (2, "m n a b c d e f g p"),
        # doc 3 shares nothing 5 tokens long with anyone
        (3, "one two three four five six seven"),
        # doc 4 repeats doc 3's run exactly -> full overlap (3 windows)
        (4, "one two three four five six seven"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in substring_overlap_pairs(docs, window=5).collect()
    }
    # run of L=7 tokens -> L - window + 1 = 3 shared windows
    assert out == {(1, 2): 3, (3, 4): 3}


def test_lm_perplexity_scores(spark):
    from crawler_spark.operators.corpus import lm_perplexity_scores

    rows = [
        (1, "the the the the"),          # all high-frequency tokens
        (2, "the zzz"),                   # one common + one rare token
        (3, "the the qqq www"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in lm_perplexity_scores(docs).collect()}
    assert out[1]["n_tok"] == 4 and out[2]["n_tok"] == 2
    # corpus: N=10, V=4, c(the)=7, c(zzz)=c(qqq)=c(www)=1
    import math

    lp_the = round(math.log(7.5 / 12.0), 6)
    lp_rare = round(math.log(1.5 / 12.0), 6)
    assert out[1]["avg_logprob"] == pytest.approx(lp_the, abs=1e-6)
    assert out[2]["avg_logprob"] == pytest.approx(
        round((lp_the + lp_rare) / 2, 6), abs=1e-6
    )
    # doc of only common tokens is the most "typical" -> lowest perplexity
    ppls = {k: v["ppl"] for k, v in out.items()}
    assert ppls[1] < ppls[2] < ppls[3] or ppls[1] < ppls[3]


def test_cdc_chunks_shift_invariance(spark):
    """The CDC property: prepending tokens changes the chunks BEFORE the
    next content-defined boundary, but every chunk after it is
    byte-identical — fixed-size blocking would shift-corrupt them all."""
    from crawler_spark.operators.dedup import cdc_chunks

    base = "alpha beta gamma delta epsilon zeta eta theta " * 8
    shifted = "inserted prefix words " + base
    df = spark.createDataFrame(
        [(1, base.strip()), (2, shifted.strip())], "doc_id long, text string"
    )
    out = cdc_chunks(df).collect()
    a = {r["chunk_md5"] for r in out if r["id"] == 1}
    b = {r["chunk_md5"] for r in out if r["id"] == 2}
    # the repeated body guarantees interior boundaries exist, so most of
    # doc 1's chunks reappear verbatim in the shifted doc
    assert len(a & b) >= len(a) - 2, (len(a), len(a & b))
    # and chunk token counts reconcile with the token totals
    tot = {
        r["id"]: r["s"]
        for r in cdc_chunks(df)
        .groupBy("id")
        .agg(F.sum("n_tokens").alias("s"))
        .collect()
    }
    assert tot[1] == len(base.split())
    assert tot[2] == len(shifted.split())


def test_shingle_containment_catches_subset_jaccard_misses(spark):
    from crawler_spark.operators.dedup import (
        ngram_jaccard_pairs,
        shingle_containment_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog"
    long_doc = (
        "editorial preamble with many framing words goes here first then "
        + quote
        + " and afterwards a long tail of commentary keeps adding shingles "
        "that dilute the union so resemblance collapses toward zero"
    )
    rows = [(1, quote), (2, long_doc), (3, "totally unrelated content here now")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cont = {
        (r.doc_a, r.doc_b): r.containment
        for r in shingle_containment_pairs(docs, threshold=0.9).collect()
    }
    # the quote's shingles all appear in the long doc -> containment 1.0
    assert cont[(1, 2)] == 1.0
    assert (1, 3) not in cont and (2, 3) not in cont
    # while symmetric Jaccard at the same bar misses the pair entirely
    jac = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    assert (1, 2) not in jac


def test_bbit_minwise_estimate_bounds(spark):
    from crawler_spark.operators.dedup import bbit_pair_estimate

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),
        (2, base),  # identical -> all 16 slots match, j_est = j_exact = 1
        (3, "unrelated words entirely disjoint from the neighbours here"),
        (4, "another fully different document with its own private tokens"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_a: r for r in bbit_pair_estimate(docs).collect()}
    assert got[1].n_match == 16 and got[1].j_est == 1.0 and got[1].j_exact == 1.0
    # disjoint docs: exact J = 0; the b-bit estimate is >= 0 by clamping
    # and small (collision floor C = 1/256 per slot)
    assert got[3].j_exact == 0.0 and 0.0 <= got[3].j_est < 0.5
    # estimator stays within [0, 1] everywhere
    for r in got.values():
        assert 0.0 <= r.j_est <= 1.0


def test_oph_densification_invariants(spark):
    from crawler_spark.operators.dedup import oph_pair_estimate, oph_signatures

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (3, "tiny"),  # < 3 tokens -> no shingles -> no signature at all
        (4, "just three tokens"),  # exactly ONE shingle -> 1 real bin, 15 borrowed
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig = oph_signatures(docs, n_bins=16)
    rows_by_doc = {}
    for r in sig.collect():
        rows_by_doc.setdefault(r.doc_id, []).append(r)
    # every signed doc emits exactly k=16 bins; shingle-less docs emit none
    assert 3 not in rows_by_doc
    assert {len(v) for k, v in rows_by_doc.items()} == {16}
    # doc 4 has one occupied bin: exactly one t=0 row and the other 15
    # borrow from it (all sigs equal, t spans the full rotation)
    d4 = sorted(rows_by_doc[4], key=lambda r: r.bin)
    assert sum(1 for r in d4 if r.t == 0) == 1
    assert len({r.sig for r in d4}) == 1
    assert sorted(((r.bin + r.t) % 16) for r in d4) == [
        d4[[r.t for r in d4].index(0)].bin
    ] * 16
    # identical docs -> identical densified signatures -> J_hat = 1
    est = {r.doc_a: r for r in oph_pair_estimate(docs, n_bins=16).collect()}
    assert est[1].n_match == 16 and est[1].j_est == 1.0


def _brute_jaccard_pairs(rows, n=3, t=0.75):
    """All-pairs trigram Jaccard ground truth (and shared-shingle
    candidate count) in pure python."""
    import itertools

    def sh(text):
        ws = text.strip().lower().split()
        return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}

    sets = {i: sh(txt) for i, txt in rows if len(txt.strip().split()) >= n}
    pairs, n_cand_share = {}, 0
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter:
            n_cand_share += 1
        union = len(sets[a]) + len(sets[b]) - inter
        j = round(inter / union, 6) if union else 0.0
        if j >= t:
            pairs[(a, b)] = j
    return pairs, n_cand_share


def test_prefix_filter_completeness_and_pruning(spark):
    from crawler_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_pairs,
    )

    # a hot boilerplate phrase shared by EVERY doc (the skew killer the
    # prefix filter exists for) + near-dup families straddling the 0.75
    # boundary + singletons; t=3/4 is binary-exact so ceil(t*n) has no
    # fp hazard
    boiler = "all rights reserved contact us terms"
    a = f"alpha beta gamma delta epsilon zeta {boiler}"
    b = f"one two three four five six seven eight {boiler}"
    rows = [
        (1, a),
        (2, a),                      # exact dup: J = 1.0
        (3, a + " extraword"),       # tail append: J = 10/11 ~ 0.909
        (4, b),
        (5, b + " tailword"),        # tail append: J = 12/13 ~ 0.923
        (6, f"totally unrelated words appear in this document {boiler}"),
        (7, f"yet another completely distinct piece of text {boiler}"),
        (8, "short doc no"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    want, n_cand_share = _brute_jaccard_pairs(rows, t=0.75)
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in prefix_filter_pairs(docs, threshold=0.75).collect()
    }
    assert got == want and len(want) >= 4  # non-vacuous: both families pair
    # identical output to the shared-shingle operator (same exact verify)
    ref = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.75).collect()
    }
    assert got == ref
    # pruning: the boilerplate shingles pair EVERY doc in the shared-
    # shingle join; the prefix join must examine strictly fewer pairs
    stats = prefix_filter_pairs(docs, threshold=0.75, with_stats=True).collect()[0]
    assert stats.n_pairs == len(want)
    assert stats.n_cand_prefix < n_cand_share
    # the filter is not vacuous either: it still admits every true pair
    assert stats.n_cand_prefix >= len(want)


def test_prefix_filter_boundary_pair_survives(spark):
    from crawler_spark.operators.dedup import prefix_filter_pairs

    # EXACT-threshold pair: 7 shingles each, intersection 6, union 8 ->
    # J = 6/8 = 0.75 exactly. prefix = 7 - ceil(0.75*7) + 1 = 2: the
    # intersection exactly equals ceil(t*n_sh) = 6 — the tightest case
    # the prefix-length proof allows; a one-off error in the prefix
    # bound drops this pair
    a = "w1 w2 w3 w4 w5 w6 w7 w8 w9"
    b = "w1 w2 w3 w4 w5 w6 w7 w8 y1"
    # trigrams: 7 each (w1w2w3 .. w7w8{w9|y1}); shared = 6
    docs = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    out = prefix_filter_pairs(docs, threshold=0.75).collect()
    assert len(out) == 1 and out[0].jaccard == 0.75


def _lev(a, b):
    """Plain DP Levenshtein for ground truth."""
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


def test_ed_join_matches_bruteforce(spark):
    from crawler_spark.operators.dedup import ed_join_pairs

    k, q = 4, 3
    # adversarial mix: tail edits, internal edits, exact-threshold pair,
    # repeated-gram strings (multiset-vs-set hazard), strings shorter
    # than q (padding path), and a hot shared suffix on every doc
    hot = " copyright footer text"
    rows = [
        (1, "the quick brown fox jumps over the dog" + hot),
        (2, "the quick brown fox jumps over the dig" + hot),   # ed 1
        (3, "the quick brown fox leaps over the dog" + hot),   # ed ~4
        (4, "a completely different document body here" + hot),
        (5, "aaaaaaaaaaaaaaaaaaaa"),                            # repeated grams
        (6, "aaaaaaaaaaaaaaaabbbb"),                            # ed 4 vs 5
        (7, "ab"),                                              # shorter than q
        (8, "abxy"),                                            # ed 2 vs 7
        (9, "zq"),                                              # ed 2 vs 7
    ]
    want = {
        (a, b): _lev(ta.strip().lower(), tb.strip().lower())
        for (a, ta) in rows
        for (b, tb) in rows
        if a < b
        and _lev(ta.strip().lower(), tb.strip().lower()) <= k
    }
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.ed
        for r in ed_join_pairs(docs, q=q, k=k).collect()
    }
    assert got == want
    # non-vacuous: hits at ed 1..k, incl. the short-string padding path
    assert (1, 2) in got and (5, 6) in got and got[(5, 6)] == 4
    assert (7, 8) in got and (7, 9) in got
    # true negatives actually excluded
    assert all((4, x) not in got and (x, 4) not in got for x in (1, 2, 3))


def test_ed_join_prefix_prunes_hot_grams(spark):
    from crawler_spark.operators.dedup import ed_join_pairs

    # every doc shares a long hot boilerplate, so the full-gram join
    # would candidate every pair; the prefix (rarest grams) must not
    k, q = 2, 3
    boiler = "shared boilerplate sentence repeated on every single page of this site"
    rows = [(i, f"unique{i:04d} body {i * 7919} {boiler}") for i in range(1, 21)]
    rows += [(99, rows[0][1] + "!")]  # one true near-dup of doc 1 (ed 1)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    stats = ed_join_pairs(docs, q=q, k=k, with_stats=True).collect()[0]
    assert stats.n_pairs == 1
    n_docs = len(rows)
    # far fewer candidates than the all-shared-gram blowup n*(n-1)/2
    assert stats.n_cand_prefix < n_docs * (n_docs - 1) // 2 / 3
    out = ed_join_pairs(docs, q=q, k=k).collect()
    assert [(r.doc_a, r.doc_b, r.ed) for r in out] == [(1, 99, 1)]


# ------------------------- ed-join property fuzz ---------------------
try:
    from hypothesis import given, settings, strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:
    # tiny alphabet maximizes gram collisions AND edit-distance near
    # misses; lengths straddle the short-path threshold k*q-q+1 = 7
    _s = st.text(alphabet="abc", min_size=1, max_size=24)

    @settings(max_examples=6, deadline=None)
    @given(texts=st.lists(_s, min_size=4, max_size=9, unique=True))
    def test_ed_join_lossless_fuzz(spark, texts):
        """The prefix filter + short band path must lose NOTHING:
        operator output == brute-force all-pairs Levenshtein on random
        small-alphabet strings crossing the short/long boundary."""
        from crawler_spark.operators.dedup import ed_join_pairs

        k = 3
        rows = list(enumerate(texts))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r.doc_a, r.doc_b): r.ed
            for r in ed_join_pairs(docs, q=3, k=k, m=2).collect()
        }
        want = {
            (a, b): _lev(ta, tb)
            for a, ta in rows
            for b, tb in rows
            if a < b and _lev(ta, tb) <= k
        }
        assert got == want


def test_weighted_jaccard_counts_multiplicity(spark):
    from crawler_spark.operators.dedup import weighted_jaccard_pairs

    rows = [
        (1, "spam spam spam spam"),
        (2, "spam"),                       # set-J = 1.0; J_w = 1/4
        (3, "spam spam spam spam"),        # exact dup of 1: J_w = 1
        (4, "a b a b c"),                  # vs 5: min{a:2,b:2,c:0}=4... see below
        (5, "a b a b"),                    # J_w(4,5) = 4/5
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.jw
        for r in weighted_jaccard_pairs(docs, threshold=0.0).collect()
    }
    assert got[(1, 3)] == 1.0
    assert got[(1, 2)] == 0.25   # min 1 / max 4 — set Jaccard says 1.0
    assert got[(2, 3)] == 0.25
    assert got[(4, 5)] == 0.8    # sum(min)=4, union mass 5
    # threshold filters
    kept = {
        (r.doc_a, r.doc_b)
        for r in weighted_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert kept == {(1, 3), (4, 5)}


def test_simhash64_nondefault_band_geometry(spark):
    """8x8 banding must produce valid 8-bit band values from the right
    bit ranges (regression: the packer hardcoded 16-bit bands) and an
    exact-duplicate pair still lands at Hamming 0."""
    from crawler_spark.operators.dedup import (
        simhash64_band_signatures,
        simhash64_hamming_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "totally different words here")],
        "doc_id long, text string",
    )
    sig = simhash64_band_signatures(docs, n_bands=8, band_bits=8).collect()
    assert {r["band_id"] for r in sig} == set(range(8))
    assert all(0 <= r["band_val"] < 256 for r in sig)
    by_doc = {}
    for r in sig:
        by_doc.setdefault(r["doc_id"], {})[r["band_id"]] = r["band_val"]
    assert by_doc[1] == by_doc[2]  # identical text -> identical bands
    pairs = simhash64_hamming_pairs(
        docs, max_hamming=3, n_bands=8, band_bits=8
    ).collect()
    assert any(
        {p["doc_a"], p["doc_b"]} == {1, 2} and p["hamming"] == 0 for p in pairs
    )


def test_span_removal_manifest_hand_case(spark):
    from crawler_spark.operators.corpus import span_removal_manifest

    shared = "alpha beta gamma delta epsilon zeta"  # 6 toks: 2 windows
    docs = spark.createDataFrame(
        [
            (0, shared + " unique tail zero one two"),
            (1, "lead in words " + shared),
            (2, "totally different text with no shared spans at all"),
            (3, "tiny doc"),  # < window: no windows at all
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in span_removal_manifest(docs).collect()}
    # doc 0: windows at pos 1,2 both duplicated -> one merged island
    # covering tokens 1..6
    assert got[0]["n_dup_windows"] == 2
    assert got[0]["n_intervals"] == 1
    assert got[0]["tokens_removed"] == 6
    # doc 1: the shared span sits at the END (pos 4,5 of 9 tokens)
    assert got[1]["n_intervals"] == 1
    assert got[1]["tokens_removed"] == 6
    # clean and tiny docs: zeros, ratio 0
    assert got[2]["tokens_removed"] == 0 and got[2]["removal_ratio6"] == 0.0
    assert got[3]["tokens_removed"] == 0 and got[3]["n_tokens"] == 2
