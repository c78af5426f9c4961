"""Corpus-wide text statistics: vocabulary and TF-IDF.

The vocabulary/token-frequency pass every tokenizer-training or
data-mixing pipeline runs, plus classic TF-IDF salience — both pure
native expressions (explode + hash aggregations), both with exact
ANSI-SQL oracles.

Scale notes: the token explode is the corpus's token count in rows, but
every aggregation is map-side-combinable on high-cardinality keys
(token / (doc_id, token)), so the shuffle carries distinct keys, not
occurrences. Top-k vocab is TakeOrdered (per-partition heaps + driver
merge), never a global sort. TF-IDF's document-frequency join is on
token — broadcastable while the vocab fits (even 10M tokens x 16B is
~MBs), else a plain hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    toks = F.split(F.lower(F.trim(F.col(text_col))), "\\s+")
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("tok")
    ).filter(F.length("tok") > 0)


def vocab_topk(
    docs: DataFrame, k: int = 50, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-k corpus vocabulary: (tok, n_occurrences, n_docs), ordered by
    occurrences desc with lexicographic tie-break."""
    return (
        _tokens(docs, text_col, id_col)
        .groupBy("tok")
        .agg(
            F.count("*").alias("n_occ"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occ"), F.asc("tok"))
        .limit(k)
    )


def lang_mixture_weights(
    docs: DataFrame, alpha: float = 0.3, lang_col: str = "lang"
) -> DataFrame:
    """Temperature-scaled language sampling weights for training-data
    mixing: weight_l ∝ (n_l/N)^alpha, normalized. alpha<1 upsamples
    low-resource languages (the standard multilingual-corpus recipe).
    One tiny aggregate (|langs| rows) cross-joined back — never a
    global window over the fact table."""
    counts = docs.groupBy(F.col(lang_col).alias("lang")).agg(
        F.count("*").alias("n_docs")
    )
    totals = counts.agg(
        F.sum("n_docs").alias("_tot"),
        F.sum(F.pow(F.col("n_docs").cast("double"), alpha)).alias("_powsum"),
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "lang",
        "n_docs",
        F.round(F.col("n_docs") / F.col("_tot"), 6).alias("p"),
        F.round(
            F.pow(F.col("n_docs").cast("double"), alpha) / F.col("_powsum"), 6
        ).alias("weight"),
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float,
    lang_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff the first
    4 md5 hex digits of its id (uniform on [0, 65536)) fall under the
    stratum's rate threshold. Hash-gated sampling is reproducible across
    reruns and cluster sizes — the property training-data lineage needs
    that `df.sample()` (partition-seeded RNG) does not give."""
    bucket = F.expr(
        f"cast(conv(substring(md5(cast({id_col} as string)), 1, 4), 16, 10) as int)"
    )
    thresh = F.lit(int(default_rate * 65536))
    for lang, rate in sorted(rates.items()):
        thresh = F.when(F.col(lang_col) == lang, int(rate * 65536)).otherwise(thresh)
    return docs.filter(bucket < thresh).select(id_col, lang_col)


def tfidf_top_token(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Most salient token per document by TF-IDF (ln(N/df), round-6
    pinned): (doc_id, top_tok, tf, score). Deterministic tie-break on
    the lexicographically smallest token."""
    toks = _tokens(docs, text_col, id_col)
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    # N as a broadcast scalar inside the plan — no driver-side action,
    # no second scan of the corpus at 100 TB
    n_docs = docs.agg(
        F.count_distinct(F.col(id_col)).cast("double").alias("_n_docs")
    )
    scored = tf.join(df, "tok").crossJoin(F.broadcast(n_docs)).select(
        "doc_id",
        "tok",
        "tf",
        F.round(
            F.col("tf") * F.log(F.col("_n_docs") / F.col("df")), 6
        ).alias("score"),
    )
    best = scored.groupBy("doc_id").agg(
        F.max(F.struct(F.col("score"), F.col("tf"))).alias("mx")
    )
    return (
        scored.join(best, "doc_id")
        .filter(
            (F.col("score") == F.col("mx.score")) & (F.col("tf") == F.col("mx.tf"))
        )
        .groupBy("doc_id")
        .agg(
            F.min("tok").alias("top_tok"),
            F.any_value("tf").alias("tf"),
            F.any_value("score").alias("score"),
        )
    )


def bigram_pmi_topk(
    docs: DataFrame,
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Collocation mining: top-k word bigrams by pointwise mutual
    information, PMI = ln(p(xy) / (p(x)p(y))) with a minimum bigram
    count (rare pairs have unreliable PMI) — the standard phrase /
    tokenizer-merge discovery pass.

    Shape: one explode for unigram counts, one for bigram counts, two
    map-side-combined aggregations, two BROADCAST joins of the (small)
    unigram vocabulary onto bigram counts, TakeOrdered for top-k. Corpus
    totals fold in as broadcast one-row scalars; nothing collects to the
    driver. Both count tables are localCheckpoint-materialized ONCE:
    the scalar-total aggregates and the joins are separate plan
    subtrees, and without materialization each would re-run its full
    explode+shuffle pipeline (measured 4x recompute = ~3x wall time).
    ln is applied to identical doubles on both engines and the result
    rounds at 6, pinning oracle hashes.
    """
    uni = (
        _tokens(docs, text_col, id_col)
        .groupBy("tok")
        .agg(F.count("*").alias("n_uni"))
        .localCheckpoint()
    )
    n_uni_total = uni.agg(F.sum("n_uni").cast("double").alias("uni_total"))
    # project the token array once: lambdas don't CSE, so element_at over
    # the raw split() would re-split per bigram position (13x slower)
    ws = F.col("__ws")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(ws) - 1),
        lambda i: F.struct(
            F.element_at(ws, i).alias("tok_a"),
            F.element_at(ws, i + 1).alias("tok_b"),
        ),
    )
    bi = (
        docs.select(
            F.split(F.lower(F.trim(F.col(text_col))), "\\s+").alias("__ws")
        )
        .filter(F.size(ws) >= 2)
        .select(F.explode(grams).alias("g"))
        .select("g.tok_a", "g.tok_b")
        .groupBy("tok_a", "tok_b")
        .agg(F.count("*").alias("n_bi"))
        .filter(F.col("n_bi") >= min_count)
        .localCheckpoint()
    )
    n_bi_total = bi.agg(F.sum("n_bi").cast("double").alias("bi_total"))
    ua = uni.select(F.col("tok").alias("tok_a"), F.col("n_uni").alias("n_a"))
    ub = uni.select(F.col("tok").alias("tok_b"), F.col("n_uni").alias("n_b"))
    return (
        bi.join(F.broadcast(ua), "tok_a")
        .join(F.broadcast(ub), "tok_b")
        .crossJoin(F.broadcast(n_uni_total))
        .crossJoin(F.broadcast(n_bi_total))
        .select(
            "tok_a",
            "tok_b",
            "n_bi",
            F.round(
                F.log(
                    (F.col("n_bi") / F.col("bi_total"))
                    / ((F.col("n_a") / F.col("uni_total"))
                       * (F.col("n_b") / F.col("uni_total")))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("tok_a"), F.asc("tok_b"))
        .limit(k)
    )


def inverted_index(
    docs: DataFrame,
    max_postings: int = 10,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Inverted-index construction (search-serving / retrieval-eval
    pass): per token, document frequency and a deterministic sample of
    the posting list (first `max_postings` doc ids, ascending).

    collect_list order is nondeterministic under parallelism, so the
    posting sample is sort_array'd before slicing — reproducible across
    cluster sizes. Emitted as a comma-joined string (portable to the
    SQL oracle; a real index would write the full list per shard).
    Postings skew (stopwords appear in every doc) is bounded: the list
    is capped at max_postings AFTER a distinct (doc_id, tok) reduction,
    and df itself comes from the same map-side-combinable count."""
    return (
        _tokens(docs, text_col, id_col)
        .distinct()
        .groupBy("tok")
        .agg(
            F.count("*").alias("df"),
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(
                        F.sort_array(F.collect_list("doc_id")), 1, max_postings
                    ),
                    lambda x: x.cast("string"),
                ),
            ).alias("posting_sample"),
        )
        .filter(F.col("df") >= min_df)
    )


def incremental_corpus_select(
    wave_docs: DataFrame,
    seen_hashes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.55,
    min_tokens: int = 5,
) -> tuple[DataFrame, DataFrame]:
    """Curate ONE new wave of documents against everything already
    processed — the content analog of the crawl's URL-seen anti-join
    (SCALE.md §URL-seen). A 100 TB pipeline must never re-curate the
    whole corpus when a crawl round appends new pages: each wave does
    O(wave) row-local work (first-wins dedup inside the wave, then the
    language/quality/token gates) plus ONE anti-join of the wave's
    distinct text hashes against the persisted seen-hash table — at
    scale a bloom/cuckoo-prefiltered join exactly like
    ``operators/seen.anti_join_seen``.

    ``seen_hashes`` is the hash set of every text EVER ENCOUNTERED
    (kept or not), not just the kept ones — the same "seen, not
    fetched" distinction the URL frontier makes. Provided waves arrive
    in ascending ``id_col`` order (the crawl's append-only discovery
    order), the union of per-wave selections is row-identical to the
    one-shot ``corpus_select`` over the concatenated corpus — asserted
    in tests/test_dedup_text.py.

    Returns ``(selected, wave_hashes)``: the wave's kept rows
    (id, lang_pred, quality, n_tokens) and the DISTINCT ``text_md5``
    set to append to the seen-hash table for the next wave.
    """
    from crawler_spark.functions.text import lang_id, quality_score, token_count

    hashed = wave_docs.select(
        F.col(id_col),
        F.col(text_col),
        F.md5(F.col(text_col)).alias("text_md5"),
    )
    # first-wins inside the wave (same key as dedup_exact)
    winner_keys = hashed.groupBy("text_md5").agg(F.min(id_col).alias(id_col))
    winners = hashed.join(winner_keys, ["text_md5", id_col], "left_semi")
    # cross-wave first-wins: hashes seen in ANY earlier wave are not ours
    fresh = winners.join(
        seen_hashes.select("text_md5"), "text_md5", "left_anti"
    )
    selected = fresh.select(
        id_col,
        lang_id(F.col(text_col)).alias("lang_pred"),
        quality_score(F.col(text_col)).alias("quality"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    ).filter(
        (F.col("lang_pred") != "und")
        & (F.col("quality") >= min_quality)
        & (F.col("n_tokens") >= min_tokens)
    )
    return selected, hashed.select("text_md5").distinct()


def bpe_merge_candidates(
    docs: DataFrame, k: int = 20, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-k BPE merge candidates: adjacent character-pair frequencies
    across all token occurrences — the statistic the first BPE merge
    rule is chosen from (Sennrich et al. 2016). Pure native expressions:
    tokens explode once, each token emits its len-1 overlapping char
    bigrams via transform(sequence(...)) + substring, then one
    map-side-combined count. At corpus scale this is the same plan as
    vocab_topk — no Python, no per-char rows wider than the pair count."""
    toks = _tokens(docs, text_col, id_col).filter(F.length("tok") >= 2)
    pairs = toks.select(
        F.explode(
            F.expr("transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(k)
    )


def lm_perplexity_scores(
    docs: DataFrame,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style language-model quality scoring: train an add-alpha
    smoothed unigram LM on the corpus itself, score every document by
    its average token log-probability, and report perplexity — the
    classic "how typical is this document of the corpus" filter used to
    rank crawl text before training (low ppl = fluent/common, high ppl
    = gibberish or off-distribution; both tails get inspected).

    Shape: one explode + map-side-combined count for the vocabulary,
    corpus totals as broadcast one-row scalars, one join of vocab onto
    the token stream (Catalyst broadcasts the vocab while it fits; at
    100 TB it becomes a shuffle hash join on a uniform key), one
    per-doc aggregation.

    Determinism: per-token log-probs are ln of identical rationals on
    both engines, rounded to 6 dp and summed as DECIMAL — exact and
    order-independent, so partial-aggregation order can't move the
    hash. avg/ppl derive from that exact sum.
    """
    toks = _tokens(docs, text_col, id_col)
    uni = toks.groupBy("tok").agg(F.count("*").alias("n_uni")).localCheckpoint()
    totals = uni.agg(
        F.sum("n_uni").cast("double").alias("n_total"),
        F.count("*").cast("double").alias("v_size"),
    )
    lp6 = F.round(
        F.log(
            (F.col("n_uni") + F.lit(alpha))
            / (F.col("n_total") + F.lit(alpha) * F.col("v_size"))
        ),
        6,
    ).cast("decimal(20,6)")
    return (
        toks.join(uni, "tok")
        .crossJoin(F.broadcast(totals))
        .select("doc_id", lp6.alias("lp6"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tok"), F.sum("lp6").alias("sum_lp"))
        .select(
            "doc_id",
            "n_tok",
            # _pin, not round: sum_lp/n_tok is a 6dp-decimal over an
            # integer — it hits exact .5 boundaries where the engines'
            # round() modes disagree (observed at sf0.1)
            _pin(F.col("sum_lp").cast("double") / F.col("n_tok"), 6).alias(
                "avg_logprob"
            ),
            _pin(
                F.exp(
                    -_pin(
                        F.col("sum_lp").cast("double") / F.col("n_tok"), 6
                    )
                ),
                4,
            ).alias("ppl"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 retrieval: top-k documents for a fixed query-term set
    (Robertson/Sparck Jones probabilistic ranking — the scoring function
    behind classic retrieval-based corpus curation and eval harnesses).

    score(d) = sum over query terms t present in d of
      idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl)),
    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))  (the Lucene form —
    strictly positive, unlike the raw Robertson idf which can go
    negative for terms in >half the corpus).

    Scale shape: doc lengths are one map-side-combinable aggregation
    over the token explode; the query filter cuts the tf table to
    |Q| terms BEFORE its shuffle, so the scored relation is
    O(docs containing a query term), not O(corpus); df and avgdl ride
    in as broadcast scalars; top-k is TakeOrdered, never a global sort.
    Per-term scores round to 9 decimals before the sum and the sum to 6
    (addition-order-proof -> exact ANSI-oracle hash match).
    """
    toks = _tokens(docs, text_col, id_col)
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.avg("dl").alias("_avgdl"),
        F.count("*").cast("double").alias("_n_docs"),
    )
    qtf = (
        toks.filter(F.col("tok").isin(query_terms))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    qdf = qtf.groupBy("tok").agg(F.count("*").cast("double").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (
        1.0 - b + b * F.col("dl") / F.col("_avgdl")
    )
    term_score = F.round(idf * F.col("tf") * (k1 + 1.0) / denom, 9)
    scored = (
        qtf.join(F.broadcast(qdf), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", term_score.alias("s9"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("s9"), 6).alias("score"), F.count("*").alias("n_terms"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def _pin(col, k: int):
    """floor(x*10^k + 0.5)/10^k — deterministic cross-engine rounding
    (identical IEEE ops in Spark and DuckDB; plain round() diverges at
    exact .5 boundaries, which decimal-sum/count quotients DO hit)."""
    sc = float(10 ** k)
    return F.floor(col * F.lit(sc) + F.lit(0.5)) / F.lit(sc)


def dsir_logweights(
    docs: DataFrame,
    target_col,
    n_buckets: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance weights for data selection (Xie et al.,
    NeurIPS'23): score every document by how much more likely its hashed
    n-gram features are under a target distribution than under the raw
    corpus, so sampling ∝ exp(logw) reshapes the corpus toward the
    target domain.

    ``target_col`` is a boolean Column marking the in-target rows (e.g.
    ``F.col("lang") == "en"`` or a quality gate). Features are unigrams
    hashed into ``n_buckets`` buckets (first 4 md5 hex digits mod B —
    the hashing is the whole point of DSIR: both LMs collapse to
    broadcast-sized count vectors no matter the vocabulary). Both bag-of-
    buckets LMs use add-one smoothing; logw(d) = Σ_tok ln p_target(b(tok))
    − ln p_corpus(b(tok)).

    Scale shape: one token explode -> one (doc, bucket) map-side-combined
    aggregation (≤ B rows per doc); both LMs and their totals are
    broadcast scalars/tables (B rows, independent of corpus size); no
    window, no UDF. Log-ratios round to 9 decimals before the per-doc
    sum and the sum to 6 — the ANSI-oracle hash-match discipline.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), "\\s+")
    base = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            target_col.alias("_t"),
            F.explode(toks).alias("tok"),
        )
        .filter(F.length("tok") > 0)
        .select(
            "doc_id",
            "_t",
            F.expr(
                "pmod(cast(conv(substring(md5(tok), 1, 4), 16, 10) as int), "
                f"{n_buckets})"
            ).alias("b"),
        )
    )
    db = base.groupBy("doc_id", "b").agg(
        F.count("*").alias("n"), F.any_value("_t").alias("_t")
    )
    per_bucket = db.groupBy("b").agg(
        F.sum("n").alias("nc"),
        F.sum(F.when(F.col("_t"), F.col("n")).otherwise(F.lit(0))).alias("nt"),
    )
    totals = per_bucket.agg(
        F.sum("nc").cast("double").alias("_c"),
        F.sum("nt").cast("double").alias("_tt"),
    )
    lm = per_bucket.crossJoin(F.broadcast(totals)).select(
        "b",
        F.round(
            F.log((F.col("nt") + 1.0) / (F.col("_tt") + float(n_buckets)))
            - F.log((F.col("nc") + 1.0) / (F.col("_c") + float(n_buckets))),
            9,
        ).alias("lr"),
    )
    return (
        db.join(F.broadcast(lm), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_toks"),
            # DECIMAL term sum (order-independent) + _pin: round(,6) of
            # a 9dp-termed sum lands on exact .5 boundaries ~1/1000 docs
            _pin(
                F.sum(
                    (F.col("n") * F.col("lr")).cast("decimal(38,9)")
                ).cast("double"),
                6,
            ).alias("logw"),
        )
    )


def cap_per_key(
    df: DataFrame,
    key_col: str,
    k: int,
    id_col: str = "doc_id",
    n_salt: int = 16,
) -> DataFrame:
    """Per-key document cap (the RefinedWeb/Dolma "at most K documents
    per domain" anti-over-representation pass): keep the K rows of each
    key that rank first by a content-stable hash order (md5 of the id,
    id tie-break) — a deterministic uniform sample per key, reproducible
    across reruns and cluster sizes.

    Skew-safe two-phase rank (the politeness_select construction): a
    giant key never serializes into one window task. Phase 1 ranks
    within (key, salt) — any row in the key's true global top-K is in
    its salt group's top-K, so keeping rank<=K per salt group is a
    strict superset. Phase 2 ranks the <= n_salt*K survivors per key
    exactly. Output: (id, key, rk) with rk in [1, K].
    """
    from pyspark.sql import Window

    okey = F.md5(F.col(id_col).cast("string"))
    salted = df.select(
        F.col(id_col).alias("_id"),
        F.col(key_col).alias("_key"),
        okey.alias("_o"),
        F.pmod(F.col(id_col), F.lit(n_salt)).alias("_salt"),
    )
    w1 = Window.partitionBy("_key", "_salt").orderBy(F.asc("_o"), F.asc("_id"))
    survivors = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy("_key").orderBy(F.asc("_o"), F.asc("_id"))
    return (
        survivors.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .select(F.col("_id").alias(id_col), F.col("_key").alias(key_col), "rk")
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """BPE tokenizer TRAINING (the learn side of bpe_apply's encode
    side): ``n_merges`` greedy iterations, each counting adjacent unit
    pairs across the corpus, picking the most frequent pair (ties by
    pair text — deterministic), and rewriting every document's unit
    stream with the ``x y -> x_y`` literal-replace scan both engines
    share. Returns the learned merge table: (merge_rank, a, b, n_pairs).

    Fully distributed per iteration: one explode + map-side-combinable
    count, a TakeOrdered-1 argmax, and the winning merge rejoins as a
    ONE-ROW broadcast (crossJoin) whose columns parameterize the
    replace — no literal ever touches the driver, no UDF, and the doc
    stream is scanned once per merge (the canonical BPE cost model:
    n_merges corpus passes, each embarrassingly parallel). Fixed
    iteration count keeps the plan deterministic, same contract as
    kmeans_refine / link_rank."""
    s = F.concat(
        F.lit(" "),
        F.regexp_replace(F.lower(F.trim(text_col)), r"\s+", " "),
        F.lit(" "),
    )
    cur = docs.select(s.alias("s"))
    merges = []
    for k in range(n_merges):
        # project the split ONCE: lambdas don't CSE, so element_at over
        # the raw split() would re-split per pair position (the
        # bigram_pmi lesson, measured 13x there)
        tk = F.col("__tk")
        pairs = (
            cur.select(F.split(F.trim("s"), " ").alias("__tk"))
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size(tk) - 1),
                        lambda i: F.struct(
                            F.element_at(tk, i).alias("a"),
                            F.element_at(tk, i + 1).alias("b"),
                        ),
                    )
                ).alias("p")
            )
            .select("p.a", "p.b")
        )
        top1 = (
            pairs.groupBy("a", "b")
            .agg(F.count("*").alias("n_pairs"))
            .orderBy(F.desc("n_pairs"), "a", "b")
            .limit(1)
            .withColumn("merge_rank", F.lit(k))
            # eager 1-row checkpoint: every later iteration's plan (and
            # the final merge-table union) references this argmax —
            # without it each of them RE-RUNS this iteration's full
            # corpus pair count, turning n merges into O(n^2) scans
            .localCheckpoint()
        )
        merges.append(top1.select("merge_rank", "a", "b", "n_pairs"))
        cur = cur.crossJoin(F.broadcast(top1)).select(
            F.replace(
                F.col("s"),
                F.concat(F.lit(" "), "a", F.lit(" "), "b", F.lit(" ")),
                F.concat(F.lit(" "), "a", F.lit("_"), "b", F.lit(" ")),
            ).alias("s")
        )
        # plan depth is linear in the merge count (inherent to BPE);
        # flatten the lineage periodically so a 10^4-merge vocabulary
        # build doesn't drown the analyzer (same guard as link_rank)
        if (k + 1) % 8 == 0 and k + 1 < n_merges:
            cur = cur.localCheckpoint()
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


def train_linear_probe(
    docs: DataFrame,
    n_iter: int = 3,
    lr: float = 0.5,
    n_buckets: int = 16,
    text_col: str = "text",
    label_expr: str = "cast(lang = 'en' as double)",
) -> DataFrame:
    """Distributed logistic-regression TRAINING (full-batch gradient
    descent) for a language/quality probe over hashed-unigram features
    — the learn side of `quality_classifier` / `embedding_classifier`
    (which only run inference on frozen literal weights). At corpus
    scale this is the standard shape: each GD step is one
    map-side-combinable aggregate over the fact table; the model (17
    rows: 16 hashed-bucket fractions + bias) is dimension-sized and
    broadcast back. No MLlib, no Python loop over rows — the entire
    step is native expressions.

    Numeric discipline (the zipf_fit / lm_perplexity contract): every
    per-row term is pinned to the 1e-9 grid with the floor(x*1e9+0.5)
    rule (NOT round() — engines disagree at exact half boundaries) and
    summed as DECIMAL(28,9) — order-independent, engine-exact. The link
    function is the HARD sigmoid clamp(0.5 + z/4, 0, 1) (Collobert '04;
    the standard quantized-net surrogate), not 1/(1+exp(-z)): libm/JVM
    exp() differ by 1 ulp on some inputs, and a 1-ulp difference that
    lands on a grid half boundary diverges the whole trajectory — hard
    sigmoid is dyadic arithmetic only, so both engines compute the
    bit-identical double. lr should be dyadic (0.5) so the update
    multiply is exact.

    Features are computed ONCE and persisted; each iteration costs one
    join against the 17-row weight table + two tiny aggregates.
    Returns (j, weight) with j = bucket 0..n_buckets-1, bias at
    j = n_buckets.
    """
    spark = docs.sparkSession
    dig = (
        "(instr('0123456789abcdef', "
        "substring(md5(concat('probe:', tok)), 1, 1)) - 1)"
    )
    toks = _tokens(docs, text_col, "doc_id").withColumn(
        "j", F.expr(f"cast({dig} % {n_buckets} as int)")
    )
    counts = toks.groupBy("doc_id", "j").agg(F.count("*").alias("c"))
    totals = toks.groupBy("doc_id").agg(F.count("*").alias("n_toks"))
    feats = (
        counts.join(totals, "doc_id")
        .select(
            "doc_id",
            "j",
            F.round(F.col("c") / F.col("n_toks"), 9).alias("x"),
        )
        .unionByName(
            totals.select(
                "doc_id",
                F.lit(n_buckets).alias("j"),
                F.lit(1.0).alias("x"),  # bias term
            )
        )
        .persist()
    )
    labels = docs.select(
        "doc_id", F.expr(label_expr).alias("y")
    ).persist()
    n_docs = labels.count()  # also materializes both persists' parent
    w = spark.range(n_buckets + 1).select(
        F.col("id").cast("int").alias("j"), F.lit(0.0).alias("w")
    )
    from crawler_spark.functions.num import pin9

    for _ in range(n_iter):
        z = (
            feats.join(F.broadcast(w), "j")
            .withColumn(
                "term",
                pin9(F.col("x") * F.col("w")).cast("decimal(28, 9)"),
            )
            .groupBy("doc_id")
            .agg(pin9(F.sum("term").cast("double")).alias("z"))
        )
        sig = F.least(
            F.lit(1.0),
            F.greatest(F.lit(0.0), F.lit(0.5) + F.col("z") / F.lit(4.0)),
        )
        resid = z.join(labels, "doc_id").select(
            "doc_id",
            pin9(pin9(sig) - F.col("y")).alias("r"),
        )
        grad = (
            feats.join(resid, "doc_id")
            .withColumn(
                "gterm",
                pin9(F.col("x") * F.col("r")).cast("decimal(28, 9)"),
            )
            .groupBy("j")
            .agg(
                pin9(
                    F.sum("gterm").cast("double") / F.lit(float(n_docs))
                ).alias("g")
            )
        )
        w = (
            w.join(grad, "j", "left")
            .select(
                "j",
                pin9(
                    F.col("w") - F.lit(lr) * F.coalesce("g", F.lit(0.0))
                ).alias("w"),
            )
            .localCheckpoint()  # 17 rows; truncates the iteration chain
        )
    feats.unpersist()
    labels.unpersist()
    return w.select("j", F.col("w").alias("weight"))


# ------------------------------------------ compression-ratio quality gate


def compression_gate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_ratio: float = 0.25,
    max_ratio: float = 0.95,
) -> DataFrame:
    """Deflate-ratio quality gate (the CCNet/Gopher-family repetition
    proxy): compressed_len / raw_len of the UTF-8 text. Ultra-low ratios
    mean machine-generated repetition (template farms, keyword stuffing
    — the same pathology crawl_trap_score catches at the URL level);
    ratios near 1 mean high-entropy non-text (base64 blobs, minified
    bundles, binary mislabeled as text).

    zlib is stdlib and level-pinned, so the measure is deterministic for
    the environment; it still isn't SQL-expressible, so the shipped query
    is rows-only and the pytest mirrors it with direct zlib calls.
    Vectorized pandas UDF (one Arrow batch per call — the only Python
    loop is over in-memory batch rows); everything downstream is native.
    At 10^10 docs this is a pure map stage: no shuffle, prunes to the
    text column only.
    """
    def _comp(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            enc = [
                ("" if t is None else t).encode("utf-8") for t in pdf["text"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "raw_len": [len(b) for b in enc],
                    "comp_len": [len(zlib.compress(b, 6)) for b in enc],
                }
            )

    c = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).mapInPandas(_comp, "doc_id long, raw_len int, comp_len int")
    ratio = F.floor(
        F.col("comp_len").cast("double")
        * F.lit(1e6)
        / F.greatest(F.col("raw_len"), F.lit(1))
        + F.lit(0.5)
    ) / F.lit(1e6)
    return c.select(
        "doc_id",
        "raw_len",
        "comp_len",
        ratio.alias("ratio"),
        ((ratio >= min_ratio) & (ratio <= max_ratio)).alias("pass_compression"),
    )


# ------------------------------------------ water-filling budget allocation


def waterfill_allocation(
    groups: DataFrame,
    budget: float,
    key_col: str = "key",
    cap_col: str = "cap",
    weight_col: str = "w",
) -> DataFrame:
    """Weighted water-filling: allocate ``budget`` across groups as
    A_i = min(cap_i, lambda * w_i), with the water level lambda chosen
    so the allocations exactly exhaust the budget (or every cap binds).
    This is the UniMax-family allocation (Chung et al. '23): spread a
    token budget proportionally but never draw more than a group's cap
    (epochs x available tokens) — the groups the proportional share
    would over-draw saturate, and their surplus redistributes to the
    rest at a higher water level.

    Closed form, not iteration: sort groups by cap_i/w_i ascending;
    in the segment where exactly the first k caps bind, lambda_k =
    (budget - sum_{i<=k} cap_i) / sum_{i>k} w_i; the correct k is the
    unique one with cap_k/w_k <= lambda_k < cap_{k+1}/w_{k+1} (k may
    be 0 or all). One window pass over the GROUP DIMENSION (languages,
    sources — dimension-sized by definition), never the corpus.

    Returns (key, cap, w, ratio, alloc, saturated). Allocations are
    exact doubles of the closed form; callers pin for display. If
    budget >= sum(cap), every group saturates at its cap.
    """
    from pyspark.sql import Window

    from crawler_spark.functions.num import pin9

    # cap/w pinned to the 1e-9 grid and ACCUMULATED AS DECIMAL: window
    # cumulative float sums have engine-internal association order, so
    # prefix sums must be exact to stay oracle-identical
    r = groups.select(
        F.col(key_col).alias("key"),
        pin9(F.col(cap_col).cast("double")).alias("cap"),
        pin9(F.col(weight_col).cast("double")).alias("w"),
    ).withColumn("ratio", F.col("cap") / F.col("w"))
    wo = Window.orderBy("ratio", "key")
    wcum = wo.rowsBetween(Window.unboundedPreceding, 0)
    wall = wo.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    capd = F.col("cap").cast("decimal(28, 9)")
    wd = F.col("w").cast("decimal(28, 9)")
    staged = (
        r.withColumn("cum_cap", F.sum(capd).over(wcum).cast("double"))
        .withColumn("cum_w", F.sum(wd).over(wcum).cast("double"))
        .withColumn("tot_w", F.sum(wd).over(wall).cast("double"))
        .withColumn(
            "lam_here",
            (F.lit(float(budget)) - (F.col("cum_cap") - F.col("cap")))
            / (F.col("tot_w") - (F.col("cum_w") - F.col("w"))),
        )
    )
    # the water level is the max over groups of min(lam_here, ratio):
    # for saturated groups min() = ratio (<= lambda), for the first
    # unsaturated group lam_here IS lambda — a single scalar aggregate
    lam_row = staged.agg(
        F.max(F.least(F.col("lam_here"), F.col("ratio"))).alias("lam")
    )
    return (
        staged.crossJoin(F.broadcast(lam_row))
        .select(
            "key",
            "cap",
            "w",
            "ratio",
            F.least(F.col("cap"), F.col("lam") * F.col("w")).alias("alloc"),
            (F.col("ratio") <= F.col("lam")).alias("saturated"),
        )
    )


# --------------------------------------------- training-window chunking


def chunk_windows(
    docs: DataFrame,
    window: int = 128,
    stride: int = 96,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window chunking for pretraining: split each document
    into token windows of ``window`` tokens advancing by ``stride``
    (overlap = window - stride keeps context across cuts — the
    standard LM data prep next to `sequence_packing`'s bin packing:
    packing fills fixed budgets with WHOLE short docs; chunking cuts
    LONG docs down to budget). Pure per-row array expressions
    (split/sequence/slice) — zero shuffle, no explode of tokens (the
    explode is per WINDOW, ~n/stride rows per doc).

    Returns (doc_id, chunk_id, start_tok, n_toks, chunk_md5) — the
    window text is carried as its md5 so the frame stays narrow; a
    trainer materializes text by re-slicing at shard-write time.
    """
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), "\\s+"),
        lambda x: x != "",
    )
    d = docs.select(F.col(id_col).alias("doc_id"), toks.alias("__tk")).filter(
        F.size("__tk") > 0
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("__tk") - 1, F.lit(0)), F.lit(stride)
    )
    return (
        d.select("doc_id", F.size("__tk").alias("__n"), "__tk",
                 F.posexplode(starts).alias("chunk_id", "start_tok"))
        # drop tail starts whose window is a strict SUFFIX of the
        # previous one (prev window already reached the end): shipping
        # those re-duplicates the doc tail — the very thing the dedup
        # pipeline exists to remove
        .filter(
            (F.col("start_tok") == 0)
            | (F.col("start_tok") + F.lit(window - stride) < F.col("__n"))
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("start_tok").cast("long").alias("start_tok"),
            F.least(
                F.lit(window), F.col("__n") - F.col("start_tok")
            ).cast("long").alias("n_toks"),
            F.md5(
                F.array_join(
                    F.slice(F.col("__tk"), F.col("start_tok") + 1, window),
                    " ",
                )
            ).alias("chunk_md5"),
        )
    )


def kn_bigram_scores(
    docs: DataFrame,
    discount: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM quality scoring — the stronger
    form of the CCNet perplexity filter (lm_perplexity_scores above is
    the unigram version): train absolute-discount interpolated KN
    (Kneser & Ney, ICASSP '95; Chen & Goodman '98 eq. 4.less) on the
    corpus itself and score every document's bigram stream.

      P(w|v) = max(c(vw) - D, 0)/c(v)  +  D * N1+(v*)/c(v) * Pcont(w)
      Pcont(w) = N1+(*w) / |distinct bigram types|

    The continuation probability is what the unigram filter cannot
    express: "francisco" is frequent but follows almost only "san", so
    KN scores it low in novel contexts — templated boilerplate (few
    distinct continuations) separates from fluent text at equal token
    frequency. Every document's first token takes the '<s>' context, so
    every token is scored under exactly one bigram.

    Shape: one explode into (v, w) bigram events, three map-side-
    combinable aggregations over it (bigram counts; per-context totals
    + distinct-continuation counts in ONE pass; per-word preceding-
    context counts), a one-row broadcast scalar for the type count, and
    one join of the model back onto the bigram stream. The model tables
    are vocabulary-sized, not corpus-sized — at 100 TB the bigram join
    is the only full shuffle.

    Determinism (same contract as lm_perplexity_scores): P is built
    from integer counts with an identical double operation tree in the
    SQL oracle, per-token ln rounded to 6 dp, summed as DECIMAL —
    order-independent, so partial aggregation cannot move the hash.
    Returns (doc_id, n_tok, avg_logprob, ppl).
    """
    arr = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), "\\s+"),
        lambda x: x != "",
    )
    big = (
        docs.select(F.col(id_col).alias("doc_id"), arr.alias("a"))
        .filter(F.size("a") > 0)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(a)), i -> struct("
                    "  if(i = 1, '<s>', element_at(a, i - 1)) AS v,"
                    "  element_at(a, i) AS w))"
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b.v").alias("v"), F.col("b.w").alias("w"))
    )
    c_vw = big.groupBy("v", "w").agg(F.count("*").alias("n_vw")).localCheckpoint()
    ctx = c_vw.groupBy("v").agg(
        F.sum("n_vw").cast("double").alias("c_v"),
        F.count("*").cast("double").alias("n1f"),  # N1+(v*)
    )
    cont = c_vw.groupBy("w").agg(
        F.count("*").cast("double").alias("n1b")  # N1+(*w)
    )
    types = c_vw.agg(F.count("*").cast("double").alias("n_types"))
    D = F.lit(float(discount))
    p = (
        F.greatest(F.col("n_vw").cast("double") - D, F.lit(0.0))
        / F.col("c_v")
        + D * F.col("n1f") / F.col("c_v")
        * (F.col("n1b") / F.col("n_types"))
    )
    lp6 = F.round(F.log(p), 6).cast("decimal(20,6)")
    return (
        big.join(c_vw, ["v", "w"])
        .join(ctx, "v")
        .join(cont, "w")
        .crossJoin(F.broadcast(types))
        .select("doc_id", lp6.alias("lp6"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tok"), F.sum("lp6").alias("sum_lp"))
        .select(
            "doc_id",
            "n_tok",
            _pin(F.col("sum_lp").cast("double") / F.col("n_tok"), 6).alias(
                "avg_logprob"
            ),
            _pin(
                F.exp(
                    -_pin(F.col("sum_lp").cast("double") / F.col("n_tok"), 6)
                ),
                4,
            ).alias("ppl"),
        )
    )


def greedy_max_cover(
    membership: DataFrame,
    k: int,
    set_col: str = "set_id",
    elem_col: str = "elem",
) -> "DataFrame":
    """Greedy maximum-coverage selection (Nemhauser/Wolsey/Fisher '78:
    the (1 - 1/e)-approximation for submodular maximization — the
    textbook guarantee, and NP-hard to beat in general): pick k sets
    maximizing the size of their union. The curation uses: choose k
    data sources covering the most vocabulary, k seed hosts covering
    the most reachable hosts, k eval slices covering the most
    behaviors.

    Scale shape (kcenter_sample's contract): greedy is inherently
    k-sequential, but each round is narrow distributed work — one
    map-side-combinable count over the REMAINING membership rows, one
    TakeOrdered(1) argmax (count desc, set_id asc — deterministic
    ties), and one broadcast anti-join that deletes the newly covered
    elements. Rows only ever shrink; driver traffic is one row per
    round. localCheckpoint every other round keeps the plan flat.

    Returns (pick_order, set_id, marginal, cumulative) — marginal =
    newly covered elements at that pick, cumulative = running union
    size. Stops early (fewer than k rows) when coverage is exhausted.
    """
    remaining = membership.select(
        F.col(set_col).alias("s"), F.col(elem_col).alias("e")
    ).distinct().localCheckpoint(eager=True)
    picks = []
    cum = 0
    for t in range(1, int(k) + 1):
        top = (
            remaining.groupBy("s")
            .agg(F.count("*").alias("gain"))
            .orderBy(F.desc("gain"), F.asc("s"))
            .head()
        )
        if top is None:
            break
        cum += int(top["gain"])
        picks.append((t, top["s"], int(top["gain"]), cum))
        # one set's element list; AQE broadcasts it while it fits and
        # falls back to a shuffle anti-join for a genuinely huge set
        covered = remaining.filter(F.col("s") == top["s"]).select("e")
        remaining = remaining.join(covered, "e", "left_anti")
        if t % 2 == 0:
            remaining = remaining.localCheckpoint(eager=True)
    spark = membership.sparkSession
    return spark.createDataFrame(
        picks, "pick_order int, set_id string, marginal long, cumulative long"
    )


def span_removal_manifest(
    docs: DataFrame,
    window: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Global span-dedup APPLY manifest (the application side of the
    C4/Lee-et-al rule whose statistics span_dedup_stats reports): every
    ``window``-token span occurring in >= 2 DISTINCT documents is
    duplicate mass; this computes, per document, the MERGED token
    intervals to cut — overlapping flagged windows coalesce into
    maximal intervals (gaps-and-islands over the window positions, a
    doc-partitioned window — never a global sort), so the removal is
    well-defined even when consecutive windows chain.

    Shape: one explode to (doc, pos, window-fp), one fp-level distinct-
    doc count joined back (duplicate-mass table is fp-dimensional),
    then per-doc island merging: running max of interval ends over
    preceding rows -> island breaks -> per-island [start, end]. Returns
    (doc_id, n_tokens, n_dup_windows, n_intervals, tokens_removed,
    removal_ratio6); docs with no duplicated spans report zeros.
    """
    from pyspark.sql import Window

    def pin6(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    ws = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"), ws.alias("ws")
    ).withColumn("n_tokens", F.size("ws"))
    wins = (
        base.filter(F.col("n_tokens") >= window)
        .select(
            "doc_id",
            "n_tokens",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(ws) - {window - 1}),"
                    f" i -> struct(i AS pos,"
                    f" md5(concat_ws(' ', slice(ws, i, {window}))) AS fp))"
                )
            ).alias("w"),
        )
        .select("doc_id", "n_tokens", F.col("w.pos").alias("pos"), F.col("w.fp").alias("fp"))
    )
    dupfp = (
        wins.groupBy("fp")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("fp")
    )
    flagged = wins.join(dupfp, "fp").select(
        "doc_id", "n_tokens", "pos", (F.col("pos") + F.lit(window - 1)).alias("end")
    )
    byd = Window.partitionBy("doc_id").orderBy("pos")
    prev_max = (
        F.max("end")
        .over(byd.rowsBetween(Window.unboundedPreceding, -1))
    )
    islanded = flagged.withColumn(
        "brk",
        F.when(
            prev_max.isNull() | (F.col("pos") > prev_max + 1), 1
        ).otherwise(0),
    ).withColumn(
        "island",
        F.sum("brk").over(byd.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_island = islanded.groupBy("doc_id", "n_tokens", "island").agg(
        F.min("pos").alias("s"),
        F.max("end").alias("e"),
        F.count("*").alias("n_w"),
    )
    per_doc = per_island.groupBy("doc_id", "n_tokens").agg(
        F.sum("n_w").alias("n_dup_windows"),
        F.count("*").alias("n_intervals"),
        F.sum(F.col("e") - F.col("s") + 1).alias("tokens_removed"),
    )
    return (
        base.select("doc_id", "n_tokens")
        .join(per_doc.drop("n_tokens"), "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
            F.coalesce("n_intervals", F.lit(0)).alias("n_intervals"),
            F.coalesce("tokens_removed", F.lit(0)).alias("tokens_removed"),
            pin6(
                F.coalesce("tokens_removed", F.lit(0)).cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("removal_ratio6"),
        )
    )


def epoch_shuffle_manifest(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    epoch: int,
    block_rows: int = 256,
) -> DataFrame:
    """Epoch-deterministic global training shuffle -> block manifest.

    Every LLM training run re-orders its corpus once per epoch, and the
    ordering must be (a) a fresh permutation each epoch (repeated batch
    neighborhoods measurably hurt convergence), (b) REPRODUCIBLE from
    (corpus, epoch) alone — restarts, re-shards and cluster-size changes
    must not change what batch 1734 contained, which rules out
    ``df.orderBy(rand())`` and anything partition-count-dependent — and
    (c) cheap: one range shuffle, not a driver-side permutation array
    (10^10 positions do not fit anywhere). The standard answer is a
    keyed hash order: position = rank of md5('esh{epoch}:' + key), a
    pseudorandom permutation that any worker can recompute locally.

    This computes that order and rolls it into consecutive
    ``block_rows``-sized blocks (the I/O unit a data loader prefetches),
    returning the manifest one row per block: (block_id, n_rows,
    weight_sum = pinned sum of ``weight_col`` — the token-budget view —
    and h_lo/h_hi, the block's order-hash range, which doubles as an
    integrity checksum: a re-run that produces a different permutation
    cannot reproduce the same per-block hash fences).

    Scale shape: the global rank is `operators/sequence.assign_dense_seq`
    (range-repartition + per-partition sort + broadcast offsets — no
    single-partition window); the manifest is n/block_rows rows. The
    manifest is eagerly localCheckpoint-ed so the range-partition
    persist can be released before returning (equi_depth_histogram's
    lifecycle). Epoch enters only through the hash salt, so epoch e and
    e' differ by a full re-permutation while each remains individually
    stable.
    """
    from crawler_spark.functions.num import pin9
    from crawler_spark.operators.sequence import assign_dense_seq

    keyed = df.select(
        F.col(key_col).alias("id"),
        F.col(weight_col).cast("double").alias("wt"),
    ).withColumn(
        "h",
        F.expr(
            f"cast(conv(substring(md5(concat('esh{int(epoch)}:', "
            f"cast(id as string))), 1, 15), 16, 10) as bigint)"
        ),
    )
    ranked, _n, handle = assign_dense_seq(keyed, ["h", "id"], "_pos")
    manifest = (
        ranked.withColumn(
            "block_id", F.expr(f"_pos div {int(block_rows)}").cast("long")
        )
        .groupBy("block_id")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(pin9(F.col("wt")).cast("decimal(28,9)"))
            .cast("double")
            .alias("weight_sum"),
            F.min("h").alias("h_lo"),
            F.max("h").alias("h_hi"),
        )
        .localCheckpoint(eager=True)
    )
    handle.unpersist()
    return manifest
