"""Pipeline self-evaluation operators: the "measure, don't guess" layer.

A curation cascade that ships blind is a liability at 100 TB — every
approximate stage (LSH banding, retrieval embeddings, the politeness
scheduler) needs a cheap, *distributed* evaluation query that reports
how well the approximation tracks its exact ground truth ON THE CORPUS
IT RUNS OVER, not on a benchmark from a paper. These operators compute:

* cross-modal retrieval quality (recall@k / MRR of caption retrieval
  against the own-caption ground truth — the CLIP-eval shape),
* LSH dedup precision/recall against exact n-gram Jaccard truth,
* scheduling fairness (Jain index / Gini) over per-key served counts.

All three are single-digit-shuffle DataFrame plans with exact ANSI-SQL
oracles; none collects data to the driver. Reference parity note: the
reference crawler has no evaluation layer at all (its QA is manual
inspection of MySQL rows) — this is engine-native infrastructure the
survey's scale brief requires, not a ported behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _cos6(a, b):
    """round-6 cosine of two double-array columns, each fold round-9
    stabilized first (same recipe as pairs.caption_alignment — fold
    order differs between engines, so raw sums differ in the last ulp)."""
    dot = F.round(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        9,
    )
    na = F.sqrt(F.round(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x), 9))
    nb = F.sqrt(F.round(F.aggregate(b, F.lit(0.0), lambda s, x: s + x * x), 9))
    return F.round(dot / (na * nb), 6)


def crossmodal_retrieval_eval(
    docs: DataFrame,
    embeddings: DataFrame,
    dim: int = 32,
    sample_mod: int = 8,
    mrr_k: int = 10,
) -> DataFrame:
    """Caption-retrieval evaluation over the shared image/caption space:
    for a deterministic sample of images (``vec_id % sample_mod == 0``),
    rank EVERY caption by exact cosine and find where the image's own
    caption lands. Returns ONE row: n_queries, recall@1, recall@5,
    MRR@``mrr_k`` — the numbers a CLIP-style curation run reports per
    wave to catch embedding drift.

    Scale shape: the ranking is brute-force over (sample x corpus) BY
    DESIGN — an eval wants the exact ranking, and the sample keeps the
    pair volume at (n/sample_mod) * n, a dial. At 10^10 pairs the same
    query runs with sample_mod ~ 10^6 (a few thousand queries is a tight
    confidence interval for recall@k); the per-query ranking is a
    map-side-combinable window over each image's candidate rows, and the
    final reduce is a 1-row agg. Ties rank by caption id so the output
    is cluster-size independent.
    """
    from crawler_spark.operators.pairs import caption_projection

    def _norm9(col):
        return F.sqrt(
            F.round(F.aggregate(col, F.lit(0.0), lambda s, x: s + x * x), 9)
        )

    # Per-side norms are computed ONCE per vector below the join, and the
    # caption side passes through an exchange so the md5-digit projection
    # materializes per caption — without the boundary Catalyst inlines
    # the 32-expression array into the join output and re-derives it (and
    # the norm fold) for every PAIR: O(sample x corpus) md5 calls.
    cap = caption_projection(docs, dim).select(
        F.col("image_id").alias("cap_id"), "cv"
    )
    cap = cap.withColumn("nb", _norm9(F.col("cv"))).repartition(
        docs.sparkSession.sparkContext.defaultParallelism
    )
    img = embeddings.filter(F.col("vec_id") % sample_mod == 0).select(
        F.col("vec_id").alias("image_id"),
        F.slice(F.col("embedding"), 1, dim).cast("array<double>").alias("iv"),
    )
    img = img.withColumn("na", _norm9(F.col("iv")))
    dot = F.round(
        F.aggregate(
            F.zip_with("iv", "cv", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        9,
    )
    # the SAMPLE side is broadcast and the caption corpus streams — the
    # corpus is the big side at scale; a default crossJoin would build
    # (broadcast) whichever side the planner guesses
    scored = cap.crossJoin(F.broadcast(img)).select(
        "image_id",
        "cap_id",
        F.round(dot / (F.col("na") * F.col("nb")), 6).alias("s"),
    )
    w = Window.partitionBy("image_id").orderBy(F.col("s").desc(), F.col("cap_id"))
    own = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("cap_id") == F.col("image_id"))
        .select("image_id", "rnk")
    )
    return own.agg(
        F.count("*").alias("n_queries"),
        F.round(F.avg((F.col("rnk") <= 1).cast("double")), 6).alias("recall_at_1"),
        F.round(F.avg((F.col("rnk") <= 5).cast("double")), 6).alias("recall_at_5"),
        F.round(
            F.avg(
                F.when(F.col("rnk") <= mrr_k, F.lit(1.0) / F.col("rnk")).otherwise(
                    F.lit(0.0)
                )
            ),
            6,
        ).alias("mrr_at_10"),
    )


def lsh_dedup_eval(
    docs: DataFrame,
    threshold: float = 0.5,
    n_bands: int = 4,
    rows_per_band: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """Precision/recall of MinHash (b, r) banding against exact n-gram
    Jaccard >= ``threshold`` truth, on this corpus. Returns ONE row:
    n_pred, n_truth, n_hit, precision, recall, f1.

    This is the query that decides whether a banding config is safe to
    ship: the S-curve 1-(1-s^r)^b predicts recall at the threshold, but
    only the corpus's actual similarity distribution decides precision.
    Both sides reuse the production operators (minhash_banded_pairs /
    ngram_jaccard_pairs), so the eval measures exactly what runs; the
    join of the two pair sets is keyed on (doc_a, doc_b) — candidate-
    volume sized, never corpus-squared."""
    from crawler_spark.operators.dedup import (
        minhash_banded_pairs,
        ngram_jaccard_pairs,
    )

    pred = minhash_banded_pairs(
        docs, n_bands=n_bands, rows_per_band=rows_per_band, shingle_n=shingle_n
    ).select("doc_a", "doc_b", F.lit(1).alias("p"))
    truth = ngram_jaccard_pairs(
        docs, shingle_n=shingle_n, threshold=threshold
    ).select("doc_a", "doc_b", F.lit(1).alias("t"))
    j = pred.join(truth, ["doc_a", "doc_b"], "full_outer")
    return j.agg(
        F.sum(F.coalesce(F.col("p"), F.lit(0))).alias("n_pred"),
        F.sum(F.coalesce(F.col("t"), F.lit(0))).alias("n_truth"),
        F.sum(
            (F.col("p").isNotNull() & F.col("t").isNotNull()).cast("long")
        ).alias("n_hit"),
    ).select(
        "n_pred",
        "n_truth",
        "n_hit",
        F.round(F.col("n_hit") / F.nullif(F.col("n_pred"), F.lit(0)), 6).alias(
            "precision"
        ),
        F.round(F.col("n_hit") / F.nullif(F.col("n_truth"), F.lit(0)), 6).alias(
            "recall"
        ),
        F.round(
            2.0
            * F.col("n_hit")
            / F.nullif(F.col("n_pred") + F.col("n_truth"), F.lit(0)),
            6,
        ).alias("f1"),
    )


def fairness_report(counts: DataFrame, key_col: str, n_col: str) -> DataFrame:
    """Scheduling-fairness dashboard over per-key served counts
    (key = host for the politeness scheduler, fetcher for HRW
    assignment): ONE row with n_keys, total, Jain's fairness index
    (sum x)^2 / (n * sum x^2) — 1.0 = perfectly even, 1/n = one key
    starves all others — plus the Gini coefficient and the hottest key's
    share. The input is already aggregated (one row per key), so every
    stage here is dimension-sized; the Gini's sort is a window over
    n_keys rows, never the fact table. All terms are integer sums, so
    the rounded ratios are engine-exact."""
    x = counts.select(
        F.col(key_col).alias("k"), F.col(n_col).cast("long").alias("x")
    )
    w = Window.orderBy(F.col("x"), F.col("k"))
    ranked = x.withColumn("i", F.row_number().over(w))
    return ranked.agg(
        F.count("*").alias("n_keys"),
        F.sum("x").alias("total"),
        F.round(
            (F.sum("x") * F.sum("x")) / (F.count("*") * F.sum(F.col("x") * F.col("x"))),
            6,
        ).alias("jain_index"),
        # Gini over ascending-sorted counts: (2*sum(i*x_i) - (n+1)*sum x) / (n*sum x)
        F.round(
            (2 * F.sum(F.col("i") * F.col("x")) - (F.count("*") + 1) * F.sum("x"))
            / (F.count("*") * F.sum("x")),
            6,
        ).alias("gini"),
        F.round(F.max("x") / F.sum("x"), 6).alias("top_share"),
    )


def ann_recall_eval(
    emb: DataFrame,
    sample_mod: int = 97,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
) -> DataFrame:
    """Recall@k of the IVF index against exact brute-force truth, per
    query — the ANN quality gate that decides the n_probe/n_cells
    trade-off ON THIS CORPUS (the companion to lsh_dedup_eval for the
    similarity side). Queries are a deterministic ``vec_id %
    sample_mod == 0`` sample; truth ranks ALL vectors per query, the
    approximate side is the production ivf_topk_batch plan. Output per
    query: n_hit (approx ∩ truth), recall.

    The truth side is brute-force over (sample x corpus) by design —
    same dial as crossmodal_retrieval_eval; the eval's cost is the
    sample size, never the index's."""
    from crawler_spark.operators.similarity import _dot, _norm, ivf_topk_batch

    queries = emb.filter(F.col("vec_id") % sample_mod == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    approx = ivf_topk_batch(
        emb, queries, k=k, n_cells=n_cells, n_probe=n_probe
    ).select("query_id", "vec_id")
    scored = emb.crossJoin(F.broadcast(queries)).select(
        "query_id",
        "vec_id",
        F.round(
            _dot(F.col("embedding"), F.col("qv"))
            / (_norm(F.col("embedding")) * _norm(F.col("qv"))),
            6,
        ).alias("cosine"),
    )
    wt = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    truth = (
        scored.withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id")
    )
    hits = truth.join(
        approx.withColumn("hit", F.lit(1)), ["query_id", "vec_id"], "left"
    )
    return hits.groupBy("query_id").agg(
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"),
        F.round(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.lit(k), 6
        ).alias("recall"),
    )


def snm_blocking_eval(
    docs: DataFrame,
    key_chars: int = 12,
    window: int = 4,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Blocking recall/precision of sorted-neighborhood candidates
    against exact n-gram Jaccard >= ``threshold`` truth — the companion
    to lsh_dedup_eval for the SNM family: LSH recall depends on the
    similarity S-curve, SNM recall depends on whether near-dups SORT
    adjacently under the blocking key, and only the corpus decides
    either. Candidate pairs are normalized to (min_id, max_id) so both
    sides key identically. One row: n_pred, n_truth, n_hit, precision,
    recall, f1. Same scale contract as lsh_dedup_eval: the eval join is
    candidate-volume sized, never corpus-squared."""
    from crawler_spark.operators.dedup import (
        ngram_jaccard_pairs,
        snm_candidate_pairs,
    )

    keyed = docs.select(
        "doc_id",
        F.substring(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "),
            1,
            key_chars,
        ).alias("k"),
    )
    pred = (
        snm_candidate_pairs(keyed, "k", "doc_id", window=window)
        .select(
            F.least("id_a", "id_b").alias("doc_a"),
            F.greatest("id_a", "id_b").alias("doc_b"),
        )
        .distinct()
        .withColumn("p", F.lit(1))
    )
    truth = ngram_jaccard_pairs(
        docs, shingle_n=shingle_n, threshold=threshold
    ).select("doc_a", "doc_b", F.lit(1).alias("t"))
    j = pred.join(truth, ["doc_a", "doc_b"], "full_outer")
    return j.agg(
        F.sum(F.coalesce(F.col("p"), F.lit(0))).alias("n_pred"),
        F.sum(F.coalesce(F.col("t"), F.lit(0))).alias("n_truth"),
        F.sum(
            (F.col("p").isNotNull() & F.col("t").isNotNull()).cast("long")
        ).alias("n_hit"),
    ).select(
        "n_pred",
        "n_truth",
        "n_hit",
        F.round(
            F.col("n_hit") / F.nullif(F.col("n_pred"), F.lit(0)), 6
        ).alias("precision"),
        F.round(
            F.col("n_hit") / F.nullif(F.col("n_truth"), F.lit(0)), 6
        ).alias("recall"),
        F.round(
            F.lit(2.0)
            * F.col("n_hit")
            / F.nullif(F.col("n_pred") + F.col("n_truth"), F.lit(0)),
            6,
        ).alias("f1"),
    )


def rrf_fuse(
    rankings: DataFrame,
    k_const: int = 60,
    top_k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rnk",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher SIGIR'09):
    fuse per-query rankings from heterogeneous retrievers (BM25-style
    lexical, embedding cosine, ...) by summing 1/(k + rank) per list a
    document appears in — rank-only fusion, so incomparable raw scores
    (cosine in [-1,1] vs unbounded tf-idf) never need calibration,
    and k=60 damps any single list's head. The standard first-stage
    combiner in hybrid search.

    ``rankings``: (query_col, id_col, rank_col) with one row per
    (query, doc, list); the list identity itself is irrelevant to the
    score. Contributions are 1e-9-pinned and decimal-summed (order
    independent); ties break on id. Everything is dimension-shaped:
    per query only the union of top lists is touched, never the corpus.

    Returns (query_col, id_col, n_lists, rrf, fused_rank) truncated to
    ``top_k`` per query.
    """
    from pyspark.sql import Window

    contrib = F.floor(
        F.lit(1.0) / (F.lit(float(k_const)) + F.col(rank_col)) * F.lit(1e9)
        + F.lit(0.5)
    ).cast("double") / F.lit(1e9)
    agg = (
        rankings.withColumn("_c", contrib.cast("decimal(28,9)"))
        .groupBy(query_col, id_col)
        .agg(
            F.count("*").cast("long").alias("n_lists"),
            F.sum("_c").cast("double").alias("rrf"),
        )
    )
    w = Window.partitionBy(query_col).orderBy(F.desc("rrf"), id_col)
    return (
        agg.withColumn("fused_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("fused_rank") <= top_k)
    )


def auc_exact(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label_bin",
) -> DataFrame:
    """Exact tie-aware ROC AUC via the rank-sum identity (AUC =
    Mann-Whitney U / (n_pos * n_neg), midranks for ties) — the
    ranking-quality number the threshold metrics (precision/recall in
    lsh_dedup_eval, F1 in snm_blocking_eval) cannot give: how well a
    classifier ORDERS the corpus, independent of any cutoff.

    Scale shape: one (score -> n, n_pos) aggregation over the facts,
    then a window over the DISTINCT-SCORE dimension only (scores are
    pinned to a finite grid by every classifier here; the edh sample
    is the continuous swap) — never a global rank over the corpus.
    All rank arithmetic is exact in doubles (midranks are halves of
    integers; sums stay far below 2^52), so the oracle matches
    bit-for-bit. Returns (n_pos, n_neg, auc6).
    """
    from pyspark.sql import Window

    g = scored.groupBy(F.col(score_col).alias("s")).agg(
        F.count("*").alias("n_g"),
        F.sum(F.col(label_col).cast("long")).alias("np_g"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = g.withColumn(
        "cum_before", F.coalesce(F.sum("n_g").over(w), F.lit(0))
    ).withColumn(
        "upart",
        F.col("np_g").cast("double")
        * (
            F.col("cum_before").cast("double")
            + (F.col("n_g").cast("double") + F.lit(1.0)) / F.lit(2.0)
        ),
    )
    return ranked.agg(
        F.sum("np_g").alias("n_pos"),
        (F.sum("n_g") - F.sum("np_g")).alias("n_neg"),
        (
            F.floor(
                (
                    (
                        F.sum("upart")
                        - F.sum("np_g").cast("double")
                        * (F.sum("np_g").cast("double") + F.lit(1.0))
                        / F.lit(2.0)
                    )
                    / (
                        F.sum("np_g").cast("double")
                        * (F.sum("n_g") - F.sum("np_g")).cast("double")
                    )
                )
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("auc6"),
    )


def filter_agreement_kappa(
    decisions: DataFrame,
    group_col: str,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Cohen's kappa (Cohen, 1960) between two binary curation gates,
    per group — the chance-corrected agreement number raw overlap hides:
    two gates that each keep 95% of documents agree ~90.5% by pure
    chance, so "the new quality classifier agrees with the Gopher rules
    on 91% of pages" is NO evidence it learned anything. kappa =
    (p_o - p_e) / (1 - p_e) subtracts exactly that chance floor; the
    curation read is per-source drift — a source where two gates'
    kappa collapses is where their disagreement (and the human review
    budget) should go.

    Shape: ONE map-side-combinable aggregation to the per-group 2x2
    confusion counts (n11/n10/n01/n00 as integer sums of predicate
    products); kappa arithmetic is dimension-only on exact integer
    ratios, pinned at 6. The degenerate p_e == 1 case (both gates
    constant in the group) emits kappa = 0 rather than 0/0 — agreement
    carried entirely by chance. Returns (group, n, p_o6, p_e6, kappa6).
    """
    from crawler_spark.functions.num import pin6

    a = F.col(a_col).cast("int")
    b = F.col(b_col).cast("int")
    cnt = decisions.groupBy(F.col(group_col).alias("g")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(a * b).cast("long").alias("n11"),
        F.sum(a * (1 - b)).cast("long").alias("n10"),
        F.sum((1 - a) * b).cast("long").alias("n01"),
        F.sum((1 - a) * (1 - b)).cast("long").alias("n00"),
    )
    nd = F.col("n").cast("double")
    po = (F.col("n11") + F.col("n00")) / nd
    pe = (
        (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01"))
        + (F.col("n01") + F.col("n00")) * (F.col("n10") + F.col("n00"))
    ) / (nd * nd)
    kappa = F.when(pe < 1.0, (po - pe) / (F.lit(1.0) - pe)).otherwise(
        F.lit(0.0)
    )
    return cnt.select(
        F.col("g").alias(group_col),
        "n",
        pin6(po).alias("p_o6"),
        pin6(pe).alias("p_e6"),
        pin6(kappa).alias("kappa6"),
    )
