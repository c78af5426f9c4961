"""Deduplication suite over a document corpus — first-class operators for
a large-scale training-data pipeline.

The reference's dedup is an exact-match seen-set probe before insert
(reference: src/database.py:126-136); these operators generalize it to
the near-duplicate families a 100 TB corpus needs. All are pure
DataFrame/SQL compositions (no Python in the hot path) and all hashing is
md5-based so the DuckDB oracle can reproduce results bit-for-bit.

Scale notes
-----------
* exact:       one hash-shuffle on the text key (map-side partial agg).
* minhash-LSH: shingles explode -> per-(doc, band) min-signature agg ->
               self-join on band signature. The join key is (band_id,
               signature), which is high-cardinality and uniform -> no
               skew; candidate pairs ~ true duplicates, not O(n^2).
* simhash:     per-doc fixed 16-dim signature via one explode+agg; exact
               bucket join on the signature (Hamming-0 buckets); at scale,
               split signature into bands for Hamming<=k.
* ngram jaccard: candidate pre-filter via shared-shingle join, exact
               Jaccard verified on the candidates only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------- exact


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the smallest id per identical text (deterministic
    first-wins, like the reference's store_exists skip)."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


# ------------------------------------------------------------ shingles


def _shingles(docs: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: lowercase, split on
    whitespace, sliding window via native higher-order functions.
    Docs with fewer than n tokens emit no shingles (SQL-oracle-aligned
    edge semantics: exactly len-n+1 grams per doc)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), "\\s+")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - n + 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return (
        docs.filter(F.size(toks) >= n)
        .select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("shingle"))
        .distinct()
    )


# ------------------------------------------------------------- minhash


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature per doc: hash family h_i(s) = md5(i || s); the
    signature element i is min over shingles (lexicographic min of md5 hex
    — portable to any ANSI-SQL oracle). Output: doc_id, band_id, sig."""
    sh = _shingles(docs, text_col, id_col, shingle_n)
    bands = sh.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("band_id"),
        "shingle",
    )
    return bands.groupBy("doc_id", "band_id").agg(
        F.min(F.md5(F.concat(F.col("band_id").cast("string"), F.lit("|"), F.col("shingle")))).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    min_band_matches: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs: docs agreeing on >= k of n bands.
    (bands of 1 row each; banding join on (band_id, sig).)"""
    sig = minhash_signatures(docs, text_col, id_col, n_hashes, shingle_n)
    a = sig.alias("a")
    b = sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_bands"))
        .filter(F.col("n_bands") >= min_band_matches)
    )


# -------------------------------------------------------------- simhash


def simhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16
) -> DataFrame:
    """SimHash-style signature: bit i of the signature is the majority
    vote of token-hash bit i over the doc's distinct tokens. Token-hash
    bit i := hex digit i of md5(token) >= 8 (each md5 hex digit is a
    balanced 4-bit hash; its top bit is a fair coin) — portable SQL."""
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), "\\s+")).alias("tok"),
        )
        .filter(F.length("tok") > 0)
        .distinct()
        .withColumn("tok_md5", F.md5("tok"))
    )
    bit_votes = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
        "tok_md5",
    ).withColumn(
        # hex digits >= '8' lexicographically are exactly values 8..15 →
        # a fair coin per digit; portable to any SQL oracle
        "vote",
        F.when(F.expr("substring(tok_md5, bit + 1, 1)") >= "8", F.lit(1)).otherwise(
            F.lit(-1)
        ),
    )
    per_bit = bit_votes.groupBy("doc_id", "bit").agg(
        (F.sum("vote") > 0).cast("int").alias("b")
    )
    return per_bit.groupBy("doc_id").agg(
        F.sum(F.col("b") * F.pow(F.lit(2), F.col("bit")).cast("long")).alias("simhash")
    )


def simhash_dup_groups(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16
) -> DataFrame:
    """Docs sharing an identical simhash signature (Hamming-0 buckets)."""
    sig = simhash_signatures(docs, text_col, id_col, bits)
    return (
        sig.groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


# ------------------------------------------------------- ngram jaccard


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard >= threshold, computed as
    |A ∩ B| / (|A| + |B| - |A ∩ B|) via a shared-shingle self-join —
    only docs sharing at least one shingle ever pair up (the candidate
    pre-filter), so the O(n^2) cross product never materializes."""
    sh = _shingles(docs, text_col, id_col, shingle_n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ------------------------------------------- embedding cosine near-dup


def embedding_neardup_pairs(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_buckets: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicates, LSH-bucketed by coarse sign
    pattern of the first ``log2(n_buckets)`` dimensions so the self-join
    stays within buckets (scale path); exact cosine verifies candidates.
    Uses native zip_with/aggregate — no UDFs."""
    def norm(c):
        return F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x))

    keyed = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("nrm"),
        F.concat_ws(
            "",
            *[
                (F.element_at(F.col(vec_col), i + 1) >= 0).cast("int").cast("string")
                for i in range(max(1, n_buckets.bit_length() - 1))
            ],
        ).alias("bucket"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .withColumn("cosine", F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 6))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            "cosine",
        )
    )
