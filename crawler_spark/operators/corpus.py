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


def tfidf_top_token(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Most salient token per document by TF-IDF (ln(N/df), round-6
    pinned): (doc_id, top_tok, tf, score). Deterministic tie-break on
    the lexicographically smallest token."""
    toks = _tokens(docs, text_col, id_col)
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n_docs = docs.select(id_col).distinct().count()
    scored = tf.join(df, "tok").select(
        "doc_id",
        "tok",
        "tf",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
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
