"""Text analysis for a training-data pipeline: language ID, quality
scoring, token counting, fingerprinting. All native ``pyspark.sql.
functions`` expressions (whole-stage codegen; zero UDFs) and all
reproducible in ANSI SQL for the DuckDB oracle.

Reference parity: the canonicalization/cleaning layer
(src/utils/address_parser.py, src/map_api/__init__.py:33-60) — regex
chains + token heuristics over strings, generalized to corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny marker lexicons for the n-gram/stopword language heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "des", "est"],
    "de": ["der", "die", "das", "und", "ist"],
}

STOPWORDS = LANG_MARKERS["en"]


def _tokens(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), "\\s+")


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-hit count per language (the n-gram heuristic)."""
    toks = _tokens(text)
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in ms])))
        for lang, ms in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """argmax over marker-hit counts; ties broken by language name order
    (a when-chain over 4 langs — constant-folded by Catalyst); 'und' when
    nothing matches."""
    scores = lang_scores(text)
    langs = sorted(scores)
    best_score = F.greatest(*[scores[lg] for lg in langs])
    expr = F.lit("und")
    for lg in reversed(langs):
        expr = F.when((scores[lg] == best_score) & (best_score > 0), F.lit(lg)).otherwise(expr)
    return expr


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.filter(_tokens(text), lambda t: F.length(t) > 0))


def subword_count(text: Column) -> Column:
    """BPE-ish unit count: word-boundary pieces + digit runs + punct;
    approximated portably as count of alnum runs plus punctuation chars."""
    alnum_runs = F.size(
        F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda t: F.length(t) > 0)
    )
    punct = F.length(F.regexp_replace(text, "[a-zA-Z0-9\\s]", ""))
    return (alnum_runs + punct).cast("int")


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: length band + stopword ratio + alpha
    ratio - punctuation excess. Deterministic arithmetic, SQL-portable."""
    n = F.length(text)
    toks = _tokens(text)
    n_tok = F.size(toks)
    stop_ratio = F.size(
        F.array_intersect(toks, F.array(*[F.lit(s) for s in STOPWORDS]))
    ) / F.greatest(n_tok, F.lit(1))
    alpha_ratio = (
        F.length(F.regexp_replace(F.lower(text), "[^a-z ]", "")) / F.greatest(n, F.lit(1))
    )
    punct_ratio = F.length(F.regexp_replace(text, "[a-zA-Z0-9\\s]", "")) / F.greatest(
        n, F.lit(1)
    )
    len_band = F.when((n >= 100) & (n <= 10000), F.lit(1.0)).otherwise(F.lit(0.5))
    raw = (
        len_band * 0.4
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.3
        + alpha_ratio * 0.3
        - punct_ratio * 0.2
    )
    return F.round(F.greatest(F.least(raw, F.lit(1.0)), F.lit(0.0)), 6)


def gopher_stats(text: Column) -> dict[str, Column]:
    """Gopher-rule document gate (Rae et al. 2021 §A1.1, public): word
    count bounds, mean word length band, lexical diversity, and a
    required stopword presence — the standard pre-training corpus
    filter, all native array expressions (no explode: per-doc state
    stays one row, so the pass is shuffle-free)."""
    toks = F.filter(_tokens(text), lambda t: F.length(t) > 0)
    n_words = F.size(toks)
    sum_len = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
    mean_word_len = F.round(sum_len / F.greatest(n_words, F.lit(1)), 6)
    distinct_ratio = F.round(
        F.size(F.array_distinct(toks)) / F.greatest(n_words, F.lit(1)), 6
    )
    stop_hits = F.size(
        F.array_intersect(toks, F.array(*[F.lit(s) for s in STOPWORDS]))
    )
    passes = (
        (n_words >= 50)
        & (n_words <= 100000)
        & (mean_word_len >= 3.0)
        & (mean_word_len <= 10.0)
        & (distinct_ratio >= 0.2)
        & (stop_hits >= 1)
    )
    return {
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "distinct_ratio": distinct_ratio,
        "stop_hits": stop_hits,
        "pass_gopher": passes,
    }


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized lowercase
    text (the rolling-hash analog, portable to the SQL oracle)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), "\\s+", " ")))
