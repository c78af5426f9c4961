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


def dup_mass(items: Column) -> dict[str, Column]:
    """Sorted-adjacent duplicate accounting over a string array: how
    many occurrences are repeats of an earlier identical item, and the
    character mass those repeats carry. ``array_sort`` makes equal
    items adjacent, so one comparison per element finds every repeat —
    shuffle-free (no explode: per-document state stays one row, unlike
    the grouped-count form in ``repetition_suite``, which shuffles
    (doc, gram) partials)."""
    srt = F.array_sort(items)
    n = F.size(items)
    idx = F.when(n >= 2, F.sequence(F.lit(2), n)).otherwise(
        F.expr("CAST(array() AS ARRAY<INT>)")
    )
    dups = F.filter(
        idx, lambda i: F.element_at(srt, i) == F.element_at(srt, i - 1)
    )
    return {
        "n_items": n,
        "dup_items": F.size(dups),
        "dup_chars": F.aggregate(
            dups, F.lit(0), lambda a, i: a + F.length(F.element_at(srt, i))
        ),
        "total_chars": F.aggregate(
            items, F.lit(0), lambda a, x: a + F.length(x)
        ),
    }


def dup_line_signals(text: Column, line_words: int = 8) -> dict[str, Column]:
    """The duplicate-LINE half of the Gopher repetition rules (Rae et
    al. 2021 Table A1, public): fraction of lines that repeat an
    earlier identical line, and the character fraction those repeats
    carry (thresholds 0.30 / 0.20 in the paper). The synthetic corpus
    has no newlines, so 'lines' are fixed-width pseudo-lines of
    ``line_words`` tokens — the accounting is delimiter-agnostic (swap
    the grouping for ``split(text, '\\n')`` on real pages).

    Zero shuffles: pseudo-lines, the sorted-adjacent duplicate fold
    (``dup_mass``) and both fractions are native array expressions."""
    ws = F.filter(_tokens(text), lambda t: F.length(t) > 0)
    nw = F.size(ws)
    lw = F.lit(line_words)
    n_lines = F.ceil(nw / lw).cast("int")
    lines = F.when(
        nw > 0,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_lines, F.lit(1))),
            lambda i: F.concat_ws(
                " ", F.slice(ws, (i - F.lit(1)) * lw + F.lit(1), line_words)
            ),
        ),
    ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))
    m = dup_mass(lines)
    sc = F.lit(1000000.0)

    # floor(x*1e6+0.5)/1e6 — deterministic cross-engine rounding
    def _pin6(c: Column) -> Column:
        return F.floor(c * sc + F.lit(0.5)) / sc

    line_frac = _pin6(
        m["dup_items"].cast("double") / F.greatest(m["n_items"], F.lit(1))
    )
    char_frac = _pin6(
        m["dup_chars"].cast("double") / F.greatest(m["total_chars"], F.lit(1))
    )
    return {
        "n_lines": m["n_items"],
        "dup_line_frac": line_frac,
        "dup_line_char_frac": char_frac,
        "pass_dup_lines": (line_frac <= 0.30) & (char_frac <= 0.20),
    }


def max_multiplicity(items: Column) -> Column:
    """Largest multiplicity of any element in a string array, as one
    sorted-adjacent struct fold — the shuffle-free alternative to
    explode + groupBy + max(count). Shared by the spider-trap segment
    detector (operators/traps.py) and the map-side repetition gate."""
    srt = F.array_sort(items)
    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(srt, zero, step)["best"]


def _word_grams(ws: Column, n: int) -> Column:
    """Word n-grams over a token array; empty array below n tokens."""
    return F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(ws, i, n)),
        ),
    ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))


def repetition_signals_mapside(text: Column) -> dict[str, Column]:
    """Map-side twin of the `repetition_suite` query: top-3-gram and
    top-4-gram occurrence ratios plus the duplicated-5-gram character
    fraction (Gopher Table A1 signals), with ZERO shuffles — the
    grouped-count form shuffles (doc, gram) partials for every gram in
    the corpus; this computes identical values per document from one
    row of array state (sorted-adjacent folds), so a 10^10-doc gate
    runs as a pure scan. NULL where a document is too short to have
    grams of that order (matching the grouped form's absent rows).

    dup-char fraction counts ALL occurrences of any duplicated 5-gram
    (c >= 2 contributes c*len, same as the suite's accounting)."""
    ws = F.filter(_tokens(text), lambda t: F.length(t) > 0)
    sc = F.lit(1000000.0)

    def _pin6(c: Column) -> Column:
        return F.floor(c * sc + F.lit(0.5)) / sc

    def _top_ratio(n: int) -> Column:
        g = _word_grams(ws, n)
        return F.when(
            F.size(ws) >= n,
            _pin6(max_multiplicity(g).cast("double") / F.size(g)),
        )

    g5 = _word_grams(ws, 5)
    s5 = F.array_sort(g5)
    n5 = F.size(g5)
    idx = F.when(n5 >= 1, F.sequence(F.lit(1), n5)).otherwise(
        F.expr("CAST(array() AS ARRAY<INT>)")
    )
    # an occurrence i is part of a duplicated run iff it equals a
    # sorted neighbor on either side (c>=2 groups contribute all c)
    dup_occ = F.filter(
        idx,
        lambda i: (
            (i > 1) & (F.element_at(s5, i) == F.element_at(s5, i - 1))
        )
        | (
            (i < n5) & (F.element_at(s5, i) == F.element_at(s5, i + 1))
        ),
    )
    dup_chars = F.aggregate(
        dup_occ, F.lit(0), lambda a, i: a + F.length(F.element_at(s5, i))
    )
    tot_chars = F.aggregate(g5, F.lit(0), lambda a, x: a + F.length(x))
    return {
        "n_words": F.size(ws),
        "top3_ratio": _top_ratio(3),
        "top4_ratio": _top_ratio(4),
        "dup5_char_frac": F.when(
            n5 >= 1,
            _pin6(dup_chars.cast("double") / F.greatest(tot_chars, F.lit(1))),
        ),
    }
