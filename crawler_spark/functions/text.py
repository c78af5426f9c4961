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
    items adjacent; ONE fold over the sorted array counts every repeat
    — shuffle-free (no explode: per-document state stays one row,
    unlike the grouped-count form in ``repetition_suite``, which
    shuffles (doc, gram) partials).

    HOF discipline (applies to every helper in this file): array
    expressions appear only as ``aggregate``/``zip_with`` ARGUMENTS,
    never inside a lambda body — Spark does no CSE inside higher-order
    functions, so a lambda that touches the array via ``element_at``
    re-evaluates the whole split/sort expression PER ELEMENT (a
    measured O(w²)+ blowup that serialized the bench). Assumes items
    are non-empty strings (tokens/grams/lines are by construction)."""
    srt = F.array_sort(items)
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("dupi"),
        F.lit(0).alias("dupc"),
        F.lit(0).alias("totc"),
    )

    def step(a: Column, x: Column) -> Column:
        is_dup = x == a["prev"]
        return F.struct(
            x.alias("prev"),
            (a["dupi"] + F.when(is_dup, 1).otherwise(0)).alias("dupi"),
            (a["dupc"] + F.when(is_dup, F.length(x)).otherwise(0)).alias(
                "dupc"
            ),
            (a["totc"] + F.length(x)).alias("totc"),
        )

    m = F.aggregate(srt, zero, step)
    return {
        "n_items": F.size(items),
        "dup_items": m["dupi"],
        "dup_chars": m["dupc"],
        "total_chars": m["totc"],
    }


def _chunk_lines(ws: Column, line_words: int) -> Column:
    """Fixed-width pseudo-lines (``line_words`` tokens joined by one
    space) via ONE fold over the token array — no per-line slicing of
    the (re-evaluated) token expression."""
    zero = F.struct(
        F.lit(0).alias("cnt"),
        F.lit("").alias("cur"),
        F.expr("CAST(array() AS ARRAY<STRING>)").alias("lines"),
    )

    def step(a: Column, x: Column) -> Column:
        full = a["cnt"] == line_words
        return F.struct(
            F.when(full, F.lit(1)).otherwise(a["cnt"] + 1).alias("cnt"),
            F.when(full | (a["cnt"] == 0), x)
            .otherwise(F.concat(a["cur"], F.lit(" "), x))
            .alias("cur"),
            F.when(full, F.concat(a["lines"], F.array(a["cur"])))
            .otherwise(a["lines"])
            .alias("lines"),
        )

    def fin(a: Column) -> Column:
        return F.when(
            a["cnt"] > 0, F.concat(a["lines"], F.array(a["cur"]))
        ).otherwise(a["lines"])

    return F.aggregate(ws, zero, step, fin)


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
    lines = _chunk_lines(ws, line_words)
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


def _run_best(sorted_items: Column) -> Column:
    """Longest equal-run length over an ALREADY-SORTED string array
    (one fold; the input is referenced once, as the aggregate
    argument)."""
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

    return F.aggregate(sorted_items, zero, step)["best"]


def max_multiplicity(items: Column) -> Column:
    """Largest multiplicity of any element in a string array, as one
    sorted-adjacent struct fold — the shuffle-free alternative to
    explode + groupBy + max(count). Shared by the spider-trap segment
    detector (operators/traps.py) and the map-side repetition gate."""
    return _run_best(F.array_sort(items))


def _word_grams(ws: Column, n: int) -> Column:
    """Word n-grams over a token array, built as a ``zip_with`` chain
    of n shifted slices — the token expression is referenced only as
    slice ARGUMENTS (n constant evaluations per row), never inside a
    lambda (which would re-evaluate it per gram). Empty below n
    tokens (all slices collapse to length 0)."""
    m = F.greatest(F.size(ws) - F.lit(n - 1), F.lit(0))
    g = F.slice(ws, 1, m)
    for k in range(1, n):
        g = F.zip_with(
            g,
            F.slice(ws, k + 1, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return g


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

    def _top_ratio(n: int) -> Column:
        g = _word_grams(ws, n)
        return F.when(
            F.size(ws) >= n,
            _pin6(_run_best(F.array_sort(g)).cast("double") / F.size(g)),
        )

    m5 = _dup_run_mass(F.array_sort(_word_grams(ws, 5)))
    return {
        "n_words": F.size(ws),
        "top3_ratio": _top_ratio(3),
        "top4_ratio": _top_ratio(4),
        "dup5_char_frac": F.when(
            F.size(ws) >= 5,
            _pin6(
                m5["dupc"].cast("double")
                / F.greatest(m5["totc"], F.lit(1))
            ),
        ),
    }


def _pin6(c: Column) -> Column:
    """floor(x*1e6+0.5)/1e6 — deterministic cross-engine rounding."""
    return F.floor(c * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


def _dup_run_mass(sorted_items: Column) -> Column:
    """(dupc, totc) struct over an ALREADY-SORTED string array: the
    character mass carried by ALL occurrences of any item appearing
    >= 2 times, plus the total occurrence char mass — one run-length
    fold (runs are maximal equal groups on sorted input); the finish
    lambda flushes the final run."""
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("dupc"),
        F.lit(0).alias("totc"),
    )

    def step(a: Column, x: Column) -> Column:
        same = x == a["prev"]
        flush = F.when(
            (~same) & (a["run"] >= 2), a["run"] * F.length(a["prev"])
        ).otherwise(F.lit(0))
        return F.struct(
            x.alias("prev"),
            F.when(same, a["run"] + 1).otherwise(F.lit(1)).alias("run"),
            (a["dupc"] + flush).alias("dupc"),
            (a["totc"] + F.length(x)).alias("totc"),
        )

    def fin(a: Column) -> Column:
        return F.struct(
            (
                a["dupc"]
                + F.when(
                    a["run"] >= 2, a["run"] * F.length(a["prev"])
                ).otherwise(F.lit(0))
            ).alias("dupc"),
            a["totc"].alias("totc"),
        )

    return F.aggregate(sorted_items, zero, step, fin)


def repetition_gate_mapside(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Projection-layered form of ``repetition_signals_mapside`` for
    whole-table scans: each intermediate array (token split, sorted
    gram arrays) is projected as a NAMED column before use, and
    multi-referenced non-trivial aliases are not inlined by Catalyst's
    CollapseProject — so per document the plan does ONE split, three
    zip-chain gram builds, three sorts and three folds, instead of
    re-deriving the token array under every consumer. Still zero
    shuffles and zero Python. Output: (id, n_words, top3_ratio,
    top4_ratio, dup5_char_frac), NULL where the doc is too short for
    that gram order."""
    ws = F.filter(_tokens(F.col(text_col)), lambda t: F.length(t) > 0)
    d1 = docs.select(F.col(id_col), ws.alias("__ws"))
    w = F.col("__ws")
    d2 = d1.select(
        id_col,
        "__ws",
        F.array_sort(_word_grams(w, 3)).alias("__s3"),
        F.array_sort(_word_grams(w, 4)).alias("__s4"),
        F.array_sort(_word_grams(w, 5)).alias("__s5"),
    )
    d3 = d2.select(
        id_col,
        F.size(w).alias("__nw"),
        F.size(F.col("__s3")).alias("__n3"),
        F.size(F.col("__s4")).alias("__n4"),
        _run_best(F.col("__s3")).alias("__b3"),
        _run_best(F.col("__s4")).alias("__b4"),
        _dup_run_mass(F.col("__s5")).alias("__m5"),
    )
    return d3.select(
        F.col(id_col),
        F.col("__nw").alias("n_words"),
        F.when(
            F.col("__n3") >= 1,
            _pin6(F.col("__b3").cast("double") / F.col("__n3")),
        ).alias("top3_ratio"),
        F.when(
            F.col("__n4") >= 1,
            _pin6(F.col("__b4").cast("double") / F.col("__n4")),
        ).alias("top4_ratio"),
        F.when(
            F.col("__nw") >= 5,
            _pin6(
                F.col("__m5")["dupc"].cast("double")
                / F.greatest(F.col("__m5")["totc"], F.lit(1))
            ),
        ).alias("dup5_char_frac"),
    )


def fk_grade(text):
    """Flesch-Kincaid grade level (Kincaid et al. '75), the classic
    readability score: 0.39*(words/sentences) + 11.8*(syllables/words)
    - 15.59, with syllables approximated by vowel-group runs
    ([aeiouy]+ — the standard cheap heuristic; systematic bias is
    constant across a corpus so RANKING is preserved, which is what a
    quality gate consumes) and sentences by [.!?]+ runs (min 1).
    Pure native regexp counts — zero shuffle, codegen — and plain
    integer-ratio doubles, so the score is engine-exact unpinned;
    callers pin for display. Returns a struct (n_words, n_sentences,
    n_syllables, grade)."""
    t = F.lower(F.trim(text))
    words = F.size(F.filter(F.split(t, r"\s+"), lambda x: x != ""))
    sents = F.greatest(F.regexp_count(t, F.lit("[.!?]+")), F.lit(1))
    sylls = F.regexp_count(t, F.lit("[aeiouy]+"))
    grade = (
        F.lit(0.39) * (words.cast("double") / sents.cast("double"))
        + F.lit(11.8) * (sylls.cast("double") / words.cast("double"))
        - F.lit(15.59)
    )
    return F.struct(
        words.cast("long").alias("n_words"),
        sents.cast("long").alias("n_sentences"),
        sylls.cast("long").alias("n_syllables"),
        grade.alias("grade"),
    )
