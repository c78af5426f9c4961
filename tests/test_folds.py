"""Property-fuzz the sorted-adjacent fold family (functions/text.py)
against pure-Python references: dup_mass, _chunk_lines, _word_grams,
max_multiplicity, _dup_run_mass. Randomized token arrays from a tiny
alphabet maximize collisions (the interesting regime for duplicate
accounting); one Spark round-trip per case batch keeps the suite fast."""

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from crawler_spark.functions.text import (
    _chunk_lines,
    _dup_run_mass,
    _word_grams,
    dup_mass,
    max_multiplicity,
)

TOK = st.sampled_from(["a", "bb", "ccc", "dd", "e"])
ARR = st.lists(TOK, min_size=0, max_size=23)


def _py_dup_mass(items):
    c = Counter(items)
    return (
        len(items),
        sum(n - 1 for n in c.values()),
        sum((n - 1) * len(t) for t, n in c.items()),
        sum(len(t) for t in items),
    )


def _py_dup_run_mass(items):
    c = Counter(items)
    return (
        sum(n * len(t) for t, n in c.items() if n >= 2),
        sum(len(t) for t in items),
    )


def _py_chunks(items, k):
    return [" ".join(items[i : i + k]) for i in range(0, len(items), k)]


def _py_grams(items, n):
    return [" ".join(items[i : i + n]) for i in range(len(items) - n + 1)]


@settings(max_examples=30, deadline=None)
@given(st.lists(ARR, min_size=1, max_size=8))
def test_fold_family_matches_python(spark, arrays):
    df = spark.createDataFrame([(a,) for a in arrays], "items array<string>")
    m = dup_mass(F.col("items"))
    rm = _dup_run_mass(F.array_sort(F.col("items")))
    got = df.select(
        "items",
        m["n_items"].alias("n"),
        m["dup_items"].alias("di"),
        m["dup_chars"].alias("dc"),
        m["total_chars"].alias("tc"),
        max_multiplicity(F.col("items")).alias("mm"),
        rm["dupc"].alias("rdc"),
        rm["totc"].alias("rtc"),
        _chunk_lines(F.col("items"), 3).alias("lines"),
        _word_grams(F.col("items"), 2).alias("g2"),
        _word_grams(F.col("items"), 4).alias("g4"),
    ).collect()
    for r in got:
        items = list(r["items"])
        assert (r["n"], r["di"], r["dc"], r["tc"]) == _py_dup_mass(items)
        assert r["mm"] == (max(Counter(items).values()) if items else 0)
        assert (r["rdc"], r["rtc"]) == _py_dup_run_mass(items)
        assert list(r["lines"]) == _py_chunks(items, 3)
        assert list(r["g2"]) == _py_grams(items, 2)
        assert list(r["g4"]) == _py_grams(items, 4)
