"""Hand-computed semantics for the Gopher repetition battery and the
CCNet head/middle/tail perplexity partitioning.

The driver's oracle gate proves Spark==DuckDB on the synthetic corpus;
these tests pin the SEMANTICS against values computed by hand / by an
independent pure-Python mirror, so both engines can't be wrong together.
"""

import math

import pytest

import __spark_entry__ as entry


def _write_docs(spark, tmp_path, texts):
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_repetition_suite_hand_computed(spark, tmp_path):
    # doc 0: "a b a b a b" -> 3-grams: [a b a, b a b, a b a, b a b]
    #   top3 = 2/4; 4-grams: [a b a b, b a b a, a b a b] top4 = 2/3
    #   5-grams: [a b a b a, b a b a b] all unique -> dup5 = 0
    # doc 1: "x x x x x" -> every gram identical: top3=1, top4=1, dup5
    #   has a single occurrence -> not duplicated -> 0
    # doc 2: 4 words only -> no 5-grams -> dup5 NULL
    sf = _write_docs(
        spark,
        tmp_path,
        ["a b a b a b", "x x x x x", "p q r s"],
    )
    rows = {
        r["doc_id"]: r
        for r in entry.q_repetition_suite(spark, sf).collect()
    }
    assert rows[0]["top3_ratio"] == pytest.approx(0.5)
    assert rows[0]["top4_ratio"] == pytest.approx(2.0 / 3.0, abs=1e-6)
    assert rows[0]["dup5_char_frac"] == 0.0
    assert rows[1]["top3_ratio"] == 1.0
    assert rows[1]["top4_ratio"] == 1.0
    assert rows[1]["dup5_char_frac"] == 0.0
    assert rows[2]["top3_ratio"] == 0.5  # [p q r, q r s]
    assert rows[2]["top4_ratio"] == 1.0
    assert rows[2]["dup5_char_frac"] is None


def test_repetition_suite_duplicated_5gram_char_mass(spark, tmp_path):
    # "c d e f g c d e f g zz" has 7 5-grams; "c d e f g" occurs twice
    # (9 chars each); the other five occur once. All 5-grams here are
    # 9 chars except those containing zz ("f g zz" tails: "e f g zz" is
    # a 4-gram; 5-grams: [c d e f g, d e f g c, e f g c d, f g c d e,
    # g c d e f, c d e f g, d e f g zz]) -> dup mass = 2*9,
    # total = 6*9 + 10 ("d e f g zz" is 10 chars)
    sf = _write_docs(spark, tmp_path, ["c d e f g c d e f g zz"])
    r = entry.q_repetition_suite(spark, sf).collect()[0]
    assert r["dup5_char_frac"] == pytest.approx(18.0 / 64.0, abs=1e-6)


def test_ccnet_buckets_tertiles_match_python_mirror(spark, tmp_path):
    # independent mirror: numpy-free linear-interpolated tertiles over
    # the query's own ppl values; bucket rule re-applied in python
    texts = [
        " ".join(["common"] * 8 + [f"rare{i}"]) for i in range(9)
    ] + ["common common common", "weird gibberish tokens here"]
    sf = _write_docs(spark, tmp_path, texts)
    rows = entry.q_ccnet_buckets(spark, sf).collect()
    ppls = sorted(r["ppl"] for r in rows)

    def q_cont(vals, p):
        rn = (len(vals) - 1) * p
        lo, hi = math.floor(rn), math.ceil(rn)
        return vals[lo] + (vals[hi] - vals[lo]) * (rn - lo)

    t1 = q_cont(ppls, 1.0 / 3)
    t2 = q_cont(ppls, 2 * (1.0 / 3))
    for r in rows:
        want = "head" if r["ppl"] <= t1 else ("middle" if r["ppl"] <= t2 else "tail")
        assert r["bucket"] == want, (r, t1, t2)
    # the fluent-common docs score better (lower ppl) than gibberish
    by_doc = {r["doc_id"]: r for r in rows}
    assert by_doc[len(texts) - 1]["ppl"] == max(ppls)
    assert by_doc[len(texts) - 1]["bucket"] == "tail"


def test_dup_line_gate_hand_computed(spark, tmp_path):
    # 8-word pseudo-lines. doc 0: 24 words = lines [A, B, A] -> one
    # repeat of A. doc 1: 16 distinct words -> no repeats. doc 2: 7
    # words -> a single (short) line, no repeats. doc 3: empty-ish.
    A = "a b c d e f g h"
    B = "p q r s t u v w"
    texts = [
        f"{A} {B} {A}",
        "w1 w2 w3 w4 w5 w6 w7 w8 x1 x2 x3 x4 x5 x6 x7 x8",
        "one two three four five six seven",
        "solo",
    ]
    sf = _write_docs(spark, tmp_path, texts)
    rows = {r["doc_id"]: r.asDict() for r in entry.q_dup_line_gate(spark, sf).collect()}
    a_chars = len(A)
    tot = 2 * len(A) + len(B)
    assert rows[0]["n_lines"] == 3
    assert rows[0]["dup_line_frac"] == round(1 / 3, 6)
    assert abs(rows[0]["dup_line_char_frac"] - a_chars / tot) < 2e-6
    assert rows[0]["pass_dup_lines"] is False  # 0.333 > 0.30
    assert rows[1] == {
        "doc_id": 1, "n_lines": 2, "dup_line_frac": 0.0,
        "dup_line_char_frac": 0.0, "pass_dup_lines": True,
    }
    assert rows[2]["n_lines"] == 1 and rows[2]["pass_dup_lines"] is True
    assert rows[3]["n_lines"] == 1 and rows[3]["dup_line_frac"] == 0.0


def test_dup_mass_sorted_adjacent_fold(spark):
    from crawler_spark.functions.text import dup_mass
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(["x", "y", "x", "x", "zz"],), ([],), (["solo"],)],
        "items array<string>",
    )
    m = dup_mass(F.col("items"))
    got = df.select(
        m["n_items"].alias("n"), m["dup_items"].alias("d"),
        m["dup_chars"].alias("dc"), m["total_chars"].alias("tc"),
    ).collect()
    # ['x','y','x','x','zz']: sorted -> x,x,x,y,zz; repeats = 2 x's (2 chars)
    assert [tuple(r) for r in got] == [(5, 2, 2, 6), (0, 0, 0, 0), (1, 0, 0, 4)]


def test_curation_funnel_each_gate_fires(spark, tmp_path):
    # one doc charged to each gate, in cascade order
    fail_gopher = "too short"
    # >=50 words, diverse, but one bigram ('foo bar') owns >20% of bigrams
    fail_rep = ("foo bar " * 20 + " ".join(f"tail{i:02d}" for i in range(19))
                + " the")
    # 4 identical 8-word pseudo-lines (dup_line_frac 0.5) but bigram
    # repetition stays under 0.20 and the gopher battery passes
    line = " ".join(f"la{i}xx" for i in range(8))
    fail_dl = " ".join([line] * 4) + " " + " ".join(
        f"tailz{i:02d}" for i in range(23)) + " the"
    ok = " ".join(f"fine{i:02d}" for i in range(59)) + " the"
    sf = _write_docs(spark, tmp_path, [fail_gopher, fail_rep, fail_dl, ok])
    rows = [tuple(r) for r in entry.q_curation_funnel(spark, sf).collect()]
    assert rows == [
        (1, "gopher", 4, 1, 0.75),
        (2, "rep_top2", 3, 1, 0.666667),
        (3, "dup_lines", 2, 1, 0.5),
        (4, "pass", 1, 0, 1.0),
    ], rows
