"""Deflate-ratio quality gate (operators/corpus.py compression_gate):
the vectorized UDF must agree byte-for-byte with direct zlib calls, and
the flag thresholds must catch the two pathologies it exists for —
machine repetition (low ratio) and high-entropy non-text (high ratio).
"""

import zlib


from crawler_spark.operators.corpus import compression_gate


def test_matches_direct_zlib_and_flags(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog " * 3),
        (1, "spam " * 500),  # template repetition -> ratio well under 0.25
        (2, "9f8a7b6c5d4e3f2a1b0c" * 40),  # hex-ish noise, high entropy
        (3, None),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in compression_gate(df).collect()}
    for doc_id, text in rows:
        b = ("" if text is None else text).encode("utf-8")
        raw, comp = len(b), len(zlib.compress(b, 6))
        r = got[doc_id]
        assert r["raw_len"] == raw and r["comp_len"] == comp
        import math

        want_ratio = math.floor(comp * 1e6 / max(raw, 1) + 0.5) / 1e6
        assert r["ratio"] == want_ratio
        assert r["pass_compression"] == (0.25 <= want_ratio <= 0.95)
    assert not got[1]["pass_compression"]  # repetition rejected
    # empty/None text: comp_len > 0, raw 0 -> ratio = comp_len/1 > .95
    assert not got[3]["pass_compression"]


def test_batch_boundaries_dont_change_results(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i} body " + "word " * (i % 37)) for i in range(300)],
        "doc_id long, text string",
    )
    one = {
        (r["doc_id"], r["comp_len"])
        for r in compression_gate(docs.coalesce(1)).collect()
    }
    many = {
        (r["doc_id"], r["comp_len"])
        for r in compression_gate(docs.repartition(7)).collect()
    }
    assert one == many
