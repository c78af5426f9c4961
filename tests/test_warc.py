"""WARC-style record writer/parser round-trip and edge semantics."""

from pyspark.sql import functions as F

from crawler_spark.sources.warc import format_records, parse_records


def test_warc_roundtrip_identity(spark):
    rows = [
        (f"http://h{i % 3}.test/doc/{i}", 200 + (i % 2) * 104, f"body words {i}")
        for i in range(40)
    ]
    results = spark.createDataFrame(rows, "uri string, status int, body string")
    blobs = format_records(results, blobs=4)
    assert blobs.count() <= 4
    back = parse_records(blobs)
    got = sorted(
        (r["uri"], r["status"], r["body"]) for r in back.collect()
    )
    assert got == sorted(rows)


def test_warc_parser_edges(spark):
    # a record with no Target-URI is dropped; a missing HTTP-Status
    # parses as NULL but the record survives; multi-record blobs split
    blob = (
        "WARC/1.0\nWARC-Target-URI: http://a.test/1\nHTTP-Status: 200\n\nalpha\n"
        "WARC/1.0\nHTTP-Status: 500\n\nno uri here\n"
        "WARC/1.0\nWARC-Target-URI: http://a.test/2\n\nbeta beta\n"
    )
    df = spark.createDataFrame([(blob,)], "blob string")
    got = {
        r["uri"]: (r["status"], r["body"])
        for r in parse_records(df).collect()
    }
    assert got == {
        "http://a.test/1": (200, "alpha"),
        "http://a.test/2": (None, "beta beta"),
    }


def test_warc_blob_determinism(spark):
    rows = [(f"http://h.test/{i}", 200, f"b{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "uri string, status int, body string")
    a = {r["blob_id"]: r["blob"] for r in format_records(df, blobs=2).collect()}
    b = {
        r["blob_id"]: r["blob"]
        for r in format_records(
            df.orderBy(F.rand(7)), blobs=2
        ).collect()
    }
    assert a == b


def test_warc_roundtrip_differential_fuzz(spark):
    """Differential fuzz: 300 seeded random records (bodies with
    multi-word text, empty bodies, header-looking body content, varied
    status codes) written into blobs then re-parsed must reproduce the
    input set exactly — one batch write, one parse, one comparison."""
    import random

    rng = random.Random(20260818)
    words = ["alpha", "beta", "WARC-Target-URI:", "HTTP-Status:", "x", ""]
    rows = []
    for i in range(300):
        uri = f"http://h{rng.randint(0, 9)}.test/p/{i}"
        status = rng.choice([200, 204, 301, 302, 404, 500])
        # bodies may contain header-LOOKING tokens (but never a version
        # line — the one reserved marker, same as real WARC payloads
        # that are themselves not re-framed)
        body = " ".join(rng.choice(words) for _ in range(rng.randint(0, 8)))
        rows.append((uri, status, body))
    df = spark.createDataFrame(rows, "uri string, status int, body string")
    back = parse_records(format_records(df, blobs=7))
    got = sorted((r["uri"], r["status"], r["body"]) for r in back.collect())
    assert got == sorted(rows)


def test_warc_revisit_plan_hand_case(spark):
    """First occurrence by (wave, doc_id) stores full response; later
    digests become revisit records; bytes_saved counts revisits only."""
    import __spark_entry__ as entry_mod
    import os, tempfile

    # build a tiny documents table shaped like the testdata schema
    rows = [
        (0, "same body", "en", "s", 9),    # wave 0, original
        (2, "same body", "en", "s", 9),    # wave 0, revisit of 0
        (1, "same body", "en", "s", 9),    # wave 1, revisit of 0
        (3, "unique a", "en", "s", 8),     # wave 1, original
        (4, "unique b", "en", "s", 8),     # wave 0, original
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as td:
        df.coalesce(1).write.parquet(os.path.join(td, "documents.parquet"))
        got = {
            r.wave: r
            for r in entry_mod.q_warc_revisit_plan(spark, td).collect()
        }
    assert (got[0].n_response, got[0].n_revisit, got[0].bytes_saved) == (2, 1, 9)
    assert (got[1].n_response, got[1].n_revisit, got[1].bytes_saved) == (1, 1, 9)


def test_warcsink_datasource_two_phase_commit(spark, tmp_path):
    """df.write.format("warcsink") lands one WARC file per task plus an
    atomic _MANIFEST.json; parse_records over the published files
    reproduces the input rows exactly, and nothing is left under
    _temporary after commit."""
    import json
    import os

    from crawler_spark.sources.webds import WarcSinkDataSource

    spark.dataSource.register(WarcSinkDataSource)
    rows = [
        (f"http://h{i % 5}.test/p/{i}", 200 + (i % 2) * 104, f"payload {i}")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "uri string, status int, body string")
    out = str(tmp_path / "archive")
    df.repartition(4).write.format("warcsink").option("path", out).mode(
        "append"
    ).save()

    man = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert man["n_records"] == 60
    assert sorted(os.listdir(os.path.join(out, "_temporary"))) == []
    # every manifest-listed file exists; no unlisted .warc strays
    published = sorted(
        f for f in os.listdir(out) if f.endswith(".warc")
    )
    assert published == man["files"]

    blobs = spark.createDataFrame(
        [(open(os.path.join(out, f)).read(),) for f in man["files"]],
        "blob string",
    )
    got = sorted(
        (r["uri"], r["status"], r["body"])
        for r in parse_records(blobs).collect()
    )
    assert got == sorted(rows)
