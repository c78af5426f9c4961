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
