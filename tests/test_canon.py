"""Canonicalization + hash parity tests (SURVEY.md §2.7 C1-C13 analog)."""

import pandas as pd
from pyspark.sql import functions as F

from crawler_spark.functions.canon import normalize_url, with_url_cols
from crawler_spark.functions.xxh import xxh64_str

CASES = [
    # (raw, expected canonical)
    ("http://EXAMPLE.com:80/a/../b?b=2&a=1#frag", "http://example.com/b?a=1&b=2"),
    ("HTTP://Host-0.TEST/", "http://host-0.test/"),
    ("http://host.test", "http://host.test/"),
    ("https://host.test:443/x", "https://host.test/x"),
    ("https://host.test:8443/x", "https://host.test:8443/x"),
    ("http://host.test/./p1", "http://host.test/p1"),
    ("http://host.test/p1/d2/../d3", "http://host.test/p1/d3"),
    ("http://host.test/%7Euser/%41", "http://host.test/~user/A"),
    ("http://host.test/a%2fb", "http://host.test/a/b"),
    ("  http://host.test/x  ", "http://host.test/x"),
    ("http://host.test/a/..", "http://host.test/"),
]


def test_normalize_url_cases():
    for raw, want in CASES:
        assert normalize_url(raw) == want, raw


def test_normalize_idempotent():
    for raw, _ in CASES:
        c = normalize_url(raw)
        assert normalize_url(c) == c


def test_xxh64_matches_spark(spark):
    strs = [c[1] for c in CASES] + ["", "a", "ab" * 40, "한글 텍스트"]
    df = spark.createDataFrame(pd.DataFrame({"s": strs}))
    got = {r["s"]: r["x"] for r in df.select("s", F.xxhash64("s").alias("x")).collect()}
    for s in strs:
        assert xxh64_str(s) == got[s], s


def test_with_url_cols(spark):
    df = spark.createDataFrame(pd.DataFrame({"url": [c[0] for c in CASES]}))
    rows = with_url_cols(df).collect()
    for r, (_, want) in zip(rows, CASES):
        assert r["url_canon"] == want
        assert r["url_hash"] == xxh64_str(want)
        # parse_url(HOST) yields the hostname without the port
        assert r["host"] == want.split("://")[1].split("/")[0].split("?")[0].split(":")[0]
