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


# ---- property-based fuzzing (hypothesis) -----------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:
    _host = st.from_regex(r"[a-zA-Z0-9]([a-zA-Z0-9.-]{0,20}[a-zA-Z0-9])?", fullmatch=True)
    _path = st.from_regex(r"(/[a-zA-Z0-9._~%!$&()*+,;=:@-]{0,12}){0,5}", fullmatch=True)
    _query = st.from_regex(r"([a-z]{1,5}=[a-zA-Z0-9%]{0,8}(&[a-z]{1,5}=[a-zA-Z0-9%]{0,8}){0,4})?", fullmatch=True)
    _frag = st.from_regex(r"(#[a-zA-Z0-9]{0,8})?", fullmatch=True)

    @st.composite
    def _urls(draw):
        scheme = draw(st.sampled_from(["http", "HTTP", "https", "HtTpS"]))
        port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
        q = draw(_query)
        return (
            f"{scheme}://{draw(_host)}{port}{draw(_path)}"
            + (f"?{q}" if q else "")
            + draw(_frag)
        )

    @settings(max_examples=300, deadline=None)
    @given(_urls())
    def test_normalize_url_invariants_fuzz(url):
        c = normalize_url(url)
        # idempotent (the property the URL-seen set's correctness rests on)
        assert normalize_url(c) == c, (url, c)
        # no fragment survives; scheme+host are lowercase; path present
        assert "#" not in c
        scheme, rest = c.split("://", 1)
        assert scheme == scheme.lower()
        netloc = rest.split("/", 1)[0]
        assert netloc == netloc.lower()
        assert "/" in rest or rest == netloc
        # default ports are stripped, non-default kept
        if ":80" in url and scheme == "http":
            assert not netloc.endswith(":80")
        if ":8080" in url:
            assert netloc.endswith(":8080")
        # query params, when present, are sorted
        if "?" in c:
            params = c.split("?", 1)[1].split("&")
            assert params == sorted(params)

    @settings(max_examples=200, deadline=None)
    @given(st.text(min_size=0, max_size=120))
    def test_xxh64_python_spec_fuzz(s):
        # pure-numpy xxh64 stays within uint64 and is deterministic;
        # (Spark-parity on arbitrary unicode is pinned by
        # test_xxh64_matches_spark on fixed vectors + the crawl oracle)
        a = xxh64_str(s)
        assert a == xxh64_str(s)
        assert -(1 << 63) <= a < (1 << 63)


def test_xxh64_matches_spark_seeded_fuzz(spark):
    """300 seeded-random strings (ascii, unicode, long, empty) through
    the numpy xxh64 vs Spark's xxhash64 in ONE batched job."""
    import random

    rng = random.Random(0xC0FFEE)
    pool = "abcXYZ019 /:?&=#._-%한글漢字éß€" + chr(0x1F600)
    strs = list({
        "".join(rng.choice(pool) for _ in range(rng.randrange(0, 120)))
        for _ in range(300)
    })
    df = spark.createDataFrame(pd.DataFrame({"s": strs}))
    got = {r["s"]: r["x"] for r in df.select("s", F.xxhash64("s").alias("x")).collect()}
    for s in strs:
        assert xxh64_str(s) == got[s], repr(s)


def test_surt_key(spark):
    from crawler_spark.functions.canon import surt_key

    cases = [
        ("http://www.Example.COM:8080/A/b?z=1&a=2", "com,example)/a/b?a=2&z=1"),
        ("https://Sub.Example.com/", "com,example,sub)/"),
        ("http://example.com", "com,example)/"),          # empty path -> /
        ("http://example.com/x#frag", "com,example)/x"),  # fragment dropped
        ("http://www.w3.org/TR/html", "org,w3)/tr/html"), # www. stripped
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {r["url"]: r["s"] for r in df.select("url", surt_key(F.col("url")).alias("s")).collect()}
    for u, want in cases:
        assert got[u] == want, (u, got[u])


def test_resolve_href_matches_stdlib_urljoin(spark):
    """Both the native expression chain and the Arrow UDF must agree
    with urllib.parse.urljoin (fragment-stripped) on every branch a
    link extractor meets."""
    from urllib.parse import urljoin

    from crawler_spark.functions.canon import (
        resolve_href_native,
        resolve_href_udf,
    )

    cases = [
        ("http://a.test/x/y/page.html", "other.html"),
        ("http://a.test/x/y/page.html", "./other.html"),
        ("http://a.test/x/y/page.html", "../up.html"),
        ("http://a.test/x/y/page.html", "../../../../deep.html"),  # over-pop
        ("http://a.test/x/y/page.html", "/root.html"),
        ("http://a.test/x/y/page.html", "/a/b/../../../c"),
        ("http://a.test/x/y/page.html", "//cdn.test/img.png"),
        ("http://a.test/x/y/page.html", "https://b.test/abs"),
        ("http://a.test/x/y/page.html", "mailto:x@y.z"),
        ("http://a.test/x/y/page.html", "?q=1"),
        ("http://a.test/x/y/page.html", "#frag"),
        ("http://a.test/x/y/page.html", ""),
        ("http://a.test/x/y/page.html", "sub/dir/"),
        ("http://a.test/x/y/page.html", "a/../b/./c.html"),
        ("http://a.test/x/y/page.html?old=1", "new.html"),
        ("http://a.test/", "p.html"),
        ("http://a.test", "p.html"),
        ("https://a.test:8443/d/", "../e/./f/../g.html"),
    ]
    df = spark.createDataFrame(cases, "base string, href string")
    got = df.select(
        "base",
        "href",
        resolve_href_native(F.col("base"), F.col("href")).alias("nat"),
        resolve_href_udf(F.col("base"), F.col("href")).alias("udf"),
    ).collect()
    for r in got:
        want = urljoin(r.base, r.href).split("#", 1)[0]
        assert r.nat == want, (r.base, r.href, r.nat, want)
        assert r.udf == want, (r.base, r.href, r.udf, want)


def test_idn_host_punycode():
    from crawler_spark.functions.canon import normalize_url

    # IDN label -> punycode, case-folded first, path untouched
    assert (
        normalize_url("http://MÜNCHEN.example/Pfad")
        == "http://xn--mnchen-3ya.example/Pfad"
    )
    # already-punycoded hosts pass through unchanged
    assert (
        normalize_url("http://xn--mnchen-3ya.example/")
        == "http://xn--mnchen-3ya.example/"
    )
    # only the non-ASCII labels are encoded
    assert (
        normalize_url("https://商店.shop.example:443/a")
        == "https://xn--czrs0t.shop.example/a"
    )
    # determinism: unicode form and its punycode form collapse together
    assert normalize_url("http://münchen.example/") == normalize_url(
        "http://xn--mnchen-3ya.example/"
    )
