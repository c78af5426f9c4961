"""robots.txt parsing (T5 gating dimension): pure-function cases +
vectorized dimension build round-trip against SynthWeb's rule table."""

from pyspark.sql import functions as F

from crawler_spark.functions.robots import (
    DEFAULT_DELAY_S,
    parse_robots_txt,
    robots_dim,
)
from crawler_spark.sources.synth import T2_CORRECTNESS


def test_parse_basic():
    deny, allow, delay = parse_robots_txt(
        """
# comment
User-agent: *
Disallow: /private
Disallow: /tmp
Allow: /tmp/ok
Crawl-delay: 2.5
"""
    )
    assert deny == ["/private", "/tmp"]
    assert allow == ["/tmp/ok"]
    assert delay == 2.5


def test_parse_agent_precedence():
    txt = """
User-agent: *
Disallow: /a
Crawl-delay: 9

User-agent: crawler-spark
Disallow: /b
Crawl-delay: 1
"""
    deny, _, delay = parse_robots_txt(txt, agent="crawler-spark")
    assert deny == ["/b"] and delay == 1.0
    deny, _, delay = parse_robots_txt(txt, agent="otherbot")
    assert deny == ["/a"] and delay == 9.0


def test_parse_agent_longest_match_spec_direction():
    """RFC 9309: the ua token must be a substring of OUR agent (never the
    reverse), and the longest matching token wins over file order."""
    txt = """
User-agent: ark
Disallow: /substring-trap
User-agent: crawler
Disallow: /short
User-agent: crawler-spark
Disallow: /exact
User-agent: *
Disallow: /star
"""
    # "ark" IS a substring of "crawler-spark" so it matches, but
    # "crawler-spark" is the longest match and must win over file order
    deny, _, _ = parse_robots_txt(txt, agent="crawler-spark")
    assert deny == ["/exact"]
    # reverse-direction match must NOT fire: agent "c" is a substring of
    # every token but no token is a substring of "c" -> fall to *
    deny, _, _ = parse_robots_txt(txt, agent="c")
    assert deny == ["/star"]


def test_parse_crawl_delay_clamped():
    """Zero/negative Crawl-delay must not produce an infinite budget."""
    for bad in ("0", "-3"):
        _, _, delay = parse_robots_txt(f"User-agent: *\nCrawl-delay: {bad}\n")
        assert delay == DEFAULT_DELAY_S


def test_parse_edge_cases():
    assert parse_robots_txt(None) == ([], [], DEFAULT_DELAY_S)
    assert parse_robots_txt("") == ([], [], DEFAULT_DELAY_S)
    # empty Disallow = allow all (spec)
    deny, _, _ = parse_robots_txt("User-agent: *\nDisallow:\n")
    assert deny == []
    # stacked user-agent lines share one group
    deny, _, _ = parse_robots_txt(
        "User-agent: a\nUser-agent: *\nDisallow: /x\n"
    )
    assert deny == ["/x"]


def test_robots_dim_roundtrip(spark):
    """Parsing each host's robots.txt text reproduces SynthWeb's rule
    table exactly — the dimension the crawl rounds broadcast-join."""
    web = T2_CORRECTNESS
    texts = spark.createDataFrame(
        [(r["host"], web.robots_txt(r["host"])) for r in web.robots_rows()],
        "host string, robots_txt string",
    )
    got = {r["host"]: r for r in robots_dim(texts).collect()}
    for want in web.robots_rows():
        g = got[want["host"]]
        assert list(g["deny_prefixes"]) == want["deny_prefixes"]
        assert g["crawl_delay_s"] == want["crawl_delay_s"]


def test_like_pattern_compilation():
    from crawler_spark.functions.robots import like_pattern

    assert like_pattern("/a*b$") == "/a%b"
    assert like_pattern("/a*") == "/a%%"
    assert like_pattern("/plain") == "/plain%"
    # LIKE metacharacters in the robots pattern stay literal
    assert like_pattern("/100%_x") == "/100!%!_x%"
    assert like_pattern("/bang!") == "/bang!!%"


def test_rfc9309_gate_spec_semantics(spark):
    """RFC 9309 §2.2.2: wildcard + anchor matching, most-octets
    precedence, Allow wins exact ties, unmatched URLs allowed."""
    from pyspark.sql import functions as F

    from crawler_spark.functions.robots import robots_matcher_dim
    from crawler_spark.operators.politeness import rfc9309_gate

    robots = spark.createDataFrame(
        [
            (
                "h.test",
                "User-agent: *\n"
                "Disallow: /private*\n"
                "Allow: /private/ok$\n"
                "Disallow: *.tmp$\n"
                "Allow: /dual*\n"       # same length as the next line
                "Disallow: /dual/\n"    # tie on /dual/x -> hmm lengths differ
                "Disallow: \n",         # empty Disallow = allow-all, ignored
            )
        ],
        "host string, robots_txt string",
    )
    rules = robots_matcher_dim(robots)
    urls = spark.createDataFrame(
        [
            (1, "h.test", "/private/secret"),   # denied by /private*
            (2, "h.test", "/private/ok"),        # allow anchor wins (len 11 > 9)
            (3, "h.test", "/private/ok2"),       # anchor does NOT match -> denied
            (4, "h.test", "/cache/file.tmp"),    # denied by *.tmp$
            (5, "h.test", "/cache/file.tmpx"),   # anchor miss -> allowed (no rule)
            (6, "h.test", "/other"),             # no match -> default allow
            (7, "other.test", "/private/secret"),  # host without rules -> allow
        ],
        "url_hash long, host string, path string",
    )
    out = {r.url_hash: r for r in rfc9309_gate(urls, rules).collect()}
    assert not out[1].allowed and out[1].matched_pattern == "/private*"
    assert out[2].allowed and out[2].matched_pattern == "/private/ok$"
    assert not out[3].allowed
    assert not out[4].allowed and out[4].matched_pattern == "*.tmp$"
    assert out[5].allowed
    assert out[6].allowed and out[6].matched_pattern is None
    assert out[7].allowed and out[7].matched_pattern is None


def test_rfc9309_allow_wins_exact_tie(spark):
    from crawler_spark.operators.politeness import rfc9309_gate
    from crawler_spark.functions.robots import like_pattern

    rules = spark.createDataFrame(
        [
            ("h", "/p/a*", like_pattern("/p/a*"), True),
            ("h", "/p/*a", like_pattern("/p/*a"), False),
        ],
        "host string, pattern string, like_pattern string, allow boolean",
    )
    urls = spark.createDataFrame(
        [(1, "h", "/p/aXa")], "url_hash long, host string, path string"
    )
    row = rfc9309_gate(urls, rules).first()
    assert row.allowed and row.matched_pattern == "/p/a*"


def test_sitemap_urls_extraction(spark):
    from crawler_spark.functions.robots import sitemap_urls

    txt = (
        "User-agent: *\nDisallow: /x\n"
        "Sitemap: http://a.test/s1.xml\n"
        "  SITEMAP:   http://a.test/s2.xml\n"
        "notasitemap: http://a.test/nope.xml\n"
        "sitemap:http://a.test/s3.xml"
    )
    df = spark.createDataFrame([(txt,), ("no directives here",)], "t string")
    got = [r.u for r in df.select(sitemap_urls(F.col("t")).alias("u")).collect()]
    # case-insensitive, leading whitespace ok, no-space-after-colon ok,
    # prefixed token NOT matched; file order preserved; empty -> []
    assert got[0] == [
        "http://a.test/s1.xml",
        "http://a.test/s2.xml",
        "http://a.test/s3.xml",
    ]
    assert got[1] == []
