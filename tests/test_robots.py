"""robots.txt parsing (T5 gating dimension): pure-function cases +
vectorized dimension build round-trip against SynthWeb's rule table."""

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
