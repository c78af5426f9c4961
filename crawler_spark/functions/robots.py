"""robots.txt parsing → the per-host politeness dimension.

The reference's gating state is a consent/filter popup handled once per
session (reference: src/crawler/crawler.py:65-117) plus a global
CRAWL_DELAY (src/config.py:49); our engine's analog is the standard
robots exclusion protocol. This module turns raw robots.txt bodies into
the ``(host, deny_prefixes, crawl_delay_s)`` dimension that
``plans/rounds.py`` broadcast-joins each round.

Parsing is a vectorized pandas UDF (one call per Arrow batch of hosts —
robots bodies are small text; the dimension is tiny relative to the
frontier and is broadcast after this one pass).

Supported subset (what a crawl scheduler needs):
* ``User-agent:`` groups; rules apply to ``*`` or our agent name
* ``Disallow: <prefix>`` (empty prefix = allow-all line, per the spec)
* ``Allow:`` lines are recorded but only deny prefixes gate scheduling
* ``Crawl-delay: <seconds>``
* comments (#) and blank lines
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_AGENT = "crawler-spark"
DEFAULT_DELAY_S = 1.0

ROBOTS_RULES_SCHEMA = T.StructType(
    [
        T.StructField("deny_prefixes", T.ArrayType(T.StringType())),
        T.StructField("allow_prefixes", T.ArrayType(T.StringType())),
        T.StructField("crawl_delay_s", T.DoubleType()),
    ]
)


def parse_robots_txt(
    text: str | None, agent: str = DEFAULT_AGENT
) -> tuple[list[str], list[str], float]:
    """Parse one robots.txt body → (deny_prefixes, allow_prefixes,
    crawl_delay_s). Groups for ``*`` apply unless a more specific group
    for ``agent`` exists (standard precedence)."""
    if not text:
        return [], [], DEFAULT_DELAY_S
    groups: dict[str, dict] = {}
    current: list[str] = []
    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            ua = value.lower()
            if current and any(
                g in groups and (groups[g]["deny"] or groups[g]["allow"] or groups[g]["delay"] is not None)
                for g in current
            ):
                current = [ua]  # new group starts after rules were seen
            else:
                current.append(ua)  # stacked user-agent lines share a group
            groups.setdefault(ua, {"deny": [], "allow": [], "delay": None})
        elif field in ("disallow", "allow", "crawl-delay"):
            if not current:
                continue
            for ua in current:
                g = groups[ua]
                if field == "disallow" and value:
                    g["deny"].append(value)
                elif field == "allow" and value:
                    g["allow"].append(value)
                elif field == "crawl-delay":
                    try:
                        g["delay"] = float(value)
                    except ValueError:
                        pass
    # RFC 9309 §2.2.1 group selection: a group applies when its
    # user-agent token is a (case-insensitive) substring of OUR product
    # token — never the reverse direction — and the LONGEST matching
    # token wins over file order (most-specific group).
    a = agent.lower()
    matching = [ua for ua in groups if ua != "*" and ua in a]
    if matching:
        chosen = groups[max(matching, key=len)]
    else:
        chosen = groups.get("*")
    if chosen is None:
        return [], [], DEFAULT_DELAY_S
    delay = chosen["delay"] if chosen["delay"] is not None else DEFAULT_DELAY_S
    # Crawl-delay <= 0 would make the politeness budget infinite (or
    # negative) downstream; treat it as absent per the defensive default
    if delay <= 0:
        delay = DEFAULT_DELAY_S
    return chosen["deny"], chosen["allow"], delay


@F.pandas_udf(ROBOTS_RULES_SCHEMA)
def robots_rules_udf(texts: pd.Series) -> pd.DataFrame:
    """Arrow-batched robots.txt parsing (no per-row Python UDF)."""
    rows = [parse_robots_txt(t) for t in texts]
    return pd.DataFrame(
        {
            "deny_prefixes": [r[0] for r in rows],
            "allow_prefixes": [r[1] for r in rows],
            "crawl_delay_s": [r[2] for r in rows],
        }
    )


def sitemap_urls(robots_txt_col):
    """``Sitemap:`` directive extraction (RFC 9309 §2.3 treats it as an
    unknown-but-preserved line; the sitemaps.org protocol defines it) —
    the way crawlers actually DISCOVER sitemaps. Pure native
    ``regexp_extract_all`` (inline (?im) flags work in both Java regex
    and RE2, so the DuckDB oracle matches verbatim); returns the
    array of sitemap URLs in file order. Sitemap lines are
    group-independent per the protocol, so this never consults
    user-agent sections."""
    return F.regexp_extract_all(
        robots_txt_col, F.lit(r"(?im)^\s*sitemap:\s*(\S+)"), 1
    )


def robots_dim(robots_texts: DataFrame, host_col: str = "host",
               text_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) → the broadcastable politeness dimension with
    the exact schema plans/rounds.py expects.

    Note: only ``deny_prefixes`` gate scheduling downstream —
    ``Allow:`` lines are parsed but intentionally not applied, so a host
    with ``Disallow: /`` plus ``Allow: /public`` blocks everything (the
    conservative direction for a polite crawler)."""
    parsed = robots_texts.select(
        F.col(host_col).alias("host"), robots_rules_udf(F.col(text_col)).alias("r")
    )
    return parsed.select(
        "host",
        F.col("r.deny_prefixes").alias("deny_prefixes"),
        F.col("r.crawl_delay_s").alias("crawl_delay_s"),
    )


# --------------------------- RFC 9309 wildcard path matching (§2.2.2-2.2.3)


def like_pattern(pattern: str) -> str:
    """Compile one robots.txt path pattern to a SQL LIKE pattern
    (ESCAPE '!'): ``*`` matches any octet sequence, a TRAILING ``$``
    anchors the end of the URI, every other character is literal. A
    pattern without the anchor is a prefix match, so the compiled form
    gains a trailing ``%``. LIKE keeps the whole gate inside native SQL
    in both the engine and the oracle — no regex dialect drift."""
    esc = pattern.replace("!", "!!").replace("%", "!%").replace("_", "!_")
    anchored = esc.endswith("$")
    if anchored:
        esc = esc[:-1]
    esc = esc.replace("*", "%")
    return esc if anchored else esc + "%"


MATCH_RULES_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("pattern", T.StringType()),
            T.StructField("like_pattern", T.StringType()),
            T.StructField("allow", T.BooleanType()),
        ]
    )
)


@F.pandas_udf(MATCH_RULES_SCHEMA)
def robots_match_rules_udf(texts: pd.Series) -> pd.Series:
    """Arrow-batched robots.txt → the chosen group's full rule list
    (Allow AND Disallow, wildcards intact) with precompiled LIKE forms."""
    out = []
    for t in texts:
        deny, allow, _ = parse_robots_txt(t)
        out.append(
            [(p, like_pattern(p), False) for p in deny]
            + [(p, like_pattern(p), True) for p in allow]
        )
    return pd.Series(out)


def robots_matcher_dim(
    robots_texts: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) → exploded per-rule matcher dimension
    (host, pattern, like_pattern, allow) for :func:`politeness.rfc9309_gate`.
    Broadcast-sized: a few rules per crawled host."""
    return (
        robots_texts.select(
            F.col(host_col).alias("host"),
            F.explode(robots_match_rules_udf(F.col(text_col))).alias("r"),
        )
        .select("host", "r.pattern", "r.like_pattern", "r.allow")
    )
