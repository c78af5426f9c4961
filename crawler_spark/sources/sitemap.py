"""Sitemap ingestion — the standards-based frontier source.

A real crawl seeds its frontier from robots.txt-advertised sitemaps
(sitemaps.org protocol: <urlset><url><loc/><priority/></url></urlset>)
before any link expansion. The reference discovers work by paging a
search API (reference: src/crawler/kakao_api.py); a web-scale crawler
swaps that for sitemap fetches per host. This module parses sitemap XML
into frontier candidate rows with pure native expressions
(regexp_extract_all + arrays_zip — no XML library, no Python UDF), so a
100 TB sitemap dump is one scan with whole-stage codegen.

Entries are extracted positionally (loc[i] pairs with priority[i]);
sitemaps interleave other tags freely, which the per-tag regex pulls
apart without a structural parse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_sitemaps(
    sitemaps: DataFrame, xml_col: str = "xml", host_col: str = "host"
) -> DataFrame:
    """(host, xml) -> one row per <url> entry: (host, loc, priority).

    An entry with no <priority> tag gets the protocol default 0.5;
    entries with no <loc> are dropped (nothing to crawl).

    Plan note: the generator explodes whole ``<url>...</url>`` entry
    strings and the two scalar regexes run per ENTRY — extracting
    parallel loc/priority arrays instead would make the optimizer inline
    the priority-array expression above the Generate and re-parse the
    whole XML blob once per exploded row (the Generate-boundary variant
    of the lambda-CSE trap, measured on the first cut of this parser)."""
    entries = sitemaps.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit("<url>(.*?)</url>"), 1)
        ).alias("entry"),
    )
    loc = F.regexp_extract(F.col("entry"), "<loc>([^<]*)</loc>", 1)
    prio = F.regexp_extract(F.col("entry"), "<priority>([^<]*)</priority>", 1)
    return (
        entries.select(
            "host",
            loc.alias("loc"),
            F.when(prio == "", F.lit(0.5)).otherwise(prio.cast("double")).alias(
                "priority"
            ),
        )
        .filter(F.col("loc") != "")
    )


def top_candidates_per_host(parsed: DataFrame, per_host: int = 3) -> DataFrame:
    """Frontier admission: the per_host highest-priority sitemap entries
    (priority desc, loc asc tie-break) — the same host-partitioned window
    shape the politeness scheduler uses, so no extra shuffle when chained
    before it."""
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("loc"))
    return (
        parsed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= per_host)
        .select("host", "loc", "priority", "rk")
    )


def seeds_from_sitemaps(sitemaps: DataFrame, per_host: int = 3) -> list[str]:
    """Seed list for ``plans.rounds.init_crawl`` from sitemap XML: the
    admitted per-host candidates globally ordered by (priority desc,
    loc asc). Collects — seed lists are small by contract (the frontier
    GROWS distributed from them; only the bootstrap is driver-side,
    same as a seeds_raw literal)."""
    rows = (
        top_candidates_per_host(parse_sitemaps(sitemaps), per_host)
        .orderBy(F.desc("priority"), F.asc("loc"))
        .collect()
    )
    return [r["loc"] for r in rows]
