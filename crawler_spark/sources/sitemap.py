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

    priority defaults to 0.5 when the tag count does not line up (the
    protocol default); loc rows are never dropped."""
    locs = F.regexp_extract_all(F.col(xml_col), F.lit("<loc>([^<]*)</loc>"), 1)
    prios = F.regexp_extract_all(
        F.col(xml_col), F.lit("<priority>([^<]*)</priority>"), 1
    )
    z = sitemaps.select(
        F.col(host_col).alias("host"),
        F.size(locs).alias("n_loc"),
        F.size(prios).alias("n_prio"),
        F.posexplode(locs).alias("i", "loc"),
        prios.alias("_prios"),
    )
    return z.select(
        "host",
        "loc",
        F.when(
            F.col("n_loc") == F.col("n_prio"),
            F.element_at("_prios", F.col("i") + 1).cast("double"),
        )
        .otherwise(F.lit(0.5))
        .alias("priority"),
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
