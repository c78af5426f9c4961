"""WARC-style archive record parsing — the crawl-output source format.

Web archives exchange crawl results as concatenated WARC records
(ISO 28500: a version line, named headers, a blank line, then the
payload). The reference keeps results in ORM rows (src/crawler/
models.py); a web-scale pipeline instead re-reads its own crawl output
— or a public archive dump — as the input of every curation pass, so
the engine needs a record parser that runs as a full scan with
whole-stage codegen: pure native expressions (regexp_extract_all +
per-record scalar regexes), no Python in the loop, same design as
sources/sitemap.py.

The subset parsed here: ``WARC/1.0`` version line, ``WARC-Target-URI``
and ``HTTP-Status`` headers, blank-line separator, payload until the
next version line. One archive blob can hold any number of records;
blobs are the unit of parallelism (one task parses many blobs), so a
100 TB archive is one partitioned scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (?s): records span lines. A record runs from its version line to the
# lookahead of the next one (or end of blob) — payloads are word text
# and never contain the version marker.
_RECORD_RE = "(?s)WARC/1\\.0\\n(.*?)(?=WARC/1\\.0\\n|$)"


def format_records(
    results: DataFrame,
    uri_col: str = "uri",
    status_col: str = "status",
    body_col: str = "body",
    blobs: int = 16,
) -> DataFrame:
    """Serialize fetch results into (blob_id, blob) archive strings —
    the write side of the round-trip, grouped into ``blobs`` output
    blobs by a uri hash so blob contents are deterministic but
    size-balanced. Records within a blob are ordered by uri (sort
    within groupBy'd collect_list) for byte-stable output."""
    rec = F.concat(
        F.lit("WARC/1.0\nWARC-Target-URI: "),
        F.col(uri_col),
        F.lit("\nHTTP-Status: "),
        F.col(status_col).cast("string"),
        F.lit("\n\n"),
        F.col(body_col),
        F.lit("\n"),
    )
    return (
        results.select(
            F.pmod(F.xxhash64(F.col(uri_col)), F.lit(blobs)).alias("blob_id"),
            F.struct(F.col(uri_col).alias("uri"), rec.alias("rec")).alias("r"),
        )
        .groupBy("blob_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("r")), lambda s: s["rec"]),
                "",
            ).alias("blob")
        )
    )


def parse_records(archives: DataFrame, blob_col: str = "blob") -> DataFrame:
    """(… blob) -> one row per WARC record: (uri, status, body).

    Records missing a Target-URI are dropped (unaddressable); a missing
    HTTP-Status parses as NULL (cast of '' -> NULL), kept — archives
    carry metadata records a curation pass may still want to count.
    Same Generate-boundary shape as parse_sitemaps: explode whole
    record strings, then run the scalar header regexes per record."""
    recs = archives.select(
        F.explode(
            F.regexp_extract_all(F.col(blob_col), F.lit(_RECORD_RE), 1)
        ).alias("rec")
    )
    uri = F.regexp_extract("rec", "WARC-Target-URI: ([^\\n]*)", 1)
    status = F.regexp_extract("rec", "HTTP-Status: ([^\\n]*)", 1)
    body = F.regexp_extract("rec", "(?s)\\n\\n(.*?)\\n?$", 1)
    return (
        recs.select(
            uri.alias("uri"),
            # regexp_extract's no-match is '' — ANSI cast would throw
            F.when(status == "", None).otherwise(status).cast("int").alias("status"),
            body.alias("body"),
        )
        .filter(F.col("uri") != "")
    )
