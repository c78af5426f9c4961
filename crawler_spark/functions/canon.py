"""URL canonicalization — the engine's analog of the reference's address
normalization layer (reference: src/utils/address_parser.py:150-163
``normalize_address``, src/map_api/base.py:24-69 ``clean_address_for_search``).

Two tiers:

* :func:`normalize_url` — full RFC 3986 normalization in pure Python
  (lowercase scheme/host, strip default port, resolve dot-segments,
  normalize percent-encoding, sort query params, drop fragment). Applied as
  a **vectorized pandas UDF** (:func:`canonicalize_udf`) — Arrow-batched,
  never per-row Python UDF.
* :func:`with_url_cols` — attaches ``url_canon``, ``url_hash``
  (Spark-native ``xxhash64``, JVM-side) and ``host`` (``parse_url``) to a
  DataFrame. Hashing and host extraction stay inside whole-stage codegen.

The sequential oracle uses the same :func:`normalize_url` +
:mod:`crawler_spark.functions.xxh` so engine and oracle agree bit-for-bit.
"""

from __future__ import annotations

from urllib.parse import quote, unquote, urljoin, urlsplit

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21}

# RFC 3986 unreserved characters — safe to percent-decode
_UNRESERVED = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)


def _resolve_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
                if not out:
                    out = [""]
            continue
        out.append(seg)
    # preserve leading slash; re-join
    p = "/".join(out)
    if path.startswith("/") and not p.startswith("/"):
        p = "/" + p
    # trailing '.' / '..' leave a trailing slash per the RFC algorithm
    if path.endswith(("/.", "/..")) and not p.endswith("/"):
        p += "/"
    return p or "/"


def _norm_pct(s: str) -> str:
    """Decode unreserved %XX, re-encode the rest with uppercase hex."""
    # unquote fully, then re-quote everything that is not unreserved or a
    # path-legal delimiter; this uppercases hex digits as a side effect.
    return quote(unquote(s), safe="/:@!$&'()*+,;=~-._")


def normalize_url(url: str) -> str:
    """Full RFC 3986 normalization (+ RFC 3490 IDN host encoding). Pure
    function; also used by the oracle, so engine and oracle share one
    definition by construction."""
    url = url.strip()
    parts = urlsplit(url)
    scheme = parts.scheme.lower() or "http"
    host = (parts.hostname or "").lower().rstrip(".")
    if not host.isascii():
        # internationalized hostname -> punycode (stdlib IDNA codec);
        # already-encoded xn-- labels pass through unchanged above. A
        # label the codec rejects keeps its lowercase unicode form —
        # canonicalization must stay total (dedup correctness only needs
        # determinism; fetch-time DNS will reject what it rejects).
        try:
            host = ".".join(
                lbl.encode("idna").decode("ascii") if not lbl.isascii() else lbl
                for lbl in host.split(".")
            )
        except UnicodeError:
            pass
    port = parts.port
    netloc = host
    if port is not None and _DEFAULT_PORTS.get(scheme) != port:
        netloc = f"{host}:{port}"
    path = _norm_pct(_resolve_dot_segments(parts.path or "/"))
    query = ""
    if parts.query:
        pairs = sorted(p for p in parts.query.split("&") if p)
        query = "&".join(_norm_pct(p) for p in pairs)
    out = f"{scheme}://{netloc}{path}"
    if query:
        out += f"?{query}"
    return out  # fragment intentionally dropped


@F.pandas_udf(T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    """Arrow-batched vectorized canonicalization (no per-row Python UDF)."""
    return urls.map(normalize_url)


def canon_native(url: Column) -> Column:
    """Portable *simplified* canonicalization in native expressions only
    (stays in whole-stage codegen; also expressible in ANSI SQL for the
    DuckDB oracle): trim, drop fragment, lowercase, strip default :80
    port, collapse ``/./`` segments.

    Used by the oracle-checked queries; the engine's hot path uses
    :func:`canonicalize_udf` for full RFC 3986 semantics.
    """
    c = F.lower(F.trim(url))
    c = F.regexp_replace(c, "#.*$", "")
    c = F.regexp_replace(c, ":80/", "/")
    c = F.regexp_replace(c, "/\\./", "/")
    return c


def with_url_cols(
    df: DataFrame, url_col: str = "url", full: bool = True
) -> DataFrame:
    """Attach url_canon / url_hash / host.

    url_hash = xxhash64(url_canon) — Spark-native, JVM-side, seed 42.
    host via parse_url (native). Only canonicalization itself leaves the
    JVM (vectorized Arrow batch), and only when ``full=True``.
    """
    canon = canonicalize_udf(F.col(url_col)) if full else canon_native(F.col(url_col))
    return (
        df.withColumn("url_canon", canon)
        .withColumn("url_hash", F.xxhash64(F.col("url_canon")))
        .withColumn("host", F.parse_url(F.col("url_canon"), F.lit("HOST")))
    )


def surt_key(url: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key — the canonical
    sort key of web-archive CDX indexes (Internet Archive / Common Crawl
    cdxj): ``http://www.Example.com:8080/A/b?z=1&a=2`` →
    ``com,example)/a/b?a=2&z=1``.

    Reversed host labels make one range of the sorted index = one
    registrable domain and all its subdomains, so a range-partitioned
    10^10-row URL index gives per-domain locality: domain lookups,
    politeness scans and frontier merges touch one partition range
    instead of shuffling (pair this with catalog file stats for
    manifest-level pruning on the key).

    Rules implemented (the portable core of the IA spec): lowercase,
    scheme dropped, leading ``www.`` and default/explicit port stripped,
    host labels reversed and comma-joined, ``)`` separator, path
    (``/`` if empty), query params sorted. Pure native expressions
    (regexp parse, not parse_url, so the DuckDB oracle is
    character-identical).
    """
    u = F.lower(F.trim(url))
    host = F.regexp_replace(
        F.regexp_extract(u, "^[a-z][a-z0-9+.-]*://([^/?#]+)", 1), ":\\d+$", ""
    )
    host = F.regexp_replace(host, "^www\\.", "")
    rev = F.concat_ws(",", F.reverse(F.split(host, "\\.")))
    path = F.regexp_extract(u, "^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, "\\?([^#]*)", 1)
    return F.concat(
        rev,
        F.lit(")"),
        path,
        F.when(query == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), F.array_join(F.array_sort(F.split(query, "&")), "&"))
        ),
    )


@F.pandas_udf(T.StringType())
def resolve_href_udf(base: pd.Series, href: pd.Series) -> pd.Series:
    """Full RFC 3986 §5.2 reference resolution (stdlib ``urljoin``),
    Arrow-batched — the engine hot path for turning an extracted
    ``<a href>`` into an absolute outlink before canonicalization.
    Fragments are dropped (crawlers never distinguish them)."""
    out = [
        urljoin(b, h).split("#", 1)[0] if b else (h or "")
        for b, h in zip(base, href)
    ]
    return pd.Series(out)


def resolve_href_native(base: Column, href: Column) -> Column:
    """Portable RFC 3986 §5.2.2 reference resolution in native
    expressions only (whole-stage codegen; mirrored verbatim in the
    DuckDB oracle). Handles the branches a link extractor actually
    meets: absolute href, protocol-relative ``//host/p``,
    root-relative ``/p``, query-only ``?q``, fragment-only ``#f``,
    empty, and relative paths with ``./``/``../`` (dot segments
    resolved by a bounded 8-pass fixed-point — depth > 8 of
    consecutive ``..`` is vanishingly rare in real HTML and the
    leftover is harmless: it stays a unique, stable key).

    Pure map-side projection — no shuffle, nothing to tune at scale.
    """
    b = F.trim(base)
    h = F.trim(href)
    origin = F.regexp_extract(b, "^([a-z][a-z0-9+.-]*://[^/?#]*)", 1)
    scheme = F.regexp_extract(b, "^([a-z][a-z0-9+.-]*):", 1)
    bpath = F.regexp_extract(b, "^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    bpath = F.when(bpath == "", F.lit("/")).otherwise(bpath)
    bdir = F.regexp_replace(bpath, "[^/]*$", "")
    merged = F.concat(bdir, h)

    def _dots(p: Column) -> Column:
        # /./ and /../ fixed-point: 8 global passes bound the chain depth
        for _ in range(8):
            p = F.regexp_replace(p, "/\\.(/|$)", "/")
            p = F.regexp_replace(p, "/[^/.][^/]*/\\.\\.(/|$)", "/")
            p = F.regexp_replace(p, "/\\.[^/.][^/]*/\\.\\.(/|$)", "/")
            p = F.regexp_replace(p, "/\\.\\.[^/]+/\\.\\.(/|$)", "/")
            p = F.regexp_replace(p, "^/\\.\\.(/|$)", "/")  # over-pop clamps at root
        return p

    resolved = (
        F.when(h == "", b)
        .when(h.startswith("#"), b)
        .when(h.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*:"), h)
        .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
        .when(h.startswith("?"), F.concat(origin, bpath, h))
        .when(h.startswith("/"), F.concat(origin, _dots(h)))
        .otherwise(F.concat(origin, _dots(merged)))
    )
    return F.regexp_replace(resolved, "#.*$", "")
