"""Spider-trap detection over frontier URLs.

A crawler that follows links blindly walks into infinite URL spaces:
calendar pages that link to next-month forever (``/cal/2024/2024/...``,
repeated path segments), session-id / pagination parameter mills (one
path template generating unbounded distinct URLs), and mirror loops.
The reference crawler never meets these — it drives a fixed site list
(reference: src/crawler/crawler.py seed regions) — but a web-scale
frontier MUST gate them or the frontier fills with one host's garbage.

Heritrix ships the same two detectors this module computes (public
behavior: PathologicalPathDecideRule = repeated-segment runs,
TooManyPathSegmentsDecideRule = depth cap); the template-explosion
signal is the URL-normalization insight of the DUST line of work
(Bar-Yossef et al., WWW'07): URLs differing only in digit runs are one
logical resource family, so a family generating unboundedly many
members marks a parameter mill.

Dataflow shape (axes: 10^10-URL frontier):
* per-URL signals are pure native array/regex expressions — zero
  shuffles, whole-stage codegen, no Python;
* the host report is two map-side-combinable aggregations (one keyed
  by host, one by (host, template)) joined on the host dimension —
  the (host, template) key is bounded by design (templates collapse
  digit runs), so no skew beyond what the host agg already carries.

The repeated-segment count uses a sorted-adjacent fold: ``array_sort``
makes equal segments adjacent, one struct-fold pass counts the longest
run — O(segments log segments) per row, still shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.text import max_multiplicity

# path component of a URL: scheme://authority(path-until-?-or-#)
_PATH_RE = "^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)"


def _pin(col, k: int):
    """floor(x*10^k + 0.5)/10^k — deterministic cross-engine rounding
    (same IEEE ops in Spark and DuckDB; see operators/corpus._pin)."""
    sc = float(10**k)
    return F.floor(col * F.lit(sc) + F.lit(0.5)) / F.lit(sc)


def trap_signals(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-URL trap signals, appended as columns:

    * ``path_depth``   — number of non-empty path segments
    * ``max_seg_repeat`` — largest multiplicity of any single segment
      (3+ repeats of one segment is the pathological-path signature)
    * ``path_template`` — the path with every digit run collapsed to
      ``N`` (the DUST-style resource-family key)

    Pure native expressions; no shuffle, no Python.
    """
    path = F.regexp_extract(F.col(url_col), _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    segs = F.filter(F.split(path, "/"), lambda x: F.length(x) > 0)
    return urls.withColumns(
        {
            "path_depth": F.size(segs).cast("int"),
            "max_seg_repeat": max_multiplicity(segs).cast("int"),
            "path_template": F.regexp_replace(path, "[0-9]+", "N"),
        }
    )


def host_trap_report(
    urls: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    repeat_threshold: int = 3,
    template_threshold: int = 50,
) -> DataFrame:
    """Per-host spider-trap report over a frontier slice:

    (host, n_urls, n_templates, max_urls_per_template, max_seg_repeat,
     avg_path_depth, trap_suspect)

    ``trap_suspect`` fires when any URL repeats one path segment
    ``repeat_threshold``+ times (calendar/mirror loop) OR one collapsed
    path template has accumulated ``template_threshold``+ member URLs
    (session-id / pagination parameter mill). The report is
    host-dimension sized — broadcastable back onto the frontier as a
    demotion/deny gate the same way the robots dimension joins in
    (operators/politeness.robots_gate).
    """
    sig = trap_signals(urls, url_col=url_col).select(
        F.col(host_col).alias("host"),
        "path_depth",
        "max_seg_repeat",
        "path_template",
    )
    tpl = sig.groupBy("host", "path_template").agg(
        F.count(F.lit(1)).alias("n")
    )
    tph = tpl.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_templates"),
        F.max("n").alias("max_urls_per_template"),
    )
    hh = sig.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.max("max_seg_repeat").cast("int").alias("max_seg_repeat"),
        F.sum("path_depth").alias("_sum_depth"),
    )
    return (
        hh.join(tph, "host")
        .select(
            "host",
            "n_urls",
            "n_templates",
            "max_urls_per_template",
            "max_seg_repeat",
            _pin(F.col("_sum_depth").cast("double") / F.col("n_urls"), 6).alias(
                "avg_path_depth"
            ),
            (
                (F.col("max_seg_repeat") >= F.lit(repeat_threshold))
                | (F.col("max_urls_per_template") >= F.lit(template_threshold))
            ).alias("trap_suspect"),
        )
    )


def url_prefix_rollup(
    urls: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    max_depth: int = 6,
) -> DataFrame:
    """Path-prefix (trie) rollup of the URL space: one row per
    (host, path prefix, depth) with how many URLs live under that
    prefix and how many terminate exactly there — the budget-profiling
    view every crawl-ops dashboard wants ("is host X's volume three
    sections or one parameter mill?"), and the aggregation level where
    DUST rules and trap demotions get DECIDED before being applied
    per-URL.

    Pure native expressions: extract the path, split to segments, emit
    each URL's prefixes to ``max_depth`` via one transform+explode
    (O(depth) rows per URL, depth capped), one map-side-combinable
    aggregation. No Python, no joins; at 10^10 URLs the single shuffle
    is the (host, prefix) aggregation, whose cardinality is the trie
    size — far below the URL count on any real site.

    Returns (host, prefix, depth, n_urls, n_exact), n_exact = URLs
    whose whole (capped) path equals the prefix.
    """
    path = F.regexp_extract(
        F.col(url_col), r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    segs = F.filter(F.split(path, "/"), lambda x: x != "")
    return (
        urls.select(
            F.col(host_col).alias("host"),
            segs.alias("_segs"),
        )
        .filter(F.size("_segs") > 0)
        .select(
            "host",
            F.size("_segs").alias("_n"),
            F.explode(
                F.expr(
                    f"transform(sequence(1, least(size(_segs), {int(max_depth)})),"
                    " i -> named_struct("
                    "   'depth', i,"
                    "   'prefix', concat('/', concat_ws('/', slice(_segs, 1, i)))))"
                )
            ).alias("p"),
        )
        .groupBy("host", F.col("p.prefix").alias("prefix"), F.col("p.depth").alias("depth"))
        .agg(
            F.count("*").alias("n_urls"),
            F.sum(
                F.when(F.col("p.depth") == F.least(F.col("_n"), F.lit(int(max_depth))), 1).otherwise(0)
            ).alias("n_exact"),
        )
    )


def front_coding_estimate(
    urls: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    cap: int = 48,
) -> DataFrame:
    """Front-coding (incremental-encoding) size estimate for a sorted
    URL index — the compression CDX indexes and WebGraph's URL lists
    actually use: store each sorted URL as (shared-prefix length,
    suffix). Sorted URLs share long prefixes, so the index shrinks by
    the per-host prefix mass; this operator reports exactly how much,
    per host, BEFORE anyone commits to the layout (the storage-planning
    twin of adjacency_gap_bits, which prices the link side).

    Per host: urls sorted lexicographically (a host-partitioned window
    — never a global sort), adjacent common-prefix length via the
    capped greatest-term LCP (suffix.py's native expression, clamped
    to both lengths), front-coded cost = 2 overhead bytes + the
    unshared suffix; first URL per host stores fully. One window + one
    combinable aggregation.

    Returns (host, n_urls, bytes_flat, bytes_front, saved_ratio6).
    """
    from pyspark.sql import Window

    from crawler_spark.operators.suffix import _lcp_expr

    lagged = urls.select(
        F.col(host_col).alias("host"),
        F.expr(f"substring({url_col}, 1, {int(cap)})").alias("u"),
        F.length(F.col(url_col)).alias("len_full"),
    ).withColumn(
        "prev", F.lag("u").over(Window.partitionBy("host").orderBy("u"))
    )
    lcp = F.when(F.col("prev").isNull(), F.lit(0)).otherwise(
        _lcp_expr("u", "prev", int(cap))
    )
    costed = lagged.select(
        "host",
        "len_full",
        lcp.alias("lcp"),
    )
    return costed.groupBy("host").agg(
        F.count("*").alias("n_urls"),
        F.sum("len_full").alias("bytes_flat"),
        F.sum(F.col("len_full") - F.col("lcp") + F.lit(2)).alias(
            "bytes_front"
        ),
        (
            F.floor(
                (
                    F.lit(1.0)
                    - F.sum(F.col("len_full") - F.col("lcp") + F.lit(2))
                    .cast("double")
                    / F.sum("len_full").cast("double")
                )
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("saved_ratio6"),
    )
