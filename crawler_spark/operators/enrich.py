"""Enrichment operators: fallback join, scenario first-hit, validation
join, latest-per-key — the geocode-pipeline analogs.

Reference parity:
* fallback join (J6): try Kakao, only on miss try Naver, first hit wins
  (src/map_api/__init__.py:62-118) -> two left joins + coalesce, with the
  second probe restricted to misses.
* scenario first-hit (W2/D2/C12): generate an ordered query list
  (full -> prefix-reduced -> name-only), first validated hit wins
  (src/map_api/kakao_api.py:131-155,219-247) -> posexplode + min_by(pos).
* latest-per-key (A7/W6/K5): keep the newest row per key by timestamp
  (src/utils/csv_handler.py:99-107) -> max_by / window row_number.
* top-1 by relevance (W1): size:1 sort:'accuracy' (kakao_api.py:28-32)
  -> max_by with deterministic tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fallback_join(
    base: DataFrame, primary: DataFrame, secondary: DataFrame, key: str, cols: list[str]
) -> DataFrame:
    """coalesce(primary.*, secondary.*) per row; the secondary probe only
    runs for primary misses (left_anti restriction), like the reference
    only calling Naver when Kakao fails."""
    p = primary.select(key, *[F.col(c).alias(f"_p_{c}") for c in cols])
    s = secondary.select(key, *[F.col(c).alias(f"_s_{c}") for c in cols])
    with_p = base.join(F.broadcast(p), key, "left")
    hits = with_p.filter(F.col(f"_p_{cols[0]}").isNotNull())
    misses = with_p.filter(F.col(f"_p_{cols[0]}").isNull()).join(
        F.broadcast(s), key, "left"
    )
    out_hit = hits.select(
        *base.columns,
        *[F.col(f"_p_{c}").alias(c) for c in cols],
        F.lit("primary").alias("enrich_source"),
    )
    out_miss = misses.select(
        *base.columns,
        *[F.col(f"_s_{c}").alias(c) for c in cols],
        F.when(F.col(f"_s_{cols[0]}").isNotNull(), F.lit("secondary"))
        .otherwise(F.lit("none"))
        .alias("enrich_source"),
    )
    return out_hit.unionByName(out_miss)


def generate_scenarios(query_col) -> "F.Column":
    """C12: build the ordered prefix-reduction scenario list from a raw
    query string (reference: src/map_api/kakao_api.py:131-145 — the full
    query, then each shorter prefix dropping the trailing token, finally
    the wildcard probe). Pure native expressions:
    ``transform(sequence(n, 1, -1), i -> first i tokens)`` + ['*'].
    """
    toks = F.filter(
        F.split(F.trim(query_col), "\\s+"), lambda t: F.length(t) > 0
    )
    prefixes = F.transform(
        F.sequence(F.size(toks), F.lit(1), F.lit(-1)),
        lambda i: F.concat_ws(" ", F.slice(toks, F.lit(1), i)),
    )
    return F.concat(prefixes, F.array(F.lit("*")))


def scenario_first_hit(
    base: DataFrame,
    scenarios_col: str,
    lookup: DataFrame,
    lookup_key: str,
    lookup_val: str,
    id_col: str,
) -> DataFrame:
    """Explode ordered scenarios, join the lookup, keep the first
    (lowest-pos) validated hit per row — W2 as min_by(result, pos)."""
    exploded = base.select(
        id_col, F.posexplode(scenarios_col).alias("pos", "q")
    )
    hits = exploded.join(
        F.broadcast(lookup.select(F.col(lookup_key).alias("q"), lookup_val)),
        "q",
        "inner",
    )
    return hits.groupBy(id_col).agg(
        F.min_by(F.col(lookup_val), F.col("pos")).alias("hit_val"),
        F.min("pos").alias("hit_pos"),
    )


def two_tier_lookup(
    base: DataFrame,
    parts_col: str,
    mapping: DataFrame,
    alias_col: str,
    canon_col: str,
    id_col: str,
    fallback_contains: str | None = None,
    fallback_value: str | None = None,
) -> DataFrame:
    """J5: exact-then-substring alias resolution against a broadcast
    mapping table (reference: address_parser.py:10-28,63-87 — per token
    in order, try the mapping key exactly, then as a substring; first
    hit wins; a marker-based default when nothing matches).

    Resolution order is ``min(struct(pos, tier))``: earliest token
    first, exact (tier 0) preferred over substring (tier 1) within a
    token. The mapping is broadcast on both tiers; the substring tier is
    a theta join, which is why the dim must be the small side.

    Output: (id, canon, tier) — tier -1 marks the fallback default.
    """
    exploded = base.select(
        F.col(id_col).alias("_id"), F.posexplode(parts_col).alias("pos", "part")
    )
    m = mapping.select(
        F.col(alias_col).alias("_alias"), F.col(canon_col).alias("_canon")
    )
    exact = exploded.join(
        F.broadcast(m), F.col("part") == F.col("_alias")
    ).select("_id", "pos", F.lit(0).alias("tier"), "_canon")
    sub = exploded.join(
        F.broadcast(m),
        (F.col("part") != F.col("_alias"))
        & F.col("part").contains(F.col("_alias")),
    ).select("_id", "pos", F.lit(1).alias("tier"), "_canon")
    hits = exact.unionByName(sub)
    best = hits.groupBy("_id").agg(
        F.min_by(
            F.struct(F.col("_canon"), F.col("tier")),
            F.struct(F.col("pos"), F.col("tier"), F.col("_canon")),
        ).alias("r")
    ).select(
        F.col("_id"), F.col("r._canon").alias("canon"), F.col("r.tier").alias("tier")
    )
    out = base.select(F.col(id_col).alias("_id"), F.col(parts_col).alias("_parts")).join(
        best, "_id", "left"
    )
    if fallback_contains is not None:
        joined_txt = F.concat_ws(" ", F.col("_parts"))
        out = out.withColumn(
            "canon",
            F.when(
                F.col("canon").isNull() & joined_txt.contains(fallback_contains),
                F.lit(fallback_value),
            ).otherwise(F.col("canon")),
        ).withColumn(
            "tier",
            F.when(
                F.col("canon").isNotNull() & F.col("tier").isNull(), F.lit(-1)
            ).otherwise(F.col("tier")),
        )
    return out.select(F.col("_id").alias(id_col), "canon", "tier")


def latest_per_key(df: DataFrame, key: str, ts_col: str, tie_col: str) -> DataFrame:
    """Newest row per key; deterministic tie-break on tie_col (desc)."""
    payload = F.struct(*[F.col(c) for c in df.columns])
    return (
        df.groupBy(key)
        .agg(F.max_by(payload, F.struct(F.col(ts_col), F.col(tie_col))).alias("row"))
        .select("row.*")
    )


def top1_per_group(df: DataFrame, group: str, score: str, tie_col: str) -> DataFrame:
    """W1: top-1 by score per group, ties to smallest tie_col."""
    payload = F.struct(*[F.col(c) for c in df.columns])
    return (
        df.groupBy(group)
        .agg(F.max_by(payload, F.struct(F.col(score), -F.col(tie_col))).alias("row"))
        .select("row.*")
    )


def jaccard_tokens(a, b):
    """A8: token-set Jaccard via native array ops
    (address_parser.py:253-264)."""
    ta = F.array_distinct(F.split(F.lower(a), "\\s+"))
    tb = F.array_distinct(F.split(F.lower(b), "\\s+"))
    return F.round(
        F.size(F.array_intersect(ta, tb))
        / F.greatest(F.size(F.array_union(ta, tb)), F.lit(1)),
        6,
    )


def scd2_intervals(
    changes: DataFrame,
    key_cols: list[str],
    version_col: str,
    open_end: int = 999999,
) -> DataFrame:
    """Type-2 slowly-changing dimension build: a change log (one row
    per key per version where an attribute changed) becomes validity
    intervals [valid_from, valid_to] via one lead() window per key —
    the warehouse pattern that lets any fact row join the dimension
    value that was TRUE AT ITS TIME (robots rules, host metadata,
    politeness budgets all change mid-crawl; joining today's dimension
    onto last month's fetches silently rewrites history).

    The window partitions by key and orders by version — dimension-
    sized, never a fact-table sort. The current row's interval stays
    open as `open_end` (a sentinel beats NULL: range predicates stay
    sargable and engine-comparable). Composes with asof_join for the
    temporal lookup; `scd2_lookup` below is the interval-equi form."""
    w = Window.partitionBy(*key_cols).orderBy(version_col)
    return changes.withColumn(
        "valid_from", F.col(version_col).cast("long")
    ).withColumn(
        "valid_to",
        F.coalesce(
            F.lead(F.col(version_col).cast("long")).over(w) - F.lit(1),
            F.lit(open_end).cast("long"),
        ),
    ).drop(version_col)


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: list[str],
    at_col: str,
) -> DataFrame:
    """Point-in-time dimension lookup: each fact row joins the ONE
    interval row covering its `at_col`. Equi-join on the keys first
    (hash join, dimension broadcast when small) with the BETWEEN as a
    residual filter — never a pure range theta-join. Intervals per key
    are disjoint by construction, so the join is 1:1 per fact row."""
    d = F.broadcast(dim)
    cond = [facts[c] == dim[c] for c in key_cols] + [
        facts[at_col].cast("long").between(
            dim["valid_from"], dim["valid_to"]
        )
    ]
    return facts.join(d, cond, "left").drop(*[dim[c] for c in key_cols])
