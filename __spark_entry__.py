"""Driver contract for the spark-graft builder (PySpark target).

Every entry maps to an operator family in SURVEY.md §2; the Spark side
lives in crawler_spark/ and the oracle SQL mirrors it expression-for-
expression (portable constructs only: md5, regexp_replace(...,'g'),
window functions, list ops). Rounding is applied to every float output on
BOTH sides so value hashes match.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawler_spark.functions.zorder import zvalue_duckdb_sql as _zvalue_duckdb_sql
from crawler_spark.functions.zorder import hvalue_duckdb_ctes as _hvalue_duckdb_ctes

SF_DEFAULT = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# crawl-engine operators over a frontier derived deterministically from the
# documents table (so the DuckDB oracle can rebuild the identical frontier)
# --------------------------------------------------------------------------

def _frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id"),
        F.concat(F.lit("host-"), (F.col("doc_id") % 20).cast("string"), F.lit(".test")).alias("host"),
        F.concat(
            F.lit("http://host-"),
            (F.col("doc_id") % 20).cast("string"),
            F.lit(".test/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        (F.col("doc_id") % 3).alias("priority"),
        (F.col("n_chars") % 4).alias("depth"),
        F.col("doc_id").alias("discovery_seq"),
    )


_FRONTIER_SQL = """
  SELECT doc_id,
         'host-' || (doc_id % 20) || '.test' AS host,
         'http://host-' || (doc_id % 20) || '.test/doc/' || doc_id AS url,
         doc_id % 3 AS priority,
         n_chars % 4 AS depth,
         doc_id AS discovery_seq
  FROM documents
"""


def _hexdig_sql(expr: str, i: int) -> str:
    """DuckDB mirror of operators/pairs._hexdig (0-15 from md5 hex digit)."""
    return f"(instr('0123456789abcdef', substring(md5({expr}), {i}, 1)) - 1)"


def _dots_sql(expr: str) -> str:
    """DuckDB mirror of canon.resolve_href_native's bounded 8-pass
    dot-segment fixed-point (same five regexes, same order)."""
    for _ in range(8):
        expr = rf"regexp_replace({expr}, '/\.(/|$)', '/', 'g')"
        expr = rf"regexp_replace({expr}, '/[^/.][^/]*/\.\.(/|$)', '/', 'g')"
        expr = rf"regexp_replace({expr}, '/\.[^/.][^/]*/\.\.(/|$)', '/', 'g')"
        expr = rf"regexp_replace({expr}, '/\.\.[^/]+/\.\.(/|$)', '/', 'g')"
        expr = rf"regexp_replace({expr}, '^/\.\.(/|$)', '/', 'g')"
    return expr


_RESOLVE_LINKS_SQL = f"""
    WITH pairs AS (
      SELECT doc_id,
             'http://host-' || (doc_id % 20) || '.test/sec-' || (doc_id % 7)
               || '/sub/page-' || doc_id || '.html' AS base,
             (list_value(
                'next-' || doc_id || '.html', './same.html', '../up.html',
                '../../../../deep.html', '/rooted/x.html',
                '//cdn-host.test/asset.png', 'https://ext.test/abs',
                '?page=2', '#frag', '', 'a/../b/./c.html',
                'mailto:admin@host.test'))[(doc_id % 12) + 1] AS href
      FROM documents
    ),
    parts AS (
      SELECT doc_id, base, href,
             regexp_extract(base, '^([a-z][a-z0-9+.-]*://[^/?#]*)', 1) AS origin,
             regexp_extract(base, '^([a-z][a-z0-9+.-]*):', 1) AS scheme,
             CASE WHEN regexp_extract(base,
                    '^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)', 1) = ''
                  THEN '/'
                  ELSE regexp_extract(base,
                    '^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)', 1) END AS bpath
      FROM pairs
    ),
    parts2 AS (
      SELECT *, regexp_replace(bpath, '[^/]*$', '') AS bdir FROM parts
    )
    SELECT doc_id, base, href,
           regexp_replace(
             CASE WHEN href = '' THEN base
                  WHEN href LIKE '#%' THEN base
                  WHEN regexp_matches(href, '^[a-zA-Z][a-zA-Z0-9+.-]*:')
                    THEN href
                  WHEN href LIKE '//%' THEN scheme || ':' || href
                  WHEN href LIKE '?%' THEN origin || bpath || href
                  WHEN href LIKE '/%' THEN origin || {_dots_sql("href")}
                  ELSE origin || {_dots_sql("(bdir || href)")}
             END, '#.*$', '', 'g') AS resolved
    FROM parts2
"""


_PAIR_META_SQL = f"""
  SELECT doc_id AS image_id,
         CAST(32 + 8 * (16 * {_hexdig_sql("cast(doc_id AS varchar)", 1)}
                        + {_hexdig_sql("cast(doc_id AS varchar)", 2)}) AS INTEGER) AS w,
         CAST(32 + 8 * (16 * {_hexdig_sql("cast(doc_id AS varchar)", 3)}
                        + {_hexdig_sql("cast(doc_id AS varchar)", 4)}) AS INTEGER) AS h,
         CASE WHEN {_hexdig_sql("cast(doc_id AS varchar)", 5)} < 8
              THEN 'qdct' ELSE 'png' END AS fmt,
         CAST(len(list_filter(
           string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
           x -> len(x) > 0)) AS BIGINT) AS n_tokens,
         CAST(concat('0x', substring(md5(text), 1, 15)) AS BIGINT) AS phash
  FROM documents
"""


def _pin(col, k: int):
    """floor(x*10^k + 0.5)/10^k — rounding via identical IEEE double ops
    in Spark and DuckDB. Plain round(x, k) diverges between engines when
    the value sits exactly on a .5 boundary (Spark rounds via the
    double's exact BigDecimal expansion, DuckDB via double arithmetic) —
    which HAPPENS for decimal-ish inputs like decimal sums divided by
    counts (observed at sf0.1: nation_profit, lm_perplexity,
    dsir_weights, trustrank flipped the last digit)."""
    sc = float(10 ** k)
    return F.floor(col * F.lit(sc) + F.lit(0.5)) / F.lit(sc)


def _twin_sig_sql(t: int) -> str:
    """DuckDB mirror of operators/pairs.phash_with_twins' twin-t
    signature: phash with 3 md5-chosen bits (< 60) flipped."""
    key = f"(cast(image_id AS varchar) || '#{t}')"
    sig = "phash"
    for j in (1, 2, 3):
        pos = (
            f"((16 * {_hexdig_sql(key, 2 * j - 1)}"
            f" + {_hexdig_sql(key, 2 * j)}) % 60)"
        )
        sig = f"xor({sig}, (CAST(1 AS BIGINT) << {pos}))"
    return sig


def _link_rank_sql(
    n_iter: int = 3, where: str = "", prefix: str = "", body_only: bool = False
) -> str:
    """DuckDB mirror of q_host_link_rank: the same edge derivation and
    n_iter unrolled PageRank iterations. `(CAST(1 AS DOUBLE) - CAST(0.85
    AS DOUBLE))` reproduces Python's `1.0 - 0.85` double bit-for-bit
    (decimal literal arithmetic would give exact 0.15 instead).

    ``where`` filters the document edge derivation (wave splits);
    ``prefix`` namespaces every CTE so two chains can share one query;
    ``body_only`` emits just the CTE list ending in ``{prefix}out`` for
    composition (rank_drift joins two such chains)."""
    d6 = _hexdig_sql("cast(doc_id AS varchar)", 6)
    d7 = _hexdig_sql("cast(doc_id AS varchar)", 7)
    teleport = "(CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))"
    P = prefix
    sql = f"""
        {P}edges AS (
          SELECT src, dst, count(*) AS weight FROM (
            SELECT doc_id % 20 AS src, (16 * {d6} + {d7}) % 20 AS dst
            FROM documents {where}
          ) WHERE src != dst GROUP BY src, dst
        ),
        {P}nodes AS (SELECT src AS node FROM {P}edges UNION SELECT dst FROM {P}edges),
        {P}nn AS (SELECT CAST(count(*) AS DOUBLE) AS n_nodes FROM {P}nodes),
        {P}outw AS (
          SELECT src, CAST(sum(weight) AS DOUBLE) AS outw
          FROM {P}edges GROUP BY src
        ),
        {P}shares AS (
          SELECT e.src, e.dst, CAST(e.weight AS DOUBLE) / o.outw AS share
          FROM {P}edges e JOIN {P}outw o ON e.src = o.src
        ),
        {P}r0 AS (
          SELECT node, round(1.0 / n_nodes, 9) AS rank
          FROM {P}nodes CROSS JOIN {P}nn
        )"""
    for k in range(1, n_iter + 1):
        sql += f""",
        {P}c{k} AS (
          SELECT s.dst, sum(r.rank * s.share) AS inflow
          FROM {P}shares s JOIN {P}r{k - 1} r ON s.src = r.node GROUP BY s.dst
        ),
        {P}r{k} AS (
          SELECT n.node,
                 round({teleport} / nn.n_nodes
                       + CAST(0.85 AS DOUBLE) * coalesce(c.inflow, 0), 9) AS rank
          FROM {P}nodes n LEFT JOIN {P}c{k} c ON n.node = c.dst CROSS JOIN {P}nn nn
        )"""
    if body_only:
        sql += f""",
        {P}out AS (
          SELECT node AS host_id, round(rank, 6) AS rank FROM {P}r{n_iter}
        )"""
        return sql
    sql = "WITH " + sql.lstrip() + f"""
        SELECT node AS host_id, round(rank, 6) AS rank FROM {P}r{n_iter}"""
    return sql


def _trust_rank_sql(n_iter: int = 3, prefix: str = "t_", seed_mod: int = 4) -> str:
    """DuckDB mirror of operators/rank.trust_rank over the host graph:
    same edge derivation as _link_rank_sql, teleport mass restricted to
    the ``node % seed_mod == 0`` seed set, n_iter unrolled iterations.
    Emits the CTE body only, ending in ``{prefix}t{n_iter}`` (node,
    trust) — compose like _link_rank_sql(body_only=True). Pinned
    floor-rounding per iteration (the operator's .5-boundary-safe
    scheme), damping mirrored as CAST(0.85 AS DOUBLE) arithmetic so the
    doubles match Python's 1.0 - 0.85 bit-for-bit."""
    d6 = _hexdig_sql("cast(doc_id AS varchar)", 6)
    d7 = _hexdig_sql("cast(doc_id AS varchar)", 7)
    teleport = "(CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))"

    def pin9(expr: str) -> str:
        return f"floor(({expr}) * 1000000000.0 + 0.5) / 1000000000.0"

    P = prefix
    sql = f"""
        {P}edges AS (
          SELECT src, dst, count(*) AS weight FROM (
            SELECT doc_id % 20 AS src, (16 * {d6} + {d7}) % 20 AS dst
            FROM documents
          ) WHERE src != dst GROUP BY src, dst
        ),
        {P}nodes AS (SELECT src AS node FROM {P}edges UNION SELECT dst FROM {P}edges),
        {P}outw AS (
          SELECT src, CAST(sum(weight) AS DOUBLE) AS outw
          FROM {P}edges GROUP BY src
        ),
        {P}shares AS (
          SELECT e.src, e.dst, CAST(e.weight AS DOUBLE) / o.outw AS share
          FROM {P}edges e JOIN {P}outw o ON e.src = o.src
        ),
        {P}seeds AS (SELECT node FROM {P}nodes WHERE node % {seed_mod} = 0),
        {P}ns AS (SELECT CAST(count(*) AS DOUBLE) AS n_seeds FROM {P}seeds),
        {P}base AS (
          SELECT n.node,
                 CASE WHEN s.node IS NOT NULL
                      THEN 1.0 / ns.n_seeds ELSE CAST(0 AS DOUBLE) END AS d0
          FROM {P}nodes n LEFT JOIN {P}seeds s ON n.node = s.node
          CROSS JOIN {P}ns ns
        ),
        {P}t0 AS (SELECT node, {pin9('d0')} AS trust FROM {P}base)"""
    step = pin9(
        teleport + " * b.d0 + CAST(0.85 AS DOUBLE) * coalesce(c.inflow, 0)"
    )
    for k in range(1, n_iter + 1):
        sql += f""",
        {P}c{k} AS (
          SELECT s.dst, sum(t.trust * s.share) AS inflow
          FROM {P}shares s JOIN {P}t{k - 1} t ON s.src = t.node GROUP BY s.dst
        ),
        {P}t{k} AS (
          SELECT b.node, {step} AS trust
          FROM {P}base b LEFT JOIN {P}c{k} c ON b.node = c.dst
        )"""
    return sql


def _lpa_sql(n_iter: int = 3) -> str:
    """DuckDB mirror of operators/graph.label_propagation over the host
    graph: same edge derivation as _link_rank_sql, symmetrized, n_iter
    unrolled rounds of (node, label) weight-agg + per-node top-1 window
    with (weight DESC, label ASC) tie-break. Integer sums only — no
    float pinning needed."""
    d6 = _hexdig_sql("cast(doc_id AS varchar)", 6)
    d7 = _hexdig_sql("cast(doc_id AS varchar)", 7)
    sql = f"""
        WITH e0 AS (
          SELECT src, dst, count(*) AS weight FROM (
            SELECT doc_id % 20 AS src, (16 * {d6} + {d7}) % 20 AS dst
            FROM documents
          ) WHERE src != dst GROUP BY src, dst
        ),
        und AS (
          SELECT src, dst, sum(weight) AS weight FROM (
            SELECT src, dst, weight FROM e0
            UNION ALL
            SELECT dst AS src, src AS dst, weight FROM e0
          ) GROUP BY src, dst
        ),
        l0 AS (SELECT DISTINCT src AS node, src AS label FROM und)"""
    for k in range(1, n_iter + 1):
        sql += f""",
        v{k} AS (
          SELECT u.src, l.label AS nlabel, sum(u.weight) AS w
          FROM und u JOIN l{k - 1} l ON u.dst = l.node
          GROUP BY u.src, l.label
        ),
        l{k} AS (
          SELECT src AS node, nlabel AS label FROM (
            SELECT src, nlabel, row_number() OVER (
              PARTITION BY src ORDER BY w DESC, nlabel ASC
            ) AS rn FROM v{k}
          ) WHERE rn = 1
        )"""
    sql += f"""
        SELECT node AS host_id, label AS community FROM l{n_iter}"""
    return sql


def _hyperball_sql(n_iter: int = 3, final: str = "balls") -> str:
    """DuckDB mirror of operators/graph.hyperball_balls over the sparse
    host graph (every 3rd doc emits one edge, 32 hosts): unrolled
    register CTE chain b0..bT — per round a UNION ALL of the prior
    registers with the edge-joined neighbor registers, then a
    (node, idx) max-agg — plus the integer-scaled raw-HLL estimate per
    round (the hll_distinct oracle's exact recipe). final='harmonic'
    appends the lcm-integer harmonic-centrality reduction mirroring
    operators/graph.harmonic_from_balls."""
    d6 = _hexdig_sql("cast(doc_id AS varchar)", 6)
    d7 = _hexdig_sql("cast(doc_id AS varchar)", 7)
    sql = f"""
        WITH e AS (
          SELECT DISTINCT src, dst FROM (
            SELECT CAST(doc_id % 32 AS BIGINT) AS src,
                   CAST((16 * {d6} + {d7}) % 32 AS BIGINT) AS dst
            FROM documents WHERE doc_id % 3 = 0
          ) WHERE src != dst
        ),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e),
        b0 AS (
          SELECT node, CAST(h % 256 AS INT) AS idx,
                 CASE WHEN (h >> 8) = 0 THEN 53
                      ELSE length(bin((h >> 8) & -(h >> 8))) END AS rho_max
          FROM (
            SELECT node,
                   CAST(concat('0x', substring(md5(CAST(node AS VARCHAR)), 1, 15)) AS BIGINT) AS h
            FROM nodes
          )
        )"""
    for t in range(1, n_iter + 1):
        sql += f""",
        b{t} AS (
          SELECT node, idx, max(rho_max) AS rho_max FROM (
            SELECT node, idx, rho_max FROM b{t - 1}
            UNION ALL
            SELECT e.src AS node, b.idx, b.rho_max
            FROM e JOIN b{t - 1} b ON b.node = e.dst
          ) GROUP BY node, idx
        )"""
    # mirrors operators/graph.hyperball_balls est(): raw Flajolet
    # estimator with the linear-counting small-range branch
    for t in range(0, n_iter + 1):
        sql += f""",
        est{t} AS (
          SELECT host_id, {t} AS t,
                 round(CASE WHEN raw <= 640.0 AND occupied < 256
                            THEN 256.0 * ln(256.0 / (256 - occupied))
                            ELSE raw END, 3) AS ball_est
          FROM (
            SELECT node AS host_id,
                   47072.71267120224 * pow(CAST(2 AS DOUBLE), 53)
                     / (sum(CAST(1 AS BIGINT) << (53 - rho_max))
                        + (256 - count(*)) * (CAST(1 AS BIGINT) << 53)) AS raw,
                   count(*) AS occupied
            FROM b{t} GROUP BY node
          )
        )"""
    balls = "\n            UNION ALL\n            ".join(
        f"SELECT * FROM est{t}" for t in range(n_iter + 1)
    )
    if final == "balls":
        return sql + "\n            " + balls
    if final == "effdiam":
        return sql + f""",
        balls AS (
            {balls}
        ),
        nf AS (
          SELECT t, sum(CAST(round(ball_est * 1000) AS BIGINT)) AS nf_sc
          FROM balls GROUP BY t
        ),
        tot AS (SELECT nf_sc AS nf_total FROM nf WHERE t = {n_iter}),
        hit AS (
          SELECT min(t) AS t_hi FROM nf, tot
          WHERE 1000 * nf_sc >= 900 * nf_total
        ),
        lo AS (SELECT nf_sc AS nf_lo FROM nf, hit WHERE nf.t = hit.t_hi - 1),
        at AS (
          SELECT nf_sc AS nf_hi, t_hi, nf_total
          FROM nf, hit, tot WHERE nf.t = hit.t_hi
        )
        SELECT CAST(greatest(t_hi - 1, 0) AS BIGINT) AS t_lo,
               CAST(t_hi AS BIGINT) AS t_hi,
               round(CASE WHEN t_hi = 0 THEN 0.0
                     ELSE (t_hi - 1)
                          + (nf_total * (900 / 1000.0) - nf_lo)
                            / (nf_hi - nf_lo) END, 6) AS eff_diameter
        FROM at LEFT JOIN lo ON true"""
    import math as _math

    lcm = _math.lcm(*range(1, n_iter + 1))
    return sql + f""",
        balls AS (
            {balls}
        ),
        sc AS (
          SELECT host_id, t, CAST(round(ball_est * 1000) AS BIGINT) AS sc
          FROM balls
        ),
        st AS (
          SELECT host_id, t, sc,
                 lag(sc) OVER (PARTITION BY host_id ORDER BY t) AS prev
          FROM sc
        )
        SELECT host_id,
               round(sum((sc - prev) * ({lcm} // t)) / {1000.0 * lcm}, 6)
                 AS harmonic
        FROM st WHERE t >= 1 GROUP BY host_id"""


def _kcenter_sql(k: int = 6) -> str:
    """DuckDB mirror of operators/similarity.kcenter_sample over the
    embeddings table (seed vec_id = 0): k-1 unrolled greedy rounds,
    each one a least(mind, d²-to-newest-center) update + a
    (mind DESC, vec_id ASC) top-1 pick; d² via the dot-product
    identity, round-9, exactly as the operator."""

    def d2(a: str, b: str) -> str:
        return (
            f"round(list_dot_product({a}, {a})"
            f" - 2 * list_dot_product({a}, {b})"
            f" + list_dot_product({b}, {b}), 9)"
        )

    sql = """
        WITH e AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        p0 AS (SELECT vec_id, v FROM e WHERE vec_id = 0),
        m1 AS (
          SELECT e.vec_id, e.v, {d} AS mind FROM e, p0 c
        )""".format(d=d2("e.v", "c.v"))
    for t in range(1, k):
        sql += f""",
        p{t} AS (
          SELECT vec_id, v, mind FROM m{t}
          ORDER BY mind DESC, vec_id ASC LIMIT 1
        )"""
        if t < k - 1:
            sql += f""",
        m{t + 1} AS (
          SELECT m.vec_id, m.v,
                 least(m.mind, {d2('m.v', 'c.v')}) AS mind
          FROM m{t} m, p{t} c
        )"""
    parts = [
        "SELECT vec_id, 0 AS pick_order, CAST(0 AS DOUBLE) AS radius FROM p0"
    ] + [
        f"SELECT vec_id, {t} AS pick_order, mind AS radius FROM p{t}"
        for t in range(1, k)
    ]
    return sql + "\n" + "\nUNION ALL\n".join(parts)


def _opic_sql(n_iter: int = 3) -> str:
    """DuckDB mirror of q_opic_priority: same edge derivation, n_iter
    unrolled OPIC waves (virtual-page pot -> weighted inflow -> state
    update), round-9 per wave like the Spark operator."""
    d6 = _hexdig_sql("cast(doc_id AS varchar)", 6)
    d7 = _hexdig_sql("cast(doc_id AS varchar)", 7)
    sql = f"""
        WITH edges AS (
          SELECT src, dst, count(*) AS weight FROM (
            SELECT doc_id % 20 AS src, (16 * {d6} + {d7}) % 20 AS dst
            FROM documents
          ) WHERE src != dst GROUP BY src, dst
        ),
        nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS n_nodes FROM nodes),
        outw AS (
          SELECT src, CAST(sum(weight) AS DOUBLE) AS outw
          FROM edges GROUP BY src
        ),
        shares AS (
          SELECT e.src, e.dst, CAST(e.weight AS DOUBLE) / o.outw AS share
          FROM edges e JOIN outw o ON e.src = o.src
        ),
        s0 AS (
          SELECT n.node, round(1.0 / nn.n_nodes, 9) AS cash,
                 CAST(0 AS DOUBLE) AS history,
                 (o.src IS NULL) AS dangling
          FROM nodes n LEFT JOIN outw o ON n.node = o.src CROSS JOIN nn
        )"""
    for k in range(1, n_iter + 1):
        sql += f""",
        p{k} AS (
          SELECT coalesce(sum(cash), 0) AS pot FROM s{k - 1} WHERE dangling
        ),
        c{k} AS (
          SELECT s.dst, sum(st.cash * s.share) AS inflow
          FROM shares s JOIN s{k - 1} st ON s.src = st.node GROUP BY s.dst
        ),
        s{k} AS (
          SELECT st.node,
                 round(coalesce(c.inflow, 0) + p.pot / nn.n_nodes, 9) AS cash,
                 round(st.history + st.cash, 9) AS history,
                 st.dangling
          FROM s{k - 1} st LEFT JOIN c{k} c ON st.node = c.dst
          CROSS JOIN p{k} p CROSS JOIN nn
        )"""
    sql += f"""
        SELECT node AS host_id,
               round(round((history + cash) / CAST({n_iter + 1} AS DOUBLE), 9), 6)
                 AS importance
        FROM s{n_iter}"""
    return sql


def q_frontier_schedule(spark, sf_dir):
    """W3/T1: politeness budget as a per-host window rank (budget=4)."""
    f = _frontier(spark, sf_dir)
    w = Window.partitionBy("host").orderBy("priority", "depth", "discovery_seq")
    return (
        f.withColumn("sched_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sched_rank") <= 4)
        .select("host", "doc_id", "priority", "depth", "sched_rank")
    )


def q_host_link_rank(spark, sf_dir):
    """Frontier priority prior: fixed-iteration weighted PageRank over
    the host link graph (operators/rank.py). Edges are derived
    portably from documents — src = doc_id % 20 (the same host id
    _frontier uses), dst = two md5 digits mod 20, weight = outlink
    count per (src, dst). 3 iterations, damping 0.85, per-iteration
    round-9 stabilization; dangling mass dropped (classic contribs
    formulation), mirrored exactly by the unrolled-CTE oracle."""
    from crawler_spark.operators.rank import link_rank

    d6 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 6, 1)) - 1)"
    d7 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 7, 1)) - 1)"
    docs = _t(spark, sf_dir, "documents")
    edges = (
        docs.select(
            (F.col("doc_id") % 20).alias("src"),
            F.expr(f"(16 * {d6} + {d7}) % 20").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("weight"))
    )
    return link_rank(edges, n_iter=3, damping=0.85).select(
        F.col("node").alias("host_id"), F.round("rank", 6).alias("rank")
    )


def q_opic_priority(spark, sf_dir):
    """Frontier priority the north rule names directly: adaptive OPIC
    (on-line page importance, Abiteboul et al. WWW'03) over the host
    link graph (operators/rank.py opic_importance) — cash diffusion
    with a virtual page for dangling mass, importance = accumulated
    history share after 3 synchronous waves. Same portable edge
    derivation as host_link_rank; the unrolled-CTE oracle mirrors each
    wave (pot -> inflow -> state) exactly."""
    from crawler_spark.operators.rank import opic_importance

    d6 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 6, 1)) - 1)"
    d7 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 7, 1)) - 1)"
    docs = _t(spark, sf_dir, "documents")
    edges = (
        docs.select(
            (F.col("doc_id") % 20).alias("src"),
            F.expr(f"(16 * {d6} + {d7}) % 20").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("weight"))
    )
    return opic_importance(edges, n_iter=3).select(
        F.col("node").alias("host_id"),
        F.round("importance", 6).alias("importance"),
    )


def q_hrw_fetcher_assign(spark, sf_dir):
    """Rendezvous (highest-random-weight) host->fetcher assignment
    (operators/assign.py): each of 500 synthetic hosts is owned by the
    fetcher with the max md5('hrw:host:fetcher') score among 32 fetchers
    — deterministic, coordination-free, and minimally disruptive on
    resize (UbiCrawler's host-assignment scheme). Pure codegen
    expressions: transform(sequence) + array_max, no shuffle."""
    from crawler_spark.operators.assign import hrw_assign

    hosts = (
        _t(spark, sf_dir, "documents")
        .select((F.col("doc_id") % 500).alias("host_id"))
        .distinct()
    )
    return hrw_assign(hosts, "host_id", n_workers=32, out_col="fetcher_id")


def q_ring_vs_hrw_balance(spark, sf_dir):
    """Consistent-hash ring vs rendezvous load balance, quantified:
    the same 500 hosts assigned to 16 workers by (a) a Karger ring
    with 8 vnodes/worker (`operators/assign.ring_assign`) and (b) HRW;
    per-worker host counts side by side. Ring arcs are exponential
    order statistics, so its spread is visibly wider at small vnode
    counts — the number that decides vnode sizing for a fetcher fleet.
    Ring + scores are md5 hex (plan-time literal ring), so the SQL
    oracle reproduces both argmins bit-for-bit."""
    from crawler_spark.operators.assign import hrw_assign, ring_assign

    workers = [f"w{i:02d}" for i in range(16)]
    hosts = (
        _t(spark, sf_dir, "documents")
        .select((F.col("doc_id") % 500).alias("host_id"))
        .distinct()
    )
    ring = (
        ring_assign(hosts, "host_id", workers, vnodes=8)
        .groupBy("worker")
        .agg(F.count("*").cast("long").alias("n_ring"))
    )
    hrw = (
        hrw_assign(hosts, "host_id", n_workers=16, out_col="wid")
        .withColumn(
            "worker",
            F.concat(F.lit("w"), F.lpad(F.col("wid").cast("string"), 2, "0")),
        )
        .groupBy("worker")
        .agg(F.count("*").cast("long").alias("n_hrw"))
    )
    return (
        ring.join(hrw, "worker", "full")
        .select(
            "worker",
            F.coalesce("n_ring", F.lit(0)).alias("n_ring"),
            F.coalesce("n_hrw", F.lit(0)).alias("n_hrw"),
        )
    )


def q_hrw_rebalance(spark, sf_dir):
    """The minimal-disruption property as a checked query: reassigning
    the same 500 hosts from 32 to 31 fetchers (drop fetcher 31) moves
    EXACTLY the hosts fetcher 31 owned — every surviving fetcher's
    argmax is unchanged. Returns per-before-fetcher host and moved
    counts; n_moved must be 0 everywhere except fetcher 31."""
    from crawler_spark.operators.assign import hrw_assign

    hosts = (
        _t(spark, sf_dir, "documents")
        .select((F.col("doc_id") % 500).alias("host_id"))
        .distinct()
    )
    both = hrw_assign(
        hrw_assign(hosts, "host_id", 32, out_col="before_f"),
        "host_id",
        31,
        out_col="after_f",
    )
    return both.groupBy("before_f").agg(
        F.count("*").alias("n_hosts"),
        F.sum((F.col("before_f") != F.col("after_f")).cast("long")).alias(
            "n_moved"
        ),
    ).select(F.col("before_f").alias("fetcher_id"), "n_hosts", "n_moved")


def q_dataset_split(spark, sf_dir):
    """Canonical train/val/test split by content-stable hash bucket
    (md5 of doc_id -> 100 buckets -> 80/10/10): disjoint and exhaustive
    by construction, reproducible across reruns and cluster sizes —
    never df.randomSplit, whose assignment depends on partitioning."""
    b = (
        f"((16 * {_hexdig_sql('cast(doc_id as string)', 1)}"
        f" + {_hexdig_sql('cast(doc_id as string)', 2)}) % 100)"
    )
    d = _t(spark, sf_dir, "documents")
    return (
        d.withColumn(
            "split",
            F.expr(
                f"CASE WHEN {b} < 80 THEN 'train' "
                f"WHEN {b} < 90 THEN 'val' ELSE 'test' END"
            ),
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("n_chars_total"),
        )
    )


def q_host_reciprocity(spark, sf_dir):
    """Link reciprocity of the host graph (same edges as
    host_link_rank): the share of directed edges whose reverse edge also
    exists — spam rings reciprocate near 1.0, organic links don't. One
    left-semi self-join on the swapped key pair."""
    d6 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 6, 1)) - 1)"
    d7 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 7, 1)) - 1)"
    docs = _t(spark, sf_dir, "documents")
    edges = (
        docs.select(
            (F.col("doc_id") % 20).alias("src"),
            F.expr(f"(16 * {d6} + {d7}) % 20").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = edges.join(rev, ["src", "dst"], "left_semi")
    n_all = edges.agg(F.count("*").alias("n_edges"))
    n_rec = recip.agg(F.count("*").alias("n_reciprocal"))
    return (
        n_all.crossJoin(n_rec)
        .select(
            "n_edges",
            "n_reciprocal",
            F.round(F.col("n_reciprocal") / F.col("n_edges"), 6).alias("reciprocity"),
        )
    )


def q_host_triangles(spark, sf_dir):
    """Web-graph triangle count over the host link graph (same edges as
    host_link_rank, undirected + deduped): the clustering-coefficient
    numerator used to separate organic link neighborhoods from spam
    farms. Plan shape: degree-ordered edge orientation (a < b) then a
    3-way self-join — each join keyed on a node column, so at web scale
    it hash-partitions; the orientation bounds the join fan-out by max
    out-degree (the standard node-iterator++ trick)."""
    d6 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 6, 1)) - 1)"
    d7 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 7, 1)) - 1)"
    docs = _t(spark, sf_dir, "documents")
    raw = docs.select(
        (F.col("doc_id") % 20).alias("u"),
        F.expr(f"(16 * {d6} + {d7}) % 20").alias("v"),
    ).filter(F.col("u") != F.col("v"))
    edges = (
        raw.select(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
        ).distinct()
    )
    e1 = edges.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = edges.select(F.col("a").alias("y2"), F.col("b").alias("z"))
    e3 = edges.select(F.col("a").alias("x3"), F.col("b").alias("z3"))
    tri = (
        e1.join(e2, F.col("y") == F.col("y2"))
        .join(e3, (F.col("x") == F.col("x3")) & (F.col("z") == F.col("z3")))
        .select("x", "y", "z")
    )
    return tri.agg(
        F.count("*").alias("n_triangles"),
        F.count_distinct("x").alias("n_apex_hosts"),
    )


def q_host_clustering_coeff(spark, sf_dir):
    """Per-host local clustering coefficient (Watts & Strogatz '98):
    lcc(v) = 2*t(v) / (d(v)(d(v)-1)) over the same oriented-edge
    triangle enumeration as host_triangles — the organic-neighborhood
    vs link-farm separator at node granularity (farms have high degree
    and near-zero closure). Triangle corners explode from the ONE
    3-way self-join (never re-enumerated per node); degrees are a
    map-side agg over the symmetrized edge list; exact integer ratios
    pinned at 1e-6. Global mean LCC rides along per row."""
    d6 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 6, 1)) - 1)"
    d7 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 7, 1)) - 1)"
    docs = _t(spark, sf_dir, "documents")
    raw = docs.select(
        (F.col("doc_id") % 20).alias("u"),
        F.expr(f"(16 * {d6} + {d7}) % 20").alias("v"),
    ).filter(F.col("u") != F.col("v"))
    edges = raw.select(
        F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
    ).distinct()
    deg = (
        edges.select(F.col("a").alias("n"))
        .unionByName(edges.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").cast("long").alias("d"))
    )
    e1 = edges.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = edges.select(F.col("a").alias("y2"), F.col("b").alias("z"))
    e3 = edges.select(F.col("a").alias("x3"), F.col("b").alias("z3"))
    tri = (
        e1.join(e2, F.col("y") == F.col("y2"))
        .join(e3, (F.col("x") == F.col("x3")) & (F.col("z") == F.col("z3")))
        .select("x", "y", "z")
    )
    tcnt = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("n"))
        .groupBy("n")
        .agg(F.count("*").cast("long").alias("t"))
    )
    p6 = lambda c: F.expr(
        f"cast(floor(({c}) * 1e6 + 0.5) as double) / 1e6"
    )  # noqa: E731
    lcc_expr = (
        "case when d >= 2 then cast(2 * t as double) / (d * (d - 1)) "
        "else cast(0.0 as double) end"
    )
    per = (
        deg.join(tcnt, "n", "left")
        .select(
            "n",
            "d",
            F.coalesce("t", F.lit(0)).cast("long").alias("t"),
        )
        .withColumn("lcc", F.expr(lcc_expr))
    )
    mean = per.agg(
        p6(
            "cast(sum(cast(floor(lcc * 1e9 + 0.5) as decimal(28,9))) "
            "as double) / 1e9 / count(*)"
        ).alias("mean_lcc6")
    )
    return per.crossJoin(F.broadcast(mean)).select(
        F.col("n").alias("host_id"),
        F.col("d").alias("degree"),
        F.col("t").alias("n_triangles"),
        p6("lcc").alias("lcc6"),
        "mean_lcc6",
    )


def q_recrawl_schedule(spark, sf_dir):
    """Freshness-driven recrawl planning: every URL gets a refetch
    interval from its change-rate band (news 6h / active 24h / static
    168h), doubled per consecutive failure (capped exponential backoff,
    the reference's retry ceiling generalized to scheduling); the query
    reports, per host, how much of the frontier is due at the planning
    horizon and when the next URL comes due. Pure native timestamp
    arithmetic — the scheduler pass a 10^10-URL frontier runs each
    round to size its fetch budget."""
    d8 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 8, 1)) - 1)"
    d9 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 9, 1)) - 1)"
    f = _frontier(spark, sf_dir)
    planned = f.select(
        "host",
        "doc_id",
        F.expr(
            "timestamp'2026-01-01 00:00:00' "
            "+ make_interval(0, 0, 0, 0, cast(doc_id % 72 as int), 0, 0)"
        ).alias("last_fetch"),
        F.expr(f"cast({d8} % 3 as int)").alias("failures"),
        F.expr(
            f"element_at(array(6, 24, 168), cast({d9} % 3 as int) + 1)"
        ).alias("interval_h"),
    ).withColumn(
        "next_fetch",
        F.expr(
            "last_fetch + make_interval(0, 0, 0, 0, "
            "cast(interval_h * shiftleft(1, failures) as int), 0, 0)"
        ),
    )
    horizon = "timestamp'2026-01-04 00:00:00'"
    return planned.groupBy("host").agg(
        F.count("*").alias("n_urls"),
        F.sum(F.expr(f"cast(next_fetch <= {horizon} as int)")).cast("long").alias("n_due"),
        F.min("next_fetch").alias("next_due_ts"),
    )


def q_depth_histogram(spark, sf_dir):
    """Frontier depth profile: URL counts per crawl depth plus the
    cumulative share of the frontier at or above each depth — what a
    crawl operator reads to set the depth cutoff. The running-sum
    window is over the DEPTH HISTOGRAM (a handful of rows), never the
    frontier itself."""
    f = _frontier(spark, sf_dir)
    hist = f.groupBy("depth").agg(F.count("*").alias("n_urls"))
    total = hist.agg(F.sum("n_urls").cast("double").alias("total"))
    w = Window.orderBy("depth").rowsBetween(Window.unboundedPreceding, 0)
    return (
        hist.crossJoin(F.broadcast(total))
        .withColumn("cum_urls", F.sum("n_urls").over(w))
        .select(
            "depth",
            "n_urls",
            F.round(F.col("cum_urls") / F.col("total"), 6).alias("cum_share"),
        )
    )


def q_url_template_stats(spark, sf_dir):
    """Crawl-structure mining: collapse numeric path segments to '{n}'
    and count URLs/hosts per template — the pass a crawl planner runs to
    find crawler traps and prioritize page types. Pure native regexp
    over deterministically messy paths (three md5-chosen shapes)."""
    d6 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 6, 1)) - 1)"
    d7 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 7, 1)) - 1)"
    docs = _t(spark, sf_dir, "documents")
    urls = docs.select(
        F.concat(F.lit("host-"), (F.col("doc_id") % 20).cast("string")).alias("host"),
        F.expr(
            f"""CASE {d6} % 3
                WHEN 0 THEN concat('/cat-', cast({d7} % 4 as string),
                            '/item/', cast(doc_id as string))
                WHEN 1 THEN concat('/page/', cast(doc_id as string),
                            '/rev/', cast({d7} % 9 as string))
                ELSE concat('/static/img', cast(doc_id as string), '.png')
            END"""
        ).alias("path"),
    )
    return (
        urls.withColumn(
            "template", F.regexp_replace("path", "[0-9]+", "{n}")
        )
        .groupBy("template")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("host").alias("n_hosts"),
        )
    )


def q_host_degree_histogram(spark, sf_dir):
    """Web-graph degree distribution over the host link graph (same edge
    derivation as host_link_rank): hosts per log2 degree bucket, in and
    out directions in one pass. The bucket is length(bin(deg))-1 —
    integer/string arithmetic, immune to float log rounding at exact
    powers of two."""
    d6 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 6, 1)) - 1)"
    d7 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 7, 1)) - 1)"
    docs = _t(spark, sf_dir, "documents")
    edges = docs.select(
        (F.col("doc_id") % 20).alias("src"),
        F.expr(f"(16 * {d6} + {d7}) % 20").alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    out_deg = edges.groupBy(F.col("src").alias("host_id")).agg(
        F.count("*").alias("degree")
    ).withColumn("direction", F.lit("out"))
    in_deg = edges.groupBy(F.col("dst").alias("host_id")).agg(
        F.count("*").alias("degree")
    ).withColumn("direction", F.lit("in"))
    return (
        out_deg.unionByName(in_deg)
        .withColumn("bucket", F.expr("length(bin(degree)) - 1").cast("int"))
        .groupBy("direction", "bucket")
        .agg(F.count("*").alias("n_hosts"))
    )


def q_urlseen_antijoin(spark, sf_dir):
    """J1: URL-seen anti-join; seen = every third doc URL (md5-keyed)."""
    f = _frontier(spark, sf_dir)
    cand = f.withColumn("url_md5", F.md5("url"))
    seen = cand.filter(F.col("doc_id") % 3 == 0).select("url_md5")
    return cand.join(seen, "url_md5", "left_anti").select("doc_id", "url", "url_md5")


def q_urlseen_cuckoo(spark, sf_dir):
    """J1b: the same URL-seen anti-join semantics, prefiltered by the
    DELETE-capable cuckoo sidecar (operators/cuckoo.py) built with the
    distributed mapInPandas -> per-bucket merge protocol. The filter is
    advisory by contract — negatives skip the exact join, positives are
    confirmed by it — so the result is EXACTLY the SQL NOT EXISTS, which
    is what the oracle asserts. The collect() pulls only the 4 serialized
    filter slices (the persisted-sidecar read path of plans/rounds.py),
    never data rows."""
    from crawler_spark.operators.cuckoo import (
        BucketedCuckoo,
        cuckoo_delta_rows,
        merge_cuckoo_rows,
    )
    from crawler_spark.operators.seen import anti_join_seen

    f = _frontier(spark, sf_dir)
    cand = f.select(
        "doc_id",
        F.col("url").alias("url_canon"),
        F.xxhash64("url").alias("url_hash"),
    )
    seen = cand.filter(F.col("doc_id") % 3 == 0).select("url_hash", "url_canon")
    cfg = {"n_buckets": 4, "n_slots": 1 << 12, "slot_width": 4}
    rows = merge_cuckoo_rows(
        cuckoo_delta_rows(seen, **cfg), cfg["n_slots"], cfg["slot_width"]
    ).collect()
    filt = BucketedCuckoo.from_rows(rows, **cfg)
    return anti_join_seen(cand, seen, filt).select("doc_id", "url_canon")


def q_drain_forecast(spark, sf_dir):
    """Crawl planning: with a per-host politeness budget of B URLs per
    round, host h needs ceil(pending_h / B) rounds to drain — the
    frontier's critical path is the max. Pure integer arithmetic
    (div / //, never float ceil) so every engine agrees exactly."""
    f = _frontier(spark, sf_dir)
    per = f.groupBy("host").agg(F.count(F.lit(1)).alias("n_pending"))
    return per.select(
        "host",
        "n_pending",
        F.expr("div(n_pending + 3, 4)").alias("rounds_to_drain"),
    )


def q_fetcher_load_forecast(spark, sf_dir):
    """Fleet planning: compose the HRW host->fetcher assignment with the
    politeness drain forecast — per fetcher: hosts owned, URLs queued,
    and the fetcher's critical path (max rounds-to-drain among its
    hosts, budget 4/round), plus each fetcher's share of the fleet's
    URL load (integer-exact ratio). The table that says whether the
    fetcher fleet is balanced BEFORE the crawl starts. Host dimension
    is tiny; everything downstream of the one groupBy is
    dimension-sized."""
    from crawler_spark.operators.assign import hrw_assign

    f = _frontier(spark, sf_dir)
    per_host = f.groupBy("host").agg(F.count(F.lit(1)).alias("n_pending"))
    assigned = hrw_assign(per_host, "host", n_workers=8, out_col="fetcher_id")
    per_fetcher = assigned.groupBy("fetcher_id").agg(
        F.count("*").alias("n_hosts"),
        F.sum("n_pending").alias("n_urls"),
        F.max(F.expr("div(n_pending + 3, 4)")).alias("critical_rounds"),
    )
    tot = per_fetcher.agg(F.sum("n_urls").alias("tot_urls"))
    return per_fetcher.crossJoin(F.broadcast(tot)).select(
        "fetcher_id",
        "n_hosts",
        "n_urls",
        "critical_rounds",
        _pin(F.col("n_urls") / F.col("tot_urls"), 6).alias("load_share"),
    )


def q_resolve_links(spark, sf_dir):
    """RFC 3986 §5.2.2 reference resolution — the link-extractor step
    that turns a raw ``<a href>`` into an absolute outlink: absolute,
    protocol-relative, root-relative, query-only, fragment-only, empty
    and dot-segment relative refs, all resolved in native expressions
    (functions/canon.py resolve_href_native; proven against stdlib
    urljoin in tests). (base, href) pairs are synthesized
    deterministically per doc to cover every branch. Map-side
    projection — zero shuffles at any scale."""
    from crawler_spark.functions.canon import resolve_href_native

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    base = F.concat(
        F.lit("http://host-"), (d % 20).cast("string"),
        F.lit(".test/sec-"), (d % 7).cast("string"),
        F.lit("/sub/page-"), d.cast("string"), F.lit(".html"),
    )
    href = F.element_at(
        F.array(
            F.concat(F.lit("next-"), d.cast("string"), F.lit(".html")),
            F.lit("./same.html"),
            F.lit("../up.html"),
            F.lit("../../../../deep.html"),
            F.lit("/rooted/x.html"),
            F.lit("//cdn-host.test/asset.png"),
            F.lit("https://ext.test/abs"),
            F.lit("?page=2"),
            F.lit("#frag"),
            F.lit(""),
            F.lit("a/../b/./c.html"),
            F.lit("mailto:admin@host.test"),
        ),
        ((d % 12) + 1).cast("int"),
    )
    pairs = docs.select("doc_id", base.alias("base"), href.alias("href"))
    return pairs.select(
        "doc_id",
        "base",
        "href",
        resolve_href_native(F.col("base"), F.col("href")).alias("resolved"),
    )


def q_robots_sitemaps(spark, sf_dir):
    """Sitemap DISCOVERY via robots.txt — the protocol loop the
    sitemap_ingest source starts from: every host's robots.txt is
    scanned for ``Sitemap:`` directives (case-insensitive, any
    indentation, group-independent per sitemaps.org) with one native
    regexp_extract_all (functions/robots.py sitemap_urls) and exploded
    into the (host, sitemap_url) seed list. Robots blobs are
    synthesized deterministically per host — mixed-case directives and
    an every-other-host second sitemap exercise the matcher. Scale:
    the robots dimension is O(hosts); this is a map-side projection
    over it, no shuffle at all."""
    from crawler_spark.functions.robots import sitemap_urls

    docs = _t(spark, sf_dir, "documents")
    hosts = docs.select((F.col("doc_id") % 20).alias("host_id")).distinct()
    hs = F.col("host_id").cast("string")
    txt = F.concat(
        F.lit("User-agent: *\nDisallow: /private\nSitemap: http://host-"),
        hs,
        F.lit(".test/sitemap-0.xml\nCrawl-delay: 2"),
        F.when(
            F.col("host_id") % 2 == 0,
            F.concat(
                F.lit("\n  sitemap: http://host-"),
                hs,
                F.lit(".test/sitemap-1.xml"),
            ),
        ).otherwise(F.lit("")),
    )
    return hosts.select(
        "host_id", F.explode(sitemap_urls(txt)).alias("sitemap_url")
    )


def q_robots_gate(spark, sf_dir):
    """T5/J5: robots dimension broadcast join + deny filter + budget calc."""
    f = _frontier(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    robots = (
        docs.select("source")
        .distinct()
        .withColumn("denied", F.substring("source", -1, 1).isin("1", "3"))
        .withColumn("crawl_delay_s", (F.length("source") % 3 + 1).cast("double"))
    )
    return (
        f.join(docs, "doc_id")
        .join(F.broadcast(robots), "source")
        .filter(~F.col("denied"))
        .select(
            "doc_id",
            "source",
            "crawl_delay_s",
            F.floor(F.lit(16.0) / F.col("crawl_delay_s")).cast("long").alias("budget"),
        )
    )


def q_surt_index(spark, sf_dir):
    """CDX-index SURT keys (functions/canon.py:surt_key): messy URLs
    (www/case/port/param-order noise) -> sort-friendly reversed-host
    keys; range-partition the sorted index for per-domain locality."""
    from crawler_spark.functions.canon import surt_key

    docs = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("http://"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.lit("Host-"),
        (F.col("doc_id") % 20).cast("string"),
        F.lit(".Test"),
        F.when(F.col("doc_id") % 4 == 1, F.lit(":8080")).otherwise(F.lit("")),
        F.lit("/Doc/"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("?b=2&a=1")).otherwise(F.lit("")),
    )
    return docs.select(
        "doc_id", url.alias("url_raw"), surt_key(url).alias("surt")
    )


def q_canonicalize(spark, sf_dir):
    """C1-C5: portable URL canonicalization (lower, strip fragment,
    strip :80, collapse /./) over deterministically messy URLs."""
    f = _frontier(spark, sf_dir)
    messy = f.withColumn(
        "url_raw",
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.upper("url"), F.lit("#FRAG")))
        .when(
            F.col("doc_id") % 4 == 1,
            F.regexp_replace("url", "\\.test/", ".test:80/"),
        )
        .when(F.col("doc_id") % 4 == 2, F.regexp_replace("url", "/doc/", "/./doc/"))
        .otherwise(F.col("url")),
    )
    c = F.lower(F.trim(F.col("url_raw")))
    c = F.regexp_replace(c, "#.*$", "")
    c = F.regexp_replace(c, ":80/", "/")
    c = F.regexp_replace(c, "/\\./", "/")
    return messy.select(
        "doc_id", "url_raw", c.alias("url_canon"), F.md5(c).alias("canon_md5")
    )


# --------------------------------------------------------------------------
# events: windows / sessions / latest-per-key / top-1
# --------------------------------------------------------------------------

def q_latest_event_per_user(spark, sf_dir):
    """A7/W6/K5: latest row per key with deterministic tie-break."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", F.round("value", 4).alias("value"))
    )


def q_top1_event_per_type(spark, sf_dir):
    """W1: top-1 by score per group, ties to smallest id."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", "event_id", F.round("value", 4).alias("value"))
    )


def q_event_type_stats(spark, sf_dir):
    """A1-A5: grouped counts, averages, derived ratio."""
    e = _t(spark, sf_dir, "events")
    total = e.count()  # scalar A1 folded in as a literal both sides compute
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.round(F.count("*") * 100.0 / F.lit(total), 4).alias("pct_of_all"),
        )
    )


def q_hourly_event_counts(spark, sf_dir):
    """Streaming-windowed agg, batch form (T4 watermark analog)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


def q_fetch_rate_ewma(spark, sf_dir):
    """Fetch-rate trend smoothing: 16-term truncated EWMA (alpha = 1/2)
    over the hourly event-count series — the smoothed throughput signal
    an adaptive scheduler trends against (raw per-hour counts whipsaw
    on politeness-budget beat frequencies). All arithmetic is EXACT:
    weights 2^-(j+1) make every term a dyadic rational, the scaled sum
    sum(x_{t-j} * 2^(15-j)) is integer (bit-identical cross-engine),
    and the final /65536.0 is a lossless double. The window is over the
    HOURS HISTOGRAM (dimension-sized), never the fact table; the 16
    lag() terms share one window frame."""
    e = _t(spark, sf_dir, "events")
    hours = e.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").alias("n")
    )
    w = Window.orderBy("hour")
    scaled = F.col("n") * F.lit(1 << 15)
    for j in range(1, 16):
        scaled = scaled + F.coalesce(F.lag("n", j).over(w), F.lit(0)) * F.lit(
            1 << (15 - j)
        )
    return hours.select(
        "hour",
        "n",
        scaled.cast("long").alias("ewma_scaled"),
        (scaled.cast("long") / F.lit(65536.0)).alias("ewma"),
    )


def q_event_order_audit(spark, sf_dir):
    """Out-of-order arrival audit — the batch measurement that sizes a
    streaming watermark: per user (arrival order = event_id), an event
    is disordered when its event time trails the per-user running max
    by more than the 600 s tolerance; per event type report volume,
    disorder count/rate and the worst skew in seconds. The window is
    partitioned by user (never a global sort); disorder math is integer
    seconds, exact cross-engine."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max("ts").over(w)
    d = e.select(
        "event_type",
        F.greatest(
            F.lit(0),
            (
                F.unix_timestamp(prev_max) - F.unix_timestamp(F.col("ts"))
            ).cast("long"),
        ).alias("disorder_s"),
    )
    return d.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum((F.col("disorder_s") > 600).cast("long")).alias("n_late"),
        F.max("disorder_s").alias("max_disorder_s"),
        F.round(
            F.sum((F.col("disorder_s") > 600).cast("long")) / F.count("*"), 6
        ).alias("late_rate"),
    )


def q_host_wilson_health(spark, sf_dir):
    """Host health as a Wilson-score lower bound (z = 1.96) on the
    fetch success rate — the statistically honest ranking when hosts
    have wildly different sample sizes (a 1/1 host must NOT outrank a
    98/100 host, which a raw ratio does). Success is derived
    deterministically from the doc fingerprint (md5 last hex digit
    != 'f' -> ~15/16 base rate modulated per host). One hash agg to
    (host, s, n), then pure arithmetic + one IEEE-exact sqrt — written
    with the identical operation tree in the oracle so the doubles
    match bit-for-bit before the final round."""
    d = _t(spark, sf_dir, "documents")
    z = F.lit(1.96)
    per_host = (
        d.select(
            F.concat(F.lit("host-"), (F.col("doc_id") % 20).cast("string")).alias(
                "host"
            ),
            (
                F.substring(F.md5(F.col("text")), 32, 1)
                > F.concat((F.col("doc_id") % 3).cast("string"))
            )
            .cast("long")
            .alias("ok"),
        )
        .groupBy("host")
        .agg(F.sum("ok").alias("s"), F.count("*").alias("n"))
    )
    p = F.col("s") / F.col("n")
    n = F.col("n")
    wlb = (
        p
        + z * z / (2 * n)
        - z * F.sqrt((p * (F.lit(1) - p) + z * z / (4 * n)) / n)
    ) / (F.lit(1) + z * z / n)
    return per_host.select(
        "host",
        "s",
        "n",
        F.round(p, 6).alias("success_rate"),
        F.round(wlb, 6).alias("wilson_lb"),
    )



def q_zipf_fit(spark, sf_dir):
    """Zipf's-law fit over the vocabulary head: OLS slope/intercept of
    ln(freq) vs ln(rank) for the top-256 tokens — the one-row corpus
    fingerprint that flags template/boilerplate corpora (slope well
    above -1 = unnaturally flat head) before they poison token budgets.
    Numeric determinism: each ln is round-9-stabilized into a
    DECIMAL(12,9), all cross-products stay in exact decimal through the
    sums, and the final slope algebra runs on doubles with an identical
    operation tree in the oracle. The regression input is 256 rows —
    the window and the fit never touch the fact table."""
    from crawler_spark.operators.corpus import vocab_topk

    v = vocab_topk(_t(spark, sf_dir, "documents"), k=256)
    w = Window.orderBy(F.desc("n_occ"), F.asc("tok"))
    pts = v.select(
        F.round(F.log(F.row_number().over(w).cast("double")), 9)
        .cast("decimal(12,9)")
        .alias("x"),
        F.round(F.log(F.col("n_occ").cast("double")), 9)
        .cast("decimal(12,9)")
        .alias("y"),
    )
    s = pts.agg(
        F.count("*").alias("k"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    k, sx, sy, sxy, sxx = (F.col(c) for c in ["k", "sx", "sy", "sxy", "sxx"])
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    return s.select(
        k.alias("n_points"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / k, 6).alias("intercept"),
    )



def q_discovery_curve(spark, sf_dir):
    """Discovery-saturation curve: per hour, active keys vs FIRST-SEEN
    keys, cumulative coverage, novelty rate — the crawl's "are we still
    finding new URLs or re-crawling the same web" trend (here users/
    hours stand in for URLs/waves on the shared tables). First-seen is
    a grouped min (map-side combinable, never a fact window); the
    cumulative runs over the hours HISTOGRAM only."""
    e = _t(spark, sf_dir, "events")
    hr = F.date_trunc("hour", "ts")
    active = e.groupBy(hr.alias("hour")).agg(
        F.count_distinct("user_id").alias("n_active")
    )
    first_seen = (
        e.groupBy("user_id")
        .agg(F.min(hr).alias("hour"))
        .groupBy("hour")
        .agg(F.count("*").alias("n_new"))
    )
    w = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    return (
        active.join(first_seen, "hour", "left")
        .withColumn("n_new", F.coalesce(F.col("n_new"), F.lit(0)))
        .withColumn("cum_seen", F.sum("n_new").over(w))
        .select(
            "hour",
            "n_active",
            "n_new",
            "cum_seen",
            F.round(F.col("n_new") / F.col("n_active"), 6).alias(
                "novelty_rate"
            ),
        )
    )


def q_char_entropy_gate(spark, sf_dir):
    """Character-entropy quality gate: Shannon entropy of the per-doc
    character distribution — near-zero = repeated-char junk, near
    ln(alphabet) = random junk / mojibake; the cheap complement to the
    Gopher word-level battery. Symbol counts come from a FIXED
    alphabet (here space + a-z, matching this corpus; everything else
    pools into one OTHER symbol) via length-of-replace, so the whole
    gate is deployment-parameterized: a non-Latin corpus MUST widen
    the alphabet (or route on lang_id first) or its text pools into
    OTHER and reads as low-entropy. Being
    gate is a zero-shuffle map stage; each -p*ln(p) term is pinned to
    the 1e-9 grid and summed in fixed expression order, identical on
    both engines."""
    # shuffle-FREE form: per-symbol counts via length(t)-length(replace())
    # over a fixed alphabet (+ one OTHER pool symbol), entropy as a
    # fixed-order sum of pinned -p*ln(p) terms — pure map-side codegen,
    # vs the previous char-explode (10M rows at sf0.1) + two shuffles.
    # Bounded symbol tables are the scale-correct choice anyway: at
    # 10^10 docs an open char vocabulary is a skew magnet. 28 symbols
    # (not 40): codegen compile cost grows superlinearly in the
    # expression width and dominates a one-shot run past ~30 columns
    # (measured 3.8s vs 10.5s cold at sf0.1).
    alpha = " abcdefghijklmnopqrstuvwxyz"
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.trim(F.col("text"))).alias("t")
    ).filter(F.length("t") >= 1)
    d = d.withColumn("len", F.length("t").cast("double"))
    cnt_cols = []
    for j, ch in enumerate(alpha):
        lit = ch.replace("'", "\\'")
        d = d.withColumn(
            f"_c{j}",
            F.expr(f"length(t) - length(replace(t, '{lit}', ''))").cast(
                "double"
            ),
        )
        cnt_cols.append(F.col(f"_c{j}"))
    other = F.col("len") - sum(cnt_cols[1:], cnt_cols[0])
    pin9 = lambda c: F.floor(c * F.lit(1e9) + F.lit(0.5)).cast(  # noqa: E731
        "double"
    ) / F.lit(1e9)

    def term(n):
        p = n / F.col("len")
        return F.when(n > 0, pin9(p * F.log(p))).otherwise(F.lit(0.0))

    terms = [term(c) for c in cnt_cols] + [term(other)]
    ent = -sum(terms[1:], terms[0])
    return d.select(
        "doc_id",
        F.round(ent, 6).alias("entropy_nats"),
        (ent < 2.0).alias("low_entropy"),
    )


def q_shard_checksums(spark, sf_dir):
    """Shard manifest checksums: md5 over each packed bin's SORTED
    member list — the reproducibility receipt that the same corpus
    packs to byte-identical shards on any cluster size (the north
    rule's two-cluster-size criterion applied to OUTPUT, not just
    throughput; every ordering in the pipeline is content-derived, so
    the checksum is partitioning-invariant by construction). Reuses
    the sequence_packing layout (running-sum window in 32 hash
    buckets)."""
    from crawler_spark.functions.text import token_count

    budget = 512
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        (F.col("doc_id") % 32).alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy(F.desc("n_tokens"), "doc_id")
    binned = d.withColumn("cum", F.sum("n_tokens").over(w)).withColumn(
        "bin_id",
        F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(float(budget))).cast(
            "long"
        ),
    )
    return binned.groupBy("bucket", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            )
        ).alias("checksum"),
    )



def q_json_props_stats(spark, sf_dir):
    """Semi-structured extraction: typed from_json over the JSON props
    column (schema-on-read, JVM-side parse — no Python), aggregated per
    event type. The crawl analog: per-URL metadata blobs parsed at scan
    time without a pre-ETL pass."""
    e = _t(spark, sf_dir, "events")
    parsed = e.select(
        "event_type",
        F.from_json(F.col("props"), "k BIGINT").getField("k").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("k").alias("n_with_k"),
        F.sum("k").alias("sum_k"),
        F.round(F.avg("k"), 6).alias("avg_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


def q_sliding_event_counts(spark, sf_dir):
    """Sliding-window agg (10 min window, 5 min slide): each event lands
    in exactly 2 windows. Batch form of the streaming sliding window —
    the overlap factor (window/slide) is the shuffle-volume multiplier
    to budget for at scale."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "n",
        )
    )


def q_sessionize_events(spark, sf_dir):
    """Sessionization: gap > 1800s starts a new session (lag + cumsum)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    with_new = e.withColumn(
        "is_new", F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0))
    )
    sess = with_new.withColumn(
        "session_id", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id").agg(
        F.max("session_id").cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


# --------------------------------------------------------------------------
# TPC-H-shaped relational queries (scan/filter/join/agg coverage)
# --------------------------------------------------------------------------

def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 — the flagship aggregation (A1-A6)."""
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3-shaped: 3-way join + agg + strict-ordered top-10."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1997-06-01")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-06-01")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q_segment_stats(spark, sf_dir):
    """J4/A4: dimension join + group-by count (stats-per-category analog)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.count_distinct("o_custkey").alias("n_customers"),
        )
    )


def q_nation_trade_volume(spark, sf_dir):
    """TPC-H Q7-shaped: bidirectional nation-pair trade volume by ship
    year. Two independent dimension chains hang off the same fact row
    (supplier nation via lineitem, customer nation via orders) and the
    pair predicate is an OR of both directions — the join-reorder +
    broadcast-dim case where the fact-fact join must happen first."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q_market_share(spark, sf_dir):
    """TPC-H Q8-shaped: one nation's share of a region's revenue for one
    part type, per order year — conditional aggregation as a ratio of
    two sums over the same joined fact set (no second scan)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


def q_nation_profit(spark, sf_dir):
    """TPC-H Q9-shaped: per (supplier nation, order year) profit where
    the cost side comes from a second dimension's column (part
    retailprice standing in for partsupp supplycost, which the dataset
    does not carry) — a wide fact expression across two join chains."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            # DECIMAL term sum: order-independent (double partial sums
            # diverge in the last ulp at sf>=0.1); _pin for the final 2dp
            _pin(
                F.sum(profit.cast("decimal(38,10)")).cast("double"), 2
            ).alias("profit")
        )
    )


def q_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17-shaped: revenue from orders below 20% of the part's own
    average quantity — the correlated scalar subquery decorrelated into
    a per-part aggregate joined back to the fact (quantities are
    integer-valued doubles, so the threshold is bit-identical on both
    engines regardless of sum order)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    part_avg = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_floor")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(part_avg, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_floor"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
        )
    )


def q_idle_customers(spark, sf_dir):
    """TPC-H Q22-shaped: positive-balance customers above the global
    positive-balance average (scalar subquery folded in as a broadcast
    one-row crossJoin, no driver collect) with no order placed
    since 2000-01-01 (anti-join against the recent slice; every customer
    has SOME order in this dataset), counted per derived country code."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("bal_floor")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("bal_floor"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 5).cast("int").alias("cntrycode"))
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


def q_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5-shaped: 6-way join chain (fact-fact on orders/lineitem,
    broadcast dims for supplier/nation/region) with a co-nation
    predicate. The shape Catalyst must reorder: region/nation prune
    first, the customer-supplier nation equality turns the supplier
    join selective."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q_returned_items(spark, sf_dir):
    """TPC-H Q10-shaped: returned-lineitem revenue per customer in a
    quarter, strict-ordered top-20 (ties broken by key)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q_event_type_pivot(spark, sf_dir):
    """Pivot (long -> wide): per-user event counts as one column per
    type. Explicit value list = single pass, stable schema (no
    discovery scan), map-side-combinable."""
    ev = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


def q_locf_daily_revenue(spark, sf_dir):
    """Forward fill (LOCF — last observation carried forward) over the
    densified day spine: gap days inherit the most recent observed
    value via last(col, ignoreNulls=True) over an unbounded-preceding
    ROWS frame — the telemetry-standard companion to
    dense_daily_revenue's zero fill (a crawl-rate dashboard wants
    'rate unchanged since last observation', not 'rate zero').
    Partitioned by priority, ordered by day (unique per partition, so
    the frame is deterministic); days before the first observation
    stay NULL and are flagged. DECIMAL sums, pinned once."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderpriority",
        F.date_trunc("DAY", F.col("o_orderdate")).alias("day"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(38,9)")).alias("rev"))
    bounds = o.agg(
        F.date_trunc("DAY", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("DAY", F.max("o_orderdate")).alias("hi"),
    )
    spine = (
        o.select("o_orderpriority")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "o_orderpriority",
            F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias(
                "day"
            ),
        )
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = spine.join(daily, ["o_orderpriority", "day"], "left")
    filled = F.last("rev", ignorenulls=True).over(w)
    return joined.select(
        "o_orderpriority",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.expr(
            "floor(cast(last(rev, true) over (partition by o_orderpriority "
            "order by day rows between unbounded preceding and current row) "
            "as double) * 100 + 0.5) / 100"
        ).alias("revenue_locf"),
        (F.col("rev").isNull() & filled.isNotNull()).alias("carried"),
    )


def q_explode_outer_audit(spark, sf_dir):
    """NULL-preserving explode (posexplode_outer — the generator verb
    the suite's many inner explodes never exercise): rows whose array
    is EMPTY must survive as one (null pos, null tok) row, because an
    inner explode silently drops them — the classic audit bug where
    'docs with zero extracted tokens' vanish from per-doc coverage
    reports instead of showing up as gaps. Every 10th-ish doc gets an
    empty array deterministically so both branches carry rows; output
    is (doc_id, pos, tok)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " "),
        lambda x: x != "",
    )
    arr = F.when(F.col("doc_id") % 10 < 7, F.slice(toks, 1, 3)).otherwise(
        F.array().cast("array<string>")
    )
    return d.select(
        "doc_id", F.posexplode_outer(arr).alias("pos", "tok")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "tok")


def q_dense_daily_revenue(spark, sf_dir):
    """Calendar densification (sequence() + explode): per order
    priority, EVERY day between the global min and max order date gets
    a row — zero-revenue days included — the gap-filling every
    time-series dashboard needs before moving averages or anomaly
    windows make sense (a 7-day mean over a sparse table silently
    shortens its denominator). The day spine is generated (one
    sequence per priority, exploded), then LEFT-joined to the daily
    sums; at 10^10 rows the spine is |priorities| x days — dimension-
    sized however big the fact table is, so the join broadcasts.
    DECIMAL sums, pinned once; day emitted as a date string."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderpriority",
        F.date_trunc("DAY", F.col("o_orderdate")).alias("day"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,9)")).alias("rev")
    )
    bounds = o.agg(
        F.date_trunc("DAY", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("DAY", F.max("o_orderdate")).alias("hi"),
    )
    spine = (
        o.select("o_orderpriority")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "o_orderpriority",
            F.explode(
                F.sequence("lo", "hi", F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    return spine.join(daily, ["o_orderpriority", "day"], "left").select(
        "o_orderpriority",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.expr(
            "floor(cast(coalesce(rev, 0) as double) * 100 + 0.5) / 100"
        ).alias("revenue"),
        F.col("rev").isNull().alias("gap_filled"),
    )


def q_event_unpivot_roundtrip(spark, sf_dir):
    """UNPIVOT (wide -> long, the stack() verb — event_type_pivot's
    inverse and the one relational reshape the suite didn't exercise):
    pivot per-user counts to 5 typed columns, then stack them back to
    (user_id, event_type, n) and drop the zero fill. The ORACLE is the
    direct long-form GROUP BY — so the hash match proves
    unpivot(pivot(x)) == x exactly, a lossless-reshape guarantee, not a
    tautology. stack() is a generator expression (one pass, codegen);
    nothing here shuffles beyond the original count."""
    ev = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )
    stack_args = ", ".join(f"'{t}', {t}" for t in types)
    return (
        wide.select(
            "user_id",
            F.expr(
                f"stack({len(types)}, {stack_args}) as (event_type, n)"
            ),
        )
        .filter(F.col("n") > 0)
        .select("user_id", "event_type", F.col("n").cast("long").alias("n"))
    )


def q_running_revenue(spark, sf_dir):
    """Running cumulative revenue per order-priority class: window sum
    over an ordered frame, partitioned by priority — never a global
    unpartitioned window."""
    o = _t(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            "o_orderpriority",
            F.date_trunc("DAY", F.col("o_orderdate")).alias("day"),
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("day_rev"))
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return daily.select(
        "o_orderpriority",
        "day",
        "day_rev",
        F.round(F.sum("day_rev").over(w), 2).alias("cum_rev"),
    )


def q_asof_join_events(spark, sf_dir):
    """As-of join (point-in-time): each purchase event gains the latest
    prior-or-equal signup (ts, value) for its user. One hash shuffle,
    per-key window — no range explosion. Oracle: DuckDB native ASOF
    LEFT JOIN."""
    from crawler_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    return asof_join(purchases, signups, on="user_id", value_cols=["value"])


def q_interval_join_events(spark, sf_dir):
    """Bucketed interval (range) join: purchases landing inside the
    hour after each signup, aggregated per signup. Hash join on time
    buckets + exact re-check — never a nested-loop."""
    from crawler_spark.operators.intervals import interval_join

    ev = _t(spark, sf_dir, "events")
    intervals = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end_ts"),
    )
    points = ev.filter(F.col("event_type") == "purchase").select(
        F.col("ts").alias("p_ts"), "value"
    )
    return (
        interval_join(points, intervals, bucket_seconds=3600)
        .groupBy("signup_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def q_length_quantiles(spark, sf_dir):
    """Exact interpolated percentiles (median + p90 of doc length) per
    language. At 100 TB you'd flip to approx_percentile (t-digest,
    mergeable partial state); the exact form is the oracle-checkable
    twin."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(n_chars, 0.9)"), 6).alias("p90"),
    )


def q_price_outliers(spark, sf_dir):
    """Robust (median/MAD) outlier detection per group — the
    data-quality pass that survives the heavy tails that wreck
    mean/stddev z-scores. Two grouped exact-percentile passes (median,
    then median absolute deviation) each broadcast back onto the fact;
    rows beyond 3 MADs are counted per group. At 100 TB both medians
    flip to approx_percentile (mergeable t-digest) with the same plan
    shape."""
    li = _t(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("med")
    )
    j = li.join(F.broadcast(med), "l_returnflag").withColumn(
        "adev", F.abs(F.col("l_extendedprice") - F.col("med"))
    )
    mad = j.groupBy("l_returnflag").agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    return (
        j.join(F.broadcast(mad), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum((F.col("adev") > 3 * F.col("mad")).cast("long")).alias("n_outliers"),
            F.round(F.min("med"), 6).alias("med"),
            F.round(F.min("mad"), 6).alias("mad"),
        )
    )


def q_forecast_revenue(spark, sf_dir):
    """TPC-H Q6-shaped: the pure scan-filter-agg probe. All three
    predicates must reach the parquet scan as PushedFilters; the agg is
    a single partial+final sum with no grouping shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q_priority_pipeline(spark, sf_dir):
    """TPC-H Q4-shaped: orders with at least one returned lineitem
    (EXISTS -> left-semi join, the dedup-free way), counted per
    priority class."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q_large_orders(spark, sf_dir):
    """TPC-H Q18-shaped: large-volume orders (HAVING over a fact-side
    pre-aggregation, then joins) — aggregate lineitem FIRST so the
    order/customer joins see only the survivors, not 10^10 rows."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_totalprice", "total_qty")
    )


def q_customer_order_counts(spark, sf_dir):
    """TPC-H Q13-shaped: order-count distribution including zero-order
    customers. The filter lives in the JOIN condition (pre-filtering the
    fact side before a LEFT join — equivalent and pushdown-friendly), and
    the distribution is a second, tiny aggregation over the first."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


def q_promo_revenue_share(spark, sf_dir):
    """TPC-H Q14-shaped: conditional-aggregation ratio (promo revenue
    share) over a month of lineitem joined to a broadcast part dim.
    One fact pass, two sums, one row out."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("promo_share_pct"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
        )
    )


def q_disjunctive_bands(spark, sf_dir):
    """TPC-H Q19-shaped: OR of conjunctive (brand, size, quantity) bands.
    The disjunction involves both sides of the join, so it evaluates
    post-join, but the OR of the part-only and lineitem-only envelopes
    (p_size <= 25, l_quantity <= 30) is pushable; Catalyst's
    constraint propagation handles that — the query's job is to express
    the predicate declaratively and not force row-at-a-time logic."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(band).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


def q_lone_flagger_suppliers(spark, sf_dir):
    """TPC-H Q21-shaped: EXISTS + NOT EXISTS against the same fact.
    Suppliers who shipped a returned ('R') item on a finished
    multi-supplier order where NO other supplier's item was returned —
    a left-semi (another supplier exists) chained with a left-anti
    (no other flagged supplier exists), both on the distinct
    (order, supplier) projection so fact rows never multiply."""
    li = _t(spark, sf_dir, "lineitem")
    o_f = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    s = _t(spark, sf_dir, "supplier")
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    r_pairs = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    flagged = r_pairs.join(o_f, r_pairs.l_orderkey == o_f.o_orderkey).select(
        "l_orderkey", "l_suppkey"
    )
    other = pairs.withColumnRenamed("l_suppkey", "o_suppkey")
    other_r = r_pairs.withColumnRenamed("l_suppkey", "r_suppkey")
    lone = (
        flagged.join(
            other,
            (flagged.l_orderkey == other.l_orderkey)
            & (flagged.l_suppkey != other.o_suppkey),
            "left_semi",
        )
        .join(
            other_r,
            (flagged.l_orderkey == other_r.l_orderkey)
            & (flagged.l_suppkey != other_r.r_suppkey),
            "left_anti",
        )
    )
    return (
        lone.join(F.broadcast(s), lone.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def q_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2-shaped: cheapest supplier per part via a correlated MIN
    decorrelated into a per-part aggregate joined back on exact double
    equality (unit cost = min extendedprice/quantity per (part, supplier)
    pair; lineitem stands in for partsupp — this dataset has no partsupp
    table). IEEE division and MIN are order-independent, so the equality
    join against the per-part minimum is bit-identical on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    p = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_type") == "LARGE") & F.col("p_size").between(10, 30))
        .select("p_partkey", "p_name")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cost = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_partkey", "p_name", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    best = cost.groupBy(F.col("p_partkey").alias("bp")).agg(
        F.min("unit_cost").alias("best_cost")
    )
    return (
        cost.join(
            best,
            (cost.p_partkey == best.bp) & (cost.unit_cost == best.best_cost),
        )
        .join(F.broadcast(s), cost.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            # floor of a scaled double is bit-deterministic across engines,
            # unlike round() whose half-tie behavior differs at some digits
            F.floor(F.col("unit_cost") * 10000.0).alias("min_unit_cost_e4"),
        )
    )


def q_ship_delay_priority(spark, sf_dir):
    """TPC-H Q12-shaped conditional aggregation: lineitems bucketed by
    order-to-ship latency (the shipmode surrogate — this dataset has no
    l_shipmode), counting urgent/high-priority orders against the rest
    per bucket for one shipdate year."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    j = li.join(
        _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.withColumn(
            "delay_bucket",
            F.when(delay <= 30, "FAST").when(delay <= 90, "MEDIUM").otherwise("SLOW"),
        )
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q_supplier_part_variety(spark, sf_dir):
    """TPC-H Q16-shaped: distinct-supplier counts per part attribute
    combo, excluding a supplier blacklist via NOT IN (anti-join; negative
    account balance stands in for the reference's complaint scan). The
    distinct (part, supplier) projection of lineitem stands in for
    partsupp."""
    ps = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#5")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_surplus_suppliers(spark, sf_dir):
    """TPC-H Q20-shaped nested semi-join: suppliers holding surplus stock
    of red parts — total quantity ever supplied per (part, supplier)
    exceeds half of what shipped in 1998 (the availqty > 0.5*sum(qty)
    correlated subquery, decorrelated into two aggregates joined on the
    pair key). Quantities are integer-valued doubles, so the halved sum
    compares exactly on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    red = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    avail = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("avail_qty"))
    )
    shipped = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey)
        .filter(
            (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1999-01-01")
        )
        .groupBy(
            F.col("l_partkey").alias("sp"), F.col("l_suppkey").alias("ss")
        )
        .agg((F.lit(0.5) * F.sum("l_quantity")).alias("half_shipped"))
    )
    surplus = avail.join(
        shipped,
        (avail.l_partkey == shipped.sp)
        & (avail.l_suppkey == shipped.ss)
        & (avail.avail_qty > shipped.half_shipped),
        "left_semi",
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        s.join(surplus.select("l_suppkey").distinct(), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
    )


def q_top_supplier_revenue(spark, sf_dir):
    """TPC-H Q15-shaped: a per-supplier revenue view over a shipdate
    quarter, then the supplier(s) achieving the global maximum. The
    scalar subquery (SELECT max(total_revenue) FROM rev) is realized as
    a broadcast one-row join — no driver-side collect, and the max's
    rescan of the tiny per-supplier aggregate is cheap (it reruns the
    agg subtree, not the fact scan, once AQE caches the shuffle).
    Revenue is rounded to 2 decimals BEFORE the max/equality so the
    float sum's last-ulp order dependence can't flip the winner."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    s = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("_mx"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q_nation_acctbal_share(spark, sf_dir):
    """TPC-H Q11-shaped: per-group value vs a fraction of the global
    total (HAVING sum > f * (SELECT sum ...)). The global scalar enters
    as a broadcast one-row cross join against the (tiny) per-group
    aggregate, so the threshold comparison stays inside the plan."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    per = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum("s_acctbal").alias("_sum"))
    )
    total = per.agg(F.sum("_sum").alias("_tot"))
    return (
        per.join(F.broadcast(total))
        .filter(F.col("_sum") > 0.04 * F.col("_tot"))
        .select(
            "n_name",
            F.round("_sum", 2).alias("acctbal_sum"),
            F.round(F.col("_sum") / F.col("_tot") * 100, 4).alias("share_pct"),
        )
    )


def q_revenue_ma7(spark, sf_dir):
    """Bounded-ROWS window frame: 7-row moving average of daily order
    revenue, partitioned by order priority so no window ever needs a
    global sort (the scale rule every trend query must obey — an
    unpartitioned orderBy window is a single-partition bottleneck)."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy("o_orderpriority", "o_orderdate").agg(
        F.round(F.sum("o_totalprice"), 2).alias("day_total")
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderdate")
        .rowsBetween(-6, 0)
    )
    return daily.select(
        "o_orderpriority",
        "o_orderdate",
        "day_total",
        F.round(F.avg("day_total").over(w), 6).alias("ma7"),
    )


def q_referential_orphans(spark, sf_dir):
    """Data-quality audit: orphan counts per foreign-key edge of the
    star schema (rows whose parent is missing), each edge a left-anti
    join with the dimension side broadcast. All-zero counts are the
    PASSING result — the query is the integrity gate a pipeline runs
    before training-set assembly."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")

    def edge(name, fact, dim, fk, pk):
        return (
            fact.join(
                F.broadcast(dim.select(pk)), fact[fk] == dim[pk], "left_anti"
            )
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(name).alias("edge"), "n_orphans")
        )

    return (
        edge("orders->customer", o, c, "o_custkey", "c_custkey")
        .unionByName(edge("lineitem->orders", li, o, "l_orderkey", "o_orderkey"))
        .unionByName(edge("lineitem->part", li, p, "l_partkey", "p_partkey"))
        .unionByName(edge("lineitem->supplier", li, s, "l_suppkey", "s_suppkey"))
    )


def q_activity_islands(spark, sf_dir):
    """Gaps-and-islands: per-user runs of consecutive active DAYS via
    the date-minus-row_number grouping trick (no self-join, no loop —
    one partitioned window then one aggregation)."""
    e = _t(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grouped = days.withColumn(
        "grp", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    islands = grouped.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak")
    )
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.max("streak").alias("longest_streak"),
    )


def q_order_priority_cube(spark, sf_dir):
    """CUBE grouping-sets (the full lattice, vs rollup_event_stats'
    hierarchy) with an explicit grouping_id so every subtotal level is
    distinguishable. One shuffle: Spark expands grouping sets map-side."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


def q_ntile_value_deciles(spark, sf_dir):
    """W-family breadth: ntile(10) decile assignment per event_type
    (deterministic tie-break on event_id), then per-decile envelope —
    the classic score-calibration / threshold-picking query."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        e.withColumn("decile", F.ntile(10).over(w).cast("long"))
        .groupBy("event_type", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
        )
    )


def q_event_user_setops(spark, sf_dir):
    """D-family set ops (SURVEY §2.6): INTERSECT and EXCEPT over distinct
    user sets — converters (click AND purchase) vs bouncers (click and
    NOT purchase). Spark compiles both to semi/anti hash joins on the
    deduped sets, never a sort."""
    e = _t(spark, sf_dir, "events")
    clickers = e.filter(F.col("event_type") == "click").select("user_id").distinct()
    purchasers = e.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    both = clickers.intersect(purchasers).withColumn(
        "relation", F.lit("click_and_purchase")
    )
    only = clickers.subtract(purchasers).withColumn(
        "relation", F.lit("click_not_purchase")
    )
    return both.unionByName(only)


def q_skewed_join_counts(spark, sf_dir):
    """Skew-salted large-large join (operators/skew.py): 75% of event
    rows share one hot key; the build side is replicated n_salts ways so
    the hot key spreads over 8 reducers instead of melting one. The
    oracle is the PLAIN join — salting must be row-for-row invisible."""
    from crawler_spark.operators.skew import salted_join

    e = _t(spark, sf_dir, "events").withColumn(
        "k",
        F.when(F.col("user_id") % 4 < 3, F.lit(0)).otherwise(
            (F.col("user_id") % 50).cast("int")
        ),
    )
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select((F.col("doc_id") % 50).cast("int").alias("k"), "n_chars")
    )
    joined = salted_join(e, d, "k", F.col("event_id"), n_salts=8)
    return (
        joined.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


# --------------------------------------------------------------------------
# enrichment pipeline (geocode analogs): fallback join, scenario first-hit,
# dimension upsert, union-dedup, weighted similarity
# --------------------------------------------------------------------------

def q_enrich_fallback(spark, sf_dir):
    """J6: primary lookup, secondary only on miss, first hit wins
    (reference: map_api/__init__.py:62-118)."""
    from crawler_spark.operators.enrich import fallback_join

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    base = c.select("c_custkey", F.col("c_nationkey").alias("nkey"))
    primary = n.filter(F.col("n_nationkey") % 3 != 0).select(
        F.col("n_nationkey").alias("nkey"), F.col("n_name").alias("val")
    )
    secondary = n.select(
        F.col("n_nationkey").alias("nkey"), F.lower("n_name").alias("val")
    )
    return fallback_join(base, primary, secondary, "nkey", ["val"])


def q_scenario_first_hit(spark, sf_dir):
    """W2/D2/C12: ordered scenario list (full -> reduced -> wildcard),
    first validated hit wins (reference: kakao_api.py:131-155,219-247)."""
    from crawler_spark.operators.enrich import scenario_first_hit

    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.array(
            F.concat_ws("|", "source", "lang"),
            F.col("source"),
            F.lit("*"),
        ).alias("scenarios"),
    )
    s1 = (
        d.filter(F.col("lang") == "en")
        .select(F.concat_ws("|", "source", "lang").alias("q"))
        .distinct()
    )
    s2 = (
        d.filter(F.length("source") % 2 == 0)
        .select(F.col("source").alias("q"))
        .distinct()
    )
    s3 = spark.createDataFrame([("*",)], "q string")
    lookup = s1.union(s2).union(s3).distinct().withColumn("val", F.upper("q"))
    return scenario_first_hit(base, "scenarios", lookup, "q", "val", "doc_id")


def q_alias_resolve(spark, sf_dir):
    """J5: reusable exact-then-substring two-tier lookup against a
    broadcast mapping (reference: address_parser.py:10-28,63-87).
    Resolution = min(pos, tier, canon): earliest token, exact beats
    substring, lexicographic canon as the deterministic tie-break;
    marker-based fallback default when nothing matches."""
    from crawler_spark.operators.enrich import two_tier_lookup

    d = _t(spark, sf_dir, "documents")
    base = d.select("doc_id", F.array("source", "lang").alias("parts"))
    m = (
        d.filter(F.length("source") == 4)
        .filter(F.substring("source", 4, 1).isin("0", "1", "2", "4", "6", "8"))
        .select(F.col("source").alias("alias"))
        .union(
            d.select(F.col("lang").alias("alias")).filter(
                F.col("alias").isin("en", "fr")
            )
        )
        .distinct()
        .withColumn("canon", F.concat(F.upper("alias"), F.lit("-C")))
    )
    return two_tier_lookup(
        base, "parts", m, "alias", "canon", "doc_id",
        fallback_contains="z", fallback_value="DEFAULT",
    )


def q_dim_upsert(spark, sf_dir):
    """K2/J2: MERGE-style dimension upsert — left join the dim, generate
    deterministic rows for misses (reference: database.py:59-89)."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    incoming = n.select(
        (
            F.col("n_regionkey")
            + F.when(F.col("n_nationkey") % 5 == 0, F.lit(10)).otherwise(F.lit(0))
        ).alias("rkey")
    ).distinct()
    return (
        incoming.join(
            F.broadcast(r.select(F.col("r_regionkey").alias("rkey"), "r_name")),
            "rkey",
            "left",
        )
        .select(
            "rkey",
            F.coalesce(
                F.col("r_name"), F.concat(F.lit("new-region-"), F.col("rkey"))
            ).alias("name"),
            F.col("r_name").isNull().cast("long").alias("is_new"),
        )
    )


def q_union_dedup_first_wins(spark, sf_dir):
    """K4/D1: existing ∪ new with first-wins dedup on the key, existing
    rows take precedence (reference: csv_handler.py:13-66)."""
    e = _t(spark, sf_dir, "events")
    old = e.filter(F.col("event_id") % 2 == 0).withColumn("src", F.lit("old"))
    new = e.filter(F.col("event_id") % 3 == 0).withColumn("src", F.lit("new"))
    both = old.unionByName(new).withColumn(
        "src_rank", F.when(F.col("src") == "old", F.lit(0)).otherwise(F.lit(1))
    )
    w = Window.partitionBy("event_id").orderBy("src_rank")
    return (
        both.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "src", F.round("value", 4).alias("value"))
    )


def q_pair_similarity(spark, sf_dir):
    """A8/A9: token-set Jaccard + weighted similarity between adjacent
    documents (reference: address_parser.py:206-264)."""
    d = _t(spark, sf_dir, "documents")
    toks = lambda c: F.array_distinct(  # noqa: E731
        F.filter(F.split(F.lower(F.trim(c)), "\\s+"), lambda t: F.length(t) > 0)
    )
    a = d.select(
        F.col("doc_id").alias("doc_a"), F.col("lang").alias("lang_a"),
        toks(F.col("text")).alias("ta"),
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"), F.col("lang").alias("lang_b"),
        toks(F.col("text")).alias("tb"),
    )
    jac = F.size(F.array_intersect("ta", "tb")) / F.greatest(
        F.size(F.array_union("ta", "tb")), F.lit(1)
    )
    return (
        a.join(b, F.col("doc_b") == F.col("doc_a") + 1)
        .select(
            "doc_a",
            "doc_b",
            F.round(jac, 6).alias("jaccard"),
            F.round(
                F.when(F.col("lang_a") == F.col("lang_b"), F.lit(0.6)).otherwise(
                    F.lit(0.0)
                )
                + jac * 0.4,
                6,
            ).alias("weighted"),
        )
    )


def q_range_scan(spark, sf_dir):
    """S7: range/offset scan (reference: crawler.py:859-901) — rows with
    global rank in (100, 200] by event_id. Executed as TakeOrdered
    (orderBy + limit = per-partition top-k + driver merge, no global
    sort, no single-partition window); the tiny row_number then runs
    over only the 200 surviving rows. Deep offset pagination at 10^10
    rows is inherently O(offset) — partition pruning on the sort key is
    the real scale path, which this plan degrades to gracefully."""
    e = _t(spark, sf_dir, "events")
    top = e.orderBy("event_id").limit(200)
    w = Window.orderBy("event_id")  # over exactly 200 rows — trivial
    return (
        top.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 100)
        .select("rn", "event_id", "event_type", F.round("value", 4).alias("value"))
    )


def q_weighted_similarity(spark, sf_dir):
    """A9: the reference's weighted component similarity with literal
    3/3/2/1 weights and fuzzy degradation
    (address_parser.py:206-243): a component's weight counts toward the
    total only when BOTH sides have it; 'town' matches fuzzily
    (digit-stripped) for half credit; 'detail' contributes its token-set
    Jaccard; score = earned / total_weight (0 when nothing comparable).
    Components derived deterministically from documents: province=source
    (absent when doc_id%11==0), city=lang, town=source+digit,
    detail=text tokens."""
    d = _t(spark, sf_dir, "documents")
    toks = lambda c: F.array_distinct(  # noqa: E731
        F.filter(F.split(F.lower(F.trim(c)), "\\s+"), lambda t: F.length(t) > 0)
    )

    def side(suf):
        return d.select(
            F.col("doc_id").alias(f"doc_{suf}"),
            F.when(F.col("doc_id") % 11 == 0, F.lit(None))
            .otherwise(F.col("source"))
            .alias(f"prov_{suf}"),
            F.col("lang").alias(f"city_{suf}"),
            F.concat(F.col("source"), (F.col("doc_id") % 10).cast("string")).alias(
                f"town_{suf}"
            ),
            toks(F.col("text")).alias(f"det_{suf}"),
        )

    j = side("a").join(side("b"), F.col("doc_b") == F.col("doc_a") + 1)
    prov_both = F.col("prov_a").isNotNull() & F.col("prov_b").isNotNull()
    det_both = (F.size("det_a") > 0) & (F.size("det_b") > 0)
    town_clean = lambda c: F.regexp_replace(c, "[0-9]+", "")  # noqa: E731
    det_jac = F.size(F.array_intersect("det_a", "det_b")) / F.greatest(
        F.size(F.array_union("det_a", "det_b")), F.lit(1)
    )
    earned = (
        F.when(prov_both & (F.col("prov_a") == F.col("prov_b")), 3.0).otherwise(0.0)
        + F.when(F.col("city_a") == F.col("city_b"), 3.0).otherwise(0.0)
        + F.when(F.col("town_a") == F.col("town_b"), 2.0)
        .when(town_clean(F.col("town_a")) == town_clean(F.col("town_b")), 1.0)
        .otherwise(0.0)
        + F.when(det_both, det_jac).otherwise(0.0)
    )
    total = (
        F.when(prov_both, 3.0).otherwise(0.0)
        + F.lit(3.0)  # city (lang) always present
        + F.lit(2.0)  # town always present
        + F.when(det_both, 1.0).otherwise(0.0)
    )
    return j.select(
        "doc_a",
        "doc_b",
        F.round(
            F.when(total > 0, earned / total).otherwise(F.lit(0.0)), 6
        ).alias("weighted_sim"),
    )


def q_validated_match(spark, sf_dir):
    """J7/C7: validation join — equi on a derived (digit-stripped) key
    plus an expression predicate tier (reference: kakao_api.py:157-209,
    address_parser.py:245-251)."""
    d = _t(spark, sf_dir, "documents")
    left = d.select(
        "doc_id",
        F.concat(
            F.col("source"), F.lit("#"), (F.col("doc_id") % 3).cast("string")
        ).alias("source_q"),
        "lang",
    )
    dim = d.select("source", "lang").distinct()
    stripped = F.regexp_replace(F.col("source_q"), "#[0-9]+$", "")
    return (
        left.join(
            F.broadcast(dim),
            (stripped == dim["source"])
            & (left["lang"] == dim["lang"])
            & (F.length(dim["source"]) > 3),
        )
        .select("doc_id", "source_q", "source", left["lang"].alias("lang"))
    )


def q_rollup_event_stats(spark, sf_dir):
    """Rollup/grouping-sets aggregation: per (event_type, cohort) with
    subtotals and grand total."""
    e = _t(spark, sf_dir, "events").withColumn("cohort", F.col("user_id") % 10)
    return (
        e.rollup("event_type", "cohort")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def q_image_decode_stats(spark, sf_dir):
    """Multimodal: decode engine-encoded png/qdct images -> pixel stats via
    Arrow-batched mapInPandas. No SQL oracle (binary codec); rows-only."""
    from crawler_spark.operators.multimodal import decode_stats
    from crawler_spark.sources.synth import T1_SMOKE

    urls = [f"http://host-0.test/p0/d0/img-{i}" for i in range(64)]
    images = _synth_image_df(spark, urls)
    return decode_stats(images)


def q_image_hash_agreement(spark, sf_dir):
    """Perceptual-hash ensemble audit: pHash/dHash/aHash per image in
    ONE decode pass (operators/multimodal.py:alt_hashes), then native
    bit_count(xor) pairwise agreement — the on-corpus correlation table
    that justifies (or kills) a 2-of-3 ensemble dedup rule. No SQL
    oracle (binary codec); the hash functions' numeric contracts are
    pytest-covered (tests/test_alt_hashes.py)."""
    from crawler_spark.operators.multimodal import alt_hashes
    from crawler_spark.sources.synth import T1_SMOKE

    urls = [f"http://host-0.test/p0/d0/img-{i}" for i in range(64)]
    images = _synth_image_df(spark, urls)
    h = alt_hashes(images)
    return h.select(
        "image_id",
        "phash",
        "dhash",
        "ahash",
        (64 - F.bit_count(F.col("phash").bitwiseXOR(F.col("dhash")))).alias(
            "agree_pd"
        ),
        (64 - F.bit_count(F.col("phash").bitwiseXOR(F.col("ahash")))).alias(
            "agree_pa"
        ),
        (64 - F.bit_count(F.col("dhash").bitwiseXOR(F.col("ahash")))).alias(
            "agree_da"
        ),
    )


def q_image_border_gate(spark, sf_dir):
    """Letterbox / uniform-border gate over engine-encoded images
    (operators/multimodal.py:border_scores): per-side border widths +
    letterboxed flag — the pre-crop curation gate. No SQL oracle
    (binary codec); planted-border exactness is pytest-covered
    (tests/test_alt_hashes.py)."""
    from crawler_spark.operators.multimodal import border_scores
    from crawler_spark.sources.synth import T1_SMOKE

    urls = [f"http://host-0.test/p0/d0/img-{i}" for i in range(64)]
    images = _synth_image_df(spark, urls)
    return border_scores(images)



# --------------------------------------------------------------------------
# dedup suite (documents)
# --------------------------------------------------------------------------

def q_blocklist_filter(spark, sf_dir):
    """C4-style term-blocklist gate: drop documents containing any
    blocked WORD (token-level, not substring — "scanner" must not trip
    on "scan"). The block set is a broadcast literal; matching is one
    exists() over the token array (no explode, no shuffle, whole-stage
    codegen) — the cheapest gate in the text cascade, run before
    quality scoring. Reports the matched terms so the blocklist's hit
    profile is auditable."""
    d = _t(spark, sf_dir, "documents")
    blocked = ["merge", "cube", "skew"]
    toks = F.split(F.lower(F.trim(F.col("text"))), "\\s+")
    hits = F.filter(
        F.array([F.lit(b) for b in blocked]), lambda b: F.array_contains(toks, b)
    )
    return d.select(
        "doc_id",
        F.size(hits).alias("n_blocked_terms"),
        F.array_join(hits, ",").alias("blocked_terms"),
        (F.size(hits) == 0).alias("kept"),
    )



def q_dedup_exact(spark, sf_dir):
    from crawler_spark.operators.dedup import dedup_exact

    return dedup_exact(_t(spark, sf_dir, "documents"))


def q_dedup_minhash_sigs(spark, sf_dir):
    from crawler_spark.operators.dedup import minhash_signatures

    return minhash_signatures(_t(spark, sf_dir, "documents"), n_hashes=4)


def q_dedup_simhash(spark, sf_dir):
    from crawler_spark.operators.dedup import simhash_signatures

    return simhash_signatures(_t(spark, sf_dir, "documents"))


def q_ngram_jaccard_pairs(spark, sf_dir):
    from crawler_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.8)


def q_shingle_containment(spark, sf_dir):
    """Asymmetric near-dup: Broder containment
    |A∩B| / min(|A|,|B|) over word 3-gram shingles — catches the
    subset/excerpt/boilerplate-wrapped copies symmetric Jaccard waves
    through (operators/dedup.py shingle_containment_pairs). Same
    shared-shingle candidate pre-filter scale shape as
    ngram_jaccard_pairs."""
    from crawler_spark.operators.dedup import shingle_containment_pairs

    return shingle_containment_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.9
    )


def q_minhash_lsh_pairs(spark, sf_dir):
    from crawler_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), n_hashes=4, min_band_matches=2
    )


def q_minhash_banded_pairs(spark, sf_dir):
    """Proper (b=4, r=2) MinHash banding — candidates must agree on all
    r rows of a band (the S-curve 1-(1-s^r)^b), fixing the r=1 weak
    banding's high candidate rate at corpus scale."""
    from crawler_spark.operators.dedup import minhash_banded_pairs

    return minhash_banded_pairs(
        _t(spark, sf_dir, "documents"), n_bands=4, rows_per_band=2
    )


def q_bbit_minhash_est(spark, sf_dir):
    """b-bit minwise hashing (Li & Koenig WWW'10): Jaccard estimated
    from the lowest 8 bits of k=16 minhashes — 16x smaller sketches at
    equal k, the post-LSH candidate-verification path that never
    re-reads raw text. Adjacent-id pairs, estimate vs exact shingle
    Jaccard side by side (operators/dedup.py bbit_pair_estimate)."""
    from crawler_spark.operators.dedup import bbit_pair_estimate

    return bbit_pair_estimate(
        _t(spark, sf_dir, "documents"), n_hashes=16, b_hex=2
    )


def q_oph_signatures(spark, sf_dir):
    """Densified one-permutation hashing (Li/Owen/Zhang NIPS'12,
    Shrivastava/Li ICML'14): ONE hash pass buckets shingles into 16
    bins (min md5 per bin); empty bins borrow circularly-right with
    rotation distance t. k-way sketch at 1/k-th of classic minhash's
    hashing CPU — the 100 TB signature-build path
    (operators/dedup.py oph_signatures)."""
    from crawler_spark.operators.dedup import oph_signatures

    return oph_signatures(_t(spark, sf_dir, "documents"), n_bins=16)


def q_oph_jaccard_est(spark, sf_dir):
    """Densified-OPH Jaccard estimator over adjacent-id pairs:
    J_hat = (bins whose densified (t, sig) agree) / 16. Linear join on
    (doc_id, bin) — never all-pairs (operators/dedup.py
    oph_pair_estimate)."""
    from crawler_spark.operators.dedup import oph_pair_estimate

    return oph_pair_estimate(_t(spark, sf_dir, "documents"), n_bins=16)


def q_ngram_jaccard_capped(spark, sf_dir):
    """n-gram Jaccard with hot-shingle DF capping: shingles in > max_df
    docs are excluded from CANDIDATE generation (bounding the join's
    worst key at max_df^2) but still count in the exact Jaccard."""
    from crawler_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.8, max_df=5
    )


def q_substring_overlap(spark, sf_dir):
    """Exact-substring dedup (suffix-array-style, Lee et al. 2021):
    fingerprint every 5-token window, self-join on md5(window) — finds
    verbatim shared spans (boilerplate, quotes) that set-similarity
    misses. One shuffle on a uniform 128-bit key."""
    from crawler_spark.operators.dedup import substring_overlap_pairs

    return substring_overlap_pairs(
        _t(spark, sf_dir, "documents"), window=5, min_shared=1
    )


def q_winnow_fingerprints(spark, sf_dir):
    """Winnowing fingerprint sketch (Schleimer/Wilkerson/Aiken SIGMOD'03,
    the MOSS algorithm): min-hash-per-window selection over 4-token gram
    hashes, ties rightmost — guaranteed to catch every shared run of
    >= w+k-1 = 7 tokens at ~2/(w+1) = 40% of the full window-index size.
    Per-doc rollup: grams, selected fingerprints, selection density."""
    from crawler_spark.operators.dedup import winnow_fingerprints

    fps = winnow_fingerprints(_t(spark, sf_dir, "documents"), k=4, w=4)
    return fps.groupBy("doc_id").agg(
        F.any_value("n_grams").alias("n_grams"),
        F.count("*").alias("n_fps"),
        F.round(
            F.count("*") / (F.any_value("n_grams") - F.lit(4) + F.lit(1)), 6
        ).alias("density"),
    )


def q_winnow_overlap(spark, sf_dir):
    """Verbatim-overlap pairs from the winnowed sketch: self-join on
    selected fingerprint hashes only — same guarantee as the full
    window index for runs >= 7 tokens, at a fraction of the join
    fan-out. The scale-path replacement for substring_overlap."""
    from crawler_spark.operators.dedup import winnow_overlap_pairs

    return winnow_overlap_pairs(
        _t(spark, sf_dir, "documents"), k=4, w=4, min_shared=1
    )


def q_winnow_cross_wave(spark, sf_dir):
    """Incremental winnowing dedup across waves: the NEW wave (odd
    doc_ids) probes ONLY the persisted fingerprint index of the OLD
    wave (even doc_ids) — new x old, never wave-squared, exactly how
    the winnow index absorbs a daily crawl (the verbatim-overlap twin
    of dedup_cross_wave's minhash form). Probe join on the selected
    md5 fingerprints at ~2/(w+1) the volume of a full window index."""
    from crawler_spark.operators.dedup import winnow_fingerprints

    d = _t(spark, sf_dir, "documents")
    old = winnow_fingerprints(d.filter(F.col("doc_id") % 2 == 0)).select(
        F.col("doc_id").alias("old_doc"), "fp"
    ).distinct()
    new = winnow_fingerprints(d.filter(F.col("doc_id") % 2 == 1)).select(
        F.col("doc_id").alias("new_doc"), "fp"
    ).distinct()
    return (
        new.join(old, "fp")
        .groupBy("new_doc", "old_doc")
        .agg(F.count("*").alias("n_shared"))
    )



def q_dedup_clusters(spark, sf_dir):
    """Duplicate-cluster reduction: MinHash-LSH candidate pairs ->
    connected components -> (doc_id, cluster_id=min reachable doc id).
    The step every LSH family needs before "keep one per cluster" —
    pair output alone double-counts transitive duplicates."""
    from crawler_spark.operators.dedup import dedup_clusters, minhash_lsh_pairs

    pairs = minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), n_hashes=4, min_band_matches=2
    )
    return dedup_clusters(pairs)


def q_dedup_impact(spark, sf_dir):
    """What would dedup actually save? The report every curation run
    reads before committing to a dedup pass: MinHash-LSH candidate
    pairs -> connected components -> keep-first-per-cluster, then a
    per-cluster-size rollup of clusters, documents removed, and token
    mass removed (singleton docs included, so the report covers the
    whole corpus). Cluster labels ride the existing dedup_clusters
    machinery (min-label propagation); token mass is one join of the
    dimension-sized cluster map back onto per-doc token counts."""
    from crawler_spark.functions.text import token_count
    from crawler_spark.operators.dedup import dedup_clusters, minhash_lsh_pairs

    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, n_hashes=4, min_band_matches=2)
    clusters = dedup_clusters(pairs)
    toks = d.select("doc_id", token_count(F.col("text")).cast("long").alias("n_tok"))
    cl = toks.join(clusters, "doc_id", "left").withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    )
    per_cluster = cl.groupBy("cluster_id").agg(
        F.count("*").alias("size"),
        F.sum(
            F.when(F.col("doc_id") != F.col("cluster_id"), F.col("n_tok")).otherwise(
                F.lit(0)
            )
        ).alias("tokens_removed"),
    )
    return (
        per_cluster.groupBy("size")
        .agg(
            F.count("*").alias("n_clusters"),
            ((F.col("size") - 1) * F.count("*")).alias("docs_removed"),
            F.sum("tokens_removed").alias("tokens_removed"),
        )
        .select("size", "n_clusters", "docs_removed", "tokens_removed")
    )


def q_aging_schedule(spark, sf_dir):
    """Driver-visible form of the scheduler's starvation-free priority
    aging (run_round aging_every, tests/test_aging.py): effective
    priority = max(0, priority - (round - born_round) // k) at round 6
    with k=2, then the per-host politeness admit window re-ranked under
    the AGED key — the exact expression the engine schedules with.
    One window over the frontier; aging itself is a shuffle-free
    codegen map (stateless: derived from the immutable born_round)."""
    f = _frontier(spark, sf_dir).withColumn(
        "born_round", (F.col("doc_id") % 5).cast("int")
    )
    eff = F.greatest(
        F.lit(0),
        F.col("priority")
        - F.floor((F.lit(6) - F.col("born_round")) / F.lit(2)).cast("int"),
    ).cast("int")
    out = f.withColumn("eff_priority", eff)
    w = Window.partitionBy("host").orderBy(
        "eff_priority", "depth", "discovery_seq"
    )
    return (
        out.withColumn("sched_rank", F.row_number().over(w))
        .filter(F.col("sched_rank") <= 4)
        .select(
            "doc_id", "host", "priority", "born_round", "eff_priority",
            "sched_rank",
        )
    )


def q_host_quota_schedule(spark, sf_dir):
    """Driver-visible form of the scheduler's cumulative host quota
    (run_round max_pages_per_host, tests/test_rounds_oracle.py
    test_host_quota_oracle_match — the Heritrix host-quota control):
    rows with doc_id % 4 == 0 stand in for already-consumed schedule
    slots; each host's budget this round is least(base=3, greatest(0,
    quota=8 - served)); remaining pending rows admit through the
    per-host window in frontier order. Served counts are an O(hosts)
    agg broadcast back — the pending side joins on a broadcast, never
    shuffles on the (potentially skewed) host key."""
    f = _frontier(spark, sf_dir)
    served = (
        f.filter(F.col("doc_id") % 4 == 0)
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("host_served"))
    )
    budgeted = (
        f.filter(F.col("doc_id") % 4 != 0)
        .join(F.broadcast(served), "host", "left")
        .withColumn("host_served", F.coalesce(F.col("host_served"), F.lit(0)))
        .withColumn(
            "budget",
            F.least(
                F.lit(3).cast("long"),
                F.greatest(F.lit(0).cast("long"), F.lit(8) - F.col("host_served")),
            ),
        )
    )
    w = Window.partitionBy("host").orderBy("priority", "depth", "discovery_seq")
    return (
        budgeted.withColumn("sched_rank", F.row_number().over(w))
        .filter(F.col("sched_rank") <= F.col("budget"))
        .select("doc_id", "host", "host_served", "budget", "sched_rank")
    )


def q_image_phash_neardup(spark, sf_dir):
    """Image-axis near-dup (the graft cell's payload): decode ->
    64-bit perceptual hash (mapInPandas, Arrow-batched) -> banded
    Hamming<=7 pair join, exact by pigeonhole over 8x8-bit bands.
    Input mixes engine-encoded originals with deterministic perturbed
    variants (global +1 brightness = Hamming 0 after lossless
    roundtrip; half-image +4 = a few flipped median-adjacent bits) so
    the query demonstrably recalls both. Candidates then pass the
    decoded-pixel PSNR verify (the north rule's invariant as an
    operator): decode both sides, keep pairs >= 30 dB. No SQL oracle
    (binary codec, Python phash); rows-only — brute-force parity is
    pytest-asserted (tests/test_dedup_text.py)."""
    import numpy as np

    from crawler_spark.functions.codecs import decode, encode
    from crawler_spark.operators.dedup import hamming64_pairs
    from crawler_spark.operators.multimodal import decode_stats
    from crawler_spark.sources.synth import T1_SMOKE

    urls = [f"http://host-0.test/p0/d0/img-{i}" for i in range(48)]
    rows = [
        (r["image_id"], r["bytes"], r["fmt"])
        for r in (T1_SMOKE.payload(u) for u in urls)
    ]
    variants = []
    for image_id, data, fmt in rows[:16]:
        px = decode(data, fmt).astype(np.int16)
        if int(image_id[-1], 16) % 2:
            px = np.clip(px + 1, 0, 255)  # brightness twin (no wraparound)
        else:
            half = px.shape[0] // 2
            px[:half] = np.clip(px[:half] + 4, 0, 255)  # near-dup, few bits flip
        variants.append((image_id + "-v", encode(px.astype(np.uint8), "png"), "png"))
    images = spark.createDataFrame(
        rows + variants, "image_id string, bytes binary, fmt string"
    )
    sigs = decode_stats(images).select("image_id", "phash")
    cand = hamming64_pairs(
        sigs, id_col="image_id", sig_col="phash", max_hamming=7, n_bands=8
    )
    from crawler_spark.operators.multimodal import verify_pairs_psnr

    return verify_pairs_psnr(cand, images, min_psnr=30.0)


def q_image_dct_neardup(spark, sf_dir):
    """Frequency-domain near-dup: decode -> DCT pHash (32x32 2D DCT-II,
    low-frequency 8x8, AC-median threshold) alongside the spatial
    block-mean hash in one mapInPandas pass -> banded Hamming<=6 join
    on the DCT signature. Input plants contrast-regraded twins
    (round(px*1.2) / round(px*0.85)); both hash families are
    affine-invariant pre-quantization, but they flip DIFFERENT bits
    under uint8 re-quantization (near-zero AC coefficients vs
    median-adjacent block means), so the returned rows carry BOTH
    distances: the per-pair disagreement in both directions is exactly
    the decorrelation that makes a >=2-of-k hash ensemble kill each
    family's false negatives. No SQL oracle (binary codec + DCT in
    Python); rows-only — brute-force parity and the exact invariance
    proofs are pytest-asserted (tests/test_dcthash.py)."""
    import numpy as np

    from crawler_spark.functions.codecs import decode, encode
    from crawler_spark.operators.dedup import hamming64_pairs
    from crawler_spark.operators.multimodal import dct_hashes
    from crawler_spark.sources.synth import T1_SMOKE

    urls = [f"http://host-1.test/p0/d0/img-{i}" for i in range(48)]
    rows = [
        (r["image_id"], r["bytes"], r["fmt"])
        for r in (T1_SMOKE.payload(u) for u in urls)
    ]
    variants = []
    for image_id, data, fmt in rows[:16]:
        px = decode(data, fmt).astype(np.float64)
        s = 1.2 if int(image_id[-1], 16) % 2 else 0.85
        tw = np.clip(np.round(px * s), 0, 255).astype(np.uint8)
        variants.append((image_id + "-c", encode(tw, "png"), "png"))
    images = spark.createDataFrame(
        rows + variants, "image_id string, bytes binary, fmt string"
    )
    sigs = dct_hashes(images).persist()
    cand = hamming64_pairs(
        sigs, id_col="image_id", sig_col="dct_phash", max_hamming=6, n_bands=8
    )
    blk = sigs.select("image_id", "phash")
    return (
        cand.join(
            F.broadcast(blk).withColumnsRenamed(
                {"image_id": "doc_a", "phash": "ph_a"}
            ),
            "doc_a",
        )
        .join(
            F.broadcast(blk).withColumnsRenamed(
                {"image_id": "doc_b", "phash": "ph_b"}
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("hamming").alias("dct_hamming"),
            F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))).alias(
                "blockhash_hamming"
            ),
        )
        .orderBy("doc_a", "doc_b")
    )


def q_image_colorhist(spark, sf_dir):
    """Intensity-histogram near-dup — the image signal orthogonal to
    pHash (phash keys on spatial frequency structure, the histogram on
    tonal distribution; dedup cascades run both because each catches
    twins the other misses, e.g. a re-dithered image keeps its
    histogram but shifts phash bits). Decode -> 16-bin L1-normalized
    luma histogram (Arrow-batched mapInPandas, multimodal.luma_hist),
    block on the dominant bin, score sum(min(a_i,b_i)) with native
    zip_with/aggregate — the pair loop is pure JVM codegen over
    16-double signatures, never pixels. Input mixes engine-encoded
    originals with +1-brightness twins (histogram shifts one bin edge
    at most -> intersection stays near 1). No SQL oracle (binary
    codec, Python decode); rows-only — numpy brute-force parity is
    pytest-asserted (tests/test_colorhist.py)."""
    import numpy as np

    from crawler_spark.functions.codecs import decode, encode
    from crawler_spark.operators.multimodal import (
        hist_intersection_pairs,
        luma_hist,
    )
    from crawler_spark.sources.synth import T1_SMOKE

    urls = [f"http://host-0.test/p0/d0/img-{i}" for i in range(48)]
    rows = [
        (r["image_id"], r["bytes"], r["fmt"])
        for r in (T1_SMOKE.payload(u) for u in urls)
    ]
    variants = []
    for image_id, data, fmt in rows[:16]:
        px = decode(data, fmt).astype(np.int16)
        px = np.clip(px + 1, 0, 255)  # brightness twin
        variants.append(
            (image_id + "-v", encode(px.astype(np.uint8), "png"), "png")
        )
    images = spark.createDataFrame(
        rows + variants, "image_id string, bytes binary, fmt string"
    )
    return hist_intersection_pairs(luma_hist(images), min_intersection=0.9)


def q_image_dedup_cross_wave(spark, sf_dir):
    """Incremental image dedup, the shape a production crawl runs
    every wave: THIS wave's decoded image hashes probed against the
    persisted all-time signature catalog with the asymmetric banded
    Hamming join (operators/dedup.py hamming64_join) — O(|wave|) work
    per round, never a self-join over history. Wave B mixes
    +1-brightness re-uploads of catalog images (Hamming <= 3 after
    lossless roundtrip) with genuinely new images; output classifies
    every wave-B image as dup-of-catalog (best match: min hamming,
    then min catalog id) or new. No SQL oracle (binary codec);
    rows-only — brute-force parity pytest in tests/test_flipsig.py."""
    import numpy as np

    from crawler_spark.functions.codecs import decode, encode
    from crawler_spark.operators.dedup import hamming64_join
    from crawler_spark.operators.multimodal import decode_stats
    from crawler_spark.sources.synth import T1_SMOKE

    urls = [f"http://host-0.test/p0/d0/img-{i}" for i in range(48)]
    rows = [
        (r["image_id"], r["bytes"], r["fmt"])
        for r in (T1_SMOKE.payload(u) for u in urls)
    ]
    wave_b = []
    for image_id, data, fmt in rows[:12]:  # re-uploads of catalog images
        px = decode(data, fmt).astype(np.int16)
        px = np.clip(px + 1, 0, 255)
        wave_b.append(
            (image_id + "-b", encode(px.astype(np.uint8), "png"), "png")
        )
    fresh_urls = [f"http://host-1.test/p0/d0/img-{i}" for i in range(12)]
    wave_b += [
        (r["image_id"] + "-b", r["bytes"], r["fmt"])
        for r in (T1_SMOKE.payload(u) for u in fresh_urls)
    ]
    mk = lambda r: spark.createDataFrame(  # noqa: E731
        r, "image_id string, bytes binary, fmt string"
    )
    catalog = decode_stats(mk(rows)).select("image_id", "phash")
    probe = decode_stats(mk(wave_b)).select("image_id", "phash")
    hits = hamming64_join(
        probe, catalog, id_col="image_id", sig_col="phash", max_hamming=3
    )
    best = Window.partitionBy("probe_id").orderBy("hamming", "index_id")
    top = (
        hits.withColumn("rn", F.row_number().over(best))
        .filter(F.col("rn") == 1)
        .select("probe_id", "index_id", "hamming")
    )
    return (
        probe.select(F.col("image_id").alias("probe_id"))
        .join(top, "probe_id", "left")
        .select(
            F.col("probe_id").alias("image_id"),
            F.col("index_id").alias("dup_of"),
            "hamming",
            F.col("index_id").isNull().alias("is_new"),
        )
    )


def q_image_flip_dedup(spark, sf_dir):
    """Orientation-invariant image dedup: mirrored and rotated-180
    re-uploads scatter a plain pHash to ~random Hamming distance, so a
    dedup pass keyed on it misses them entirely. flip_canonical_sigs
    (multimodal.py) emits the min-over-4-orientations canonical hash
    (codecs.flip_min_phash64) next to the plain one in a single decode
    pass; banded Hamming<=3 over the canonical column then recalls
    every planted fliplr/flipud/rot180 twin at distance 0, while the
    plain-hash distance (joined alongside) documents what a naive pass
    would have seen. No SQL oracle (binary codec); rows-only —
    exactness is pytest-asserted (tests/test_flipsig.py)."""
    from crawler_spark.functions.codecs import decode, encode
    from crawler_spark.operators.dedup import hamming64_pairs
    from crawler_spark.operators.multimodal import flip_canonical_sigs
    from crawler_spark.sources.synth import T1_SMOKE

    urls = [f"http://host-0.test/p0/d0/img-{i}" for i in range(48)]
    rows = [
        (r["image_id"], r["bytes"], r["fmt"])
        for r in (T1_SMOKE.payload(u) for u in urls)
    ]
    variants = []
    for j, (image_id, data, fmt) in enumerate(rows[:18]):
        px = decode(data, fmt)
        flipped = (
            px[:, ::-1] if j % 3 == 0 else px[::-1, :] if j % 3 == 1
            else px[::-1, ::-1]
        )
        variants.append(
            (image_id + "-m", encode(flipped.copy(), "png"), "png")
        )
    images = spark.createDataFrame(
        rows + variants, "image_id string, bytes binary, fmt string"
    )
    sigs = flip_canonical_sigs(images)
    cand = hamming64_pairs(
        sigs, id_col="image_id", sig_col="flip_phash", max_hamming=3,
        n_bands=8,
    )
    plain = sigs.select(F.col("image_id"), F.col("phash"))
    return (
        cand.join(
            plain.select(
                F.col("image_id").alias("doc_a"), F.col("phash").alias("pa")
            ),
            "doc_a",
        )
        .join(
            plain.select(
                F.col("image_id").alias("doc_b"), F.col("phash").alias("pb")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("hamming").alias("canonical_hamming"),
            F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))).alias(
                "plain_hamming"
            ),
        )
    )


def q_image_rot_dedup(spark, sf_dir):
    """Full-dihedral image dedup: 90°/270° rotations and transposes
    swap the aspect ratio, so even the flip-canonical hash scatters
    them — codecs.dihedral_min_phash64 folds the whole 8-element D4
    orbit into one signature in the same decode pass
    (multimodal.dihedral_canonical_sigs). Banded Hamming<=3 over
    ``d4_phash`` recalls every planted rot90/rot270/transpose twin at
    distance 0; flip- and plain-hash distances ride along to attribute
    each catch. No SQL oracle (binary codec); rows-only — exactness is
    pytest-asserted (tests/test_flipsig.py)."""
    import numpy as np

    from crawler_spark.functions.codecs import decode, encode
    from crawler_spark.operators.dedup import hamming64_pairs
    from crawler_spark.operators.multimodal import dihedral_canonical_sigs
    from crawler_spark.sources.synth import T1_SMOKE

    urls = [f"http://host-0.test/p0/d0/rimg-{i}" for i in range(36)]
    rows = [
        (r["image_id"], r["bytes"], r["fmt"])
        for r in (T1_SMOKE.payload(u) for u in urls)
    ]
    variants = []
    for j, (image_id, data, fmt) in enumerate(rows[:12]):
        px = decode(data, fmt)
        rot = (
            np.rot90(px) if j % 3 == 0
            else np.rot90(px, 3) if j % 3 == 1
            else px.T
        )
        variants.append((image_id + "-r", encode(rot.copy(), "png"), "png"))
    images = spark.createDataFrame(
        rows + variants, "image_id string, bytes binary, fmt string"
    )
    sigs = dihedral_canonical_sigs(images)
    cand = hamming64_pairs(
        sigs, id_col="image_id", sig_col="d4_phash", max_hamming=3, n_bands=8
    )
    other = sigs.select("image_id", "phash", "flip_phash")
    return (
        cand.join(
            other.select(
                F.col("image_id").alias("doc_a"),
                F.col("phash").alias("pa"),
                F.col("flip_phash").alias("fa"),
            ),
            "doc_a",
        )
        .join(
            other.select(
                F.col("image_id").alias("doc_b"),
                F.col("phash").alias("pb"),
                F.col("flip_phash").alias("fb"),
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("hamming").alias("d4_hamming"),
            F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))).alias(
                "flip_hamming"
            ),
            F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))).alias(
                "plain_hamming"
            ),
        )
    )


# --------------------------------------------------------------------------
# text analysis (documents)
# --------------------------------------------------------------------------

def q_lang_id(spark, sf_dir):
    from crawler_spark.functions.text import lang_id

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", "lang", lang_id(F.col("text")).alias("lang_pred")
    ).withColumn("agree", (F.col("lang") == F.col("lang_pred")).cast("int").cast("long"))


def q_quality_scores(spark, sf_dir):
    from crawler_spark.functions.text import quality_score

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score(F.col("text")).alias("quality"))


def q_quality_tradeoff(spark, sf_dir):
    """The quality-vs-quantity curve every curation run draws before
    picking a threshold: for each candidate cutoff, how many documents
    and what fraction of the corpus token mass survive. One scoring
    scan; the 10-threshold rollup here is a tagged explode for oracle
    clarity — at 100 TB it collapses to ten conditional sums in a
    single aggregate (no row blowup), same results."""
    from crawler_spark.functions.text import quality_score, token_count

    d = _t(spark, sf_dir, "documents").select(
        quality_score(F.col("text")).alias("quality"),
        token_count(F.col("text")).cast("long").alias("n_tok"),
    )
    ts = [i / 10.0 for i in range(10)]
    tagged = d.select(
        "quality",
        "n_tok",
        F.explode(F.array(*[F.lit(t) for t in ts])).alias("threshold"),
    )
    tot = d.agg(F.sum("n_tok").cast("double").alias("tot_tok"))
    kept = F.col("quality") >= F.col("threshold")
    return (
        tagged.groupBy("threshold")
        .agg(
            F.sum(kept.cast("long")).alias("n_docs"),
            F.sum(F.when(kept, F.col("n_tok")).otherwise(F.lit(0))).alias(
                "tokens_kept"
            ),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "threshold",
            "n_docs",
            "tokens_kept",
            _pin(F.col("tokens_kept") / F.col("tot_tok"), 6).alias("token_frac"),
        )
    )


def q_image_curriculum(spark, sf_dir):
    """Image-side curriculum staging: cut the pair corpus into 4
    resolution quartiles (stage 1 = highest-megapixel, trained last in
    a low-to-high-res schedule) with per-stage image counts, mean
    megapixels, and caption token mass — the manifest a progressive-
    resolution trainer consumes. Same scale recipe as
    curriculum_stages: EXACT percentile cuts broadcast back (two
    distributed passes, never a global ntile sort)."""
    from crawler_spark.operators.pairs import synth_pair_meta

    m = synth_pair_meta(_t(spark, sf_dir, "documents")).select(
        "image_id", (F.col("w").cast("long") * F.col("h")).alias("px"), "n_tokens"
    )
    cuts = m.agg(
        F.round(F.expr("percentile(px, 0.25)"), 9).alias("c1"),
        F.round(F.expr("percentile(px, 0.5)"), 9).alias("c2"),
        F.round(F.expr("percentile(px, 0.75)"), 9).alias("c3"),
    )
    staged = m.crossJoin(F.broadcast(cuts)).withColumn(
        "stage",
        F.when(F.col("px") >= F.col("c3"), F.lit(1))
        .when(F.col("px") >= F.col("c2"), F.lit(2))
        .when(F.col("px") >= F.col("c1"), F.lit(3))
        .otherwise(F.lit(4)),
    )
    return staged.groupBy("stage").agg(
        F.count("*").alias("n_images"),
        # integer-space mean (sum(px) and count are exact; ONE division)
        # — a float avg would be partial-aggregation-order dependent
        _pin(
            F.sum("px") / (F.count("*") * F.lit(1048576.0)), 6
        ).alias("mean_mpx"),
        F.sum("n_tokens").alias("caption_tokens"),
    )


def q_host_concentration(spark, sf_dir):
    """Corpus diversity dashboard: the Herfindahl-Hirschman index of
    host shares plus top-1/top-3 shares — the one-row check that a
    crawl isn't quietly becoming three domains' mirror. HHI is computed
    in INTEGER space (sum of squared counts over total squared) so no
    float summation order exists to diverge; the host histogram is
    dimension-sized."""
    f = _frontier(spark, sf_dir)
    per_host = f.groupBy("host").agg(F.count("*").alias("n"))
    tot = per_host.agg(
        F.count("*").alias("n_hosts"),
        F.sum("n").alias("total"),
        F.sum(F.col("n") * F.col("n")).alias("sum_sq"),
    )
    top3 = (
        per_host.orderBy(F.desc("n"), "host")
        .limit(3)
        .agg(F.sum("n").alias("top3_n"), F.max("n").alias("top1_n"))
    )
    return (
        tot.crossJoin(F.broadcast(top3))
        .select(
            "n_hosts",
            "total",
            _pin(F.col("sum_sq") / (F.col("total") * F.col("total")), 6).alias(
                "hhi"
            ),
            _pin(F.col("top1_n") / F.col("total"), 6).alias("top1_share"),
            _pin(F.col("top3_n") / F.col("total"), 6).alias("top3_share"),
        )
    )


def q_pii_redaction(spark, sf_dir):
    """PII scrubbing (the mandatory pre-training pass): regex-redact
    emails, E.164-ish phone numbers, and IPv4 addresses, reporting
    per-doc hit counts and the redacted length. The corpus is clean by
    construction, so deterministic synthetic PII is appended to a
    md5-chosen subset first — the redactor must find exactly what was
    planted (count columns double as the oracle's proof of recall).
    One native regexp chain, no UDF."""
    d8 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 8, 1)) - 1)"
    email_re = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
    phone_re = r"\+[0-9]{11}"
    ip_re = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
    d = _t(spark, sf_dir, "documents")
    seeded = d.select(
        "doc_id",
        F.expr(
            f"""CASE {d8} % 4
                WHEN 0 THEN concat(text, ' contact user', doc_id,
                            '@example.com now')
                WHEN 1 THEN concat(text, ' call +1555', lpad(cast(doc_id % 10000000 as string), 7, '0'))
                WHEN 2 THEN concat(text, ' from 10.', doc_id % 256, '.0.',
                            (doc_id * 7) % 256)
                ELSE text
            END"""
        ).alias("text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), email_re, "<EMAIL>"),
            phone_re,
            "<PHONE>",
        ),
        ip_re,
        "<IP>",
    )
    return seeded.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(email_re), F.lit(0)))
        .cast("int")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(phone_re), F.lit(0)))
        .cast("int")
        .alias("n_phones"),
        F.size(F.regexp_extract_all("text", F.lit(ip_re), F.lit(0)))
        .cast("int")
        .alias("n_ips"),
        F.length(redacted).cast("long").alias("redacted_len"),
    )


def q_contamination_check(spark, sf_dir):
    """Benchmark-contamination check (the eval-hygiene pass): flag
    training documents sharing any word 8-gram with the eval set (here:
    docs 0-49 stand in as the benchmark — 8-grams flag exactly the true
    near-duplicates, no false positives on this corpus). Eval grams broadcast (eval
    sets are tiny next to the corpus); the join runs on the gram hash;
    output is per-contaminated-doc overlap counts."""
    from crawler_spark.operators.dedup import _shingles

    d = _t(spark, sf_dir, "documents")
    grams = _shingles(d, "text", "doc_id", n=8)
    eval_grams = (
        grams.filter(F.col("doc_id") < 50).select("shingle").distinct()
    )
    return (
        grams.filter(F.col("doc_id") >= 50)
        .join(F.broadcast(eval_grams), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
    )


def q_gopher_flags(spark, sf_dir):
    """Gopher-rule pre-training gate (word-count bounds, mean word
    length band, lexical diversity, stopword presence) — one
    shuffle-free native-array pass per document."""
    from crawler_spark.functions.text import gopher_stats

    d = _t(spark, sf_dir, "documents")
    s = gopher_stats(F.col("text"))
    return d.select(
        "doc_id",
        s["n_words"].cast("int").alias("n_words"),
        s["mean_word_len"].alias("mean_word_len"),
        s["distinct_ratio"].alias("distinct_ratio"),
        s["stop_hits"].cast("int").alias("stop_hits"),
        s["pass_gopher"].alias("pass_gopher"),
    )


def q_repetition_stats(spark, sf_dir):
    """Gopher's repetition signal: the fraction of a document's word
    bigrams taken by its single most frequent bigram — high values mark
    boilerplate/spam. Explode -> two-level agg; bigram counts partial-
    aggregate map-side, so the shuffle carries (doc, bigram) partials,
    not raw grams. Token array projected once before the lambda (no CSE
    inside higher-order functions — else split() re-runs per gram)."""
    ws = F.col("__ws")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(ws) - 1),
        lambda i: F.concat_ws(" ", F.slice(ws, i, 2)),
    )
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.split(F.lower(F.trim(F.col("text"))), "\\s+").alias("__ws"),
        )
        .filter(F.size(ws) >= 2)
        .select("doc_id", F.explode(grams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            F.round(F.max("cnt") / F.sum("cnt"), 6).alias("top_bigram_ratio"),
        )
    )


def q_repetition_suite(spark, sf_dir):
    """The FULL Gopher repetition battery (Rae et al. 2021 §A1.1), not
    just the top-bigram signal: per document, the fraction of 3-grams /
    4-grams taken by the single most frequent one, plus the fraction of
    characters contained in duplicated 5-grams (5-grams occurring >= 2
    times in the doc). One scan: the three gram families are tagged
    structs flattened into ONE explode (no union re-scan), then two
    grouped aggregations — (doc, n, gram) counts partial-aggregate
    map-side, so the shuffle carries counted grams, not raw gram
    occurrences. Token array projected once before the lambdas (no CSE
    inside higher-order functions)."""
    ws = F.col("__ws")

    def gram_structs(n: int):
        # guard: sequence(1, size-(n-1)) DESCENDS when size < n
        return F.when(
            F.size(ws) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(ws) - (n - 1)),
                lambda i: F.struct(
                    F.lit(n).alias("n"),
                    F.concat_ws(" ", F.slice(ws, i, n)).alias("gram"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<n:int,gram:string>>"))

    d = _t(spark, sf_dir, "documents")
    per_n = (
        d.select(
            "doc_id",
            F.split(F.lower(F.trim(F.col("text"))), "\\s+").alias("__ws"),
        )
        .select(
            "doc_id",
            F.explode(
                F.flatten(F.array(gram_structs(3), gram_structs(4), gram_structs(5)))
            ).alias("g"),
        )
        .select("doc_id", F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
        .groupBy("doc_id", "n", "gram")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id", "n")
        .agg(
            (F.max("cnt") / F.sum("cnt")).alias("top_ratio"),
            (
                F.sum(
                    F.when(F.col("cnt") >= 2, F.length("gram") * F.col("cnt")).otherwise(
                        F.lit(0)
                    )
                )
                / F.sum(F.length("gram") * F.col("cnt"))
            ).alias("dup_char_frac"),
        )
    )
    top = lambda n: F.max(F.when(F.col("n") == n, F.col("top_ratio")))  # noqa: E731
    return per_n.groupBy("doc_id").agg(
        _pin(top(3), 6).alias("top3_ratio"),
        _pin(top(4), 6).alias("top4_ratio"),
        _pin(F.max(F.when(F.col("n") == 5, F.col("dup_char_frac"))), 6).alias(
            "dup5_char_frac"
        ),
    )


def q_repetition_mapside(spark, sf_dir):
    """ZERO-shuffle twin of `repetition_suite`: identical per-document
    top-3/4-gram ratios and duplicated-5-gram char fraction, computed
    from one row of array state (sorted-adjacent folds,
    functions/text.repetition_signals_mapside) instead of exploding
    (doc, gram) partials through a shuffle. Same oracle — the values
    are defined to be equal; the bench compares the two plans."""
    from crawler_spark.functions.text import repetition_gate_mapside

    d = _t(spark, sf_dir, "documents")
    return (
        repetition_gate_mapside(d, "text", "doc_id")
        .filter(F.col("n_words") >= 3)
        .drop("n_words")
    )


def q_sequence_packing(spark, sf_dir):
    """LLM training sequence packing: assign documents to fixed
    token-budget bins (budget 512) with greedy next-fit over a running
    token sum, decreasing-size order, inside 32 parallel hash buckets —
    the distributed form of first-fit-decreasing (each bucket packs
    independently; the straddling doc overflows its bin, as real packers
    truncate). Output: per-bin fill statistics."""
    from crawler_spark.functions.text import token_count

    budget = 512
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        (F.col("doc_id") % 32).alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy(F.desc("n_tokens"), "doc_id")
    return (
        d.withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn(
            "bin_id",
            F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(float(budget))).cast(
                "long"
            ),
        )
        .groupBy("bucket", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("tokens_packed"),
            F.round(F.sum("n_tokens") / F.lit(float(budget)), 6).alias("fill_ratio"),
        )
    )


def q_shard_skew(spark, sf_dir):
    """Packing-quality report over the sequence_packing manifest: fill
    percentiles (p10/p50/p90), min/max, and the Gini coefficient of
    bin fills — the number that says whether the trainer's shards are
    balanced or one straggler bin will pace every epoch. The manifest
    is bins-sized (thousands of rows at any corpus scale), so the
    global rank window is safe; Gini uses the sorted-rank formula with
    DECIMAL-exact sums (order-independent), one final division."""
    bins = q_sequence_packing(spark, sf_dir)
    w = Window.orderBy("fill_ratio", "bucket", "bin_id")
    ranked = bins.select(
        F.col("fill_ratio").cast("decimal(20,6)").alias("x"),
        "fill_ratio",
        F.row_number().over(w).alias("i"),
    )
    agg = ranked.agg(
        F.count("*").alias("n_bins"),
        F.round(F.expr("percentile(fill_ratio, 0.1)"), 6).alias("p10_fill"),
        F.round(F.expr("percentile(fill_ratio, 0.5)"), 6).alias("p50_fill"),
        F.round(F.expr("percentile(fill_ratio, 0.9)"), 6).alias("p90_fill"),
        F.min("fill_ratio").alias("min_fill"),
        F.max("fill_ratio").alias("max_fill"),
        F.sum("x").alias("sum_x"),
        F.sum(F.col("i") * F.col("x")).alias("sum_ix"),
    )
    gini = (
        (F.lit(2) * F.col("sum_ix") - (F.col("n_bins") + 1) * F.col("sum_x"))
        .cast("double")
        / (F.col("n_bins") * F.col("sum_x")).cast("double")
    )
    return agg.select(
        "n_bins", "p10_fill", "p50_fill", "p90_fill", "min_fill", "max_fill",
        _pin(gini, 6).alias("gini"),
    )


def q_training_shards(spark, sf_dir):
    """End-to-end corpus shard manifest in ONE plan: Gopher-rule gate ->
    exact dedup (first-wins by normalized-text fingerprint) -> token
    packing into 512-token bins inside 16 hash buckets -> per-shard
    manifest (docs, tokens, fill). The composition every pre-training
    data build runs; here it is a single Catalyst plan (the gate's
    array expressions, the dedup's one groupBy+semi-join shuffle, the
    packing window) — no intermediate materialization."""
    from crawler_spark.functions.text import fingerprint, gopher_stats, token_count

    budget = 512
    d = _t(spark, sf_dir, "documents")
    s = gopher_stats(F.col("text"))
    gated = d.filter(s["pass_gopher"]).select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        fingerprint(F.col("text")).alias("fp"),
    )
    keep = gated.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    deduped = gated.join(keep, ["fp", "doc_id"], "left_semi")
    w = Window.partitionBy("bucket").orderBy(F.desc("n_tokens"), "doc_id")
    return (
        deduped.withColumn("bucket", F.col("doc_id") % 16)
        .withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn(
            "bin_id",
            F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(float(budget))).cast(
                "long"
            ),
        )
        .groupBy("bucket", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("tokens_packed"),
        )
    )


def q_join_key_skew(spark, sf_dir):
    """Join-key skew report over the fact tables' join columns: rows,
    distinct keys, the hottest key's row share, and max/avg frequency
    ratio — the numbers that decide whether a join needs salting or AQE
    skew handling (operators/skew.py) before it ships. One grouped
    count per column, rolled up to a single row each."""
    def profile(df, col):
        freq = df.groupBy(F.col(col).alias("k")).agg(F.count("*").alias("n"))
        return freq.agg(
            F.lit(col).alias("join_col"),
            F.sum("n").alias("n_rows"),
            F.count("*").alias("n_keys"),
            F.round(F.max("n") / F.sum("n"), 6).alias("top_key_share"),
            F.round(F.max("n") / F.avg("n"), 6).alias("max_avg_ratio"),
        )

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    ev = _t(spark, sf_dir, "events")
    return (
        profile(li, "l_partkey")
        .unionByName(profile(li, "l_suppkey"))
        .unionByName(profile(o, "o_custkey"))
        .unionByName(profile(ev, "user_id"))
    )


def q_corpus_health(spark, sf_dir):
    """One-row corpus health report: doc count, exact-dup rate
    (fingerprint multiplicity), Gopher-gate pass rate, and language
    entropy in nats — the dashboard a data-curation team watches per
    ingestion batch. Everything reduces through map-side-combinable
    aggregates; the entropy sums over the (tiny) language histogram."""
    from crawler_spark.functions.text import fingerprint, gopher_stats

    d = _t(spark, sf_dir, "documents")
    s = gopher_stats(F.col("text"))
    base = d.select(
        "lang",
        fingerprint(F.col("text")).alias("fp"),
        s["pass_gopher"].cast("int").alias("passes"),
    )
    core = base.agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("fp").alias("n_unique"),
        F.sum("passes").alias("n_pass"),
    )
    lang_h = (
        base.groupBy("lang")
        .agg(F.count("*").cast("double").alias("n"))
        .crossJoin(F.broadcast(core.select("n_docs")))
        .select((F.col("n") / F.col("n_docs")).alias("p"))
        .agg((-F.sum(F.col("p") * F.log("p"))).alias("lang_entropy"))
    )
    return core.crossJoin(F.broadcast(lang_h)).select(
        "n_docs",
        F.round(
            (F.col("n_docs") - F.col("n_unique")) / F.col("n_docs"), 6
        ).alias("dup_rate"),
        F.round(F.col("n_pass") / F.col("n_docs"), 6).alias("gopher_pass_rate"),
        F.round("lang_entropy", 6).alias("lang_entropy"),
    )


def q_null_safe_match(spark, sf_dir):
    """Null-safe join semantics (<=> / IS NOT DISTINCT FROM): a
    nullable derived key (json k mod 7, the 0 residue nulled out)
    grouped on both halves of the events table, joined null-safely so
    the NULL group matches itself — the semantic corner where a plain
    equality join silently drops rows. Grouped-then-joined, so the
    null-safe comparison runs on |keys| rows, not the fact table."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.nullif(
            F.get_json_object("props", "$.k").cast("long") % 7,
            F.lit(0),
        ).alias("k"),
    )
    left = ev.filter(F.col("event_id") % 2 == 0).groupBy("k").agg(
        F.count("*").alias("n_left")
    )
    right = ev.filter(F.col("event_id") % 2 == 1).groupBy("k").agg(
        F.count("*").alias("n_right")
    )
    return (
        left.alias("l")
        .join(F.broadcast(right.alias("r")), F.col("l.k").eqNullSafe(F.col("r.k")))
        .select(
            F.col("l.k").alias("k"),
            "n_left",
            "n_right",
            (F.col("n_left") * F.col("n_right")).alias("n_pairs"),
        )
    )


def q_retention_cohorts(spark, sf_dir):
    """Weekly retention matrix: users bucketed by first-seen week
    (cohort), counted as active per later week offset — the engagement
    table every events pipeline serves. First-seen is one grouped min;
    the cohort join is broadcast (cohort table = |users|, small next to
    events); week arithmetic via integer epoch-day division (no
    calendar-week function disagreements between engines)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.floor(F.unix_timestamp("ts") / (7 * 86400)).alias("week")
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        ev.join(F.broadcast(first), "user_id")
        .select("user_id", "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_active"))
    )


def q_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences: lag window partitioned by user (ordered by ts with
    event_id tie-break for determinism), then one count + conditional
    probability rollup — the session-flow model behind next-event
    prediction and bot detection."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count("*").alias("n")
    )
    w2 = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(w2), 6).alias("p"),
    )


def q_event_funnel(spark, sf_dir):
    """Ordered funnel (view -> click -> purchase): per user, the first
    view, the first click strictly after it, the first purchase
    strictly after that — three conditional-min aggregations over ONE
    grouped pass (no self-joins: each stage's timestamp is a min over a
    when() of the previous stage's, computed via two chained tiny
    aggs), then stage conversion counts."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    first_view = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    clicks = ev.filter(F.col("event_type") == "click").join(first_view, "user_id")
    first_click = (
        clicks.filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"), F.min("t_view").alias("t_view"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").join(
        first_click, "user_id"
    )
    first_purchase = (
        purchases.filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        first_view.agg(F.count("*").alias("n"))
        .select(F.lit("1_view").alias("stage"), "n")
        .unionByName(
            first_click.agg(F.count("*").alias("n")).select(
                F.lit("2_click_after_view").alias("stage"), "n"
            )
        )
        .unionByName(
            first_purchase.agg(F.count("*").alias("n")).select(
                F.lit("3_purchase_after_click").alias("stage"), "n"
            )
        )
    )


def q_token_stats(spark, sf_dir):
    from crawler_spark.functions.text import subword_count, token_count

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        subword_count(F.col("text")).cast("long").alias("n_subwords"),
    )


def q_fingerprints(spark, sf_dir):
    from crawler_spark.functions.text import fingerprint

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint(F.col("text")).alias("fp"))


def q_corpus_select(spark, sf_dir):
    """End-to-end training-corpus selection — the composition a real
    LLM-data pipeline runs per batch: language-ID -> quality gate ->
    token floor -> exact-dedup survivor (first-wins keep list). All
    native expressions; the keep list lands as a LEFT SEMI join (at
    corpus scale that is one hash shuffle keyed by doc_id, no column
    duplication, and the filters prune before the join)."""
    from crawler_spark.functions.text import lang_id, quality_score, token_count
    from crawler_spark.operators.dedup import dedup_exact

    d = _t(spark, sf_dir, "documents")
    keep = dedup_exact(d).select(F.col("keep_id").alias("doc_id"))
    scored = d.select(
        "doc_id",
        lang_id(F.col("text")).alias("lang_pred"),
        quality_score(F.col("text")).alias("quality"),
        token_count(F.col("text")).cast("long").alias("n_tokens"),
    ).filter(
        (F.col("lang_pred") != "und")
        & (F.col("quality") >= 0.55)
        & (F.col("n_tokens") >= 5)
    )
    return scored.join(keep, "doc_id", "left_semi")


def q_vocab_topk(spark, sf_dir):
    """Corpus vocabulary top-50 (tokenizer-training / data-mixing pass):
    TakeOrdered over map-side-combined token counts."""
    from crawler_spark.operators.corpus import vocab_topk

    return vocab_topk(_t(spark, sf_dir, "documents"), k=50)


def q_hll_distinct(spark, sf_dir):
    """HyperLogLog vocabulary-cardinality estimate vs exact distinct —
    the O(m)-state sketch a 100 TB corpus uses instead of a full
    distinct shuffle. Integer-scaled harmonic denominator makes the
    estimate order-independent (operators/sketches.py)."""
    from crawler_spark.operators.corpus import _tokens
    from crawler_spark.operators.sketches import hll_estimate, hll_registers

    toks = _tokens(_t(spark, sf_dir, "documents"), "text", "doc_id").select("tok")
    est = hll_estimate(hll_registers(toks, "tok"))
    exact = toks.agg(F.countDistinct("tok").alias("exact_distinct"))
    return (
        est.crossJoin(F.broadcast(exact))
        .select(
            F.floor(F.col("hll_estimate")).cast("long").alias("hll_floor"),
            "exact_distinct",
            F.floor(
                F.abs(F.col("hll_estimate") - F.col("exact_distinct"))
                / F.col("exact_distinct")
                * 1000.0
            ).alias("rel_err_permille"),
        )
    )


def q_countmin_heavy_hitters(spark, sf_dir):
    """Count-Min frequency estimates for the heavy vocabulary (exact
    count >= 200): est >= exact always; the d*w-cell grid broadcasts so
    the probe join never shuffles the token set."""
    from crawler_spark.operators.corpus import _tokens
    from crawler_spark.operators.sketches import countmin_build, countmin_estimate

    toks = _tokens(_t(spark, sf_dir, "documents"), "text", "doc_id").select("tok")
    sketch = countmin_build(toks, "tok")
    heavy = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_cnt")).filter(
        F.col("exact_cnt") >= 200
    )
    est = countmin_estimate(sketch, heavy.select("tok"), "tok")
    return heavy.join(est, "tok").select(
        "tok", "exact_cnt", "cm_est", (F.col("cm_est") - F.col("exact_cnt")).alias("overcount")
    )


def q_bpe_merge_pairs(spark, sf_dir):
    """First-round BPE merge statistics: top-20 adjacent char pairs over
    all token occurrences (operators/corpus.py:bpe_merge_candidates)."""
    from crawler_spark.operators.corpus import bpe_merge_candidates

    return bpe_merge_candidates(_t(spark, sf_dir, "documents"), k=20)


def q_tfidf_top(spark, sf_dir):
    """Most salient token per doc by TF-IDF (ln(N/df), round-6 pinned,
    deterministic tie-breaks)."""
    from crawler_spark.operators.corpus import tfidf_top_token

    return tfidf_top_token(_t(spark, sf_dir, "documents"))


def q_lm_perplexity(spark, sf_dir):
    """CCNet-style LM quality filter: add-0.5 smoothed corpus unigram
    LM, per-doc avg token log-prob + perplexity (decimal-exact sums,
    hash-stable)."""
    from crawler_spark.operators.corpus import lm_perplexity_scores

    return lm_perplexity_scores(_t(spark, sf_dir, "documents"))


def q_ccnet_buckets(spark, sf_dir):
    """CCNet's head/middle/tail corpus partitioning (Wenzek et al.
    2020): score every document with the corpus LM perplexity, then
    split EACH LANGUAGE into exact perplexity tertiles — head (most
    fluent third) is what pre-training keeps first, tail is inspected
    or dropped. Cuts are exact interpolated percentiles per language
    (Spark `percentile` == DuckDB quantile_cont bit-for-bit, verified
    by latency_percentiles); the cut table is language-sized and
    broadcast back, so the corpus is never re-shuffled for bucketing.
    At 100 TB the exact percentile swaps to approx_percentile per
    language at a documented error bound."""
    from crawler_spark.operators.corpus import lm_perplexity_scores

    d = _t(spark, sf_dir, "documents")
    scored = lm_perplexity_scores(d).join(d.select("doc_id", "lang"), "doc_id")
    third = "cast(1 as double)/3"
    cuts = scored.groupBy("lang").agg(
        F.expr(f"percentile(ppl, {third})").alias("t1"),
        F.expr(f"percentile(ppl, 2*({third}))").alias("t2"),
    )
    return scored.join(F.broadcast(cuts), "lang").select(
        "doc_id",
        "lang",
        "ppl",
        F.when(F.col("ppl") <= F.col("t1"), F.lit("head"))
        .when(F.col("ppl") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def q_bm25_topk(spark, sf_dir):
    """Okapi BM25 top-20 for a fixed 4-term query (Lucene idf form,
    k1=1.2 b=0.75): the retrieval scorer behind targeted corpus
    curation. Query-term filter cuts the tf relation before any
    shuffle; df/avgdl ride as broadcast scalars; top-k is TakeOrdered."""
    from crawler_spark.operators.corpus import bm25_topk

    return bm25_topk(
        _t(spark, sf_dir, "documents"),
        query_terms=["join", "hash", "vector", "stream"],
        k=20,
    )


def q_bigram_pmi(spark, sf_dir):
    """Collocation mining: top-20 bigrams by PMI (min count 5) — phrase
    / tokenizer-merge discovery with broadcast unigram joins and
    broadcast scalar totals."""
    from crawler_spark.operators.corpus import bigram_pmi_topk

    return bigram_pmi_topk(_t(spark, sf_dir, "documents"), k=20, min_count=5)


def q_inverted_index(spark, sf_dir):
    """Inverted-index construction: per token df >= 2 plus a
    deterministic posting sample (first 10 doc ids ascending) —
    sort_array before slice makes the sample reproducible across
    cluster sizes despite collect_list's nondeterministic order."""
    from crawler_spark.operators.corpus import inverted_index

    return inverted_index(_t(spark, sf_dir, "documents"), max_postings=10, min_df=2)


def q_lang_mixture(spark, sf_dir):
    """Training-mixture sampling weights per language (temperature
    alpha=0.3): the data-mixing pass before corpus assembly."""
    from crawler_spark.operators.corpus import lang_mixture_weights

    return lang_mixture_weights(_t(spark, sf_dir, "documents"), alpha=0.3)


def q_stratified_sample(spark, sf_dir):
    """Deterministic hash-gated stratified downsample (en 50%, de 25%,
    rest 10%): reproducible across reruns and cluster sizes, unlike
    partition-seeded df.sample()."""
    from crawler_spark.operators.corpus import stratified_sample

    return stratified_sample(
        _t(spark, sf_dir, "documents"),
        rates={"en": 0.5, "de": 0.25},
        default_rate=0.1,
    )


def q_image_pairs_select(spark, sf_dir):
    """LAION-style image+caption pair curation over the north-rule pair
    table shape: resolution floor, aspect band, caption-token floor,
    exact-phash first-wins dedup. Metadata-only (bytes never read)."""
    from crawler_spark.operators.pairs import select_training_pairs, synth_pair_meta

    meta = synth_pair_meta(_t(spark, sf_dir, "documents"))
    return select_training_pairs(meta)


def q_pair_corpus_stats(spark, sf_dir):
    """Pair-curation dashboard: counts + mean resolution/caption length
    per (fmt, orientation), one map-side-combinable aggregation."""
    from crawler_spark.operators.pairs import pair_corpus_stats, synth_pair_meta

    meta = synth_pair_meta(_t(spark, sf_dir, "documents"))
    return pair_corpus_stats(meta)


def q_caption_alignment(spark, sf_dir):
    """CLIP-score-shaped pair filter: rowwise cosine between the stored
    image embedding (first 32 dims) and a deterministic 32-dim caption
    projection, thresholded at 0.05 on the round-6 score. The join,
    zip_with dot product and aggregate folds are the real pipeline's
    plan; only the caption encoder is the deterministic stand-in."""
    from crawler_spark.operators.pairs import caption_alignment

    return caption_alignment(
        _t(spark, sf_dir, "documents"), _t(spark, sf_dir, "embeddings")
    )


def q_ar_bucket_batches(spark, sf_dir):
    """Aspect-ratio bucket batching: five exact integer-arithmetic AR
    bands, fixed-size batches in image_id order per band, one manifest
    row per batch."""
    from crawler_spark.operators.pairs import ar_bucket_batches, synth_pair_meta

    meta = synth_pair_meta(_t(spark, sf_dir, "documents"))
    return ar_bucket_batches(meta, batch_size=32)


def q_caption_stats_by_resolution(spark, sf_dir):
    """Image-curation diagnostic: caption token statistics per
    resolution band (megapixel log2 bucket) and format — the join of
    quality thresholds to image size a LAION-style filter is tuned
    from. Bucket = length(bin(w*h))-1 (integer-safe log2)."""
    from crawler_spark.operators.pairs import synth_pair_meta

    meta = synth_pair_meta(_t(spark, sf_dir, "documents"))
    return (
        meta.withColumn(
            "res_bucket",
            F.expr("length(bin(cast(w as bigint) * h)) - 1").cast("int"),
        )
        .groupBy("fmt", "res_bucket")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


def q_pair_caption_canonical(spark, sf_dir):
    """Cross-page caption consolidation (LAION/DataComp label-noise
    merge): each synthetic image is referenced by 7 pages carrying one
    of 3 deterministic caption variants; the modal caption wins (count
    desc, caption asc tiebreak). Two map-side-combinable aggregations —
    no window, no self-join (operators/pairs.py:caption_canonical).
    Reference analog: first-duplicate-wins store dedup
    (src/database.py:126-136), upgraded from first-wins to a vote."""
    from crawler_spark.operators.pairs import caption_canonical, with_content_key

    pairs = with_content_key(
        _t(spark, sf_dir, "documents"), group=7, n_variants=3
    )
    return caption_canonical(pairs)


def q_caption_noise_by_source(spark, sf_dir):
    """Per-source caption label-noise scorecard: share of a source's
    pairs whose caption lost the modal election for their image —
    the per-feed disagreement number a curation pipeline down-weights
    caption sources by (vs dup_rate_by_source, which scores text
    duplication). Canonical table is one row per distinct image, joined
    back on content_key (operators/pairs.py:caption_noise_report)."""
    from crawler_spark.operators.pairs import (
        caption_noise_report,
        with_content_key,
    )

    pairs = with_content_key(
        _t(spark, sf_dir, "documents"), group=7, n_variants=3
    )
    return caption_noise_report(pairs)


def q_dup_rate_by_source(spark, sf_dir):
    """Dedup diagnostics segmented by origin: per source, exact-dup
    rate via fingerprint multiplicity — the per-feed quality report
    that decides which crawl sources get down-weighted. Two map-side-
    combinable aggs (fingerprint counts, then per-source rollup)."""
    from crawler_spark.functions.text import fingerprint

    d = _t(spark, sf_dir, "documents")
    fp_counts = (
        d.select("source", fingerprint(F.col("text")).alias("fp"))
        .groupBy("source", "fp")
        .agg(F.count("*").alias("n"))
    )
    return fp_counts.groupBy("source").agg(
        F.sum("n").alias("n_docs"),
        F.sum(F.col("n") - 1).alias("n_dup_docs"),
        F.round(F.sum(F.col("n") - 1) / F.sum("n"), 6).alias("dup_rate"),
    )


def q_zorder_key(spark, sf_dir):
    """Z-order (Morton) clustering key over the pair table's (w, h) —
    the layout key a 100 TB store sorts by so parquet min/max pruning
    skips on BOTH resolution columns (functions/zorder.py; Delta
    OPTIMIZE ZORDER analog). Single native shift-mask expression."""
    from crawler_spark.functions.zorder import zvalue_sql
    from crawler_spark.operators.pairs import synth_pair_meta

    meta = synth_pair_meta(_t(spark, sf_dir, "documents"))
    return meta.select(
        "image_id", F.expr(zvalue_sql("w", "h", bits=12)).alias("zkey")
    )


def q_image_dup_clusters(spark, sf_dir):
    """Image near-dup clustering over the STORED phash column of the
    north-rule pair table (no decode in the hot path — the 100 TB-scale
    default when phash is materialized at ingest): base hashes plus two
    deterministic Hamming<=3 perturbed twins per image (re-encoded-copy
    analogs) -> banded Hamming<=7 pair join (exact by pigeonhole over
    8x8-bit bands) -> connected components -> (image_id, cluster_id).
    The oracle brute-forces ALL pairs with bit_count(xor) and clusters
    via a recursive CTE, independently re-proving the banding's
    exactness. Complements `image_phash_neardup` (which computes phash
    from decoded bytes and so is rows-only)."""
    from crawler_spark.operators.dedup import dedup_clusters, hamming64_pairs
    from crawler_spark.operators.pairs import phash_with_twins, synth_pair_meta

    sigs = phash_with_twins(synth_pair_meta(_t(spark, sf_dir, "documents")))
    pairs = hamming64_pairs(
        sigs, id_col="image_id", sig_col="sig", max_hamming=7, n_bands=8
    )
    return dedup_clusters(pairs).select(
        F.col("doc_id").alias("image_id"), "cluster_id"
    )


def q_image_dedup_keep_best(spark, sf_dir):
    """Image dedup end state: near-dup clusters (stored-phash banded
    Hamming<=7, connected components) -> keep-BEST election per
    cluster — highest resolution wins, id breaks ties — with
    singletons kept by definition. This is the manifest a curation
    run actually writes (image_dup_clusters stops at cluster labels).
    Twin rows inherit their base image's w/h (re-encoded copies).
    The oracle extends the brute-force + recursive-CTE re-proof with
    the same election window."""
    from crawler_spark.operators.dedup import dedup_clusters, hamming64_pairs
    from crawler_spark.operators.pairs import phash_with_twins, synth_pair_meta

    meta = synth_pair_meta(_t(spark, sf_dir, "documents"))
    sigs = phash_with_twins(meta)
    pairs = hamming64_pairs(
        sigs, id_col="image_id", sig_col="sig", max_hamming=7, n_bands=8
    )
    cl = dedup_clusters(pairs).select(
        F.col("doc_id").alias("image_id"), "cluster_id"
    )
    allr = (
        sigs.select("image_id")
        .join(cl, "image_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "image_id"))
        .withColumn("base_id", F.col("image_id") % 1000000000)
    )
    m = meta.select(
        F.col("image_id").cast("long").alias("base_id"), "w", "h"
    )
    sized = allr.join(m, "base_id")
    w_ = Window.partitionBy("cluster_id").orderBy(
        (F.col("w") * F.col("h")).desc(), "image_id"
    )
    return sized.select(
        "image_id",
        "cluster_id",
        "w",
        "h",
        (F.row_number().over(w_) == 1).alias("kept"),
    )



# --------------------------------------------------------------------------
# similarity search (embeddings)
# --------------------------------------------------------------------------

def _dot_d(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda s, x: s + x,
    )


def q_embedding_centroids(spark, sf_dir):
    """Per-label mean embedding (class centroids — the IVF/k-NN prior
    and the drift monitor's reference vector): posexplode to (label,
    dim, value), one map-side-combinable two-key aggregation. Emitted
    long-form (label, dim, centroid) — at 10^6 labels x 512 dims the
    long form IS the scalable layout (no giant array rebuild)."""
    e = _t(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("centroid"))
    )


def q_embedding_quantization(spark, sf_dir):
    """Int8 quantization prep (the storage/serving compression pass):
    per-vector absmax scale (127/max|x|) and the checksum of the
    quantized values. floor(x*scale + 0.5) on BOTH engines — F.round
    (HALF_UP) and DuckDB round (HALF_EVEN) disagree on exact .5
    boundaries, floor(+0.5) cannot."""
    e = _t(spark, sf_dir, "embeddings")
    # project max_abs FIRST: referencing the aggregate expression inside
    # the checksum lambda would recompute it per element (the lambda-CSE
    # trap, SCALE.md)
    withmax = e.select(
        "vec_id",
        "embedding",
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda a, x: F.greatest(a, F.abs(x.cast("double"))),
        ).alias("max_abs"),
    )
    scale = F.lit(127.0) / F.greatest(F.col("max_abs"), F.lit(1e-30))
    return withmax.select(
        "vec_id",
        F.round("max_abs", 6).alias("max_abs"),
        F.aggregate(
            "embedding",
            F.lit(0).cast("long"),
            lambda a, x: a
            + F.floor(x.cast("double") * scale + F.lit(0.5)).cast("long"),
        ).alias("int8_checksum"),
    )


def q_kcenter_coreset(spark, sf_dir):
    """Diversity coreset for curation: greedy k-center / farthest-point
    sampling over the embeddings table (operators/similarity.py
    kcenter_sample, Gonzalez'85 2-approximation), seed vec_id=0, k=6.
    Output is the pick sequence with each pick's coverage radius — the
    plateau point tells the curation run when the coreset already
    spans the space. Inherently k-sequential, but each round is one
    narrow map (least(mind, d²-to-newest-center)) + a TakeOrdered(1)
    argmax; driver traffic is one row per round. Full SQL oracle:
    unrolled greedy rounds (_kcenter_sql)."""
    from crawler_spark.operators.similarity import kcenter_sample

    return kcenter_sample(_t(spark, sf_dir, "embeddings"), k=6)


def q_cosine_topk(spark, sf_dir):
    """Brute-force exact top-10 by cosine vs the vec_id=0 embedding —
    native zip_with/aggregate, TakeOrdered top-k (no global sort)."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    scored = e.crossJoin(F.broadcast(q)).select(
        "vec_id",
        F.round(
            _dot_d(F.col("embedding"), F.col("qv"))
            / (
                F.sqrt(_dot_d(F.col("embedding"), F.col("embedding")))
                * F.sqrt(_dot_d(F.col("qv"), F.col("qv")))
            ),
            6,
        ).alias("cosine"),
    )
    return scored.filter(F.col("vec_id") != 0).orderBy(
        F.desc("cosine"), F.asc("vec_id")
    ).limit(10)


def q_embedding_neardup(spark, sf_dir):
    """SRP (random-hyperplane) banded LSH near-dup pairs: 16 deterministic
    Rademacher hyperplanes -> 4 bands x 4 bits; candidates = pairs
    agreeing on >= 1 band; exact cosine >= 0.35 verifies. Collision rate
    tracks the cosine angle, so candidate volume tracks true near-dups
    (the old fixed 8-bucket sign scheme put ~n^2/8 pairs per bucket)."""
    from crawler_spark.operators.dedup import embedding_neardup_pairs

    return embedding_neardup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.35, n_planes=16, n_bands=4
    )


def q_dedup_simhash64(spark, sf_dir):
    """64-bit SimHash as 4x16-bit banded signatures (corpus-scale form:
    a 16-bit space collides massively at 10^10 docs)."""
    from crawler_spark.operators.dedup import simhash64_band_signatures

    return simhash64_band_signatures(_t(spark, sf_dir, "documents"))


def q_simhash64_pairs(spark, sf_dir):
    """Banded Hamming<=3 near-dup pairs over the 64-bit SimHash;
    candidate generation exact by pigeonhole (3 flips can't touch all 4
    bands), verification via per-band xor + bit_count."""
    from crawler_spark.operators.dedup import simhash64_hamming_pairs

    return simhash64_hamming_pairs(_t(spark, sf_dir, "documents"), max_hamming=3)


def q_cc_star_clusters(spark, sf_dir):
    """Duplicate-cluster labels via large-star/small-star contraction
    (Kiveris et al. SoCC'14) over the 64-bit SimHash Hamming<=3 pair
    graph — the O(log diameter) scale path next to ``dedup_clusters``'s
    one-hop min propagation (chained duplicates make diameters long;
    star contraction's round count doesn't care). Same output contract:
    (doc_id, cluster_id = component min)."""
    from crawler_spark.operators.dedup import simhash64_hamming_pairs
    from crawler_spark.operators.graph import cc_star

    pairs = simhash64_hamming_pairs(
        _t(spark, sf_dir, "documents"), max_hamming=3
    )
    return cc_star(pairs).orderBy("doc_id")


def q_trap_gate(spark, sf_dir):
    """Spider-trap host report (Heritrix pathological-path + DUST
    template-explosion signals, operators/traps.py): per-URL signals
    are shuffle-free native expressions; the host report is two
    map-side-combinable aggs joined on the host dimension. The synth
    frontier plants one calendar-loop host (repeated segments) and one
    parameter-mill host (single collapsed template) among clean hosts."""
    from crawler_spark.operators.traps import host_trap_report

    d = _t(spark, sf_dir, "documents")
    urls = d.select(
        F.concat(
            F.lit("host-"), (F.col("doc_id") % 20).cast("string"), F.lit(".test")
        ).alias("host"),
        F.concat(
            F.lit("http://host-"),
            (F.col("doc_id") % 20).cast("string"),
            F.lit(".test"),
            F.expr(
                "CASE WHEN doc_id % 20 = 7 THEN "
                "  '/cal/' || repeat('2024/', CAST(doc_id % 6 AS INT) + 1) || 'p' "
                "WHEN doc_id % 20 = 13 THEN '/p/' || CAST(doc_id AS STRING) "
                "ELSE '/' || source || '/' || "
                "  translate(CAST(doc_id % 64 AS STRING), '0123456789', 'abcdefghij') "
                "  || '/item/' || CAST(doc_id AS STRING) END"
            ),
        ).alias("url"),
    )
    rep = host_trap_report(urls, repeat_threshold=3, template_threshold=50)
    return rep.select(
        "host",
        F.col("n_urls").cast("long").alias("n_urls"),
        F.col("n_templates").cast("long").alias("n_templates"),
        F.col("max_urls_per_template").cast("long").alias("max_urls_per_template"),
        F.col("max_seg_repeat").cast("long").alias("max_seg_repeat"),
        "avg_path_depth",
        "trap_suspect",
    )


def q_dup_line_gate(spark, sf_dir):
    """The duplicate-LINE half of the Gopher repetition rules (dup-line
    fraction + dup-line char fraction, thresholds 0.30/0.20): ZERO
    shuffles — pseudo-lines and the sorted-adjacent duplicate fold are
    pure array expressions, vs `repetition_suite`'s grouped-count
    shuffle of (doc, gram) partials. The per-document gate a 10^10-doc
    corpus pass wants map-side."""
    from crawler_spark.functions.text import dup_line_signals

    d = _t(spark, sf_dir, "documents")
    s = dup_line_signals(F.col("text"), line_words=8)
    return d.select(
        "doc_id",
        s["n_lines"].cast("int").alias("n_lines"),
        s["dup_line_frac"].alias("dup_line_frac"),
        s["dup_line_char_frac"].alias("dup_line_char_frac"),
        s["pass_dup_lines"].alias("pass_dup_lines"),
    )


def q_curation_funnel(spark, sf_dir):
    """Curation decision funnel: every corpus pipeline publishes this
    table — gates applied in a FIXED order (gopher word battery ->
    top-2-gram repetition <= 0.20 -> duplicate-line gate), each doc
    charged to the FIRST gate that rejects it, per-stage reach /
    rejection / survival. All three gates are map-side (zero-shuffle
    array expressions); the only shuffle is the 4-row gate histogram,
    and the cumulative window runs over that gate DIMENSION, never the
    corpus."""
    from crawler_spark.functions.text import (
        _word_grams,
        dup_line_signals,
        gopher_stats,
        max_multiplicity,
    )

    d = _t(spark, sf_dir, "documents")
    g = gopher_stats(F.col("text"))
    ws = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), "\\s+"),
        lambda t: F.length(t) > 0,
    )
    big = _word_grams(ws, 2)
    top2 = F.when(
        F.size(big) >= 1,
        _pin(max_multiplicity(big).cast("double") / F.size(big), 6),
    ).otherwise(F.lit(0.0))
    dl = dup_line_signals(F.col("text"), line_words=8)
    first_fail = (
        F.when(~g["pass_gopher"], F.lit("gopher"))
        .when(top2 > 0.20, F.lit("rep_top2"))
        .when(~dl["pass_dup_lines"], F.lit("dup_lines"))
        .otherwise(F.lit("pass"))
    )
    counts = (
        d.select(first_fail.alias("gate"))
        .groupBy("gate")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    gates = spark.createDataFrame(
        [(1, "gopher"), (2, "rep_top2"), (3, "dup_lines"), (4, "pass")],
        "stage int, gate string",
    )
    j = gates.join(counts, "gate", "left").withColumn(
        "n", F.coalesce("n", F.lit(0))
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = Window.orderBy("stage").rowsBetween(Window.unboundedPreceding, -1)
    out = j.select(
        "stage",
        "gate",
        (
            F.sum("n").over(w_all)
            - F.coalesce(F.sum("n").over(w_prev), F.lit(0))
        ).cast("long").alias("n_reached"),
        F.when(F.col("gate") == "pass", F.lit(0))
        .otherwise(F.col("n"))
        .cast("long")
        .alias("n_rejected"),
    )
    return out.select(
        "stage",
        "gate",
        "n_reached",
        "n_rejected",
        _pin(
            (F.col("n_reached") - F.col("n_rejected")).cast("double")
            / F.greatest(F.col("n_reached"), F.lit(1)),
            6,
        ).alias("survival"),
    ).orderBy("stage")


def q_scenario_generate(spark, sf_dir):
    """C12 + W2 composed: generate the prefix-reduction scenario list
    from a raw query string (kakao_api.py:131-145), then first validated
    hit wins. Output: (doc_id, hit_val, hit_pos)."""
    from crawler_spark.operators.enrich import generate_scenarios, scenario_first_hit

    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.concat_ws(
            " ", "source", "lang", (F.col("doc_id") % 7).cast("string")
        ).alias("q"),
    ).withColumn("scenarios", generate_scenarios(F.col("q")))
    s1 = (
        d.filter(F.col("lang") == "en")
        .select(F.concat_ws(" ", "source", "lang").alias("q"))
        .distinct()
    )
    s2 = (
        d.filter(F.length("source") % 2 == 0)
        .select(F.col("source").alias("q"))
        .distinct()
    )
    s3 = spark.createDataFrame([("*",)], "q string")
    lookup = s1.union(s2).union(s3).distinct().withColumn("val", F.upper("q"))
    out = scenario_first_hit(base, "scenarios", lookup, "q", "val", "doc_id")
    return out.select("doc_id", "hit_val", F.col("hit_pos").cast("long").alias("hit_pos"))


def q_ann_ivf_topk(spark, sf_dir):
    """IVF approximate top-k (scale path): portable hash-group mean
    centroids (md5-digit cells, round-9 stabilized) -> nearest-cell
    assignment -> probe 3 cells -> exact cosine. Full SQL oracle."""
    from crawler_spark.operators.similarity import ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    qv = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    return ivf_topk(e, qv, k=10, n_cells=8, n_probe=3)


def q_ann_ivf_kmeans(spark, sf_dir):
    """IVF with Lloyd-refined centroids: hash-seeded means -> 2 fixed
    spherical k-means iterations (round-9 pinned assignment + update)
    -> probe 3 cells -> exact cosine. Full SQL oracle mirrors every
    iteration."""
    from crawler_spark.operators.similarity import ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    qv = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    return ivf_topk(e, qv, k=10, n_cells=8, n_probe=3, n_iter=2)


def q_domain_budget_rollup(spark, sf_dir):
    """Registrable-domain (eTLD+1) politeness rollup: hosts synthesized
    with md5-digit subdomain depth and suffix choice, resolved through
    the broadcast longest-suffix match (functions/domains.py), then one
    count per registrable domain — the key a web-scale crawler budgets
    by instead of raw host."""
    from crawler_spark.functions.domains import suffix_dim, with_registrable_domain

    d = _t(spark, sf_dir, "documents")
    hosts = d.select(
        "doc_id",
        F.expr(
            "concat("
            "  if(pmod(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 8, 1)) - 1, 3) = 0,"
            "     concat('img', cast(doc_id % 4 as string), '.'), ''),"
            "  'site-', cast(doc_id % 10 as string), '.',"
            "  element_at(array('com', 'co.uk', 'test', 'org.uk'),"
            "    pmod(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 9, 1)) - 1, 4) + 1)"
            ")"
        ).alias("host"),
    )
    out = with_registrable_domain(hosts, suffix_dim(spark))
    return out.groupBy("registrable_domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("host").alias("n_hosts"),
    )


def q_adaptive_politeness(spark, sf_dir):
    """AIMD per-host politeness feedback: synthetic fetch outcomes
    (md5-digit success, ~75%) -> halve the budget for hosts failing >20%,
    +2 for healthy ones, delay stretched by failure rate. Integer
    cross-product threshold so no float ratio can diverge
    (operators/politeness.py:adaptive_budgets)."""
    from crawler_spark.operators.politeness import adaptive_budgets

    d = _t(spark, sf_dir, "documents")
    outcomes = d.select(
        F.concat(F.lit("host-"), (F.col("doc_id") % 20).cast("string")).alias("host"),
        F.expr(
            "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 7, 1)) - 1) >= 4"
        ).alias("ok"),
    )
    return adaptive_budgets(outcomes, base_budget=8)


def q_sitemap_coverage(spark, sf_dir):
    """Sitemap-vs-discovery audit — the operational health check next
    to sitemap_ingest: per host, how much of what the host ADVERTISES
    (sitemap-listed URLs) the crawl actually discovered, and how much
    of what it discovered the host never advertised (orphans — the
    pages only link-following finds). Membership flags derive from md5
    digits of the doc id (listed: digit 8 < 12, i.e. ~75%; discovered:
    digit 9 < 10, i.e. ~62.5%), so both engines score the same sets.
    One map-side projection + one per-host aggregation — a single
    shuffle whose key (host) is the politeness partitioning the crawl
    already maintains; zero-denominator hosts are pinned to 0 rather
    than dividing (Spark's x/0 -> NULL vs DuckDB's inf would
    otherwise diverge)."""
    d8 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 8, 1)) - 1)"
    d9 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 9, 1)) - 1)"
    docs = _t(spark, sf_dir, "documents")
    flagged = docs.select(
        (F.col("doc_id") % 20).alias("host_id"),
        (F.expr(d8) < 12).cast("int").alias("listed"),
        (F.expr(d9) < 10).cast("int").alias("discovered"),
    )
    agg = flagged.groupBy("host_id").agg(
        F.sum("listed").cast("long").alias("n_listed"),
        F.sum("discovered").cast("long").alias("n_discovered"),
        F.sum(F.col("listed") * F.col("discovered")).cast("long").alias(
            "n_both"
        ),
    )
    return agg.select(
        "host_id",
        "n_listed",
        "n_discovered",
        "n_both",
        F.when(F.col("n_listed") == 0, F.lit(0.0))
        .otherwise(
            _pin(
                F.col("n_both").cast("double")
                / F.col("n_listed").cast("double"),
                6,
            )
        )
        .alias("coverage"),
        F.when(F.col("n_discovered") == 0, F.lit(0.0))
        .otherwise(
            _pin(
                (F.col("n_discovered") - F.col("n_both")).cast("double")
                / F.col("n_discovered").cast("double"),
                6,
            )
        )
        .alias("orphan_rate"),
    )


def q_sitemap_ingest(spark, sf_dir):
    """Sitemap-protocol frontier seeding: synthesize one sitemap XML blob
    per host from the documents table (deterministic string-agg), parse
    it back with native regex extraction (sources/sitemap.py — no XML
    lib, no UDF), and admit the top-3 entries per host by priority.
    Round-trips build -> parse -> rank entirely in whole-stage codegen."""
    from crawler_spark.sources.sitemap import parse_sitemaps, top_candidates_per_host

    d = _t(spark, sf_dir, "documents")
    entries = d.select(
        F.concat(F.lit("host-"), (F.col("doc_id") % 20).cast("string")).alias("host"),
        F.concat(
            F.lit("http://host-"),
            (F.col("doc_id") % 20).cast("string"),
            F.lit(".test/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("loc"),
        F.expr(
            "concat('0.', cast(pmod(instr('0123456789abcdef', "
            "substring(md5(cast(doc_id as string)), 6, 1)) - 1, 10) as string))"
        ).alias("prio"),
    )
    xml = entries.groupBy("host").agg(
        F.concat(
            F.lit("<urlset>"),
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("loc", "prio"))),
                    lambda s: F.concat(
                        F.lit("<url><loc>"),
                        s["loc"],
                        F.lit("</loc><priority>"),
                        s["prio"],
                        F.lit("</priority></url>"),
                    ),
                ),
            ),
            F.lit("</urlset>"),
        ).alias("xml")
    )
    return top_candidates_per_host(parse_sitemaps(xml), per_host=3)


def q_pq_adc_topk(spark, sf_dir):
    """Product-quantization ADC top-k (the compressed-domain ANN path:
    codes are m_subs bytes per vector, distances come from a broadcast
    query-to-codeword table, integer-summed). Full SQL oracle mirrors
    codebook build, encoding, and ADC scan."""
    from crawler_spark.operators.similarity import pq_adc_topk

    e = _t(spark, sf_dir, "embeddings")
    qv = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    return pq_adc_topk(e, qv, k=10, m_subs=4, n_codes=16)


def q_crawl_smoke(spark, sf_dir):
    """End-to-end crawl engine smoke (frontier->politeness->fetch->
    dedup->snapshot): results-by-host over a T1 synthetic crawl. No SQL
    oracle (engine-internal tables); rows-only check; full correctness is
    pytest's oracle-simulator match."""
    import tempfile

    from crawler_spark.operators.metrics import results_by_host
    from crawler_spark.plans.rounds import run_crawl
    from crawler_spark.sources.synth import T1_SMOKE

    with tempfile.TemporaryDirectory() as td:
        catalog, _ = run_crawl(spark, td, T1_SMOKE, round_seconds=8.0, use_bloom=True)
        out = results_by_host(catalog.read("results"))
        out = spark.createDataFrame(out.collect(), out.schema)  # detach from tmpdir
    return out


def q_crawl_adaptive_smoke(spark, sf_dir):
    """End-to-end ADAPTIVE crawl smoke: the flaky web crawled with the
    closed-loop politeness back-off (hosts halve budget the round after
    any failure) plus priority-mapped hosts — the full feature surface
    of the scheduler in one run. Rows-only (engine-internal tables);
    exact oracle parity is pytest's test_adaptive_politeness_oracle_match
    and test_host_priority_queue_drives_ordering."""
    import tempfile

    from crawler_spark.operators.metrics import results_by_host
    from crawler_spark.plans.rounds import run_crawl
    from crawler_spark.sources.synth import T4_FLAKY

    with tempfile.TemporaryDirectory() as td:
        catalog, _ = run_crawl(
            spark, td, T4_FLAKY, round_seconds=8.0, use_bloom=True,
            adaptive=True,
        )
        out = results_by_host(catalog.read("results"))
        out = spark.createDataFrame(out.collect(), out.schema)  # detach from tmpdir
    return out


def _redirect_edges(spark, sf_dir):
    """Deterministic redirect graph over the document frontier: with
    c = doc_id % 100, docs 1<=c<=12 redirect one step down (chains up
    to 12 hops — 9..12 exceed the 8-hop budget), c in (56,57) redirect
    up and c=58 back down (57<->58 is a 2-cycle, 56 its entry ramp);
    every other doc is a terminal URL."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % 100).alias("c")
    )
    return d.filter(
        ((F.col("c") >= 1) & (F.col("c") <= 12))
        | F.col("c").isin(56, 57, 58)
    ).select(
        F.col("doc_id").alias("src"),
        F.when(F.col("c").isin(56, 57), F.col("doc_id") + 1)
        .otherwise(F.col("doc_id") - 1)
        .alias("dst"),
    )


def q_redirect_resolution(spark, sf_dir):
    """Redirect-chain resolution (301/302 canonicalization pass) by
    pointer doubling: every redirect source mapped to its terminal URL
    + exact hop count in ceil(log2(max_hops)) self-joins, cycles and
    over-budget chains flagged unresolved. See operators/graph.py for
    the scale analysis (reference follows redirects implicitly inside
    the browser; a batch engine resolves them as data)."""
    from crawler_spark.operators.graph import resolve_redirects

    out = resolve_redirects(_redirect_edges(spark, sf_dir), max_hops=8)
    return out.select(
        F.col("src").alias("url_id"), "final", "n_hops", "resolved"
    )


def q_rolling_latency_anomaly(spark, sf_dir):
    """Per-host rolling-median latency spike detection over the fetch
    log (operators/metrics.py rolling_median_flags) — the grouped-map
    applyInPandas surface: rolling median has no native Spark window
    aggregate, so each host's series is one pandas frame (one shuffle
    on host). Oracle = ANSI window median (quantile_cont over ROWS
    BETWEEN 4 PRECEDING AND CURRENT ROW) — medians of <= 5 doubles are
    exact, so the grouped-map and the SQL window agree bit-for-bit."""
    from crawler_spark.operators.metrics import rolling_median_flags

    d1 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 1, 1)) - 1)"
    d2 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 2, 1)) - 1)"
    f = _frontier(spark, sf_dir)
    lat = f.select(
        "host",
        F.col("discovery_seq").alias("seq"),
        (
            50.0
            + F.expr(f"({d1} * 16 + {d2})") * 7.0
            + F.col("priority") * 100.0
        ).alias("lat_ms"),
    )
    return rolling_median_flags(lat, window=5, k=3.0)


def q_redirect_aware_seen(spark, sf_dir):
    """Redirect-aware URL-seen gating: a discovered URL whose redirect
    chain TERMINATES at an already-seen page is a duplicate fetch even
    though the URL itself is unseen — the dedup rule that kills the
    www/apex + http/https alias storm canonicalization alone can't
    (server-side redirects are invisible to URL normalization). Composes
    the pointer-doubling resolver with the seen set: every URL is
    classified direct / via_redirect / unresolved / unseen. Both joins
    are on the URL key; the resolver's log2(max_hops) rounds are the
    only iteration."""
    from crawler_spark.operators.graph import resolve_redirects

    d = _t(spark, sf_dir, "documents").select("doc_id")
    res = resolve_redirects(_redirect_edges(spark, sf_dir), max_hops=8).select(
        F.col("src").alias("doc_id"), "final", "resolved"
    )
    seen = d.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("k"), F.lit(True).alias("s")
    )
    j = (
        d.join(res, "doc_id", "left")
        .join(seen.select(F.col("k").alias("doc_id"), F.col("s").alias("self_seen")),
              "doc_id", "left")
        .join(seen.select(F.col("k").alias("final"), F.col("s").alias("final_seen")),
              "final", "left")
    )
    status = (
        F.when(F.col("self_seen"), F.lit("direct"))
        .when(F.col("resolved") & F.col("final_seen"), F.lit("via_redirect"))
        .when(F.col("resolved") == F.lit(False), F.lit("unresolved"))
        .otherwise(F.lit("unseen"))
    )
    return j.select(
        "doc_id",
        F.col("final").alias("final_id"),
        status.alias("status"),
        (status.isin("direct", "via_redirect")).alias("effectively_seen"),
    )


def q_matryoshka_eval(spark, sf_dir):
    """Matryoshka (MRL) truncation audit: how much of each embedding's
    norm survives truncation to the first k of 64 dims — the table that
    decides whether the ANN index can run at k=16 instead of 64 (4x
    less I/O and compute at 10^10 vectors). Per k in (8, 16, 32): mean
    and min norm retention plus the fraction of vectors >= 0.9. One
    scan, per-k stats via a tagged explode of three native folds;
    retention sums are round-9 stabilized and the means are
    decimal-exact (order-independent)."""
    e = _t(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")

    def ss(col):  # round-9 stabilized sum of squares (alignment recipe)
        return F.round(
            F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x), 9
        )

    ks = [8, 16, 32]
    tagged = e.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"),
                        F.round(
                            F.sqrt(ss(F.slice(v, 1, k))) / F.sqrt(ss(v)), 6
                        ).alias("ret"),
                    )
                    for k in ks
                ]
            )
        ).alias("g")
    ).select(F.col("g.k").alias("k"), F.col("g.ret").alias("ret"))
    dec = F.col("ret").cast("decimal(20,6)")
    return tagged.groupBy("k").agg(
        F.count("*").alias("n_vecs"),
        _pin(F.sum(dec).cast("double") / F.count("*"), 6).alias("mean_retention"),
        F.min("ret").alias("min_retention"),
        _pin(
            F.sum((F.col("ret") >= F.lit(0.9)).cast("long")) / F.count("*"), 6
        ).alias("frac_ge_090"),
    )


def q_anchor_topk(spark, sf_dir):
    """Anchor-text aggregation — the classic web-graph signal: group
    inbound links by target page and keep each target's top-2 anchor
    terms. Edges: every doc links to its 16-block hub; the anchor term
    is the doc's first normalized word. One map-side-combinable count
    agg, then a window over the (much smaller) per-target term counts;
    ties broken by term for cluster-size-independent output."""
    docs = _t(spark, sf_dir, "documents")
    edges = docs.select(
        (F.col("doc_id") - F.col("doc_id") % 16).alias("target_id"),
        F.split(
            F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " "
        )[0].alias("term"),
    )
    counts = edges.groupBy("target_id", "term").agg(
        F.count("*").alias("n_links")
    )
    w = Window.partitionBy("target_id").orderBy(
        F.col("n_links").desc(), F.col("term")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 2)
        .select("target_id", "term", "n_links", "rnk")
    )


def q_crawl_trap_score(spark, sf_dir):
    """Crawl-trap detection: a host serving many URLs with few distinct
    content fingerprints (calendar pages, session-id explosions) wastes
    fetch budget. Per host: URL count, distinct-content count, the
    duplication factor, and a trap flag (>=3 URLs per distinct page).
    One two-level agg over the frontier derivation — the scheduler
    would multiply the flag into the politeness budget."""
    f = _frontier(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")).alias(
            "fp"
        ),
    )
    return (
        f.join(docs, "doc_id")
        .groupBy("host")
        .agg(
            F.count("*").alias("n_urls"),
            F.count_distinct("fp").alias("n_distinct"),
        )
        .withColumn(
            "dup_factor",
            F.round(F.col("n_urls") / F.col("n_distinct"), 6),
        )
        .withColumn("is_trap", F.col("n_urls") >= 3 * F.col("n_distinct"))
    )


def q_boilerplate_removal(spark, sf_dir):
    """C4-style boilerplate line removal: a line (here a 4-word chunk of
    the normalized word stream — the corpus has no newlines) that occurs
    in >= 3 distinct documents of the same host is nav/footer chrome,
    not content, and is dropped before training. Per doc: line count,
    boilerplate count, and the keep ratio the curation pass multiplies
    into its quality score. Dataflow: explode lines -> per-(host, line)
    distinct-doc frequency (map-side combinable) -> join back -> per-doc
    agg. The (host, line) key is high-cardinality so the join shuffle is
    skew-free; at 10^10 docs the frequency table is the only state."""
    docs = _t(spark, sf_dir, "documents")
    lines = docs.select(
        "doc_id",
        (F.col("doc_id") % 20).alias("host_id"),
        F.split(
            F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " "
        ).alias("words"),
    ).select(
        "doc_id",
        "host_id",
        F.explode(
            F.expr(
                "transform(sequence(0, greatest(cast(ceil(size(words) / 4.0)"
                " as int) - 1, 0)), i -> array_join(slice(words, i*4 + 1, 4), ' '))"
            )
        ).alias("line"),
    )
    freq = lines.groupBy("host_id", "line").agg(
        F.count_distinct("doc_id").alias("df")
    )
    return (
        lines.join(freq, ["host_id", "line"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum((F.col("df") >= 3).cast("int")).cast("long").alias("n_boiler"),
        )
        .withColumn(
            "keep_ratio",
            F.round(1 - F.col("n_boiler") / F.col("n_lines"), 6),
        )
    )


def q_change_rate(spark, sf_dir):
    """Per-URL change-rate estimation for refresh scheduling (Cho &
    Garcia-Molina's Poisson estimator, public VLDB'00/TOIT'03 result):
    from n daily revisits of which x observed a changed page,
    lambda_hat = -ln((n - x + 0.5) / (n + 0.5)) changes/day (the +0.5
    bias correction keeps x = n finite). The revisit history is
    synthesized deterministically per doc (n = 4 + doc_id % 5 visits,
    x changes from an md5 digit, x <= n). Per host: frontier size, mean
    and max estimated change rate, and how many URLs are hot
    (lambda_hat > 0.7/day) — the numbers a freshness-aware scheduler
    feeds into recrawl_schedule's interval bands. Pure native
    expressions, one map-side-combinable agg."""
    d8 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 8, 1)) - 1)"
    f = _frontier(spark, sf_dir)
    est = f.select(
        "host",
        F.expr("cast(4 + doc_id % 5 as int)").alias("n"),
        F.expr(f"cast({d8} % (4 + doc_id % 5 + 1) as int)").alias("x"),
    ).withColumn(
        "lam", -F.log((F.col("n") - F.col("x") + 0.5) / (F.col("n") + 0.5))
    )
    return est.groupBy("host").agg(
        F.count("*").alias("n_urls"),
        F.round(F.avg("lam"), 6).alias("avg_lambda"),
        F.round(F.max("lam"), 6).alias("max_lambda"),
        F.sum((F.col("lam") > 0.7).cast("int")).cast("long").alias("n_hot"),
    )


def q_hits_scores(spark, sf_dir):
    """HITS hubs/authorities over a deterministic two-layer link graph
    (every doc links to its 16-block hub page and to a popular page
    (doc_id*7) % 160). See operators/graph.py:hits_scores for the
    edge-list dataflow; 2 normalized iterations, L2 norms broadcast."""
    from crawler_spark.operators.graph import hits_scores

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    edges = (
        docs.select(
            F.col("doc_id").alias("src"),
            (F.col("doc_id") - F.col("doc_id") % 16).alias("dst"),
        )
        .union(
            docs.select(
                F.col("doc_id"), (F.col("doc_id") * 7) % 160
            )
        )
        .filter(F.col("src") != F.col("dst"))
    )
    out = hits_scores(edges, iters=2)
    return out.select(
        "node",
        F.round("authority", 6).alias("authority"),
        F.round("hub", 6).alias("hub"),
    )


def q_salsa_scores(spark, sf_dir):
    """SALSA (Lempel & Moran WWW'00) over the same deterministic link
    graph as hits_scores — the degree-normalized random-walk variant
    that resists the tightly-knit-community capture HITS suffers
    (operators/graph.py:salsa_scores; 2 L1-normalized iterations,
    degrees attached to the edge list once, norms broadcast)."""
    from crawler_spark.operators.graph import salsa_scores

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    edges = (
        docs.select(
            F.col("doc_id").alias("src"),
            (F.col("doc_id") - F.col("doc_id") % 16).alias("dst"),
        )
        .union(
            docs.select(
                F.col("doc_id"), (F.col("doc_id") * 7) % 160
            )
        )
        .filter(F.col("src") != F.col("dst"))
    )
    out = salsa_scores(edges, iters=2)
    return out.select(
        "node",
        F.round("authority", 6).alias("authority"),
        F.round("hub", 6).alias("hub"),
    )


def q_warc_roundtrip(spark, sf_dir):
    """WARC archive round-trip: serialize fetch results (uri/status/
    body synthesized from documents) into concatenated WARC-style blobs,
    re-parse them with the native-regex record parser (sources/warc.py),
    and aggregate per status. The oracle computes the same aggregate
    directly from documents — any record the writer mangles or the
    parser drops/truncates changes a count or a char total, so equality
    proves the round trip is lossless. Parsing is a single scan with
    whole-stage codegen (no Python); blobs are the parallelism unit."""
    from crawler_spark.sources.warc import format_records, parse_records

    docs = _t(spark, sf_dir, "documents")
    results = docs.select(
        F.concat(
            F.lit("http://host-"),
            (F.col("doc_id") % 20).cast("string"),
            F.lit(".test/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("uri"),
        F.expr(
            "element_at(array(200, 200, 200, 301, 404),"
            " cast(doc_id % 5 as int) + 1)"
        ).alias("status"),
        F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ").alias("body"),
    )
    parsed = parse_records(format_records(results))
    return parsed.groupBy("status").agg(
        F.count("*").alias("n_records"),
        F.sum(F.length("body")).cast("long").alias("total_chars"),
        F.count_distinct(
            F.regexp_extract("uri", "http://([^/]*)/", 1)
        ).alias("n_hosts"),
    )


def q_dust_params(spark, sf_dir):
    """DUST rule mining (Different URLs, Same Text — Bar-Yossef et al.,
    public WWW'07 line of work): decide per host whether a URL query
    parameter (?session=) can be stripped by the canonicalizer. URLs
    aliasing the same page (4 session variants per base URL, stride-20
    so a group stays on one host) are grouped by their stripped form;
    if every group on a host has exactly one distinct content
    fingerprint, the parameter never changes content there and the rule
    is safe. Even hosts serve session-independent content, odd hosts
    vary — the miner must recover exactly that split. Two cheap
    map-side-combinable aggs; the stripped-URL key is high-cardinality
    so no skew at 10^10 URLs."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    urls = docs.select(
        (F.col("doc_id") % 20).alias("host_id"),
        (F.col("doc_id") - F.col("doc_id") % 80 + F.col("doc_id") % 20).alias(
            "grp"
        ),
        F.md5(
            F.when(
                (F.col("doc_id") % 20) % 2 == 0,
                F.col("doc_id") - F.col("doc_id") % 80 + F.col("doc_id") % 20,
            )
            .otherwise(F.col("doc_id"))
            .cast("string")
        ).alias("fp"),
    )
    grouped = urls.groupBy("host_id", "grp").agg(
        F.count_distinct("fp").alias("n_fp"),
        F.count("*").alias("n_urls"),
    )
    return (
        grouped.groupBy("host_id")
        .agg(
            F.count("*").alias("n_groups"),
            F.sum((F.col("n_fp") == 1).cast("int")).cast("long").alias(
                "n_uniform"
            ),
            F.sum("n_urls").cast("long").alias("n_urls"),
        )
        .withColumn(
            "strip_safe", F.col("n_uniform") == F.col("n_groups")
        )
    )


def q_dust_apply(spark, sf_dir):
    """DUST rule APPLICATION — the operational half of dust_params:
    mine the per-host strip-safety verdict, broadcast the tiny rules
    dimension back onto the URL stream, rewrite each URL to its
    stripped canonical form where the rule is safe (keep it verbatim
    where stripping would merge distinct content), and account the
    frontier reduction per host. On safe (even) hosts the 4 session
    variants per base URL collapse to one entry — reduction 0.75; on
    unsafe (odd) hosts nothing collapses — reduction 0. This is the
    dedup a canonicalizer buys BEFORE fetch: at 10^10 URLs the rules
    table is per-host (~10^7 rows, broadcastable) while the URL
    rewrite is a map-side stateless projection — no extra shuffle
    beyond the mining aggregation itself."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    urls = docs.select(
        (F.col("doc_id") % 20).alias("host_id"),
        F.col("doc_id").alias("url_id"),
        (F.col("doc_id") - F.col("doc_id") % 80 + F.col("doc_id") % 20).alias(
            "grp"
        ),
        F.md5(
            F.when(
                (F.col("doc_id") % 20) % 2 == 0,
                F.col("doc_id") - F.col("doc_id") % 80 + F.col("doc_id") % 20,
            )
            .otherwise(F.col("doc_id"))
            .cast("string")
        ).alias("fp"),
    )
    grouped = urls.groupBy("host_id", "grp").agg(
        F.count_distinct("fp").alias("n_fp")
    )
    rules = grouped.groupBy("host_id").agg(
        (
            F.sum((F.col("n_fp") == 1).cast("int")) == F.count("*")
        ).alias("strip_safe")
    )
    applied = urls.join(F.broadcast(rules), "host_id").select(
        "host_id",
        F.when(F.col("strip_safe"), F.col("grp"))
        .otherwise(F.col("url_id"))
        .alias("canonical_id"),
    )
    return (
        applied.groupBy("host_id")
        .agg(
            F.count("*").cast("long").alias("n_raw"),
            F.count_distinct("canonical_id").alias("n_canonical"),
        )
        .select(
            "host_id",
            "n_raw",
            "n_canonical",
            _pin(
                1.0
                - F.col("n_canonical").cast("double")
                / F.col("n_raw").cast("double"),
                6,
            ).alias("reduction"),
        )
    )


def _clf_weights():
    """16 fixed classifier weights derived from md5 so the SQL oracle
    can embed the identical literals: w_b = (md5('w'||b)[0] - 7.5)/8,
    exact in binary floating point (multiples of 1/16)."""
    import hashlib

    return [
        (int(hashlib.md5(f"w{b}".encode()).hexdigest()[0], 16) - 7.5) / 8.0
        for b in range(16)
    ]


def q_quality_classifier(spark, sf_dir):
    """Linear (fastText-style) quality-classifier inference over hashed
    bag-of-words features: each token hashes (md5 first hex digit) into
    one of 16 buckets with a fixed literal weight; the doc score is the
    sigmoid of the mean-pooled weight sum. The entire model runs inside
    ONE higher-order `aggregate` over the token array — no explode, no
    shuffle, no Python: a 10^10-doc corpus scores in a single
    whole-stage-codegen scan, which is why hashed linear models (not
    UDF-hosted nets) are the curation workhorse at this scale."""
    w_lits = ", ".join(repr(w) for w in _clf_weights())
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        F.split(
            F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " "
        ).alias("words"),
    ).select(
        "doc_id",
        F.size("words").cast("long").alias("n_tokens"),
        F.expr(
            f"aggregate(words, cast(0 as double), (acc, t) -> acc"
            f" + element_at(array({w_lits}),"
            f" instr('0123456789abcdef', substring(md5(t), 1, 1))))"
        ).alias("raw"),
    )
    score = 1 / (1 + F.exp(-F.col("raw") / F.col("n_tokens")))
    return scored.select(
        "doc_id",
        "n_tokens",
        F.round(score, 6).alias("quality"),
        (score > 0.5).alias("passed"),
    )


def q_image_watermark(spark, sf_dir):
    """Multimodal: watermark/overlay-region heuristic over engine-encoded
    png/qdct images (corner/bottom-strip Laplacian density vs global —
    the deterministic stand-in for LAION's watermark model). No SQL
    oracle (binary codec); rows-only — the numeric contract is
    pytest-covered (tests/test_watermark.py: flags exactly the
    checker-stamped corner, leaves clean/flat/noise unflagged)."""
    from crawler_spark.operators.multimodal import watermark_scores
    from crawler_spark.sources.synth import T1_SMOKE

    urls = [f"http://host-0.test/p0/d0/img-{i}" for i in range(64)]
    images = _synth_image_df(spark, urls)
    return watermark_scores(images)


def _clf64_weights() -> list[float]:
    """64 deterministic literal weights in [-1, 1] for the embedding
    safety head: two md5 hex digits of 'clf64:<j>' per dim. Computed
    once in Python; identical literals are inlined into the Spark plan
    AND the DuckDB oracle, so there is nothing to drift."""
    import hashlib

    ws = []
    for j in range(64):
        h = hashlib.md5(f"clf64:{j}".encode()).hexdigest()
        ws.append(round((int(h[:2], 16)) / 127.5 - 1.0, 9))
    return ws


def q_embedding_classifier(spark, sf_dir):
    """Embedding-head safety/quality classifier inference — the shape of
    every NSFW / aesthetic / CLIP-head gate an image-curation pipeline
    runs over stored embeddings: a linear probe on the embedding vector
    (64 literal weights, broadcast by constant-folding), sigmoid, and a
    threshold flag. zip_with + native aggregate fold: whole-stage
    codegen, no explode, no shuffle, no Python — a 10^10-vector corpus
    scores in one scan. Fold sums are round-9 stabilized before the
    sigmoid so both engines agree bit-for-bit (caption_alignment
    recipe); the flag compares the ROUNDED score."""
    ws = _clf64_weights()
    w_arr = F.array(*[F.lit(w) for w in ws])
    e = _t(spark, sf_dir, "embeddings")
    raw = F.round(
        F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                w_arr,
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        9,
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-raw)), 6)
    return e.select(
        "vec_id",
        "label",
        score.alias("score"),
        (score > 0.5).alias("flagged"),
    )


def q_image_sharpness(spark, sf_dir):
    """Multimodal: Laplacian-variance blur scoring over engine-encoded
    png/qdct images via Arrow-batched mapInPandas (see
    operators/multimodal.py:sharpness_scores). No SQL oracle (binary
    codec); rows-only — the numeric contract is pytest-covered
    (tests/test_sharpness.py: box-blurred copies score strictly lower,
    constant images score 0/blurry)."""
    from crawler_spark.operators.multimodal import sharpness_scores
    from crawler_spark.sources.synth import T1_SMOKE

    urls = [f"http://host-0.test/p0/d0/img-{i}" for i in range(64)]
    images = _synth_image_df(spark, urls)
    return sharpness_scores(images)


def q_image_exposure_gates(spark, sf_dir):
    """Multimodal: exposure + entropy curation gates over engine-encoded
    png/qdct images (operators/multimodal.py:exposure_entropy_gates) —
    mean luma, clip fractions, histogram entropy, dynamic range, gate
    flags. No SQL oracle (binary codec); rows-only — the numeric
    contract is pytest-covered (tests/test_exposure.py: black / white /
    noise / gradient planted images hit closed-form values)."""
    from crawler_spark.operators.multimodal import exposure_entropy_gates
    from crawler_spark.sources.synth import T1_SMOKE

    urls = [f"http://host-0.test/p0/d0/img-{i}" for i in range(64)]
    images = _synth_image_df(spark, urls)
    return exposure_entropy_gates(images)


def q_image_patches(spark, sf_dir):
    """Multimodal: ViT-style 16x16 patch extraction over engine-encoded
    images — one row in, (h//16)*(w//16) patch rows out with grid
    position + pixel offsets, each tile re-encoded in the source codec
    (Arrow-batched flatMap, the UDTF shape). No SQL oracle (binary
    codec); rows-only — pixel-exact grid contracts are pytest-covered
    (tests/test_patches.py)."""
    from crawler_spark.operators.multimodal import image_patches
    from crawler_spark.sources.synth import T1_SMOKE

    urls = [f"http://host-0.test/p0/d0/img-{i}" for i in range(32)]
    images = _synth_image_df(spark, urls)
    return image_patches(images)


def q_phash_stability(spark, sf_dir):
    """How stable is the dedup key under benign transforms? Composes
    augment_images -> decode_stats over engine images and reports, per
    variant (hflip / center-crop), the Hamming distance distribution of
    each variant's phash to its own original — measured with native
    ``bit_count(xor)`` after the Arrow decode stage. The number that
    decides whether phash-banding can be trusted to catch flipped or
    cropped re-posts, or whether the pipeline needs transform-invariant
    features. No SQL oracle (binary codec); rows-only — identity==0 and
    unrelated-pair separation are pytest-pinned (tests/test_patches.py
    neighborhood)."""
    from crawler_spark.operators.multimodal import augment_images, decode_stats
    from crawler_spark.sources.synth import T1_SMOKE

    urls = [f"http://host-0.test/p0/d0/img-{i}" for i in range(32)]
    images = _synth_image_df(spark, urls)
    variants = augment_images(images)
    hashed = decode_stats(
        variants.select(
            F.concat_ws("#", "image_id", "variant").alias("image_id"),
            "bytes",
            "fmt",
        )
    ).select(
        F.split(F.col("image_id"), "#")[0].alias("image_id"),
        F.split(F.col("image_id"), "#")[1].alias("variant"),
        "phash",
    )
    orig = hashed.filter(F.col("variant") == "orig").select(
        "image_id", F.col("phash").alias("phash_orig")
    )
    ham = (
        hashed.filter(F.col("variant") != "orig")
        .join(orig, "image_id")
        .select(
            "variant",
            F.bit_count(
                F.col("phash").bitwiseXOR(F.col("phash_orig"))
            ).alias("hamming"),
        )
    )
    return ham.groupBy("variant").agg(
        F.count("*").alias("n"),
        F.round(F.avg("hamming"), 6).alias("mean_hamming"),
        F.max("hamming").alias("max_hamming"),
        F.sum((F.col("hamming") <= 3).cast("long")).alias("n_within_band3"),
    )


def q_image_transcode(spark, sf_dir):
    """Multimodal: storage-normalization transcode (every image
    re-encoded to qdct) with a per-row PSNR audit of the north rule's
    decoded-pixel invariant. No SQL oracle (binary codec); rows-only —
    the PSNR floor / lossless contracts are pytest-covered
    (tests/test_transcode.py)."""
    from crawler_spark.operators.multimodal import transcode_images
    from crawler_spark.sources.synth import T1_SMOKE

    urls = [f"http://host-0.test/p0/d0/img-{i}" for i in range(32)]
    images = _synth_image_df(spark, urls)
    return transcode_images(images, "qdct")


def q_image_augment(spark, sf_dir):
    """Multimodal: deterministic offline augmentation (identity, hflip,
    center crop, each re-encoded in the source codec) over
    engine-encoded images — one row in, three out, Arrow-batched
    flatMap. No SQL oracle (binary codec); rows-only — pixel-exact png
    and PSNR-bounded qdct contracts are pytest-covered
    (tests/test_augment.py)."""
    from crawler_spark.operators.multimodal import augment_images
    from crawler_spark.sources.synth import T1_SMOKE

    urls = [f"http://host-0.test/p0/d0/img-{i}" for i in range(32)]
    images = _synth_image_df(spark, urls)
    return augment_images(images)


def q_snapshot_diff(spark, sf_dir):
    """Crawl snapshot differencing — the incremental-indexing primitive:
    given two crawl waves of the same sites, classify every URL as
    added / removed / modified / unchanged and roll the churn up per
    host. Wave A holds doc_id % 10 != 9, wave B holds doc_id % 10 != 0,
    and content changed where doc_id % 7 == 3 — so all four classes
    occur. One full outer join on the (high-cardinality) URL key, then
    a map-side-combinable pivot-style agg; at 10^10 URLs both sides
    shuffle once on the same key and AQE handles any host skew."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    a = docs.filter(F.col("doc_id") % 10 != 9).select(
        "doc_id",
        (F.col("doc_id") % 20).alias("host_a"),
        F.md5(F.col("doc_id").cast("string")).alias("fp_a"),
    )
    b = docs.filter(F.col("doc_id") % 10 != 0).select(
        "doc_id",
        (F.col("doc_id") % 20).alias("host_b"),
        F.md5(
            F.when(F.col("doc_id") % 7 == 3, F.col("doc_id") + 1000000)
            .otherwise(F.col("doc_id"))
            .cast("string")
        ).alias("fp_b"),
    )
    diff = a.join(b, "doc_id", "full_outer").select(
        F.coalesce("host_a", "host_b").alias("host_id"),
        F.when(F.col("fp_a").isNull(), "added")
        .when(F.col("fp_b").isNull(), "removed")
        .when(F.col("fp_a") != F.col("fp_b"), "modified")
        .otherwise("unchanged")
        .alias("change"),
    )
    return diff.groupBy("host_id", "change").agg(
        F.count("*").alias("n_urls")
    )


def q_budget_allocation(spark, sf_dir):
    """Budget-constrained fetch allocation: each host gets a fixed
    fetch-cost budget per round; URLs are admitted in value order
    (priority desc, then discovery order) while the running cost total
    fits. The running sum is a window INSIDE the host partition — the
    same per-host partitioning the politeness scheduler already uses,
    so at scale this adds zero extra shuffles to the round plan. Per
    host: admitted count, spent cost, and the number deferred to the
    next round."""
    f = _frontier(spark, sf_dir)
    cost = (F.col("doc_id") % 5 + 1).alias("cost")
    w = Window.partitionBy("host").orderBy(
        F.col("priority").desc(), F.col("discovery_seq")
    )
    planned = f.select("host", "priority", "discovery_seq", cost).withColumn(
        "cum_cost", F.sum("cost").over(w)
    )
    budget = 40
    return planned.groupBy("host").agg(
        F.sum((F.col("cum_cost") <= budget).cast("int")).cast("long").alias(
            "n_admitted"
        ),
        F.max(
            F.when(F.col("cum_cost") <= budget, F.col("cum_cost")).otherwise(
                F.lit(0)
            )
        ).cast("long").alias("spent"),
        F.sum((F.col("cum_cost") > budget).cast("int")).cast("long").alias(
            "n_deferred"
        ),
    )


def q_audio_stats(spark, sf_dir):
    """Multimodal: loudness/silence/clipping gate signals over raw PCM
    audio via Arrow-batched mapInPandas (operators/audio.py). Waveforms
    are synthesized deterministically (seeded per id: tone + silence
    tail, amplitude from the seed). No SQL oracle (binary samples);
    rows-only — the numeric contract is pytest-covered
    (tests/test_audio.py: exact RMS/duration/silence on known
    waveforms)."""
    import numpy as np

    from crawler_spark.operators.audio import pcm_stats

    sr = 8000
    rows = []
    for i in range(64):
        rng = np.random.default_rng(i)
        amp = 2000 + 400 * (i % 16)
        t = np.arange(sr) / sr
        wave = np.rint(
            amp * np.sin(2 * np.pi * (110 + 10 * i) * t)
            + rng.normal(0, 50, sr)
        )
        sil = np.zeros(sr // 4 * (i % 3), dtype=np.float64)
        pcm = np.clip(np.concatenate([wave, sil]), -32768, 32767).astype(
            "<i2"
        )
        rows.append((f"aud-{i}", bytearray(pcm.tobytes()), sr))
    audio = spark.createDataFrame(
        rows, "audio_id string, bytes binary, sample_rate int"
    )
    return pcm_stats(audio)


def q_audio_spectral(spark, sf_dir):
    """Multimodal: frame-wise FFT spectral features over raw PCM
    (operators/audio.py spectral_features) — dominant frequency,
    centroid, rolloff, flatness, 8 log-spaced band energies: the gates
    that catch synthetic tones (flatness ~0, one hot band) and wrapped
    low-bandwidth content (rolloff << Nyquist). Waveforms synthesized
    deterministically (bin-exact tone + seeded noise floor per id). No
    SQL oracle (binary samples + FFT); rows-only — closed-form values
    pytest-covered (tests/test_audio.py planted tones)."""
    import numpy as np

    from crawler_spark.operators.audio import spectral_features

    sr, frame = 8000, 1024
    rows = []
    for i in range(64):
        rng = np.random.default_rng(1000 + i)
        k = 8 + (i % 48)  # FFT bin of the tone
        f0 = k * sr / frame
        t = np.arange(sr * 2) / sr
        wave = 9000 * np.sin(2 * np.pi * f0 * t) + rng.normal(
            0, 30 * (i % 5), sr * 2
        )
        pcm = np.clip(np.rint(wave), -32768, 32767).astype("<i2")
        rows.append((f"aud-{i}", bytearray(pcm.tobytes()), sr))
    audio = spark.createDataFrame(
        rows, "audio_id string, bytes binary, sample_rate int"
    )
    return spectral_features(audio, frame=frame)


def q_audio_vad(spark, sf_dir):
    """Multimodal: energy-threshold voice-activity segmentation — the
    utterance chunker before ASR transcription (operators/audio.py
    vad_segments): tone bursts separated by silence gaps, short pauses
    bridged, blips dropped. Waveforms synthesized deterministically
    (seeded burst layout per id). No SQL oracle (binary samples);
    rows-only — exact boundaries are pytest-covered
    (tests/test_audio.py planted segments)."""
    import numpy as np

    from crawler_spark.operators.audio import vad_segments

    sr = 8000
    rows = []
    for i in range(48):
        rng = np.random.default_rng(1000 + i)
        n_bursts = 1 + i % 4
        pieces = [np.zeros(sr // 4)]
        for b in range(n_bursts):
            dur = sr // 4 + (sr // 8) * int(rng.integers(0, 4))
            t = np.arange(dur) / sr
            pieces.append(
                np.rint(3000 * np.sin(2 * np.pi * (150 + 25 * b) * t))
            )
            pieces.append(np.zeros(sr // 4 + (sr // 16) * int(rng.integers(0, 3))))
        pcm = np.clip(np.concatenate(pieces), -32768, 32767).astype("<i2")
        rows.append((f"vad-{i}", bytearray(pcm.tobytes()), sr))
    audio = spark.createDataFrame(
        rows, "audio_id string, bytes binary, sample_rate int"
    )
    return vad_segments(audio)


def q_cdc_chunk_dedup(spark, sf_dir):
    """Content-defined-chunking dedup (see operators/dedup.py
    cdc_chunks): chunk boundaries ride the content (md5-class tokens),
    so shared spans across near-duplicate pages hash to identical
    chunks regardless of where an edit shifted them — the CDC property
    block hashing lacks. Per doc: chunk count, chunks whose fingerprint
    recurs anywhere in the corpus, and the shared ratio the dedup pass
    uses to pick canonical copies."""
    from crawler_spark.operators.dedup import cdc_chunks

    chunks = cdc_chunks(_t(spark, sf_dir, "documents"))
    occ = chunks.groupBy("chunk_md5").agg(F.count("*").alias("n_occ"))
    return (
        chunks.join(occ, "chunk_md5")
        .groupBy(F.col("id").alias("doc_id"))
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum((F.col("n_occ") > 1).cast("int")).cast("long").alias(
                "n_shared"
            ),
        )
        .withColumn(
            "shared_ratio",
            F.round(F.col("n_shared") / F.col("n_chunks"), 6),
        )
    )


_BPE_MERGES = [("table", "value"), ("the", "line"), ("a", "a")]


def q_bpe_apply(spark, sf_dir):
    """Tokenizer ENCODE side (bpe_merge_pairs is the training side):
    apply a fixed ordered merge list to the word stream — each merge
    rewrites adjacent pair 'x y' to 'x_y' left-to-right, non-overlapping
    (the literal-replace scan both engines share), merges applied in
    priority order exactly like BPE inference. Pure native string ops,
    single scan, no shuffle until the final count agg... actually no
    agg at all: one row per doc with before/after token counts and
    per-merge hit counts (after = before - total hits, an internal
    consistency the oracle re-proves)."""
    docs = _t(spark, sf_dir, "documents")
    s = F.concat(
        F.lit(" "),
        F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "),
        F.lit(" "),
    )
    before = F.size(F.split(F.trim(s), " "))
    for x, y in _BPE_MERGES:
        s = F.replace(s, F.lit(f" {x} {y} "), F.lit(f" {x}_{y} "))
    toks = F.split(F.trim(s), " ")
    out = [F.col("doc_id"), before.cast("long").alias("n_before")]
    for x, y in _BPE_MERGES:
        out.append(
            F.size(
                F.filter(toks, lambda t: t == F.lit(f"{x}_{y}"))  # noqa: B023
            ).cast("long").alias(f"n_{x}_{y}")
        )
    out.append(F.size(toks).cast("long").alias("n_after"))
    return docs.select(*out)


def q_kmv_jaccard(spark, sf_dir):
    """KMV (k-minimum-values) sketch intersection: estimate the Jaccard
    similarity of two user sets (click vs view audiences) from two
    64-value sketches instead of the full sets — the constant-memory
    way to compare 10^10-element sets across crawls. The sketch is the
    k smallest md5 hashes per set (deterministic, so the oracle matches
    bit-for-bit); estimate = |union-sketch ∩ A-sketch ∩ B-sketch| / k.
    The exact Jaccard is computed alongside from a presence agg so the
    row also witnesses the estimator's error."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    sets = ev.select(
        "event_type", F.md5(F.col("user_id").cast("string")).alias("h")
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    sk = sets.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= 64
    )
    a = sk.filter(F.col("event_type") == "click").select(
        "h", F.lit(1).alias("in_a")
    )
    b = sk.filter(F.col("event_type") == "view").select(
        "h", F.lit(1).alias("in_b")
    )
    uni = sk.select("h").distinct().orderBy("h").limit(64)
    est = (
        uni.join(a, "h", "left")
        .join(b, "h", "left")
        .agg(
            F.count("*").alias("k_eff"),
            F.sum(
                (F.coalesce("in_a", F.lit(0)) * F.coalesce("in_b", F.lit(0)))
            ).cast("long").alias("n_both"),
        )
    )
    pres = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "click").cast("int")).alias("ia"),
        F.max((F.col("event_type") == "view").cast("int")).alias("ib"),
    )
    exact = pres.agg(
        (F.sum(F.col("ia") * F.col("ib")) / F.count("*")).alias("exact_j")
    )
    return est.crossJoin(exact).select(
        F.col("k_eff").cast("int").alias("k_eff"),
        F.round(F.col("n_both") / F.col("k_eff"), 6).alias("kmv_jaccard"),
        F.round("exact_j", 6).alias("exact_jaccard"),
    )


def q_trustrank(spark, sf_dir):
    """TrustRank (Gyongyi et al., public VLDB'04): PageRank with the
    teleport mass restricted to a hand-vetted seed set, so trust decays
    with distance from known-good pages and link farms starve. Same
    deterministic two-layer graph as hits_scores; seeds are the 'round'
    hub pages (node % 100 == 0), damping 0.85, 2 iterations. Edge-list
    dataflow (out-degree joined once, per-iteration shuffle join +
    agg); rounds to 6 so both engines' float sums compare."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    edges = (
        docs.select(
            F.col("doc_id").alias("src"),
            (F.col("doc_id") - F.col("doc_id") % 16).alias("dst"),
        )
        .union(docs.select(F.col("doc_id"), (F.col("doc_id") * 7) % 160))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst")))
        .distinct()
    )
    seeds = nodes.filter(F.col("node") % 100 == 0)
    n_seeds = seeds.count()  # tiny driver scalar, mirrors the oracle
    d = 1.0 / n_seeds
    alpha = 0.85
    t = seeds.select("node", F.lit(d).alias("t"))
    for _ in range(2):
        contrib = (
            edges.join(outdeg, "src")
            .join(t.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("t") / F.col("deg")).alias("c"))
        )
        t = (
            nodes.join(contrib, "node", "left")
            .join(seeds.select("node", F.lit(d).alias("d0")), "node", "left")
            .select(
                "node",
                # literal 0.15, not (1 - 0.85): Python's binary 1-0.85 is
                # 0.15000000000000002, the SQL text's 0.15 is not
                _pin(
                    alpha * F.coalesce("c", F.lit(0.0))
                    + 0.15 * F.coalesce("d0", F.lit(0.0)),
                    9,
                ).alias("t"),
            )
            .localCheckpoint()
        )
    return t.filter(F.col("t") > 0).select(
        "node", _pin(F.col("t"), 6).alias("trust")
    )


def q_spam_mass(spark, sf_dir):
    """Spam mass (Gyongyi/Berkhin/Garcia-Molina/Pedersen, public
    VLDB'06 "Link Spam Detection Based on Mass Estimation"): the share
    of a host's PageRank NOT accounted for by trust flowing from a
    vetted seed set — m(v) = (p(v) - t'(v)) / p(v), with t' the
    TrustRank vector rescaled so total trust equals total PageRank
    mass. High mass = authority earned from unvetted neighborhoods
    (link farms); the crawl scheduler demotes those hosts before they
    soak up fetch budget. Reference parity: the reference has no link
    model at all (FIFO rounds, crawler.py) — this is the scale-path
    prioritization layer SURVEY §2.8 calls for.

    Same host graph as host_link_rank; seeds = host_id % 4 == 0 (the
    "hand-vetted" 25%). Both chains are the one-join-one-agg-per-
    iteration dataflow (operators/rank.py link_rank / trust_rank); the
    two totals fold in as one-row broadcast aggregates — no driver
    collect, no global sort. Oracle: two prefixed unrolled-CTE chains
    (_link_rank_sql + _trust_rank_sql) composed in one query."""
    from crawler_spark.operators.rank import link_rank, trust_rank

    d6 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 6, 1)) - 1)"
    d7 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 7, 1)) - 1)"
    docs = _t(spark, sf_dir, "documents")
    edges = (
        docs.select(
            (F.col("doc_id") % 20).alias("src"),
            F.expr(f"(16 * {d6} + {d7}) % 20").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("weight"))
    )
    seeds = spark.range(0, 20, 4).select(F.col("id").alias("node"))
    p = link_rank(edges, n_iter=3)
    t = trust_rank(edges, seeds, n_iter=3)
    psum = p.agg(_pin(F.sum("rank"), 9).alias("p_total"))
    tsum = t.agg(_pin(F.sum("trust"), 9).alias("t_total"))
    return (
        p.join(t, "node")
        .crossJoin(F.broadcast(psum))
        .crossJoin(F.broadcast(tsum))
        .select(
            F.col("node").alias("host_id"),
            _pin(F.col("rank"), 6).alias("rank"),
            _pin(F.col("trust"), 6).alias("trust"),
            _pin(
                (
                    F.col("rank")
                    - _pin(
                        F.col("trust") * F.col("p_total") / F.col("t_total"), 9
                    )
                )
                / F.col("rank"),
                6,
            ).alias("spam_mass"),
        )
    )


def q_weighted_sample(spark, sf_dir):
    """Distributed weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis, public IPL'06): each row draws key = ln(u)/w with u
    uniform and w its weight; the k largest keys are an exact weighted
    sample. u comes from two md5 hex digits so both engines draw the
    SAME uniforms — the estimator is deterministic end-to-end. The
    top-k is TakeOrdered (per-partition heap + driver merge), never a
    global sort: the canonical way to pull a curation sample from a
    10^10-row frontier in one pass."""
    f = _frontier(spark, sf_dir)
    d1 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 1, 1)) - 1)"
    d2 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 2, 1)) - 1)"
    keyed = f.select(
        "doc_id",
        "host",
        (F.col("priority") + 1).alias("w"),
        (
            F.log((F.expr(f"{d1} * 16 + {d2}") + 0.5) / 256.0)
            / (F.col("priority") + 1)
        ).alias("es_key"),
    )
    return (
        keyed.orderBy(F.col("es_key").desc(), F.col("doc_id"))
        .limit(32)
        .select("doc_id", "host", "w", F.round("es_key", 6).alias("es_key"))
    )


def q_vocab_coverage(spark, sf_dir):
    """Tokenizer vocab coverage / OOV rate: fix the vocabulary to the
    corpus's top-64 tokens (count desc, token asc — deterministic),
    then report per doc how many token occurrences fall outside it.
    The vocab is tiny by construction, so the join back is a broadcast
    — per-doc scoring never shuffles the corpus; only the one
    map-side-combined count agg does."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.split(
                F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " "
            )
        ).alias("tok"),
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(64)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.coalesce("in_vocab", F.lit(0))).cast("long").alias(
                "n_in_vocab"
            ),
        )
        .withColumn(
            "oov_rate",
            F.round(1 - F.col("n_in_vocab") / F.col("n_tokens"), 6),
        )
    )


def q_ip_politeness(spark, sf_dir):
    """IP-level shared politeness — virtual hosting means dozens of
    hostnames resolve to one server, and a polite crawler budgets per
    IP, not per hostname (the classic Mercator refinement). Hosts map
    deterministically onto 8 'IPs' (md5 digit — the stand-in for a DNS
    dimension); each IP admits 6 URLs per round, each HOST alone would
    admit 4. The output exposes the collision: rows admitted under the
    host budget but deferred by the shared-IP budget. Two windows over
    the same crawl order; at 10^10 rows both keys get the salted
    two-phase treatment politeness_select uses — here the plans stay
    single-window since the per-key admit depth is tiny."""
    f = _frontier(spark, sf_dir).withColumn(
        "ip_id",
        F.expr("(instr('0123456789abcdef', substring(md5(host), 1, 1)) - 1) % 8"),
    )
    order = [F.col("priority"), F.col("depth"), F.col("discovery_seq")]
    r_ip = F.row_number().over(Window.partitionBy("ip_id").orderBy(*order))
    r_host = F.row_number().over(Window.partitionBy("host").orderBy(*order))
    return f.select(
        "doc_id",
        "host",
        "ip_id",
        r_ip.alias("rank_ip"),
        r_host.alias("rank_host"),
    ).select(
        "doc_id",
        "host",
        "ip_id",
        "rank_ip",
        (F.col("rank_ip") <= 6).alias("admitted_ip"),
        (F.col("rank_host") <= 4).alias("admitted_host"),
    )


def q_span_dedup_stats(spark, sf_dir):
    """C4's global span dedup as per-document removal statistics: every
    5-word window is fingerprinted; a window whose text occurs in >= 2
    DISTINCT documents is duplicate mass slated for removal. Per doc:
    window count, cross-doc duplicate windows, removal fraction. Shape:
    one explode, (window -> distinct-doc count) aggregation, join the
    (window, n_docs>=2) set back, per-doc agg — the frequency table is
    corpus-vocabulary sized, never quadratic (contrast
    substring_overlap, which materializes the PAIRS). At 100 TB the
    distinct-doc count becomes a 2-level (window, doc)->window agg —
    exactly what this plan already does."""
    ws = F.col("__ws")
    wins = F.transform(
        F.sequence(F.lit(1), F.size(ws) - 4),
        lambda i: F.concat_ws(" ", F.slice(ws, i, 5)),
    )
    d = _t(spark, sf_dir, "documents")
    win_rows = (
        d.select(
            "doc_id",
            F.split(F.lower(F.trim(F.col("text"))), "\\s+").alias("__ws"),
        )
        .filter(F.size(ws) >= 5)
        .select("doc_id", F.explode(wins).alias("win"))
    )
    freq = (
        win_rows.select("doc_id", "win")
        .distinct()
        .groupBy("win")
        .agg(F.count("*").alias("n_docs"))
    )
    return (
        win_rows.join(freq, "win")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_windows"),
            F.sum((F.col("n_docs") >= 2).cast("long")).alias("dup_windows"),
        )
        .withColumn(
            "removal_frac",
            _pin(F.col("dup_windows") / F.col("n_windows"), 6),
        )
    )


def q_host_mirror_jaccard(spark, sf_dir):
    """Mirror-host detection: Jaccard similarity between hosts' content
    5-gram shingle SETS — the crawl-planner pass that spots mirrored
    sites (and DUST hosts) so one replica gets the budget. Intersections
    come from a self-join on the shingle (candidates only where content
    is actually shared — never hosts x hosts; at web scale, frequent
    shingles get DF-capped first, exactly like ngram_jaccard_capped,
    to bound the per-shingle host fan-out), set sizes broadcast back.
    Output: host pairs sharing any shingle, with exact Jaccard."""
    ws = F.col("__ws")
    wins = F.transform(
        F.sequence(F.lit(1), F.size(ws) - 4),
        lambda i: F.concat_ws(" ", F.slice(ws, i, 5)),
    )
    d = (
        _t(spark, sf_dir, "documents")
        .select(
            F.concat(F.lit("host-"), (F.col("doc_id") % 20).cast("string")).alias(
                "host"
            ),
            F.split(F.lower(F.trim(F.col("text"))), "\\s+").alias("__ws"),
        )
        .filter(F.size(ws) >= 5)
        .select("host", F.explode(wins).alias("fp"))
        .distinct()
    )
    sizes = d.groupBy("host").agg(F.count("*").alias("n"))
    pairs = (
        d.alias("a")
        .join(d.alias("b"), "fp")
        .filter(F.col("a.host") < F.col("b.host"))
        .groupBy(F.col("a.host").alias("host_a"), F.col("b.host").alias("host_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("host").alias("host_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("host").alias("host_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "host_a")
        .join(F.broadcast(sb), "host_b")
        .select(
            "host_a",
            "host_b",
            "inter",
            _pin(
                F.col("inter")
                / (F.col("n_a") + F.col("n_b") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
    )


def q_mime_sniff(spark, sf_dir):
    """Content-type sniffing vs the declared format — the crawl-side
    defense against mislabeled payloads (servers lie in Content-Type
    constantly). Sniffs the PNG signature from the first 8 BYTES of the
    binary column with native expressions (no Python, no decode); every
    5th image's declared fmt is deliberately spoofed to exercise the
    mismatch path. No SQL oracle (binary payloads); the sniff rule is
    pytest-covered in test_mime_sniff."""
    urls = [f"http://host-0.test/p0/d0/img-{i}" for i in range(64)]
    # spoof every 5th label (by url index) to the OTHER format
    spoof = F.regexp_extract("url", r"img-(\d+)$", 1).cast("int") % 5 == 0
    images = (
        _synth_image_df(spark, urls, with_url=True)
        .withColumn(
            "fmt",
            F.when(
                spoof, F.when(F.col("fmt") == "qdct", "png").otherwise("qdct")
            ).otherwise(F.col("fmt")),
        )
        .drop("url")
    )
    sniffed = images.select(
        "image_id",
        F.col("fmt").alias("declared"),
        F.when(
            F.expr("substring(bytes, 1, 8)")
            == F.lit(bytes(b"\x89PNG\r\n\x1a\n")),
            "png",
        )
        .otherwise("qdct")
        .alias("sniffed"),
    )
    return sniffed.groupBy("declared", "sniffed").agg(
        F.count("*").alias("n")
    )


def q_latency_percentiles(spark, sf_dir):
    """Per-host fetch-latency tail report (p50/p95/p99/max) — the
    operational dashboard every crawl scheduler watches: p99 per host
    drives the AIMD politeness backoff, fleet-wide p50 sizes the fetch
    executor pool. Uses Spark's EXACT `percentile` aggregate, whose
    linear interpolation matches DuckDB's quantile_cont bit-for-bit
    (verified), so the oracle is exact. At 10^10 rows the exact
    aggregate holds one sorted host's latencies per task — fine under
    host partitioning; fleet-wide tails would swap to approx_percentile
    (t-digest) at a documented accuracy bound."""
    d1 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 1, 1)) - 1)"
    d2 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 2, 1)) - 1)"
    f = _frontier(spark, sf_dir)
    lat = f.select(
        "host",
        (
            50.0
            + F.expr(f"({d1} * 16 + {d2})") * 7.0
            + F.col("priority") * 100.0
        ).alias("lat_ms"),
    )
    return lat.groupBy("host").agg(
        F.count("*").alias("n"),
        F.round(F.expr("percentile(lat_ms, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(lat_ms, 0.95)"), 6).alias("p95"),
        F.round(F.expr("percentile(lat_ms, 0.99)"), 6).alias("p99"),
        F.max("lat_ms").alias("max_ms"),
    )


def q_hdr_latency_quantiles(spark, sf_dir):
    """Mergeable quantile SKETCH twin of latency_percentiles: per-host
    HDR-style log-linear histograms (operators/sketches.py hdr_buckets,
    integer-exact bucket math — no float log in any grouping key), plus
    a '__fleet__' row built by MERGING the per-host sketches (summing
    bucket counts — no second pass over raw data). This is the 100 TB
    plan: exact `percentile` holds one host's sorted latencies per
    task; the sketch caps state at 64*16 rows per group however large n
    gets, and rolls up host -> fleet for free. Midpoint estimates are
    int64-over-2^5, exact in doubles; the per-host rows carry the exact
    nearest-rank value (partitioned window — cheap per host) and the
    observed rel. error in permille, bounded by 1000/(2*16) ~= 31 by
    construction. Fleet rows skip the exact witness (a global exact
    rank would need the single-partition sort this sketch exists to
    avoid; exact_global_median covers that path separately)."""
    from crawler_spark.operators.sketches import hdr_buckets, hdr_quantiles

    d1 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 1, 1)) - 1)"
    d2 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 2, 1)) - 1)"
    f = _frontier(spark, sf_dir)
    lat = f.select(
        "host",
        "doc_id",
        (
            F.lit(50)
            + F.expr(f"({d1} * 16 + {d2})") * F.lit(7)
            + F.col("priority") * F.lit(100)
        ).cast("long").alias("lat_ms"),
    )
    per_host = hdr_buckets(lat, "lat_ms", ["host"])
    fleet = (
        per_host.groupBy("e", "m")
        .agg(F.sum("cnt").alias("cnt"))
        .withColumn("host", F.lit("__fleet__"))
        .select("host", "e", "m", "cnt")
    )
    qs = hdr_quantiles(per_host.unionByName(fleet), ["host"])
    wr = Window.partitionBy("host").orderBy("lat_ms", "doc_id")
    ranked = lat.withColumn("rn", F.row_number().over(wr).cast("long")).select(
        "host", F.col("lat_ms").alias("exact_ms"), "rn"
    )
    return qs.join(
        ranked,
        (qs["host"] == ranked["host"]) & (qs["rnk"] == ranked["rn"]),
        "left",
    ).select(
        qs["host"],
        "q_permille",
        "n",
        "rnk",
        "est_mid",
        "exact_ms",
        F.floor(
            F.abs(F.col("est_mid") - F.col("exact_ms"))
            / F.col("exact_ms")
            * F.lit(1000.0)
        ).alias("rel_err_permille"),
    )


def q_snm_blocking_pairs(spark, sf_dir):
    """Sorted-neighborhood dedup blocking (Hernandez & Stolfo '95) —
    the blocking family the LSH suite lacks: near-dups whose PREFIXES
    sort adjacently are caught by a rank-window candidate join even
    when no shingle or band hashes them together. Blocking key = first
    12 chars of the whitespace-collapsed lowercased text; global rank
    via assign_dense_seq (range shuffle + broadcast offsets — no
    single-partition window); window w=4 -> 3 candidate gaps per row
    via an EQUI-join on rank+gap. Verification = distinct-unigram
    Jaccard on candidates only, pinned at 6dp with the floor(x*1e6+.5)
    rule (quotients of small ints can land exactly on round-half
    boundaries; see SCALE.md cross-engine determinism)."""
    from crawler_spark.operators.dedup import snm_candidate_pairs

    docs = _t(spark, sf_dir, "documents")
    norm = docs.select(
        "doc_id",
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ").alias("t"),
    )
    keyed = norm.select("doc_id", F.substring("t", 1, 12).alias("k"))
    cand = snm_candidate_pairs(keyed, "k", "doc_id", window=4).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "gap"
    )
    toks = norm.select(
        "doc_id",
        F.array_distinct(
            F.filter(F.split(F.col("t"), " "), lambda x: x != "")
        ).alias("toks"),
    )
    ta = toks.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a"))
    tb = toks.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b"))
    jac = (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn(
            "jaccard",
            F.expr(
                "floor(cast(size(array_intersect(toks_a, toks_b)) as double)"
                " * 1000000 / size(array_union(toks_a, toks_b)) + 0.5)"
                " / 1000000"
            ),
        )
        .filter(F.col("jaccard") >= 0.5)
    )
    return jac.select("doc_a", "doc_b", "gap", "jaccard")


def q_slo_burn_alerts(spark, sf_dir):
    """Multiwindow error-budget burn-rate alerting (the SRE-standard
    page condition): per event type, the error rate over a SHORT (1h)
    and LONG (6h) trailing window, each divided by the SLO's allowed
    error rate (2%); page only when BOTH burn rates exceed 6x — the
    long window keeps one bad minute from paging, the short window
    ends the page quickly once recovery starts. Errors are planted
    deterministically (value > 300); windows are value-RANGE frames
    over hour buckets, counts are exact integers, burn rates exact
    ratios pinned at 1e-6."""
    e = _t(spark, sf_dir, "events")
    hours = e.select(
        "event_type",
        F.expr(
            "cast(floor(unix_micros(cast(ts as timestamp)) / 3600000000)"
            " as long)"
        ).alias("hour"),
        (F.col("value") > 300.0).cast("long").alias("is_err"),
    )
    hourly = hours.groupBy("event_type", "hour").agg(
        F.count("*").alias("n"), F.sum("is_err").alias("errs")
    )
    w1 = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rangeBetween(0, 0)
    )
    w6 = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rangeBetween(-5, 0)
    )
    slo = 0.02
    burn = (
        hourly.withColumn("n1", F.sum("n").over(w1))
        .withColumn("e1", F.sum("errs").over(w1))
        .withColumn("n6", F.sum("n").over(w6))
        .withColumn("e6", F.sum("errs").over(w6))
        .withColumn(
            "burn_short",
            F.col("e1").cast("double") / F.col("n1") / F.lit(slo),
        )
        .withColumn(
            "burn_long",
            F.col("e6").cast("double") / F.col("n6") / F.lit(slo),
        )
    )
    p6 = lambda c: F.expr(
        f"cast(floor(({c}) * 1e6 + 0.5) as double) / 1e6"
    )  # noqa: E731
    return burn.select(
        "event_type",
        "hour",
        F.col("n1").cast("long").alias("n_short"),
        F.col("e1").cast("long").alias("err_short"),
        p6("burn_short").alias("burn_short6"),
        p6("burn_long").alias("burn_long6"),
        ((F.col("burn_short") > 6.0) & (F.col("burn_long") > 6.0)).alias(
            "page"
        ),
    )


def q_ht_corpus_totals(spark, sf_dir):
    """Horvitz-Thompson corpus totals from an unequal-probability
    sample (operators/stats.py ht_total_estimate): strata sampled at
    different md5-gated rates (the politeness-bias model: URGENT
    orders oversampled 4x), every sampled row weighted 1/pi — the
    unbiased estimator a plain scaled mean is NOT under biased
    sampling. Weighted sums are pinned decimal accumulations; exact
    totals ride along as the sandbox witness."""
    from crawler_spark.operators.stats import ht_total_estimate

    o = _t(spark, sf_dir, "orders")
    rates = spark.createDataFrame(
        [
            ("1-URGENT", 400),
            ("2-HIGH", 200),
            ("3-MEDIUM", 100),
            ("4-NOT SPECIFIED", 100),
            ("5-LOW", 50),
        ],
        "o_orderpriority string, permille int",
    )
    out = ht_total_estimate(
        o, rates, "o_orderpriority", "o_orderkey", "o_totalprice"
    )
    p6 = lambda c: F.expr(
        f"cast(floor(({c}) * 1e6 + 0.5) as double) / 1e6"
    )  # noqa: E731
    return out.select(
        "o_orderpriority",
        "n_sampled",
        p6("est_rows").alias("est_rows6"),
        p6("est_total").alias("est_total6"),
        "exact_rows",
        p6("exact_total").alias("exact_total6"),
    )


def q_host_latency_mk_trend(spark, sf_dir):
    """Mann-Kendall monotone-trend test per event type (operators/
    robust.py mann_kendall) — Theil-Sen's significance companion on
    the same md5-sampled series: S and the tie-corrected variance are
    integer arithmetic end to end, so the statistic needs no pinning
    at all; |z| > 1.96 flags a trend at 5%."""
    from crawler_spark.operators.robust import mann_kendall

    e = _t(spark, sf_dir, "events")
    samp = e.filter(
        F.expr(
            "pmod(cast(conv(substring(md5(concat('ts:', cast(event_id as "
            "string))), 1, 15), 16, 10) as bigint), 1000) < 10"
        )
    ).select(
        "event_type",
        (
            (F.unix_micros(F.col("ts").cast("timestamp")) - F.lit(1704067200000000))
            / F.lit(3.6e9)
        ).alias("xh"),
        "value",
    )
    t = mann_kendall(samp, "event_type", "xh", "value")
    p6 = lambda c: F.expr(
        f"cast(floor(({c}) * 1e6 + 0.5) as double) / 1e6"
    )  # noqa: E731
    return t.select(
        "event_type", "n_points", "s_stat", "var_s18",
        p6("z").alias("z6"), "trending",
    )


def q_psi_feature_drift(spark, sf_dir):
    """Population Stability Index (the standard model-ops drift gate;
    operators/stats.py psi_bins) on the order-value distribution: the
    parity split of one corpus must score stable (PSI < 0.1) while a
    value-biased wave (URGENT-priority orders only) scores drifted —
    both from B-row count tables, Laplace-smoothed so empty bins never
    blow up. Fixed literal bin edges keep binning deterministic."""
    from crawler_spark.operators.stats import psi_bins

    o = _t(spark, sf_dir, "orders")
    binned = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.least(
            F.floor(F.col("o_totalprice") / F.lit(50000.0)).cast("int"),
            F.lit(11),
        ).alias("bin"),
    )
    a = binned.filter(F.col("o_orderkey") % 2 == 0)
    b = binned.filter(F.col("o_orderkey") % 2 == 1)
    drift = binned.filter(F.col("o_orderpriority") == "1-URGENT")
    p6 = lambda c: F.expr(
        f"cast(floor(({c}) * 1e6 + 0.5) as double) / 1e6"
    )  # noqa: E731

    def emit(tag, df):
        return df.select(
            F.lit(tag).alias("cmp"),
            "bin",
            "n_a",
            "n_b",
            p6("pa").alias("pa6"),
            p6("pb").alias("pb6"),
            p6("contrib").alias("contrib6"),
            p6("psi").alias("psi6"),
        )

    return emit("parity", psi_bins(a, b, "bin", 12)).unionByName(
        emit("priority_biased", psi_bins(a, drift, "bin", 12))
    )


def q_ivm_incremental_join(spark, sf_dir):
    """Incremental view maintenance for JOINS — the delta rule
    Δ(R ⋈ S) = ΔR ⋈ S_old ∪ R_old ⋈ ΔS ∪ ΔR ⋈ ΔS — completing the IVM
    algebra next to ivm_incremental_agg's aggregate merges: when a
    crawl round appends to BOTH sides of a materialized join (new
    orders AND new lineitems), the view updates from the three delta
    joins (each bounded by a delta's size at 10^10 rows) instead of a
    full re-join. Proof shape: per join key, |base| + |delta terms| ==
    |full recompute|, emitted as per-key counts with a match flag; a
    single FALSE anywhere fails the oracle hash."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    o_old = o.filter(F.col("o_orderkey") % 13 != 7)
    o_new = o.filter(F.col("o_orderkey") % 13 == 7)
    l_old = l.filter(F.col("l_linenumber") % 5 != 3)
    l_new = l.filter(F.col("l_linenumber") % 5 == 3)
    ok = F.col("o_orderkey") == F.col("l_orderkey")

    def cnt(df, name):
        return df.groupBy(
            F.col("o_orderkey").alias("k")
        ).agg(F.count("*").alias(name))

    base = cnt(o_old.join(l_old, ok), "n_base")
    d1 = cnt(o_new.join(l_old, ok), "n_dr_s")
    d2 = cnt(o_old.join(l_new, ok), "n_r_ds")
    d3 = cnt(o_new.join(l_new, ok), "n_dr_ds")
    full = cnt(o.join(l, ok), "n_full")
    merged = (
        full.join(base, "k", "left")
        .join(d1, "k", "left")
        .join(d2, "k", "left")
        .join(d3, "k", "left")
        .select(
            "k",
            *[
                F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
                for c in ("n_base", "n_dr_s", "n_r_ds", "n_dr_ds", "n_full")
            ],
        )
        .withColumn(
            "delta_rule_holds",
            F.col("n_base")
            + F.col("n_dr_s")
            + F.col("n_r_ds")
            + F.col("n_dr_ds")
            == F.col("n_full"),
        )
    )
    return merged


def q_ivm_incremental_agg(spark, sf_dir):
    """Incremental view maintenance for the round-metrics dashboards:
    merge a BASE aggregate with a DELTA aggregate (one crawl round's
    appended rows — what catalog.read_incremental hands a consumer) and
    prove the merge equals the full recompute, per group. This is the
    self-maintainability algebra every per-round rollup relies on at
    10^10 rows: count/sum merge by +, min/max by pairwise least/greatest
    (null-aware — a group absent from one side adopts the other), avg
    derives from (sum, cnt). COUNT DISTINCT is deliberately absent: it
    is NOT self-maintainable from partials (that's what the HLL register
    tables are for — see hll_distinct). Sums run in DECIMAL(38,9) so
    base+delta and the one-pass total are bit-identical regardless of
    partial-aggregation order (SCALE.md determinism rule); the published
    double is pinned once at the end. Delta = event_id % 10 = 7 (a
    deterministic ~10% slice standing in for the latest snapshot
    window)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.col("value").cast("decimal(38,9)").alias("v"),
    )

    def agg(df):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("c"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )

    b = agg(ev.filter(F.col("event_id") % 10 != 7))
    d = agg(ev.filter(F.col("event_id") % 10 == 7))
    for c in ("c", "s", "mn", "mx"):
        d = d.withColumnRenamed(c, f"d_{c}")
    m = b.join(d, "event_type", "full_outer").select(
        "event_type",
        (F.coalesce("c", F.lit(0)) + F.coalesce("d_c", F.lit(0))).alias("mc"),
        (
            F.coalesce(F.col("s"), F.lit(0).cast("decimal(38,9)"))
            + F.coalesce(F.col("d_s"), F.lit(0).cast("decimal(38,9)"))
        ).alias("ms"),
        F.when(F.col("mn").isNull(), F.col("d_mn"))
        .when(F.col("d_mn").isNull(), F.col("mn"))
        .when(F.col("mn") < F.col("d_mn"), F.col("mn"))
        .otherwise(F.col("d_mn"))
        .alias("mmn"),
        F.when(F.col("mx").isNull(), F.col("d_mx"))
        .when(F.col("d_mx").isNull(), F.col("mx"))
        .when(F.col("mx") > F.col("d_mx"), F.col("mx"))
        .otherwise(F.col("d_mx"))
        .alias("mmx"),
    )
    full = agg(ev)
    for c in ("c", "s", "mn", "mx"):
        full = full.withColumnRenamed(c, f"f_{c}")
    return m.join(full, "event_type").select(
        "event_type",
        F.col("mc").cast("long").alias("cnt"),
        (F.col("mc") == F.col("f_c")).alias("cnt_ok"),
        (F.col("ms") == F.col("f_s")).alias("sum_ok"),
        (F.col("mmn") == F.col("f_mn")).alias("min_ok"),
        (F.col("mmx") == F.col("f_mx")).alias("max_ok"),
        F.expr("floor(cast(ms as double) * 1000000 + 0.5) / 1000000").alias(
            "sum_v"
        ),
        F.expr(
            "floor(cast(ms as double) / mc * 1000000 + 0.5) / 1000000"
        ).alias("avg_v"),
    )


def q_wds_export(spark, sf_dir):
    """WebDataset export (sources/wds.py) — the terminal hop of the
    image+caption pipeline: synthesize 64 image+caption pairs, assign 4
    shards, write byte-deterministic tar shards with the two-phase
    manifest commit, and return the published manifest (shard_id,
    n_samples, sha256). The sha256 column is stable across runs and
    partitionings (sorted members, zeroed tar metadata) — the property
    shard_checksums relies on. No SQL oracle (tar framing); rows-only —
    round trip, determinism, and manifest gating are pytest-covered
    (tests/test_wds.py)."""
    import shutil
    import tempfile

    from crawler_spark.sources.wds import write_webdataset

    urls = [f"http://host-0.test/p0/d0/img-{i}" for i in range(64)]
    imgs = _synth_image_df(spark, urls, with_url=False)
    pairs = imgs.select(
        F.col("image_id").alias("sample_id"),
        "bytes",
        "fmt",
        F.concat(F.lit("caption for "), F.col("image_id")).alias("caption"),
        F.pmod(F.xxhash64("image_id"), F.lit(4)).cast("int").alias("shard_id"),
    )
    td = tempfile.mkdtemp(prefix="wds_export_")
    try:
        return write_webdataset(pairs, td)  # already driver-materialized
    finally:
        shutil.rmtree(td, ignore_errors=True)


def q_trailing_window_load(spark, sf_dir):
    """Value-RANGE window frame (the one frame family the ROWS-based
    trend queries don't exercise): per event type, trailing-3600-second
    event count and value sum at every event — the fetch-load trace an
    operator watches for burst detection. RANGE frames are the
    tie-SAFE choice here: peers (equal timestamps) always share one
    frame in every engine, where a ROWS frame would depend on tie
    order. Partitioned by event_type so no window needs a global sort;
    the sum runs in DECIMAL for order independence and is pinned once
    at the end."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        # session TZ is pinned UTC (session.py), so unix seconds of an
        # NTZ timestamp are well-defined; to_unix_timestamp truncates
        # micros = the oracle's epoch_us // 1e6 floor
        F.expr("to_unix_timestamp(ts)").alias("t"),
        F.col("value").cast("decimal(38,9)").alias("v"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t")
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "event_type",
        "t",
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        F.expr(
            "floor(cast(sum(v) over (partition by event_type order by t "
            "range between 3600 preceding and current row) as double) "
            "* 1000000 + 0.5) / 1000000"
        ).alias("sum_trailing"),
    )


def q_jsonl_quarantine(spark, sf_dir):
    """Dirty-JSON ingestion triage (the T4 late/dirty-data analog for
    semi-structured payloads — the reference skips and counts malformed
    rows, base_crawler.py:320-327; a JSONL crawl feed needs the same
    split): PERMISSIVE from_json, then classify each row as ok /
    badtype (valid JSON, field fails the schema's type — from_json
    nulls just that field) / corrupt (unparseable — from_json nulls the
    whole struct), with per-class counts and the extracted sum over the
    rows that survived. Corruption is synthesized deterministically
    (doc_id % 7 = 3 → truncated JSON, % 7 = 5 → wrong-typed field).
    The oracle mirrors the classification with json_valid + TRY-style
    extraction. At scale this is one map + one 3-group agg; the
    quarantine branch would side-output to a table exactly like
    fetch_failures."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    js = (
        F.when(
            F.col("doc_id") % 7 == 3,
            F.concat(F.lit('{"a": '), F.col("doc_id"), F.lit(', "b": ')),
        )
        .when(F.col("doc_id") % 7 == 5, F.lit('{"a": "x", "b": "v"}'))
        .otherwise(
            F.concat(
                F.lit('{"a": '),
                F.col("doc_id"),
                F.lit(', "b": "v'),
                (F.col("doc_id") % 5).cast("string"),
                F.lit('"}'),
            )
        )
    )
    p = docs.select(
        "doc_id", F.from_json(js, "a bigint, b string").alias("p")
    )
    status = (
        F.when(
            F.col("p.a").isNull() & F.col("p.b").isNull(), F.lit("corrupt")
        )
        .when(F.col("p.a").isNull(), F.lit("badtype"))
        .otherwise(F.lit("ok"))
    )
    return (
        p.select(status.alias("status"), F.col("p.a").alias("a"))
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("a").alias("sum_a"),
        )
    )


def q_host_two_hop_reach(spark, sf_dir):
    """Two-hop reach per host (friend-of-friend expansion over the host
    link graph): how many hosts are exactly two clicks away — the
    crawl-planning signal for how fast a frontier fans out from a seed
    set (pairs with seed_distance's exact BFS and discovery_curve's
    round-by-round growth). One self-join of the edge list on the
    middle vertex, distinct, minus self and minus direct edges. Scale:
    the join is balanced while mid-vertex out-degree is bounded — a hub
    middle makes the pair volume quadratic in its degree, so at web
    scale the mid side gets a degree cap first (same DF-cap discipline
    as hot shingles in the LSH family); the derived graph here has
    bounded degree by construction. Integer keys end-to-end."""
    d6 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 6, 1)) - 1)"
    d7 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 7, 1)) - 1)"
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    edges = (
        docs.select(
            (F.col("doc_id") % 40).cast("long").alias("src"),
            F.expr(f"cast(({d6} * 16 + {d7}) % 40 as bigint)").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    e1, e2 = edges.alias("e1"), edges.alias("e2")
    two = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .select(F.col("e1.src").alias("src"), F.col("e2.dst").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    reach = two.join(edges, ["src", "dst"], "left_anti")
    return reach.groupBy("src").agg(F.count(F.lit(1)).alias("n_two_hop"))


def q_audio_fingerprint_match(spark, sf_dir):
    """Multimodal retrieval: Shazam-style landmark fingerprinting
    (operators/audio.py audio_landmarks / landmark_match) — per-frame
    spectral peak pairs packed into int64 hashes, probes matched by
    hash equi-join + offset-vote histogram. 24 synthetic tracks (seeded
    multi-tone + noise), 8 frame-aligned excerpts as probes; every
    probe must recover its source track at the exact frame offset (16).
    No SQL oracle (FFT over binary samples); rows-only — planted-match
    recovery, foreign-probe rejection, and partitioning invariance are
    pytest-covered (tests/test_audio_fp.py)."""
    import numpy as np

    from crawler_spark.operators.audio import audio_landmarks, landmark_match

    sr = 8000
    frame = 512
    n_fr = 3 * sr // frame  # ~3 s

    def wave(seed):
        # frequency-hopping multi-tone (bin-exact at sr/frame): frames
        # are pairwise distinct, so offset votes concentrate at the true
        # alignment instead of smearing over a periodic signal
        rng = np.random.default_rng(1000 + seed)
        hops = rng.integers(8, 200, size=(n_fr, 3)) * (sr / frame)
        tl = np.arange(frame) / sr
        x = np.concatenate(
            [
                sum(
                    (1500 + 300 * k) * np.sin(2 * np.pi * f * tl)
                    for k, f in enumerate(hops[j])
                )
                for j in range(n_fr)
            ]
        )
        x = x + rng.normal(0, 60, n_fr * frame)
        return np.clip(np.rint(x), -32768, 32767).astype("<i2")

    tracks = [(f"trk-{i}", bytearray(wave(i).tobytes())) for i in range(24)]
    probes = [
        (f"probe-{i}", bytearray(wave(i).tobytes()[2 * 8192 : 2 * 16384]))
        for i in range(8)
    ]
    index = audio_landmarks(
        spark.createDataFrame(tracks, "audio_id string, bytes binary")
    )
    probe = audio_landmarks(
        spark.createDataFrame(probes, "audio_id string, bytes binary")
    )
    return landmark_match(index, probe).orderBy("probe_id")


def q_compression_gate(spark, sf_dir):
    """Deflate-ratio quality gate (operators/corpus.py compression_gate)
    — the CCNet/Gopher-family repetition proxy: compressed/raw length of
    the UTF-8 text flags template-farm repetition (ratio too low) and
    high-entropy non-text (ratio too high). zlib is stdlib+level-pinned
    (deterministic here) but not SQL-expressible, so this is rows-only;
    test_compression mirrors the UDF with direct zlib calls row by
    row. Pure map stage: no shuffle, text column only."""
    from crawler_spark.operators.corpus import compression_gate

    return compression_gate(_t(spark, sf_dir, "documents"))


def q_html_extract(spark, sf_dir):
    """The parse stage of the fetch loop (reference: DOM queries inside
    the browser, crawler.py element waits): extract title, outlink
    count, and visible-text length from HTML markup with pure native
    regexes — codegen all the way, no parser library, the same design
    as the sitemap/WARC sources. Markup is synthesized from documents
    (title = first 3 words, body = text, 1-2 nav links), then parsed
    BACK, so the oracle independently re-derives every output from the
    raw text — a lossless-extraction proof, not a tautology."""
    docs = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    title = F.array_join(F.slice(F.split(norm, " "), 1, 3), " ")
    markup = F.concat(
        F.lit("<html><head><title>"),
        title,
        F.lit("</title></head><body><p>"),
        norm,
        F.lit('</p><a href="/doc/'),
        (F.col("doc_id") + 1).cast("string"),
        F.lit('">next</a>'),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit('<a href="/doc/'),
                (F.col("doc_id") + 2).cast("string"),
                F.lit('">skip</a>'),
            ),
        ).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    page = docs.select("doc_id", markup.alias("html"))
    return page.select(
        "doc_id",
        F.regexp_extract("html", "<title>([^<]*)</title>", 1).alias("title"),
        F.size(
            F.expr("regexp_extract_all(html, '<a href=\"([^\"]*)\"', 1)")
        ).cast("long").alias("n_links"),
        F.length(
            F.regexp_replace("html", "<[^>]*>", "")
        ).cast("long").alias("visible_chars"),
    )


def q_conditional_get(spark, sf_dir):
    """Conditional-GET (If-None-Match/ETag) revisit audit: on a
    recrawl, URLs whose content is unchanged answer 304 with no body —
    the crawler pays one round trip but zero bandwidth. Change bits are
    the same md5-digit draw change_rate uses (x>0 means the page
    changed since last visit), body cost is the text length. Per host:
    revisits, 304 share, and bytes saved vs an unconditional refetch —
    the number that justifies ETag caching in the fetch loop. One
    map-side-combinable agg over the frontier derivation."""
    d8 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 8, 1)) - 1)"
    f = _frontier(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents").select("doc_id", F.length("text").alias("body_len"))
    rev = f.join(docs, "doc_id").select(
        "host",
        "body_len",
        (F.expr(f"{d8} % (4 + doc_id % 5 + 1)") > 0).cast("int").alias(
            "changed"
        ),
    )
    return rev.groupBy("host").agg(
        F.count("*").alias("n_revisits"),
        F.sum(1 - F.col("changed")).cast("long").alias("n_304"),
        F.round(
            F.avg(1 - F.col("changed")), 6
        ).alias("not_modified_share"),
        F.sum(
            F.when(F.col("changed") == 0, F.col("body_len")).otherwise(0)
        ).cast("long").alias("bytes_saved"),
    )


def q_source_mixture(spark, sf_dir):
    """Training-mixture reweighting across sources (the DoReMi /
    data-mixing step every corpus build ends with): per source, token
    mass and a sqrt-damped mixture weight w_s ∝ sqrt(tokens_s)
    (upweights small sources, tempers the head), normalized over
    sources, plus the per-source sampling rate that hits a fixed
    1M-token epoch budget. Two tiny aggs — the per-source table is
    dimension-sized however big the corpus is, so the normalization is
    a 1-row broadcast, never a shuffle of the facts."""
    docs = _t(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.size(
                F.split(
                    F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "),
                    " ",
                )
            )
        ).cast("long").alias("n_tokens"),
    ).withColumn("raw_w", F.sqrt(F.col("n_tokens")))
    tot = per_src.agg(F.sum("raw_w").alias("tot_w"))
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("raw_w") / F.col("tot_w"), 6).alias("mix_weight"),
        F.round(
            F.col("raw_w") / F.col("tot_w") * 1000000 / F.col("n_tokens"), 6
        ).alias("epoch_sample_rate"),
    )


def q_bucket_rebalance(spark, sf_dir):
    """Frontier bucket maintenance plan: the URL-seen/frontier tables
    are bucketed by pmod(xxhash64(url), B) (SCALE.md §URL-seen); as the
    crawl skews, buckets drift from the mean and the maintenance job
    must decide which to split and which to compact. Per bucket: row
    count, ratio to the mean, and the action — 'split' above 1.25x,
    'compact' below 0.5x, 'ok' otherwise. The per-bucket table is
    B rows however big the frontier is, so the mean is a 1-row
    broadcast; the count agg is the only scan."""
    f = _frontier(spark, sf_dir)
    # bucket from md5 digits of the URL (the engine proper buckets by
    # pmod(xxhash64(url), B) — seen.py; md5 here only so the DuckDB
    # oracle can mirror the hash)
    d1 = "(instr('0123456789abcdef', substring(md5(url), 1, 1)) - 1)"
    d2 = "(instr('0123456789abcdef', substring(md5(url), 2, 1)) - 1)"
    per_bucket = f.groupBy(
        F.expr(f"({d1} * 16 + {d2}) % 32").alias("bucket")
    ).agg(F.count("*").alias("n_rows"))
    mean = per_bucket.agg(F.avg("n_rows").alias("mean_rows"))
    return per_bucket.crossJoin(F.broadcast(mean)).select(
        "bucket",
        "n_rows",
        F.round(F.col("n_rows") / F.col("mean_rows"), 6).alias("load"),
        F.when(F.col("n_rows") > 1.25 * F.col("mean_rows"), "split")
        .when(F.col("n_rows") < 0.5 * F.col("mean_rows"), "compact")
        .otherwise("ok")
        .alias("action"),
    )


def q_source_kl(spark, sf_dir):
    """Per-source distribution drift: KL(source unigram dist || corpus
    unigram dist) with add-one smoothing, summed over the source's
    observed support (the standard truncated-KL shortcut) — the
    data-quality alarm that catches a source gone weird (spam
    injection, template takeover) before it pollutes the training mix.
    Token-count aggs are map-side combinable; the corpus distribution
    is vocabulary-sized and broadcast back, so the per-source pass
    never reshuffles the corpus."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(
            F.split(
                F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " "
            )
        ).alias("tok"),
    )
    vocab_n = toks.select("tok").distinct().count()  # tiny fixed vocab
    corpus = toks.groupBy("tok").agg(F.count("*").alias("n_corpus"))
    corpus_tot = toks.count()
    per_src = toks.groupBy("source", "tok").agg(F.count("*").alias("n_src"))
    src_tot = toks.groupBy("source").agg(F.count("*").alias("tot_src"))
    joined = (
        per_src.join(F.broadcast(corpus), "tok")
        .join(F.broadcast(src_tot), "source")
        .select(
            "source",
            (
                (F.col("n_src") + 1)
                / (F.col("tot_src") + F.lit(vocab_n))
            ).alias("p"),
            (
                (F.col("n_corpus") + 1)
                / F.lit(float(corpus_tot + vocab_n))
            ).alias("q"),
        )
    )
    return joined.groupBy("source").agg(
        F.round(
            F.sum(F.col("p") * F.log(F.col("p") / F.col("q"))), 6
        ).alias("kl_nats"),
        F.count("*").alias("n_types"),
    )


def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights (Xie et al., NeurIPS'23) toward the
    lang='en' slice: hashed-unigram (256-bucket) target/corpus LMs with
    add-one smoothing; per-doc logw = sum of per-token log ratios. Both
    LMs are broadcast tables — feature space is O(buckets), never
    O(vocab)."""
    from crawler_spark.operators.corpus import dsir_logweights

    return dsir_logweights(
        _t(spark, sf_dir, "documents"), F.col("lang") == "en", n_buckets=256
    )


def q_host_cap_sample(spark, sf_dir):
    """Per-source document cap (RefinedWeb/Dolma anti-over-representation
    pass): at most 10 docs per source, chosen by content-stable md5
    order — skew-safe salted two-phase rank, reproducible across cluster
    sizes."""
    from crawler_spark.operators.corpus import cap_per_key

    return cap_per_key(_t(spark, sf_dir, "documents"), "source", k=10)


def q_semdedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): within-cluster cosine near-dup
    pruning over the embeddings table, keep-the-far-from-centroid rule;
    clusters from the IVF hash-seeded centroids so the oracle replays
    the exact assignment."""
    from crawler_spark.operators.dedup import semdedup

    return semdedup(_t(spark, sf_dir, "embeddings"), n_cells=8, tau=0.35)


def q_hard_negative_captions(spark, sf_dir):
    """CLIP-style hard-negative mining: per image, the most-aligned
    WRONG caption among SRP co-bucketed candidates (16 planes, 2 bands
    of 8 bits over the shared 32-dim space — 4-bit bands collide on
    ~13% of ALL pairs, i.e. near-quadratic candidates), plus the
    own-caption score and the contrastive margin."""
    from crawler_spark.operators.pairs import hard_negative_captions

    return hard_negative_captions(
        _t(spark, sf_dir, "documents"),
        _t(spark, sf_dir, "embeddings"),
        n_planes=16,
        n_bands=2,
    )


def q_rfc9309_gate(spark, sf_dir):
    """Full RFC 9309 wildcard path gating: Allow+Disallow rules with *
    and trailing $, longest-match (most octets) precedence, Allow wins
    ties, no-match defaults to allowed. Rules are a broadcast dimension;
    the match is native LIKE ... ESCAPE (column pattern) so the gate is
    JVM-side and oracle-portable. Parse path (robots.txt -> rules) is
    pytest-covered; the rule set here is literal so DuckDB replays it."""
    from crawler_spark.functions.robots import like_pattern
    from crawler_spark.operators.politeness import rfc9309_gate

    RULES = [
        ("h0", "/sec1*", False),
        ("h0", "/sec1/item7*", True),
        ("h0", "*.html$", False),
        ("h1", "/*", False),
        ("h1", "/sec2*", True),
        ("h2", "*.html$", True),
        ("h2", "*item3*", False),
    ]
    rules = spark.createDataFrame(
        [(h, p, like_pattern(p), a) for h, p, a in RULES],
        "host string, pattern string, like_pattern string, allow boolean",
    )
    d = _t(spark, sf_dir, "documents")
    urls = d.select(
        F.col("doc_id").alias("url_hash"),
        F.concat(F.lit("h"), (F.col("doc_id") % 3).cast("string")).alias("host"),
        F.concat(
            F.lit("/sec"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit("/item"),
            (F.col("doc_id") % 11).cast("string"),
            F.when(F.col("doc_id") % 4 == 0, F.lit(".html")).otherwise(F.lit("")),
        ).alias("path"),
    )
    return rfc9309_gate(urls, rules).select(
        "url_hash", "host", "path", "allowed", "matched_pattern"
    )


def q_lang_confusion(spark, sf_dir):
    """Language-ID confusion matrix: predicted vs stored language,
    per-pair counts and the share of each stored language the pair
    represents — the eval rollup over lang_id that shows WHERE the
    stopword heuristic fails (e.g. short docs falling to 'und'), not
    just how often. Dimension-sized output; one combinable agg plus a
    tiny per-language total broadcast back."""
    from crawler_spark.functions.text import lang_id

    d = _t(spark, sf_dir, "documents").select(
        "lang", lang_id(F.col("text")).alias("lang_pred")
    )
    pairs = d.groupBy("lang", "lang_pred").agg(F.count("*").alias("n"))
    totals = d.groupBy("lang").agg(F.count("*").alias("n_lang"))
    return pairs.join(F.broadcast(totals), "lang").select(
        "lang",
        "lang_pred",
        "n",
        F.round(F.col("n") / F.col("n_lang"), 6).alias("share"),
    )


def q_embedding_drift(spark, sf_dir):
    """Embedding drift detector: split the corpus into two waves
    (vec_id parity — the deterministic stand-in for crawl A vs crawl B),
    compute each label's mean vector per wave (posexplode + two-key agg,
    round-9 pinned like embedding_centroids), and report the cosine
    between the wave means per label — the per-class alarm that catches
    an encoder change or a source-mix shift before it poisons dedup and
    retrieval thresholds. All stages are (label, pos)-keyed aggs; the
    cosine runs on label-dimension-sized rows."""
    e = _t(spark, sf_dir, "embeddings")
    waved = e.select(
        "label",
        (F.col("vec_id") % 2).alias("wave"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x"),
    )
    means = waved.groupBy("label", "wave", "pos").agg(
        F.round(F.avg("x"), 9).alias("m")
    )
    a = means.filter(F.col("wave") == 0).select(
        "label", "pos", F.col("m").alias("ma")
    )
    b = means.filter(F.col("wave") == 1).select(
        "label", "pos", F.col("m").alias("mb")
    )
    j = a.join(b, ["label", "pos"])
    agg = j.groupBy("label").agg(
        F.round(F.sum(F.col("ma") * F.col("mb")), 9).alias("dot"),
        F.sqrt(F.round(F.sum(F.col("ma") * F.col("ma")), 9)).alias("na"),
        F.sqrt(F.round(F.sum(F.col("mb") * F.col("mb")), 9)).alias("nb"),
    )
    counts = e.groupBy("label").agg(
        F.sum((F.col("vec_id") % 2 == 0).cast("long")).alias("n_wave_a"),
        F.sum((F.col("vec_id") % 2 == 1).cast("long")).alias("n_wave_b"),
    )
    return agg.join(counts, "label").select(
        "label",
        "n_wave_a",
        "n_wave_b",
        F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias(
            "centroid_cosine"
        ),
    )


def q_cloaking_signal(spark, sf_dir):
    """Cloaking / anchor-bait detection: a page whose inbound anchor
    terms never appear in its own content is advertising something it
    does not serve — the classic link-spam tell. Per target page:
    distinct inbound anchor terms, how many occur in the target's token
    set, and the match ratio (low = suspect). Edges are the anchor_topk
    family (doc -> 16-block hub, first token as anchor); the
    containment check is one left join of the distinct (target, term)
    pairs against the target's exploded tokens — both sides are
    term-level, the fact table never self-joins."""
    docs = _t(spark, sf_dir, "documents")
    first_tok = F.split(
        F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " "
    )[0]
    anchors = docs.select(
        (F.col("doc_id") - F.col("doc_id") % 16).alias("target_id"),
        first_tok.alias("term"),
    ).distinct()
    toks = docs.select(
        F.col("doc_id").alias("target_id"),
        F.explode(
            F.array_distinct(
                F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ")
            )
        ).alias("term"),
    ).withColumn("present", F.lit(1))
    j = anchors.join(toks, ["target_id", "term"], "left")
    return j.groupBy("target_id").agg(
        F.count("*").alias("n_anchor_terms"),
        F.sum(F.coalesce("present", F.lit(0))).alias("n_matched"),
        F.round(
            F.sum(F.coalesce("present", F.lit(0))) / F.count("*"), 6
        ).alias("match_ratio"),
    )


def q_dup_quality_profile(spark, sf_dir):
    """Do duplicates concentrate in low-quality documents? Exact-dup
    membership (normalized-text fingerprint with >= 2 docs) joined onto
    quality quartiles (exact-percentile cuts, broadcast back): per
    quartile, doc count, dup count, dup rate. The report that decides
    whether dedup should run before or after the quality gate on this
    corpus."""
    from crawler_spark.functions.text import quality_score

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        quality_score(F.col("text")).alias("quality"),
        F.md5(
            F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
        ).alias("fp"),
    )
    sizes = d.groupBy("fp").agg(F.count("*").alias("n_copies"))
    cuts = d.agg(
        F.round(F.expr("percentile(quality, 0.25)"), 9).alias("c1"),
        F.round(F.expr("percentile(quality, 0.5)"), 9).alias("c2"),
        F.round(F.expr("percentile(quality, 0.75)"), 9).alias("c3"),
    )
    staged = (
        d.join(sizes, "fp")
        .crossJoin(F.broadcast(cuts))
        .withColumn(
            "quartile",
            F.when(F.col("quality") >= F.col("c3"), F.lit(1))
            .when(F.col("quality") >= F.col("c2"), F.lit(2))
            .when(F.col("quality") >= F.col("c1"), F.lit(3))
            .otherwise(F.lit(4)),
        )
    )
    return staged.groupBy("quartile").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("n_copies") >= 2).cast("long")).alias("n_dup_docs"),
        F.round(
            F.sum((F.col("n_copies") >= 2).cast("long")) / F.count("*"), 6
        ).alias("dup_rate"),
    )


def q_dedup_cross_wave(spark, sf_dir):
    """Incremental (cross-wave) near-dup detection: new-wave docs
    (doc_id % 5 == 4) band-join ONLY against the prior waves' minhash
    index (doc_id % 5 != 4) — candidates are new x old, never new x new
    or old x old, so each wave pays O(wave) signature work plus an
    index probe, exactly how a persisted LSH index absorbs a daily
    crawl. Same (4, 2) banding as minhash_banded_pairs; output the
    matched (new_doc, old_doc, n_bands) candidates."""
    docs = _t(spark, sf_dir, "documents")
    # calling minhash_banded_pairs on ALL docs would pair old x old too;
    # build the band signatures once and split the join sides by wave
    from crawler_spark.operators.dedup import _shingles

    sh = _shingles(docs, "text", "doc_id", 3)
    n_hashes = 8
    per_doc = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(
                f"_s{i}"
            )
            for i in range(n_hashes)
        ]
    )
    band_sigs = [
        F.md5(F.concat_ws("|", F.col(f"_s{b * 2}"), F.col(f"_s{b * 2 + 1}")))
        for b in range(4)
    ]
    bands = per_doc.select(
        "doc_id", F.posexplode(F.array(*band_sigs)).alias("band_id", "band_sig")
    )
    new_side = bands.filter(F.col("doc_id") % 5 == 4).select(
        F.col("doc_id").alias("new_doc"), "band_id", "band_sig"
    )
    old_side = bands.filter(F.col("doc_id") % 5 != 4).select(
        F.col("doc_id").alias("old_doc"), "band_id", "band_sig"
    )
    return (
        new_side.join(old_side, ["band_id", "band_sig"])
        .groupBy("new_doc", "old_doc")
        .agg(F.count("*").alias("n_bands"))
    )


def q_shingle_df_stats(spark, sf_dir):
    """Hot-shingle diagnostics for dedup tuning: the document-frequency
    distribution of 3-gram shingles (log2-bucketed), plus how many
    candidate join pairs each DF bucket would contribute (sum df*(df-1)/2)
    — the table that picks ngram_jaccard_capped's max_df by showing
    where the quadratic candidate mass actually lives."""
    from crawler_spark.operators.dedup import _shingles

    sh = _shingles(_t(spark, sf_dir, "documents"), "text", "doc_id", 3)
    df = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    bucket = (F.length(F.bin(F.col("df"))) - 1).cast("int")
    return (
        df.select(
            bucket.alias("log2_df"),
            F.col("df"),
        )
        .groupBy("log2_df")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum("df").alias("postings"),
            F.sum(F.col("df") * (F.col("df") - 1) / 2)
            .cast("long")
            .alias("candidate_pairs"),
        )
    )


def q_pair_pipeline(spark, sf_dir):
    """END-TO-END image+caption curation in ONE Catalyst plan (the
    image-side twin of training_shards): caption junk gate (URL-ish /
    filename / digit-heavy / short / generic — native predicates) ->
    resolution + aspect + token floors -> exact-phash first-wins dedup
    -> byte-budget shard packing in 32 hash buckets. No intermediate
    materialization; gates are filters the scan can push, dedup is one
    agg + left-semi, packing is the bucketed running-sum window.
    Output: the final shard manifest a trainer would mount."""
    from crawler_spark.operators.pairs import select_training_pairs, synth_pair_meta

    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ")
    clean = docs.filter(
        ~F.lower("text").rlike("https?://|www\\.")
        & ~F.lower("text").rlike("\\.(jpg|jpeg|png|gif|webp)$")
        & (
            (
                F.length(F.regexp_replace("text", "[^0-9]", ""))
                / F.length("text")
            )
            <= 0.3
        )
        & (F.size(F.filter(toks, lambda t: F.length(t) > 0)) >= 3)
        & ~F.element_at(toks, 1).isin("image", "photo", "picture", "img")
    )
    sel = select_training_pairs(synth_pair_meta(clean))
    budget = 8 * 1024 * 1024
    t = sel.select(
        "image_id",
        (F.col("w").cast("long") * F.col("h") + 4 * F.col("n_tokens")).alias(
            "nbytes"
        ),
        (F.col("image_id") % 32).alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy(F.desc("nbytes"), "image_id")
    return (
        t.withColumn("cum", F.sum("nbytes").over(w))
        .withColumn(
            "shard_id",
            F.floor(
                (F.col("cum") - F.col("nbytes")) / F.lit(float(budget))
            ).cast("long"),
        )
        .groupBy("bucket", "shard_id")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum("nbytes").alias("shard_bytes"),
            F.round(F.sum("nbytes") / F.lit(float(budget)), 6).alias(
                "fill_ratio"
            ),
        )
    )


def q_host_components(spark, sf_dir):
    """Site clustering: connected components over a deterministic host
    link graph (h -> h+10 chords from every 4th doc, h -> h+5 chords
    from every 16th: 5 components of 4 hosts each) — the mirror-site /
    link-farm grouping pass, reusing dedup_clusters' min-label
    propagation on a different edge family. Oracle = recursive CTE."""
    from crawler_spark.operators.dedup import dedup_clusters

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    h = F.col("doc_id") % 20
    e1 = docs.filter(F.col("doc_id") % 4 == 0).select(
        h.alias("host_a"), ((h + 10) % 20).alias("host_b")
    )
    e2 = docs.filter(F.col("doc_id") % 16 == 1).select(
        h.alias("host_a"), ((h + 5) % 20).alias("host_b")
    )
    edges = (
        e1.union(e2).filter(F.col("host_a") != F.col("host_b")).distinct()
    )
    return dedup_clusters(edges, "host_a", "host_b").select(
        F.col("doc_id").alias("host_id"), "cluster_id"
    )


def q_host_communities(spark, sf_dir):
    """Community detection over the host link graph — label propagation
    (operators/graph.py label_propagation), one notch finer than
    host_components' connected components: heavily-interlinked host
    groups converge to one label even when stray edges merge distinct
    clusters into a single component. Budget capping then treats each
    community as one spend unit (a farm is one community however many
    hosts it spawns). Same weighted host-graph derivation as
    host_link_rank, symmetrized; 3 synchronous rounds, max-incident-
    weight label with smallest-label tie-break (deterministic), so the
    unrolled-CTE oracle — per round a (node, label) weight agg + a
    per-node top-1 window — matches exactly. Integer sums only."""
    from crawler_spark.operators.graph import label_propagation

    d6 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 6, 1)) - 1)"
    d7 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 7, 1)) - 1)"
    docs = _t(spark, sf_dir, "documents")
    edges = (
        docs.select(
            (F.col("doc_id") % 20).alias("src"),
            F.expr(f"(16 * {d6} + {d7}) % 20").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("weight"))
    )
    return label_propagation(edges, n_iter=3).select(
        F.col("node").alias("host_id"), "community"
    )


def q_seed_distance(spark, sf_dir):
    """Multi-source BFS hop distance from the vetted seed hosts over
    the deterministic host link graph (host_components' edge family):
    the hard-cutoff counterpart of trustrank's smooth decay — a crawl
    admission fence 'only hosts within H hops of a seed'. Level-
    synchronous frontier joins, one shuffle per hop, O(E) total work;
    oracle = hop-bounded recursive CTE with min-distance rollup."""
    from crawler_spark.operators.graph import bfs_distances

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    h = F.col("doc_id") % 20
    e1 = docs.filter(F.col("doc_id") % 4 == 0).select(
        h.alias("src"), ((h + 10) % 20).alias("dst")
    )
    e2 = docs.filter(F.col("doc_id") % 16 == 1).select(
        h.alias("src"), ((h + 5) % 20).alias("dst")
    )
    edges = e1.union(e2).filter(F.col("src") != F.col("dst")).distinct()
    seeds = spark.range(2).select(F.col("id").alias("node"))
    return bfs_distances(edges, seeds, max_hops=8).select(
        F.col("node").alias("host_id"), F.col("dist").cast("int").alias("dist")
    )


def q_decayed_host_activity(spark, sf_dir):
    """Recency-weighted host activity (operators/metrics.py
    decayed_counts): each event contributes 2^(-age_days), so "active
    lately" outranks "active once, long ago" — the frontier-priority
    prior plain counts and cliff-edge windows both get wrong. Exact by
    BIT BUDGET, not pinning: dyadic weights spanning <= 30 bits plus a
    53-bit mantissa make the float sum exact under any association
    order. One map-side groupBy; rank over the host dimension."""
    from crawler_spark.operators.metrics import decayed_counts

    e = _t(spark, sf_dir, "events").select(
        F.expr("concat('h', cast(user_id % 40 as string))").alias("host"),
        F.expr(
            "cast(floor(unix_micros(cast(ts as timestamp)) / 86400000000)"
            " as int)"
        ).alias("day"),
    )
    out = decayed_counts(e, "host", "day", half_life_days=1, max_age_days=30)
    p6 = lambda c: F.expr(
        f"cast(floor(({c}) * 1e6 + 0.5) as double) / 1e6"
    )  # noqa: E731
    return out.select(
        "host", "n_events", p6("decayed").alias("decayed6"), "rank"
    )


def q_trailing_distinct_hll(spark, sf_dir):
    """Trailing-7-day distinct users per day from MERGEABLE per-day HLL
    sketches (operators/sketches.py trailing_distinct_hll): register
    max over a value-RANGE window IS HLL union, so each day's estimate
    equals a sketch built on the window's union — the sliding-window
    distinct no exact method affords at 10^10 events/day. Facts are
    scanned once; everything after is (days x 256)-dimension work.
    Exact witness co-computed."""
    from crawler_spark.operators.sketches import trailing_distinct_hll

    e = _t(spark, sf_dir, "events").select(
        F.expr(
            "cast(floor(unix_micros(cast(ts as timestamp)) / 86400000000)"
            " as int)"
        ).alias("day"),
        "user_id",
    )
    est = trailing_distinct_hll(e, "day", "cast(user_id as string)", 7)
    du = e.select("day", "user_id").distinct()
    days = e.select("day").distinct()
    ex = (
        days.select(F.col("day").alias("d"))
        .join(
            du,
            (F.col("day") >= F.col("d") - 6) & (F.col("day") <= F.col("d")),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("exact_distinct"))
        .select(F.col("d").alias("day"), "exact_distinct")
    )
    p6 = lambda c: F.expr(
        f"cast(floor(({c}) * 1e6 + 0.5) as double) / 1e6"
    )  # noqa: E731
    return est.join(ex, "day").select(
        "day",
        "hll_estimate",
        "exact_distinct",
        p6("abs(hll_estimate - exact_distinct) / exact_distinct").alias(
            "rel_err6"
        ),
    )


def q_fk_readability(spark, sf_dir):
    """Flesch-Kincaid grade per document (functions/text.py fk_grade):
    the classic readability score from native regexp counts (vowel
    groups ≈ syllables, [.!?]+ runs ≈ sentences) — zero shuffle,
    codegen, integer-ratio doubles pinned at 1e-6 for display. Bias of
    the syllable heuristic is corpus-constant, so the RANKING a
    quality gate consumes is preserved."""
    from crawler_spark.functions.text import fk_grade

    d = _t(spark, sf_dir, "documents")
    s = fk_grade(F.col("text"))
    p6 = lambda c: F.expr(
        f"cast(floor(({c}) * 1e6 + 0.5) as double) / 1e6"
    )  # noqa: E731
    return d.select(
        "doc_id",
        s["n_words"].alias("n_words"),
        s["n_sentences"].alias("n_sentences"),
        s["n_syllables"].alias("n_syllables"),
    ).filter(F.col("n_words") > 0).withColumn(
        "grade6",
        p6(
            "0.39 * (cast(n_words as double) / cast(n_sentences as double))"
            " + 11.8 * (cast(n_syllables as double) / cast(n_words as double))"
            " - 15.59"
        ),
    )


def q_seed_attribution(spark, sf_dir):
    """Per-host seed LINEAGE (operators/graph.py seed_attribution):
    which seed each reachable host descends from and at what hop —
    the attribution half of seed_distance, i.e. the blame/billing
    question per-URL lineage answers at graph granularity. Frontier
    carries the seed label; same-wave ties resolve to the smallest
    seed (provably equal to min-seed-over-shortest-walks, which the
    recursive-CTE oracle computes directly)."""
    from crawler_spark.operators.graph import seed_attribution

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    h = F.col("doc_id") % 20
    e1 = docs.filter(F.col("doc_id") % 4 == 0).select(
        h.alias("src"), ((h + 10) % 20).alias("dst")
    )
    e2 = docs.filter(F.col("doc_id") % 16 == 1).select(
        h.alias("src"), ((h + 5) % 20).alias("dst")
    )
    edges = e1.union(e2).filter(F.col("src") != F.col("dst")).distinct()
    seeds = spark.range(2).select(F.col("id").alias("node"))
    return seed_attribution(edges, seeds, max_hops=8, directed=False).select(
        F.col("node").alias("host_id"),
        F.col("seed").cast("long").alias("seed"),
        F.col("dist").cast("int").alias("dist"),
    )


def q_stride_schedule(spark, sf_dir):
    """Weighted-fair frontier admission (stride/WFQ, Waldspurger &
    Weihl OSDI'94): host h's k-th URL gets integer virtual finish
    k*10080/weight (10080 is divisible by every weight 1..10, so the
    virtual clock is EXACT cross-engine); admitting the 64 earliest
    finishes gives throughput proportional to host weight — the
    value-weighted generalization of the flat politeness budget.
    Per-host window + global TakeOrdered; never a full sort."""
    from crawler_spark.operators.politeness import stride_schedule

    f = _frontier(spark, sf_dir)
    weights = spark.range(20).select(
        F.concat(F.lit("host-"), F.col("id").cast("string"), F.lit(".test")).alias(
            "host"
        ),
        (1 + F.col("id") % 3).cast("int").alias("weight"),
    )
    out = stride_schedule(f, weights, budget=64)
    return out.select(
        "url",
        "host",
        F.col("weight").cast("long").alias("weight"),
        F.col("k").cast("long").alias("k"),
        "vf",
    )


def q_host_kcore(spark, sf_dir):
    """2-core decomposition by iterative peeling (4 rounds) over a
    deterministic host graph: a 10-node even-host ring (doc_id%10*2 ->
    +2 chords) plus odd leaf hosts hanging off it. Leaves peel away in
    round 1; the ring survives with its true core degrees — the spam
    -farm vs organic-neighborhood separator that pairs with
    host_triangles. Each peel is one degree agg + two semi-joins;
    the oracle unrolls identical rounds."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    ring_h = (F.col("doc_id") % 10) * 2
    e_ring = docs.select(
        ring_h.alias("a"), ((ring_h + 2) % 20).alias("b")
    )
    leaf_h = F.col("doc_id") % 20
    e_leaf = docs.filter(F.col("doc_id") % 16 == 1).select(
        leaf_h.alias("a"), ((leaf_h + 5) % 20).alias("b")
    )
    ed = e_ring.union(e_leaf).filter(F.col("a") != F.col("b")).distinct()
    e = ed.union(ed.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    for _ in range(4):
        deg = e.groupBy("a").agg(F.count("*").alias("c"))
        alive = deg.filter(F.col("c") >= 2).select("a").localCheckpoint()
        e = (
            e.join(alive, "a", "left_semi")
            .join(alive.select(F.col("a").alias("b")), "b", "left_semi")
            .localCheckpoint()
        )
    return e.groupBy(F.col("a").alias("host_id")).agg(
        F.count("*").alias("degree")
    )


def q_caption_boilerplate(spark, sf_dir):
    """Cross-host caption boilerplate: 3-token caption-PREFIX
    fingerprints that appear on >= 2 distinct hosts — stock-photo
    alt-text and CMS template stems ("image of a ...") that
    exact-dedup-per-host misses but that poison image-caption training
    pairs corpus-wide. One hash agg (map-side combinable), no joins."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), "\\s+")
    return (
        d.select(
            F.md5(F.concat_ws(" ", F.slice(toks, 1, 3))).alias("fp"),
            "doc_id",
            (F.col("doc_id") % 20).alias("host_id"),
        )
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("host_id").alias("n_hosts"),
            F.min("doc_id").alias("exemplar"),
        )
        .filter(F.col("n_hosts") >= 2)
    )



def q_subimage_matches(spark, sf_dir):
    """Crop/thumbnail provenance: tile-pHash index over the source
    corpus joined (one shuffle, uniform 64-bit key) against the
    whole-image pHash of a circulating crop corpus — here the crops
    are the sources' own 16x16 patches re-encoded standalone
    (image_patches), i.e. the worst real case: fragments that share
    ZERO whole-image hash bits with their source. png only (lossless
    round trip; qdct recompression shifts tile pixels). No SQL oracle
    (binary codec); planted-crop exactness is pytest-covered
    (tests/test_alt_hashes.py)."""
    from crawler_spark.operators.multimodal import (
        decode_stats,
        image_patches,
        tile_hashes,
    )
    urls = [f"http://host-0.test/p0/d0/img-{i}" for i in range(32)]
    images = _synth_image_df(spark, urls).filter(F.col("fmt") == "png")
    crops = image_patches(images, patch=16).select(
        F.concat_ws(
            "#", "image_id", F.col("patch_row").cast("string"),
            F.col("patch_col").cast("string"),
        ).alias("image_id"),
        F.col("bytes"),
        F.col("fmt"),
    )
    crop_hashes = decode_stats(crops).select(
        F.col("image_id").alias("crop_id"), F.col("phash").alias("crop_phash")
    )
    index = tile_hashes(images, tile=16)
    return (
        index.join(
            crop_hashes, index["tile_phash"] == crop_hashes["crop_phash"]
        )
        .groupBy("image_id")
        .agg(
            F.count("*").alias("n_matches"),
            F.count_distinct("crop_id").alias("n_crops_matched"),
        )
    )



def q_embedding_neardup_mp(spark, sf_dir):
    """Multi-probe SRP near-dup (Lv et al. VLDB'07 on random
    hyperplanes): each vector also probes with its lowest-|margin| bit
    flipped per band — recovering exactly the near-threshold pairs
    that straddle one hyperplane, at zero extra index size. Dot
    products accumulate round-9 DECIMAL terms so sign bits AND the
    argmin flip choice are order-independent cross-engine."""
    from crawler_spark.operators.dedup import srp_multiprobe_pairs

    return srp_multiprobe_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.35
    )



def q_dispatch_timeline(spark, sf_dir):
    """Mercator back-queue dispatch timeline: within one round, host
    h's k-th URL dispatches at (k-1) * crawl_delay_s seconds — the
    exact-timestamp form of the per-round politeness budget (the
    round model quantizes this; the timeline is what a real fetcher
    fleet executes). Delays are dyadic (0.25 * (1 + host % 4)), so
    every offset is an exact double cross-engine. Admits offsets
    inside the 16 s round, returns the first 64 dispatches by
    (offset, host, k) via TakeOrdered — never a global sort."""
    f = _frontier(spark, sf_dir)
    dims = spark.range(20).select(
        F.concat(F.lit("host-"), F.col("id").cast("string"), F.lit(".test")).alias(
            "host"
        ),
        (0.25 * (1 + F.col("id") % 4)).alias("delay_s"),
    )
    w = Window.partitionBy("host").orderBy("priority", "depth", "discovery_seq")
    t = (
        f.join(F.broadcast(dims), "host")
        .withColumn("k", F.row_number().over(w).cast("long"))
        .withColumn("offset_s", (F.col("k") - 1) * F.col("delay_s"))
        .filter(F.col("offset_s") < 16.0)
    )
    return t.select("url", "host", "k", "delay_s", "offset_s").orderBy(
        "offset_s", "host", "k"
    ).limit(64)



def q_politeness_compliance_audit(spark, sf_dir):
    """Per-host politeness COMPLIANCE audit over the dispatch timeline
    — the proof a crawl operator actually owes a webmaster: minimum
    observed inter-fetch gap vs the host's crawl-delay, violation
    count, verdict. A buggy-fetcher fault is planted (hosts ending in
    3 halve their gap from the 3rd dispatch) and the audit must flag
    exactly those hosts. All offsets/gaps are dyadic doubles — exact
    cross-engine with no pinning. One window (lag per host) + one
    grouped agg; bounded by the 64 s admission window."""
    f = _frontier(spark, sf_dir)
    dims = spark.range(20).select(
        F.concat(F.lit("host-"), F.col("id").cast("string"), F.lit(".test")).alias(
            "host"
        ),
        (0.25 * (1 + F.col("id") % 4)).alias("delay_s"),
    )
    w = Window.partitionBy("host").orderBy("priority", "depth", "discovery_seq")
    t = (
        f.join(F.broadcast(dims), "host")
        .withColumn("k", F.row_number().over(w).cast("long"))
        .withColumn("offset_s", (F.col("k") - 1) * F.col("delay_s"))
        .filter(F.col("offset_s") < 64.0)
        .withColumn(
            "off2",
            F.when(
                F.col("host").endswith("3.test") & (F.col("k") > 2),
                F.col("offset_s") - F.col("delay_s") * 0.5,
            ).otherwise(F.col("offset_s")),
        )
    )
    wg = Window.partitionBy("host").orderBy("k")
    g = t.withColumn("gap", F.col("off2") - F.lag("off2").over(wg))
    return (
        g.groupBy("host", "delay_s")
        .agg(
            F.count("*").cast("long").alias("n_dispatch"),
            F.min("gap").alias("min_gap"),
            F.sum(
                (F.col("gap") < F.col("delay_s")).cast("long")
            ).alias("n_violations"),
        )
        .withColumn(
            "compliant", F.coalesce(F.col("n_violations"), F.lit(0)) == 0
        )
        .select(
            "host", "delay_s", "n_dispatch",
            F.coalesce("min_gap", F.col("delay_s")).alias("min_gap"),
            F.coalesce("n_violations", F.lit(0)).cast("long").alias(
                "n_violations"
            ),
            "compliant",
        )
    )


def q_wfq_dispatch_order(spark, sf_dir):
    """Weighted fair queueing dispatch (SIGCOMM'89; operators/
    politeness.py wfq_schedule): virtual finish time = per-host prefix
    byte cost / weight, fleet dispatches ascending — any schedule
    prefix serves hosts proportionally to weight, which round-robin
    politeness cannot do without starvation. Dyadic weights + integer
    sizes keep every finish time an exact double; first 64 dispatches
    via TakeOrdered."""
    from crawler_spark.operators.politeness import wfq_schedule

    f = _frontier(spark, sf_dir)
    jobs = f.select(
        "host",
        "priority",
        "depth",
        "discovery_seq",
        (500 + F.col("doc_id") % 1500).cast("long").alias("size"),
    )
    weights = spark.range(20).select(
        F.concat(F.lit("host-"), F.col("id").cast("string"), F.lit(".test")).alias(
            "host"
        ),
        (0.25 * (1 + F.col("id") % 4)).alias("w"),
    )
    return wfq_schedule(
        jobs,
        weights,
        host_col="host",
        size_col="size",
        order_cols=["priority", "depth", "discovery_seq"],
        top_n=64,
    )


def q_rank_drift(spark, sf_dir):
    """Wave-over-wave link-rank drift: PageRank over wave A's edges
    (even doc_ids) vs wave B's (odd), full-outer joined per host with
    the rank delta — the re-prioritization signal an incremental
    crawler feeds back into host_priorities between waves (big movers
    get re-crawled; the embedding_drift analog for link structure).
    Both chains are 3 round-9-stabilized iterations; the oracle runs
    two prefixed unrolled-CTE chains in one query."""
    from crawler_spark.operators.rank import link_rank

    d6 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 6, 1)) - 1)"
    d7 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 7, 1)) - 1)"
    docs = _t(spark, sf_dir, "documents")

    def wave_rank(parity):
        edges = (
            docs.filter(F.col("doc_id") % 2 == parity)
            .select(
                (F.col("doc_id") % 20).alias("src"),
                F.expr(f"(16 * {d6} + {d7}) % 20").alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.count("*").alias("weight"))
        )
        return link_rank(edges, n_iter=3, damping=0.85).select(
            F.col("node").alias("host_id"), F.round("rank", 6).alias("rank")
        )

    a = wave_rank(0).withColumnRenamed("rank", "rank_a")
    b = wave_rank(1).withColumnRenamed("rank", "rank_b")
    return (
        a.join(b, "host_id", "full_outer")
        .select(
            "host_id",
            F.coalesce("rank_a", F.lit(0.0)).alias("rank_a"),
            F.coalesce("rank_b", F.lit(0.0)).alias("rank_b"),
        )
        .withColumn(
            "delta", F.round(F.col("rank_b") - F.col("rank_a"), 6)
        )
    )



def q_caption_junk_filter(spark, sf_dir):
    """LAION-style caption junk gate: alt-text scraped from the web is
    full of URLs, filenames, and generic placeholders that train
    nothing. Junk is planted deterministically (doc_id % 7 picks a
    junk family), then flagged by native predicates: URL-ish, filename
    extension, digit-heavy, too short, generic placeholder; kept =
    clean on all five. Pure codegen map — the cheapest gate in the
    pair-curation cascade, run before any decode or embedding."""
    d = _t(spark, sf_dir, "documents")
    cap = (
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit("http://ex.com/p/"), F.col("doc_id").cast("string")),
        )
        .when(
            F.col("doc_id") % 7 == 1,
            F.concat(F.lit("IMG_"), F.col("doc_id").cast("string"), F.lit(".jpg")),
        )
        .when(F.col("doc_id") % 7 == 2, F.lit("image"))
        .otherwise(F.col("text"))
    )
    c = d.select("doc_id", cap.alias("caption"))
    toks = F.split(F.regexp_replace(F.lower(F.trim("caption")), r"\s+", " "), " ")
    urlish = F.lower("caption").rlike("https?://|www\\.")
    filename = F.lower("caption").rlike("\\.(jpg|jpeg|png|gif|webp)$")
    digit_heavy = (
        F.length(F.regexp_replace("caption", "[^0-9]", ""))
        / F.length("caption")
    ) > 0.3
    too_short = F.size(F.filter(toks, lambda t: F.length(t) > 0)) < 3
    generic = F.element_at(toks, 1).isin("image", "photo", "picture", "img")
    return c.select(
        "doc_id",
        urlish.alias("is_urlish"),
        filename.alias("is_filename"),
        digit_heavy.alias("is_digit_heavy"),
        too_short.alias("too_short"),
        generic.alias("is_generic"),
        (~urlish & ~filename & ~digit_heavy & ~too_short & ~generic).alias(
            "kept"
        ),
    )


def q_phash_threshold_eval(spark, sf_dir):
    """Perceptual-hash threshold calibration: for every candidate
    Hamming cutoff k in 0..8, recall over TRUE near-dup pairs (each
    base image vs its twin-1 re-encode analog, planted <=3 bits apart)
    vs the false-positive rate over a deterministic non-dup control
    (base i paired with base i+127 — an equi-join, no cross product).
    The table that justifies image_dup_clusters' Hamming<=3 setting on
    this corpus instead of citing a paper's."""
    from crawler_spark.operators.pairs import phash_with_twins, synth_pair_meta

    meta = synth_pair_meta(_t(spark, sf_dir, "documents"))
    tw = phash_with_twins(meta, n_twins=1)
    base = tw.filter(F.col("image_id") < 1_000_000_000).select(
        F.col("image_id").alias("bid"), F.col("sig").alias("bsig")
    )
    twin = tw.filter(F.col("image_id") >= 1_000_000_000).select(
        (F.col("image_id") % 1_000_000_000).alias("bid"),
        F.col("sig").alias("tsig"),
    )
    true_d = base.join(twin, "bid").select(
        F.bit_count(F.col("bsig").bitwiseXOR(F.col("tsig"))).alias("d")
    )
    ctrl = base.join(
        base.select((F.col("bid") - 127).alias("bid"), F.col("bsig").alias("csig")),
        "bid",
    ).select(F.bit_count(F.col("bsig").bitwiseXOR(F.col("csig"))).alias("d"))
    ks = spark.range(0, 9).select(F.col("id").cast("int").alias("k"))
    t_stats = ks.crossJoin(F.broadcast(true_d.agg(F.count("*").alias("n_true")))).join(
        true_d.crossJoin(ks.select(F.col("k").alias("k2")))
        .filter(F.col("d") <= F.col("k2"))
        .groupBy(F.col("k2").alias("k"))
        .agg(F.count("*").alias("n_true_hit")),
        "k",
        "left",
    )
    c_stats = (
        ctrl.crossJoin(ks.select(F.col("k").alias("k2")))
        .filter(F.col("d") <= F.col("k2"))
        .groupBy(F.col("k2").alias("k"))
        .agg(F.count("*").alias("n_ctrl_hit"))
    )
    n_ctrl = ctrl.agg(F.count("*").alias("n_ctrl"))
    return (
        t_stats.join(c_stats, "k", "left")
        .crossJoin(F.broadcast(n_ctrl))
        .select(
            "k",
            "n_true",
            F.round(
                F.coalesce("n_true_hit", F.lit(0)) / F.col("n_true"), 6
            ).alias("recall"),
            "n_ctrl",
            F.round(
                F.coalesce("n_ctrl_hit", F.lit(0)) / F.col("n_ctrl"), 6
            ).alias("fpr"),
        )
    )


def q_politeness_audit(spark, sf_dir):
    """Politeness-compliance audit over a synthesized fetch log: per
    (host, round), served count vs the host's crawl-delay budget;
    reports per host the rounds over budget and the worst overshoot.
    The engine's own scheduler is proven compliant by construction
    (test_politeness_budget_respected); this is the audit a crawl
    operator runs over ANY fetch log (e.g. a third-party crawler's)
    to find misbehaving workers. One two-level combinable agg."""
    ev = _t(spark, sf_dir, "events").select(
        F.concat(F.lit("h"), (F.col("user_id") % 23).cast("string")).alias(
            "host"
        ),
        (F.col("event_id") % 16).alias("round_id"),
    )
    budget = F.lit(8) + (F.length("host") % 3) * 4  # per-host budget dim
    per_round = ev.groupBy("host", "round_id").agg(
        F.count("*").alias("served")
    )
    flagged = per_round.withColumn("budget", budget).withColumn(
        "over", F.greatest(F.col("served") - F.col("budget"), F.lit(0))
    )
    return flagged.groupBy("host").agg(
        F.any_value("budget").alias("budget"),
        F.count("*").alias("n_rounds"),
        F.sum((F.col("over") > 0).cast("long")).alias("rounds_over"),
        F.max("over").alias("worst_overshoot"),
    )


def q_bpe_train(spark, sf_dir):
    """BPE tokenizer training: 3 greedy merge iterations over the word
    stream — count adjacent pairs, argmax (deterministic ties), rewrite
    the corpus with the winning merge as a one-row broadcast, repeat.
    Output: the learned merge table. The oracle unrolls the identical
    iterations in SQL."""
    from crawler_spark.operators.corpus import bpe_train

    return bpe_train(_t(spark, sf_dir, "documents"), n_merges=3)


def q_pair_shards(spark, sf_dir):
    """WebDataset-style shard manifest for image+caption training pairs:
    pack pairs into ~8 MiB shards (next-fit-decreasing over the
    estimated payload bytes w*h + 4*n_tokens) inside 32 parallel hash
    buckets — the tar-shard layout image trainers stream sequentially.
    Same distributed-packing construction as sequence_packing: each
    bucket packs independently under a running-sum window, so no global
    sort ever sees the corpus. Per shard: pair count, bytes, fill."""
    from crawler_spark.operators.pairs import synth_pair_meta

    budget = 8 * 1024 * 1024
    m = synth_pair_meta(_t(spark, sf_dir, "documents"))
    t = m.select(
        "image_id",
        (F.col("w").cast("long") * F.col("h") + 4 * F.col("n_tokens")).alias(
            "nbytes"
        ),
        (F.col("image_id") % 32).alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy(F.desc("nbytes"), "image_id")
    return (
        t.withColumn("cum", F.sum("nbytes").over(w))
        .withColumn(
            "shard_id",
            F.floor(
                (F.col("cum") - F.col("nbytes")) / F.lit(float(budget))
            ).cast("long"),
        )
        .groupBy("bucket", "shard_id")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum("nbytes").alias("shard_bytes"),
            F.round(F.sum("nbytes") / F.lit(float(budget)), 6).alias(
                "fill_ratio"
            ),
        )
    )


def q_rank_priority_bands(spark, sf_dir):
    """Rank -> frontier-priority quantization (the glue between a rank
    pass and the scheduler's host_priorities): per-host activity scores
    banded into 4 integer priorities via exact percentiles broadcast
    back (no global window over the host dimension). Band 0 = schedule
    first."""
    from crawler_spark.operators.rank import rank_to_priorities

    ranks = (
        _t(spark, sf_dir, "events")
        .select(
            F.concat(F.lit("h"), (F.col("user_id") % 23).cast("string")).alias(
                "node"
            )
        )
        .groupBy("node")
        .agg(F.count("*").cast("double").alias("rank"))
    )
    return rank_to_priorities(ranks, "node", "rank", n_bands=4)


def q_refresh_value(spark, sf_dir):
    """Value-weighted refresh priority: the Cho & Garcia-Molina change
    rate (change_rate's per-URL estimator) multiplied by a page-value
    prior (1 / (1 + frontier priority)) — freshness-aware recrawl should
    spend its budget where change is LIKELY and the page MATTERS, not on
    hot-but-worthless or valuable-but-static URLs. Pure native math,
    no shuffle at all (a codegen map over the frontier)."""
    d8 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 8, 1)) - 1)"
    f = _frontier(spark, sf_dir)
    est = f.select(
        "doc_id",
        "host",
        "priority",
        F.expr("cast(4 + doc_id % 5 as int)").alias("n"),
        F.expr(f"cast({d8} % (4 + doc_id % 5 + 1) as int)").alias("x"),
    ).withColumn(
        "lam", -F.log((F.col("n") - F.col("x") + 0.5) / (F.col("n") + 0.5))
    )
    return est.select(
        "doc_id",
        "host",
        F.round("lam", 6).alias("lambda_hat"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.col("priority")), 6).alias(
            "value_prior"
        ),
        F.round(F.col("lam") / (F.lit(1.0) + F.col("priority")), 6).alias(
            "refresh_value"
        ),
    )


def q_host_cocitation(spark, sf_dir):
    """Co-citation counts over the two-layer link graph (the HITS edge
    family): two targets are co-cited when the same source links both —
    the classic relatedness signal for site clustering and anchor-free
    topic grouping. One self-join on src (each source has exactly 2
    outlinks here, so pair volume == source count; at web scale the
    per-source fan-out bound caps the quadratic term the same way the
    triangle counter's ordered-edges trick does)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    edges = docs.select(
        F.col("doc_id").alias("src"),
        (F.col("doc_id") - F.col("doc_id") % 16).alias("dst"),
    ).union(
        # popular layer: 8 shared targets, so two docs in the same hub
        # block co-cite (hub, popular) whenever doc_id % 8 collides
        docs.select(F.col("doc_id"), (F.col("doc_id") % 8) + 1000)
    )
    a, b = edges.alias("a"), edges.alias("b")
    return (
        a.join(
            b,
            (F.col("a.src") == F.col("b.src"))
            & (F.col("a.dst") < F.col("b.dst")),
        )
        .groupBy(
            F.col("a.dst").alias("dst_a"), F.col("b.dst").alias("dst_b")
        )
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= 2)
    )


def q_host_ucb_priority(spark, sf_dir):
    """UCB1 crawl-budget allocation: per host, observed success rate
    (purchases per event as the fetch-success analog) plus the
    sqrt(2 ln N / n) exploration bonus — the bandit policy that keeps
    probing under-sampled hosts instead of greedily exploiting the
    current best. One map-side-combinable agg + a one-row broadcast
    total (idle_customers' scalar-gate pattern); the score feeds
    adaptive_budgets as the per-host multiplier."""
    ev = _t(spark, sf_dir, "events").select(
        F.concat(F.lit("h"), (F.col("user_id") % 23).cast("string")).alias(
            "host"
        ),
        (F.col("event_type") == "purchase").cast("long").alias("succ"),
    )
    per = ev.groupBy("host").agg(
        F.count("*").alias("n_trials"), F.sum("succ").alias("n_succ")
    )
    total = per.agg(F.sum("n_trials").alias("n_total"))
    return per.crossJoin(F.broadcast(total)).select(
        "host",
        "n_trials",
        F.round(F.col("n_succ") / F.col("n_trials"), 6).alias("success_rate"),
        F.round(
            F.col("n_succ") / F.col("n_trials")
            + F.sqrt(2.0 * F.log(F.col("n_total")) / F.col("n_trials")),
            6,
        ).alias("ucb_score"),
    )


def q_curriculum_stages(spark, sf_dir):
    """Curriculum staging for training: cut the corpus into 4 quality
    quartiles (stage 1 = cleanest, fed first) and report per stage: doc
    count, mean quality, mean token count — the manifest a curriculum
    loader consumes. Stage boundaries come from EXACT percentiles
    broadcast back onto the fact (two passes, both distributed) — NOT an
    ntile window, whose global sort would serialize a 10^10-row corpus
    into one task. Quality ties straddling a cut land in the same stage
    (percentile semantics), which is the honest behavior; cuts are
    round-9 pinned so both engines compare against identical doubles."""
    from crawler_spark.functions.text import quality_score, token_count

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        quality_score(F.col("text")).alias("quality"),
        token_count(F.col("text")).alias("n_tokens"),
    )
    cuts = d.agg(
        F.round(F.expr("percentile(quality, 0.25)"), 9).alias("c1"),
        F.round(F.expr("percentile(quality, 0.5)"), 9).alias("c2"),
        F.round(F.expr("percentile(quality, 0.75)"), 9).alias("c3"),
    )
    staged = d.crossJoin(F.broadcast(cuts)).withColumn(
        "stage",
        F.when(F.col("quality") >= F.col("c3"), F.lit(1))
        .when(F.col("quality") >= F.col("c2"), F.lit(2))
        .when(F.col("quality") >= F.col("c1"), F.lit(3))
        .otherwise(F.lit(4)),
    )
    return staged.groupBy("stage").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
        F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
        F.min("quality").alias("min_quality"),
        F.max("quality").alias("max_quality"),
    )


def q_ann_recall_eval(spark, sf_dir):
    """Recall@10 of the production IVF plan (8 cells, probe 2) vs exact
    brute-force truth, per sampled query (vec_id % 97 == 0) — the ANN
    quality gate that decides n_probe/n_cells on this corpus. The
    approximate side is the distributed multi-query ivf_topk_batch."""
    from crawler_spark.operators.evals import ann_recall_eval

    return ann_recall_eval(_t(spark, sf_dir, "embeddings"))


def q_robots_rule_usage(spark, sf_dir):
    """Robots-rule load audit: for every rule in the RFC 9309 matcher
    dimension, how many frontier URLs it MATCHES at all vs how many it
    actually DECIDES (wins longest-match precedence), plus the denials
    it causes — the report that tells a crawl operator which robots
    rules are load-bearing and which are dead weight (and how much the
    '<default>' allow is doing). Two broadcast joins over the same URL
    derivation rfc9309_gate uses; the rule dimension is tiny."""
    from crawler_spark.functions.robots import like_pattern
    from crawler_spark.operators.politeness import rfc9309_gate

    RULES = [
        ("h0", "/sec1*", False),
        ("h0", "/sec1/item7*", True),
        ("h0", "*.html$", False),
        ("h1", "/*", False),
        ("h1", "/sec2*", True),
        ("h2", "*.html$", True),
        ("h2", "*item3*", False),
    ]
    rules = spark.createDataFrame(
        [(h, p, like_pattern(p), a) for h, p, a in RULES],
        "host string, pattern string, like_pattern string, allow boolean",
    )
    d = _t(spark, sf_dir, "documents")
    urls = d.select(
        F.col("doc_id").alias("url_hash"),
        F.concat(F.lit("h"), (F.col("doc_id") % 3).cast("string")).alias("host"),
        F.concat(
            F.lit("/sec"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit("/item"),
            (F.col("doc_id") % 11).cast("string"),
            F.when(F.col("doc_id") % 4 == 0, F.lit(".html")).otherwise(F.lit("")),
        ).alias("path"),
    )
    gated = rfc9309_gate(urls, rules)
    decided = gated.groupBy(
        "host",
        F.coalesce(F.col("matched_pattern"), F.lit("<default>")).alias("pattern"),
    ).agg(
        F.count("*").alias("n_decided"),
        F.sum((~F.col("allowed")).cast("long")).alias("n_denied"),
    )
    matched = (
        urls.join(F.broadcast(rules), "host")
        .filter(F.expr("path LIKE like_pattern ESCAPE '!'"))
        .groupBy("host", "pattern")
        .agg(F.count("*").alias("n_matched"))
    )
    return matched.join(decided, ["host", "pattern"], "full").select(
        "host",
        "pattern",
        F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
        F.coalesce("n_decided", F.lit(0)).alias("n_decided"),
        F.coalesce("n_denied", F.lit(0)).alias("n_denied"),
    )


def q_retrieval_recall(spark, sf_dir):
    """Cross-modal retrieval eval (CLIP-eval shape): for a deterministic
    1-in-8 sample of images, rank every caption by exact cosine in the
    shared 32-dim space and report recall@1/@5 + MRR@10 of the
    own-caption ground truth — the per-wave drift check for the
    embedding-based curation stages. Brute-force by design (an eval
    wants the exact ranking); sample_mod is the scale dial."""
    from crawler_spark.operators.evals import crossmodal_retrieval_eval

    return crossmodal_retrieval_eval(
        _t(spark, sf_dir, "documents"), _t(spark, sf_dir, "embeddings")
    )


def q_lsh_dedup_eval(spark, sf_dir):
    """Precision/recall/F1 of the production MinHash (4, 2) banding
    against exact 3-gram Jaccard >= 0.5 truth ON THIS CORPUS — the
    query that decides whether a banding config ships. Both sides are
    the production operators; the eval join is candidate-volume sized."""
    from crawler_spark.operators.evals import lsh_dedup_eval

    return lsh_dedup_eval(_t(spark, sf_dir, "documents"), threshold=0.5)


def q_grouping_sets_mix(spark, sf_dir):
    """Explicit GROUPING SETS over NON-hierarchical, non-lattice sets —
    the grouping-family member cube/rollup can't express: detail by
    (returnflag, linestatus), an INDEPENDENT subtotal by shipmode, and
    the grand total, in ONE pass (Spark expands the sets map-side; one
    shuffle total, vs three separate aggregations + union). Issued
    through spark.sql to exercise the SQL entry path; gid derived from
    per-column GROUPING() bits (portable — DuckDB has no grouping_id).
    DECIMAL sum pinned once at the end per the determinism rule."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, ship_month,
               CAST(grouping(l_returnflag) * 4 + grouping(l_linestatus) * 2
                    + grouping(ship_month) AS BIGINT) AS gid,
               count(*) AS n,
               floor(CAST(sum(CAST(l_quantity AS DECIMAL(38,9))) AS DOUBLE)
                     * 1000000 + 0.5) / 1000000 AS sum_qty
        FROM (SELECT *, date_format(l_shipdate, 'yyyy-MM') AS ship_month
              FROM li_gs)
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (ship_month), ())
        """
    )


def q_image_dims_native(spark, sf_dir):
    """Header-only image dimensions with ZERO Python
    (operators/multimodal.py native_image_dims): PNG IHDR / qdct header
    fields pulled by substring+hex+conv on the binary column — the
    resolution-bucketing fast path that reads headers at scan speed
    where decode_stats pays a per-image python decode. To make this
    oracle-checkable despite binary payloads, the blobs are CONSTRUCTED
    from documents rows with unhex (bit-identical in both engines),
    then PARSED back by the production expressions; the same parser is
    separately proven against real own-codec images in
    tests/test_multimodal_arrow.py. Output: per-doc parsed dims + a
    match flag against the constructing values (all true)."""
    from crawler_spark.operators.multimodal import native_image_dims

    d = _t(spark, sf_dir, "documents").select("doc_id")
    spec = d.select(
        "doc_id",
        (F.lit(16) + F.col("doc_id") % 64).cast("long").alias("w0"),
        (F.lit(16) + (F.col("doc_id") * 7) % 64).cast("long").alias("h0"),
        F.when(F.col("doc_id") % 2 == 0, "png").otherwise("qdct").alias("fmt"),
    )
    blobs = spec.select(
        F.col("doc_id").cast("string").alias("image_id"),
        "doc_id",
        "fmt",
        "w0",
        "h0",
        F.when(
            F.col("fmt") == "png",
            F.expr(
                "unhex(concat('89504E470D0A1A0A', '0000000D', '49484452', "
                "lpad(hex(w0), 8, '0'), lpad(hex(h0), 8, '0')))"
            ),
        )
        .otherwise(
            F.expr(
                "unhex(concat(lpad(hex(w0), 4, '0'), lpad(hex(h0), 4, '0'),"
                " '04'))"
            )
        )
        .alias("bytes"),
    )
    dims = native_image_dims(blobs)
    return (
        blobs.select("image_id", "doc_id", "fmt", "w0", "h0")
        .join(dims, "image_id")
        .select(
            "doc_id",
            "fmt",
            "w",
            "h",
            ((F.col("w") == F.col("w0")) & (F.col("h") == F.col("h0"))).alias(
                "ok"
            ),
        )
    )


def q_snm_blocking_eval(spark, sf_dir):
    """Blocking P/R of sorted-neighborhood candidates (prefix-12 key,
    w=4) against exact 3-gram Jaccard >= 0.5 truth
    (operators/evals.py snm_blocking_eval) — the shipping decision for
    the SNM family, companion to lsh_dedup_eval: SNM recall depends on
    whether this corpus's near-dups sort adjacently, and only the
    corpus can answer."""
    from crawler_spark.operators.evals import snm_blocking_eval

    return snm_blocking_eval(_t(spark, sf_dir, "documents"))


def q_host_fairness(spark, sf_dir):
    """Scheduling-fairness dashboard over per-host fetch counts (events
    as the fetch log, host = user_id % 23): Jain index, Gini, hottest
    host's share. The politeness scheduler's health check — Jain near
    1/n means one host is starving the fleet. All integer sums, so the
    rounded ratios are engine-exact."""
    from crawler_spark.operators.evals import fairness_report

    served = (
        _t(spark, sf_dir, "events")
        .select(
            F.concat(F.lit("h"), (F.col("user_id") % 23).cast("string")).alias(
                "host"
            )
        )
        .groupBy("host")
        .agg(F.count("*").alias("n"))
    )
    return fairness_report(served, "host", "n")


def q_focused_priority(spark, sf_dir):
    """Shark-search focused-crawl priority: children inherit decayed
    parent topic-relevance plus an anchor-text bonus. Pages = documents;
    edges = every doc links to its 16-block hub with the doc's first
    token as anchor (the anchor_topk edge family); topic literal =
    (spark, query, stream, window). Per target: n_parents,
    best_priority (best-first key), avg_priority."""
    from crawler_spark.operators.rank import focused_priority

    docs = _t(spark, sf_dir, "documents")
    first_tok = F.split(
        F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " "
    )[0]
    edges = docs.select(
        F.col("doc_id").alias("src_id"),
        (F.col("doc_id") - F.col("doc_id") % 16).alias("dst_id"),
        first_tok.alias("anchor_term"),
    )
    return focused_priority(
        docs.select("doc_id", "text"),
        edges,
        ["spark", "query", "stream", "window"],
        decay=0.5,
    )


def q_url_static_priority(spark, sf_dir):
    """Static URL-feature priority (IRLbot/BUbiNG-style pre-fetch
    heuristic): score frontier candidates by URL shape alone — path
    depth, query-param count, digit density — before any content
    exists. One whole-stage-codegen map over the frontier derivation
    (URL suffix variety: sessionful, deep-path, index, bare)."""
    from crawler_spark.operators.rank import url_static_features

    f = _frontier(spark, sf_dir)
    url = F.concat(
        F.col("url"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit("?session="),
                F.col("doc_id").cast("string"),
                F.lit("&ref="),
                (F.col("doc_id") % 7).cast("string"),
            ),
        )
        .when(
            F.col("doc_id") % 5 == 1,
            F.concat(
                F.lit("/page/"),
                (F.col("doc_id") % 13).cast("string"),
                F.lit("/item/"),
                (F.col("doc_id") % 29).cast("string"),
            ),
        )
        .when(F.col("doc_id") % 5 == 2, F.lit("/index.html"))
        .otherwise(F.lit("")),
    )
    return url_static_features(f.select(url.alias("url")))


def _hyperball_edges(spark, sf_dir):
    """Sparse deterministic host graph for the HyperBall queries: every
    3rd doc emits one (doc_id%32) -> md5-digit host edge over 32 hosts
    — sparser than host_communities' family so 3-hop balls don't
    saturate to the whole graph (growth stays visible per round)."""
    d6 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 6, 1)) - 1)"
    d7 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 7, 1)) - 1)"
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id") % 3 == 0)
        .select(
            (F.col("doc_id") % 32).alias("src"),
            F.expr(f"(16 * {d6} + {d7}) % 32").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def q_hyperball_balls(spark, sf_dir):
    """HyperBall neighborhood function (Boldi & Vigna WWW'13) over the
    sparse host graph: |B(host, t)| HLL estimates for t = 0..3 — 'how
    much of the web does this host unlock within t hops', the
    billion-node-scale primitive behind geometric frontier priorities.
    One edge-join + (node, idx) max-agg per round over O(n*256)
    register rows; never a per-pair BFS. Register/estimator recipe is
    byte-identical to hll_distinct's, so the unrolled-CTE oracle is
    engine-exact (integer-scaled denominator, round-3 estimate)."""
    from crawler_spark.operators.graph import hyperball_balls

    return hyperball_balls(_hyperball_edges(spark, sf_dir), n_iter=3).select(
        F.col("node").alias("host_id"), "t", "ball_est"
    )


def q_harmonic_centrality(spark, sf_dir):
    """Harmonic centrality from the HyperBall run: sum_t>=1
    (|B(v,t)|-|B(v,t-1)|)/t — each newly reached host weighted by
    1/distance (Boldi & Vigna's estimator). All reweighting happens in
    lcm-scaled int64 space so the cross-engine sum is order-independent
    and exact; one window + one agg on top of q_hyperball_balls."""
    from crawler_spark.operators.graph import (
        harmonic_from_balls,
        hyperball_balls,
    )

    balls = hyperball_balls(_hyperball_edges(spark, sf_dir), n_iter=3)
    return harmonic_from_balls(balls, n_iter=3).select(
        F.col("node").alias("host_id"), "harmonic"
    )


def q_effective_diameter(spark, sf_dir):
    """90% effective diameter of the host graph from the HyperBall run
    (Palmer et al. KDD'02): the interpolated hop count where the
    neighborhood function N(t) = Σ_v |B(v,t)| reaches 90% of N(t_max) —
    the one-number 'how far apart is this web' diagnostic that decides
    crawl depth budgets. Integer-space crossing test (1000·N(t) >=
    900·N(T) over int64 thousandths) so the crossing index is
    engine-exact; one double division for the interpolation."""
    from crawler_spark.operators.graph import (
        effective_diameter,
        hyperball_balls,
    )

    balls = hyperball_balls(_hyperball_edges(spark, sf_dir), n_iter=3)
    return effective_diameter(balls, n_iter=3, q_permille=900)


def q_ppjoin_pairs(spark, sf_dir):
    """Exact trigram Jaccard >= 0.75 via AllPairs/PPJoin prefix
    filtering (Bayardo WWW'07, Xiao WWW'08): the candidate join probes
    only each doc's (1-t)-fraction prefix of RAREST shingles under a
    global df order, plus the length filter — the published web-scale
    all-pairs algorithm, orders of magnitude fewer candidates than the
    shared-shingle join on skewed corpora because hot shingles never
    enter the join. Threshold 3/4 is binary-exact so ceil(t*n) has no
    fp hazard in either engine. Oracle = naive complete all-pairs
    Jaccard, so the gate proves the filter LOSES NOTHING."""
    from crawler_spark.operators.dedup import prefix_filter_pairs

    return prefix_filter_pairs(
        _t(spark, sf_dir, "documents"), shingle_n=3, threshold=0.75
    )


def q_ppjoin_prefix_stats(spark, sf_dir):
    """PPJoin efficiency audit: candidate-pair count surviving the
    prefix+length filters vs final verified pairs — the numbers that
    justify the prefix filter at 100 TB (candidates ~ true near-dups,
    not shared-hot-shingle blowup). Oracle mirrors the prefix
    construction in SQL (row_number over (df, shingle) per doc), so the
    gate pins the filter's exact semantics cross-engine."""
    from crawler_spark.operators.dedup import prefix_filter_pairs

    return prefix_filter_pairs(
        _t(spark, sf_dir, "documents"),
        shingle_n=3,
        threshold=0.75,
        with_stats=True,
    )


def q_warc_revisit_plan(spark, sf_dir):
    """WARC revisit-record storage plan (WARC 1.1 §6.7.2, the
    Heritrix/IA dedup that stores a duplicate payload as a pointer):
    across two crawl waves, the FIRST occurrence of each payload
    digest (md5 of the body; order = (wave, doc_id)) is stored as a
    full response record, every later one as a revisit record. Per
    wave: records of each kind and the payload bytes the revisit form
    saves — the storage-planning number for a recurring crawl. One
    digest-partition window over the corpus, exact integer byte
    math."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("digest").orderBy("wave", "doc_id")
    planned = (
        d.select(
            "doc_id",
            (F.col("doc_id") % 2).alias("wave"),
            F.md5(F.col("text")).alias("digest"),
            F.col("n_chars").cast("long").alias("n_bytes"),
        )
        .withColumn("rn", F.row_number().over(w))
    )
    return (
        planned.groupBy("wave")
        .agg(
            F.sum((F.col("rn") == 1).cast("long")).alias("n_response"),
            F.sum((F.col("rn") > 1).cast("long")).alias("n_revisit"),
            F.sum(
                F.when(F.col("rn") > 1, F.col("n_bytes")).otherwise(F.lit(0))
            ).alias("bytes_saved"),
        )
    )


def q_exact_global_median(spark, sf_dir):
    """Exact GLOBAL median fetch latency without a global sort
    (operators/skew.exact_rank_select): histogram-bisection order
    statistic — pass 1 bins the column and a window over the BIN
    dimension locates the rank, pass 2 TakeOrders inside that one bin.
    The per-host percentile query keeps order stats partition-local;
    this is the fleet-wide one, where a naive orderBy would total-sort
    10^10 rows for one number."""
    from crawler_spark.operators.skew import exact_rank_select

    d1 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 1, 1)) - 1)"
    d2 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 2, 1)) - 1)"
    f = _frontier(spark, sf_dir)
    lat = f.select(
        (
            F.lit(50)
            + F.expr(f"({d1} * 16 + {d2})") * 7
            + F.col("priority") * 100
        ).cast("long").alias("lat_ms")
    )
    return exact_rank_select(lat, "lat_ms", bin_width=64)


def q_phash_bit_bias(spark, sf_dir):
    """Signature bit-bias audit over the stored 60-bit phash column:
    per bit position, the ones-count and |p(1) - 0.5| bias. Banded
    Hamming LSH assumes near-uniform bits; a stuck or heavily biased
    bit shrinks the effective band space and inflates candidate
    collisions, so this is the health check run before trusting a
    banding config at corpus scale. Pure integer shift/mask + one
    60-group aggregate."""
    from crawler_spark.operators.pairs import synth_pair_meta

    meta = synth_pair_meta(_t(spark, sf_dir, "documents"))
    bits = meta.select(
        F.posexplode(
            F.expr("transform(sequence(0, 59), i -> shiftright(phash, i) & 1)")
        ).alias("bit_idx", "b")
    )
    return (
        bits.groupBy("bit_idx")
        .agg(F.count("*").alias("n"), F.sum("b").cast("long").alias("n_ones"))
        .select(
            "bit_idx",
            "n_ones",
            F.round(F.abs(F.col("n_ones") / F.col("n") - 0.5), 6).alias("bias"),
        )
    )


def q_ams_f2(spark, sf_dir):
    """AMS F2 (self-join size) sketch vs exact, over the frontier's
    host key: the join planner's skew probe — one scan, k=16 int64
    counters, median-of-squares estimate (emitted as 2x the median to
    stay integral). Exact F2 computed alongside for the accuracy
    envelope, sketches.py's hll/countmin pattern."""
    from crawler_spark.operators.sketches import ams_f2

    f = _frontier(spark, sf_dir)
    return ams_f2(f, "host")


def q_degree_assortativity(spark, sf_dir):
    """Degree assortativity of the host graph (Newman PRL'02): the
    Pearson correlation of endpoint degrees over edges — webs are
    famously DISassortative (hubs link to leaves), and the sign/size
    of r is a one-number structure check on a crawled graph. Every
    accumulator is an int64 sum (degrees x edge incidences); the only
    floats are two IEEE-exact sqrts and one final division, rounded.
    Directed edges are symmetrized; each undirected edge contributes
    both (deg_u, deg_v) and (deg_v, deg_u), the standard estimator."""
    e = _hyperball_edges(spark, sf_dir).filter(F.col("src") != F.col("dst")).distinct()
    und = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = und.groupBy("src").agg(F.count("*").alias("deg"))
    xy = (
        und.join(deg.withColumnRenamed("src", "src_"), F.col("src") == F.col("src_"))
        .select("src", "dst", F.col("deg").alias("dx"))
        .join(
            deg.select(F.col("src").alias("dst_"), F.col("deg").alias("dy")),
            F.col("dst") == F.col("dst_"),
        )
        .select("dx", "dy")
    )
    agg = xy.agg(
        F.count("*").alias("m"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    return agg.select(
        F.col("m").cast("long").alias("n_incidences"),
        F.round(
            (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                F.sqrt(F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(F.col("m") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("assortativity"),
    )


def q_adjacency_gap_bits(spark, sf_dir):
    """WebGraph BV compression estimate over the HyperBall host graph:
    per host, γ-coded gap-list bits vs flat ceil(log2 n)-per-successor
    bits (Boldi & Vigna WWW'04). All arithmetic is integer (floor-log2
    via length(bin(x)) in BOTH engines), so the oracle is bit-exact."""
    from crawler_spark.operators.graph import adjacency_gap_bits

    return adjacency_gap_bits(_hyperball_edges(spark, sf_dir))


def q_bowtie_classes(spark, sf_dir):
    """Bow-tie census of the host graph (Broder WWW'00): SCC / IN /
    OUT / OTHER relative to the max-degree pivot's core, via one
    forward and one backward directed BFS. Edge family is built to
    exercise all four classes: an 8-host directed ring (the core), 8
    hosts feeding in, 8 fed out to, and a second disjoint ring (OTHER —
    strongly connected but not the pivot's component). Oracle =
    unbounded recursive-CTE reachability (UNION dedup terminates on
    cycles); the Spark side's hop budget of 10 covers the ring
    diameter, so both are the exact census."""
    from crawler_spark.operators.graph import bowtie_classes

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    # h decoupled from the branch selector (doc_id %% 4 fixes doc_id %% 8
    # to two residues, so h must come from the quotient)
    h = (F.col("doc_id") / 4).cast("long") % 8
    ring = docs.filter(F.col("doc_id") % 4 == 0).select(
        h.alias("src"), ((h + 1) % 8).alias("dst")
    )
    fan_in = docs.filter(F.col("doc_id") % 4 == 1).select(
        (h + 8).alias("src"), h.alias("dst")
    )
    fan_out = docs.filter(F.col("doc_id") % 4 == 2).select(
        h.alias("src"), (h + 16).alias("dst")
    )
    ring2 = docs.filter(F.col("doc_id") % 4 == 3).select(
        (h + 24).alias("src"), ((h + 1) % 8 + 24).alias("dst")
    )
    edges = ring.union(fan_in).union(fan_out).union(ring2)
    return bowtie_classes(edges, max_hops=10).select(
        F.col("node").alias("host_id"), "cls"
    )


def q_refresh_allocation(spark, sf_dir):
    """Optimal cross-host refresh-budget allocation (Cho &
    Garcia-Molina TODS'03): grant B=100 revisits/period across hosts by
    taking the B globally-largest marginal freshness gains
    val*lam/(f*(f+1)) — greedy is exactly optimal because the
    per-host objective val*lam*n/(n+1) is concave and separable. All
    gains are lcm-scaled int64 (x2520), so the global rank order is
    engine-exact. Rates/values derive deterministically from the
    frontier: lam = per-host sum of md5-nibble change signals, val =
    1 + host's min doc_id %% 3."""
    from crawler_spark.operators.politeness import refresh_allocation

    d8 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 8, 1)) - 1)"
    f = _frontier(spark, sf_dir)
    hosts = f.groupBy("host").agg(
        F.sum(F.expr(f"1 + {d8} % 4")).cast("long").alias("lam"),
        (F.min("doc_id") % 3 + 1).cast("long").alias("val"),
    )
    return refresh_allocation(hosts, budget=100, f_max=8)


def q_weighted_jaccard_pairs(spark, sf_dir):
    """Weighted (multiset) Jaccard >= 0.5 over word counts (the
    min-max kernel): repetition-honest near-dup scoring — set Jaccard
    calls "spam x400" and "spam" identical, the weighted form doesn't.
    Integer count arithmetic end-to-end (sum(max) = ta + tb -
    sum(min)), one shared-token join with the per-pair min-sum folded
    into the join aggregate."""
    from crawler_spark.operators.dedup import weighted_jaccard_pairs

    # trigram tokens: this corpus's ~30-word vocabulary makes every
    # UNIGRAM hot (join measured 100x slower at sf0.1); word-trigram
    # multisets keep count semantics with selective join keys. t=0.7
    # isolates the true near-dup families.
    return weighted_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.7, shingle_n=3
    )


def q_ed_join_pairs(spark, sf_dir):
    """Edit-distance similarity join (Ed-Join, Xiao et al. VLDB'08):
    all document pairs with Levenshtein distance <= 12, candidates from
    a char-3-gram prefix filter (k*q+1 rarest grams per doc under a
    global df order) + length filter, verified with Spark's
    threshold-banded levenshtein. The complement to the Jaccard family:
    catches character-level edits (typos, template fills) that word
    shingles blur. Oracle = NAIVE complete all-pairs levenshtein, so the
    gate proves the prefix filter LOSES NOTHING."""
    from crawler_spark.operators.dedup import ed_join_pairs

    # q=10: this corpus draws from a ~30-word pool, so char-TRIgrams
    # are all hot (vocab ~460, min df 133 at sf0.1) and the prefix
    # join blows up; 10-grams push the vocabulary to ~57k so prefix
    # keys are selective again. m=16 count refinement: requiring 16
    # shared prefix grams (vs 1) cuts candidates 204k -> 72k and wall
    # time 2x at sf0.1, provably lossless (generalized prefix lemma).
    # On real web text q=3..5 with small m is the usual setting; q and
    # m are exposed for exactly this tuning.
    return ed_join_pairs(_t(spark, sf_dir, "documents"), q=10, k=12, m=16)


def q_ed_join_stats(spark, sf_dir):
    """Ed-Join efficiency audit: candidates surviving the prefix+length
    filters vs verified pairs — at 10^10 docs the probe side is a fixed
    k*q+1 = 37 rarest grams per doc, so this ratio is what keeps the
    verify stage (the only O(k*n)-per-pair step) proportional to true
    near-dups. Oracle mirrors the prefix construction in SQL."""
    from crawler_spark.operators.dedup import ed_join_pairs

    return ed_join_pairs(
        _t(spark, sf_dir, "documents"), q=10, k=12, m=16, with_stats=True
    )


def q_train_linear_probe(spark, sf_dir):
    """Distributed logistic-regression TRAINING (operators/corpus.py
    train_linear_probe): 3 full-batch GD steps learn an is-English
    probe over 16 hashed-unigram fraction features + bias — the learn
    side of quality_classifier's frozen-weights inference. One
    map-side-combinable aggregate per step, model broadcast back,
    every float re-pinned to the 1e-9 grid and summed as DECIMAL so
    the unrolled-CTE oracle replays the exact trajectory."""
    from crawler_spark.operators.corpus import train_linear_probe

    return train_linear_probe(_t(spark, sf_dir, "documents"), n_iter=3)


def _probe_sql(n_iter: int = 3, lr: float = 0.5, nb: int = 16) -> str:
    """DuckDB mirror of q_train_linear_probe: the same GD recurrence
    unrolled as a CTE chain (link_rank's oracle pattern)."""
    dig = (
        "(instr('0123456789abcdef', "
        "substring(md5('probe:' || tok), 1, 1)) - 1)"
    )
    ctes = [
        f"""toks AS (
          SELECT doc_id, tok FROM (
            SELECT doc_id,
                   unnest(string_split(regexp_replace(lower(trim(text)),
                          '\\s+', ' ', 'g'), ' ')) AS tok
            FROM documents
          ) WHERE length(tok) > 0
        )""",
        f"""tj AS (
          SELECT doc_id, CAST({dig} % {nb} AS INT) AS j FROM toks
        )""",
        """counts AS (
          SELECT doc_id, j, count(*) AS c FROM tj GROUP BY doc_id, j
        )""",
        """totals AS (
          SELECT doc_id, count(*) AS n_toks FROM tj GROUP BY doc_id
        )""",
        f"""feats AS (
          SELECT counts.doc_id, j, round(c * 1.0 / n_toks, 9) AS x
          FROM counts JOIN totals USING (doc_id)
          UNION ALL
          SELECT doc_id, CAST({nb} AS INT) AS j, 1.0 AS x FROM totals
        )""",
        """labels AS (
          SELECT doc_id, CAST(lang = 'en' AS DOUBLE) AS y FROM documents
        )""",
        """nd AS (SELECT count(*) AS n FROM labels)""",
        f"""w0 AS (
          SELECT CAST(j AS INT) AS j, 0.0 AS w FROM range(0, {nb + 1}) t(j)
        )""",
    ]
    # pin9(x) = floor(x*1e9 + 0.5)/1e9 — the floor rule, NOT round():
    # engines disagree at exact half boundaries. Link = HARD sigmoid
    # clamp(0.5 + z/4, 0, 1): dyadic ops only, so both engines compute
    # the bit-identical double (libm/JVM exp() differ by 1 ulp).
    def p9(e: str) -> str:
        return f"CAST(floor(({e}) * 1e9 + 0.5) AS DOUBLE) / 1e9"

    for k in range(n_iter):
        ctes.append(
            f"""z{k} AS (
              SELECT f.doc_id,
                     {p9(f"CAST(sum(CAST({p9('f.x * w.w')} AS DECIMAL(28, 9))) AS DOUBLE)")} AS z
              FROM feats f JOIN w{k} w USING (j) GROUP BY f.doc_id
            )"""
        )
        sig = p9(
            "least(CAST(1.0 AS DOUBLE), "
            "greatest(CAST(0.0 AS DOUBLE), "
            "CAST(0.5 AS DOUBLE) + z / CAST(4.0 AS DOUBLE)))"
        )
        ctes.append(
            f"""r{k} AS (
              SELECT z{k}.doc_id,
                     {p9(f"{sig} - y")} AS r
              FROM z{k} JOIN labels USING (doc_id)
            )"""
        )
        ctes.append(
            f"""g{k} AS (
              SELECT f.j,
                     {p9(f"CAST(sum(CAST({p9('f.x * r.r')} AS DECIMAL(28, 9))) AS DOUBLE) / (SELECT n FROM nd)")} AS g
              FROM feats f JOIN r{k} r USING (doc_id) GROUP BY f.j
            )"""
        )
        ctes.append(
            f"""w{k + 1} AS (
              SELECT w{k}.j,
                     {p9(f"w{k}.w - {lr} * coalesce(g.g, 0.0)")} AS w
              FROM w{k} LEFT JOIN g{k} g USING (j)
            )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT j, w AS weight FROM w{n_iter}"
    )


def q_host_scc(spark, sf_dir):
    """Full strongly-connected-component census of the host graph
    (operators/graph.py scc_decompose — FW-BW-Trim coloring, the
    distributed SCC family; Tarjan's stack can't shuffle): every node
    labeled with its component's minimum id. Bow-tie gave the PIVOT's
    SCC; this closes the suite — spam rings/link farms are SCCs
    crawled as one unit, redirect cycles surface as non-singleton
    components. Trim shreds the acyclic mantle with two anti-joins per
    pass, coloring + one simultaneous backward sweep settles the
    cyclic cores. Oracle = mutual-reachability over a recursive-CTE
    transitive closure (quadratic, test-scale only — which is exactly
    why the engine side doesn't build a closure)."""
    from crawler_spark.operators.graph import scc_decompose

    return scc_decompose(_hyperball_edges(spark, sf_dir)).select(
        F.col("node").alias("host_id"), "scc_id"
    )


def _synth_image_df(spark, urls, with_url: bool = False):
    """Deterministic fixture images (image_id, bytes, fmt) synthesized
    IN EXECUTORS: T1_SMOKE.payload's own-codec PNG/qdct encode is
    CPU-bound pure python, so a driver-side list comprehension costs
    len(urls) serial encodes (~17 s for 64 images at bench time); one
    Arrow-batched mapInPandas wave amortizes it across every core. The
    payloads are identical either way (the synth web is deterministic
    per URL)."""
    import pandas as pd

    from crawler_spark.sources.synth import T1_SMOKE

    def gen(batches):
        for pdf in batches:
            rows = [T1_SMOKE.payload(u) for u in pdf["url"]]
            yield pd.DataFrame(
                {
                    "url": pd.array(list(pdf["url"]), dtype=object),
                    "image_id": pd.array(
                        [r["image_id"] for r in rows], dtype=object
                    ),
                    "bytes": pd.array(
                        [r["bytes"] for r in rows], dtype=object
                    ),
                    "fmt": pd.array([r["fmt"] for r in rows], dtype=object),
                }
            )

    n_parts = max(1, min(len(urls), spark.sparkContext.defaultParallelism))
    out = (
        spark.createDataFrame([(u,) for u in urls], "url string")
        .repartition(n_parts)
        .mapInPandas(
            gen, "url string, image_id string, bytes binary, fmt string"
        )
    )
    return out if with_url else out.drop("url")


def q_pareto_frontier(spark, sf_dir):
    """Exact distributed skyline over (value_score, staleness): the
    recrawl candidates no scalarization can rank away — every page not
    Pareto-dominated on both criteria. Two-phase plan
    (operators/skyline.py): per-bucket native window sweep, then one
    sweep over the union of bucket survivors; correctness is
    partition-count independent because skyline is algebraic over
    unions, so the dominated bulk never crosses the wire. Oracle is
    the quadratic NOT-EXISTS dominance definition — proving the
    two-phase sweep loses nothing."""
    from crawler_spark.operators.skyline import skyline2d

    pts = _t(spark, sf_dir, "documents").select(
        (F.col("n_chars") % 97).cast("long").alias("value_score"),
        ((F.col("doc_id") * 31) % 89).cast("long").alias("staleness"),
    )
    return skyline2d(pts, "value_score", "staleness").select(
        F.col("x").alias("value_score"), F.col("y").alias("staleness")
    )


def q_aimd_rates(spark, sf_dir):
    """AIMD politeness-rate replay (operators/politeness.py
    aimd_trajectory): each host's full 12-round outcome history folded
    through TCP's additive-increase / multiplicative-decrease rule in
    ONE higher-order `aggregate` per host — the batch recovery of every
    converged crawl rate with no per-round state tables, no driver
    loop, one shuffle. Integer (`div`) arithmetic end-to-end; the
    oracle replays the identical recurrence as a recursive CTE."""
    from crawler_spark.operators.politeness import aimd_trajectory

    hosts = (
        _t(spark, sf_dir, "documents")
        .select((F.col("doc_id") % 20).alias("hid"))
        .distinct()
    )
    outcomes = hosts.select(
        "hid", F.explode(F.sequence(F.lit(1), F.lit(12))).alias("round_id")
    ).select(
        F.concat(
            F.lit("host-"), F.col("hid").cast("string"), F.lit(".test")
        ).alias("host"),
        "round_id",
        ((F.col("hid") * 7 + F.col("round_id") * 13) % 5 == 0)
        .cast("int")
        .alias("n_failed"),
    )
    return aimd_trajectory(outcomes)


def q_host_distinct_hll(spark, sf_dir):
    """Per-host HLL distinct-URL estimate vs exact (sketches.py
    hll_registers_by): the grouped form of the cardinality sketch —
    the shuffle carries <=256 register rows per host instead of every
    distinct URL, the pattern that replaces count_distinct when both
    the group count and per-group cardinality are web-scale. Same
    integer-scaled harmonic estimator as the global sketch, so the
    grouped oracle transcribes it verbatim."""
    from crawler_spark.operators.sketches import (
        hll_estimate_by,
        hll_registers_by,
    )

    f = _frontier(spark, sf_dir)
    est = hll_estimate_by(hll_registers_by(f, ["host"], "url"), ["host"])
    exact = f.groupBy("host").agg(
        F.countDistinct("url").alias("exact_distinct")
    )
    return est.join(exact, "host").select(
        "host",
        F.floor(F.col("hll_estimate")).cast("long").alias("hll_floor"),
        "exact_distinct",
    )


def q_join_size_forecast(spark, sf_dir):
    """Count-Min join-cardinality forecast (sketches.py
    countmin_join_size, the AGMS inner-product estimator): the shuffle-
    join size of frontier hosts vs an event-activity host key predicted
    from two d*w sketches — two O(n) scans + a d*w-row join instead of
    the join itself; what a planner consults BEFORE committing a
    10^10-row shuffle. Exact join size co-computed as the witness;
    estimate >= exact always (one-sided CM error)."""
    from crawler_spark.operators.sketches import countmin_join_size

    f = _frontier(spark, sf_dir)
    ev = _t(spark, sf_dir, "events").select(
        F.concat(
            F.lit("host-"), (F.col("user_id") % 20).cast("string"),
            F.lit(".test"),
        ).alias("ehost")
    )
    return countmin_join_size(f, "host", ev, "ehost")


def q_scd2_robots_history(spark, sf_dir):
    """Type-2 SCD over a per-host crawl-delay change log
    (operators/enrich.py scd2_intervals + scd2_lookup): each fetch
    joins the delay that was in force AT ITS ROUND — joining today's
    robots dimension onto historical fetches silently rewrites
    history. Interval build is one lead() window over the dimension-
    sized change log; the lookup is an equi-join on host with the
    BETWEEN residual (broadcast dim), 1:1 per fact by construction."""
    from crawler_spark.operators.enrich import scd2_intervals, scd2_lookup

    docs = _t(spark, sf_dir, "documents")
    hosts = docs.select((F.col("doc_id") % 20).alias("hid")).distinct()
    changes = (
        hosts.select(
            "hid",
            F.explode(
                F.array(
                    F.lit(1), (F.lit(2) + F.col("hid") % 5).cast("int"),
                    F.lit(9),
                )
            ).alias("round_id"),
        )
        .select(
            F.concat(
                F.lit("host-"), F.col("hid").cast("string"), F.lit(".test")
            ).alias("host"),
            "round_id",
            ((F.col("hid") + F.col("round_id")) % 7 + 1).cast("long").alias(
                "delay_s"
            ),
        )
    )
    dim = scd2_intervals(changes, ["host"], "round_id")
    facts = docs.select(
        F.concat(
            F.lit("host-"), (F.col("doc_id") % 20).cast("string"),
            F.lit(".test"),
        ).alias("host"),
        (F.col("doc_id") % 12 + 1).cast("long").alias("fetch_round"),
    )
    looked = scd2_lookup(facts, dim, ["host"], "fetch_round")
    return looked.groupBy(
        "host", "fetch_round", "delay_s", "valid_from", "valid_to"
    ).agg(F.count("*").alias("n_fetches"))


def q_session_windows(spark, sf_dir):
    """Native session-window aggregation (F.session_window, 30-min
    gap): per-user sessions where end = last event + gap — Spark's
    built-in streaming-capable session operator run in batch form. One
    hash shuffle on user_id; the oracle is the classic gaps-and-
    islands construction (lag + running boundary sum), proving the
    built-in's merge semantics against first principles."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def _reach_sql(tbl: str) -> str:
    """Dialect-neutral recursive-CTE reachability (hop-bounded BFS over
    q_seed_distance's edge family) — the SAME text runs on Spark 4's
    native WITH RECURSIVE and on DuckDB, so the oracle is literally the
    query. `tbl` is the documents relation in each dialect."""
    return f"""
        WITH RECURSIVE e0 AS (
          SELECT CAST(doc_id % 20 AS BIGINT) AS src,
                 CAST((doc_id % 20 + 10) % 20 AS BIGINT) AS dst
          FROM {tbl} WHERE doc_id % 4 = 0
          UNION ALL
          SELECT CAST(doc_id % 20 AS BIGINT),
                 CAST((doc_id % 20 + 5) % 20 AS BIGINT)
          FROM {tbl} WHERE doc_id % 16 = 1
        ),
        e AS (SELECT DISTINCT src, dst FROM e0 WHERE src != dst),
        d(node, dist) AS (
          SELECT CAST(node AS BIGINT), 0
          FROM (VALUES (0), (1)) t(node)
          UNION ALL
          SELECT e.dst, d.dist + 1
          FROM d JOIN e ON e.src = d.node
          WHERE d.dist < 8
        )
        SELECT node AS host_id, CAST(min(dist) AS INT) AS dist
        FROM d GROUP BY node
    """


def q_recursive_reachability(spark, sf_dir):
    """Seed reachability via Spark 4's NATIVE recursive CTE — the
    declarative twin of operators/graph.py bfs_distances (which drives
    the same level-synchronous joins from Python). The engine owns the
    iteration: hop-bounded UNION ALL expansion, min-dist rollup at the
    end. Same edge family and seeds as `seed_distance`, so the two
    paths cross-check each other; the oracle is the identical SQL text
    on DuckDB. The per-path UNION ALL expansion is exponential in
    dense graphs — bfs_distances' anti-join frontier stays O(E) and
    remains the scale path; this is the expressiveness demo."""
    tbl = f"parquet.`{sf_dir}/documents.parquet`"
    return spark.sql(_reach_sql(tbl))


def q_variant_extract_stats(spark, sf_dir):
    """Semi-structured analytics over the VARIANT type (Spark 4 /
    Iceberg v3's open binary JSON): event rows serialized to nested
    JSON, ingested with parse_json into VARIANT, fields pulled back out
    with typed variant_get paths ('$.m.u' etc.) — the schema-flexible
    path for payloads whose shape drifts (crawl metadata, page
    annotations) where from_json's fixed schema would silently null new
    fields. Extraction stays JVM-side; the oracle builds and walks the
    same JSON with DuckDB's json operators."""
    ev = _t(spark, sf_dir, "events").select(
        F.to_json(
            F.struct(
                F.col("event_type").alias("t"),
                F.struct(
                    F.col("user_id").alias("u"), F.col("event_id").alias("e")
                ).alias("m"),
            )
        ).alias("js")
    )
    v = ev.select(F.parse_json(F.col("js")).alias("var"))
    flat = v.select(
        F.expr("variant_get(var, '$.t', 'string')").alias("event_type"),
        F.expr("variant_get(var, '$.m.u', 'long')").alias("u"),
        F.expr("variant_get(var, '$.m.e', 'long')").alias("e"),
    )
    return flat.groupBy("event_type").agg(
        F.countDistinct("u").alias("n_users"),
        F.sum("e").alias("sum_event_ids"),
        F.count("*").alias("n_events"),
    )


def q_kmv_vocab_sketch(spark, sf_dir):
    """Per-source KMV distinct-vocabulary estimate (Bar-Yossef '02 /
    Beyer SIGMOD'07, operators/sketches.py kmv_sketch): the k=64
    smallest 60-bit token hashes per source; est = (k-1)/u_k. The
    k-smallest runs as the salted two-phase window (no single-task
    group), and — unlike the HLL registers next door — this sketch
    composes under union AND intersection (kmv_set_algebra). Exact
    distinct co-computed as the sandbox witness (dropped at scale)."""
    from crawler_spark.operators.corpus import _tokens
    from crawler_spark.operators.sketches import (
        KMV_K,
        kmv_estimate,
        kmv_sketch,
    )

    d = _t(spark, sf_dir, "documents")
    toks = _tokens(d, "text", "doc_id").join(
        d.select("doc_id", "source"), "doc_id"
    )
    sk = kmv_sketch(toks, "concat('kmv:', tok)", ["source"], k=KMV_K)
    est = kmv_estimate(sk, ["source"], k=KMV_K)
    exact = toks.groupBy("source").agg(
        F.countDistinct("tok").alias("exact_distinct")
    )
    p6 = lambda c: F.expr(
        f"cast(floor(({c}) * 1e6 + 0.5) as double) / 1e6"
    )  # noqa: E731
    return est.join(exact, "source").select(
        "source",
        "n_kept",
        p6("theta").alias("theta6"),
        p6("est_distinct").alias("est6"),
        "exact_distinct",
        p6("abs(est_distinct - exact_distinct) / exact_distinct").alias(
            "rel_err6"
        ),
    )


def q_kmv_set_algebra(spark, sf_dir):
    """Theta-sketch set algebra across every source pair: estimated
    |A ∪ B|, |A ∩ B| and Jaccard of the two sources' vocabularies from
    their k-row KMV sketches ALONE — the overlap question HLL registers
    cannot answer (no register intersection exists). Pair stage is
    O(sources^2 * k) on dimension-sized sketches; the raw tokens are
    touched once, by the sketch build. Exact set sizes co-computed as
    the sandbox witness."""
    from crawler_spark.operators.corpus import _tokens
    from crawler_spark.operators.sketches import (
        KMV_K,
        kmv_set_algebra,
        kmv_sketch,
    )

    d = _t(spark, sf_dir, "documents")
    toks = _tokens(d, "text", "doc_id").join(
        d.select("doc_id", "source"), "doc_id"
    )
    sk = kmv_sketch(toks, "concat('kmv:', tok)", ["source"], k=KMV_K)
    alg = kmv_set_algebra(sk, "source", k=KMV_K)
    st = toks.select("source", "tok").distinct()
    ex = (
        st.select(F.col("source").alias("set_a"), "tok")
        .join(st.select(F.col("source").alias("set_b"), "tok"), "tok")
        .filter(F.col("set_a") < F.col("set_b"))
        .groupBy("set_a", "set_b")
        .agg(F.count("*").alias("exact_inter"))
    )
    sizes = st.groupBy("source").agg(F.count("*").alias("n"))
    p6 = lambda c: F.expr(
        f"cast(floor(({c}) * 1e6 + 0.5) as double) / 1e6"
    )  # noqa: E731
    return (
        alg.join(ex, ["set_a", "set_b"], "left")
        .join(
            sizes.select(F.col("source").alias("set_a"), F.col("n").alias("na")),
            "set_a",
        )
        .join(
            sizes.select(F.col("source").alias("set_b"), F.col("n").alias("nb")),
            "set_b",
        )
        .select(
            "set_a",
            "set_b",
            p6("est_union").alias("est_union6"),
            p6("est_inter").alias("est_inter6"),
            p6("est_jaccard").alias("est_jacc6"),
            (F.col("na") + F.col("nb") - F.coalesce("exact_inter", F.lit(0)))
            .cast("long")
            .alias("exact_union"),
            F.coalesce("exact_inter", F.lit(0)).cast("long").alias("exact_inter"),
        )
    )


def q_edh_histogram(spark, sf_dir):
    """Equi-depth histogram of order totals (operators/stats.py) — the
    optimizer-statistics primitive behind every selectivity estimate:
    16 buckets of ~1/16 of a deterministic 10% key-sampled draw, so
    skewed values can't starve fences the way equi-width buckets do.
    Stats come from a bounded sample BY DESIGN (Spark ANALYZE /
    Postgres do the same); the full table is never sorted."""
    from crawler_spark.operators.stats import equi_depth_histogram

    o = _t(spark, sf_dir, "orders")
    h = equi_depth_histogram(
        o, "o_totalprice", "o_orderkey", n_buckets=16, sample_permille=100
    )
    p6 = lambda c: F.expr(
        f"cast(floor(({c}) * 1e6 + 0.5) as double) / 1e6"
    )  # noqa: E731
    return h.select(
        "bucket",
        p6("lo").alias("lo6"),
        p6("hi").alias("hi6"),
        "n_rows",
        p6("est_frac").alias("est_frac6"),
    )


def q_edh_selectivity_audit(spark, sf_dir):
    """Range-selectivity estimates from the 16-bucket equi-depth
    histogram vs the true fractions — the audit a cost model ships
    with. Worst-case error is ~1/B + sample noise regardless of value
    skew (SIGMOD'84); the estimate itself never touches the fact
    table, only the B-row histogram joined to a broadcast predicate
    dimension."""
    from crawler_spark.operators.stats import (
        equi_depth_histogram,
        range_selectivity,
    )

    o = _t(spark, sf_dir, "orders")
    hist = equi_depth_histogram(
        o, "o_totalprice", "o_orderkey", n_buckets=16, sample_permille=100
    )
    preds = spark.createDataFrame(
        [
            (1, 0.0, 50000.0),
            (2, 50000.0, 150000.0),
            (3, 150000.0, 300000.0),
            (4, 300000.0, 600000.0),
            (5, 100000.0, 110000.0),
        ],
        "pred_id int, p_lo double, p_hi double",
    )
    est = range_selectivity(hist, preds)
    n = o.count()
    actual = (
        F.broadcast(preds)
        .crossJoin(o.select("o_totalprice"))
        .filter(
            (F.col("o_totalprice") >= F.col("p_lo"))
            & (F.col("o_totalprice") <= F.col("p_hi"))
        )
        .groupBy("pred_id")
        .agg((F.count("*") / F.lit(float(n))).alias("actual_sel"))
    )
    p6 = lambda c: F.expr(
        f"cast(floor(({c}) * 1e6 + 0.5) as double) / 1e6"
    )  # noqa: E731
    return (
        est.join(actual, "pred_id", "left")
        .select(
            "pred_id",
            "p_lo",
            "p_hi",
            p6("est_sel").alias("est_sel6"),
            p6("coalesce(actual_sel, 0.0)").alias("actual_sel6"),
            p6("abs(est_sel - coalesce(actual_sel, 0.0))").alias("abs_err6"),
        )
    )


def q_join_order_costs(spark, sf_dir):
    """System R join ordering (Selinger SIGMOD'79) over the filtered
    chain customer('BUILDING') -> orders -> lineitem(qty < 5): both
    left-deep orders costed with |R⋈S| = |R||S|/max(ndv) from exact
    per-table scalars (swap in KMV/HLL ndv at 10^10 rows), ranked by
    total intermediate rows, with the true intermediate sizes as
    witness — the selective customer filter must make (C*O)*L win.
    The only driver-side data are per-table (n, ndv) scalars."""
    from crawler_spark.operators.stats import system_r_chain_costs

    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), F.col("o_orderkey").alias("orderkey")
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") < 5).select(
        F.col("l_orderkey").alias("orderkey")
    )
    costs = system_r_chain_costs([("C", c, "custkey"), ("O", o, "orderkey"), ("L", l, None)])
    act = spark.createDataFrame(
        [
            ("(C*O)*L", c.join(o, "custkey").count()),
            ("(O*L)*C", o.join(l, "orderkey").count()),
        ],
        "plan string, actual_inter long",
    )
    p6 = lambda c_: F.expr(
        f"cast(floor(({c_}) * 1e6 + 0.5) as double) / 1e6"
    )  # noqa: E731
    return costs.join(act, "plan").select(
        "plan",
        p6("est_inter").alias("est_inter6"),
        p6("est_cost").alias("est_cost6"),
        F.col("rank").cast("long").alias("rank"),
        "actual_inter",
    )


def q_anchor_text_index(spark, sf_dir):
    """Anchor-text index build (Brin & Page '98 §2.2; operators/rank.py
    anchor_text_index): per target host, the top-3 anchor terms by
    authority-weighted link score — the off-page relevance signal that
    also describes UNFETCHED frontier targets. Deterministic synthetic
    link graph over documents (trap_gate's idiom); authority is a
    broadcast 20-row host dimension; the only O(edges) stage is one
    map-side-combinable groupBy."""
    from crawler_spark.operators.rank import anchor_text_index

    d = _t(spark, sf_dir, "documents")
    dig = "(instr('0123456789abcdef', substring(md5(concat('anch:', cast(doc_id as string))), 1, 1)) - 1)"
    edges = d.select(
        F.expr("concat('h', cast(doc_id % 20 as string))").alias("src"),
        F.expr("concat('h', cast((doc_id * 7 + 3) % 20 as string))").alias("dst"),
        F.expr(f"concat('kw', cast({dig} % 8 as string))").alias("term"),
    ).filter(F.col("src") != F.col("dst"))
    auth = spark.range(20).select(
        F.expr("concat('h', cast(id as string))").alias("src"),
        (F.lit(1.0) / (F.lit(1.0) + (F.col("id") % 7).cast("double"))).alias(
            "auth"
        ),
    )
    return anchor_text_index(edges, auth, k=3)


def q_latency_mad_outliers(spark, sf_dir):
    """Robust per-type outlier gate (operators/robust.py mad_outliers,
    Iglewicz & Hoaglin '93): modified z from lower-median order
    statistics — planted 500-unit spikes (event_id % 997 == 0) must
    flag while the mean/stddev a naive gate uses would be dragged by
    those same spikes. Emits only the flagged rows."""
    from crawler_spark.operators.robust import mad_outliers

    e = _t(spark, sf_dir, "events")
    lat = e.select(
        "event_type",
        "event_id",
        (
            F.col("value")
            + F.when(F.col("event_id") % 997 == 0, F.lit(500.0)).otherwise(
                F.lit(0.0)
            )
        ).alias("lat"),
    )
    out = mad_outliers(lat, "event_type", "event_id", "lat", z_thresh=3.5)
    p6 = lambda c: F.expr(
        f"cast(floor(({c}) * 1e6 + 0.5) as double) / 1e6"
    )  # noqa: E731
    return out.filter(F.col("is_outlier")).select(
        "event_type", "event_id", p6("lat").alias("lat6"), "z6"
    )


def q_host_latency_trend(spark, sf_dir):
    """Theil-Sen robust trend per event type (operators/robust.py):
    median-of-pairwise-slopes over an md5-sampled series (bounded
    pair count by construction) — the "is this host slowing down"
    estimator that survives retry/timeout pollution OLS cannot. x is
    hours since the corpus anchor in exact microseconds."""
    from crawler_spark.operators.robust import theil_sen_trend

    e = _t(spark, sf_dir, "events")
    samp = e.filter(
        F.expr(
            "pmod(cast(conv(substring(md5(concat('ts:', cast(event_id as "
            "string))), 1, 15), 16, 10) as bigint), 1000) < 10"
        )
    ).select(
        "event_type",
        (
            (F.unix_micros(F.col("ts").cast("timestamp")) - F.lit(1704067200000000))
            / F.lit(3.6e9)
        ).alias("xh"),
        "value",
    )
    t = theil_sen_trend(samp, "event_type", "xh", "value")
    p6 = lambda c: F.expr(
        f"cast(floor(({c}) * 1e6 + 0.5) as double) / 1e6"
    )  # noqa: E731
    return t.select(
        "event_type",
        "n_points",
        "n_pairs",
        p6("coalesce(slope, 0.0)").alias("slope6"),
    )


def q_unimax_allocation(spark, sf_dir):
    """UniMax-style token-budget allocation (Chung et al. '23;
    operators/corpus.py waterfill_allocation): spread a 1.5x-corpus
    budget uniformly across languages but cap each at 2 epochs of its
    available docs — low-resource languages saturate at their cap and
    their surplus water-fills the rest, in closed form (sorted
    threshold, one window over the LANGUAGE dimension). The only
    driver scalar is the corpus count."""
    from crawler_spark.operators.corpus import waterfill_allocation

    d = _t(spark, sf_dir, "documents")
    n = d.count()
    groups = d.groupBy(F.col("lang").alias("key")).agg(
        (F.lit(2.0) * F.count("*").cast("double")).alias("cap"),
        F.lit(1.0).alias("w"),
    )
    out = waterfill_allocation(groups, budget=1.5 * n)
    p6 = lambda c: F.expr(
        f"cast(floor(({c}) * 1e6 + 0.5) as double) / 1e6"
    )  # noqa: E731
    return out.select(
        F.col("key").alias("lang"),
        p6("cap").alias("cap6"),
        p6("ratio").alias("ratio6"),
        p6("alloc").alias("alloc6"),
        "saturated",
    )


def _unimax_sql() -> str:
    """DuckDB mirror of q_unimax_allocation: pinned caps/weights,
    DECIMAL prefix sums in the same (ratio, key) order, identical
    water-level arithmetic."""
    p9 = "CAST(floor(({e}) * 1e9 + 0.5) AS DOUBLE) / 1e9"
    return f"""WITH counts AS (
      SELECT lang AS key, count(*) AS n FROM documents GROUP BY lang
    ),
    bud AS (
      SELECT CAST(1.5 AS DOUBLE)
             * (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS b
    ),
    r AS (
      SELECT key,
             {p9.format(e="CAST(2.0 AS DOUBLE) * CAST(n AS DOUBLE)")} AS cap,
             {p9.format(e="CAST(1.0 AS DOUBLE)")} AS w
      FROM counts
    ),
    rr AS (SELECT key, cap, w, cap / w AS ratio FROM r),
    staged AS (
      SELECT key, cap, w, ratio,
             CAST(sum(CAST(cap AS DECIMAL(28, 9)))
                  OVER (ORDER BY ratio, key
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_cap,
             CAST(sum(CAST(w AS DECIMAL(28, 9)))
                  OVER (ORDER BY ratio, key
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_w,
             CAST(sum(CAST(w AS DECIMAL(28, 9))) OVER () AS DOUBLE) AS tot_w
      FROM rr
    ),
    lam2 AS (
      SELECT max(least(((SELECT b FROM bud) - (cum_cap - cap))
                         / (tot_w - (cum_w - w)),
                       ratio)) AS lam
      FROM staged
    )
    SELECT key AS lang,
           CAST(floor(cap * 1e6 + 0.5) AS DOUBLE) / 1e6 AS cap6,
           CAST(floor(ratio * 1e6 + 0.5) AS DOUBLE) / 1e6 AS ratio6,
           CAST(floor(least(cap, (SELECT lam FROM lam2) * w) * 1e6 + 0.5)
                AS DOUBLE) / 1e6 AS alloc6,
           ratio <= (SELECT lam FROM lam2) AS saturated
    FROM staged"""


def q_cusum_regime_shifts(spark, sf_dir):
    """Two-sided CUSUM changepoint alarms per event type (Page '54;
    operators/robust.py cusum_alarms) over the clamped event-value
    series with planted +40 regime segments — the sustained-small-drift
    detector a pointwise threshold misses. Entirely native: the
    recursion is the prefix-sum-minus-running-min closed form, decimal
    prefix sums, whole-stage codegen. Emits alarm rows only."""
    from crawler_spark.operators.robust import cusum_alarms

    e = _t(spark, sf_dir, "events")
    x = e.select(
        "event_type",
        "event_id",
        (
            F.least(F.col("value"), F.lit(150.0))
            + F.when(F.col("event_id") % 4000 >= 2000, F.lit(40.0)).otherwise(
                F.lit(0.0)
            )
        ).alias("x"),
    )
    out = cusum_alarms(
        x, "event_type", "event_id", "x", target=70.0, slack=20.0, h=800.0
    )
    p6 = lambda c: F.expr(
        f"cast(floor(({c}) * 1e6 + 0.5) as double) / 1e6"
    )  # noqa: E731
    return out.filter(F.col("alarm")).select(
        "event_type", "event_id", p6("x").alias("x6"), "s_pos6", "s_neg6"
    )


def q_rrf_fusion(spark, sf_dir):
    """Hybrid retrieval via reciprocal-rank fusion (SIGIR'09;
    operators/evals.py rrf_fuse): for each query document (doc_id %
    100 == 0), a LEXICAL ranking (unigram Jaccard, top-20) and a
    VECTOR ranking (embedding cosine, top-20) fuse by 1/(60+rank) —
    rank-only, so the incomparable raw scores never need calibration.
    Both rankings and the fusion are dimension-shaped joins; the
    corpus is scanned once per modality."""
    from crawler_spark.operators.evals import rrf_fuse

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.array_distinct(
            F.filter(
                F.split(F.regexp_replace(F.lower(F.trim(F.col("text"))),
                                         r"\s+", " "), " "),
                lambda x: x != "",
            )
        ).alias("tk"),
    )
    qt = toks.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"), F.col("tk").alias("qtk")
    )
    jac = (
        toks.crossJoin(F.broadcast(qt))
        .filter(F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id",
            "doc_id",
            F.expr(
                "floor(cast(size(array_intersect(tk, qtk)) as double)"
                " * 1000000 / size(array_union(tk, qtk)) + 0.5) / 1000000"
            ).alias("s"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("s"), "doc_id")
    text_rank = (
        jac.withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") <= 20)
        .select("query_id", "doc_id", "rnk")
    )
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qe = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )

    cos = (
        e.crossJoin(F.broadcast(qe))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            F.round(
                _dot_d(F.col("v"), F.col("qv"))
                / (
                    F.sqrt(_dot_d(F.col("v"), F.col("v")))
                    * F.sqrt(_dot_d(F.col("qv"), F.col("qv")))
                ),
                6,
            ).alias("s"),
        )
    )
    vec_rank = (
        cos.withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") <= 20)
        .select("query_id", "doc_id", "rnk")
    )
    fused = rrf_fuse(text_rank.unionByName(vec_rank), k_const=60, top_k=10)
    p6 = lambda c: F.expr(
        f"cast(floor(({c}) * 1e6 + 0.5) as double) / 1e6"
    )  # noqa: E731
    return fused.select(
        "query_id", "doc_id", "n_lists", p6("rrf").alias("rrf6"), "fused_rank"
    )


def _rrf_sql() -> str:
    """DuckDB mirror of q_rrf_fusion: identical tokenization, pinned
    Jaccard, round-6 cosine, both top-20 rankings, and the pinned
    decimal-summed 1/(60+rank) fusion."""
    return """WITH tk AS (
      SELECT doc_id,
             list_distinct(list_filter(
               string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
               x -> length(x) > 0)) AS tk
      FROM documents
    ),
    qt AS (
      SELECT doc_id AS query_id, tk AS qtk FROM tk WHERE doc_id % 100 = 0
    ),
    jac AS (
      SELECT q.query_id, t.doc_id,
             floor(CAST(len(list_intersect(t.tk, q.qtk)) AS DOUBLE) * 1000000
                   / len(list_distinct(list_concat(t.tk, q.qtk))) + 0.5)
               / 1000000 AS s
      FROM tk t, qt q WHERE t.doc_id <> q.query_id
    ),
    tr AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY s DESC, doc_id) AS rnk
      FROM jac
    ),
    trk AS (SELECT query_id, doc_id, rnk FROM tr WHERE rnk <= 20),
    e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    qe AS (
      SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 100 = 0
    ),
    cos AS (
      SELECT q.query_id, e.vec_id AS doc_id,
             round(list_dot_product(e.v, q.qv)
                   / (sqrt(list_dot_product(e.v, e.v))
                      * sqrt(list_dot_product(q.qv, q.qv))), 6) AS s
      FROM e, qe q WHERE e.vec_id <> q.query_id
    ),
    vr AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY s DESC, doc_id) AS rnk
      FROM cos
    ),
    vrk AS (SELECT query_id, doc_id, rnk FROM vr WHERE rnk <= 20),
    u AS (SELECT * FROM trk UNION ALL SELECT * FROM vrk),
    agg AS (
      SELECT query_id, doc_id,
             CAST(count(*) AS BIGINT) AS n_lists,
             CAST(sum(CAST(CAST(floor(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + rnk) * 1e9 + 0.5)
                                AS DOUBLE) / 1e9 AS DECIMAL(28,9)))
                  AS DOUBLE) AS rrf
      FROM u GROUP BY query_id, doc_id
    ),
    fr AS (
      SELECT query_id, doc_id, n_lists, rrf,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY rrf DESC, doc_id) AS BIGINT)
               AS fused_rank
      FROM agg
    )
    SELECT query_id, doc_id, n_lists,
           CAST(floor(rrf * 1e6 + 0.5) AS DOUBLE) / 1e6 AS rrf6,
           fused_rank
    FROM fr WHERE fused_rank <= 10"""


def q_chunk_windows(spark, sf_dir):
    """Sliding-window LM chunking (operators/corpus.py chunk_windows):
    128-token windows, stride 96 (32-token overlap) — cuts LONG docs
    to training budget where sequence_packing packs short ones. Pure
    per-row array expressions, windows exploded (~n/stride rows per
    doc), text carried as md5."""
    from crawler_spark.operators.corpus import chunk_windows

    return chunk_windows(
        _t(spark, sf_dir, "documents"), window=128, stride=96
    )


def _chunk_sql(window: int = 128, stride: int = 96) -> str:
    """DuckDB mirror of q_chunk_windows: same tokenization, same
    window starts, same slice/join/md5."""
    return f"""WITH d AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> length(x) > 0) AS tk
      FROM documents
    ),
    dd AS (SELECT doc_id, tk, len(tk) AS n FROM d WHERE len(tk) > 0),
    w AS (
      SELECT doc_id, n, tk,
             CAST(u.gs AS BIGINT) AS start_tok,
             CAST(row_number() OVER (PARTITION BY doc_id ORDER BY u.gs) - 1
                  AS BIGINT) AS chunk_id
      FROM dd, unnest(generate_series(0, n - 1, {stride})) AS u(gs)
      WHERE u.gs = 0 OR u.gs + {window - stride} < n
    )
    SELECT doc_id, chunk_id, start_tok,
           CAST(least({window}, n - start_tok) AS BIGINT) AS n_toks,
           md5(array_to_string(list_slice(tk, start_tok + 1,
                                          start_tok + {window}), ' '))
             AS chunk_md5
    FROM w"""


def q_dgim_error_window(spark, sf_dir):
    """DGIM sliding-window error-rate counter per event type
    (Datar-Gionis-Indyk-Motwani SODA'02; operators/sketches.py
    dgim_counts): estimated count of high-value events among the last
    1000 per type from O(log^2 N) state — the per-host trailing error
    counter a fetcher fleet keeps where exact ring buffers don't fit.
    Sequential bucket fold -> applyInPandas grouped map (the
    legitimate Python seam; groups parallelize, state is tiny). No
    SQL oracle by nature (rows-only); invariants pinned in
    tests/test_sketches.py, exact witness co-emitted."""
    from crawler_spark.operators.sketches import dgim_counts

    return dgim_counts(
        _t(spark, sf_dir, "events"),
        ["event_type"],
        "event_id",
        "value > 100.0",
        window_n=1000,
    )


FS_FIELDS = [  # (field, m = P(agree|match), u = P(agree|non-match))
    ("same_lang", 0.90, 0.25),
    ("same_source", 0.60, 0.05),
    ("len_close", 0.85, 0.30),
    ("jac50", 0.90, 0.02),
]


def _fs_feat(spark, sf_dir):
    """Shared SNM-candidate + agreement-field derivation for the
    Fellegi-Sunter queries (scoring and EM fitting) — mirrored by the
    oracle-side _FS_FEAT_CTES."""
    from crawler_spark.operators.dedup import snm_candidate_pairs

    d = _t(spark, sf_dir, "documents")
    norm = d.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ").alias("t"),
    )
    keyed = norm.select("doc_id", F.substring("t", 1, 12).alias("k"))
    cand = snm_candidate_pairs(keyed, "k", "doc_id", window=4).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    toks = norm.select(
        "doc_id",
        F.array_distinct(
            F.filter(F.split(F.col("t"), " "), lambda x: x != "")
        ).alias("toks"),
    )
    side = lambda suf: norm.select(  # noqa: E731
        F.col("doc_id").alias(f"doc_{suf}"),
        F.col("lang").alias(f"lang_{suf}"),
        F.col("source").alias(f"source_{suf}"),
        F.col("n_chars").alias(f"nc_{suf}"),
    )
    ta = toks.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a"))
    tb = toks.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b"))
    feat = (
        cand.join(side("a"), "doc_a")
        .join(side("b"), "doc_b")
        .join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("lang_a") == F.col("lang_b")).alias("same_lang"),
            (F.col("source_a") == F.col("source_b")).alias("same_source"),
            (F.abs(F.col("nc_a") - F.col("nc_b")) <= 20).alias("len_close"),
            F.coalesce(
                F.expr(
                    "floor(cast(size(array_intersect(toks_a, toks_b)) as double)"
                    " * 1000000 / size(array_union(toks_a, toks_b)) + 0.5)"
                    " / 1000000"
                )
                >= 0.5,
                F.lit(False),  # zero-token doc: 0/0 is NULL; the oracle
                # coalesces to FALSE — match it (disagreement weight)
            ).alias("jac50"),
        )
    )
    return feat


def q_fs_match_decisions(spark, sf_dir):
    """Fellegi-Sunter record linkage (JASA '69; operators/dedup.py
    fs_match_scores) over SNM blocking candidates: four agreement
    fields (language, source, length band, unigram-Jaccard >= 0.5)
    score ln(m/u) / ln((1-m)/(1-u)) with literal m/u, and the
    two-threshold rule splits match / possible / non-match — the
    decision layer between cheap blocking and expensive review.
    Zero-shuffle past the candidate join; weights are pinned literals
    so both engines add identical doubles."""
    from crawler_spark.operators.dedup import fs_match_scores

    feat = _fs_feat(spark, sf_dir)
    return fs_match_scores(feat, FS_FIELDS, upper=4.0, lower=0.0).select(
        "doc_a",
        "doc_b",
        "same_lang",
        "same_source",
        "len_close",
        "jac50",
        "score",
        "decision",
    )


def q_fs_em_fit(spark, sf_dir):
    """EM estimation of the Fellegi-Sunter m/u parameters (Winkler '88;
    operators/dedup.py fs_em_fit) over the SAME SNM candidates and
    agreement fields as fs_match_decisions — the learning step that
    produces the literal weights the scorer consumes. Three EM rounds
    on the <=16-row agreement-pattern table; posteriors integer-scaled
    before every M-step sum so the whole trajectory is engine-exact,
    mirrored by the unrolled-CTE oracle."""
    from crawler_spark.operators.dedup import fs_em_fit

    feat = _fs_feat(spark, sf_dir)
    return fs_em_fit(
        feat, ["same_lang", "same_source", "len_close", "jac50"], n_iter=3
    )


_FS_FEAT_CTES = """n AS (
      SELECT doc_id, lang, source, n_chars,
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
      FROM documents
    ),
    rk AS (
      SELECT doc_id, substring(t, 1, 12) AS k,
             row_number() OVER (ORDER BY substring(t, 1, 12), doc_id) AS rn
      FROM n
    ),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM rk a JOIN rk b ON b.rn - a.rn >= 1 AND b.rn - a.rn <= 3
    ),
    toks AS (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id, unnest(string_split(t, ' ')) AS tok FROM n
      ) WHERE length(tok) > 0
    ),
    sizes AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS nt FROM toks GROUP BY doc_id
    ),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS ni
      FROM cand c
      JOIN toks x ON x.doc_id = c.doc_a
      JOIN toks y ON y.doc_id = c.doc_b AND y.tok = x.tok
      GROUP BY 1, 2
    ),
    feat AS (
      SELECT c.doc_a, c.doc_b,
             na.lang = nb.lang AS same_lang,
             na.source = nb.source AS same_source,
             abs(na.n_chars - nb.n_chars) <= 20 AS len_close,
             coalesce(
               floor(CAST(coalesce(i.ni, 0) AS DOUBLE) * 1000000
                     / (sa.nt + sb.nt - coalesce(i.ni, 0)) + 0.5) / 1000000
               >= 0.5, FALSE) AS jac50
      FROM cand c
      JOIN n na ON na.doc_id = c.doc_a
      JOIN n nb ON nb.doc_id = c.doc_b
      JOIN sizes sa ON sa.doc_id = c.doc_a
      JOIN sizes sb ON sb.doc_id = c.doc_b
      LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
    )"""


def _fs_sql() -> str:
    """DuckDB mirror of q_fs_match_decisions: the snm_blocking_pairs
    candidate construction, the same agreement predicates, and the
    IDENTICAL pinned literal weights (computed once in Python — no
    cross-engine ln at all)."""
    import math

    cases = []
    for col, m, u in FS_FIELDS:
        aw = math.floor(math.log(m / u) * 1e9 + 0.5) / 1e9
        dw = math.floor(math.log((1 - m) / (1 - u)) * 1e9 + 0.5) / 1e9
        cases.append(
            f"CASE WHEN {col} THEN CAST({aw!r} AS DOUBLE)"
            f" ELSE CAST({dw!r} AS DOUBLE) END"
        )
    plus = "\n                     + ".join(cases)
    return f"""WITH {_FS_FEAT_CTES},
    scored AS (
      SELECT *,
             CAST(floor(({plus}) * 1e9 + 0.5) AS DOUBLE) / 1e9 AS score
      FROM feat
    )
    SELECT doc_a, doc_b, same_lang, same_source, len_close, jac50, score,
           CASE WHEN score >= 4.0 THEN 'match'
                WHEN score < 0.0 THEN 'non_match'
                ELSE 'possible' END AS decision
    FROM scored"""


def _fs_em_sql(n_iter: int = 3) -> str:
    """DuckDB mirror of q_fs_em_fit: same feat CTEs, pattern counts,
    and n_iter unrolled EM rounds with the identical integer-scaled
    posterior arithmetic (w9 int64, integer M-step sums, one pinned
    division per new parameter)."""
    fields = ["same_lang", "same_source", "len_close", "jac50"]
    f = len(fields)

    def prod(params: str) -> str:
        e = "CAST(1.0 AS DOUBLE)"
        for j, col in enumerate(fields):
            e = (
                f"({e} * CASE WHEN {col} THEN {params}{j}"
                f" ELSE 1.0 - {params}{j} END)"
            )
        return e

    par0_cols = ", ".join(
        ["CAST(0.2 AS DOUBLE) AS p"]
        + [f"CAST(0.8 AS DOUBLE) AS m{j}" for j in range(f)]
        + [f"CAST(0.2 AS DOUBLE) AS u{j}" for j in range(f)]
    )
    sql = f"""WITH {_FS_FEAT_CTES},
    pat AS (
      SELECT same_lang, same_source, len_close, jac50,
             CAST(count(*) AS BIGINT) AS n
      FROM feat GROUP BY 1, 2, 3, 4
    ),
    ntot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM pat),
    par0 AS (SELECT {par0_cols})"""
    for k in range(1, n_iter + 1):
        sums = [
            "sum(n * w9) AS s_w",
            "sum(n * (1000000000 - w9)) AS s_nw",
        ]
        for j, col in enumerate(fields):
            g = f"(CASE WHEN {col} THEN 1 ELSE 0 END)"
            sums.append(f"sum(n * w9 * {g}) AS s_w_g{j}")
            sums.append(f"sum(n * (1000000000 - w9) * {g}) AS s_nw_g{j}")
        news = [
            "floor(CAST(s_w AS DOUBLE) / (CAST(nn AS DOUBLE) * 1e9)"
            " * 1e9 + 0.5) / 1e9 AS p"
        ]
        for j in range(f):
            news.append(
                f"floor(CAST(s_w_g{j} AS DOUBLE) / CAST(s_w AS DOUBLE)"
                f" * 1e9 + 0.5) / 1e9 AS m{j}"
            )
        for j in range(f):
            news.append(
                f"floor(CAST(s_nw_g{j} AS DOUBLE) / CAST(s_nw AS DOUBLE)"
                f" * 1e9 + 0.5) / 1e9 AS u{j}"
            )
        sql += f""",
    sc{k} AS (
      SELECT pat.*,
             CAST(floor((p * {prod('m')})
                  / (p * {prod('m')} + (1.0 - p) * {prod('u')})
                  * 1e9 + 0.5) AS BIGINT) AS w9
      FROM pat CROSS JOIN par{k - 1}
    ),
    su{k} AS (SELECT {', '.join(sums)} FROM sc{k}),
    par{k} AS (SELECT {', '.join(news)} FROM su{k} CROSS JOIN ntot)"""
    outs = " UNION ALL ".join(
        f"SELECT '{col}' AS field, m{j} AS m, u{j} AS u, p FROM par{n_iter}"
        for j, col in enumerate(fields)
    )
    return sql + "\n    " + outs


def _cusum_sql() -> str:
    """DuckDB mirror of q_cusum_regime_shifts: same planted regimes,
    pinned decimal prefix sums, running extremum clamped with the
    empty-prefix zero."""
    return """WITH x AS (
      SELECT event_type AS g, event_id AS o,
             least(value, CAST(150.0 AS DOUBLE))
             + CASE WHEN event_id % 4000 >= 2000 THEN CAST(40.0 AS DOUBLE)
                    ELSE CAST(0.0 AS DOUBLE) END AS x
      FROM events
    ),
    terms AS (
      SELECT g, o, x,
             CAST(CAST(floor((x - 70.0 - 20.0) * 1e9 + 0.5) AS DOUBLE) / 1e9
                  AS DECIMAL(28, 9)) AS up,
             CAST(CAST(floor((x - 70.0 + 20.0) * 1e9 + 0.5) AS DOUBLE) / 1e9
                  AS DECIMAL(28, 9)) AS dn
      FROM x
    ),
    pre AS (
      SELECT g, o, x,
             CAST(sum(up) OVER w AS DOUBLE) AS cu,
             CAST(sum(dn) OVER w AS DOUBLE) AS cd
      FROM terms
      WINDOW w AS (PARTITION BY g ORDER BY o ROWS UNBOUNDED PRECEDING)
    ),
    ext AS (
      SELECT g, o, x, cu, cd,
             least(CAST(0.0 AS DOUBLE), min(cu) OVER w) AS mu,
             greatest(CAST(0.0 AS DOUBLE), max(cd) OVER w) AS md
      FROM pre
      WINDOW w AS (PARTITION BY g ORDER BY o ROWS UNBOUNDED PRECEDING)
    ),
    s AS (
      SELECT g, o, x,
             greatest(CAST(0.0 AS DOUBLE), cu - mu) AS s_pos,
             greatest(CAST(0.0 AS DOUBLE), md - cd) AS s_neg
      FROM ext
    )
    SELECT g AS event_type, o AS event_id,
           CAST(floor(x * 1e6 + 0.5) AS DOUBLE) / 1e6 AS x6,
           CAST(floor(s_pos * 1e6 + 0.5) AS DOUBLE) / 1e6 AS s_pos6,
           CAST(floor(s_neg * 1e6 + 0.5) AS DOUBLE) / 1e6 AS s_neg6
    FROM s WHERE s_pos > 800.0 OR s_neg > 800.0"""


def _mad_sql() -> str:
    """DuckDB mirror of q_latency_mad_outliers: same planted spikes,
    lower-median order statistics, modified-z arithmetic."""
    return """WITH lat AS (
      SELECT event_type AS g, event_id AS i,
             value + CASE WHEN event_id % 997 = 0 THEN CAST(500.0 AS DOUBLE)
                          ELSE CAST(0.0 AS DOUBLE) END AS x
      FROM events
    ),
    rk AS (
      SELECT g, i, x,
             row_number() OVER (PARTITION BY g ORDER BY x, i) AS rn,
             count(*) OVER (PARTITION BY g) AS n
      FROM lat
    ),
    med AS (SELECT g, x AS med FROM rk WHERE rn = (n + 1) // 2),
    dev AS (
      SELECT lat.g, lat.i, lat.x, med.med, abs(lat.x - med.med) AS d
      FROM lat JOIN med USING (g)
    ),
    rk2 AS (
      SELECT g, d,
             row_number() OVER (PARTITION BY g ORDER BY d, i) AS rn,
             count(*) OVER (PARTITION BY g) AS n
      FROM dev
    ),
    mad AS (SELECT g, d AS mad FROM rk2 WHERE rn = (n + 1) // 2),
    z AS (
      SELECT dev.g, dev.i, dev.x,
             CASE WHEN mad.mad > 0
                  THEN CAST(0.6745 AS DOUBLE) * (dev.x - dev.med) / mad.mad
                  ELSE CAST(0.0 AS DOUBLE) END AS zv
      FROM dev JOIN mad USING (g)
    )
    SELECT g AS event_type, i AS event_id,
           CAST(floor(x * 1e6 + 0.5) AS DOUBLE) / 1e6 AS lat6,
           CAST(floor(zv * 1e6 + 0.5) AS DOUBLE) / 1e6 AS z6
    FROM z WHERE abs(zv) > 3.5"""


def _theil_sen_sql() -> str:
    """DuckDB mirror of q_host_latency_trend: identical md5 sample,
    pinned pairwise slopes, lower-median order statistic."""
    return """WITH samp AS (
      SELECT event_type AS g,
             (epoch_us(ts) - 1704067200000000) / CAST(3.6e9 AS DOUBLE) AS xh,
             value AS y
      FROM events
      WHERE CAST('0x' || substring(md5('ts:' || CAST(event_id AS VARCHAR)),
                 1, 15) AS BIGINT) % 1000 < 10
    ),
    pairs AS (
      SELECT a.g, a.xh AS xa, a.y AS ya, b.xh AS xb, b.y AS yb,
             CAST(floor((b.y - a.y) / (b.xh - a.xh) * 1e9 + 0.5) AS DOUBLE)
               / 1e9 AS s
      FROM samp a JOIN samp b ON a.g = b.g AND a.xh < b.xh
    ),
    rk AS (
      SELECT g, s,
             row_number() OVER (PARTITION BY g
                                ORDER BY s, xa, xb, ya, yb) AS rn,
             count(*) OVER (PARTITION BY g) AS n
      FROM pairs
    ),
    med AS (SELECT g, s AS slope, n AS n_pairs FROM rk WHERE rn = (n + 1) // 2),
    npts AS (SELECT g, count(*) AS n_points FROM samp GROUP BY g)
    SELECT npts.g AS event_type,
           CAST(npts.n_points AS BIGINT) AS n_points,
           CAST(coalesce(med.n_pairs, 0) AS BIGINT) AS n_pairs,
           CAST(floor(coalesce(med.slope, 0.0) * 1e6 + 0.5) AS DOUBLE) / 1e6
             AS slope6
    FROM npts LEFT JOIN med USING (g)"""


def _anchor_sql(k: int = 3) -> str:
    """DuckDB mirror of q_anchor_text_index: identical synthetic graph,
    authority dimension, 1e-9-pinned decimal-summed scores, top-k."""
    dig = (
        "(instr('0123456789abcdef', substring(md5('anch:' || "
        "CAST(doc_id AS VARCHAR)), 1, 1)) - 1)"
    )
    return f"""WITH e AS (
      SELECT 'h' || CAST(doc_id % 20 AS VARCHAR) AS src,
             'h' || CAST((doc_id * 7 + 3) % 20 AS VARCHAR) AS dst,
             'kw' || CAST({dig} % 8 AS VARCHAR) AS term
      FROM documents
    ),
    ef AS (SELECT * FROM e WHERE src <> dst),
    auth AS (
      SELECT 'h' || CAST(i AS VARCHAR) AS src,
             CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
               + CAST(i % 7 AS DOUBLE)) AS auth
      FROM range(0, 20) t(i)
    ),
    agg AS (
      SELECT ef.dst, ef.term,
             count(*) AS n_links,
             count(DISTINCT ef.src) AS n_src,
             CAST(sum(CAST(CAST(floor(coalesce(a.auth, 0.0) * 1e9 + 0.5)
                                AS DOUBLE) / 1e9
                           AS DECIMAL(28, 9))) AS DOUBLE) AS score
      FROM ef LEFT JOIN auth a ON a.src = ef.src
      GROUP BY ef.dst, ef.term
    ),
    rk AS (
      SELECT dst, term, n_links, n_src, score,
             row_number() OVER (PARTITION BY dst
                                ORDER BY score DESC, term) AS rnk
      FROM agg
    )
    SELECT dst, term, CAST(n_links AS BIGINT) AS n_links,
           CAST(n_src AS BIGINT) AS n_src, score,
           CAST(rnk AS BIGINT) AS rnk
    FROM rk WHERE rnk <= {k}"""


def _join_order_sql() -> str:
    """DuckDB mirror of q_join_order_costs: same exact scalars, same
    double multiply-then-divide order, same ranking tie-break."""
    return """WITH c AS (
      SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    o AS (SELECT o_custkey AS custkey, o_orderkey AS orderkey FROM orders),
    l AS (SELECT l_orderkey AS orderkey FROM lineitem WHERE l_quantity < 5),
    s AS (
      SELECT (SELECT count(*) FROM c) AS n_a,
             (SELECT count(*) FROM o) AS n_b,
             (SELECT count(*) FROM l) AS n_c,
             (SELECT count(DISTINCT custkey) FROM c) AS ndv_a_ka,
             (SELECT count(DISTINCT custkey) FROM o) AS ndv_b_ka,
             (SELECT count(DISTINCT orderkey) FROM o) AS ndv_b_kb,
             (SELECT count(DISTINCT orderkey) FROM l) AS ndv_c_kb
    ),
    est AS (
      SELECT CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
               / CAST(greatest(ndv_a_ka, ndv_b_ka, 1) AS DOUBLE) AS est_ab,
             CAST(n_b AS DOUBLE) * CAST(n_c AS DOUBLE)
               / CAST(greatest(ndv_b_kb, ndv_c_kb, 1) AS DOUBLE) AS est_bc,
             n_a, n_c, ndv_a_ka, ndv_b_ka, ndv_b_kb, ndv_c_kb
      FROM s
    ),
    plans AS (
      SELECT '(C*O)*L' AS plan, est_ab AS est_inter,
             est_ab + est_ab * CAST(n_c AS DOUBLE)
               / CAST(greatest(ndv_b_kb, ndv_c_kb, 1) AS DOUBLE) AS est_cost
      FROM est
      UNION ALL
      SELECT '(O*L)*C', est_bc,
             est_bc + est_bc * CAST(n_a AS DOUBLE)
               / CAST(greatest(ndv_a_ka, ndv_b_ka, 1) AS DOUBLE)
      FROM est
    ),
    act AS (
      SELECT '(C*O)*L' AS plan,
             (SELECT count(*) FROM c JOIN o USING (custkey)) AS actual_inter
      UNION ALL
      SELECT '(O*L)*C',
             (SELECT count(*) FROM o JOIN l USING (orderkey))
    )
    SELECT p.plan,
           CAST(floor(p.est_inter * 1e6 + 0.5) AS DOUBLE) / 1e6 AS est_inter6,
           CAST(floor(p.est_cost * 1e6 + 0.5) AS DOUBLE) / 1e6 AS est_cost6,
           row_number() OVER (ORDER BY p.est_cost, p.plan) AS rank,
           CAST(a.actual_inter AS BIGINT) AS actual_inter
    FROM plans p JOIN act a ON a.plan = p.plan"""


def _edh_sql(which: str, nb: int = 16, permille: int = 100) -> str:
    """DuckDB mirrors of the equi-depth histogram queries: identical
    md5-Bernoulli sample, ntile fences, interpolation arithmetic and
    decimal-summed terms."""

    def p6(e: str) -> str:
        return f"CAST(floor(({e}) * 1e6 + 0.5) AS DOUBLE) / 1e6"

    prefix = f"""WITH s AS (
      SELECT o_totalprice AS v, o_orderkey AS k FROM orders
      WHERE CAST('0x' || substring(md5('edh:' || CAST(o_orderkey AS VARCHAR)),
                 1, 15) AS BIGINT) % 1000 < {permille}
    ),
    nt AS (
      SELECT v, ntile({nb}) OVER (ORDER BY v, k) AS bucket FROM s
    ),
    bb AS (
      SELECT bucket, min(v) AS lo, max(v) AS hi, count(*) AS n_rows
      FROM nt GROUP BY bucket
    ),
    hist AS (
      SELECT bucket, lo, hi, n_rows,
             CAST(n_rows AS DOUBLE) / (SELECT CAST(sum(n_rows) AS DOUBLE) FROM bb)
               AS est_frac
      FROM bb
    )"""
    if which == "hist":
        return f"""{prefix}
    SELECT bucket, {p6('lo')} AS lo6, {p6('hi')} AS hi6,
           CAST(n_rows AS BIGINT) AS n_rows,
           {p6('est_frac')} AS est_frac6
    FROM hist"""
    return f"""{prefix},
    preds AS (
      SELECT * FROM (VALUES
        (1, CAST(0.0 AS DOUBLE), CAST(50000.0 AS DOUBLE)),
        (2, CAST(50000.0 AS DOUBLE), CAST(150000.0 AS DOUBLE)),
        (3, CAST(150000.0 AS DOUBLE), CAST(300000.0 AS DOUBLE)),
        (4, CAST(300000.0 AS DOUBLE), CAST(600000.0 AS DOUBLE)),
        (5, CAST(100000.0 AS DOUBLE), CAST(110000.0 AS DOUBLE))
      ) AS t(pred_id, p_lo, p_hi)
    ),
    terms AS (
      SELECT pred_id, p_lo, p_hi,
             CAST(CAST(floor(est_frac * least(CAST(1.0 AS DOUBLE),
                    CASE WHEN hi > lo
                         THEN greatest(CAST(0.0 AS DOUBLE),
                              (least(p_hi, hi) - greatest(p_lo, lo))
                              / (hi - lo))
                         ELSE CAST(lo >= p_lo AND lo <= p_hi AS DOUBLE)
                    END) * 1e9 + 0.5) AS DOUBLE) / 1e9
                  AS DECIMAL(28, 9)) AS term
      FROM preds, hist
    ),
    est AS (
      SELECT pred_id, p_lo, p_hi,
             CAST(sum(term) AS DOUBLE) AS est_sel
      FROM terms GROUP BY pred_id, p_lo, p_hi
    ),
    act AS (
      SELECT p.pred_id,
             CAST(count(*) AS DOUBLE)
               / (SELECT CAST(count(*) AS DOUBLE) FROM orders) AS actual_sel
      FROM preds p JOIN orders o
        ON o.o_totalprice >= p.p_lo AND o.o_totalprice <= p.p_hi
      GROUP BY p.pred_id
    )
    SELECT e.pred_id, e.p_lo, e.p_hi,
           {p6('e.est_sel')} AS est_sel6,
           {p6('coalesce(a.actual_sel, 0.0)')} AS actual_sel6,
           {p6('abs(e.est_sel - coalesce(a.actual_sel, 0.0))')} AS abs_err6
    FROM est e LEFT JOIN act a ON a.pred_id = e.pred_id"""


def _kmv_sql(which: str, k: int = 64) -> str:
    """DuckDB mirrors of the KMV queries. The engine's salted two-phase
    k-smallest reduces to a single per-group row_number here (phase 1
    keeps a strict superset of the global k smallest, so the outputs
    are identical); hash/u/estimator arithmetic is mirrored term by
    term. p6 = the floor(x*1e6+0.5)/1e6 pin."""

    def p6(e: str) -> str:
        return f"CAST(floor(({e}) * 1e6 + 0.5) AS DOUBLE) / 1e6"

    km1 = f"CAST({k - 1} AS DOUBLE)"
    prefix = f"""WITH toks AS (
      SELECT doc_id, tok FROM (
        SELECT doc_id,
               unnest(string_split(regexp_replace(lower(trim(text)),
                      '\\s+', ' ', 'g'), ' ')) AS tok
        FROM documents
      ) WHERE length(tok) > 0
    ),
    st AS (
      SELECT DISTINCT d.source, t.tok
      FROM toks t JOIN documents d USING (doc_id)
    ),
    hs AS (
      SELECT DISTINCT source,
             CAST('0x' || substring(md5('kmv:' || tok), 1, 15) AS BIGINT) AS h
      FROM st
    ),
    rk AS (
      SELECT source, h,
             row_number() OVER (PARTITION BY source ORDER BY h) AS rnk
      FROM hs
    ),
    sk AS (
      SELECT source, rnk, h,
             CAST(h AS DOUBLE) / CAST(1152921504606846976 AS DOUBLE) AS u
      FROM rk WHERE rnk <= {k}
    )"""
    if which == "vocab":
        return f"""{prefix},
    est AS (
      SELECT source, count(*) AS n_kept, max(u) AS theta,
             CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
                  ELSE {km1} / max(u) END AS est_distinct
      FROM sk GROUP BY source
    ),
    ex AS (
      SELECT source, count(DISTINCT tok) AS exact_distinct
      FROM st GROUP BY source
    )
    SELECT source, n_kept, {p6('theta')} AS theta6,
           {p6('est_distinct')} AS est6, exact_distinct,
           {p6('abs(est_distinct - exact_distinct) / exact_distinct')}
             AS rel_err6
    FROM est JOIN ex USING (source)"""
    return f"""{prefix},
    stats AS (
      SELECT source, count(*) AS cnt, max(u) AS mx,
             CASE WHEN count(*) < {k} THEN CAST(1.0 AS DOUBLE)
                  ELSE max(u) END AS theta
      FROM sk GROUP BY source
    ),
    pairs AS (
      SELECT a.source AS set_a, b.source AS set_b
      FROM stats a, stats b WHERE a.source < b.source
    ),
    merged AS (
      SELECT DISTINCT set_a, set_b, h, u FROM (
        SELECT p.set_a, p.set_b, s.h, s.u
        FROM pairs p JOIN sk s ON s.source = p.set_a
        UNION ALL
        SELECT p.set_a, p.set_b, s.h, s.u
        FROM pairs p JOIN sk s ON s.source = p.set_b
      )
    ),
    mr AS (
      SELECT set_a, set_b, h, u,
             row_number() OVER (PARTITION BY set_a, set_b ORDER BY h) AS rnk
      FROM merged
    ),
    ue AS (
      SELECT set_a, set_b,
             CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
                  ELSE {km1} / max(u) END AS est_union
      FROM mr WHERE rnk <= {k} GROUP BY set_a, set_b
    ),
    ie AS (
      SELECT sa.source AS set_a, sb.source AS set_b,
             least(ta.theta, tb.theta) AS theta, count(*) AS icnt
      FROM sk sa
      JOIN sk sb ON sa.h = sb.h AND sa.source < sb.source
      JOIN stats ta ON ta.source = sa.source
      JOIN stats tb ON tb.source = sb.source
      WHERE sa.u < least(ta.theta, tb.theta)
      GROUP BY 1, 2, 3
    ),
    iee AS (SELECT set_a, set_b, icnt / theta AS est_inter FROM ie),
    exi AS (
      SELECT a.source AS set_a, b.source AS set_b, count(*) AS exact_inter
      FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2
    ),
    sizes AS (SELECT source, count(*) AS n FROM st GROUP BY source)
    SELECT p.set_a, p.set_b,
           {p6('ue.est_union')} AS est_union6,
           {p6('coalesce(iee.est_inter, 0.0)')} AS est_inter6,
           {p6('coalesce(iee.est_inter, 0.0) / ue.est_union')} AS est_jacc6,
           CAST(na.n + nb.n - coalesce(exi.exact_inter, 0) AS BIGINT)
             AS exact_union,
           CAST(coalesce(exi.exact_inter, 0) AS BIGINT) AS exact_inter
    FROM pairs p
    JOIN ue USING (set_a, set_b)
    LEFT JOIN iee USING (set_a, set_b)
    LEFT JOIN exi USING (set_a, set_b)
    JOIN sizes na ON na.source = p.set_a
    JOIN sizes nb ON nb.source = p.set_b"""


def q_suffix_repeats(spark, sf_dir):
    """Corpus-wide repeated-substring mining via a DISTRIBUTED SUFFIX
    ARRAY (Lee et al. 2021's exact-substring dedup machinery, built
    from scratch as prefix doubling — operators/suffix.py): every
    12-char substring occurring >= 2 times, with exact occurrence and
    distinct-doc counts, recovered from suffix-order ADJACENT pairs
    only (repeats occupy contiguous runs — never a quadratic pair
    join, never a fixed-window fingerprint index). The oracle is the
    INDEPENDENT brute-force definition (group every 12-gram directly),
    so a hash match proves the whole doubling + LCP pipeline computes
    exactly the ground-truth repeat table."""
    from crawler_spark.operators.suffix import repeated_substrings

    docs = _t(spark, sf_dir, "documents")
    return repeated_substrings(docs, min_len=12, cap=32)


def q_kn_perplexity(spark, sf_dir):
    """Interpolated Kneser-Ney BIGRAM perplexity per document
    (operators/corpus.py kn_bigram_scores) — the stronger form of the
    CCNet filter next to the unigram lm_perplexity: the continuation
    probability N1+(*w)/|types| downweights tokens that are frequent
    only inside one collocation, so templated boilerplate separates
    from fluent text at equal token frequency. Counts are integers,
    P's double operation tree is mirrored exactly, per-token lns pinned
    at 6dp and decimal-summed (order-independent hash)."""
    from crawler_spark.operators.corpus import kn_bigram_scores

    return kn_bigram_scores(_t(spark, sf_dir, "documents"))


def q_hilbert_key(spark, sf_dir):
    """Hilbert-curve clustering key over the pair table's (w, h) — the
    locality upgrade over zorder_key: consecutive keys are always grid
    NEIGHBORS (no Morton seam jumps), so range-partitioned files get
    strictly tighter two-dimensional bounding boxes for min/max
    pruning (functions/zorder.py hvalue; test_hilbert proves the
    continuity property and the tighter-boxes win). One native
    aggregate() fold over bit levels — LUT state machine, linear
    expression size, whole-stage codegen; the oracle unrolls the same
    automaton as a CTE chain."""
    from crawler_spark.functions.zorder import hvalue
    from crawler_spark.operators.pairs import synth_pair_meta

    meta = synth_pair_meta(_t(spark, sf_dir, "documents"))
    return meta.select("image_id", hvalue("w", "h", bits=12).alias("hkey"))


def q_mg_heavy_hitters(spark, sf_dir):
    """Misra-Gries heavy hitters over the corpus token stream
    (operators/sketches.py misra_gries) — the DETERMINISTIC-guarantee
    frequency sketch next to countmin_heavy_hitters' probabilistic
    one: every reported count is a lower bound within n/(k+1) and
    every token above that threshold is guaranteed reported. Rows hash
    into deterministic buckets (row-stable, partitioning-independent),
    each bucket folds O(k) state, summaries merge once (PODS'12 rule).
    No SQL oracle by nature (nested folds — same declared seam as
    dgim_error_window); the exact count is co-computed as witness and
    the guarantee is pytest-pinned (test_misra_gries)."""
    from crawler_spark.operators.sketches import misra_gries

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(
            F.filter(
                F.split(
                    F.regexp_replace(
                        F.lower(F.trim(F.col("text"))), r"\s+", " "
                    ),
                    " ",
                ),
                lambda x: x != "",
            )
        ).alias("pos", "tok"),
    ).select(
        (F.col("doc_id") * F.lit(8192) + F.col("pos")).alias("rid"), "tok"
    )
    mg = misra_gries(toks, "tok", "rid", k=16, n_buckets=16)
    exact = toks.groupBy("tok").agg(F.count("*").alias("exact_cnt"))
    return mg.join(
        exact, mg["item"] == exact["tok"]
    ).select("item", "mg_count", "exact_cnt")


def q_source_max_cover(spark, sf_dir):
    """Greedy maximum-coverage source selection (operators/corpus.py
    greedy_max_cover; Nemhauser et al. '78 (1-1/e) guarantee): pick 6
    of the corpus's sources to maximize coverage of distinct 5-token
    CONTENT WINDOWS (the substring_overlap fingerprint domain — raw
    vocabulary is shared almost completely across same-language feeds,
    so window coverage is what actually differentiates sources) — the
    submodular-optimization member of the curation family (which k
    feeds to license/crawl next). Each greedy round is one
    map-side-combinable count + one argmax + one anti-join delete of
    newly covered windows; the oracle unrolls the identical rounds."""
    from crawler_spark.operators.corpus import greedy_max_cover

    d = _t(spark, sf_dir, "documents")
    wins = (
        d.select(
            "source",
            F.split(
                F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "),
                " ",
            ).alias("ws"),
        )
        .filter(F.size("ws") >= 5)
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 4),"
                    " i -> md5(concat_ws(' ', slice(ws, i, 5))))"
                )
            ).alias("w_md5"),
        )
    )
    return greedy_max_cover(wins, k=6, set_col="source", elem_col="w_md5")


def _max_cover_sql(k: int = 6) -> str:
    """DuckDB mirror of q_source_max_cover: k unrolled greedy rounds
    (count -> deterministic argmax -> anti-join delete), cumulative via
    an ordered window over the k-row pick list."""
    sql = """WITH m0 AS (
      SELECT DISTINCT source AS s,
             md5(array_to_string(ws[i:i+4], ' ')) AS e
      FROM (SELECT source,
                   string_split(
                     regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                     ' ') AS ws
            FROM documents),
           unnest(generate_series(1, len(ws) - 4)) AS t(i)
      WHERE len(ws) >= 5
    )"""
    for t in range(1, k + 1):
        sql += f""",
    g{t} AS (SELECT s, count(*) AS gain FROM m{t - 1} GROUP BY s),
    p{t} AS (SELECT s, gain FROM g{t} ORDER BY gain DESC, s LIMIT 1),
    e{t} AS (SELECT DISTINCT e FROM m{t - 1} JOIN p{t} USING (s)),
    m{t} AS (SELECT m{t - 1}.* FROM m{t - 1} ANTI JOIN e{t} USING (e))"""
    picks = " UNION ALL ".join(
        f"SELECT {t} AS pick_order, s, gain FROM p{t}" for t in range(1, k + 1)
    )
    return (
        sql
        + f""",
    picks AS ({picks})
    SELECT CAST(pick_order AS INTEGER) AS pick_order, s AS set_id,
           CAST(gain AS BIGINT) AS marginal,
           CAST(sum(gain) OVER (ORDER BY pick_order) AS BIGINT) AS cumulative
    FROM picks"""
    )


def q_wl_host_roles(spark, sf_dir):
    """Weisfeiler-Lehman structural roles over the host link graph
    (operators/graph.py wl_colors): after 3 refinement rounds two hosts
    share a color iff their 3-hop neighborhood STRUCTURE is
    indistinguishable — machine-generated link-farm hosts collapse into
    one class while organic hosts spread out; purely topological (no
    content), complementing spam_mass and host_clustering_coeff. All
    string/md5 arithmetic, no floats — the unrolled-CTE oracle is
    bit-exact."""
    from crawler_spark.operators.graph import wl_colors

    d = _t(spark, sf_dir, "documents")
    d6 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 6, 1)) - 1)"
    d7 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 7, 1)) - 1)"
    edges = (
        d.select(
            (F.col("doc_id") % 20).alias("src"),
            F.expr(f"(16 * {d6} + {d7}) % 20").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return wl_colors(edges, n_iter=3).select(
        F.col("node").alias("host_id"), "wl_color", "class_size"
    )


def _wl_sql(n_iter: int = 3) -> str:
    """DuckDB mirror of q_wl_host_roles: identical edge derivation and
    n_iter unrolled WL rounds (string_agg ORDER BY = concat_ws over
    sort_array; md5 rehash — pure string arithmetic, bit-exact)."""
    d6 = _hexdig_sql("cast(doc_id AS varchar)", 6)
    d7 = _hexdig_sql("cast(doc_id AS varchar)", 7)
    sql = f"""WITH edges AS (
      SELECT DISTINCT src, dst FROM (
        SELECT doc_id % 20 AS src, (16 * {d6} + {d7}) % 20 AS dst
        FROM documents
      ) WHERE src != dst
    ),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    c0 AS (SELECT node, '0' AS c FROM nodes)"""
    for k in range(1, n_iter + 1):
        sql += f""",
    i{k} AS (
      SELECT e.dst AS node, string_agg(c.c, ',' ORDER BY c.c) AS in_ms
      FROM edges e JOIN c{k - 1} c ON c.node = e.src GROUP BY e.dst
    ),
    o{k} AS (
      SELECT e.src AS node, string_agg(c.c, ',' ORDER BY c.c) AS out_ms
      FROM edges e JOIN c{k - 1} c ON c.node = e.dst GROUP BY e.src
    ),
    c{k} AS (
      SELECT n.node,
             md5(concat_ws('|', c.c, coalesce(i.in_ms, ''),
                           coalesce(o.out_ms, ''))) AS c
      FROM nodes n
      JOIN c{k - 1} c USING (node)
      LEFT JOIN i{k} i USING (node)
      LEFT JOIN o{k} o USING (node)
    )"""
    return (
        sql
        + f""",
    sizes AS (SELECT c, count(*) AS class_size FROM c{n_iter} GROUP BY c)
    SELECT node AS host_id, c{n_iter}.c AS wl_color,
           CAST(class_size AS BIGINT) AS class_size
    FROM c{n_iter} JOIN sizes USING (c)"""
    )


def q_host_betweenness(spark, sf_dir):
    """Bounded-distance betweenness centrality over the host link
    graph (operators/graph.py betweenness_bounded; Brandes'01
    accumulation, Brandes-Pich'07 distance bound): the bridge-host
    signal — high-betweenness hosts are the cut vertices between crawl
    regions, which farms can't fake by inflating degree. Forward
    multi-source tagged BFS with integer path counts, backward
    dependency accumulation with 1e-9-pinned decimal-summed terms;
    the oracle unrolls both phases level by level."""
    from crawler_spark.operators.graph import betweenness_bounded

    d = _t(spark, sf_dir, "documents")
    d6 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 6, 1)) - 1)"
    d7 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 7, 1)) - 1)"
    edges = (
        d.select(
            (F.col("doc_id") % 20).alias("src"),
            F.expr(f"(16 * {d6} + {d7}) % 20").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return betweenness_bounded(edges, max_depth=3).select(
        F.col("node").alias("host_id"), "betweenness"
    )


def _betweenness_sql(max_depth: int = 3) -> str:
    """DuckDB mirror of q_host_betweenness: forward levels l0..lD with
    NOT EXISTS first-visit gating and integer sigma sums, backward
    d{D}..d0 with the identical pinned term arithmetic."""
    d6 = _hexdig_sql("cast(doc_id AS varchar)", 6)
    d7 = _hexdig_sql("cast(doc_id AS varchar)", 7)
    D = max_depth
    sql = f"""WITH edges AS (
      SELECT DISTINCT src, dst FROM (
        SELECT doc_id % 20 AS src, (16 * {d6} + {d7}) % 20 AS dst
        FROM documents
      ) WHERE src != dst
    ),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    l0 AS (SELECT node AS source, node, CAST(1 AS BIGINT) AS sigma FROM nodes),
    v0 AS (SELECT source, node FROM l0)"""
    for t in range(1, D + 1):
        sql += f""",
    l{t} AS (
      SELECT source, node, CAST(sum(sigma) AS BIGINT) AS sigma FROM (
        SELECT c.source, e.dst AS node, c.sigma
        FROM l{t - 1} c JOIN edges e ON c.node = e.src
      ) x
      WHERE NOT EXISTS (SELECT 1 FROM v{t - 1} v
                        WHERE v.source = x.source AND v.node = x.node)
      GROUP BY source, node
    ),
    v{t} AS (SELECT * FROM v{t - 1}
             UNION ALL SELECT source, node FROM l{t})"""
    sql += f""",
    d{D} AS (SELECT source, node, sigma, CAST(0.0 AS DOUBLE) AS delta
             FROM l{D})"""
    for d in range(D - 1, -1, -1):
        sql += f""",
    c{d} AS (
      SELECT lv.source, lv.node,
             CAST(sum(CAST(floor(CAST(lv.sigma AS DOUBLE)
                                 / CAST(s.sigma AS DOUBLE)
                                 * (1.0 + s.delta) * 1e9 + 0.5) / 1e9
                           AS DECIMAL(29,9))) AS DOUBLE) AS dsum
      FROM l{d} lv
      JOIN edges e ON lv.node = e.src
      JOIN d{d + 1} s ON s.source = lv.source AND s.node = e.dst
      GROUP BY lv.source, lv.node
    ),
    d{d} AS (
      SELECT lv.source, lv.node, lv.sigma,
             coalesce(c.dsum, CAST(0.0 AS DOUBLE)) AS delta
      FROM l{d} lv LEFT JOIN c{d} c USING (source, node)
    )"""
    acc = " UNION ALL ".join(
        f"SELECT source, node, delta FROM d{d} WHERE source != node"
        for d in range(D - 1, -1, -1)
    )
    return (
        sql
        + f""",
    acc AS ({acc}),
    bc AS (
      SELECT node,
             CAST(sum(CAST(delta AS DECIMAL(29,9))) AS DOUBLE) AS b
      FROM acc GROUP BY node
    )
    SELECT n.node AS host_id,
           floor(coalesce(b, CAST(0.0 AS DOUBLE)) * 1e6 + 0.5) / 1e6
             AS betweenness
    FROM nodes n LEFT JOIN bc USING (node)"""
    )


def q_merge_batch_matching(spark, sf_dir):
    """Safe concurrent merge batch over the SNM near-dup candidate
    graph: a deterministic Luby-style MAXIMAL MATCHING
    (operators/graph.py maximal_matching) picks the largest one-pass
    set of merge pairs in which every document participates at most
    once (>= 1/2 the maximum matching) — md5 priorities make every
    round reproducible, so the unrolled-round oracle is exact."""
    from crawler_spark.operators.dedup import snm_candidate_pairs
    from crawler_spark.operators.graph import maximal_matching

    d = _t(spark, sf_dir, "documents")
    norm = d.select(
        "doc_id",
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ").alias("t"),
    )
    keyed = norm.select("doc_id", F.substring("t", 1, 12).alias("k"))
    cand = snm_candidate_pairs(keyed, "k", "doc_id", window=4).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    return maximal_matching(cand, max_rounds=8)


def _matching_sql(max_rounds: int = 8) -> str:
    """DuckDB mirror of q_merge_batch_matching: same SNM candidate
    construction, md5 priorities, unrolled local-minimum rounds."""
    sql = """WITH n AS (
      SELECT doc_id,
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
      FROM documents
    ),
    rk AS (
      SELECT doc_id, substring(t, 1, 12) AS k,
             row_number() OVER (ORDER BY substring(t, 1, 12), doc_id) AS rn
      FROM n
    ),
    al0 AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS a, b.doc_id AS b,
             md5(CAST(a.doc_id AS varchar) || '-'
                 || CAST(b.doc_id AS varchar)) AS prio
      FROM rk a JOIN rk b ON b.rn - a.rn >= 1 AND b.rn - a.rn <= 3
      WHERE a.doc_id != b.doc_id
    )"""
    for r in range(1, max_rounds + 1):
        sql += f""",
    vm{r} AS MATERIALIZED (
      SELECT v, min(prio) AS pmin FROM (
        SELECT a AS v, prio FROM al{r - 1}
        UNION ALL SELECT b, prio FROM al{r - 1}
      ) GROUP BY v
    ),
    sel{r} AS MATERIALIZED (
      SELECT al.a, al.b, {r} AS round
      FROM al{r - 1} al
      JOIN vm{r} va ON va.v = al.a
      JOIN vm{r} vb ON vb.v = al.b
      WHERE al.prio = va.pmin AND al.prio = vb.pmin
    ),
    mt{r} AS MATERIALIZED (SELECT a AS v FROM sel{r}
                           UNION SELECT b FROM sel{r}),
    al{r} AS MATERIALIZED (
      SELECT al.* FROM al{r - 1} al
      WHERE NOT EXISTS (SELECT 1 FROM mt{r} m WHERE m.v = al.a)
        AND NOT EXISTS (SELECT 1 FROM mt{r} m WHERE m.v = al.b)
    )"""
    picks = " UNION ALL ".join(
        f"SELECT a, b, round FROM sel{r}" for r in range(1, max_rounds + 1)
    )
    return (
        sql
        + f"""
    SELECT a AS doc_a, b AS doc_b, CAST(round AS INTEGER) AS round
    FROM ({picks})"""
    )


def q_url_prefix_rollup(spark, sf_dir):
    """URL-space trie rollup (operators/traps.py url_prefix_rollup):
    per (host, path prefix, depth) URL counts + exact-terminations over
    the trap-gate URL family — the budget-profiling aggregation level
    where DUST rules and trap demotions are decided; the calendar-trap
    host shows its one deep spine, the parameter mill its flat fanout.
    Pure native expressions, one combinable shuffle on the trie keys."""
    from crawler_spark.operators.traps import url_prefix_rollup

    d = _t(spark, sf_dir, "documents")
    urls = d.select(
        F.concat(
            F.lit("host-"), (F.col("doc_id") % 20).cast("string"), F.lit(".test")
        ).alias("host"),
        F.concat(
            F.lit("http://host-"),
            (F.col("doc_id") % 20).cast("string"),
            F.lit(".test"),
            F.expr(
                "CASE WHEN doc_id % 20 = 7 THEN "
                "  '/cal/' || repeat('2024/', CAST(doc_id % 6 AS INT) + 1) || 'p' "
                "WHEN doc_id % 20 = 13 THEN '/p/' || CAST(doc_id AS STRING) "
                "ELSE '/' || source || '/' || "
                "  translate(CAST(doc_id % 64 AS STRING), '0123456789', 'abcdefghij') "
                "  || '/item/' || CAST(doc_id AS STRING) END"
            ),
        ).alias("url"),
    )
    return url_prefix_rollup(urls, max_depth=6)


_URL_PREFIX_SQL = """
    WITH u AS (
      SELECT 'host-' || (doc_id % 20) || '.test' AS host,
             CASE WHEN doc_id % 20 = 7 THEN
               '/cal/' || repeat('2024/', CAST(doc_id % 6 AS INT) + 1) || 'p'
             WHEN doc_id % 20 = 13 THEN '/p/' || CAST(doc_id AS VARCHAR)
             ELSE '/' || source || '/' ||
               translate(CAST(doc_id % 64 AS VARCHAR),
                         '0123456789', 'abcdefghij')
               || '/item/' || CAST(doc_id AS VARCHAR) END AS path
      FROM documents
    ),
    segs AS (
      SELECT host,
             list_filter(string_split(path, '/'), x -> len(x) > 0) AS ws
      FROM u
    ),
    pref AS (
      SELECT host, i AS depth,
             '/' || array_to_string(ws[1:i], '/') AS prefix,
             CASE WHEN i = least(len(ws), 6) THEN 1 ELSE 0 END AS is_exact
      FROM segs, unnest(range(1, least(len(ws), 6) + 1)) AS t(i)
      WHERE len(ws) > 0
    )
    SELECT host, prefix, CAST(depth AS INTEGER) AS depth,
           count(*) AS n_urls, CAST(sum(is_exact) AS BIGINT) AS n_exact
    FROM pref GROUP BY host, prefix, depth
"""


def q_linkage_clusters(spark, sf_dir):
    """End-to-end record-linkage clustering: SNM blocking ->
    Fellegi-Sunter scoring -> keep decision='match' pairs -> connected
    components (cc_star) -> (doc_id, cluster_id) entity groups. The
    composite every linkage deployment actually ships (pairwise
    decisions alone don't dedupe a table — transitive matches must
    merge); oracle = the same pinned-weight scoring + a recursive-CTE
    closure, independently re-deriving the star-contraction labels."""
    from crawler_spark.operators.dedup import fs_match_scores
    from crawler_spark.operators.graph import cc_star

    feat = _fs_feat(spark, sf_dir)
    scored = fs_match_scores(feat, FS_FIELDS, upper=4.0, lower=0.0)
    mp = scored.filter(F.col("decision") == "match").select("doc_a", "doc_b")
    return cc_star(mp)


def _linkage_sql() -> str:
    """DuckDB mirror of q_linkage_clusters: _FS_FEAT_CTES + the pinned
    literal FS weights + recursive min-label closure."""
    import math

    cases = []
    for col, m, u in FS_FIELDS:
        aw = math.floor(math.log(m / u) * 1e9 + 0.5) / 1e9
        dw = math.floor(math.log((1 - m) / (1 - u)) * 1e9 + 0.5) / 1e9
        cases.append(
            f"CASE WHEN {col} THEN CAST({aw!r} AS DOUBLE)"
            f" ELSE CAST({dw!r} AS DOUBLE) END"
        )
    plus = " + ".join(cases)
    return f"""WITH RECURSIVE {_FS_FEAT_CTES},
    scored AS (
      SELECT doc_a, doc_b,
             CAST(floor(({plus}) * 1e9 + 0.5) AS DOUBLE) / 1e9 AS score
      FROM feat
    ),
    mp AS (SELECT doc_a, doc_b FROM scored WHERE score >= 4.0),
    e AS (
      SELECT doc_a AS s, doc_b AS t FROM mp
      UNION SELECT doc_b, doc_a FROM mp
    ),
    reach(s, t) AS (
      SELECT s, t FROM e
      UNION
      SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s
    )
    SELECT s AS doc_id, least(s, min(t)) AS cluster_id
    FROM reach GROUP BY s"""


def q_neyman_allocation(spark, sf_dir):
    """Neyman optimal stratified-sample allocation over event types
    (operators/stats.py neyman_allocation): n_h ∝ N_h·S_h, the
    label-budget design that gives high-variance strata proportionally
    more review samples — ht_corpus_totals' design-side companion.
    One combinable pass over the facts (pinned-decimal sums), then
    dimension-only arithmetic with largest-remainder rounding so
    allocations sum EXACTLY to the budget."""
    from crawler_spark.operators.stats import neyman_allocation

    e = _t(spark, sf_dir, "events")
    return neyman_allocation(e, "event_type", "value", total_n=1000)


_NEYMAN_SQL = """
    WITH per AS (
      SELECT event_type AS stratum, count(*) AS n_pop,
             sum(CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5)
                      / 1000000.0 AS DECIMAL(18,6))) AS s1,
             sum(CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5)
                      / 1000000.0 AS DECIMAL(18,6))
                 * CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5)
                        / 1000000.0 AS DECIMAL(18,6))) AS s2
      FROM events GROUP BY event_type
    ),
    sd AS (
      SELECT stratum, n_pop,
             floor(sqrt(
               floor(greatest(
                 CAST(s2 AS DOUBLE) / n_pop
                 - (CAST(s1 AS DOUBLE) / n_pop)
                   * (CAST(s1 AS DOUBLE) / n_pop),
                 CAST(0.0 AS DOUBLE)) * 1e9 + 0.5) / 1e9
             ) * 1e6 + 0.5) / 1e6 AS sd6
      FROM per
    ),
    wtd AS (
      SELECT *, floor(n_pop * sd6 * 1e6 + 0.5) / 1e6 AS w FROM sd
    ),
    tot AS (SELECT sum(CAST(w AS DECIMAL(27,6))) AS wtot FROM wtd),
    shared AS (
      SELECT stratum, n_pop, sd6,
             floor(w / CAST(wtot AS DOUBLE) * 1e6 + 0.5) / 1e6 AS share6
      FROM wtd CROSS JOIN tot
    ),
    base AS (
      SELECT *,
             CAST(floor(share6 * 1000.0) AS BIGINT) AS n_base,
             floor((share6 * 1000.0 - floor(share6 * 1000.0)) * 1e9 + 0.5)
               / 1e9 AS rem
      FROM shared
    ),
    give AS (SELECT 1000 - sum(n_base) AS leftover FROM base),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY rem DESC, stratum) AS rk
      FROM base
    )
    SELECT stratum, n_pop, sd6, share6,
           CAST(n_base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS n_alloc
    FROM ranked CROSS JOIN give
"""


def q_kmeanspar_init(spark, sf_dir):
    """k-means|| seeding (Bahmani VLDB'12; operators/similarity.py
    kmeans_parallel_init) over the embeddings table: md5-deterministic
    D²-oversampling rounds + nearest-candidate weights + weighted
    farthest-point reduction to k=4 — the distributed k-means++ the
    IVF index seeds from instead of hash-grouped means. Every draw and
    tie is engine-exact; the oracle unrolls rounds, weighting, and the
    reduction."""
    from crawler_spark.operators.similarity import kmeans_parallel_init

    e = _t(spark, sf_dir, "embeddings")
    return kmeans_parallel_init(e, k=4, oversample=4, rounds=2).select(
        "cell_id", "cand_id", "weight"
    )


def _kmeanspar_sql(k: int = 4, l: float = 4.0, rounds: int = 2) -> str:
    """DuckDB mirror of q_kmeanspar_init: same seed, per-round
    md5-uniform Bernoulli selection (u*phi < l*d², no division),
    nearest-candidate weights via (d², cand_id) lexicographic argmin,
    weighted farthest-point reduction — all pinned identically."""

    def d2(a: str, b: str) -> str:
        return (
            f"floor((list_dot_product({a}, {a})"
            f" - 2 * list_dot_product({a}, {b})"
            f" + list_dot_product({b}, {b})) * 1e9 + 0.5) / 1e9"
        )

    sql = """WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    s0 AS (SELECT vec_id, v FROM e
           ORDER BY md5(CAST(vec_id AS varchar)), vec_id LIMIT 1),
    cand0 AS (SELECT vec_id AS cand_id, v AS c FROM s0)"""
    for r in range(1, rounds + 1):
        u = (
            "((CAST(concat('0x', substring(md5(CAST(c.vec_id AS varchar)"
            f" || '#{r}'), 1, 4)) AS BIGINT) + 0.5) / 65536.0)"
        )
        sql += f""",
    cost{r} AS (
      SELECT e.vec_id, min({d2('e.v', 'cd.c')}) AS d2
      FROM e, cand{r - 1} cd GROUP BY e.vec_id
    ),
    phi{r} AS (
      SELECT CAST(sum(CAST(d2 AS DECIMAL(38,9))) AS DOUBLE) AS phi
      FROM cost{r}
    ),
    sel{r} AS (
      SELECT c.vec_id FROM cost{r} c CROSS JOIN phi{r}
      WHERE {u} * phi < {l!r} * c.d2
        AND NOT EXISTS (SELECT 1 FROM cand{r - 1} cc
                        WHERE cc.cand_id = c.vec_id)
    ),
    cand{r} AS (
      SELECT * FROM cand{r - 1}
      UNION ALL
      SELECT e.vec_id, e.v FROM sel{r} JOIN e USING (vec_id)
    )"""
    C = f"cand{rounds}"
    sql += f""",
    dist AS (
      SELECT e.vec_id, cd.cand_id, {d2('e.v', 'cd.c')} AS d2
      FROM e, {C} cd
    ),
    best AS (
      SELECT vec_id, cand_id FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY d2, cand_id) AS rn
        FROM dist
      ) WHERE rn = 1
    ),
    wts AS (
      SELECT cd.cand_id, cd.c, coalesce(b.w, 0) AS w
      FROM {C} cd LEFT JOIN (
        SELECT cand_id, count(*) AS w FROM best GROUP BY cand_id
      ) b USING (cand_id)
    ),
    p0 AS (SELECT cand_id, c, w FROM wts ORDER BY w DESC, cand_id LIMIT 1),
    m1 AS (
      SELECT t.cand_id, t.c, t.w, {d2('t.c', 'p.c')} AS mind
      FROM wts t, p0 p WHERE t.cand_id != p.cand_id
    )"""
    for t in range(1, k):
        sql += f""",
    p{t} AS (
      SELECT cand_id, c, w FROM (
        SELECT *, floor(CAST(w AS DOUBLE) * mind * 1e9 + 0.5) / 1e9 AS score
        FROM m{t}
      ) ORDER BY score DESC, cand_id LIMIT 1
    )"""
        if t < k - 1:
            sql += f""",
    m{t + 1} AS (
      SELECT m.cand_id, m.c, m.w, least(m.mind, {d2('m.c', 'p.c')}) AS mind
      FROM m{t} m, p{t} p WHERE m.cand_id != p.cand_id
    )"""
    outs = " UNION ALL ".join(
        f"SELECT {t} AS cell_id, cand_id, CAST(w AS BIGINT) AS weight FROM p{t}"
        for t in range(0, k)
    )
    return sql + "\n    " + outs


def q_densest_profile(spark, sf_dir):
    """Charikar densest-subgraph peeling profile over the host graph
    (operators/graph.py densest_subgraph_peel): each round removes
    every node below 5/2 x average degree; the max-density round is a
    2(1+eps)-approx of the true densest subgraph — the tightest link
    spam core (organic webs are sparse everywhere, farms are built
    dense). Removal test is integer-exact; density floors at 1e-6."""
    from crawler_spark.operators.graph import densest_subgraph_peel

    d = _t(spark, sf_dir, "documents")
    d6 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 6, 1)) - 1)"
    d7 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 7, 1)) - 1)"
    # 64 hosts -> a sparse organic fringe around a denser core, so the
    # peel actually runs several rounds (20 hosts saturate instantly)
    edges = (
        d.select(
            (F.col("doc_id") % 64).alias("src"),
            F.expr(f"(16 * {d6} + {d7}) % 64").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return densest_subgraph_peel(edges, max_rounds=8)


def _densest_sql(max_rounds: int = 8) -> str:
    """DuckDB mirror of q_densest_profile: unrolled peel rounds with
    the identical integer removal test; rows emitted only while the
    graph still changed (the engine's fixpoint break)."""
    d6 = _hexdig_sql("cast(doc_id AS varchar)", 6)
    d7 = _hexdig_sql("cast(doc_id AS varchar)", 7)
    sql = f"""WITH raw AS (
      SELECT DISTINCT src, dst FROM (
        SELECT doc_id % 64 AS src, (16 * {d6} + {d7}) % 64 AS dst
        FROM documents
      ) WHERE src != dst
    ),
    e0 AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw
      ) WHERE src < dst
    )"""
    for r in range(0, max_rounds + 1):
        sql += f""",
    d{r} AS MATERIALIZED (
      SELECT v, count(*) AS deg FROM (
        SELECT src AS v FROM e{r} UNION ALL SELECT dst FROM e{r}
      ) GROUP BY v
    ),
    s{r} AS MATERIALIZED (
      SELECT CAST(count(*) AS BIGINT) AS nv,
             CAST(coalesce(sum(deg), 0) // 2 AS BIGINT) AS ne
      FROM d{r}
    )"""
        if r < max_rounds:
            sql += f""",
    e{r + 1} AS MATERIALIZED (
      SELECT e.src, e.dst FROM e{r} e
      WHERE EXISTS (SELECT 1 FROM d{r} da, s{r} s
                    WHERE da.v = e.src
                      AND da.deg * s.nv * 2 >= 5 * s.ne)
        AND EXISTS (SELECT 1 FROM d{r} db, s{r} s
                    WHERE db.v = e.dst
                      AND db.deg * s.nv * 2 >= 5 * s.ne)
    )"""
    rows = ["SELECT 0 AS round, nv, ne FROM s0 WHERE nv > 0"]
    for r in range(1, max_rounds + 1):
        rows.append(
            f"SELECT {r}, s.nv, s.ne FROM s{r} s, s{r - 1} p"
            f" WHERE s.nv > 0 AND (s.nv != p.nv OR s.ne != p.ne)"
        )
    return (
        sql
        + f""",
    prof AS ({' UNION ALL '.join(rows)}),
    scored AS (
      SELECT round, nv AS n_nodes, ne AS n_edges,
             CAST((ne * 1000000) // nv AS DOUBLE) / 1e6 AS density6
      FROM prof
    )
    SELECT round, n_nodes, n_edges, density6,
           rank() OVER (ORDER BY density6 DESC, round ASC) = 1 AS is_best
    FROM scored"""
    )


def q_front_coding(spark, sf_dir):
    """Front-coding size estimate for the sorted per-host URL index
    (operators/traps.py front_coding_estimate) — the CDX/WebGraph
    incremental encoding: sorted URLs share prefixes, each row stores
    (shared-prefix length, suffix); this reports flat vs front-coded
    bytes and the saving per host BEFORE committing to the layout
    (adjacency_gap_bits' twin for the URL side). Host-partitioned lag
    window + the capped native LCP, one combinable aggregation."""
    from crawler_spark.operators.traps import front_coding_estimate

    d = _t(spark, sf_dir, "documents")
    urls = d.select(
        F.concat(
            F.lit("host-"), (F.col("doc_id") % 20).cast("string"), F.lit(".test")
        ).alias("host"),
        F.concat(
            F.lit("http://host-"),
            (F.col("doc_id") % 20).cast("string"),
            F.lit(".test"),
            F.expr(
                "CASE WHEN doc_id % 20 = 7 THEN "
                "  '/cal/' || repeat('2024/', CAST(doc_id % 6 AS INT) + 1) || 'p' "
                "WHEN doc_id % 20 = 13 THEN '/p/' || CAST(doc_id AS STRING) "
                "ELSE '/' || source || '/' || "
                "  translate(CAST(doc_id % 64 AS STRING), '0123456789', 'abcdefghij') "
                "  || '/item/' || CAST(doc_id AS STRING) END"
            ),
        ).alias("url"),
    )
    return front_coding_estimate(urls, cap=48)


def _front_coding_sql(cap: int = 48) -> str:
    """DuckDB mirror of q_front_coding: same URL family, lag window,
    capped greatest-term LCP clamped to both lengths."""
    terms = ", ".join(
        f"CASE WHEN substring(u, 1, {k}) = substring(prev, 1, {k})"
        f" THEN {k} ELSE 0 END"
        for k in range(1, cap + 1)
    )
    return f"""WITH u AS (
      SELECT 'host-' || (doc_id % 20) || '.test' AS host,
             'http://host-' || (doc_id % 20) || '.test' ||
             CASE WHEN doc_id % 20 = 7 THEN
               '/cal/' || repeat('2024/', CAST(doc_id % 6 AS INT) + 1) || 'p'
             WHEN doc_id % 20 = 13 THEN '/p/' || CAST(doc_id AS VARCHAR)
             ELSE '/' || source || '/' ||
               translate(CAST(doc_id % 64 AS VARCHAR),
                         '0123456789', 'abcdefghij')
               || '/item/' || CAST(doc_id AS VARCHAR) END AS url
      FROM documents
    ),
    lagged AS (
      SELECT host, substring(url, 1, {cap}) AS u, length(url) AS len_full,
             lag(substring(url, 1, {cap})) OVER (
               PARTITION BY host ORDER BY substring(url, 1, {cap})
             ) AS prev
      FROM u
    ),
    costed AS (
      SELECT host, len_full,
             CASE WHEN prev IS NULL THEN 0
                  ELSE least(greatest({terms}), length(u), length(prev))
             END AS lcp
      FROM lagged
    )
    SELECT host, count(*) AS n_urls,
           CAST(sum(len_full) AS BIGINT) AS bytes_flat,
           CAST(sum(len_full - lcp + 2) AS BIGINT) AS bytes_front,
           floor((1.0 - CAST(sum(len_full - lcp + 2) AS DOUBLE)
                        / CAST(sum(len_full) AS DOUBLE)) * 1e6 + 0.5) / 1e6
             AS saved_ratio6
    FROM costed GROUP BY host"""


def q_image_ssim_verify(spark, sf_dir):
    """SSIM verify after phash banding (operators/multimodal.py
    verify_pairs_ssim; Wang et al. TIP'04) — the perceptual metric on
    the case PSNR gets WRONG: variants here are +25-brightness twins
    (harmless re-encode), which score ~20 dB (flunking the 30 dB PSNR
    bar) but SSIM > 0.95; structural noise stays rejected. Same banded
    candidate path as image_phash_neardup. No SQL oracle (binary
    codec); closed forms + the operator are pytest-pinned
    (tests/test_ssim.py)."""
    import numpy as np

    from crawler_spark.functions.codecs import decode, encode
    from crawler_spark.operators.dedup import hamming64_pairs
    from crawler_spark.operators.multimodal import (
        decode_stats,
        verify_pairs_ssim,
    )
    from crawler_spark.sources.synth import T1_SMOKE

    urls = [f"http://host-0.test/p0/d0/img-{i}" for i in range(32)]
    rows = [
        (r["image_id"], r["bytes"], r["fmt"])
        for r in (T1_SMOKE.payload(u) for u in urls)
    ]
    variants = []
    for image_id, data, fmt in rows[:12]:
        px = decode(data, fmt).astype(np.int16)
        px = np.clip(px + 25, 0, 255)  # brightness twin: SSIM-high, PSNR-low
        variants.append(
            (image_id + "-v", encode(px.astype(np.uint8), "png"), "png")
        )
    images = spark.createDataFrame(
        rows + variants, "image_id string, bytes binary, fmt string"
    )
    sigs = decode_stats(images).select("image_id", "phash")
    cand = hamming64_pairs(
        sigs, id_col="image_id", sig_col="phash", max_hamming=7, n_bands=8
    )
    return verify_pairs_ssim(cand, images, min_ssim=0.9)


def q_bloom_reduced_join(spark, sf_dir):
    """Runtime-filter join (operators/skew.py bloom_semi_reduce): a
    bloom over the selective dim side's keys prunes the fact table
    BEFORE its shuffle — the explicit form of engine runtime filters,
    with the URL-seen gate's economics applied to a general equi-join.
    The oracle is the PLAIN join, so the hash match proves the
    reduction loses nothing (no false negatives); the prune factor is
    pytest-pinned (test_skew)."""
    from crawler_spark.operators.skew import bloom_semi_reduce

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    dim = part.filter(F.col("p_size") == 1).select("p_partkey", "p_name")
    reduced = bloom_semi_reduce(li, dim, "l_partkey", small_on="p_partkey")
    return (
        reduced.join(dim, reduced["l_partkey"] == dim["p_partkey"])
        .groupBy("p_partkey", "p_name")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_price"),
        )
    )


def q_ks_drift(spark, sf_dir):
    """Exact two-sample Kolmogorov-Smirnov drift test
    (operators/stats.py ks_two_sample) on the order-value
    distribution: the parity half of the corpus vs the URGENT-priority
    wave — psi_feature_drift's case WITHOUT bin edges (KS is the sup
    CDF distance over the data's own values, so within-bucket shifts
    PSI's fixed bins hide still register). One conditional-count pass,
    one window over the distinct-value dimension, Kolmogorov-series
    p-value with every term pinned."""
    from crawler_spark.operators.stats import ks_two_sample

    o = _t(spark, sf_dir, "orders")
    src = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.lit("base").alias("g"), F.col("o_totalprice").alias("v")
    ).unionByName(
        o.filter(F.col("o_orderpriority") == "1-URGENT").select(
            F.lit("urgent").alias("g"), F.col("o_totalprice").alias("v")
        )
    )
    return ks_two_sample(src, "g", "v", "base", "urgent")


_KS_SQL = """
    WITH src AS (
      SELECT 'base' AS g, o_totalprice AS v FROM orders
      WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT 'urgent', o_totalprice FROM orders
      WHERE o_orderpriority = '1-URGENT'
    ),
    per AS (
      SELECT CAST(v AS DOUBLE) AS val,
             sum(CASE WHEN g = 'base' THEN 1 ELSE 0 END) AS ca,
             sum(CASE WHEN g = 'urgent' THEN 1 ELSE 0 END) AS cb
      FROM src GROUP BY 1
    ),
    tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM per),
    gaps AS (
      SELECT val, na, nb,
             floor(abs(CAST(sum(ca) OVER w AS DOUBLE) / CAST(na AS DOUBLE)
                       - CAST(sum(cb) OVER w AS DOUBLE) / CAST(nb AS DOUBLE))
                   * 1e9 + 0.5) / 1e9 AS gap
      FROM per CROSS JOIN tot
      WINDOW w AS (ORDER BY val ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ),
    top AS (SELECT * FROM gaps ORDER BY gap DESC, val LIMIT 1),
    lamt AS (
      SELECT *, floor(gap * sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                                 / CAST(na + nb AS DOUBLE))
                      * 1e9 + 0.5) / 1e9 AS lam
      FROM top
    ),
    ser AS (
      SELECT *,
             floor(CAST(2.0 AS DOUBLE) * exp(-2.0 * lam * lam)
                   * 1e9 + 0.5) / 1e9
             + floor(CAST(-2.0 AS DOUBLE) * exp(-8.0 * lam * lam)
                     * 1e9 + 0.5) / 1e9
             + floor(CAST(2.0 AS DOUBLE) * exp(-18.0 * lam * lam)
                     * 1e9 + 0.5) / 1e9 AS series
      FROM lamt
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           gap AS ks_d9, val AS at_value,
           floor(greatest(least(series, 1.0), 0.0) * 1e6 + 0.5) / 1e6
             AS p_approx6,
           greatest(least(series, 1.0), 0.0) < 0.05 AS reject_05
    FROM ser
"""


def q_temporal_reachability(spark, sf_dir):
    """Time-respecting earliest-arrival audit (operators/graph.py
    temporal_bfs) over the host graph with per-edge first-observed
    rounds (md5-derived, the page_links analog): a link is traversable
    only from the round it appeared, so journeys with decreasing link
    times — which static BFS happily walks — are correctly blocked.
    The discovery-provenance check: when could each host REALLY have
    been reached from the seeds. Bellman-Ford-shaped synchronous
    relaxations, integer times, min aggs; oracle unrolls the passes."""
    from crawler_spark.operators.graph import temporal_bfs

    d = _t(spark, sf_dir, "documents")
    d6 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 6, 1)) - 1)"
    d7 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 7, 1)) - 1)"
    d8 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 8, 1)) - 1)"
    edges = (
        d.select(
            (F.col("doc_id") % 20).alias("src"),
            F.expr(f"(16 * {d6} + {d7}) % 20").alias("dst"),
            F.expr(f"{d8} % 4").cast("long").alias("t"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("t").alias("t"))
    )
    seeds = spark.createDataFrame([(0,), (1,)], "node long")
    return temporal_bfs(edges, seeds, rounds=4)


def _temporal_sql(rounds: int = 4) -> str:
    """DuckDB mirror of q_temporal_reachability: same timed edges and
    unrolled synchronous relaxation passes."""
    d6 = _hexdig_sql("cast(doc_id AS varchar)", 6)
    d7 = _hexdig_sql("cast(doc_id AS varchar)", 7)
    d8 = _hexdig_sql("cast(doc_id AS varchar)", 8)
    sql = f"""WITH edges AS MATERIALIZED (
      SELECT src, dst, CAST(min(t) AS BIGINT) AS t FROM (
        SELECT doc_id % 20 AS src, (16 * {d6} + {d7}) % 20 AS dst,
               {d8} % 4 AS t
        FROM documents
      ) WHERE src != dst GROUP BY src, dst
    ),
    nodes AS (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
      UNION SELECT unnest([0, 1])
    ),
    a0 AS MATERIALIZED (
      SELECT node,
             CASE WHEN node IN (0, 1) THEN CAST(0 AS BIGINT) END AS arrival
      FROM nodes
    )"""
    for k in range(1, rounds + 1):
        sql += f""",
    c{k} AS MATERIALIZED (
      SELECT e.dst AS node, min(e.t) AS cand
      FROM edges e JOIN a{k - 1} u
        ON u.node = e.src AND u.arrival IS NOT NULL AND e.t >= u.arrival
      GROUP BY e.dst
    ),
    a{k} AS MATERIALIZED (
      SELECT a.node,
             least(coalesce(a.arrival, c.cand),
                   coalesce(c.cand, a.arrival)) AS arrival
      FROM a{k - 1} a LEFT JOIN c{k} c USING (node)
    )"""
    return sql + f"""
    SELECT node, arrival FROM a{rounds}"""


def q_cws_jaccard_est(spark, sf_dir):
    """Consistent weighted sampling (ICWS, Ioffe ICML'10;
    operators/dedup.py cws_signatures) — the weighted-Jaccard SKETCH
    next to the exact weighted_jaccard_pairs join: k=16 slots whose
    (feature, t) samples collide with probability exactly J_w, so the
    candidate join is weight-honest LSH (a 50x-repeated token can't
    fake set similarity). All md5-derived uniforms and 1e-9-pinned
    transcendentals — the oracle reproduces every sample."""
    from crawler_spark.operators.dedup import cws_pair_estimate, cws_signatures

    # deterministic 1-in-10 doc subset: this corpus is dup-saturated
    # (~65% of ALL pairs clear J_w 0.25), so the candidate set is
    # inherently near-quadratic at full sf0.1 — the subset keeps the
    # battery honest about the operator, not the corpus's dup rate
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    # the pair join reads sigs TWICE (both sides) — freeze the
    # transcendental-heavy signature stage once
    sigs = cws_signatures(d, k=16).localCheckpoint(eager=True)
    # min_match=4 (est >= 0.25): the report floor for meaningfully
    # similar pairs — this corpus is template-heavy, so low floors
    # degenerate toward all-pairs (see the operator docstring)
    return cws_pair_estimate(sigs, k=16, min_match=4)


def _cws_sql(k: int = 16) -> str:
    """DuckDB mirror of q_cws_jaccard_est: identical uniforms (md5 hex
    quads), Gamma(2,1) via -(ln u + ln u'), pinned t/y/a chain, argmin
    by (a, feature), pair join on (slot, feature, t)."""

    def u(i: int) -> str:
        return (
            "((CAST(concat('0x', substring(md5('cws' || slot || ':' || tok),"
            f" {4 * i - 3}, 4)) AS BIGINT) + 0.5) / 65536.0)"
        )

    def pin9(e: str) -> str:
        return f"floor(({e}) * 1e9 + 0.5) / 1e9"

    r = pin9(f"-(ln({u(1)}) + ln({u(2)}))")
    c = pin9(f"-(ln({u(3)}) + ln({u(4)}))")
    beta = u(5)
    lnw = pin9("ln(CAST(w AS DOUBLE))")
    return f"""WITH toks AS (
      SELECT doc_id, tok, count(*) AS w FROM (
        SELECT doc_id,
               unnest(list_filter(
                 string_split(
                   regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
                 x -> len(x) > 0)) AS tok
        FROM documents WHERE doc_id % 10 = 0
      ) GROUP BY doc_id, tok
    ),
    fan AS (
      SELECT doc_id, tok, w, s.slot
      FROM toks, (SELECT unnest(range(0, {k})) AS slot) s
    ),
    vals AS (
      SELECT doc_id, slot, tok,
             {r} AS r, {c} AS c, {beta} AS beta, {lnw} AS lnw
      FROM fan
    ),
    scored AS (
      SELECT doc_id, slot, tok,
             floor(lnw / r + beta) AS t,
             floor(c / ((floor(exp(r * (floor(lnw / r + beta) - beta))
                               * 1e9 + 0.5) / 1e9)
                        * (floor(exp(r) * 1e9 + 0.5) / 1e9))
                   * 1e9 + 0.5) / 1e9 AS a
      FROM vals
    ),
    sig AS (
      SELECT doc_id, slot, tok AS feature, CAST(t AS BIGINT) AS t FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id, slot
                                     ORDER BY a, tok) AS rn
        FROM scored
      ) WHERE rn = 1
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           count(*) AS n_match,
           floor(CAST(count(*) AS DOUBLE) / {float(k)!r} * 1e6 + 0.5) / 1e6
             AS est_jw6
    FROM sig a
    JOIN sig b ON a.slot = b.slot AND a.feature = b.feature AND a.t = b.t
              AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= 4"""


def q_mg_exact_heavy(spark, sf_dir):
    """Two-pass EXACT heavy hitters at bounded memory (Misra-Gries
    candidates + exact recount — the classic composition): pass 1's MG
    summary (O(k) state per task, operators/sketches.py) GUARANTEES
    every token with true frequency > n/(k+1) is among its candidates;
    pass 2 exact-counts the candidates only (a semi-join, never a full
    group-by at 10^10 scale... the candidate set is <= k items) and
    keeps those above the threshold. The output is provably the true
    heavy set REGARDLESS of fold order — which is why this composite
    has a FULL SQL oracle (the direct group-by + HAVING) while the raw
    MG summary is rows-only. Threshold compare in integers
    (cnt * (k+1) > n_total). k=64 puts the 1/65 threshold under this
    corpus's ~3.5% top-token share so the heavy set is non-empty."""
    from crawler_spark.operators.sketches import misra_gries

    k = 64
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(
            F.filter(
                F.split(
                    F.regexp_replace(
                        F.lower(F.trim(F.col("text"))), r"\s+", " "
                    ),
                    " ",
                ),
                lambda x: x != "",
            )
        ).alias("pos", "tok"),
    ).select(
        (F.col("doc_id") * F.lit(8192) + F.col("pos")).alias("rid"), "tok"
    )
    cand = misra_gries(toks, "tok", "rid", k=k, n_buckets=16).select(
        F.col("item").alias("tok")
    )
    n_total = toks.agg(F.count("*").alias("n_total"))
    exact = (
        toks.join(F.broadcast(cand), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count("*").alias("exact_cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(n_total))
        .filter(F.col("exact_cnt") * F.lit(k + 1) > F.col("n_total"))
        .select("tok", "exact_cnt")
    )


_MG_EXACT_SQL = """
    WITH t AS (
      SELECT tok FROM (
        SELECT unnest(list_filter(
          string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                       ' '),
          x -> len(x) > 0)) AS tok
        FROM documents
      )
    ),
    n AS (SELECT count(*) AS n_total FROM t)
    SELECT tok, count(*) AS exact_cnt
    FROM t CROSS JOIN n
    GROUP BY tok, n_total
    HAVING count(*) * 65 > n_total
"""


def q_image_ela_forensics(spark, sf_dir):
    """Error-level analysis forensics (operators/multimodal.py
    ela_scores): re-compress once with the lossy codec and measure
    WHERE the pixels change — a spliced patch with a different
    compression history concentrates the error in its quadrant
    (quad_ratio ~4) while settled images re-lose nothing. Every 4th
    image gets a planted never-compressed patch; the report flags
    exactly those. No SQL oracle (binary codec); statistic and planted
    case pytest-pinned (tests/test_ela.py)."""
    import numpy as np

    from crawler_spark.functions.codecs import decode, encode
    from crawler_spark.operators.multimodal import ela_scores
    from crawler_spark.sources.synth import T1_SMOKE

    urls = [f"http://host-0.test/p0/d0/img-{i}" for i in range(32)]
    rows = []
    for i, u in enumerate(urls):
        r = T1_SMOKE.payload(u)
        px = decode(r["bytes"], r["fmt"])
        # settle one lossy generation so the clean baseline is exact-0
        settled = decode(encode(px, "qdct"), "qdct")
        if i % 4 == 0:
            h, w = settled.shape
            patch = np.random.RandomState(i).randint(
                0, 256, (max(h // 2, 1), max(w // 2, 1))
            ).astype(np.uint8)
            settled = settled.copy()
            settled[: patch.shape[0], : patch.shape[1]] = patch
        rows.append((r["image_id"], encode(settled, "png"), "png"))
    images = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string"
    )
    return ela_scores(images, ratio_above=2.0)


def q_span_removal(spark, sf_dir):
    """C4-style span-dedup APPLY manifest (operators/corpus.py
    span_removal_manifest): per document, the MERGED token intervals
    whose 5-token windows occur in >= 2 distinct docs — the
    gaps-and-islands coalescing makes the cut well-defined when
    flagged windows chain; span_dedup_stats' statistics become an
    executable removal plan. Doc-partitioned windows only."""
    from crawler_spark.operators.corpus import span_removal_manifest

    return span_removal_manifest(_t(spark, sf_dir, "documents"))


_SPAN_REMOVAL_SQL = """
    WITH base AS (
      SELECT doc_id,
             string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')
               AS ws
      FROM documents
    ),
    b2 AS (SELECT doc_id, ws, len(ws) AS n_tokens FROM base),
    wins AS (
      SELECT doc_id, n_tokens, i AS pos,
             md5(array_to_string(ws[i:i+4], ' ')) AS fp
      FROM b2, unnest(range(1, len(ws) - 3)) AS t(i)
      WHERE n_tokens >= 5
    ),
    dupfp AS (
      SELECT fp FROM (
        SELECT fp, count(DISTINCT doc_id) AS nd FROM wins GROUP BY fp
      ) WHERE nd >= 2
    ),
    flagged AS (
      SELECT w.doc_id, w.n_tokens, w.pos, w.pos + 4 AS e
      FROM wins w JOIN dupfp USING (fp)
    ),
    marked AS (
      SELECT *, CASE WHEN pm IS NULL OR pos > pm + 1 THEN 1 ELSE 0 END AS brk
      FROM (
        SELECT *, max(e) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS pm
        FROM flagged
      )
    ),
    isl AS (
      SELECT *, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS island
      FROM marked
    ),
    per_isl AS (
      SELECT doc_id, island, min(pos) AS s, max(e) AS e2,
             count(*) AS n_w
      FROM isl GROUP BY doc_id, island
    ),
    per_doc AS (
      SELECT doc_id, CAST(sum(n_w) AS BIGINT) AS n_dup_windows,
             CAST(count(*) AS BIGINT) AS n_intervals,
             CAST(sum(e2 - s + 1) AS BIGINT) AS tokens_removed
      FROM per_isl GROUP BY doc_id
    )
    SELECT b.doc_id, CAST(b.n_tokens AS INTEGER) AS n_tokens,
           coalesce(p.n_dup_windows, 0) AS n_dup_windows,
           coalesce(p.n_intervals, 0) AS n_intervals,
           coalesce(p.tokens_removed, 0) AS tokens_removed,
           floor(CAST(coalesce(p.tokens_removed, 0) AS DOUBLE)
                 / CAST(b.n_tokens AS DOUBLE) * 1e6 + 0.5) / 1e6
             AS removal_ratio6
    FROM b2 b LEFT JOIN per_doc p USING (doc_id)
"""


def q_countsketch_tokens(spark, sf_dir):
    """Count-Sketch token-frequency estimates (Charikar et al.
    ICALP'02; operators/sketches.py) for the heavy vocabulary —
    countmin_heavy_hitters' UNBIASED sibling: signed collisions cancel
    in expectation, so the error scales with the stream's L2 norm
    instead of its total mass (the win on skewed token streams);
    lower-median over rows, grid depth x 256 regardless of corpus.
    Exact counts co-computed as witness."""
    from crawler_spark.operators.sketches import (
        countsketch_build,
        countsketch_estimate,
    )

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.filter(
                F.split(
                    F.regexp_replace(
                        F.lower(F.trim(F.col("text"))), r"\s+", " "
                    ),
                    " ",
                ),
                lambda x: x != "",
            )
        ).alias("tok")
    )
    sk = countsketch_build(toks, "tok", depth=4)
    heavy = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("exact_cnt"))
        .filter(F.col("exact_cnt") >= 200)
    )
    est = countsketch_estimate(sk, heavy.select("tok"), "tok", depth=4)
    return heavy.join(est, "tok").select(
        "tok",
        "exact_cnt",
        F.col("cs_est").alias("cs_est"),
        (F.col("cs_est") - F.col("exact_cnt")).alias("err"),
    )


def _countsketch_sql(depth: int = 4) -> str:
    """DuckDB mirror of q_countsketch_tokens: identical md5 columns,
    +/-1 signs, and the lower-median (2nd of 4 ascending)."""

    def col_expr(tok: str) -> str:
        h = f"md5(concat('cs', r.cs_row, ':', {tok}))"
        return (
            f"(instr('0123456789abcdef', substring({h}, 1, 1)) - 1) * 16"
            f" + (instr('0123456789abcdef', substring({h}, 2, 1)) - 1)"
        )

    def sgn_expr(tok: str) -> str:
        h = f"md5(concat('cs', r.cs_row, ':', {tok}))"
        return (
            f"CASE WHEN (instr('0123456789abcdef', substring({h}, 3, 1)) - 1)"
            f" % 2 = 0 THEN 1 ELSE -1 END"
        )

    rows = ", ".join(str(r) for r in range(depth))
    return f"""WITH t AS (
      SELECT tok FROM (
        SELECT unnest(list_filter(
          string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                       ' '),
          x -> len(x) > 0)) AS tok
        FROM documents
      )
    ),
    cells AS (
      SELECT r.cs_row, {col_expr('tok')} AS cs_col,
             CAST({sgn_expr('tok')} AS BIGINT) AS sgn
      FROM t CROSS JOIN (SELECT unnest([{rows}]) AS cs_row) r
    ),
    sk AS (
      SELECT cs_row, cs_col, sum(sgn) AS cell
      FROM cells GROUP BY cs_row, cs_col
    ),
    heavy AS (
      SELECT tok, count(*) AS exact_cnt FROM t
      GROUP BY tok HAVING count(*) >= 200
    ),
    probes AS (
      SELECT tok, r.cs_row, {col_expr('tok')} AS cs_col,
             CAST({sgn_expr('tok')} AS BIGINT) AS sgn
      FROM heavy CROSS JOIN (SELECT unnest([{rows}]) AS cs_row) r
    ),
    vals AS (
      SELECT p.tok, p.sgn * s.cell AS v
      FROM probes p JOIN sk s USING (cs_row, cs_col)
    ),
    med AS (
      SELECT tok, v AS cs_est FROM (
        SELECT *, row_number() OVER (PARTITION BY tok ORDER BY v) AS rn
        FROM vals
      ) WHERE rn = {(depth + 1) // 2}
    )
    SELECT h.tok, h.exact_cnt, CAST(m.cs_est AS BIGINT) AS cs_est,
           CAST(m.cs_est - h.exact_cnt AS BIGINT) AS err
    FROM heavy h JOIN med m USING (tok)"""


def q_cc_incremental(spark, sf_dir):
    """Incremental connected components (operators/graph.py
    cc_star_incremental): wave 1 = the even-doc SNM candidate
    subgraph, clustered; wave 2 = every remaining candidate pair,
    absorbed by contracting old clusters to their labels and running
    star contraction on O(wave) work only. The oracle is the
    INDEPENDENT full recompute over ALL pairs (recursive-CTE min-label
    closure), so the hash match proves incremental == from-scratch
    exactly — the IVM contract for the dedup graph."""
    from crawler_spark.operators.dedup import snm_candidate_pairs
    from crawler_spark.operators.graph import cc_star, cc_star_incremental

    d = _t(spark, sf_dir, "documents")
    norm = d.select(
        "doc_id",
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ").alias("t"),
    )
    keyed = norm.select("doc_id", F.substring("t", 1, 12).alias("k"))
    cand = snm_candidate_pairs(keyed, "k", "doc_id", window=4).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    ).localCheckpoint(eager=True)
    p1 = cand.filter(
        (F.col("doc_a") % 2 == 0) & (F.col("doc_b") % 2 == 0)
    )
    p2 = cand.subtract(p1)
    labels1 = cc_star(p1)
    return cc_star_incremental(labels1, p2)


_CC_INCREMENTAL_SQL = """
    WITH RECURSIVE n AS (
      SELECT doc_id,
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
      FROM documents
    ),
    rk AS (
      SELECT doc_id, substring(t, 1, 12) AS k,
             row_number() OVER (ORDER BY substring(t, 1, 12), doc_id) AS rn
      FROM n
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM rk a JOIN rk b ON b.rn - a.rn >= 1 AND b.rn - a.rn <= 3
      WHERE a.doc_id != b.doc_id
    ),
    e AS (
      SELECT doc_a AS s, doc_b AS t FROM cand
      UNION SELECT doc_b, doc_a FROM cand
    ),
    reach(s, t) AS (
      SELECT s, t FROM e
      UNION
      SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s
    )
    SELECT s AS doc_id, least(s, min(t)) AS cluster_id
    FROM reach GROUP BY s
"""


def q_bootstrap_mean_ci(spark, sf_dir):
    """Poisson-bootstrap CI for the mean event value (operators/
    stats.py poisson_bootstrap_ci): multinomial resampling converges
    to per-row Poisson(1) weights, so B=32 bootstrap replicates become
    one scan with combinable weighted sums — the honest error bar no
    10^10-row resampling shuffle could afford. md5 uniforms + 9dp CDF
    literals keep every weight engine-exact."""
    from crawler_spark.operators.stats import poisson_bootstrap_ci

    e = _t(spark, sf_dir, "events")
    return poisson_bootstrap_ci(e, "event_id", "value", n_reps=32)


def _bootstrap_sql(n_reps: int = 32) -> str:
    """DuckDB mirror of q_bootstrap_mean_ci: identical uniforms,
    Poisson(1) inverse-CDF thresholds, pinned replicate means, order-
    statistic CI."""
    from crawler_spark.operators.stats import POISSON1_CDF

    cases = " ".join(
        f"WHEN u < {t!r} THEN {k}" for k, t in enumerate(POISSON1_CDF)
    )
    return f"""WITH v AS (
      SELECT event_id AS rid,
             CAST(floor(CAST(value AS DOUBLE) * 1e6 + 0.5) / 1e6
                  AS DECIMAL(18,6)) AS v
      FROM events
    ),
    fan AS (
      SELECT rid, v, r.rep
      FROM v CROSS JOIN (SELECT unnest(range(0, {n_reps})) AS rep) r
    ),
    wtd AS (
      SELECT rep, v,
             CAST(CASE {cases} ELSE {len(POISSON1_CDF)} END AS BIGINT) AS w
      FROM (
        SELECT *,
               (CAST(concat('0x', substring(
                  md5('pb' || rep || ':' || rid), 1, 8)) AS BIGINT) + 0.5)
               / 4294967296.0 AS u
        FROM fan
      )
    ),
    reps AS (SELECT rep, sum(v * w) AS ws, sum(w) AS wn FROM wtd GROUP BY rep),
    means AS (
      SELECT floor(CAST(ws AS DOUBLE) / CAST(wn AS DOUBLE) * 1e6 + 0.5)
             / 1e6 AS m
      FROM reps WHERE wn > 0
    ),
    ranked AS (SELECT m, row_number() OVER (ORDER BY m) AS rn FROM means),
    base AS (
      SELECT count(*) AS n,
             floor(CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                   * 1e6 + 0.5) / 1e6 AS mean6
      FROM v
    )
    SELECT n, mean6,
           (SELECT m FROM ranked WHERE rn = 2) AS ci_lo6,
           (SELECT m FROM ranked WHERE rn = {n_reps - 1}) AS ci_hi6
    FROM base"""


_HOMOGLYPHS = ("аоерсх", "aoepcx")
# Cyrillic а/о/е/р/с/х -> their Latin look-alikes (the classic
# homoglyph-attack alphabet subset; extend the literal pair to grow it)


def q_typosquat_hosts(spark, sf_dir):
    """Typosquat / homoglyph host screen — the crawl-security gate
    that keeps look-alike domains out of a trusted-seed expansion:
    candidate hosts are checked against a broadcast protected-domain
    dimension after HOMOGLYPH folding (Cyrillic look-alikes ->
    Latin, a literal translate() — catches IDN-confusable spoofs the
    punycode canon keeps distinct because they ARE distinct hosts)
    and flagged when edit distance <= 2 without being the literal
    domain itself (the exclusion is on the RAW host: a homoglyph spoof
    folds exactly onto the domain at distance 0 and must flag). Native levenshtein both engines; a band on length
    difference prunes the broadcast theta-join. The synthetic
    candidates plant one transposition, one homoglyph spoof, one
    insertion, and clean hosts."""
    protected = spark.createDataFrame(
        [("example.test",), ("crawler.test",), ("images.test",)],
        "domain string",
    )
    d = _t(spark, sf_dir, "documents")
    cand = d.select(
        F.expr(
            "CASE WHEN doc_id % 5 = 0 THEN 'exmaple.test' "
            "WHEN doc_id % 5 = 1 THEN 'exаmple.test' "
            "WHEN doc_id % 5 = 2 THEN 'crawlers.test' "
            "WHEN doc_id % 5 = 3 THEN 'host-' || CAST(doc_id % 20 AS STRING) || '.test' "
            "ELSE 'images.test' END"
        ).alias("host")
    ).distinct()
    folded = cand.withColumn(
        "folded",
        F.translate(F.lower(F.col("host")), _HOMOGLYPHS[0], _HOMOGLYPHS[1]),
    )
    # HASHABLE join: the dim fans out to one row per admissible length
    # (edit distance <= 2 bounds |len diff| <= 2), candidates key on
    # their own length — an equi-join a 10^6-domain protected list can
    # survive, where the raw theta condition plans as a nested loop
    dim = protected.select(
        "domain",
        F.explode(
            F.expr("sequence(length(domain) - 2, length(domain) + 2)")
        ).alias("lkey"),
    )
    hit = (
        folded.withColumn("lkey", F.length("folded"))
        .join(F.broadcast(dim), "lkey")
        .filter(
            (F.levenshtein(F.col("folded"), F.col("domain")) <= 2)
            # exclude the LITERAL legit host, not its fold: a homoglyph
            # spoof folds exactly onto the domain (distance 0) and must
            # still be flagged
            & (F.col("host") != F.col("domain"))
        )
        .select(
            "host",
            "domain",
            F.levenshtein(F.col("folded"), F.col("domain")).alias("distance"),
            (F.col("folded") != F.col("host")).alias("homoglyph_folded"),
        )
    )
    return hit


_TYPOSQUAT_SQL = f"""
    WITH protected AS (
      SELECT unnest(['example.test', 'crawler.test', 'images.test'])
        AS domain
    ),
    cand AS (
      SELECT DISTINCT
        CASE WHEN doc_id % 5 = 0 THEN 'exmaple.test'
             WHEN doc_id % 5 = 1 THEN 'exаmple.test'
             WHEN doc_id % 5 = 2 THEN 'crawlers.test'
             WHEN doc_id % 5 = 3 THEN 'host-' || (doc_id % 20) || '.test'
             ELSE 'images.test' END AS host
      FROM documents
    ),
    folded AS (
      SELECT host,
             translate(lower(host), '{_HOMOGLYPHS[0]}', '{_HOMOGLYPHS[1]}')
               AS folded
      FROM cand
    ),
    dim AS (
      SELECT domain, unnest(range(length(domain) - 2, length(domain) + 3))
        AS lkey
      FROM protected
    )
    SELECT f.host, p.domain,
           CAST(levenshtein(f.folded, p.domain) AS INTEGER) AS distance,
           f.folded != f.host AS homoglyph_folded
    FROM folded f JOIN dim p ON length(f.folded) = p.lkey
    WHERE levenshtein(f.folded, p.domain) <= 2
      AND f.host != p.domain
"""


def q_classifier_auc(spark, sf_dir):
    """Exact tie-aware ROC AUC (operators/evals.py auc_exact; the
    Mann-Whitney rank-sum identity with midranks) for the embedding
    linear probe against the stored label's parity — the ranking-
    quality eval the threshold metrics can't express; one fact
    aggregation + a window over the DISTINCT-SCORE dimension only."""
    from crawler_spark.operators.evals import auc_exact

    ws = _clf64_weights()
    w_arr = F.array(*[F.lit(w) for w in ws])
    e = _t(spark, sf_dir, "embeddings")
    raw = F.round(
        F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                w_arr,
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        9,
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-raw)), 6)
    scored = e.select(
        score.alias("score"), (F.col("label") % 2).alias("label_bin")
    )
    return auc_exact(scored, "score", "label_bin")


def _auc_sql() -> str:
    """DuckDB mirror of q_classifier_auc: the classifier score CTE +
    grouped midrank rank-sum."""
    ws = ", ".join(repr(w) for w in _clf64_weights())
    return f"""WITH comp AS (
      SELECT vec_id, label,
             CAST(embedding[i] AS DOUBLE) * ([{ws}][i]) AS p
      FROM embeddings, unnest(generate_series(1, 64)) AS t(i)
    ),
    sc AS (
      SELECT round(1.0 / (1.0 + exp(-round(sum(p), 9))), 6) AS s,
             label % 2 AS label_bin
      FROM comp GROUP BY vec_id, label
    ),
    g AS (
      SELECT s, count(*) AS n_g,
             CAST(sum(label_bin) AS BIGINT) AS np_g
      FROM sc GROUP BY s
    ),
    ranked AS (
      SELECT *,
             coalesce(sum(n_g) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED
                                     PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM g
    ),
    up AS (
      SELECT np_g, n_g,
             CAST(np_g AS DOUBLE)
             * (CAST(cum_before AS DOUBLE)
                + (CAST(n_g AS DOUBLE) + 1.0) / 2.0) AS upart
      FROM ranked
    )
    SELECT CAST(sum(np_g) AS BIGINT) AS n_pos,
           CAST(sum(n_g) - sum(np_g) AS BIGINT) AS n_neg,
           floor((
             (sum(upart)
              - CAST(sum(np_g) AS DOUBLE)
                * (CAST(sum(np_g) AS DOUBLE) + 1.0) / 2.0)
             / (CAST(sum(np_g) AS DOUBLE)
                * CAST(sum(n_g) - sum(np_g) AS DOUBLE))
           ) * 1e6 + 0.5) / 1e6 AS auc6
    FROM up"""


def q_classifier_calibration(spark, sf_dir):
    """Classifier calibration report — AUC's companion (ranking can be
    perfect while probabilities lie): per confidence decile, mean
    predicted probability vs observed positive rate, plus the
    one-row Brier score and expected calibration error
    ECE = sum |acc_b - conf_b| * n_b / n. One grouped aggregation over
    10 bins; Brier terms pinned at 1e-9 and decimal-summed
    (order-independent)."""
    ws = _clf64_weights()
    w_arr = F.array(*[F.lit(w) for w in ws])
    e = _t(spark, sf_dir, "embeddings")
    raw = F.round(
        F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                w_arr,
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        9,
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-raw)), 6)
    sc = e.select(
        score.alias("s"),
        (F.col("label") % 2).cast("long").alias("y"),
    )

    def pin(c, k):
        sca = float(10 ** k)
        return F.floor(c * F.lit(sca) + F.lit(0.5)) / F.lit(sca)

    binned = sc.select(
        F.least(F.floor(F.col("s") * 10).cast("int"), F.lit(9)).alias("bin"),
        "s",
        "y",
        pin((F.col("s") - F.col("y")) * (F.col("s") - F.col("y")), 9)
        .cast("decimal(20,9)")
        .alias("sqerr"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count("*").alias("n_b"),
        pin(F.avg("s"), 6).alias("conf6"),
        pin(F.avg(F.col("y").cast("double")), 6).alias("acc6"),
        F.sum("sqerr").alias("se"),
    )
    tot = per_bin.agg(
        F.sum("n_b").alias("n"),
        pin(
            F.sum("se").cast("double") / F.sum("n_b").cast("double"), 6
        ).alias("brier6"),
        pin(
            F.sum(
                F.abs(F.col("acc6") - F.col("conf6"))
                * F.col("n_b").cast("double")
            )
            / F.sum("n_b").cast("double"),
            6,
        ).alias("ece6"),
    )
    return per_bin.crossJoin(F.broadcast(tot)).select(
        "bin", "n_b", "conf6", "acc6", "n", "brier6", "ece6"
    )


def _calibration_sql() -> str:
    """DuckDB mirror of q_classifier_calibration."""
    ws = ", ".join(repr(w) for w in _clf64_weights())
    return f"""WITH comp AS (
      SELECT vec_id, label,
             CAST(embedding[i] AS DOUBLE) * ([{ws}][i]) AS p
      FROM embeddings, unnest(generate_series(1, 64)) AS t(i)
    ),
    sc AS (
      SELECT round(1.0 / (1.0 + exp(-round(sum(p), 9))), 6) AS s,
             CAST(label % 2 AS BIGINT) AS y
      FROM comp GROUP BY vec_id, label
    ),
    binned AS (
      SELECT least(CAST(floor(s * 10) AS INTEGER), 9) AS bin, s, y,
             CAST(floor((s - y) * (s - y) * 1e9 + 0.5) / 1e9
                  AS DECIMAL(20,9)) AS sqerr
      FROM sc
    ),
    per_bin AS (
      SELECT bin, count(*) AS n_b,
             floor(avg(s) * 1e6 + 0.5) / 1e6 AS conf6,
             floor(avg(CAST(y AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS acc6,
             sum(sqerr) AS se
      FROM binned GROUP BY bin
    ),
    tot AS (
      SELECT CAST(sum(n_b) AS BIGINT) AS n,
             floor(CAST(sum(se) AS DOUBLE) / CAST(sum(n_b) AS DOUBLE)
                   * 1e6 + 0.5) / 1e6 AS brier6,
             floor(sum(abs(acc6 - conf6) * CAST(n_b AS DOUBLE))
                   / CAST(sum(n_b) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS ece6
      FROM per_bin
    )
    SELECT bin, n_b, conf6, acc6, n, brier6, ece6
    FROM per_bin CROSS JOIN tot"""


def q_trimmed_latency(spark, sf_dir):
    """Per-host trimmed and winsorized latency means — the robust
    dashboard numbers between the raw mean (one 30 s timeout wrecks
    it) and the median (throws away 50% of the signal): drop (trim) or
    clamp (winsorize) the top/bottom 10% by EXACT per-host ranks
    (host-partitioned windows only, deterministic doc_id tie-break).
    Latencies here are integer-valued doubles, so every group sum is
    IEEE-exact regardless of order."""
    d1 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 1, 1)) - 1)"
    d2 = "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 2, 1)) - 1)"
    f = _frontier(spark, sf_dir)
    lat = f.select(
        "doc_id",
        "host",
        (
            50.0
            + F.expr(f"({d1} * 16 + {d2})") * 7.0
            + F.col("priority") * 100.0
        ).alias("lat_ms"),
    )
    wh = Window.partitionBy("host")
    wo = wh.orderBy("lat_ms", "doc_id")
    ranked = lat.select(
        "host",
        "lat_ms",
        F.row_number().over(wo).alias("rn"),
        F.count("*").over(wh).alias("n"),
    ).withColumn("k", F.floor(F.col("n") / 10).cast("int"))
    bounded = ranked.withColumn(
        "lo",
        F.max(
            F.when(F.col("rn") == F.col("k") + 1, F.col("lat_ms"))
        ).over(wh),
    ).withColumn(
        "hi",
        F.max(
            F.when(F.col("rn") == F.col("n") - F.col("k"), F.col("lat_ms"))
        ).over(wh),
    )

    def pin6(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    return bounded.groupBy("host").agg(
        F.max("n").alias("n"),
        pin6(F.avg("lat_ms")).alias("mean6"),
        pin6(
            F.avg(
                F.when(
                    (F.col("rn") > F.col("k"))
                    & (F.col("rn") <= F.col("n") - F.col("k")),
                    F.col("lat_ms"),
                )
            )
        ).alias("trimmed6"),
        pin6(
            F.avg(F.least(F.greatest(F.col("lat_ms"), F.col("lo")), F.col("hi")))
        ).alias("winsor6"),
    )


_TRIMMED_SQL = f"""
    WITH f AS ({_FRONTIER_SQL}),
    lat AS (
      SELECT doc_id, host,
             50.0 + ({_hexdig_sql("cast(doc_id AS varchar)", 1)} * 16
                     + {_hexdig_sql("cast(doc_id AS varchar)", 2)}) * 7.0
             + priority * 100.0 AS lat_ms
      FROM f
    ),
    ranked AS (
      SELECT host, lat_ms,
             row_number() OVER (PARTITION BY host
                                ORDER BY lat_ms, doc_id) AS rn,
             count(*) OVER (PARTITION BY host) AS n
      FROM lat
    ),
    keyed AS (
      SELECT *, CAST(floor(n / 10) AS INTEGER) AS k FROM ranked
    ),
    bounded AS (
      SELECT *,
             max(CASE WHEN rn = k + 1 THEN lat_ms END)
               OVER (PARTITION BY host) AS lo,
             max(CASE WHEN rn = n - k THEN lat_ms END)
               OVER (PARTITION BY host) AS hi
      FROM keyed
    )
    SELECT host, CAST(max(n) AS BIGINT) AS n,
           floor(avg(lat_ms) * 1e6 + 0.5) / 1e6 AS mean6,
           floor(avg(CASE WHEN rn > k AND rn <= n - k THEN lat_ms END)
                 * 1e6 + 0.5) / 1e6 AS trimmed6,
           floor(avg(least(greatest(lat_ms, lo), hi)) * 1e6 + 0.5) / 1e6
             AS winsor6
    FROM bounded GROUP BY host
"""


def q_priority_sample_totals(spark, sf_dir):
    """Priority sampling (Duffield-Lund-Thorup JACM'07) over the
    documents corpus: per host, a k=64 sample whose max(w, tau)
    estimator gives an UNBIASED total-characters estimate — the
    zero-tuning companion to ht_corpus_totals (which needs rates chosen
    up front) and weighted_sample (which samples but cannot estimate).
    One scan + the salted two-phase top-(k+1); exact witness alongside
    (at 10^10 rows the witness is the pass being avoided)."""
    from crawler_spark.operators.stats import priority_sample_estimate

    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.concat(
            F.lit("host-"), (F.col("doc_id") % 20).cast("string"),
            F.lit(".test"),
        ).alias("host"),
        "n_chars",
    )
    return priority_sample_estimate(d, "host", "doc_id", "n_chars", k=64)


def q_epoch_shuffle(spark, sf_dir):
    """Epoch-deterministic training shuffle manifest: the per-epoch
    pseudorandom permutation (rank of md5('esh{e}:'+doc_id)) rolled
    into 256-row loader blocks, for epochs 0 AND 1 in one plan — the
    pair proves each epoch is individually reproducible while epochs
    differ by a full re-permutation (their per-block hash fences
    cannot collide). Global rank via assign_dense_seq (range shuffle +
    broadcast offsets — no single-partition window); output is
    2 * ceil(n/256) manifest rows."""
    from crawler_spark.operators.corpus import epoch_shuffle_manifest

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    m0 = epoch_shuffle_manifest(
        docs, "doc_id", "n_chars", epoch=0
    ).withColumn("epoch", F.lit(0))
    m1 = epoch_shuffle_manifest(
        docs, "doc_id", "n_chars", epoch=1
    ).withColumn("epoch", F.lit(1))
    return m0.unionByName(m1).select(
        "epoch", "block_id", "n_rows", "weight_sum", "h_lo", "h_hi"
    )


def q_url_survival(spark, sf_dir):
    """Kaplan-Meier URL survival per host (Kaplan & Meier JASA'58): the
    page-LIFETIME curve from revisit waves with right-censoring — pages
    still alive when observation stops are NOT treated as deaths (the
    bias in any naive mean-lifetime). Death wave derives from two md5
    digits (1..12) against an 8-wave study horizon, so ~1/3 of pages
    censor. All curve arithmetic windows over the distinct-wave
    dimension; ln terms pinned, decimal-summed (lm_perplexity's ln/exp
    contract)."""
    from crawler_spark.operators.robust import kaplan_meier

    docs = _t(spark, sf_dir, "documents")
    dw = (
        f"1 + pmod({_hexdig('km:', 1)} * 16 + {_hexdig('km:', 2)}, 12)"
    )
    obs = docs.select(
        F.concat(
            F.lit("host-"), (F.col("doc_id") % 20).cast("string"),
            F.lit(".test"),
        ).alias("host"),
        F.least(F.expr(dw), F.lit(8)).alias("t"),
        (F.expr(dw) <= F.lit(8)).cast("int").alias("ev"),
    )
    return kaplan_meier(obs, "host", "t", "ev")


def _hexdig(prefix: str, i: int) -> str:
    """Spark-side md5 hex digit (0-15) of prefix+doc_id (oracle twin:
    _hexdig_sql)."""
    return (
        f"(instr('0123456789abcdef', substring(md5(concat('{prefix}', "
        f"cast(doc_id as string))), {i}, 1)) - 1)"
    )


def q_dns_refresh_plan(spark, sf_dir):
    """Batched DNS re-resolution plan (Mercator's DNS-bottleneck
    lesson): from a 500-host dimension with md5-derived TTLs
    (300s..1d) and last-resolved waves, classify each record
    expired / due-soon (resolve-ahead) / fresh at wave 8 and shard the
    work across 8 resolver workers by keyed md5. One O(hosts) hash
    agg — the frontier is never touched; output is the per-(shard,
    status) work manifest."""
    from crawler_spark.operators.assign import dns_refresh_plan

    docs = _t(spark, sf_dir, "documents")
    d1 = (
        "(instr('0123456789abcdef', substring(md5(concat('dnsttl:', "
        "cast(hid as string))), 1, 1)) - 1)"
    )
    d2 = (
        "(instr('0123456789abcdef', substring(md5(concat('dnsttl:', "
        "cast(hid as string))), 2, 1)) - 1)"
    )
    hosts = (
        docs.select((F.col("doc_id") % 500).alias("hid"))
        .distinct()
        .select(
            F.concat(
                F.lit("host-"), F.col("hid").cast("string"), F.lit(".test")
            ).alias("host"),
            F.expr(
                f"element_at(array(300L, 900L, 3600L, 86400L), "
                f"pmod({d1}, 4) + 1)"
            ).alias("ttl_s"),
            F.expr(f"pmod({d2}, 8)").cast("int").alias("resolved_wave"),
        )
    )
    return dns_refresh_plan(
        hosts, current_wave=8, wave_seconds=600, n_shards=8
    )


def q_filter_agreement(spark, sf_dir):
    """Cohen's kappa between two curation gates per source: a
    length-rule gate vs a noisy stand-in classifier (same rule on a
    md5-perturbed length). Chance-corrected agreement — the number
    that exposes 'gates agree 91%' as mostly base-rate; one map-side
    2x2 count per source, dimension-only kappa arithmetic."""
    from crawler_spark.operators.evals import filter_agreement_kappa

    docs = _t(spark, sf_dir, "documents")
    noise = f"({_hexdig('fa:', 1)} * 16 + {_hexdig('fa:', 2)} - 127) * 8"
    d = docs.select(
        "source",
        (F.col("n_chars") >= 800).alias("gate_a"),
        ((F.col("n_chars") + F.expr(noise)) >= 800).alias("gate_b"),
    )
    return filter_agreement_kappa(d, "source", "gate_a", "gate_b")


def q_drift_fdr_gate(spark, sf_dir):
    """Fleet drift detection done right: per-host exact two-sample KS
    between wave 0 and wave 1 latencies (operators/stats.ks_two_sample_by
    — the keyed form; one dataflow, no per-host driver jobs), then
    Benjamini-Hochberg FDR control over the 20 simultaneous p-values
    (bh_fdr). Four hosts carry a planted +120 shift in wave 1; the gate
    must discover them WITHOUT paging on the 16 quiet hosts — per-test
    alpha hands you 5% of all quiet hosts as false alarms at fleet
    scale, which is why the BH layer exists."""
    from crawler_spark.operators.stats import bh_fdr, ks_two_sample_by

    f = _frontier(spark, sf_dir)
    d1 = _hexdig("dk:", 1)
    d2 = _hexdig("dk:", 2)
    # wave from an md5 digit, NOT doc_id parity: host = doc_id % 20, so
    # any doc_id-arithmetic wave would correlate with host membership
    # (each host would see a single wave and no test could run)
    d3 = _hexdig("dk:", 3)
    wave = F.expr(f"pmod({d3}, 2)").cast("int")
    lat = f.select(
        "host",
        wave.alias("wave"),
        (
            F.lit(50)
            + F.expr(f"{d1} * 16 + {d2}")
            + F.when(
                ((F.col("doc_id") % 20) % 5 == 0) & (wave == 1),
                F.lit(120),
            ).otherwise(F.lit(0))
        ).cast("long").alias("lat"),
    )
    tests = ks_two_sample_by(lat, "host", "wave", "lat", 0, 1)
    return bh_fdr(tests, "host", "p_approx6", alpha=0.05)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pricing_summary(spark, SF_DEFAULT)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "priority_sample_totals": q_priority_sample_totals,
        "epoch_shuffle": q_epoch_shuffle,
        "url_survival": q_url_survival,
        "dns_refresh_plan": q_dns_refresh_plan,
        "filter_agreement": q_filter_agreement,
        "drift_fdr_gate": q_drift_fdr_gate,
        "frontier_schedule": q_frontier_schedule,
        "host_link_rank": q_host_link_rank,
        "rank_drift": q_rank_drift,
        "image_dedup_keep_best": q_image_dedup_keep_best,
        "opic_priority": q_opic_priority,
        "hrw_fetcher_assign": q_hrw_fetcher_assign,
        "hrw_rebalance": q_hrw_rebalance,
        "ring_vs_hrw_balance": q_ring_vs_hrw_balance,
        "url_template_stats": q_url_template_stats,
        "depth_histogram": q_depth_histogram,
        "recrawl_schedule": q_recrawl_schedule,
        "host_triangles": q_host_triangles,
        "host_clustering_coeff": q_host_clustering_coeff,
        "dataset_split": q_dataset_split,
        "host_reciprocity": q_host_reciprocity,
        "host_degree_histogram": q_host_degree_histogram,
        "urlseen_antijoin": q_urlseen_antijoin,
        "urlseen_cuckoo": q_urlseen_cuckoo,
        "drain_forecast": q_drain_forecast,
        "fetcher_load_forecast": q_fetcher_load_forecast,
        "robots_gate": q_robots_gate,
        "robots_sitemaps": q_robots_sitemaps,
        "resolve_links": q_resolve_links,
        "canonicalize": q_canonicalize,
        "surt_index": q_surt_index,
        "latest_event_per_user": q_latest_event_per_user,
        "top1_event_per_type": q_top1_event_per_type,
        "event_type_stats": q_event_type_stats,
        "hourly_event_counts": q_hourly_event_counts,
        "fetch_rate_ewma": q_fetch_rate_ewma,
        "event_order_audit": q_event_order_audit,
        "host_wilson_health": q_host_wilson_health,
        "zipf_fit": q_zipf_fit,
        "discovery_curve": q_discovery_curve,
        "char_entropy_gate": q_char_entropy_gate,
        "shard_checksums": q_shard_checksums,
        "sessionize_events": q_sessionize_events,
        "pricing_summary": q_pricing_summary,
        "shipping_priority": q_shipping_priority,
        "segment_stats": q_segment_stats,
        "local_supplier_volume": q_local_supplier_volume,
        "nation_trade_volume": q_nation_trade_volume,
        "market_share": q_market_share,
        "nation_profit": q_nation_profit,
        "small_quantity_revenue": q_small_quantity_revenue,
        "idle_customers": q_idle_customers,
        "bpe_merge_pairs": q_bpe_merge_pairs,
        "hll_distinct": q_hll_distinct,
        "kmv_vocab_sketch": q_kmv_vocab_sketch,
        "edh_histogram": q_edh_histogram,
        "join_order_costs": q_join_order_costs,
        "anchor_text_index": q_anchor_text_index,
        "image_rot_dedup": q_image_rot_dedup,
        "latency_mad_outliers": q_latency_mad_outliers,
        "host_latency_trend": q_host_latency_trend,
        "unimax_allocation": q_unimax_allocation,
        "cusum_regime_shifts": q_cusum_regime_shifts,
        "fs_match_decisions": q_fs_match_decisions,
        "fs_em_fit": q_fs_em_fit,
        "mg_heavy_hitters": q_mg_heavy_hitters,
        "source_max_cover": q_source_max_cover,
        "wl_host_roles": q_wl_host_roles,
        "host_betweenness": q_host_betweenness,
        "merge_batch_matching": q_merge_batch_matching,
        "url_prefix_rollup": q_url_prefix_rollup,
        "linkage_clusters": q_linkage_clusters,
        "neyman_allocation": q_neyman_allocation,
        "kmeanspar_init": q_kmeanspar_init,
        "densest_profile": q_densest_profile,
        "front_coding": q_front_coding,
        "image_ssim_verify": q_image_ssim_verify,
        "bloom_reduced_join": q_bloom_reduced_join,
        "ks_drift": q_ks_drift,
        "temporal_reachability": q_temporal_reachability,
        "cws_jaccard_est": q_cws_jaccard_est,
        "mg_exact_heavy": q_mg_exact_heavy,
        "image_ela_forensics": q_image_ela_forensics,
        "span_removal": q_span_removal,
        "countsketch_tokens": q_countsketch_tokens,
        "cc_incremental": q_cc_incremental,
        "bootstrap_mean_ci": q_bootstrap_mean_ci,
        "typosquat_hosts": q_typosquat_hosts,
        "classifier_auc": q_classifier_auc,
        "classifier_calibration": q_classifier_calibration,
        "trimmed_latency": q_trimmed_latency,
        "chunk_windows": q_chunk_windows,
        "rrf_fusion": q_rrf_fusion,
        "politeness_compliance_audit": q_politeness_compliance_audit,
        "dgim_error_window": q_dgim_error_window,
        "wfq_dispatch_order": q_wfq_dispatch_order,
        "seed_attribution": q_seed_attribution,
        "fk_readability": q_fk_readability,
        "trailing_distinct_hll": q_trailing_distinct_hll,
        "decayed_host_activity": q_decayed_host_activity,
        "edh_selectivity_audit": q_edh_selectivity_audit,
        "kmv_set_algebra": q_kmv_set_algebra,
        "countmin_heavy_hitters": q_countmin_heavy_hitters,
        "hdr_latency_quantiles": q_hdr_latency_quantiles,
        "snm_blocking_pairs": q_snm_blocking_pairs,
        "ivm_incremental_agg": q_ivm_incremental_agg,
        "ivm_incremental_join": q_ivm_incremental_join,
        "psi_feature_drift": q_psi_feature_drift,
        "ht_corpus_totals": q_ht_corpus_totals,
        "slo_burn_alerts": q_slo_burn_alerts,
        "suffix_repeats": q_suffix_repeats,
        "kn_perplexity": q_kn_perplexity,
        "hilbert_key": q_hilbert_key,
        "host_latency_mk_trend": q_host_latency_mk_trend,
        "compression_gate": q_compression_gate,
        "audio_fingerprint_match": q_audio_fingerprint_match,
        "host_two_hop_reach": q_host_two_hop_reach,
        "jsonl_quarantine": q_jsonl_quarantine,
        "trailing_window_load": q_trailing_window_load,
        "wds_export": q_wds_export,
        "snm_blocking_eval": q_snm_blocking_eval,
        "image_dims_native": q_image_dims_native,
        "grouping_sets_mix": q_grouping_sets_mix,
        "event_unpivot_roundtrip": q_event_unpivot_roundtrip,
        "dense_daily_revenue": q_dense_daily_revenue,
        "explode_outer_audit": q_explode_outer_audit,
        "locf_daily_revenue": q_locf_daily_revenue,
        "min_cost_supplier": q_min_cost_supplier,
        "ship_delay_priority": q_ship_delay_priority,
        "supplier_part_variety": q_supplier_part_variety,
        "surplus_suppliers": q_surplus_suppliers,
        "returned_items": q_returned_items,
        "forecast_revenue": q_forecast_revenue,
        "priority_pipeline": q_priority_pipeline,
        "large_orders": q_large_orders,
        "customer_order_counts": q_customer_order_counts,
        "promo_revenue_share": q_promo_revenue_share,
        "disjunctive_bands": q_disjunctive_bands,
        "lone_flagger_suppliers": q_lone_flagger_suppliers,
        "top_supplier_revenue": q_top_supplier_revenue,
        "nation_acctbal_share": q_nation_acctbal_share,
        "revenue_ma7": q_revenue_ma7,
        "referential_orphans": q_referential_orphans,
        "activity_islands": q_activity_islands,
        "order_priority_cube": q_order_priority_cube,
        "ntile_value_deciles": q_ntile_value_deciles,
        "event_user_setops": q_event_user_setops,
        "skewed_join_counts": q_skewed_join_counts,
        "asof_join_events": q_asof_join_events,
        "interval_join_events": q_interval_join_events,
        "length_quantiles": q_length_quantiles,
        "price_outliers": q_price_outliers,
        "event_type_pivot": q_event_type_pivot,
        "sliding_event_counts": q_sliding_event_counts,
        "json_props_stats": q_json_props_stats,
        "running_revenue": q_running_revenue,
        "lang_mixture": q_lang_mixture,
        "lm_perplexity": q_lm_perplexity,
        "ccnet_buckets": q_ccnet_buckets,
        "bm25_topk": q_bm25_topk,
        "dsir_weights": q_dsir_weights,
        "host_cap_sample": q_host_cap_sample,
        "semdedup": q_semdedup,
        "hard_negative_captions": q_hard_negative_captions,
        "rfc9309_gate": q_rfc9309_gate,
        "robots_rule_usage": q_robots_rule_usage,
        "retrieval_recall": q_retrieval_recall,
        "ann_recall_eval": q_ann_recall_eval,
        "refresh_value": q_refresh_value,
        "refresh_allocation": q_refresh_allocation,
        "bowtie_classes": q_bowtie_classes,
        "adjacency_gap_bits": q_adjacency_gap_bits,
        "degree_assortativity": q_degree_assortativity,
        "ams_f2": q_ams_f2,
        "pareto_frontier": q_pareto_frontier,
        "join_size_forecast": q_join_size_forecast,
        "recursive_reachability": q_recursive_reachability,
        "host_scc": q_host_scc,
        "train_linear_probe": q_train_linear_probe,
        "variant_extract_stats": q_variant_extract_stats,
        "scd2_robots_history": q_scd2_robots_history,
        "session_windows": q_session_windows,
        "aimd_rates": q_aimd_rates,
        "host_distinct_hll": q_host_distinct_hll,
        "phash_bit_bias": q_phash_bit_bias,
        "exact_global_median": q_exact_global_median,
        "warc_revisit_plan": q_warc_revisit_plan,
        "rank_priority_bands": q_rank_priority_bands,
        "pair_shards": q_pair_shards,
        "bpe_train": q_bpe_train,
        "phash_threshold_eval": q_phash_threshold_eval,
        "caption_junk_filter": q_caption_junk_filter,
        "host_components": q_host_components,
        "hyperball_balls": q_hyperball_balls,
        "harmonic_centrality": q_harmonic_centrality,
        "effective_diameter": q_effective_diameter,
        "ppjoin_pairs": q_ppjoin_pairs,
        "ppjoin_prefix_stats": q_ppjoin_prefix_stats,
        "ed_join_pairs": q_ed_join_pairs,
        "weighted_jaccard_pairs": q_weighted_jaccard_pairs,
        "ed_join_stats": q_ed_join_stats,
        "host_communities": q_host_communities,
        "seed_distance": q_seed_distance,
        "stride_schedule": q_stride_schedule,
        "host_kcore": q_host_kcore,
        "caption_boilerplate": q_caption_boilerplate,
        "blocklist_filter": q_blocklist_filter,
        "dispatch_timeline": q_dispatch_timeline,
        "pair_pipeline": q_pair_pipeline,
        "dedup_cross_wave": q_dedup_cross_wave,
        "cloaking_signal": q_cloaking_signal,
        "embedding_drift": q_embedding_drift,
        "lang_confusion": q_lang_confusion,
        "crawl_adaptive_smoke": q_crawl_adaptive_smoke,
        "dup_quality_profile": q_dup_quality_profile,
        "shingle_df_stats": q_shingle_df_stats,
        "politeness_audit": q_politeness_audit,
        "ip_politeness": q_ip_politeness,
        "aging_schedule": q_aging_schedule,
        "host_quota_schedule": q_host_quota_schedule,
        "salsa_scores": q_salsa_scores,
        "span_dedup_stats": q_span_dedup_stats,
        "host_mirror_jaccard": q_host_mirror_jaccard,
        "host_cocitation": q_host_cocitation,
        "host_ucb_priority": q_host_ucb_priority,
        "curriculum_stages": q_curriculum_stages,
        "lsh_dedup_eval": q_lsh_dedup_eval,
        "host_fairness": q_host_fairness,
        "focused_priority": q_focused_priority,
        "url_static_priority": q_url_static_priority,
        "bigram_pmi": q_bigram_pmi,
        "inverted_index": q_inverted_index,
        "stratified_sample": q_stratified_sample,
        "enrich_fallback": q_enrich_fallback,
        "scenario_first_hit": q_scenario_first_hit,
        "scenario_generate": q_scenario_generate,
        "alias_resolve": q_alias_resolve,
        "dim_upsert": q_dim_upsert,
        "union_dedup_first_wins": q_union_dedup_first_wins,
        "pair_similarity": q_pair_similarity,
        "weighted_similarity": q_weighted_similarity,
        "range_scan": q_range_scan,
        "validated_match": q_validated_match,
        "rollup_event_stats": q_rollup_event_stats,
        "image_decode_stats": q_image_decode_stats,
        "image_hash_agreement": q_image_hash_agreement,
        "image_border_gate": q_image_border_gate,
        "subimage_matches": q_subimage_matches,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_sigs": q_dedup_minhash_sigs,
        "dedup_simhash": q_dedup_simhash,
        "dedup_simhash64": q_dedup_simhash64,
        "simhash64_pairs": q_simhash64_pairs,
        "cc_star_clusters": q_cc_star_clusters,
        "trap_gate": q_trap_gate,
        "dup_line_gate": q_dup_line_gate,
        "repetition_mapside": q_repetition_mapside,
        "curation_funnel": q_curation_funnel,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "shingle_containment": q_shingle_containment,
        "substring_overlap": q_substring_overlap,
        "winnow_fingerprints": q_winnow_fingerprints,
        "winnow_overlap": q_winnow_overlap,
        "winnow_cross_wave": q_winnow_cross_wave,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "dedup_clusters": q_dedup_clusters,
        "dedup_impact": q_dedup_impact,
        "image_phash_neardup": q_image_phash_neardup,
        "image_dct_neardup": q_image_dct_neardup,
        "image_colorhist": q_image_colorhist,
        "image_flip_dedup": q_image_flip_dedup,
        "image_dedup_cross_wave": q_image_dedup_cross_wave,
        "minhash_banded_pairs": q_minhash_banded_pairs,
        "bbit_minhash_est": q_bbit_minhash_est,
        "oph_signatures": q_oph_signatures,
        "oph_jaccard_est": q_oph_jaccard_est,
        "ngram_jaccard_capped": q_ngram_jaccard_capped,
        "lang_id": q_lang_id,
        "quality_scores": q_quality_scores,
        "quality_tradeoff": q_quality_tradeoff,
        "image_curriculum": q_image_curriculum,
        "host_concentration": q_host_concentration,
        "gopher_flags": q_gopher_flags,
        "pii_redaction": q_pii_redaction,
        "contamination_check": q_contamination_check,
        "repetition_stats": q_repetition_stats,
        "repetition_suite": q_repetition_suite,
        "sequence_packing": q_sequence_packing,
        "shard_skew": q_shard_skew,
        "training_shards": q_training_shards,
        "event_funnel": q_event_funnel,
        "event_transitions": q_event_transitions,
        "retention_cohorts": q_retention_cohorts,
        "null_safe_match": q_null_safe_match,
        "corpus_health": q_corpus_health,
        "join_key_skew": q_join_key_skew,
        "token_stats": q_token_stats,
        "fingerprints": q_fingerprints,
        "corpus_select": q_corpus_select,
        "vocab_topk": q_vocab_topk,
        "tfidf_top": q_tfidf_top,
        "image_pairs_select": q_image_pairs_select,
        "pair_corpus_stats": q_pair_corpus_stats,
        "caption_alignment": q_caption_alignment,
        "ar_bucket_batches": q_ar_bucket_batches,
        "image_dup_clusters": q_image_dup_clusters,
        "zorder_key": q_zorder_key,
        "caption_stats_by_resolution": q_caption_stats_by_resolution,
        "pair_caption_canonical": q_pair_caption_canonical,
        "caption_noise_by_source": q_caption_noise_by_source,
        "dup_rate_by_source": q_dup_rate_by_source,
        "cosine_topk": q_cosine_topk,
        "kcenter_coreset": q_kcenter_coreset,
        "embedding_centroids": q_embedding_centroids,
        "embedding_quantization": q_embedding_quantization,
        "embedding_neardup": q_embedding_neardup,
        "embedding_neardup_mp": q_embedding_neardup_mp,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_ivf_kmeans": q_ann_ivf_kmeans,
        "pq_adc_topk": q_pq_adc_topk,
        "sitemap_ingest": q_sitemap_ingest,
        "sitemap_coverage": q_sitemap_coverage,
        "adaptive_politeness": q_adaptive_politeness,
        "domain_budget_rollup": q_domain_budget_rollup,
        "redirect_resolution": q_redirect_resolution,
        "redirect_aware_seen": q_redirect_aware_seen,
        "rolling_latency_anomaly": q_rolling_latency_anomaly,
        "matryoshka_eval": q_matryoshka_eval,
        "anchor_topk": q_anchor_topk,
        "crawl_trap_score": q_crawl_trap_score,
        "boilerplate_removal": q_boilerplate_removal,
        "change_rate": q_change_rate,
        "hits_scores": q_hits_scores,
        "warc_roundtrip": q_warc_roundtrip,
        "dust_params": q_dust_params,
        "dust_apply": q_dust_apply,
        "quality_classifier": q_quality_classifier,
        "image_sharpness": q_image_sharpness,
        "image_watermark": q_image_watermark,
        "embedding_classifier": q_embedding_classifier,
        "image_exposure_gates": q_image_exposure_gates,
        "image_augment": q_image_augment,
        "image_patches": q_image_patches,
        "image_transcode": q_image_transcode,
        "phash_stability": q_phash_stability,
        "snapshot_diff": q_snapshot_diff,
        "budget_allocation": q_budget_allocation,
        "cdc_chunk_dedup": q_cdc_chunk_dedup,
        "bpe_apply": q_bpe_apply,
        "kmv_jaccard": q_kmv_jaccard,
        "audio_stats": q_audio_stats,
        "audio_spectral": q_audio_spectral,
        "audio_vad": q_audio_vad,
        "trustrank": q_trustrank,
        "spam_mass": q_spam_mass,
        "weighted_sample": q_weighted_sample,
        "vocab_coverage": q_vocab_coverage,
        "mime_sniff": q_mime_sniff,
        "latency_percentiles": q_latency_percentiles,
        "html_extract": q_html_extract,
        "conditional_get": q_conditional_get,
        "source_mixture": q_source_mixture,
        "bucket_rebalance": q_bucket_rebalance,
        "source_kl": q_source_kl,
        "crawl_smoke": q_crawl_smoke,
    }


def oracle_sql() -> dict[str, str]:
    frontier = _FRONTIER_SQL
    sqls = {
        "priority_sample_totals": """
            WITH d AS (
              SELECT doc_id,
                     'host-' || (doc_id % 20) || '.test' AS host,
                     CAST(n_chars AS DOUBLE) AS w,
                     CAST('0x' || substring(md5('ps:'
                          || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                       AS h15
              FROM documents
            ),
            pq AS (
              SELECT *, w * 1152921504606846976.0 / (h15 + 1) AS q FROM d
            ),
            r AS (
              SELECT *, row_number() OVER (PARTITION BY host
                                           ORDER BY q DESC, doc_id) AS rnk
              FROM pq
            ),
            tau AS (
              SELECT host,
                     coalesce(max(CASE WHEN rnk = 65 THEN q END), 0.0)
                       AS tau
              FROM r GROUP BY host
            ),
            est AS (
              SELECT r.host, CAST(count(*) AS BIGINT) AS n_sampled,
                     CAST(sum(CAST(CAST(floor(greatest(w, tau) * 1e9
                                              + 0.5) AS DOUBLE) / 1e9
                              AS DECIMAL(28, 9))) AS DOUBLE) AS est_total,
                     max(tau) AS tau_v
              FROM r JOIN tau USING (host) WHERE rnk <= 64
              GROUP BY r.host
            ),
            ex AS (
              SELECT host, CAST(count(*) AS BIGINT) AS n_pop,
                     CAST(sum(CAST(CAST(floor(w * 1e9 + 0.5) AS DOUBLE)
                                   / 1e9 AS DECIMAL(28, 9))) AS DOUBLE)
                       AS exact_total
              FROM d GROUP BY host
            )
            SELECT est.host, n_pop, n_sampled,
                   floor(tau_v * 1e6 + 0.5) / 1e6 AS tau6,
                   floor(est_total * 1e6 + 0.5) / 1e6 AS est_total6,
                   floor(exact_total * 1e6 + 0.5) / 1e6 AS exact_total6
            FROM est JOIN ex USING (host)
        """,
        "epoch_shuffle": """
            WITH e AS (SELECT 0 AS epoch UNION ALL SELECT 1),
            keyed AS (
              SELECT e.epoch, d.doc_id,
                     CAST(d.n_chars AS DOUBLE) AS wt,
                     CAST('0x' || substring(md5('esh' || e.epoch || ':'
                          || CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                       AS h
              FROM documents d CROSS JOIN e
            ),
            pos AS (
              SELECT *, row_number() OVER (PARTITION BY epoch
                                           ORDER BY h, doc_id) - 1 AS p
              FROM keyed
            )
            SELECT epoch, CAST(p // 256 AS BIGINT) AS block_id,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CAST(CAST(floor(wt * 1e9 + 0.5) AS DOUBLE)
                                 / 1e9 AS DECIMAL(28, 9))) AS DOUBLE)
                     AS weight_sum,
                   min(h) AS h_lo, max(h) AS h_hi
            FROM pos GROUP BY epoch, p // 256
        """,
        "drift_fdr_gate": f"""
            WITH f AS ({_FRONTIER_SQL}),
            lat AS (
              SELECT host,
                     {_hexdig_sql("'dk:' || CAST(doc_id AS VARCHAR)", 3)} % 2
                       AS wave,
                     50 + ({_hexdig_sql("'dk:' || CAST(doc_id AS VARCHAR)", 1)} * 16
                           + {_hexdig_sql("'dk:' || CAST(doc_id AS VARCHAR)", 2)})
                        + CASE WHEN (doc_id % 20) % 5 = 0
                                    AND {_hexdig_sql("'dk:' || CAST(doc_id AS VARCHAR)", 3)} % 2 = 1
                               THEN 120 ELSE 0 END AS lat
              FROM f
            ),
            per AS (
              SELECT host, CAST(lat AS DOUBLE) AS val,
                     sum(CASE WHEN wave = 0 THEN 1 ELSE 0 END) AS ca,
                     sum(CASE WHEN wave = 1 THEN 1 ELSE 0 END) AS cb
              FROM lat GROUP BY host, CAST(lat AS DOUBLE)
            ),
            tot AS (
              SELECT host, sum(ca) AS na, sum(cb) AS nb FROM per
              GROUP BY host HAVING sum(ca) > 0 AND sum(cb) > 0
            ),
            gaps AS (
              SELECT per.host, val, na, nb,
                     floor(abs(CAST(sum(ca) OVER w AS DOUBLE)
                                 / CAST(na AS DOUBLE)
                               - CAST(sum(cb) OVER w AS DOUBLE)
                                 / CAST(nb AS DOUBLE))
                           * 1e9 + 0.5) / 1e9 AS gap
              FROM per JOIN tot USING (host)
              WINDOW w AS (PARTITION BY per.host ORDER BY val
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW)
            ),
            top AS (
              SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY host
                                             ORDER BY gap DESC, val) AS rn
                FROM gaps
              ) WHERE rn = 1
            ),
            lamt AS (
              SELECT *, floor(gap * sqrt(CAST(na AS DOUBLE)
                                         * CAST(nb AS DOUBLE)
                                         / CAST(na + nb AS DOUBLE))
                              * 1e9 + 0.5) / 1e9 AS lam
              FROM top
            ),
            ser AS (
              SELECT *,
                     floor(CAST(2.0 AS DOUBLE) * exp(-2.0 * lam * lam)
                           * 1e9 + 0.5) / 1e9
                     + floor(CAST(-2.0 AS DOUBLE) * exp(-8.0 * lam * lam)
                             * 1e9 + 0.5) / 1e9
                     + floor(CAST(2.0 AS DOUBLE) * exp(-18.0 * lam * lam)
                             * 1e9 + 0.5) / 1e9 AS series
              FROM lamt
            ),
            tests AS (
              SELECT host,
                     floor(greatest(least(series, 1.0), 0.0) * 1e6 + 0.5)
                       / 1e6 AS p
              FROM ser
            ),
            ranked AS (
              SELECT host, p,
                     row_number() OVER (ORDER BY p, host) AS rank,
                     count(*) OVER () AS m
              FROM tests
            ),
            k AS (
              SELECT coalesce(max(CASE WHEN p <= CAST(rank AS DOUBLE)
                                            * CAST(0.05 AS DOUBLE) / m
                                       THEN rank END), 0) AS kstar
              FROM ranked
            )
            SELECT host, p AS p_approx6, CAST(rank AS BIGINT) AS rank,
                   CAST(m AS BIGINT) AS m,
                   floor(CAST(rank AS DOUBLE) * CAST(0.05 AS DOUBLE) / m
                         * 1e9 + 0.5) / 1e9 AS bh_thr9,
                   rank <= kstar AS discovered
            FROM ranked CROSS JOIN k
        """,
        "dns_refresh_plan": """
            WITH hid AS (
              SELECT DISTINCT doc_id % 500 AS hid FROM documents
            ),
            hosts AS (
              SELECT 'host-' || hid || '.test' AS h,
                     (list_value(300, 900, 3600, 86400))[
                       (instr('0123456789abcdef', substring(md5('dnsttl:'
                          || CAST(hid AS VARCHAR)), 1, 1)) - 1) % 4 + 1
                     ] AS ttl,
                     (instr('0123456789abcdef', substring(md5('dnsttl:'
                        || CAST(hid AS VARCHAR)), 2, 1)) - 1) % 8
                       AS resolved_wave
              FROM hid
            ),
            cls AS (
              SELECT h, CAST(ttl AS BIGINT) AS ttl,
                     CASE
                       WHEN (8 - resolved_wave) * 600 >= ttl
                         THEN 'expired'
                       WHEN (8 - resolved_wave) * 600 + 600 >= ttl
                         THEN 'due_soon'
                       ELSE 'fresh'
                     END AS status
              FROM hosts
            )
            SELECT CASE WHEN status <> 'fresh'
                        THEN CAST('0x' || substring(md5('dns:' || h),
                                  1, 15) AS BIGINT) % 8
                        ELSE -1 END AS shard,
                   status,
                   CAST(count(*) AS BIGINT) AS n_hosts,
                   min(ttl) AS min_ttl_s, max(ttl) AS max_ttl_s
            FROM cls GROUP BY 1, 2
        """,
        "filter_agreement": """
            WITH d AS (
              SELECT source,
                     CASE WHEN n_chars >= 800 THEN 1 ELSE 0 END AS a,
                     CASE WHEN n_chars
                          + ((instr('0123456789abcdef', substring(
                                md5('fa:' || CAST(doc_id AS VARCHAR)),
                                1, 1)) - 1) * 16
                             + (instr('0123456789abcdef', substring(
                                md5('fa:' || CAST(doc_id AS VARCHAR)),
                                2, 1)) - 1) - 127) * 8 >= 800
                          THEN 1 ELSE 0 END AS b
              FROM documents
            ),
            cnt AS (
              SELECT source, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(a * b) AS BIGINT) AS n11,
                     CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
                     CAST(sum((1 - a) * b) AS BIGINT) AS n01,
                     CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
              FROM d GROUP BY source
            ),
            k AS (
              SELECT *,
                     (n11 + n00) / CAST(n AS DOUBLE) AS po,
                     ((n11 + n10) * (n11 + n01)
                      + (n01 + n00) * (n10 + n00))
                       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe
              FROM cnt
            )
            SELECT source, n,
                   floor(po * 1e6 + 0.5) / 1e6 AS p_o6,
                   floor(pe * 1e6 + 0.5) / 1e6 AS p_e6,
                   CASE WHEN pe < 1.0
                        THEN floor((po - pe) / (1.0 - pe) * 1e6 + 0.5)
                             / 1e6
                        ELSE 0.0 END AS kappa6
            FROM k
        """,
        "url_survival": f"""
            WITH obs AS (
              SELECT 'host-' || (doc_id % 20) || '.test' AS host,
                     least(1 + ({_hexdig_sql("'km:' || CAST(doc_id AS VARCHAR)", 1)} * 16
                                + {_hexdig_sql("'km:' || CAST(doc_id AS VARCHAR)", 2)}) % 12,
                           8) AS t,
                     CASE WHEN 1 + ({_hexdig_sql("'km:' || CAST(doc_id AS VARCHAR)", 1)} * 16
                                    + {_hexdig_sql("'km:' || CAST(doc_id AS VARCHAR)", 2)}) % 12
                               <= 8 THEN 1 ELSE 0 END AS ev
              FROM documents
            ),
            per_t AS (
              SELECT host, CAST(t AS BIGINT) AS t,
                     CAST(sum(ev) AS BIGINT) AS d,
                     CAST(sum(1 - ev) AS BIGINT) AS c,
                     CAST(count(*) AS BIGINT) AS leaving
              FROM obs GROUP BY host, t
            ),
            risk AS (
              SELECT *, CAST(sum(leaving) OVER (
                       PARTITION BY host ORDER BY t DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS BIGINT) AS n_risk
              FROM per_t
            ),
            terms AS (
              SELECT *,
                     CASE WHEN d > 0 AND d < n_risk
                          THEN CAST(floor(ln(1.0 - CAST(d AS DOUBLE)
                                              / n_risk) * 1e9 + 0.5)
                                    AS DOUBLE) / 1e9
                          ELSE 0.0 END AS lnt
              FROM risk
            ),
            curve AS (
              SELECT *,
                     CAST(sum(CAST(lnt AS DECIMAL(28, 9))) OVER (
                       PARTITION BY host ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS DOUBLE) AS lnS,
                     max(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER (
                       PARTITION BY host ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS dead
              FROM terms
            )
            SELECT host, t, n_risk, d AS n_events, c AS n_censored,
                   CASE WHEN dead = 1 THEN 0.0
                        ELSE floor(exp(lnS) * 1e6 + 0.5) / 1e6
                   END AS survival6
            FROM curve WHERE d > 0
        """,
        "frontier_schedule": f"""
            WITH f AS ({frontier})
            SELECT host, doc_id, priority, depth, sched_rank FROM (
              SELECT *, ROW_NUMBER() OVER (
                PARTITION BY host ORDER BY priority, depth, discovery_seq
              ) AS sched_rank FROM f
            ) WHERE sched_rank <= 4
        """,
        "rank_drift": "WITH " + _link_rank_sql(n_iter=3, where="WHERE doc_id % 2 = 0", prefix="a_", body_only=True).lstrip()
        + "," + _link_rank_sql(n_iter=3, where="WHERE doc_id % 2 = 1", prefix="b_", body_only=True)
        + """
            SELECT coalesce(a.host_id, b.host_id) AS host_id,
                   coalesce(a.rank, 0.0) AS rank_a,
                   coalesce(b.rank, 0.0) AS rank_b,
                   round(coalesce(b.rank, 0.0) - coalesce(a.rank, 0.0), 6) AS delta
            FROM a_out a FULL OUTER JOIN b_out b ON a.host_id = b.host_id
        """,
        "host_link_rank": _link_rank_sql(n_iter=3),
        "spam_mass": "WITH "
        + _link_rank_sql(n_iter=3, prefix="p_", body_only=True).lstrip()
        + ","
        + _trust_rank_sql(n_iter=3, prefix="t_")
        + """,
            psum AS (
              SELECT floor(sum(rank) * 1000000000.0 + 0.5) / 1000000000.0
                       AS p_total
              FROM p_r3
            ),
            tsum AS (
              SELECT floor(sum(trust) * 1000000000.0 + 0.5) / 1000000000.0
                       AS t_total
              FROM t_t3
            )
            SELECT p.node AS host_id,
                   floor(p.rank * 1000000.0 + 0.5) / 1000000.0 AS rank,
                   floor(t.trust * 1000000.0 + 0.5) / 1000000.0 AS trust,
                   floor((p.rank
                          - floor(t.trust * ps.p_total / ts.t_total
                                  * 1000000000.0 + 0.5) / 1000000000.0)
                         / p.rank * 1000000.0 + 0.5) / 1000000.0 AS spam_mass
            FROM p_r3 p JOIN t_t3 t ON p.node = t.node
            CROSS JOIN psum ps CROSS JOIN tsum ts
        """,
        "opic_priority": _opic_sql(n_iter=3),
        "hrw_fetcher_assign": """
            WITH hosts AS (
              SELECT DISTINCT doc_id % 500 AS host_id FROM documents
            )
            SELECT host_id,
                   CAST(arg_max(f, md5('hrw:' || CAST(host_id AS varchar)
                                       || ':' || CAST(f AS varchar))) AS INT)
                     AS fetcher_id
            FROM hosts CROSS JOIN range(0, 32) t(f)
            GROUP BY host_id
        """,
        "fetcher_load_forecast": f"""
            WITH f AS ({_FRONTIER_SQL}),
            per_host AS (
              SELECT host, count(*) AS n_pending FROM f GROUP BY host
            ),
            assigned AS (
              SELECT host, n_pending,
                     CAST(arg_max(w, md5('hrw:' || host
                                         || ':' || CAST(w AS varchar)))
                       AS INT) AS fetcher_id
              FROM per_host CROSS JOIN range(0, 8) t(w)
              GROUP BY host, n_pending
            ),
            per_fetcher AS (
              SELECT fetcher_id, count(*) AS n_hosts,
                     CAST(sum(n_pending) AS BIGINT) AS n_urls,
                     CAST(max((n_pending + 3) // 4) AS BIGINT)
                       AS critical_rounds
              FROM assigned GROUP BY fetcher_id
            ),
            tot AS (SELECT CAST(sum(n_urls) AS BIGINT) AS tot_urls
                    FROM per_fetcher)
            SELECT fetcher_id, n_hosts, n_urls, critical_rounds,
                   floor(CAST(n_urls AS DOUBLE) / tot_urls
                         * 1000000.0 + 0.5) / 1000000.0 AS load_share
            FROM per_fetcher CROSS JOIN tot
        """,
        "ring_vs_hrw_balance": """
            WITH hosts AS (
              SELECT DISTINCT doc_id % 500 AS host_id FROM documents
            ),
            ring AS (
              SELECT md5('ring:w' || lpad(CAST(w AS varchar), 2, '0')
                         || ':' || CAST(v AS varchar)) AS pos,
                     'w' || lpad(CAST(w AS varchar), 2, '0') AS wk
              FROM range(0, 16) a(w) CROSS JOIN range(0, 8) b(v)
            ),
            kh AS (
              SELECT host_id,
                     md5('key:' || CAST(host_id AS varchar)) AS khash
              FROM hosts
            ),
            ras AS (
              SELECT host_id,
                     coalesce(
                       arg_min(wk, pos) FILTER (WHERE pos >= khash),
                       arg_min(wk, pos)) AS worker
              FROM kh CROSS JOIN ring GROUP BY host_id
            ),
            has AS (
              SELECT host_id,
                     'w' || lpad(CAST(arg_max(f,
                        md5('hrw:' || CAST(host_id AS varchar)
                            || ':' || CAST(f AS varchar))) AS varchar),
                        2, '0') AS worker
              FROM hosts CROSS JOIN range(0, 16) t(f) GROUP BY host_id
            ),
            rc AS (SELECT worker, count(*) AS n_ring FROM ras GROUP BY worker),
            hc AS (SELECT worker, count(*) AS n_hrw FROM has GROUP BY worker)
            SELECT coalesce(rc.worker, hc.worker) AS worker,
                   coalesce(n_ring, 0) AS n_ring,
                   coalesce(n_hrw, 0) AS n_hrw
            FROM rc FULL JOIN hc ON rc.worker = hc.worker
        """,
        "hrw_rebalance": """
            WITH hosts AS (
              SELECT DISTINCT doc_id % 500 AS host_id FROM documents
            ),
            s32 AS (
              SELECT host_id,
                     CAST(arg_max(f, md5('hrw:' || CAST(host_id AS varchar)
                                         || ':' || CAST(f AS varchar))) AS INT)
                       AS before_f
              FROM hosts CROSS JOIN range(0, 32) t(f) GROUP BY host_id
            ),
            s31 AS (
              SELECT host_id,
                     CAST(arg_max(f, md5('hrw:' || CAST(host_id AS varchar)
                                         || ':' || CAST(f AS varchar))) AS INT)
                       AS after_f
              FROM hosts CROSS JOIN range(0, 31) t(f) GROUP BY host_id
            )
            SELECT before_f AS fetcher_id,
                   count(*) AS n_hosts,
                   CAST(sum(CASE WHEN before_f != after_f THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_moved
            FROM s32 JOIN s31 USING (host_id)
            GROUP BY before_f
        """,
        "dataset_split": f"""
            WITH b AS (
              SELECT n_chars,
                CASE WHEN (16 * {_hexdig_sql("cast(doc_id AS varchar)", 1)}
                           + {_hexdig_sql("cast(doc_id AS varchar)", 2)}) % 100 < 80
                     THEN 'train'
                     WHEN (16 * {_hexdig_sql("cast(doc_id AS varchar)", 1)}
                           + {_hexdig_sql("cast(doc_id AS varchar)", 2)}) % 100 < 90
                     THEN 'val' ELSE 'test' END AS split
              FROM documents
            )
            SELECT split, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS n_chars_total
            FROM b GROUP BY split
        """,
        "host_reciprocity": f"""
            WITH edges AS (
              SELECT DISTINCT doc_id % 20 AS src,
                     (16 * {_hexdig_sql("cast(doc_id AS varchar)", 6)}
                      + {_hexdig_sql("cast(doc_id AS varchar)", 7)}) % 20 AS dst
              FROM documents
              WHERE doc_id % 20 != (16 * {_hexdig_sql("cast(doc_id AS varchar)", 6)}
                                    + {_hexdig_sql("cast(doc_id AS varchar)", 7)}) % 20
            ),
            recip AS (
              SELECT e.src, e.dst FROM edges e
              WHERE EXISTS (SELECT 1 FROM edges r
                            WHERE r.src = e.dst AND r.dst = e.src)
            )
            SELECT (SELECT count(*) FROM edges) AS n_edges,
                   (SELECT count(*) FROM recip) AS n_reciprocal,
                   round((SELECT count(*) FROM recip) * 1.0
                         / (SELECT count(*) FROM edges), 6) AS reciprocity
        """,
        "host_clustering_coeff": f"""
            WITH raw AS (
              SELECT doc_id % 20 AS u,
                     (16 * {_hexdig_sql("cast(doc_id AS varchar)", 6)}
                      + {_hexdig_sql("cast(doc_id AS varchar)", 7)}) % 20 AS v
              FROM documents
            ),
            edges AS (
              SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
              FROM raw WHERE u != v
            ),
            deg AS (
              SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
                SELECT a AS n FROM edges UNION ALL SELECT b FROM edges
              ) GROUP BY n
            ),
            tri AS (
              SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM edges e1
              JOIN edges e2 ON e1.b = e2.a
              JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
            ),
            tc AS (
              SELECT n, CAST(count(*) AS BIGINT) AS t FROM (
                SELECT x AS n FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri
              ) GROUP BY n
            ),
            per AS (
              SELECT deg.n, deg.d,
                     CAST(coalesce(tc.t, 0) AS BIGINT) AS t,
                     CASE WHEN deg.d >= 2
                          THEN CAST(2 * coalesce(tc.t, 0) AS DOUBLE)
                               / (deg.d * (deg.d - 1))
                          ELSE CAST(0.0 AS DOUBLE) END AS lcc
              FROM deg LEFT JOIN tc ON tc.n = deg.n
            ),
            m AS (
              SELECT CAST(floor(
                       CAST(sum(CAST(floor(lcc * 1e9 + 0.5)
                                     AS DECIMAL(28, 9))) AS DOUBLE)
                       / 1e9 / count(*) * 1e6 + 0.5) AS DOUBLE) / 1e6
                       AS mean_lcc6
              FROM per
            )
            SELECT n AS host_id, d AS degree, t AS n_triangles,
                   CAST(floor(lcc * 1e6 + 0.5) AS DOUBLE) / 1e6 AS lcc6,
                   (SELECT mean_lcc6 FROM m) AS mean_lcc6
            FROM per
        """,
        "host_triangles": f"""
            WITH raw AS (
              SELECT doc_id % 20 AS u,
                     (16 * {_hexdig_sql("cast(doc_id AS varchar)", 6)}
                      + {_hexdig_sql("cast(doc_id AS varchar)", 7)}) % 20 AS v
              FROM documents
            ),
            edges AS (
              SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
              FROM raw WHERE u != v
            ),
            tri AS (
              SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM edges e1
              JOIN edges e2 ON e1.b = e2.a
              JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
            )
            SELECT count(*) AS n_triangles,
                   count(DISTINCT x) AS n_apex_hosts
            FROM tri
        """,
        "depth_histogram": f"""
            WITH f AS ({frontier}),
            hist AS (SELECT depth, count(*) AS n_urls FROM f GROUP BY depth),
            t AS (SELECT CAST(sum(n_urls) AS DOUBLE) AS total FROM hist)
            SELECT depth, n_urls,
                   round(sum(n_urls) OVER (ORDER BY depth
                         ROWS UNBOUNDED PRECEDING) / total, 6) AS cum_share
            FROM hist CROSS JOIN t
        """,
        "recrawl_schedule": f"""
            WITH f AS ({frontier}),
            planned AS (
              SELECT host, doc_id,
                TIMESTAMP '2026-01-01 00:00:00'
                  + to_hours(doc_id % 72) AS last_fetch,
                CAST({_hexdig_sql("cast(doc_id AS varchar)", 8)} % 3 AS INTEGER)
                  AS failures,
                ([6, 24, 168])[CAST({_hexdig_sql("cast(doc_id AS varchar)", 9)} % 3
                               AS INTEGER) + 1] AS interval_h
              FROM f
            ),
            nf AS (
              SELECT host,
                last_fetch + to_hours(interval_h * (1 << failures)) AS next_fetch
              FROM planned
            )
            SELECT host, count(*) AS n_urls,
                   CAST(sum(CASE WHEN next_fetch <= TIMESTAMP '2026-01-04 00:00:00'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_due,
                   min(next_fetch) AS next_due_ts
            FROM nf GROUP BY host
        """,
        "url_template_stats": f"""
            WITH urls AS (
              SELECT 'host-' || (doc_id % 20) AS host,
                     CASE {_hexdig_sql("cast(doc_id AS varchar)", 6)} % 3
                       WHEN 0 THEN '/cat-' || ({_hexdig_sql("cast(doc_id AS varchar)", 7)} % 4)
                                   || '/item/' || doc_id
                       WHEN 1 THEN '/page/' || doc_id || '/rev/'
                                   || ({_hexdig_sql("cast(doc_id AS varchar)", 7)} % 9)
                       ELSE '/static/img' || doc_id || '.png'
                     END AS path
              FROM documents
            )
            SELECT regexp_replace(path, '[0-9]+', '{{n}}', 'g') AS template,
                   count(*) AS n_urls, count(DISTINCT host) AS n_hosts
            FROM urls GROUP BY template
        """,
        "host_degree_histogram": f"""
            WITH edges AS (
              SELECT doc_id % 20 AS src,
                     (16 * {_hexdig_sql("cast(doc_id AS varchar)", 6)}
                      + {_hexdig_sql("cast(doc_id AS varchar)", 7)}) % 20 AS dst
              FROM documents
              WHERE doc_id % 20 != (16 * {_hexdig_sql("cast(doc_id AS varchar)", 6)}
                                    + {_hexdig_sql("cast(doc_id AS varchar)", 7)}) % 20
            ),
            degs AS (
              SELECT src AS host_id, count(*) AS degree, 'out' AS direction
              FROM edges GROUP BY src
              UNION ALL
              SELECT dst AS host_id, count(*) AS degree, 'in' AS direction
              FROM edges GROUP BY dst
            )
            SELECT direction,
                   CAST(length(bin(degree)) - 1 AS INTEGER) AS bucket,
                   count(*) AS n_hosts
            FROM degs GROUP BY direction, bucket
        """,
        "urlseen_antijoin": f"""
            WITH f AS ({frontier}),
            cand AS (SELECT *, md5(url) AS url_md5 FROM f),
            seen AS (SELECT url_md5 FROM cand WHERE doc_id % 3 = 0)
            SELECT doc_id, url, url_md5 FROM cand c
            WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.url_md5 = c.url_md5)
        """,
        "urlseen_cuckoo": f"""
            WITH f AS ({frontier})
            SELECT doc_id, url AS url_canon FROM f c
            WHERE NOT EXISTS (
              SELECT 1 FROM f s WHERE s.doc_id % 3 = 0 AND s.url = c.url
            )
        """,
        "drain_forecast": f"""
            WITH f AS ({frontier}),
            per AS (SELECT host, count(*) AS n_pending FROM f GROUP BY host)
            SELECT host, n_pending, (n_pending + 3) // 4 AS rounds_to_drain
            FROM per
        """,
        "resolve_links": _RESOLVE_LINKS_SQL,
        "robots_sitemaps": r"""
            WITH hosts AS (
              SELECT DISTINCT doc_id % 20 AS host_id FROM documents
            ),
            blobs AS (
              SELECT host_id,
                     'User-agent: *' || chr(10) || 'Disallow: /private'
                     || chr(10) || 'Sitemap: http://host-'
                     || CAST(host_id AS varchar) || '.test/sitemap-0.xml'
                     || chr(10) || 'Crawl-delay: 2'
                     || CASE WHEN host_id % 2 = 0
                          THEN chr(10) || '  sitemap: http://host-'
                               || CAST(host_id AS varchar)
                               || '.test/sitemap-1.xml'
                          ELSE '' END AS txt
              FROM hosts
            )
            SELECT host_id, u.sitemap_url
            FROM blobs,
                 unnest(regexp_extract_all(txt,
                        '(?im)^\s*sitemap:\s*(\S+)', 1)) AS u(sitemap_url)
        """,
        "robots_gate": f"""
            WITH f AS ({frontier}),
            robots AS (
              SELECT source,
                     substr(source, length(source), 1) IN ('1','3') AS denied,
                     CAST(length(source) % 3 + 1 AS DOUBLE) AS crawl_delay_s
              FROM (SELECT DISTINCT source FROM documents)
            )
            SELECT f.doc_id, d.source, r.crawl_delay_s,
                   CAST(floor(16.0 / r.crawl_delay_s) AS BIGINT) AS budget
            FROM f
            JOIN documents d ON f.doc_id = d.doc_id
            JOIN robots r ON d.source = r.source
            WHERE NOT r.denied
        """,
        "surt_index": """
            WITH u0 AS (
              SELECT doc_id,
                'http://'
                || CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END
                || 'Host-' || CAST(doc_id % 20 AS VARCHAR) || '.Test'
                || CASE WHEN doc_id % 4 = 1 THEN ':8080' ELSE '' END
                || '/Doc/' || CAST(doc_id AS VARCHAR)
                || CASE WHEN doc_id % 2 = 0 THEN '?b=2&a=1' ELSE '' END AS url_raw
              FROM documents
            ),
            parts AS (
              SELECT doc_id, url_raw, lower(trim(url_raw)) AS u FROM u0
            ),
            px AS (
              SELECT doc_id, url_raw,
                regexp_replace(regexp_replace(
                  regexp_extract(u, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1),
                  ':\\d+$', ''), '^www\\.', '') AS host,
                regexp_extract(u, '^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS path,
                regexp_extract(u, '\\?([^#]*)', 1) AS q
              FROM parts
            )
            SELECT doc_id, url_raw,
                   array_to_string(list_reverse(string_split(host, '.')), ',')
                   || ')'
                   || CASE WHEN path = '' THEN '/' ELSE path END
                   || CASE WHEN q = '' THEN ''
                      ELSE '?' || array_to_string(list_sort(string_split(q, '&')), '&')
                      END AS surt
            FROM px
        """,
        "canonicalize": f"""
            WITH f AS ({frontier}),
            messy AS (
              SELECT doc_id,
                CASE
                  WHEN doc_id % 4 = 0 THEN upper(url) || '#FRAG'
                  WHEN doc_id % 4 = 1 THEN regexp_replace(url, '\\.test/', '.test:80/')
                  WHEN doc_id % 4 = 2 THEN regexp_replace(url, '/doc/', '/./doc/')
                  ELSE url END AS url_raw
              FROM f
            )
            SELECT doc_id, url_raw,
              regexp_replace(regexp_replace(regexp_replace(
                lower(trim(url_raw)), '#.*$', ''), ':80/', '/'), '/\\./', '/')
                AS url_canon,
              md5(regexp_replace(regexp_replace(regexp_replace(
                lower(trim(url_raw)), '#.*$', ''), ':80/', '/'), '/\\./', '/'))
                AS canon_md5
            FROM messy
        """,
        "latest_event_per_user": """
            SELECT user_id, event_id, event_type, round(value, 4) AS value FROM (
              SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "top1_event_per_type": """
            SELECT event_type, event_id, round(value, 4) AS value FROM (
              SELECT *, ROW_NUMBER() OVER (
                PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "event_type_stats": """
            SELECT event_type,
                   count(*) AS n,
                   round(avg(value), 4) AS avg_value,
                   round(sum(value), 2) AS total_value,
                   round(count(*) * 100.0 / (SELECT count(*) FROM events), 4)
                     AS pct_of_all
            FROM events GROUP BY event_type
        """,
        "zipf_fit": """
            WITH t AS (
              SELECT doc_id, tok FROM (
                SELECT doc_id,
                  unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
                FROM documents
              ) WHERE length(tok) > 0
            ),
            v AS (
              SELECT tok, count(*) AS n_occ FROM t GROUP BY tok
              ORDER BY n_occ DESC, tok ASC LIMIT 256
            ),
            r AS (
              SELECT row_number() OVER (ORDER BY n_occ DESC, tok ASC) AS rank,
                     n_occ
              FROM v
            ),
            p AS (
              SELECT CAST(round(ln(rank), 9) AS DECIMAL(12,9)) AS x,
                     CAST(round(ln(n_occ), 9) AS DECIMAL(12,9)) AS y
              FROM r
            ),
            s AS (
              SELECT count(*) AS k,
                     CAST(sum(x) AS DOUBLE) AS sx,
                     CAST(sum(y) AS DOUBLE) AS sy,
                     CAST(sum(x * y) AS DOUBLE) AS sxy,
                     CAST(sum(x * x) AS DOUBLE) AS sxx
              FROM p
            )
            SELECT k AS n_points,
                   round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS slope,
                   round((sy - ((k * sxy - sx * sy) / (k * sxx - sx * sx)) * sx)
                         / k, 6) AS intercept
            FROM s
        """,
        "discovery_curve": """
            WITH active AS (
              SELECT date_trunc('hour', ts) AS hour,
                     count(DISTINCT user_id) AS n_active
              FROM events GROUP BY 1
            ),
            fs AS (
              SELECT user_id, min(date_trunc('hour', ts)) AS hour
              FROM events GROUP BY user_id
            ),
            nw AS (SELECT hour, count(*) AS n_new FROM fs GROUP BY hour)
            SELECT a.hour, a.n_active,
                   CAST(coalesce(nw.n_new, 0) AS BIGINT) AS n_new,
                   CAST(sum(coalesce(nw.n_new, 0)) OVER (
                     ORDER BY a.hour
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cum_seen,
                   round(coalesce(nw.n_new, 0) * 1.0 / a.n_active, 6)
                     AS novelty_rate
            FROM active a LEFT JOIN nw ON a.hour = nw.hour
        """,
        "char_entropy_gate": """
            WITH d AS (
              SELECT doc_id, lower(trim(text)) AS t,
                     CAST(length(lower(trim(text))) AS DOUBLE) AS len
              FROM documents WHERE length(lower(trim(text))) >= 1
            ),
            c AS (
              SELECT doc_id, len,
                     CAST(length(t) - length(replace(t, ' ', '')) AS DOUBLE) AS _c0,
                     CAST(length(t) - length(replace(t, 'a', '')) AS DOUBLE) AS _c1,
                     CAST(length(t) - length(replace(t, 'b', '')) AS DOUBLE) AS _c2,
                     CAST(length(t) - length(replace(t, 'c', '')) AS DOUBLE) AS _c3,
                     CAST(length(t) - length(replace(t, 'd', '')) AS DOUBLE) AS _c4,
                     CAST(length(t) - length(replace(t, 'e', '')) AS DOUBLE) AS _c5,
                     CAST(length(t) - length(replace(t, 'f', '')) AS DOUBLE) AS _c6,
                     CAST(length(t) - length(replace(t, 'g', '')) AS DOUBLE) AS _c7,
                     CAST(length(t) - length(replace(t, 'h', '')) AS DOUBLE) AS _c8,
                     CAST(length(t) - length(replace(t, 'i', '')) AS DOUBLE) AS _c9,
                     CAST(length(t) - length(replace(t, 'j', '')) AS DOUBLE) AS _c10,
                     CAST(length(t) - length(replace(t, 'k', '')) AS DOUBLE) AS _c11,
                     CAST(length(t) - length(replace(t, 'l', '')) AS DOUBLE) AS _c12,
                     CAST(length(t) - length(replace(t, 'm', '')) AS DOUBLE) AS _c13,
                     CAST(length(t) - length(replace(t, 'n', '')) AS DOUBLE) AS _c14,
                     CAST(length(t) - length(replace(t, 'o', '')) AS DOUBLE) AS _c15,
                     CAST(length(t) - length(replace(t, 'p', '')) AS DOUBLE) AS _c16,
                     CAST(length(t) - length(replace(t, 'q', '')) AS DOUBLE) AS _c17,
                     CAST(length(t) - length(replace(t, 'r', '')) AS DOUBLE) AS _c18,
                     CAST(length(t) - length(replace(t, 's', '')) AS DOUBLE) AS _c19,
                     CAST(length(t) - length(replace(t, 't', '')) AS DOUBLE) AS _c20,
                     CAST(length(t) - length(replace(t, 'u', '')) AS DOUBLE) AS _c21,
                     CAST(length(t) - length(replace(t, 'v', '')) AS DOUBLE) AS _c22,
                     CAST(length(t) - length(replace(t, 'w', '')) AS DOUBLE) AS _c23,
                     CAST(length(t) - length(replace(t, 'x', '')) AS DOUBLE) AS _c24,
                     CAST(length(t) - length(replace(t, 'y', '')) AS DOUBLE) AS _c25,
                     CAST(length(t) - length(replace(t, 'z', '')) AS DOUBLE) AS _c26
              FROM d
            ),
            c2 AS (
              SELECT *, len - (_c0 + _c1 + _c2 + _c3 + _c4 + _c5 + _c6 + _c7 + _c8 + _c9 + _c10 + _c11 + _c12 + _c13 + _c14 + _c15 + _c16 + _c17 + _c18 + _c19 + _c20 + _c21 + _c22 + _c23 + _c24 + _c25 + _c26) AS _co FROM c
            ),
            s AS (
              SELECT doc_id,
                     -(CASE WHEN _c0 > 0 THEN CAST(floor((_c0 / len) * ln(_c0 / len) * 1e9 + 0.5) AS DOUBLE) / 1e9 ELSE CAST(0.0 AS DOUBLE) END
                       + CASE WHEN _c1 > 0 THEN CAST(floor((_c1 / len) * ln(_c1 / len) * 1e9 + 0.5) AS DOUBLE) / 1e9 ELSE CAST(0.0 AS DOUBLE) END
                       + CASE WHEN _c2 > 0 THEN CAST(floor((_c2 / len) * ln(_c2 / len) * 1e9 + 0.5) AS DOUBLE) / 1e9 ELSE CAST(0.0 AS DOUBLE) END
                       + CASE WHEN _c3 > 0 THEN CAST(floor((_c3 / len) * ln(_c3 / len) * 1e9 + 0.5) AS DOUBLE) / 1e9 ELSE CAST(0.0 AS DOUBLE) END
                       + CASE WHEN _c4 > 0 THEN CAST(floor((_c4 / len) * ln(_c4 / len) * 1e9 + 0.5) AS DOUBLE) / 1e9 ELSE CAST(0.0 AS DOUBLE) END
                       + CASE WHEN _c5 > 0 THEN CAST(floor((_c5 / len) * ln(_c5 / len) * 1e9 + 0.5) AS DOUBLE) / 1e9 ELSE CAST(0.0 AS DOUBLE) END
                       + CASE WHEN _c6 > 0 THEN CAST(floor((_c6 / len) * ln(_c6 / len) * 1e9 + 0.5) AS DOUBLE) / 1e9 ELSE CAST(0.0 AS DOUBLE) END
                       + CASE WHEN _c7 > 0 THEN CAST(floor((_c7 / len) * ln(_c7 / len) * 1e9 + 0.5) AS DOUBLE) / 1e9 ELSE CAST(0.0 AS DOUBLE) END
                       + CASE WHEN _c8 > 0 THEN CAST(floor((_c8 / len) * ln(_c8 / len) * 1e9 + 0.5) AS DOUBLE) / 1e9 ELSE CAST(0.0 AS DOUBLE) END
                       + CASE WHEN _c9 > 0 THEN CAST(floor((_c9 / len) * ln(_c9 / len) * 1e9 + 0.5) AS DOUBLE) / 1e9 ELSE CAST(0.0 AS DOUBLE) END
                       + CASE WHEN _c10 > 0 THEN CAST(floor((_c10 / len) * ln(_c10 / len) * 1e9 + 0.5) AS DOUBLE) / 1e9 ELSE CAST(0.0 AS DOUBLE) END
                       + CASE WHEN _c11 > 0 THEN CAST(floor((_c11 / len) * ln(_c11 / len) * 1e9 + 0.5) AS DOUBLE) / 1e9 ELSE CAST(0.0 AS DOUBLE) END
                       + CASE WHEN _c12 > 0 THEN CAST(floor((_c12 / len) * ln(_c12 / len) * 1e9 + 0.5) AS DOUBLE) / 1e9 ELSE CAST(0.0 AS DOUBLE) END
                       + CASE WHEN _c13 > 0 THEN CAST(floor((_c13 / len) * ln(_c13 / len) * 1e9 + 0.5) AS DOUBLE) / 1e9 ELSE CAST(0.0 AS DOUBLE) END
                       + CASE WHEN _c14 > 0 THEN CAST(floor((_c14 / len) * ln(_c14 / len) * 1e9 + 0.5) AS DOUBLE) / 1e9 ELSE CAST(0.0 AS DOUBLE) END
                       + CASE WHEN _c15 > 0 THEN CAST(floor((_c15 / len) * ln(_c15 / len) * 1e9 + 0.5) AS DOUBLE) / 1e9 ELSE CAST(0.0 AS DOUBLE) END
                       + CASE WHEN _c16 > 0 THEN CAST(floor((_c16 / len) * ln(_c16 / len) * 1e9 + 0.5) AS DOUBLE) / 1e9 ELSE CAST(0.0 AS DOUBLE) END
                       + CASE WHEN _c17 > 0 THEN CAST(floor((_c17 / len) * ln(_c17 / len) * 1e9 + 0.5) AS DOUBLE) / 1e9 ELSE CAST(0.0 AS DOUBLE) END
                       + CASE WHEN _c18 > 0 THEN CAST(floor((_c18 / len) * ln(_c18 / len) * 1e9 + 0.5) AS DOUBLE) / 1e9 ELSE CAST(0.0 AS DOUBLE) END
                       + CASE WHEN _c19 > 0 THEN CAST(floor((_c19 / len) * ln(_c19 / len) * 1e9 + 0.5) AS DOUBLE) / 1e9 ELSE CAST(0.0 AS DOUBLE) END
                       + CASE WHEN _c20 > 0 THEN CAST(floor((_c20 / len) * ln(_c20 / len) * 1e9 + 0.5) AS DOUBLE) / 1e9 ELSE CAST(0.0 AS DOUBLE) END
                       + CASE WHEN _c21 > 0 THEN CAST(floor((_c21 / len) * ln(_c21 / len) * 1e9 + 0.5) AS DOUBLE) / 1e9 ELSE CAST(0.0 AS DOUBLE) END
                       + CASE WHEN _c22 > 0 THEN CAST(floor((_c22 / len) * ln(_c22 / len) * 1e9 + 0.5) AS DOUBLE) / 1e9 ELSE CAST(0.0 AS DOUBLE) END
                       + CASE WHEN _c23 > 0 THEN CAST(floor((_c23 / len) * ln(_c23 / len) * 1e9 + 0.5) AS DOUBLE) / 1e9 ELSE CAST(0.0 AS DOUBLE) END
                       + CASE WHEN _c24 > 0 THEN CAST(floor((_c24 / len) * ln(_c24 / len) * 1e9 + 0.5) AS DOUBLE) / 1e9 ELSE CAST(0.0 AS DOUBLE) END
                       + CASE WHEN _c25 > 0 THEN CAST(floor((_c25 / len) * ln(_c25 / len) * 1e9 + 0.5) AS DOUBLE) / 1e9 ELSE CAST(0.0 AS DOUBLE) END
                       + CASE WHEN _c26 > 0 THEN CAST(floor((_c26 / len) * ln(_c26 / len) * 1e9 + 0.5) AS DOUBLE) / 1e9 ELSE CAST(0.0 AS DOUBLE) END
                       + CASE WHEN _co > 0 THEN CAST(floor((_co / len) * ln(_co / len) * 1e9 + 0.5) AS DOUBLE) / 1e9 ELSE CAST(0.0 AS DOUBLE) END) AS ent
              FROM c2
            )
            SELECT doc_id, round(ent, 6) AS entropy_nats,
                   ent < 2.0 AS low_entropy
            FROM s
        """,
        "shard_checksums": """
            WITH t AS (
              SELECT doc_id,
                CAST(len(list_filter(
                  string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
                  x -> len(x) > 0)) AS BIGINT) AS n_tokens,
                doc_id % 32 AS bucket
              FROM documents
            ),
            r AS (
              SELECT *, sum(n_tokens) OVER (
                PARTITION BY bucket ORDER BY n_tokens DESC, doc_id
              ) AS cum FROM t
            )
            SELECT bucket,
                   CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS bin_id,
                   count(*) AS n_docs,
                   md5(array_to_string(list_sort(list(doc_id)), ','))
                     AS checksum
            FROM r GROUP BY bucket, bin_id
        """,
        "event_order_audit": """
            WITH d AS (
              SELECT event_type,
                     greatest(0, CAST(date_diff('second', ts,
                       max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     ) AS BIGINT)) AS disorder_s
              FROM events
            )
            SELECT event_type, count(*) AS n,
                   CAST(sum(CASE WHEN disorder_s > 600 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_late,
                   max(disorder_s) AS max_disorder_s,
                   round(sum(CASE WHEN disorder_s > 600 THEN 1 ELSE 0 END) * 1.0
                         / count(*), 6) AS late_rate
            FROM d GROUP BY event_type
        """,
        "host_wilson_health": """
            WITH per_host AS (
              SELECT 'host-' || CAST(doc_id % 20 AS VARCHAR) AS host,
                     CAST(sum(CASE WHEN substr(md5(text), 32, 1)
                                > CAST(doc_id % 3 AS VARCHAR)
                          THEN 1 ELSE 0 END) AS BIGINT) AS s,
                     count(*) AS n
              FROM documents GROUP BY 1
            )
            SELECT host, s, n,
                   round(s * 1.0 / n, 6) AS success_rate,
                   round(
                     (s * 1.0 / n + 1.96 * 1.96 / (2 * n)
                      - 1.96 * sqrt(((s * 1.0 / n) * (1 - s * 1.0 / n)
                                     + 1.96 * 1.96 / (4 * n)) / n))
                     / (1 + 1.96 * 1.96 / n), 6) AS wilson_lb
            FROM per_host
        """,
        "fetch_rate_ewma": """
            WITH h AS (
              SELECT date_trunc('hour', ts) AS hour, count(*) AS n
              FROM events GROUP BY 1
            )
            SELECT hour, n, ewma_scaled, ewma_scaled / 65536.0 AS ewma
            FROM (
              SELECT hour, n,
                     CAST(n * 32768
                        + coalesce(lag(n, 1) OVER w, 0) * 16384
                        + coalesce(lag(n, 2) OVER w, 0) * 8192
                        + coalesce(lag(n, 3) OVER w, 0) * 4096
                        + coalesce(lag(n, 4) OVER w, 0) * 2048
                        + coalesce(lag(n, 5) OVER w, 0) * 1024
                        + coalesce(lag(n, 6) OVER w, 0) * 512
                        + coalesce(lag(n, 7) OVER w, 0) * 256
                        + coalesce(lag(n, 8) OVER w, 0) * 128
                        + coalesce(lag(n, 9) OVER w, 0) * 64
                        + coalesce(lag(n, 10) OVER w, 0) * 32
                        + coalesce(lag(n, 11) OVER w, 0) * 16
                        + coalesce(lag(n, 12) OVER w, 0) * 8
                        + coalesce(lag(n, 13) OVER w, 0) * 4
                        + coalesce(lag(n, 14) OVER w, 0) * 2
                        + coalesce(lag(n, 15) OVER w, 0) * 1 AS BIGINT) AS ewma_scaled
              FROM h WINDOW w AS (ORDER BY hour)
            ) s
        """,
        "hourly_event_counts": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*) AS n, round(sum(value), 2) AS total_value
            FROM events GROUP BY 1, 2
        """,
        "sessionize_events": """
            WITH g AS (
              SELECT user_id, ts, event_id,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('second', lag(ts) OVER w, ts) > 1800
                     THEN 1 ELSE 0 END AS is_new
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            s AS (
              SELECT user_id,
                sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
              FROM g
            )
            SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
                   count(*) AS n_events
            FROM s GROUP BY user_id
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                     AS sum_charge,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_extendedprice), 4) AS avg_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "shipping_priority": """
            SELECT l_orderkey, o_orderdate, o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
              AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, l_orderkey ASC
            LIMIT 10
        """,
        "segment_stats": """
            SELECT c_mktsegment,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS total_price,
                   count(DISTINCT o_custkey) AS n_customers
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "nation_trade_volume": """
            SELECT supp_nation, cust_nation, l_year,
                   round(sum(volume), 2) AS revenue
            FROM (
              SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                     CAST(year(l_shipdate) AS INTEGER) AS l_year,
                     l_extendedprice * (1 - l_discount) AS volume
              FROM lineitem
              JOIN orders   ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate <  TIMESTAMP '1998-01-01'
                AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            )
            GROUP BY supp_nation, cust_nation, l_year
        """,
        "market_share": """
            SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
                   round(sum(CASE WHEN n2.n_name = 'NATION_3'
                             THEN l_extendedprice * (1 - l_discount)
                             ELSE 0.0 END)
                         / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
            FROM lineitem
            JOIN part     ON l_partkey = p_partkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region   ON n1.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE p_type = 'STANDARD' AND r_name = 'AMERICA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1998-01-01'
            GROUP BY o_year
        """,
        "nation_profit": """
            SELECT n_name AS nation,
                   CAST(year(o_orderdate) AS INTEGER) AS o_year,
                   floor(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                             - p_retailprice * l_quantity
                             AS DECIMAL(38,10))) AS DOUBLE)
                         * 100.0 + 0.5) / 100.0 AS profit
            FROM lineitem
            JOIN part     ON l_partkey = p_partkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE p_type = 'LARGE'
            GROUP BY n_name, o_year
        """,
        "small_quantity_revenue": """
            WITH part_avg AS (
              SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_floor
              FROM lineitem GROUP BY l_partkey
            )
            SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN part_avg USING (l_partkey)
            WHERE p_brand = 'Brand#1' AND l_quantity < qty_floor
        """,
        "bpe_merge_pairs": """
            WITH t AS (
              SELECT tok FROM (
                SELECT unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
                FROM documents
              ) WHERE length(tok) >= 2
            ),
            pairs AS (
              SELECT substr(tok, i.i, 2) AS pair
              FROM t, unnest(generate_series(1, length(tok) - 1)) AS i(i)
            )
            SELECT pair, count(*) AS n FROM pairs
            GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 20
        """,
        "kmv_vocab_sketch": _kmv_sql("vocab"),
        "edh_histogram": _edh_sql("hist"),
        "join_order_costs": _join_order_sql(),
        "anchor_text_index": _anchor_sql(),
        "latency_mad_outliers": _mad_sql(),
        "host_latency_trend": _theil_sen_sql(),
        "unimax_allocation": _unimax_sql(),
        "cusum_regime_shifts": _cusum_sql(),
        "fs_match_decisions": _fs_sql(),
        "fs_em_fit": _fs_em_sql(),
        "source_max_cover": _max_cover_sql(),
        "wl_host_roles": _wl_sql(),
        "host_betweenness": _betweenness_sql(),
        "merge_batch_matching": _matching_sql(),
        "url_prefix_rollup": _URL_PREFIX_SQL,
        "linkage_clusters": _linkage_sql(),
        "neyman_allocation": _NEYMAN_SQL,
        "kmeanspar_init": _kmeanspar_sql(),
        "densest_profile": _densest_sql(),
        "front_coding": _front_coding_sql(),
        "bloom_reduced_join": """
            SELECT p.p_partkey, p.p_name,
                   count(*) AS n_items,
                   sum(l.l_quantity) AS sum_qty,
                   sum(l.l_extendedprice) AS sum_price
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_size = 1
            GROUP BY p.p_partkey, p.p_name
        """,
        "ks_drift": _KS_SQL,
        "temporal_reachability": _temporal_sql(),
        "cws_jaccard_est": _cws_sql(),
        "mg_exact_heavy": _MG_EXACT_SQL,
        "span_removal": _SPAN_REMOVAL_SQL,
        "countsketch_tokens": _countsketch_sql(),
        "cc_incremental": _CC_INCREMENTAL_SQL,
        "bootstrap_mean_ci": _bootstrap_sql(),
        "typosquat_hosts": _TYPOSQUAT_SQL,
        "classifier_auc": _auc_sql(),
        "classifier_calibration": _calibration_sql(),
        "trimmed_latency": _TRIMMED_SQL,
        "chunk_windows": _chunk_sql(),
        "rrf_fusion": _rrf_sql(),
        "edh_selectivity_audit": _edh_sql("audit"),
        "kmv_set_algebra": _kmv_sql("algebra"),
        "hll_distinct": """
            WITH t AS (
              SELECT tok FROM (
                SELECT unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
                FROM documents
              ) WHERE length(tok) > 0
            ),
            hw AS (
              SELECT h % 256 AS idx, h >> 8 AS w FROM (
                SELECT CAST(concat('0x', substring(md5(tok), 1, 15)) AS BIGINT) AS h
                FROM t
              )
            ),
            reg AS (
              SELECT idx, max(CASE WHEN w = 0 THEN 53
                                   ELSE length(bin(w & -w)) END) AS rho_max
              FROM hw GROUP BY idx
            ),
            d AS (
              SELECT sum(CAST(1 AS BIGINT) << (53 - rho_max))
                     + (256 - count(*)) * (CAST(1 AS BIGINT) << 53)
                     AS denom_scaled
              FROM reg
            ),
            est AS (
              SELECT round(47072.71267120224 * pow(CAST(2 AS DOUBLE), 53)
                           / denom_scaled, 3) AS hll_estimate
              FROM d
            ),
            exact AS (SELECT count(DISTINCT tok) AS exact_distinct FROM t)
            SELECT CAST(floor(hll_estimate) AS BIGINT) AS hll_floor,
                   exact_distinct,
                   CAST(floor(abs(hll_estimate - exact_distinct)
                              / exact_distinct * 1000.0) AS BIGINT)
                     AS rel_err_permille
            FROM est CROSS JOIN exact
        """,
        "countmin_heavy_hitters": """
            WITH t AS (
              SELECT tok FROM (
                SELECT unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
                FROM documents
              ) WHERE length(tok) > 0
            ),
            cells AS (
              SELECT r.cm_row,
                     (instr('0123456789abcdef', substring(md5(concat('cm', r.cm_row, ':', tok)), 1, 1)) - 1) * 16
                   + (instr('0123456789abcdef', substring(md5(concat('cm', r.cm_row, ':', tok)), 2, 1)) - 1)
                       AS cm_col
              FROM t CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS cm_row) r
            ),
            sketch AS (
              SELECT cm_row, cm_col, count(*) AS cnt
              FROM cells GROUP BY cm_row, cm_col
            ),
            heavy AS (
              SELECT tok, count(*) AS exact_cnt FROM t
              GROUP BY tok HAVING count(*) >= 200
            ),
            probes AS (
              SELECT tok, exact_cnt, r.cm_row,
                     (instr('0123456789abcdef', substring(md5(concat('cm', r.cm_row, ':', tok)), 1, 1)) - 1) * 16
                   + (instr('0123456789abcdef', substring(md5(concat('cm', r.cm_row, ':', tok)), 2, 1)) - 1)
                       AS cm_col
              FROM heavy CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS cm_row) r
            )
            SELECT tok, exact_cnt, min(cnt) AS cm_est,
                   min(cnt) - exact_cnt AS overcount
            FROM probes JOIN sketch USING (cm_row, cm_col)
            GROUP BY tok, exact_cnt
        """,
        "min_cost_supplier": """
            WITH cost AS (
              SELECT p_partkey, p_name, l_suppkey,
                     min(l_extendedprice / l_quantity) AS unit_cost
              FROM lineitem
              JOIN part ON l_partkey = p_partkey
              WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 30
              GROUP BY p_partkey, p_name, l_suppkey
            ), best AS (
              SELECT p_partkey AS bp, min(unit_cost) AS best_cost
              FROM cost GROUP BY p_partkey
            )
            SELECT p_partkey, p_name, s_name, n_name,
                   CAST(floor(unit_cost * 10000.0) AS BIGINT) AS min_unit_cost_e4
            FROM cost
            JOIN best ON p_partkey = bp AND unit_cost = best_cost
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
        """,
        "ship_delay_priority": """
            SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30
                        THEN 'FAST'
                        WHEN date_diff('day', o_orderdate, l_shipdate) <= 90
                        THEN 'MEDIUM' ELSE 'SLOW' END AS delay_bucket,
                   sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS high_line_count,
                   sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 0 ELSE 1 END) AS low_line_count
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
            GROUP BY delay_bucket
        """,
        "supplier_part_variety": """
            WITH ps AS (
              SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
            )
            SELECT p_brand, p_type, p_size,
                   count(DISTINCT l_suppkey) AS supplier_cnt
            FROM ps
            JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
              AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
              AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                    WHERE s_acctbal < 0.0)
            GROUP BY p_brand, p_type, p_size
        """,
        "surplus_suppliers": """
            WITH red AS (
              SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
            ), avail AS (
              SELECT l_partkey, l_suppkey, sum(l_quantity) AS avail_qty
              FROM lineitem JOIN red ON l_partkey = p_partkey
              GROUP BY l_partkey, l_suppkey
            ), shipped AS (
              SELECT l_partkey AS sp, l_suppkey AS ss,
                     0.5 * sum(l_quantity) AS half_shipped
              FROM lineitem JOIN red ON l_partkey = p_partkey
              WHERE l_shipdate >= TIMESTAMP '1998-01-01'
                AND l_shipdate <  TIMESTAMP '1999-01-01'
              GROUP BY l_partkey, l_suppkey
            )
            SELECT s_suppkey, s_name, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            WHERE s_suppkey IN (
              SELECT l_suppkey FROM avail
              JOIN shipped ON l_partkey = sp AND l_suppkey = ss
              WHERE avail_qty > half_shipped
            )
        """,
        "idle_customers": """
            WITH floor_ AS (
              SELECT avg(c_acctbal) AS bal_floor FROM customer
              WHERE c_acctbal > 0.0
            )
            SELECT CAST(c_nationkey % 5 AS INTEGER) AS cntrycode,
                   count(*) AS n_cust, round(sum(c_acctbal), 2) AS total_bal
            FROM customer CROSS JOIN floor_
            WHERE c_acctbal > bal_floor
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >= TIMESTAMP '2000-01-01')
            GROUP BY cntrycode
        """,
        "local_supplier_volume": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1998-01-01'
            GROUP BY n_name
        """,
        "returned_items": """
            SELECT c_custkey, c_name, c_acctbal, n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate <  TIMESTAMP '1997-04-01'
            GROUP BY c_custkey, c_name, c_acctbal, n_name
            ORDER BY revenue DESC, c_custkey ASC
            LIMIT 20
        """,
        "json_props_stats": """
            WITH parsed AS (
              SELECT event_type,
                     cast(json_extract(props, '$.k') AS BIGINT) AS k
              FROM events
            )
            SELECT event_type, count(k) AS n_with_k, sum(k) AS sum_k,
                   round(avg(k), 6) AS avg_k,
                   min(k) AS min_k, max(k) AS max_k
            FROM parsed GROUP BY event_type
        """,
        "sliding_event_counts": """
            WITH starts AS (
              SELECT event_type,
                     unnest([to_timestamp(floor(epoch(ts) / 300) * 300),
                             to_timestamp(floor(epoch(ts) / 300) * 300
                                          - 300)]) AS win_start,
                     ts
              FROM events
            )
            SELECT win_start, event_type, count(*) AS n
            FROM starts
            WHERE ts >= win_start AND ts < win_start + INTERVAL 10 MINUTE
            GROUP BY win_start, event_type
        """,
        "event_type_pivot": """
            SELECT user_id,
              count(*) FILTER (WHERE event_type = 'click')    AS "click",
              count(*) FILTER (WHERE event_type = 'error')    AS "error",
              count(*) FILTER (WHERE event_type = 'purchase') AS "purchase",
              count(*) FILTER (WHERE event_type = 'signup')   AS "signup",
              count(*) FILTER (WHERE event_type = 'view')     AS "view"
            FROM events GROUP BY user_id
        """,
        "running_revenue": """
            WITH daily AS (
              SELECT o_orderpriority, date_trunc('day', o_orderdate) AS day,
                     round(sum(o_totalprice), 2) AS day_rev
              FROM orders GROUP BY 1, 2
            )
            SELECT o_orderpriority, day, day_rev,
                   round(sum(day_rev) OVER (
                     PARTITION BY o_orderpriority ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS cum_rev
            FROM daily
        """,
        "lm_perplexity": """
            WITH t AS (
              SELECT doc_id,
                unnest(list_filter(
                  string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
                  x -> len(x) > 0)) AS tok
              FROM documents
            ),
            uni AS (SELECT tok, count(*) AS n_uni FROM t GROUP BY tok),
            tot AS (
              SELECT CAST(sum(n_uni) AS DOUBLE) AS n_total,
                     CAST(count(*) AS DOUBLE) AS v_size
              FROM uni
            ),
            scored AS (
              SELECT doc_id,
                     CAST(round(ln((n_uni + 0.5) / (n_total + 0.5 * v_size)), 6)
                          AS DECIMAL(20,6)) AS lp6
              FROM t JOIN uni USING (tok) CROSS JOIN tot
            ),
            agg AS (
              SELECT doc_id, count(*) AS n_tok, sum(lp6) AS sum_lp
              FROM scored GROUP BY doc_id
            )
            SELECT doc_id, n_tok,
                   floor(CAST(sum_lp AS DOUBLE) / n_tok * 1000000.0 + 0.5)
                     / 1000000.0 AS avg_logprob,
                   floor(exp(-(floor(CAST(sum_lp AS DOUBLE) / n_tok
                                     * 1000000.0 + 0.5) / 1000000.0))
                         * 10000.0 + 0.5) / 10000.0 AS ppl
            FROM agg
        """,
        "ccnet_buckets": """
            WITH t AS (
              SELECT doc_id,
                unnest(list_filter(
                  string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
                  x -> len(x) > 0)) AS tok
              FROM documents
            ),
            uni AS (SELECT tok, count(*) AS n_uni FROM t GROUP BY tok),
            tot AS (
              SELECT CAST(sum(n_uni) AS DOUBLE) AS n_total,
                     CAST(count(*) AS DOUBLE) AS v_size
              FROM uni
            ),
            scored AS (
              SELECT doc_id,
                     CAST(round(ln((n_uni + 0.5) / (n_total + 0.5 * v_size)), 6)
                          AS DECIMAL(20,6)) AS lp6
              FROM t JOIN uni USING (tok) CROSS JOIN tot
            ),
            agg AS (
              SELECT doc_id, count(*) AS n_tok, sum(lp6) AS sum_lp
              FROM scored GROUP BY doc_id
            ),
            ppl AS (
              SELECT doc_id,
                     floor(exp(-(floor(CAST(sum_lp AS DOUBLE) / n_tok
                                       * 1000000.0 + 0.5) / 1000000.0))
                           * 10000.0 + 0.5) / 10000.0 AS ppl
              FROM agg
            ),
            j AS (
              SELECT p.doc_id, d.lang, p.ppl
              FROM ppl p JOIN documents d USING (doc_id)
            ),
            cuts AS (
              SELECT lang,
                     quantile_cont(ppl, CAST(1 AS DOUBLE)/3) AS t1,
                     quantile_cont(ppl, 2*(CAST(1 AS DOUBLE)/3)) AS t2
              FROM j GROUP BY lang
            )
            SELECT j.doc_id, j.lang, j.ppl,
                   CASE WHEN j.ppl <= c.t1 THEN 'head'
                        WHEN j.ppl <= c.t2 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM j JOIN cuts c USING (lang)
        """,
        "bm25_topk": """
            WITH t AS (
              SELECT doc_id,
                unnest(list_filter(
                  string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
                  x -> len(x) > 0)) AS tok
              FROM documents
            ),
            dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
            stats AS (
              SELECT avg(dl) AS avgdl, CAST(count(*) AS DOUBLE) AS n_docs
              FROM dl
            ),
            qtf AS (
              SELECT doc_id, tok, count(*) AS tf FROM t
              WHERE tok IN ('join', 'hash', 'vector', 'stream')
              GROUP BY doc_id, tok
            ),
            qdf AS (
              SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM qtf GROUP BY tok
            ),
            scored AS (
              SELECT doc_id,
                round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                      * tf * 2.2
                      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)),
                      9) AS s9
              FROM qtf JOIN qdf USING (tok) JOIN dl USING (doc_id)
                   CROSS JOIN stats
            )
            SELECT doc_id, round(sum(s9), 6) AS score,
                   count(*) AS n_terms
            FROM scored GROUP BY doc_id
            ORDER BY score DESC, doc_id ASC LIMIT 20
        """,
        "lang_confusion": """
            WITH scored AS (
              SELECT doc_id, lang,
                len(list_intersect(list_distinct(
                  string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')),
                  ['the','and','of','to','in'])) AS s_en,
                len(list_intersect(list_distinct(
                  string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')),
                  ['el','la','de','que','los'])) AS s_es,
                len(list_intersect(list_distinct(
                  string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')),
                  ['le','la','les','des','est'])) AS s_fr,
                len(list_intersect(list_distinct(
                  string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')),
                  ['der','die','das','und','ist'])) AS s_de
              FROM documents
            ),
            pred AS (
              SELECT lang,
                CASE
                  WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                  WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                  WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                  WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                  ELSE 'fr' END AS lang_pred
              FROM scored
            ),
            pairs AS (
              SELECT lang, lang_pred, count(*) AS n
              FROM pred GROUP BY lang, lang_pred
            ),
            totals AS (SELECT lang, count(*) AS n_lang FROM pred GROUP BY lang)
            SELECT p.lang, p.lang_pred, p.n,
                   round(p.n * 1.0 / t.n_lang, 6) AS share
            FROM pairs p JOIN totals t ON p.lang = t.lang
        """,
        "embedding_drift": """
            WITH waved AS (
              SELECT label, vec_id % 2 AS wave, t.pos,
                     CAST(embedding[t.pos] AS DOUBLE) AS x
              FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(pos)
            ),
            means AS (
              SELECT label, wave, pos, round(avg(x), 9) AS m
              FROM waved GROUP BY label, wave, pos
            ),
            j AS (
              SELECT a.label, a.pos, a.m AS ma, b.m AS mb
              FROM means a JOIN means b
                ON a.label = b.label AND a.pos = b.pos
               AND a.wave = 0 AND b.wave = 1
            ),
            agg AS (
              SELECT label,
                     round(sum(ma * mb), 9) AS dot,
                     sqrt(round(sum(ma * ma), 9)) AS na,
                     sqrt(round(sum(mb * mb), 9)) AS nb
              FROM j GROUP BY label
            ),
            counts AS (
              SELECT label,
                     sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS n_wave_a,
                     sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS n_wave_b
              FROM embeddings GROUP BY label
            )
            SELECT a.label, c.n_wave_a, c.n_wave_b,
                   round(a.dot / (a.na * a.nb), 6) AS centroid_cosine
            FROM agg a JOIN counts c ON a.label = c.label
        """,
        "cloaking_signal": """
            WITH words AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ),
            anchors AS (
              SELECT DISTINCT doc_id - doc_id % 16 AS target_id, ws[1] AS term
              FROM words
            ),
            toks AS (
              SELECT DISTINCT doc_id AS target_id, t.term
              FROM words, unnest(ws) AS t(term)
            )
            SELECT a.target_id,
                   count(*) AS n_anchor_terms,
                   sum(CASE WHEN t.term IS NOT NULL THEN 1 ELSE 0 END)
                     AS n_matched,
                   round(sum(CASE WHEN t.term IS NOT NULL THEN 1 ELSE 0 END)
                     * 1.0 / count(*), 6) AS match_ratio
            FROM anchors a
            LEFT JOIN toks t
              ON a.target_id = t.target_id AND a.term = t.term
            GROUP BY a.target_id
        """,
        "dup_quality_profile": """
            WITH base AS (
              SELECT doc_id, text, length(text) AS n,
                string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
              FROM documents
            ),
            r AS (
              SELECT doc_id,
                md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
                len(list_intersect(toks, ['the','and','of','to','in'])) * 1.0
                  / greatest(len(toks), 1) AS stop_ratio,
                length(regexp_replace(lower(text), '[^a-z ]', '', 'g')) * 1.0
                  / greatest(n, 1) AS alpha_ratio,
                length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) * 1.0
                  / greatest(n, 1) AS punct_ratio,
                CASE WHEN n >= 100 AND n <= 10000 THEN 1.0 ELSE 0.5 END AS len_band
              FROM base
            ),
            scored AS (
              SELECT doc_id, fp,
                round(greatest(least(
                  len_band * 0.4 + least(stop_ratio * 5, 1.0) * 0.3
                  + alpha_ratio * 0.3 - punct_ratio * 0.2, 1.0), 0.0), 6) AS quality
              FROM r
            ),
            sizes AS (SELECT fp, count(*) AS n_copies FROM scored GROUP BY fp),
            cuts AS (
              SELECT round(quantile_cont(quality, 0.25), 9) AS c1,
                     round(quantile_cont(quality, 0.5), 9) AS c2,
                     round(quantile_cont(quality, 0.75), 9) AS c3
              FROM scored
            ),
            staged AS (
              SELECT s.doc_id, z.n_copies,
                CASE WHEN s.quality >= c.c3 THEN 1
                     WHEN s.quality >= c.c2 THEN 2
                     WHEN s.quality >= c.c1 THEN 3
                     ELSE 4 END AS quartile
              FROM scored s JOIN sizes z ON s.fp = z.fp, cuts c
            )
            SELECT quartile, count(*) AS n_docs,
                   sum(CASE WHEN n_copies >= 2 THEN 1 ELSE 0 END) AS n_dup_docs,
                   round(sum(CASE WHEN n_copies >= 2 THEN 1 ELSE 0 END)
                     * 1.0 / count(*), 6) AS dup_rate
            FROM staged GROUP BY quartile
        """,
        "dedup_cross_wave": """
            WITH words AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
              FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(i)
              WHERE len(ws) >= 3
            ),
            rows_ AS (
              SELECT doc_id, h.hash_id, shingle
              FROM sh, unnest(generate_series(0, 7)) AS h(hash_id)
            ),
            sigs AS (
              SELECT doc_id, hash_id,
                     min(md5(hash_id || '|' || shingle)) AS sig
              FROM rows_ GROUP BY doc_id, hash_id
            ),
            bands AS (
              SELECT doc_id, hash_id // 2 AS band_id,
                     md5(array_to_string(list(sig ORDER BY hash_id), '|'))
                       AS band_sig
              FROM sigs GROUP BY doc_id, hash_id // 2
            )
            SELECT n.doc_id AS new_doc, o.doc_id AS old_doc,
                   count(*) AS n_bands
            FROM bands n JOIN bands o
              ON n.band_id = o.band_id AND n.band_sig = o.band_sig
            WHERE n.doc_id % 5 = 4 AND o.doc_id % 5 != 4
            GROUP BY 1, 2
        """,
        "shingle_df_stats": """
            WITH words AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
              FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(i)
              WHERE len(ws) >= 3
            ),
            dfr AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle)
            SELECT CAST(length(bin(df)) - 1 AS INT) AS log2_df,
                   count(*) AS n_shingles,
                   CAST(sum(df) AS BIGINT) AS postings,
                   CAST(sum(df * (df - 1) / 2.0) AS BIGINT) AS candidate_pairs
            FROM dfr GROUP BY 1
        """,
        "pair_pipeline": f"""
            WITH clean AS (
              SELECT doc_id, text FROM documents
              WHERE NOT regexp_matches(lower(text), 'https?://|www\\.')
                AND NOT regexp_matches(lower(text), '\\.(jpg|jpeg|png|gif|webp)$')
                AND (length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0
                       / length(text)) <= 0.3
                AND len(list_filter(
                      string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
                      t -> length(t) > 0)) >= 3
                AND string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')[1]
                      NOT IN ('image', 'photo', 'picture', 'img')
            ),
            meta AS ({_PAIR_META_SQL.replace("FROM documents", "FROM clean")}),
            ok AS (
              SELECT * FROM meta
              WHERE w >= 64 AND h >= 64
                AND greatest(w, h) <= 3 * least(w, h)
                AND n_tokens >= 5
            ),
            keep AS (SELECT phash, min(image_id) AS image_id FROM ok GROUP BY phash),
            sel AS (
              SELECT ok.* FROM ok JOIN keep
                ON ok.phash = keep.phash AND ok.image_id = keep.image_id
            ),
            t AS (
              SELECT image_id,
                     CAST(w AS BIGINT) * h + 4 * n_tokens AS nbytes,
                     image_id % 32 AS bucket
              FROM sel
            ),
            r AS (
              SELECT *, sum(nbytes) OVER (
                PARTITION BY bucket ORDER BY nbytes DESC, image_id
              ) AS cum FROM t
            )
            SELECT bucket,
                   CAST(floor((cum - nbytes) / 8388608.0) AS BIGINT) AS shard_id,
                   count(*) AS n_pairs,
                   CAST(sum(nbytes) AS BIGINT) AS shard_bytes,
                   round(sum(nbytes) / 8388608.0, 6) AS fill_ratio
            FROM r GROUP BY bucket, shard_id
        """,
        "decayed_host_activity": """
            WITH e AS (
              SELECT 'h' || CAST(user_id % 40 AS VARCHAR) AS host,
                     CAST(floor(epoch_us(ts) / 86400000000) AS INT) AS day
              FROM events
            ),
            mx AS (SELECT max(day) AS m FROM e),
            agg AS (
              SELECT host, CAST(count(*) AS BIGINT) AS n_events,
                     sum(pow(CAST(2.0 AS DOUBLE),
                             -CAST(least((SELECT m FROM mx) - day, 30)
                                   AS DOUBLE))) AS decayed
              FROM e GROUP BY host
            ),
            r AS (
              SELECT host, n_events, decayed,
                     CAST(row_number() OVER (ORDER BY decayed DESC, host)
                          AS BIGINT) AS rank
              FROM agg
            )
            SELECT host, n_events,
                   CAST(floor(decayed * 1e6 + 0.5) AS DOUBLE) / 1e6
                     AS decayed6,
                   rank
            FROM r
        """,
        "trailing_distinct_hll": """
            WITH e AS (
              SELECT CAST(floor(epoch_us(ts) / 86400000000) AS INT) AS day,
                     user_id
              FROM events
            ),
            hw AS (
              SELECT day, h % 256 AS idx, h >> 8 AS w FROM (
                SELECT day,
                       CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                            1, 15) AS BIGINT) AS h
                FROM e
              )
            ),
            reg AS (
              SELECT day, idx,
                     max(CASE WHEN w = 0 THEN 53
                              ELSE length(bin(w & -w)) END) AS rho_max
              FROM hw GROUP BY day, idx
            ),
            days AS (SELECT DISTINCT day FROM e),
            grid AS (
              SELECT d.day, CAST(t.i AS INT) AS idx
              FROM days d, range(0, 256) t(i)
            ),
            j AS (
              SELECT g.day, g.idx, r.rho_max
              FROM grid g LEFT JOIN reg r
                ON r.day = g.day AND r.idx = g.idx
            ),
            m AS (
              SELECT day, idx,
                     max(rho_max) OVER (PARTITION BY idx ORDER BY day
                                        RANGE BETWEEN 6 PRECEDING
                                        AND CURRENT ROW) AS rho_t
              FROM j
            ),
            mm AS (SELECT day, idx, rho_t FROM m WHERE rho_t IS NOT NULL),
            dd AS (
              SELECT day,
                     sum(CAST(1 AS BIGINT) << (53 - rho_t))
                     + (256 - count(*)) * (CAST(1 AS BIGINT) << 53)
                       AS denom_scaled
              FROM mm GROUP BY day
            ),
            est AS (
              SELECT day,
                     round(47072.71267120224 * pow(CAST(2 AS DOUBLE), 53)
                           / denom_scaled, 3) AS hll_estimate
              FROM dd
            ),
            du AS (SELECT DISTINCT day, user_id FROM e),
            ex AS (
              SELECT d.day, count(DISTINCT u.user_id) AS exact_distinct
              FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
              GROUP BY d.day
            )
            SELECT est.day, est.hll_estimate,
                   CAST(ex.exact_distinct AS BIGINT) AS exact_distinct,
                   CAST(floor(abs(est.hll_estimate - ex.exact_distinct)
                              / ex.exact_distinct * 1e6 + 0.5) AS DOUBLE)
                     / 1e6 AS rel_err6
            FROM est JOIN ex ON ex.day = est.day
        """,
        "fk_readability": r"""
            WITH d AS (
              SELECT doc_id, lower(trim(text)) AS t FROM documents
            ),
            c AS (
              SELECT doc_id,
                     CAST(len(list_filter(string_split_regex(t, '\s+'),
                              x -> length(x) > 0)) AS BIGINT) AS n_words,
                     CAST(greatest(len(regexp_extract_all(t, '[.!?]+')), 1)
                          AS BIGINT) AS n_sentences,
                     CAST(len(regexp_extract_all(t, '[aeiouy]+')) AS BIGINT)
                       AS n_syllables
              FROM d
            )
            SELECT doc_id, n_words, n_sentences, n_syllables,
                   CAST(floor((0.39 * (CAST(n_words AS DOUBLE)
                                       / CAST(n_sentences AS DOUBLE))
                               + 11.8 * (CAST(n_syllables AS DOUBLE)
                                         / CAST(n_words AS DOUBLE))
                               - 15.59) * 1e6 + 0.5) AS DOUBLE) / 1e6
                     AS grade6
            FROM c WHERE n_words > 0
        """,
        "seed_attribution": """
            WITH RECURSIVE e0 AS (
              SELECT doc_id % 20 AS a, (doc_id % 20 + 10) % 20 AS b
              FROM documents WHERE doc_id % 4 = 0
              UNION
              SELECT doc_id % 20, (doc_id % 20 + 5) % 20
              FROM documents WHERE doc_id % 16 = 1
            ),
            ed AS (SELECT DISTINCT a, b FROM e0 WHERE a != b),
            e AS (
              SELECT a AS s, b AS t FROM ed
              UNION
              SELECT b AS s, a AS t FROM ed
            ),
            walk(node, seed, d) AS (
              SELECT CAST(v.node AS BIGINT), CAST(v.seed AS BIGINT), v.d
              FROM (VALUES (0, 0, 0), (1, 1, 0)) v(node, seed, d)
              UNION
              SELECT e.t, w.seed, w.d + 1 FROM walk w JOIN e ON w.node = e.s
              WHERE w.d < 8
            ),
            md AS (SELECT node, min(d) AS dist FROM walk GROUP BY node)
            SELECT w.node AS host_id,
                   CAST(min(w.seed) AS BIGINT) AS seed,
                   CAST(any_value(md.dist) AS INTEGER) AS dist
            FROM walk w JOIN md ON md.node = w.node AND md.dist = w.d
            GROUP BY w.node
        """,
        "seed_distance": """
            WITH RECURSIVE e0 AS (
              SELECT doc_id % 20 AS a, (doc_id % 20 + 10) % 20 AS b
              FROM documents WHERE doc_id % 4 = 0
              UNION
              SELECT doc_id % 20, (doc_id % 20 + 5) % 20
              FROM documents WHERE doc_id % 16 = 1
            ),
            ed AS (SELECT DISTINCT a, b FROM e0 WHERE a != b),
            e AS (
              SELECT a AS s, b AS t FROM ed
              UNION
              SELECT b AS s, a AS t FROM ed
            ),
            walk(node, d) AS (
              SELECT CAST(v.node AS BIGINT), v.d
              FROM (VALUES (0, 0), (1, 0)) v(node, d)
              UNION
              SELECT e.t, w.d + 1 FROM walk w JOIN e ON w.node = e.s
              WHERE w.d < 8
            )
            SELECT node AS host_id, CAST(min(d) AS INTEGER) AS dist
            FROM walk GROUP BY node
        """,
        "stride_schedule": f"""
            WITH f AS ({_FRONTIER_SQL}),
            wts AS (
              SELECT 'host-' || i || '.test' AS host,
                     1 + i % 3 AS weight
              FROM range(20) t(i)
            ),
            r AS (
              SELECT f.url, f.host,
                     CAST(coalesce(w.weight, 1) AS BIGINT) AS weight,
                     CAST(row_number() OVER (
                       PARTITION BY f.host
                       ORDER BY f.priority, f.depth, f.discovery_seq
                     ) AS BIGINT) AS k
              FROM f LEFT JOIN wts w ON f.host = w.host
            )
            SELECT url, host, weight, k,
                   CAST(k * 10080 / weight AS BIGINT) AS vf
            FROM r ORDER BY vf, host, k LIMIT 64
        """,
        "host_kcore": """
            WITH ring AS (
              SELECT (doc_id % 10) * 2 AS a,
                     ((doc_id % 10) * 2 + 2) % 20 AS b
              FROM documents
            ),
            leaf AS (
              SELECT doc_id % 20 AS a, (doc_id % 20 + 5) % 20 AS b
              FROM documents WHERE doc_id % 16 = 1
            ),
            ed AS (
              SELECT DISTINCT a, b FROM (
                SELECT a, b FROM ring UNION ALL SELECT a, b FROM leaf
              ) WHERE a != b
            ),
            e0 AS (
              SELECT DISTINCT a, b FROM (
                SELECT a, b FROM ed UNION ALL SELECT b AS a, a AS b FROM ed
              )
            ),
            k1 AS (SELECT a FROM e0 GROUP BY a HAVING count(*) >= 2),
            e1 AS (SELECT a, b FROM e0
                   WHERE a IN (SELECT a FROM k1) AND b IN (SELECT a FROM k1)),
            k2 AS (SELECT a FROM e1 GROUP BY a HAVING count(*) >= 2),
            e2 AS (SELECT a, b FROM e1
                   WHERE a IN (SELECT a FROM k2) AND b IN (SELECT a FROM k2)),
            k3 AS (SELECT a FROM e2 GROUP BY a HAVING count(*) >= 2),
            e3 AS (SELECT a, b FROM e2
                   WHERE a IN (SELECT a FROM k3) AND b IN (SELECT a FROM k3)),
            k4 AS (SELECT a FROM e3 GROUP BY a HAVING count(*) >= 2),
            e4 AS (SELECT a, b FROM e3
                   WHERE a IN (SELECT a FROM k4) AND b IN (SELECT a FROM k4))
            SELECT a AS host_id, count(*) AS degree FROM e4 GROUP BY a
        """,
        "politeness_compliance_audit": f"""
            WITH f AS ({_FRONTIER_SQL}),
            dims AS (
              SELECT 'host-' || i || '.test' AS host,
                     0.25 * (1 + i % 4) AS delay_s
              FROM range(20) t(i)
            ),
            r AS (
              SELECT f.host, d.delay_s,
                     CAST(row_number() OVER (
                       PARTITION BY f.host
                       ORDER BY f.priority, f.depth, f.discovery_seq
                     ) AS BIGINT) AS k
              FROM f JOIN dims d ON f.host = d.host
            ),
            t AS (
              SELECT host, delay_s, k,
                     CASE WHEN host LIKE '%3.test' AND k > 2
                          THEN (k - 1) * delay_s - delay_s * 0.5
                          ELSE (k - 1) * delay_s END AS off2
              FROM r WHERE (k - 1) * delay_s < 64.0
            ),
            g AS (
              SELECT host, delay_s, k,
                     off2 - lag(off2) OVER (PARTITION BY host ORDER BY k)
                       AS gap
              FROM t
            )
            SELECT host, delay_s,
                   CAST(count(*) AS BIGINT) AS n_dispatch,
                   coalesce(min(gap), any_value(delay_s)) AS min_gap,
                   CAST(coalesce(sum(CASE WHEN gap < delay_s THEN 1 END), 0)
                        AS BIGINT) AS n_violations,
                   coalesce(sum(CASE WHEN gap < delay_s THEN 1 END), 0) = 0
                     AS compliant
            FROM g GROUP BY host, delay_s
        """,
        "wfq_dispatch_order": f"""
            WITH f AS ({_FRONTIER_SQL}),
            wt AS (
              SELECT 'host-' || i || '.test' AS host,
                     0.25 * (1 + i % 4) AS w
              FROM range(20) t(i)
            ),
            j AS (
              SELECT f.host, f.priority, f.depth, f.discovery_seq,
                     CAST(500 + f.doc_id % 1500 AS BIGINT) AS size, wt.w
              FROM f JOIN wt ON f.host = wt.host
            ),
            t AS (
              SELECT host,
                     CAST(row_number() OVER wh AS BIGINT) AS k,
                     size,
                     sum(CAST(size AS DOUBLE)) OVER (
                       PARTITION BY host
                       ORDER BY priority, depth, discovery_seq
                       ROWS UNBOUNDED PRECEDING) / w AS vfinish
              FROM j
              WINDOW wh AS (PARTITION BY host
                            ORDER BY priority, depth, discovery_seq)
            ),
            top AS (
              SELECT * FROM t ORDER BY vfinish, host, k LIMIT 64
            )
            SELECT host, k, size, vfinish,
                   CAST(row_number() OVER (ORDER BY vfinish, host, k)
                        AS BIGINT) AS dispatch_rank
            FROM top
        """,
        "dispatch_timeline": f"""
            WITH f AS ({_FRONTIER_SQL}),
            dims AS (
              SELECT 'host-' || i || '.test' AS host,
                     0.25 * (1 + i % 4) AS delay_s
              FROM range(20) t(i)
            ),
            r AS (
              SELECT f.url, f.host, d.delay_s,
                     CAST(row_number() OVER (
                       PARTITION BY f.host
                       ORDER BY f.priority, f.depth, f.discovery_seq
                     ) AS BIGINT) AS k
              FROM f JOIN dims d ON f.host = d.host
            )
            SELECT url, host, k, delay_s, (k - 1) * delay_s AS offset_s
            FROM r WHERE (k - 1) * delay_s < 16.0
            ORDER BY offset_s, host, k LIMIT 64
        """,
        "blocklist_filter": """
            WITH t AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ),
            h AS (
              SELECT doc_id,
                     list_filter(['merge', 'cube', 'skew'],
                                 b -> list_contains(ws, b)) AS hits
              FROM t
            )
            SELECT doc_id,
                   CAST(len(hits) AS INTEGER) AS n_blocked_terms,
                   coalesce(array_to_string(hits, ','), '') AS blocked_terms,
                   len(hits) = 0 AS kept
            FROM h
        """,
        "caption_boilerplate": """
            WITH p AS (
              SELECT doc_id, doc_id % 20 AS host_id,
                     md5(array_to_string(
                       string_split(regexp_replace(lower(trim(text)),
                                                   '\\s+', ' ', 'g'),
                                    ' ')[1:3], ' ')) AS fp
              FROM documents
            )
            SELECT fp, count(*) AS n_docs,
                   count(DISTINCT host_id) AS n_hosts,
                   min(doc_id) AS exemplar
            FROM p GROUP BY fp
            HAVING count(DISTINCT host_id) >= 2
        """,
        "host_communities": _lpa_sql(n_iter=3),
        "hyperball_balls": _hyperball_sql(n_iter=3, final="balls"),
        "harmonic_centrality": _hyperball_sql(n_iter=3, final="harmonic"),
        "effective_diameter": _hyperball_sql(n_iter=3, final="effdiam"),
        # completeness proof: the oracle is the NAIVE all-pairs Jaccard —
        # a prefix-filter bug that drops a true pair shows as row loss
        "ppjoin_pairs": """
            WITH words AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
              FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(i)
              WHERE len(ws) >= 3
            ),
            sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   round(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON doc_a = sa.doc_id
            JOIN sizes sb ON doc_b = sb.doc_id
            WHERE round(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.75
        """,
        "ppjoin_prefix_stats": """
            WITH words AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
              FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(i)
              WHERE len(ws) >= 3
            ),
            sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
            dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
            pre AS (
              SELECT s.doc_id, s.shingle, z.n_sh,
                     row_number() OVER (PARTITION BY s.doc_id
                                        ORDER BY d.df, s.shingle) AS pos
              FROM sh s JOIN dfreq d USING (shingle)
                        JOIN sizes z USING (doc_id)
            ),
            pref AS (
              SELECT doc_id, shingle, n_sh FROM pre
              WHERE pos <= n_sh - ceil(0.75 * n_sh) + 1
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM pref a JOIN pref b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
               AND b.n_sh >= 0.75 * a.n_sh AND a.n_sh >= 0.75 * b.n_sh
            ),
            inter AS (
              SELECT c.doc_a, c.doc_b, count(*) AS n_inter
              FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a
                          JOIN sh sb ON sb.doc_id = c.doc_b
                                    AND sb.shingle = sa.shingle
              GROUP BY 1, 2
            ),
            pairs AS (
              SELECT doc_a, doc_b
              FROM inter
              JOIN sizes za ON doc_a = za.doc_id
              JOIN sizes zb ON doc_b = zb.doc_id
              WHERE round(n_inter * 1.0 / (za.n_sh + zb.n_sh - n_inter), 6)
                      >= 0.75
            )
            SELECT (SELECT count(*) FROM cand) AS n_cand_prefix,
                   (SELECT count(*) FROM pairs) AS n_pairs
        """,
        "weighted_jaccard_pairs": """
            WITH words AS (
              SELECT doc_id, string_split(
                regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ),
            toks AS (
              SELECT doc_id, tok, count(*) AS c FROM (
                SELECT doc_id,
                       ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS tok
                FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(i)
                WHERE len(ws) >= 3
              ) GROUP BY doc_id, tok
            ),
            totals AS (SELECT doc_id, sum(c) AS total FROM toks GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     sum(least(a.c, b.c)) AS n_min
              FROM toks a JOIN toks b
                ON a.tok = b.tok AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   round(n_min * 1.0 / (ta.total + tb.total - n_min), 6) AS jw
            FROM inter
            JOIN totals ta ON ta.doc_id = doc_a
            JOIN totals tb ON tb.doc_id = doc_b
            WHERE round(n_min * 1.0 / (ta.total + tb.total - n_min), 6) >= 0.7
        """,
        # completeness proof: naive all-pairs banded levenshtein — a
        # prefix-filter bug that drops a true pair shows as row loss
        "ed_join_pairs": """
            WITH d AS (
              SELECT doc_id, lower(trim(text)) AS t FROM documents
              WHERE length(lower(trim(text))) > 0
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   levenshtein(a.t, b.t) AS ed
            FROM d a JOIN d b
              ON a.doc_id < b.doc_id
             AND abs(length(a.t) - length(b.t)) <= 12
            WHERE levenshtein(a.t, b.t) <= 12
        """,
        "ed_join_stats": """
            WITH d AS (
              SELECT doc_id, lower(trim(text)) AS t FROM documents
              WHERE length(lower(trim(text))) > 0
            ),
            pd AS (
              SELECT doc_id, t, length(t) AS n_chars,
                     repeat(chr(1), 9) || t || repeat(chr(2), 9) AS p
              FROM d
            ),
            gr AS (
              SELECT DISTINCT doc_id, n_chars, substring(p, i, 10) AS gram
              FROM pd, unnest(generate_series(1, length(p) - 9)) AS u(i)
            ),
            dfreq AS (SELECT gram, count(*) AS df FROM gr GROUP BY gram),
            pre AS (
              SELECT doc_id, gram, n_chars, n_grams FROM (
                SELECT g.doc_id, g.gram, g.n_chars,
                       row_number() OVER (PARTITION BY g.doc_id
                                          ORDER BY f.df, g.gram) AS pos,
                       count(*) OVER (PARTITION BY g.doc_id) AS n_grams
                FROM gr g JOIN dfreq f USING (gram)
              ) WHERE pos <= 136
            ),
            shorts AS (
              SELECT doc_id, n_chars,
                     CAST(floor(n_chars / 13.0) AS BIGINT) AS band
              FROM pd WHERE n_chars <= 111
            ),
            probe AS (
              SELECT doc_id, n_chars, band + d AS band
              FROM shorts, unnest([-1, 0, 1]) AS t(d)
            ),
            cand AS (
              SELECT DISTINCT doc_a, doc_b FROM (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM pre a JOIN pre b
                  ON a.gram = b.gram AND a.doc_id < b.doc_id
                 AND b.n_chars >= a.n_chars - 12
                 AND a.n_chars >= b.n_chars - 12
                GROUP BY a.doc_id, b.doc_id,
                         a.n_grams, b.n_grams
                HAVING count(*) >= greatest(
                  1, least(16, a.n_grams - 120, b.n_grams - 120))
                UNION ALL
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM shorts a JOIN probe b
                  ON a.band = b.band AND a.doc_id < b.doc_id
                 AND b.n_chars >= a.n_chars - 12
                 AND a.n_chars >= b.n_chars - 12
              )
            ),
            pairs AS (
              SELECT c.doc_a, c.doc_b FROM cand c
              JOIN pd x ON x.doc_id = c.doc_a
              JOIN pd y ON y.doc_id = c.doc_b
              WHERE levenshtein(x.t, y.t) <= 12
            )
            SELECT (SELECT count(*) FROM cand) AS n_cand_prefix,
                   (SELECT count(*) FROM pairs) AS n_pairs
        """,
        "host_components": """
            WITH RECURSIVE e0 AS (
              SELECT doc_id % 20 AS a, (doc_id % 20 + 10) % 20 AS b
              FROM documents WHERE doc_id % 4 = 0
              UNION
              SELECT doc_id % 20, (doc_id % 20 + 5) % 20
              FROM documents WHERE doc_id % 16 = 1
            ),
            ed AS (SELECT DISTINCT a, b FROM e0 WHERE a != b),
            e AS (
              SELECT a AS s, b AS t FROM ed
              UNION
              SELECT b AS s, a AS t FROM ed
            ),
            reach(s, t) AS (
              SELECT s, t FROM e
              UNION
              SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s
            )
            SELECT s AS host_id, least(s, min(t)) AS cluster_id
            FROM reach GROUP BY s
        """,
        "caption_junk_filter": """
            WITH c AS (
              SELECT doc_id,
                CASE WHEN doc_id % 7 = 0 THEN 'http://ex.com/p/' || doc_id
                     WHEN doc_id % 7 = 1 THEN 'IMG_' || doc_id || '.jpg'
                     WHEN doc_id % 7 = 2 THEN 'image'
                     ELSE text END AS caption
              FROM documents
            ),
            f AS (
              SELECT doc_id,
                regexp_matches(lower(caption), 'https?://|www\\.') AS is_urlish,
                regexp_matches(lower(caption), '\\.(jpg|jpeg|png|gif|webp)$')
                  AS is_filename,
                (length(regexp_replace(caption, '[^0-9]', '', 'g')) * 1.0
                   / length(caption)) > 0.3 AS is_digit_heavy,
                len(list_filter(
                  string_split(regexp_replace(lower(trim(caption)), '\\s+', ' ', 'g'), ' '),
                  t -> length(t) > 0)) < 3 AS too_short,
                string_split(regexp_replace(lower(trim(caption)), '\\s+', ' ', 'g'), ' ')[1]
                  IN ('image', 'photo', 'picture', 'img') AS is_generic
              FROM c
            )
            SELECT doc_id, is_urlish, is_filename, is_digit_heavy, too_short,
                   is_generic,
                   (NOT is_urlish AND NOT is_filename AND NOT is_digit_heavy
                    AND NOT too_short AND NOT is_generic) AS kept
            FROM f
        """,
        "phash_threshold_eval": f"""
            WITH meta AS ({_PAIR_META_SQL}),
            base AS (SELECT image_id AS bid, phash AS bsig FROM meta),
            twin AS (
              SELECT image_id AS bid, {_twin_sig_sql(1)} AS tsig FROM meta
            ),
            true_d AS (
              SELECT bit_count(xor(b.bsig, t.tsig)) AS d
              FROM base b JOIN twin t ON b.bid = t.bid
            ),
            ctrl AS (
              SELECT bit_count(xor(a.bsig, c.bsig)) AS d
              FROM base a JOIN base c ON a.bid = c.bid - 127
            ),
            ks AS (SELECT CAST(k AS INT) AS k FROM unnest(generate_series(0, 8)) AS t(k)),
            tn AS (SELECT count(*) AS n_true FROM true_d),
            cn AS (SELECT count(*) AS n_ctrl FROM ctrl),
            th AS (
              SELECT k, count(*) AS n_true_hit
              FROM ks, true_d WHERE d <= k GROUP BY k
            ),
            ch AS (
              SELECT k, count(*) AS n_ctrl_hit
              FROM ks, ctrl WHERE d <= k GROUP BY k
            )
            SELECT ks.k, tn.n_true,
              round(coalesce(th.n_true_hit, 0) * 1.0 / tn.n_true, 6) AS recall,
              cn.n_ctrl,
              round(coalesce(ch.n_ctrl_hit, 0) * 1.0 / cn.n_ctrl, 6) AS fpr
            FROM ks
            LEFT JOIN th ON ks.k = th.k
            LEFT JOIN ch ON ks.k = ch.k
            CROSS JOIN tn CROSS JOIN cn
        """,
        "ip_politeness": f"""
            WITH f AS ({_FRONTIER_SQL}),
            g AS (
              SELECT doc_id, host,
                     (instr('0123456789abcdef', substring(md5(host), 1, 1)) - 1)
                       % 8 AS ip_id,
                     priority, depth, discovery_seq
              FROM f
            )
            SELECT doc_id, host, ip_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY ip_id
                     ORDER BY priority, depth, discovery_seq) AS rank_ip,
                   ROW_NUMBER() OVER (
                     PARTITION BY ip_id
                     ORDER BY priority, depth, discovery_seq) <= 6 AS admitted_ip,
                   ROW_NUMBER() OVER (
                     PARTITION BY host
                     ORDER BY priority, depth, discovery_seq) <= 4 AS admitted_host
            FROM g
        """,
        "aging_schedule": f"""
            WITH f AS ({_FRONTIER_SQL}),
            g AS (
              SELECT doc_id, host, priority,
                     CAST(doc_id % 5 AS INTEGER) AS born_round,
                     depth, discovery_seq
              FROM f
            ),
            aged AS (
              SELECT doc_id, host, priority, born_round,
                     CAST(greatest(0, priority
                          - CAST(floor((6 - born_round) / 2.0) AS INTEGER))
                       AS INTEGER) AS eff_priority,
                     depth, discovery_seq
              FROM g
            )
            SELECT doc_id, host, priority, born_round, eff_priority,
                   sched_rank
            FROM (
              SELECT *, ROW_NUMBER() OVER (
                PARTITION BY host
                ORDER BY eff_priority, depth, discovery_seq) AS sched_rank
              FROM aged
            ) WHERE sched_rank <= 4
        """,
        "host_quota_schedule": f"""
            WITH f AS ({_FRONTIER_SQL}),
            served AS (
              SELECT host, count(*) AS host_served
              FROM f WHERE doc_id % 4 = 0 GROUP BY host
            ),
            p AS (
              SELECT f.doc_id, f.host, f.priority, f.depth, f.discovery_seq,
                     coalesce(served.host_served, 0) AS host_served
              FROM f LEFT JOIN served USING (host)
              WHERE f.doc_id % 4 <> 0
            ),
            b AS (
              SELECT *,
                     least(3, greatest(0, 8 - host_served)) AS budget,
                     ROW_NUMBER() OVER (
                       PARTITION BY host
                       ORDER BY priority, depth, discovery_seq) AS sched_rank
              FROM p
            )
            SELECT doc_id, host, host_served, budget, sched_rank
            FROM b WHERE sched_rank <= budget
        """,
        "span_dedup_stats": """
            WITH words AS (
              SELECT doc_id,
                string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ),
            wr AS (
              SELECT doc_id,
                     ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
                           || ' ' || ws[i+4] AS win
              FROM words, unnest(generate_series(1, len(ws) - 4)) AS t(i)
              WHERE len(ws) >= 5
            ),
            freq AS (
              SELECT win, count(*) AS n_docs
              FROM (SELECT DISTINCT doc_id, win FROM wr) GROUP BY win
            ),
            agg AS (
              SELECT doc_id, count(*) AS n_windows,
                     CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END)
                          AS BIGINT) AS dup_windows
              FROM wr JOIN freq USING (win) GROUP BY doc_id
            )
            SELECT doc_id, n_windows, dup_windows,
                   floor(CAST(dup_windows AS DOUBLE) / n_windows
                         * 1000000.0 + 0.5) / 1000000.0 AS removal_frac
            FROM agg
        """,
        "host_mirror_jaccard": """
            WITH words AS (
              SELECT doc_id,
                string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ),
            d AS (
              SELECT DISTINCT 'host-' || (doc_id % 20) AS host,
                     ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
                           || ' ' || ws[i+4] AS fp
              FROM words, unnest(generate_series(1, len(ws) - 4)) AS t(i)
              WHERE len(ws) >= 5
            ),
            sizes AS (SELECT host, count(*) AS n FROM d GROUP BY host),
            pairs AS (
              SELECT a.host AS host_a, b.host AS host_b, count(*) AS inter
              FROM d a JOIN d b USING (fp)
              WHERE a.host < b.host
              GROUP BY a.host, b.host
            )
            SELECT host_a, host_b, inter,
                   floor(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter)
                         * 1000000.0 + 0.5) / 1000000.0 AS jaccard
            FROM pairs
            JOIN sizes sa ON sa.host = host_a
            JOIN sizes sb ON sb.host = host_b
        """,
        "politeness_audit": """
            WITH ev AS (
              SELECT 'h' || (user_id % 23) AS host,
                     event_id % 16 AS round_id
              FROM events
            ),
            per_round AS (
              SELECT host, round_id, count(*) AS served
              FROM ev GROUP BY host, round_id
            ),
            flagged AS (
              SELECT host, served,
                     8 + (length(host) % 3) * 4 AS budget,
                     greatest(served - (8 + (length(host) % 3) * 4), 0) AS over
              FROM per_round
            )
            SELECT host, any_value(budget) AS budget,
                   count(*) AS n_rounds,
                   sum(CASE WHEN over > 0 THEN 1 ELSE 0 END) AS rounds_over,
                   CAST(max(over) AS BIGINT) AS worst_overshoot
            FROM flagged GROUP BY host
        """,
        "bpe_train": """
            WITH d0 AS (
              SELECT ' ' || regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') || ' ' AS s
              FROM documents
            ),
            p0 AS (
              SELECT t.ws[i] AS a, t.ws[i+1] AS b FROM (
                SELECT string_split(trim(s), ' ') AS ws FROM d0
              ) t, unnest(generate_series(1, len(t.ws) - 1)) AS g(i)
            ),
            m0 AS (
              SELECT a, b, count(*) AS n_pairs FROM p0 GROUP BY a, b
              ORDER BY n_pairs DESC, a, b LIMIT 1
            ),
            d1 AS (
              SELECT replace(d0.s, ' ' || m0.a || ' ' || m0.b || ' ',
                                   ' ' || m0.a || '_' || m0.b || ' ') AS s
              FROM d0, m0
            ),
            p1 AS (
              SELECT t.ws[i] AS a, t.ws[i+1] AS b FROM (
                SELECT string_split(trim(s), ' ') AS ws FROM d1
              ) t, unnest(generate_series(1, len(t.ws) - 1)) AS g(i)
            ),
            m1 AS (
              SELECT a, b, count(*) AS n_pairs FROM p1 GROUP BY a, b
              ORDER BY n_pairs DESC, a, b LIMIT 1
            ),
            d2 AS (
              SELECT replace(d1.s, ' ' || m1.a || ' ' || m1.b || ' ',
                                   ' ' || m1.a || '_' || m1.b || ' ') AS s
              FROM d1, m1
            ),
            p2 AS (
              SELECT t.ws[i] AS a, t.ws[i+1] AS b FROM (
                SELECT string_split(trim(s), ' ') AS ws FROM d2
              ) t, unnest(generate_series(1, len(t.ws) - 1)) AS g(i)
            ),
            m2 AS (
              SELECT a, b, count(*) AS n_pairs FROM p2 GROUP BY a, b
              ORDER BY n_pairs DESC, a, b LIMIT 1
            )
            SELECT 0 AS merge_rank, a, b, CAST(n_pairs AS BIGINT) AS n_pairs FROM m0
            UNION ALL
            SELECT 1, a, b, CAST(n_pairs AS BIGINT) FROM m1
            UNION ALL
            SELECT 2, a, b, CAST(n_pairs AS BIGINT) FROM m2
        """,
        "pair_shards": f"""
            WITH meta AS ({_PAIR_META_SQL}),
            t AS (
              SELECT image_id,
                     CAST(w AS BIGINT) * h + 4 * n_tokens AS nbytes,
                     image_id % 32 AS bucket
              FROM meta
            ),
            r AS (
              SELECT *, sum(nbytes) OVER (
                PARTITION BY bucket ORDER BY nbytes DESC, image_id
              ) AS cum FROM t
            )
            SELECT bucket,
                   CAST(floor((cum - nbytes) / 8388608.0) AS BIGINT) AS shard_id,
                   count(*) AS n_pairs,
                   CAST(sum(nbytes) AS BIGINT) AS shard_bytes,
                   round(sum(nbytes) / 8388608.0, 6) AS fill_ratio
            FROM r GROUP BY bucket, shard_id
        """,
        "rank_priority_bands": """
            WITH ranks AS (
              SELECT 'h' || (user_id % 23) AS node,
                     CAST(count(*) AS DOUBLE) AS rank
              FROM events GROUP BY 1
            ),
            cuts AS (
              SELECT round(quantile_cont(rank, 0.75), 9) AS c0,
                     round(quantile_cont(rank, 0.5), 9) AS c1,
                     round(quantile_cont(rank, 0.25), 9) AS c2
              FROM ranks
            )
            SELECT node,
              CAST(CASE WHEN rank >= c0 THEN 0
                        WHEN rank >= c1 THEN 1
                        WHEN rank >= c2 THEN 2
                        ELSE 3 END AS INT) AS priority
            FROM ranks, cuts
        """,
        "warc_revisit_plan": """
            WITH planned AS (
              SELECT doc_id, doc_id % 2 AS wave, md5(text) AS digest,
                     CAST(n_chars AS BIGINT) AS n_bytes,
                     row_number() OVER (PARTITION BY md5(text)
                                        ORDER BY doc_id % 2, doc_id) AS rn
              FROM documents
            )
            SELECT wave,
                   CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_response,
                   CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_revisit,
                   CAST(sum(CASE WHEN rn > 1 THEN n_bytes ELSE 0 END)
                        AS BIGINT) AS bytes_saved
            FROM planned GROUP BY wave
        """,
        "exact_global_median": f"""
            WITH f AS ({_FRONTIER_SQL}),
            lat AS (
              SELECT CAST(50
                + ((instr('0123456789abcdef',
                      substring(md5(cast(doc_id AS varchar)), 1, 1)) - 1) * 16
                   + (instr('0123456789abcdef',
                      substring(md5(cast(doc_id AS varchar)), 2, 1)) - 1)) * 7
                + priority * 100 AS BIGINT) AS v
              FROM f
            ),
            r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM lat),
            nn AS (SELECT count(*) AS c FROM lat)
            SELECT CAST(c AS BIGINT) AS n,
                   CAST((c + 1) // 2 AS BIGINT) AS rank,
                   (SELECT v FROM r WHERE rn = (SELECT (c + 1) // 2 FROM nn))
                     AS value
            FROM nn
        """,
        "phash_bit_bias": """
            WITH meta AS (
              SELECT CAST(concat('0x', substring(md5(text), 1, 15))
                          AS BIGINT) AS phash
              FROM documents
            ),
            bits AS (
              SELECT i AS bit_idx, (phash >> i) & 1 AS b
              FROM meta CROSS JOIN range(0, 60) t(i)
            )
            SELECT bit_idx, CAST(sum(b) AS BIGINT) AS n_ones,
                   round(abs(sum(b) * 1.0 / count(*) - 0.5), 6) AS bias
            FROM bits GROUP BY bit_idx
        """,
        "recursive_reachability": _reach_sql("documents"),
        "train_linear_probe": _probe_sql(),
        "host_scc": f"""
            WITH RECURSIVE e AS (
              SELECT DISTINCT src, dst FROM (
                SELECT CAST(doc_id % 32 AS BIGINT) AS src,
                       CAST((16 * {_hexdig_sql("cast(doc_id AS varchar)", 6)}
                             + {_hexdig_sql("cast(doc_id AS varchar)", 7)})
                            % 32 AS BIGINT) AS dst
                FROM documents WHERE doc_id % 3 = 0
              ) WHERE src != dst
            ),
            nodes AS (
              SELECT DISTINCT n FROM (
                SELECT src AS n FROM e UNION SELECT dst FROM e
              )
            ),
            r(a, b) AS (
              SELECT n, n FROM nodes
              UNION
              SELECT r.a, e.dst FROM r JOIN e ON e.src = r.b
            )
            SELECT r1.a AS host_id, min(r1.b) AS scc_id
            FROM r r1 JOIN r r2 ON r1.a = r2.b AND r1.b = r2.a
            GROUP BY r1.a
        """,
        "variant_extract_stats": """
            WITH j AS (
              SELECT json_object(
                       't', event_type,
                       'm', json_object('u', user_id, 'e', event_id)
                     ) AS js
              FROM events
            ),
            flat AS (
              SELECT js ->> '$.t' AS event_type,
                     CAST(js -> '$.m' ->> '$.u' AS BIGINT) AS u,
                     CAST(js -> '$.m' ->> '$.e' AS BIGINT) AS e
              FROM j
            )
            SELECT event_type,
                   count(DISTINCT u) AS n_users,
                   sum(e) AS sum_event_ids,
                   count(*) AS n_events
            FROM flat GROUP BY event_type
        """,
        "join_size_forecast": f"""
            WITH f AS ({_FRONTIER_SQL}),
            ev AS (
              SELECT 'host-' || (user_id % 20) || '.test' AS ehost
              FROM events
            ),
            ca AS (
              SELECT r AS cm_row,
                     {_hexdig_sql("'cm' || r || ':' || host", 1)} * 16
                     + {_hexdig_sql("'cm' || r || ':' || host", 2)} AS cm_col,
                     count(*) AS cnt
              FROM f CROSS JOIN range(0, 4) t(r)
              GROUP BY 1, 2
            ),
            cb AS (
              SELECT r AS cm_row,
                     {_hexdig_sql("'cm' || r || ':' || ehost", 1)} * 16
                     + {_hexdig_sql("'cm' || r || ':' || ehost", 2)} AS cm_col,
                     count(*) AS cnt
              FROM ev CROSS JOIN range(0, 4) t(r)
              GROUP BY 1, 2
            ),
            ip AS (
              SELECT ca.cm_row, sum(ca.cnt * cb.cnt) AS ip
              FROM ca JOIN cb
                ON ca.cm_row = cb.cm_row AND ca.cm_col = cb.cm_col
              GROUP BY ca.cm_row
            ),
            est AS (
              SELECT min(coalesce(ip, 0)) AS join_size_est
              FROM range(0, 4) rows(cm_row) LEFT JOIN ip USING (cm_row)
            ),
            fa AS (SELECT host AS k, count(*) AS fa FROM f GROUP BY host),
            fb AS (SELECT ehost AS k, count(*) AS fb FROM ev GROUP BY ehost),
            exact AS (
              SELECT coalesce(sum(fa * fb), 0) AS join_size_exact
              FROM fa JOIN fb USING (k)
            )
            SELECT CAST(join_size_exact AS BIGINT) AS join_size_exact,
                   CAST(join_size_est AS BIGINT) AS join_size_est
            FROM exact CROSS JOIN est
        """,
        "scd2_robots_history": """
            WITH hosts AS (
              SELECT DISTINCT doc_id % 20 AS hid FROM documents
            ),
            changes AS (
              SELECT 'host-' || hid || '.test' AS host,
                     CAST(unnest([1, 2 + hid % 5, 9]) AS BIGINT) AS round_id,
                     hid
              FROM hosts
            ),
            dim AS (
              SELECT host,
                     CAST((hid + round_id) % 7 + 1 AS BIGINT) AS delay_s,
                     round_id AS valid_from,
                     coalesce(
                       lead(round_id) OVER (
                         PARTITION BY host ORDER BY round_id
                       ) - 1,
                       999999
                     ) AS valid_to
              FROM changes
            ),
            facts AS (
              SELECT 'host-' || (doc_id % 20) || '.test' AS host,
                     CAST(doc_id % 12 + 1 AS BIGINT) AS fetch_round
              FROM documents
            )
            SELECT f.host, f.fetch_round, d.delay_s, d.valid_from,
                   d.valid_to, count(*) AS n_fetches
            FROM facts f
            LEFT JOIN dim d
              ON d.host = f.host
             AND f.fetch_round BETWEEN d.valid_from AND d.valid_to
            GROUP BY 1, 2, 3, 4, 5
        """,
        "session_windows": """
            WITH o AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            s AS (
              SELECT user_id, ts,
                     sum(brk) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING
                     ) AS sid
              FROM o
            )
            SELECT user_id,
                   min(ts) AS session_start,
                   max(ts) + INTERVAL 30 MINUTE AS session_end,
                   count(*) AS n_events
            FROM s GROUP BY user_id, sid
        """,
        "pareto_frontier": """
            WITH pts AS (
              SELECT DISTINCT CAST(n_chars % 97 AS BIGINT) AS x,
                              CAST((doc_id * 31) % 89 AS BIGINT) AS y
              FROM documents
            )
            SELECT x AS value_score, y AS staleness
            FROM pts p
            WHERE NOT EXISTS (
              SELECT 1 FROM pts q
              WHERE q.x >= p.x AND q.y >= p.y
                AND (q.x > p.x OR q.y > p.y)
            )
        """,
        "aimd_rates": """
            WITH RECURSIVE hosts AS (
              SELECT DISTINCT doc_id % 20 AS hid FROM documents
            ),
            o AS (
              SELECT hid, r AS round_id,
                     CASE WHEN (hid * 7 + r * 13) % 5 = 0
                          THEN 1 ELSE 0 END AS n_failed
              FROM hosts CROSS JOIN range(1, 13) t(r)
            ),
            rc AS (
              SELECT hid, 0 AS r, CAST(4 AS BIGINT) AS rate,
                     CAST(0 AS BIGINT) AS inc_, CAST(0 AS BIGINT) AS dec_,
                     CAST(4 AS BIGINT) AS peak
              FROM hosts
              UNION ALL
              SELECT rc.hid, rc.r + 1,
                     CASE WHEN o.n_failed > 0
                          THEN greatest(1, rc.rate // 2)
                          ELSE least(64, rc.rate + 1) END,
                     rc.inc_ + CASE WHEN o.n_failed > 0 THEN 0 ELSE 1 END,
                     rc.dec_ + CASE WHEN o.n_failed > 0 THEN 1 ELSE 0 END,
                     CASE WHEN o.n_failed > 0 THEN rc.peak
                          ELSE greatest(rc.peak, least(64, rc.rate + 1)) END
              FROM rc JOIN o ON o.hid = rc.hid AND o.round_id = rc.r + 1
            )
            SELECT 'host-' || hid || '.test' AS host,
                   CAST(12 AS INT) AS n_rounds,
                   rate AS final_rate,
                   inc_ AS n_increase,
                   dec_ AS n_decrease,
                   peak AS peak_rate
            FROM rc WHERE r = 12
        """,
        "host_distinct_hll": f"""
            WITH f AS ({_FRONTIER_SQL}),
            hw AS (
              SELECT host, h % 256 AS idx, h >> 8 AS w FROM (
                SELECT host,
                       CAST(concat('0x', substring(md5(url), 1, 15))
                            AS BIGINT) AS h
                FROM f
              )
            ),
            reg AS (
              SELECT host, idx,
                     max(CASE WHEN w = 0 THEN 53
                              ELSE length(bin(w & -w)) END) AS rho_max
              FROM hw GROUP BY host, idx
            ),
            d AS (
              SELECT host,
                     sum(CAST(1 AS BIGINT) << (53 - rho_max))
                     + (256 - count(*)) * (CAST(1 AS BIGINT) << 53)
                       AS denom_scaled
              FROM reg GROUP BY host
            ),
            est AS (
              SELECT host,
                     round(47072.71267120224 * pow(CAST(2 AS DOUBLE), 53)
                           / denom_scaled, 3) AS hll_estimate
              FROM d
            ),
            exact AS (
              SELECT host, count(DISTINCT url) AS exact_distinct
              FROM f GROUP BY host
            )
            SELECT est.host,
                   CAST(floor(hll_estimate) AS BIGINT) AS hll_floor,
                   exact_distinct
            FROM est JOIN exact ON est.host = exact.host
        """,
        "ams_f2": f"""
            WITH f AS ({_FRONTIER_SQL}),
            signs AS (
              SELECT j,
                     CAST(1 - 2 * ((instr('0123456789abcdef',
                        substring(md5('ams' || j || ':' || host), 1, 1)) - 1)
                        % 2) AS BIGINT) AS s
              FROM f CROSS JOIN range(0, 16) t(j)
            ),
            counters AS (SELECT j, sum(s) AS c FROM signs GROUP BY j),
            sq AS (
              SELECT c * c AS c2,
                     row_number() OVER (ORDER BY c * c) AS rn
              FROM counters
            ),
            est AS (SELECT sum(c2) AS est2x FROM sq WHERE rn IN (8, 9)),
            exact AS (
              SELECT sum(f * f) AS f2_exact FROM (
                SELECT host, count(*) AS f FROM f GROUP BY host
              )
            )
            SELECT CAST(f2_exact AS BIGINT) AS f2_exact,
                   CAST(est2x AS BIGINT) AS f2_est_2x,
                   CAST(16 AS INT) AS k
            FROM exact CROSS JOIN est
        """,
        "degree_assortativity": f"""
            WITH e0 AS (
              SELECT DISTINCT src, dst FROM (
                SELECT CAST(doc_id % 32 AS BIGINT) AS src,
                       CAST((16 * {_hexdig_sql("cast(doc_id AS varchar)", 6)}
                             + {_hexdig_sql("cast(doc_id AS varchar)", 7)})
                            % 32 AS BIGINT) AS dst
                FROM documents WHERE doc_id % 3 = 0
              ) WHERE src != dst
            ),
            und AS (
              SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM e0
                UNION ALL SELECT dst, src FROM e0
              )
            ),
            deg AS (SELECT src AS node, count(*) AS deg FROM und GROUP BY src),
            xy AS (
              SELECT da.deg AS dx, db.deg AS dy
              FROM und JOIN deg da ON da.node = und.src
                       JOIN deg db ON db.node = und.dst
            ),
            s AS (
              SELECT count(*) AS m, sum(dx) AS sx, sum(dy) AS sy,
                     sum(dx * dy) AS sxy, sum(dx * dx) AS sxx,
                     sum(dy * dy) AS syy
              FROM xy
            )
            SELECT CAST(m AS BIGINT) AS n_incidences,
                   round((m * sxy - sx * sy)
                         / (sqrt(m * sxx - sx * sx)
                            * sqrt(m * syy - sy * sy)), 6) AS assortativity
            FROM s
        """,
        "adjacency_gap_bits": f"""
            WITH e AS (
              SELECT DISTINCT src, dst FROM (
                SELECT CAST(doc_id % 32 AS BIGINT) AS src,
                       CAST((16 * {_hexdig_sql("cast(doc_id AS varchar)", 6)}
                             + {_hexdig_sql("cast(doc_id AS varchar)", 7)})
                            % 32 AS BIGINT) AS dst
                FROM documents WHERE doc_id % 3 = 0
              ) WHERE src != dst
            ),
            g AS (
              SELECT src AS s, dst AS d,
                     lag(dst) OVER (PARTITION BY src ORDER BY dst) AS prev
              FROM e
            ),
            nat AS (
              SELECT s,
                     CASE WHEN prev IS NULL THEN
                       CASE WHEN d >= s THEN 2 * (d - s)
                            ELSE 2 * (s - d) - 1 END
                     ELSE d - prev - 1 END AS nat
              FROM g
            ),
            nn AS (
              SELECT length(bin(count(*) - 1)) AS flat_w FROM (
                SELECT DISTINCT node FROM (
                  SELECT src AS node FROM e UNION ALL SELECT dst FROM e
                )
              )
            )
            SELECT s AS host_id, count(*) AS deg,
                   CAST(sum(2 * (length(bin(nat + 1)) - 1) + 1) AS BIGINT)
                     AS bits_gamma,
                   CAST(count(*) * (SELECT flat_w FROM nn) AS BIGINT)
                     AS bits_flat
            FROM nat GROUP BY s
        """,
        "bowtie_classes": """
            WITH RECURSIVE e0 AS (
              SELECT (doc_id // 4) % 8 AS a, ((doc_id // 4) % 8 + 1) % 8 AS b
              FROM documents WHERE doc_id % 4 = 0
              UNION
              SELECT (doc_id // 4) % 8 + 8, (doc_id // 4) % 8
              FROM documents WHERE doc_id % 4 = 1
              UNION
              SELECT (doc_id // 4) % 8, (doc_id // 4) % 8 + 16
              FROM documents WHERE doc_id % 4 = 2
              UNION
              SELECT (doc_id // 4) % 8 + 24, ((doc_id // 4) % 8 + 1) % 8 + 24
              FROM documents WHERE doc_id % 4 = 3
            ),
            ed AS (SELECT DISTINCT a, b FROM e0 WHERE a != b),
            nodes AS (
              SELECT DISTINCT node FROM (
                SELECT a AS node FROM ed UNION ALL SELECT b FROM ed
              )
            ),
            pv AS (
              SELECT node FROM (
                SELECT node, count(*) AS deg FROM (
                  SELECT a AS node FROM ed UNION ALL SELECT b FROM ed
                ) GROUP BY node
              ) ORDER BY deg DESC, node LIMIT 1
            ),
            fwd(node) AS (
              SELECT node FROM pv
              UNION
              SELECT e.b FROM fwd f JOIN ed e ON f.node = e.a
            ),
            bwd(node) AS (
              SELECT node FROM pv
              UNION
              SELECT e.a FROM bwd w JOIN ed e ON w.node = e.b
            )
            SELECT n.node AS host_id,
                   CASE WHEN f.node IS NOT NULL AND b.node IS NOT NULL
                          THEN 'SCC'
                        WHEN b.node IS NOT NULL THEN 'IN'
                        WHEN f.node IS NOT NULL THEN 'OUT'
                        ELSE 'OTHER' END AS cls
            FROM nodes n
            LEFT JOIN (SELECT DISTINCT node FROM fwd) f ON f.node = n.node
            LEFT JOIN (SELECT DISTINCT node FROM bwd) b ON b.node = n.node
        """,
        "refresh_allocation": f"""
            WITH f AS ({_FRONTIER_SQL}),
            hosts AS (
              SELECT host,
                     sum(1 + (instr('0123456789abcdef',
                          substring(md5(cast(doc_id AS varchar)), 8, 1)) - 1)
                         % 4) AS lam,
                     min(doc_id) % 3 + 1 AS val
              FROM f GROUP BY host
            ),
            marg AS (
              SELECT host, ff AS fr,
                     (val * lam * 2520) // (ff * (ff + 1)) AS gain_scaled
              FROM hosts, unnest(generate_series(1, 8)) AS t(ff)
            ),
            top AS (
              SELECT * FROM marg
              ORDER BY gain_scaled DESC, host, fr LIMIT 100
            )
            SELECT host, count(*) AS n_visits,
                   CAST(sum(gain_scaled) AS BIGINT) AS freshness_gain_scaled
            FROM top GROUP BY host
        """,
        "refresh_value": f"""
            WITH f AS ({_FRONTIER_SQL}),
            est AS (
              SELECT doc_id, host, priority,
                -ln((4 + doc_id % 5
                     - ((instr('0123456789abcdef', substring(md5(cast(doc_id AS varchar)), 8, 1)) - 1)
                        % (4 + doc_id % 5 + 1)) + 0.5)
                    / (4 + doc_id % 5 + 0.5)) AS lam
              FROM f
            )
            SELECT doc_id, host,
              round(lam, 6) AS lambda_hat,
              round(1.0 / (1.0 + priority), 6) AS value_prior,
              round(lam / (1.0 + priority), 6) AS refresh_value
            FROM est
        """,
        "host_cocitation": """
            WITH edges AS (
              SELECT doc_id AS src, doc_id - doc_id % 16 AS dst FROM documents
              UNION ALL
              SELECT doc_id, (doc_id % 8) + 1000 FROM documents
            )
            SELECT a.dst AS dst_a, b.dst AS dst_b, count(*) AS n_common
            FROM edges a JOIN edges b ON a.src = b.src AND a.dst < b.dst
            GROUP BY 1, 2
            HAVING count(*) >= 2
        """,
        "host_ucb_priority": """
            WITH per AS (
              SELECT 'h' || (user_id % 23) AS host, count(*) AS n_trials,
                     sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS n_succ
              FROM events GROUP BY 1
            ),
            tot AS (SELECT sum(n_trials) AS n_total FROM per)
            SELECT host, n_trials,
              round(n_succ * 1.0 / n_trials, 6) AS success_rate,
              round(n_succ * 1.0 / n_trials
                + sqrt(2.0 * ln(n_total) / n_trials), 6) AS ucb_score
            FROM per, tot
        """,
        "curriculum_stages": """
            WITH base AS (
              SELECT doc_id, text, length(text) AS n,
                string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
              FROM documents
            ),
            r AS (
              SELECT doc_id,
                CAST(len(list_filter(toks, t -> length(t) > 0)) AS BIGINT)
                  AS n_tokens,
                len(list_intersect(toks, ['the','and','of','to','in'])) * 1.0
                  / greatest(len(toks), 1) AS stop_ratio,
                length(regexp_replace(lower(text), '[^a-z ]', '', 'g')) * 1.0
                  / greatest(n, 1) AS alpha_ratio,
                length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) * 1.0
                  / greatest(n, 1) AS punct_ratio,
                CASE WHEN n >= 100 AND n <= 10000 THEN 1.0 ELSE 0.5 END AS len_band
              FROM base
            ),
            scored AS (
              SELECT doc_id, n_tokens,
                round(greatest(least(
                  len_band * 0.4 + least(stop_ratio * 5, 1.0) * 0.3
                  + alpha_ratio * 0.3 - punct_ratio * 0.2, 1.0), 0.0), 6) AS quality
              FROM r
            ),
            cuts AS (
              SELECT round(quantile_cont(quality, 0.25), 9) AS c1,
                     round(quantile_cont(quality, 0.5), 9) AS c2,
                     round(quantile_cont(quality, 0.75), 9) AS c3
              FROM scored
            ),
            staged AS (
              SELECT s.doc_id, s.n_tokens, s.quality,
                CASE WHEN s.quality >= c.c3 THEN 1
                     WHEN s.quality >= c.c2 THEN 2
                     WHEN s.quality >= c.c1 THEN 3
                     ELSE 4 END AS stage
              FROM scored s, cuts c
            )
            SELECT stage, count(*) AS n_docs,
              round(avg(quality), 6) AS avg_quality,
              round(avg(n_tokens), 6) AS avg_tokens,
              min(quality) AS min_quality,
              max(quality) AS max_quality
            FROM staged GROUP BY stage
        """,
        "ann_recall_eval": """
            WITH e AS (
              SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings
            ),
            cells AS (
              SELECT vec_id, v,
                (strpos('0123456789abcdef',
                        substr(md5(CAST(vec_id AS VARCHAR)), 1, 1)) - 1) % 8
                  AS cell_id
              FROM e
            ),
            means AS (
              SELECT cell_id, t.pos, round(avg(v[t.pos]), 9) AS m
              FROM cells, unnest(generate_series(1, len(v))) AS t(pos)
              GROUP BY cell_id, t.pos
            ),
            cents AS (
              SELECT cell_id, list(m ORDER BY pos) AS centroid
              FROM means GROUP BY cell_id
            ),
            q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 97 = 0),
            assigned AS (
              SELECT vec_id, v, cell_id FROM (
                SELECT c.vec_id, c.v, ct.cell_id,
                  ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
                    round(list_dot_product(c.v, ct.centroid)
                      / (sqrt(list_dot_product(c.v, c.v))
                         * sqrt(list_dot_product(ct.centroid, ct.centroid))), 9)
                      DESC, ct.cell_id ASC) AS rn
                FROM cells c CROSS JOIN cents ct
              ) WHERE rn = 1
            ),
            probe AS (
              SELECT query_id, cell_id FROM (
                SELECT q.query_id, ct.cell_id,
                  ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                    round(list_dot_product(ct.centroid, q.qv)
                      / (sqrt(list_dot_product(ct.centroid, ct.centroid))
                         * sqrt(list_dot_product(q.qv, q.qv))), 9)
                      DESC, ct.cell_id ASC) AS rn
                FROM cents ct CROSS JOIN q
              ) WHERE rn <= 2
            ),
            approx AS (
              SELECT query_id, vec_id FROM (
                SELECT p.query_id, a.vec_id,
                  ROW_NUMBER() OVER (PARTITION BY p.query_id ORDER BY
                    round(list_dot_product(a.v, q.qv)
                      / (sqrt(list_dot_product(a.v, a.v))
                         * sqrt(list_dot_product(q.qv, q.qv))), 6)
                      DESC, a.vec_id ASC) AS rn
                FROM probe p
                JOIN assigned a USING (cell_id)
                JOIN q ON q.query_id = p.query_id
              ) WHERE rn <= 10
            ),
            truth AS (
              SELECT query_id, vec_id FROM (
                SELECT q.query_id, e.vec_id,
                  ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                    round(list_dot_product(e.v, q.qv)
                      / (sqrt(list_dot_product(e.v, e.v))
                         * sqrt(list_dot_product(q.qv, q.qv))), 6)
                      DESC, e.vec_id ASC) AS rn
                FROM e CROSS JOIN q
              ) WHERE rn <= 10
            )
            SELECT t.query_id,
              sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS n_hit,
              round(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                * 1.0 / 10, 6) AS recall
            FROM truth t LEFT JOIN approx a
              ON t.query_id = a.query_id AND t.vec_id = a.vec_id
            GROUP BY t.query_id
        """,
        "retrieval_recall": """
            WITH capc AS (
              SELECT doc_id AS id, t.i AS pos,
                (instr('0123456789abcdef', substring(md5(text), t.i, 1)) - 1)
                  / 7.5 - 1.0 AS x
              FROM documents, unnest(generate_series(1, 32)) AS t(i)
            ),
            imgq AS (
              SELECT vec_id AS id, t.i AS pos,
                     CAST(embedding[t.i] AS DOUBLE) AS x
              FROM embeddings, unnest(generate_series(1, 32)) AS t(i)
              WHERE vec_id % 8 = 0
            ),
            scores AS (
              SELECT iq.id AS image_id, cc.id AS cap_id,
                round(round(sum(iq.x * cc.x), 9)
                  / (sqrt(round(sum(iq.x * iq.x), 9))
                     * sqrt(round(sum(cc.x * cc.x), 9))), 6) AS s
              FROM imgq iq JOIN capc cc ON cc.pos = iq.pos
              GROUP BY 1, 2
            ),
            ranked AS (
              SELECT image_id, cap_id,
                     row_number() OVER (PARTITION BY image_id
                                        ORDER BY s DESC, cap_id ASC) AS rnk
              FROM scores
            ),
            own AS (SELECT image_id, rnk FROM ranked WHERE cap_id = image_id)
            SELECT count(*) AS n_queries,
              round(avg(CASE WHEN rnk <= 1 THEN 1.0 ELSE 0.0 END), 6) AS recall_at_1,
              round(avg(CASE WHEN rnk <= 5 THEN 1.0 ELSE 0.0 END), 6) AS recall_at_5,
              round(avg(CASE WHEN rnk <= 10 THEN 1.0 / rnk ELSE 0.0 END), 6) AS mrr_at_10
            FROM own
        """,
        "lsh_dedup_eval": """
            WITH words AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
              FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(i)
              WHERE len(ws) >= 3
            ),
            sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            truth AS (
              SELECT doc_a, doc_b
              FROM inter
              JOIN sizes sa ON doc_a = sa.doc_id
              JOIN sizes sb ON doc_b = sb.doc_id
              WHERE round(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.5
            ),
            rows_ AS (
              SELECT doc_id, h.hash_id, shingle
              FROM sh, unnest(generate_series(0, 7)) AS h(hash_id)
            ),
            sigs AS (
              SELECT doc_id, hash_id,
                     min(md5(hash_id || '|' || shingle)) AS sig
              FROM rows_ GROUP BY doc_id, hash_id
            ),
            bands AS (
              SELECT doc_id, hash_id // 2 AS band_id,
                     md5(array_to_string(list(sig ORDER BY hash_id), '|'))
                       AS band_sig
              FROM sigs GROUP BY doc_id, hash_id // 2
            ),
            pred AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a JOIN bands b
                ON a.band_id = b.band_id AND a.band_sig = b.band_sig
               AND a.doc_id < b.doc_id
            ),
            j AS (
              SELECT p.doc_a IS NOT NULL AS in_p, t.doc_a IS NOT NULL AS in_t
              FROM pred p FULL OUTER JOIN truth t
                ON p.doc_a = t.doc_a AND p.doc_b = t.doc_b
            )
            SELECT
              sum(CASE WHEN in_p THEN 1 ELSE 0 END) AS n_pred,
              sum(CASE WHEN in_t THEN 1 ELSE 0 END) AS n_truth,
              sum(CASE WHEN in_p AND in_t THEN 1 ELSE 0 END) AS n_hit,
              round(sum(CASE WHEN in_p AND in_t THEN 1 ELSE 0 END) * 1.0
                / nullif(sum(CASE WHEN in_p THEN 1 ELSE 0 END), 0), 6) AS precision,
              round(sum(CASE WHEN in_p AND in_t THEN 1 ELSE 0 END) * 1.0
                / nullif(sum(CASE WHEN in_t THEN 1 ELSE 0 END), 0), 6) AS recall,
              round(2.0 * sum(CASE WHEN in_p AND in_t THEN 1 ELSE 0 END)
                / nullif(sum(CASE WHEN in_p THEN 1 ELSE 0 END)
                         + sum(CASE WHEN in_t THEN 1 ELSE 0 END), 0), 6) AS f1
            FROM j
        """,
        "host_fairness": """
            WITH served AS (
              SELECT 'h' || (user_id % 23) AS host, count(*) AS n
              FROM events GROUP BY 1
            ),
            ranked AS (
              SELECT host AS k, CAST(n AS BIGINT) AS x,
                     row_number() OVER (ORDER BY n ASC, host ASC) AS i
              FROM served
            )
            SELECT count(*) AS n_keys, sum(x) AS total,
              round((sum(x) * sum(x)) * 1.0 / (count(*) * sum(x * x)), 6)
                AS jain_index,
              round((2 * sum(i * x) - (count(*) + 1) * sum(x)) * 1.0
                / (count(*) * sum(x)), 6) AS gini,
              round(max(x) * 1.0 / sum(x), 6) AS top_share
            FROM ranked
        """,
        "focused_priority": """
            WITH words AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ),
            toks AS (
              SELECT DISTINCT doc_id, ws[i] AS term
              FROM words, unnest(generate_series(1, len(ws))) AS t(i)
            ),
            rel AS (
              SELECT doc_id, count(*) / 4.0 AS relevance
              FROM toks
              WHERE term IN ('spark', 'query', 'stream', 'window')
              GROUP BY doc_id
            ),
            parent AS (
              SELECT d.doc_id AS src_id, coalesce(r.relevance, 0.0) AS relevance
              FROM documents d LEFT JOIN rel r ON d.doc_id = r.doc_id
            ),
            edges AS (
              SELECT doc_id AS src_id, doc_id - doc_id % 16 AS dst_id,
                     ws[1] AS anchor_term
              FROM words
            ),
            scored AS (
              SELECT e.dst_id,
                round(0.5 * p.relevance
                  + 0.5 * (CASE WHEN e.anchor_term IN
                            ('spark', 'query', 'stream', 'window')
                           THEN 1.0 ELSE 0.0 END), 6) AS score
              FROM edges e JOIN parent p ON e.src_id = p.src_id
            )
            SELECT dst_id, count(*) AS n_parents, max(score) AS best_priority,
                   round(avg(score), 6) AS avg_priority
            FROM scored GROUP BY dst_id
        """,
        "url_static_priority": f"""
            WITH f AS ({_FRONTIER_SQL}),
            urls AS (
              SELECT url || CASE
                  WHEN doc_id % 5 = 0 THEN '?session=' || doc_id || '&ref=' || (doc_id % 7)
                  WHEN doc_id % 5 = 1 THEN '/page/' || (doc_id % 13) || '/item/' || (doc_id % 29)
                  WHEN doc_id % 5 = 2 THEN '/index.html'
                  ELSE '' END AS url
              FROM f
            ),
            parts AS (
              SELECT url, regexp_replace(url, '^[a-z]+://[^/]*', '') AS path
              FROM urls
            ),
            split_q AS (
              SELECT url,
                regexp_replace(path, '\\?.*$', '') AS pre_q,
                CASE WHEN instr(path, '?') > 0
                     THEN regexp_replace(path, '^[^?]*\\?', '')
                     ELSE '' END AS query
              FROM parts
            ),
            feats AS (
              SELECT url,
                CAST(length(pre_q) - length(regexp_replace(pre_q, '/', '', 'g')) AS INT)
                  AS path_depth,
                CAST(CASE WHEN length(query) = 0 THEN 0
                     ELSE length(query) - length(regexp_replace(query, '=', '', 'g'))
                     END AS INT) AS n_params,
                round(length(regexp_replace(url, '[^0-9]', '', 'g')) * 1.0
                  / length(url), 6) AS digit_ratio
              FROM split_q
            )
            SELECT url, path_depth, n_params, digit_ratio,
              round((4.0 / (4.0 + path_depth)) * (2.0 / (2.0 + n_params))
                * (1.0 - digit_ratio / 2.0), 6) AS static_score
            FROM feats
        """,
        "rfc9309_gate": """
            WITH rules(host, pattern, like_pattern, allow) AS (
              VALUES ('h0', '/sec1*', '/sec1%%', FALSE),
                     ('h0', '/sec1/item7*', '/sec1/item7%%', TRUE),
                     ('h0', '*.html$', '%.html', FALSE),
                     ('h1', '/*', '/%%', FALSE),
                     ('h1', '/sec2*', '/sec2%%', TRUE),
                     ('h2', '*.html$', '%.html', TRUE),
                     ('h2', '*item3*', '%item3%%', FALSE)
            ),
            urls AS (
              SELECT doc_id AS url_hash,
                     'h' || CAST(doc_id % 3 AS VARCHAR) AS host,
                     '/sec' || CAST(doc_id % 5 AS VARCHAR)
                       || '/item' || CAST(doc_id % 11 AS VARCHAR)
                       || CASE WHEN doc_id % 4 = 0 THEN '.html' ELSE '' END
                       AS path
              FROM documents
            ),
            m AS (
              SELECT url_hash, pattern, allow,
                row_number() OVER (PARTITION BY url_hash
                  ORDER BY len(pattern) DESC, CAST(allow AS INT) DESC,
                           pattern DESC) AS rn
              FROM urls u JOIN rules r ON u.host = r.host
              WHERE u.path LIKE r.like_pattern ESCAPE '!'
            )
            SELECT u.url_hash, u.host, u.path,
                   coalesce(m.allow, TRUE) AS allowed,
                   m.pattern AS matched_pattern
            FROM urls u
            LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (url_hash)
        """,
        "robots_rule_usage": """
            WITH rules(host, pattern, like_pattern, allow) AS (
              VALUES ('h0', '/sec1*', '/sec1%', FALSE),
                     ('h0', '/sec1/item7*', '/sec1/item7%', TRUE),
                     ('h0', '*.html$', '%.html', FALSE),
                     ('h1', '/*', '/%', FALSE),
                     ('h1', '/sec2*', '/sec2%', TRUE),
                     ('h2', '*.html$', '%.html', TRUE),
                     ('h2', '*item3*', '%item3%', FALSE)
            ),
            urls AS (
              SELECT doc_id AS url_hash,
                     'h' || CAST(doc_id % 3 AS VARCHAR) AS host,
                     '/sec' || CAST(doc_id % 5 AS VARCHAR)
                       || '/item' || CAST(doc_id % 11 AS VARCHAR)
                       || CASE WHEN doc_id % 4 = 0 THEN '.html' ELSE '' END
                       AS path
              FROM documents
            ),
            m AS (
              SELECT url_hash, u.host, pattern, allow,
                row_number() OVER (PARTITION BY url_hash
                  ORDER BY len(pattern) DESC, CAST(allow AS INT) DESC,
                           pattern DESC) AS rn
              FROM urls u JOIN rules r ON u.host = r.host
              WHERE u.path LIKE r.like_pattern ESCAPE '!'
            ),
            decided AS (
              SELECT u.host,
                     coalesce(m.pattern, '<default>') AS pattern,
                     count(*) AS n_decided,
                     CAST(sum(CASE WHEN NOT coalesce(m.allow, TRUE)
                                   THEN 1 ELSE 0 END) AS BIGINT) AS n_denied
              FROM urls u
              LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (url_hash)
              GROUP BY 1, 2
            ),
            matched AS (
              SELECT u.host, r.pattern, count(*) AS n_matched
              FROM urls u JOIN rules r ON u.host = r.host
              WHERE u.path LIKE r.like_pattern ESCAPE '!'
              GROUP BY 1, 2
            )
            SELECT host, pattern,
                   coalesce(n_matched, 0) AS n_matched,
                   coalesce(n_decided, 0) AS n_decided,
                   coalesce(n_denied, 0) AS n_denied
            FROM matched
            FULL OUTER JOIN decided USING (host, pattern)
        """,
        "dsir_weights": """
            WITH t AS (
              SELECT doc_id, lang = 'en' AS is_t,
                unnest(list_filter(
                  string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
                  x -> len(x) > 0)) AS tok
              FROM documents
            ),
            db AS (
              SELECT doc_id,
                     CAST(concat('0x', substring(md5(tok), 1, 4)) AS INTEGER) % 256 AS b,
                     count(*) AS n, any_value(is_t) AS is_t
              FROM t GROUP BY doc_id, 2
            ),
            pb AS (
              SELECT b, sum(n) AS nc,
                     sum(CASE WHEN is_t THEN n ELSE 0 END) AS nt
              FROM db GROUP BY b
            ),
            tot AS (
              SELECT CAST(sum(nc) AS DOUBLE) AS c,
                     CAST(sum(nt) AS DOUBLE) AS tt
              FROM pb
            ),
            lm AS (
              SELECT b, round(ln((nt + 1.0) / (tt + 256.0))
                              - ln((nc + 1.0) / (c + 256.0)), 9) AS lr
              FROM pb CROSS JOIN tot
            )
            SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_toks,
                   floor(CAST(sum(CAST(n * lr AS DECIMAL(38,9))) AS DOUBLE)
                         * 1000000.0 + 0.5) / 1000000.0 AS logw
            FROM db JOIN lm USING (b) GROUP BY doc_id
        """,
        "host_cap_sample": """
            SELECT doc_id, source, rk FROM (
              SELECT doc_id, source,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                     ) AS rk
              FROM documents
            ) WHERE rk <= 10
        """,
        "semdedup": """
            WITH e AS (
              SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings
            ),
            cells AS (
              SELECT vec_id, v,
                (strpos('0123456789abcdef',
                        substr(md5(CAST(vec_id AS VARCHAR)), 1, 1)) - 1) % 8
                  AS cell_id
              FROM e
            ),
            means AS (
              SELECT cell_id, t.pos, round(avg(v[t.pos]), 9) AS m
              FROM cells, unnest(generate_series(1, len(v))) AS t(pos)
              GROUP BY cell_id, t.pos
            ),
            cents AS (
              SELECT cell_id, list(m ORDER BY pos) AS centroid
              FROM means GROUP BY cell_id
            ),
            assigned AS (
              SELECT vec_id, v, cell_id FROM (
                SELECT c.vec_id, c.v, ct.cell_id,
                  ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
                    round(list_dot_product(c.v, ct.centroid)
                      / (sqrt(list_dot_product(c.v, c.v))
                         * sqrt(list_dot_product(ct.centroid, ct.centroid))), 9)
                      DESC, ct.cell_id ASC) AS rn
                FROM cells c CROSS JOIN cents ct
              ) WHERE rn = 1
            ),
            scored AS (
              SELECT a.vec_id, a.cell_id, a.v,
                round(list_dot_product(a.v, ct.centroid)
                  / (sqrt(list_dot_product(a.v, a.v))
                     * sqrt(list_dot_product(ct.centroid, ct.centroid))), 9)
                  AS csim
              FROM assigned a JOIN cents ct USING (cell_id)
            ),
            rm AS (
              SELECT DISTINCT x.vec_id
              FROM scored x JOIN scored y
                ON x.cell_id = y.cell_id AND x.vec_id != y.vec_id
              WHERE round(list_dot_product(x.v, y.v)
                      / (sqrt(list_dot_product(x.v, x.v))
                         * sqrt(list_dot_product(y.v, y.v))), 9) >= 0.35
                AND (y.csim < x.csim
                     OR (y.csim = x.csim AND y.vec_id < x.vec_id))
            )
            SELECT s.vec_id, s.cell_id, s.csim,
                   (rm.vec_id IS NOT NULL) AS removed
            FROM scored s LEFT JOIN rm ON s.vec_id = rm.vec_id
        """,
        "hard_negative_captions": """
            WITH capc AS (
              SELECT doc_id AS id, t.i AS pos,
                (instr('0123456789abcdef', substring(md5(text), t.i, 1)) - 1)
                  / 7.5 - 1.0 AS x
              FROM documents, unnest(generate_series(1, 32)) AS t(i)
            ),
            imgc AS (
              SELECT vec_id AS id, t.i AS pos,
                     CAST(embedding[t.i] AS DOUBLE) AS x
              FROM embeddings, unnest(generate_series(1, 32)) AS t(i)
            ),
            capdot AS (
              SELECT id, p.p AS p,
                sum(x * (CASE WHEN substr(md5(p.p || '_' || (pos - 1)), 1, 1)
                              >= '8' THEN 1.0 ELSE -1.0 END)) AS dot
              FROM capc, unnest(generate_series(0, 15)) AS p(p)
              GROUP BY id, p.p
            ),
            imgdot AS (
              SELECT id, p.p AS p,
                sum(x * (CASE WHEN substr(md5(p.p || '_' || (pos - 1)), 1, 1)
                              >= '8' THEN 1.0 ELSE -1.0 END)) AS dot
              FROM imgc, unnest(generate_series(0, 15)) AS p(p)
              GROUP BY id, p.p
            ),
            capsig AS (
              SELECT id, CAST(p // 8 AS INT) AS band_id,
                     CAST(sum((CASE WHEN dot >= 0 THEN 1 ELSE 0 END)
                          * CAST(pow(2, p % 8) AS BIGINT)) AS BIGINT) AS band_val
              FROM capdot GROUP BY id, p // 8
            ),
            imgsig AS (
              SELECT id, CAST(p // 8 AS INT) AS band_id,
                     CAST(sum((CASE WHEN dot >= 0 THEN 1 ELSE 0 END)
                          * CAST(pow(2, p % 8) AS BIGINT)) AS BIGINT) AS band_val
              FROM imgdot GROUP BY id, p // 8
            ),
            cand AS (
              SELECT DISTINCT i.id AS image_id, c.id AS cap_id
              FROM imgsig i JOIN capsig c
                ON i.band_id = c.band_id AND i.band_val = c.band_val
               AND i.id != c.id
            ),
            scores AS (
              SELECT cand.image_id, cand.cap_id,
                round(round(sum(cc.x * ic.x), 9)
                  / (sqrt(round(sum(cc.x * cc.x), 9))
                     * sqrt(round(sum(ic.x * ic.x), 9))), 6) AS s
              FROM cand
              JOIN imgc ic ON ic.id = cand.image_id
              JOIN capc cc ON cc.id = cand.cap_id AND cc.pos = ic.pos
              GROUP BY cand.image_id, cand.cap_id
            ),
            neg AS (
              SELECT image_id, cap_id AS neg_id, s AS neg_score FROM (
                SELECT image_id, cap_id, s,
                       row_number() OVER (PARTITION BY image_id
                                          ORDER BY s DESC, cap_id ASC) AS rn
                FROM scores
              ) WHERE rn = 1
            ),
            own AS (
              SELECT ic.id AS image_id,
                round(round(sum(cc.x * ic.x), 9)
                  / (sqrt(round(sum(cc.x * cc.x), 9))
                     * sqrt(round(sum(ic.x * ic.x), 9))), 6) AS own_score
              FROM imgc ic JOIN capc cc ON cc.id = ic.id AND cc.pos = ic.pos
              GROUP BY ic.id
            )
            SELECT n.image_id, n.neg_id, n.neg_score, o.own_score,
                   round(o.own_score - n.neg_score, 6) AS margin
            FROM neg n JOIN own o USING (image_id)
        """,
        "bigram_pmi": """
            WITH words AS (
              SELECT doc_id,
                list_filter(
                  string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
                  t -> len(t) > 0) AS ws
              FROM documents
            ),
            uni AS (
              SELECT tok, count(*) AS n_uni
              FROM (SELECT unnest(ws) AS tok FROM words) GROUP BY tok
            ),
            uni_total AS (SELECT CAST(sum(n_uni) AS DOUBLE) AS uni_total FROM uni),
            bi AS (
              SELECT ws[i] AS tok_a, ws[i+1] AS tok_b, count(*) AS n_bi
              FROM words, unnest(generate_series(1, len(ws) - 1)) AS t(i)
              WHERE len(ws) >= 2
              GROUP BY 1, 2 HAVING count(*) >= 5
            ),
            bi_total AS (SELECT CAST(sum(n_bi) AS DOUBLE) AS bi_total FROM bi)
            SELECT tok_a, tok_b, n_bi,
                   round(ln((n_bi / bi_total)
                            / ((ua.n_uni / uni_total) * (ub.n_uni / uni_total))),
                         6) AS pmi
            FROM bi
            JOIN uni ua ON bi.tok_a = ua.tok
            JOIN uni ub ON bi.tok_b = ub.tok
            CROSS JOIN uni_total CROSS JOIN bi_total
            ORDER BY pmi DESC, tok_a ASC, tok_b ASC LIMIT 20
        """,
        "inverted_index": """
            WITH toks AS (
              SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id, unnest(
                  list_filter(
                    string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
                    t -> len(t) > 0)) AS tok
                FROM documents
              )
            )
            SELECT tok, count(*) AS df,
                   array_to_string(
                     list_transform(list_sort(list(doc_id))[1:10],
                                    x -> CAST(x AS VARCHAR)), ',') AS posting_sample
            FROM toks GROUP BY tok HAVING count(*) >= 2
        """,
        "lang_mixture": """
            WITH c AS (
              SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
            )
            SELECT lang, n_docs,
                   round(n_docs * 1.0 / sum(n_docs) OVER (), 6) AS p,
                   round(pow(n_docs * 1.0, 0.3)
                         / sum(pow(n_docs * 1.0, 0.3)) OVER (), 6) AS weight
            FROM c
        """,
        "stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE cast(concat('0x', substring(md5(cast(doc_id AS varchar)), 1, 4))
                       AS INTEGER)
                  < CASE lang WHEN 'en' THEN 32768
                              WHEN 'de' THEN 16384
                              ELSE 6553 END
        """,
        "asof_join_events": """
            WITH l AS (
              SELECT event_id, user_id, ts, value FROM events
              WHERE event_type = 'purchase'
            ),
            r AS (
              SELECT user_id, ts, max(value) AS value FROM events
              WHERE event_type = 'signup' GROUP BY user_id, ts
            )
            SELECT l.event_id, l.user_id, l.ts, l.value,
                   r.ts AS asof_ts, r.value AS asof_value
            FROM l ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "interval_join_events": """
            WITH i AS (
              SELECT event_id AS signup_id, ts AS start_ts,
                     ts + INTERVAL 1 HOUR AS end_ts
              FROM events WHERE event_type = 'signup'
            ),
            p AS (
              SELECT ts AS p_ts, value FROM events
              WHERE event_type = 'purchase'
            )
            SELECT signup_id, count(*) AS n_purchases,
                   round(sum(value), 6) AS sum_value
            FROM i JOIN p ON p_ts >= start_ts AND p_ts < end_ts
            GROUP BY signup_id
        """,
        "price_outliers": """
            WITH med AS (
              SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med
              FROM lineitem GROUP BY l_returnflag
            ),
            j AS (
              SELECT li.l_returnflag, med,
                     abs(l_extendedprice - med) AS adev
              FROM lineitem li JOIN med USING (l_returnflag)
            ),
            mad AS (
              SELECT l_returnflag, quantile_cont(adev, 0.5) AS mad
              FROM j GROUP BY l_returnflag
            )
            SELECT j.l_returnflag, count(*) AS n_rows,
                   CAST(sum(CASE WHEN adev > 3 * mad THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_outliers,
                   round(min(med), 6) AS med, round(min(mad), 6) AS mad
            FROM j JOIN mad USING (l_returnflag)
            GROUP BY j.l_returnflag
        """,
        "length_quantiles": """
            SELECT lang, count(*) AS n_docs,
                   round(quantile_cont(n_chars, 0.5), 6) AS p50,
                   round(quantile_cont(n_chars, 0.9), 6) AS p90
            FROM documents GROUP BY lang
        """,
        "forecast_revenue": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "priority_pipeline": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders o
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate <  TIMESTAMP '1997-07-01'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_returnflag = 'R')
            GROUP BY o_orderpriority
        """,
        "large_orders": """
            WITH big AS (
              SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING round(sum(l_quantity), 2) > 300
            )
            SELECT c_name, c_custkey, o_orderkey, o_totalprice, total_qty
            FROM big
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
        """,
        "enrich_fallback": """
            WITH base AS (SELECT c_custkey, c_nationkey AS nkey FROM customer),
            p AS (SELECT n_nationkey AS nkey, n_name AS val
                  FROM nation WHERE n_nationkey % 3 != 0),
            s AS (SELECT n_nationkey AS nkey, lower(n_name) AS val FROM nation)
            SELECT base.c_custkey, base.nkey,
                   coalesce(p.val, s.val) AS val,
                   CASE WHEN p.val IS NOT NULL THEN 'primary'
                        WHEN s.val IS NOT NULL THEN 'secondary'
                        ELSE 'none' END AS enrich_source
            FROM base
            LEFT JOIN p ON base.nkey = p.nkey
            LEFT JOIN s ON base.nkey = s.nkey
        """,
        "scenario_first_hit": """
            WITH base AS (
              SELECT doc_id,
                     source || '|' || lang AS sc0,
                     source AS sc1,
                     '*' AS sc2
              FROM documents
            ),
            lookup AS (
              SELECT DISTINCT q, upper(q) AS val FROM (
                SELECT source || '|' || lang AS q FROM documents WHERE lang = 'en'
                UNION
                SELECT source AS q FROM documents WHERE length(source) % 2 = 0
                UNION
                SELECT '*' AS q
              )
            ),
            exploded AS (
              SELECT doc_id, 0 AS pos, sc0 AS q FROM base
              UNION ALL SELECT doc_id, 1, sc1 FROM base
              UNION ALL SELECT doc_id, 2, sc2 FROM base
            ),
            hits AS (
              SELECT e.doc_id, e.pos, l.val
              FROM exploded e JOIN lookup l ON e.q = l.q
            )
            SELECT doc_id, arg_min(val, pos) AS hit_val,
                   CAST(min(pos) AS INT) AS hit_pos
            FROM hits GROUP BY doc_id
        """,
        "alias_resolve": """
            WITH m AS (
              SELECT alias, upper(alias) || '-C' AS canon FROM (
                SELECT DISTINCT source AS alias FROM documents
                WHERE length(source) = 4
                  AND substr(source, 4, 1) IN ('0','1','2','4','6','8')
                UNION
                SELECT DISTINCT lang AS alias FROM documents
                WHERE lang IN ('en', 'fr')
              )
            ),
            parts AS (
              SELECT doc_id, 0 AS pos, source AS part FROM documents
              UNION ALL
              SELECT doc_id, 1 AS pos, lang AS part FROM documents
            ),
            hits AS (
              SELECT p.doc_id, p.pos, 0 AS tier, m.canon
              FROM parts p JOIN m ON p.part = m.alias
              UNION ALL
              SELECT p.doc_id, p.pos, 1 AS tier, m.canon
              FROM parts p JOIN m
                ON p.part <> m.alias AND strpos(p.part, m.alias) > 0
            ),
            best AS (
              SELECT doc_id, canon, tier FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY doc_id ORDER BY pos, tier, canon) AS rn
                FROM hits
              ) WHERE rn = 1
            )
            SELECT d.doc_id,
              CASE WHEN b.canon IS NULL
                    AND strpos(d.source || ' ' || d.lang, 'z') > 0
                   THEN 'DEFAULT' ELSE b.canon END AS canon,
              CASE WHEN b.canon IS NULL
                    AND strpos(d.source || ' ' || d.lang, 'z') > 0
                   THEN -1 ELSE b.tier END AS tier
            FROM documents d LEFT JOIN best b USING (doc_id)
        """,
        "dim_upsert": """
            WITH incoming AS (
              SELECT DISTINCT n_regionkey
                + CASE WHEN n_nationkey % 5 = 0 THEN 10 ELSE 0 END AS rkey
              FROM nation
            )
            SELECT i.rkey,
                   coalesce(r.r_name, 'new-region-' || i.rkey) AS name,
                   CAST(CASE WHEN r.r_name IS NULL THEN 1 ELSE 0 END AS BIGINT)
                     AS is_new
            FROM incoming i
            LEFT JOIN region r ON i.rkey = r.r_regionkey
        """,
        "union_dedup_first_wins": """
            WITH both_src AS (
              SELECT event_id, value, 'old' AS src, 0 AS src_rank
              FROM events WHERE event_id % 2 = 0
              UNION ALL
              SELECT event_id, value, 'new' AS src, 1 AS src_rank
              FROM events WHERE event_id % 3 = 0
            )
            SELECT event_id, src, round(value, 4) AS value FROM (
              SELECT *, ROW_NUMBER() OVER (
                PARTITION BY event_id ORDER BY src_rank) AS rn
              FROM both_src
            ) WHERE rn = 1
        """,
        "pair_similarity": """
            WITH toks AS (
              SELECT doc_id, lang,
                list_distinct(list_filter(
                  string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
                  t -> length(t) > 0)) AS tk
              FROM documents
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              round(len(list_intersect(a.tk, b.tk)) * 1.0
                / greatest(len(list_distinct(list_concat(a.tk, b.tk))), 1), 6)
                AS jaccard,
              round(
                (CASE WHEN a.lang = b.lang THEN 0.6 ELSE 0.0 END)
                + (len(list_intersect(a.tk, b.tk)) * 1.0
                   / greatest(len(list_distinct(list_concat(a.tk, b.tk))), 1)) * 0.4,
                6) AS weighted
            FROM toks a JOIN toks b ON b.doc_id = a.doc_id + 1
        """,
        "range_scan": """
            SELECT rn, event_id, event_type, round(value, 4) AS value FROM (
              SELECT event_id, event_type, value,
                     ROW_NUMBER() OVER (ORDER BY event_id) AS rn
              FROM events
            ) WHERE rn > 100 AND rn <= 200
        """,
        "weighted_similarity": """
            WITH side AS (
              SELECT doc_id,
                CASE WHEN doc_id % 11 = 0 THEN NULL ELSE source END AS prov,
                lang AS city,
                source || (doc_id % 10) AS town,
                list_distinct(list_filter(
                  string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
                  t -> length(t) > 0)) AS det
              FROM documents
            ),
            pairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                (a.prov IS NOT NULL AND b.prov IS NOT NULL) AS prov_both,
                a.prov = b.prov AS prov_eq,
                a.city = b.city AS city_eq,
                a.town = b.town AS town_eq,
                regexp_replace(a.town, '[0-9]+', '', 'g')
                  = regexp_replace(b.town, '[0-9]+', '', 'g') AS town_fuzzy,
                (len(a.det) > 0 AND len(b.det) > 0) AS det_both,
                len(list_intersect(a.det, b.det)) * 1.0
                  / greatest(len(list_distinct(list_concat(a.det, b.det))), 1)
                  AS det_jac
              FROM side a JOIN side b ON b.doc_id = a.doc_id + 1
            ),
            sc AS (
              SELECT doc_a, doc_b,
                (CASE WHEN prov_both AND prov_eq THEN 3.0 ELSE 0.0 END)
                + (CASE WHEN city_eq THEN 3.0 ELSE 0.0 END)
                + (CASE WHEN town_eq THEN 2.0
                        WHEN town_fuzzy THEN 1.0 ELSE 0.0 END)
                + (CASE WHEN det_both THEN det_jac ELSE 0.0 END) AS earned,
                (CASE WHEN prov_both THEN 3.0 ELSE 0.0 END) + 3.0 + 2.0
                + (CASE WHEN det_both THEN 1.0 ELSE 0.0 END) AS total
              FROM pairs
            )
            SELECT doc_a, doc_b,
              round(CASE WHEN total > 0 THEN earned / total ELSE 0.0 END, 6)
                AS weighted_sim
            FROM sc
        """,
        "validated_match": """
            WITH lft AS (
              SELECT doc_id, source || '#' || (doc_id % 3) AS source_q, lang
              FROM documents
            ),
            dim AS (SELECT DISTINCT source, lang FROM documents)
            SELECT l.doc_id, l.source_q, d.source, l.lang
            FROM lft l
            JOIN dim d
              ON regexp_replace(l.source_q, '#[0-9]+$', '') = d.source
             AND l.lang = d.lang
             AND length(d.source) > 3
        """,
        "customer_order_counts": """
            SELECT c_count, count(*) AS custdist FROM (
              SELECT c_custkey, count(o_orderkey) AS c_count
              FROM customer
              LEFT JOIN orders
                ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey
            ) GROUP BY c_count
        """,
        "promo_revenue_share": """
            SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                 THEN l_extendedprice * (1 - l_discount)
                                 ELSE 0.0 END)
                         / sum(l_extendedprice * (1 - l_discount)), 4)
                     AS promo_share_pct,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                     AS total_revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-09-01'
              AND l_shipdate <  TIMESTAMP '1997-10-01'
        """,
        "disjunctive_bands": """
            SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15
                     AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 20
                     AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 25
                     AND l_quantity BETWEEN 20 AND 30)
        """,
        "lone_flagger_suppliers": """
            WITH pairs AS (
              SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
            ),
            r_pairs AS (
              SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
              WHERE l_returnflag = 'R'
            ),
            flagged AS (
              SELECT r.l_orderkey, r.l_suppkey FROM r_pairs r
              JOIN orders ON r.l_orderkey = o_orderkey
              WHERE o_orderstatus = 'F'
            )
            SELECT s_suppkey, s_name, count(*) AS numwait
            FROM flagged f
            JOIN supplier ON f.l_suppkey = s_suppkey
            WHERE EXISTS (
              SELECT 1 FROM pairs p
              WHERE p.l_orderkey = f.l_orderkey AND p.l_suppkey <> f.l_suppkey
            )
            AND NOT EXISTS (
              SELECT 1 FROM r_pairs r2
              WHERE r2.l_orderkey = f.l_orderkey AND r2.l_suppkey <> f.l_suppkey
            )
            GROUP BY s_suppkey, s_name
        """,
        "top_supplier_revenue": """
            WITH rev AS (
              SELECT l_suppkey,
                     round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                AND l_shipdate <  TIMESTAMP '1997-04-01'
              GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name, total_revenue
            FROM rev JOIN supplier ON l_suppkey = s_suppkey
            WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        """,
        "nation_acctbal_share": """
            WITH per AS (
              SELECT n_name, sum(s_acctbal) AS v
              FROM supplier JOIN nation ON s_nationkey = n_nationkey
              GROUP BY n_name
            ),
            tot AS (SELECT sum(v) AS t FROM per)
            SELECT n_name,
                   round(v, 2) AS acctbal_sum,
                   round(v / t * 100, 4) AS share_pct
            FROM per, tot
            WHERE v > 0.04 * t
        """,
        "revenue_ma7": """
            WITH daily AS (
              SELECT o_orderpriority, o_orderdate,
                     round(sum(o_totalprice), 2) AS day_total
              FROM orders GROUP BY o_orderpriority, o_orderdate
            )
            SELECT o_orderpriority, o_orderdate, day_total,
                   round(avg(day_total) OVER (
                     PARTITION BY o_orderpriority ORDER BY o_orderdate
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
                   ), 6) AS ma7
            FROM daily
        """,
        "referential_orphans": """
            SELECT 'orders->customer' AS edge, count(*) AS n_orphans
            FROM orders o WHERE NOT EXISTS (
              SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
            UNION ALL
            SELECT 'lineitem->orders', count(*) FROM lineitem l
            WHERE NOT EXISTS (
              SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
            UNION ALL
            SELECT 'lineitem->part', count(*) FROM lineitem l
            WHERE NOT EXISTS (
              SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
            UNION ALL
            SELECT 'lineitem->supplier', count(*) FROM lineitem l
            WHERE NOT EXISTS (
              SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
        """,
        "activity_islands": """
            WITH days AS (
              SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
            ),
            grouped AS (
              SELECT user_id, day,
                     day - CAST(ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY day
                     ) AS INTEGER) AS grp
              FROM days
            ),
            islands AS (
              SELECT user_id, grp, count(*) AS streak
              FROM grouped GROUP BY user_id, grp
            )
            SELECT user_id, count(*) AS n_islands,
                   max(streak) AS longest_streak
            FROM islands GROUP BY user_id
        """,
        "order_priority_cube": """
            SELECT o_orderstatus, o_orderpriority,
                   CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS total_price
            FROM orders
            GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
        "ntile_value_deciles": """
            SELECT event_type, decile, count(*) AS n,
                   round(min(value), 6) AS lo, round(max(value), 6) AS hi
            FROM (
              SELECT event_type, value,
                     CAST(ntile(10) OVER (
                       PARTITION BY event_type ORDER BY value, event_id
                     ) AS BIGINT) AS decile
              FROM events
            ) GROUP BY event_type, decile
        """,
        "event_user_setops": """
            WITH clickers AS (
              SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
            ),
            purchasers AS (
              SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
            )
            SELECT user_id, 'click_and_purchase' AS relation
            FROM (SELECT user_id FROM clickers
                  INTERSECT SELECT user_id FROM purchasers)
            UNION ALL
            SELECT user_id, 'click_not_purchase' AS relation
            FROM (SELECT user_id FROM clickers
                  EXCEPT SELECT user_id FROM purchasers)
        """,
        "skewed_join_counts": """
            WITH e AS (
              SELECT *,
                     CASE WHEN user_id % 4 < 3 THEN 0
                          ELSE CAST(user_id % 50 AS INTEGER) END AS k
              FROM events
            ),
            d AS (
              SELECT CAST(doc_id % 50 AS INTEGER) AS k, n_chars
              FROM documents WHERE doc_id % 5 = 0
            )
            SELECT k, count(*) AS n_pairs,
                   round(sum(value), 2) AS sum_value,
                   sum(n_chars) AS sum_chars
            FROM e JOIN d USING (k)
            GROUP BY k
        """,
        "rollup_event_stats": """
            SELECT event_type, user_id % 10 AS cohort,
                   count(*) AS n, round(sum(value), 2) AS total_value
            FROM events
            GROUP BY ROLLUP (event_type, (user_id % 10))
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_md5, min(doc_id) AS keep_id,
                   count(*) AS n_copies
            FROM documents GROUP BY md5(text)
        """,
        "dedup_minhash_sigs": """
            WITH words AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
              FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(i)
              WHERE len(ws) >= 3
            ),
            bands AS (
              SELECT doc_id, b.band_id, shingle
              FROM sh, unnest(generate_series(0, 3)) AS b(band_id)
            )
            SELECT doc_id, CAST(band_id AS INT) AS band_id,
                   min(md5(band_id || '|' || shingle)) AS sig
            FROM bands GROUP BY doc_id, band_id
        """,
        "bbit_minhash_est": """
            WITH words AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
              FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(i)
              WHERE len(ws) >= 3
            ),
            per_doc AS (
              SELECT doc_id, count(*) AS n_sh,
                     """
        + ",\n                     ".join(
            f"substr(min(md5('{i}|' || shingle)), 31, 2) AS b{i}"
            for i in range(16)
        )
        + """
              FROM sh GROUP BY doc_id
            ),
            inter AS (
              SELECT sa.doc_id AS doc_a, count(*) AS n_inter
              FROM sh sa JOIN sh sb
                ON sa.doc_id + 1 = sb.doc_id AND sa.shingle = sb.shingle
              GROUP BY 1
            ),
            matched AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     a.n_sh AS na, b.n_sh AS nb,
                     """
        + "\n                     + ".join(
            f"(CASE WHEN a.b{i} = b.b{i} THEN 1 ELSE 0 END)" for i in range(16)
        )
        + """ AS nm
              FROM per_doc a JOIN per_doc b ON a.doc_id + 1 = b.doc_id
            )
            SELECT m.doc_a, m.doc_b, CAST(m.nm AS INT) AS n_match,
                   ROUND(GREATEST(0.0,
                     (m.nm / 16.0 - 1.0/256.0) / (1.0 - 1.0/256.0)), 6) AS j_est,
                   ROUND(COALESCE(i.n_inter, 0)
                     / (m.na + m.nb - COALESCE(i.n_inter, 0)), 6) AS j_exact
            FROM matched m LEFT JOIN inter i ON i.doc_a = m.doc_a
        """,
        "oph_signatures": """
            WITH words AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
              FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(i)
              WHERE len(ws) >= 3
            ),
            binmins AS (
              SELECT doc_id,
                     instr('0123456789abcdef', substr(md5(shingle), 32, 1)) - 1 AS bin,
                     min(md5(shingle)) AS v
              FROM sh GROUP BY 1, 2
            ),
            grid AS (
              SELECT doc_id, j
              FROM (SELECT DISTINCT doc_id FROM binmins),
                   unnest(generate_series(0, 15)) AS t(j)
            ),
            borrow AS (
              SELECT g.doc_id, g.j, b.v,
                     CAST((b.bin - g.j + 16) % 16 AS INT) AS t,
                     ROW_NUMBER() OVER (
                       PARTITION BY g.doc_id, g.j
                       ORDER BY (b.bin - g.j + 16) % 16) AS rn
              FROM grid g JOIN binmins b ON b.doc_id = g.doc_id
            )
            SELECT doc_id, CAST(j AS INT) AS bin, t, v AS sig
            FROM borrow WHERE rn = 1
        """,
        "oph_jaccard_est": """
            WITH words AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
              FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(i)
              WHERE len(ws) >= 3
            ),
            binmins AS (
              SELECT doc_id,
                     instr('0123456789abcdef', substr(md5(shingle), 32, 1)) - 1 AS bin,
                     min(md5(shingle)) AS v
              FROM sh GROUP BY 1, 2
            ),
            grid AS (
              SELECT doc_id, j
              FROM (SELECT DISTINCT doc_id FROM binmins),
                   unnest(generate_series(0, 15)) AS t(j)
            ),
            borrow AS (
              SELECT g.doc_id, g.j, b.v,
                     CAST((b.bin - g.j + 16) % 16 AS INT) AS t,
                     ROW_NUMBER() OVER (
                       PARTITION BY g.doc_id, g.j
                       ORDER BY (b.bin - g.j + 16) % 16) AS rn
              FROM grid g JOIN binmins b ON b.doc_id = g.doc_id
            ),
            sigs AS (
              SELECT doc_id, j AS bin, t, v AS sig FROM borrow WHERE rn = 1
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(SUM(CASE WHEN a.t = b.t AND a.sig = b.sig
                            THEN 1 ELSE 0 END) AS INT) AS n_match,
                   ROUND(SUM(CASE WHEN a.t = b.t AND a.sig = b.sig
                             THEN 1 ELSE 0 END) / 16.0, 6) AS j_est
            FROM sigs a JOIN sigs b
              ON a.doc_id + 1 = b.doc_id AND a.bin = b.bin
            GROUP BY 1, 2
        """,
        "dedup_simhash": """
            WITH toks AS (
              SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id,
                  unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
                FROM documents
              ) WHERE length(tok) > 0
            ),
            votes AS (
              SELECT doc_id, b.bit,
                     CASE WHEN substr(md5(tok), b.bit + 1, 1) >= '8'
                          THEN 1 ELSE -1 END AS vote
              FROM toks, unnest(generate_series(0, 15)) AS b(bit)
            ),
            per_bit AS (
              SELECT doc_id, bit,
                     CASE WHEN sum(vote) > 0 THEN 1 ELSE 0 END AS b
              FROM votes GROUP BY doc_id, bit
            )
            SELECT doc_id,
                   CAST(sum(b * CAST(pow(2, bit) AS BIGINT)) AS BIGINT) AS simhash
            FROM per_bit GROUP BY doc_id
        """,
        "winnow_fingerprints": """
            WITH words AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ),
            grams AS (
              SELECT doc_id, i - 1 AS pos, len(ws) - 3 AS n_grams,
                     md5(array_to_string(ws[i:i+3], ' ')) AS g
              FROM words, unnest(generate_series(1, len(ws) - 3)) AS t(i)
              WHERE len(ws) >= 4
            ),
            keyed AS (
              SELECT doc_id, pos, n_grams,
                     g || '#' || lpad(CAST(99999999 - pos AS VARCHAR), 8, '0') AS key
              FROM grams
            ),
            sel AS (
              SELECT doc_id, n_grams, pos,
                     min(key) OVER (PARTITION BY doc_id ORDER BY pos
                                    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp_key
              FROM keyed
            ),
            fps AS (
              SELECT DISTINCT doc_id, n_grams, fp_key
              FROM sel WHERE pos <= n_grams - 4
            )
            SELECT doc_id, any_value(n_grams) AS n_grams, count(*) AS n_fps,
                   round(count(*) * 1.0 / (any_value(n_grams) - 4 + 1), 6) AS density
            FROM fps GROUP BY doc_id
        """,
        "winnow_cross_wave": """
            WITH words AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ),
            grams AS (
              SELECT doc_id, i - 1 AS pos, len(ws) - 3 AS n_grams,
                     md5(array_to_string(ws[i:i+3], ' ')) AS g
              FROM words, unnest(generate_series(1, len(ws) - 3)) AS t(i)
              WHERE len(ws) >= 4
            ),
            keyed AS (
              SELECT doc_id, pos, n_grams,
                     g || '#' || lpad(CAST(99999999 - pos AS VARCHAR), 8, '0') AS key
              FROM grams
            ),
            sel AS (
              SELECT doc_id, n_grams, pos,
                     min(key) OVER (PARTITION BY doc_id ORDER BY pos
                                    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp_key
              FROM keyed
            ),
            fps AS (
              SELECT DISTINCT doc_id, substr(fp_key, 1, 32) AS fp
              FROM sel WHERE pos <= n_grams - 4
            )
            SELECT n.doc_id AS new_doc, o.doc_id AS old_doc,
                   count(*) AS n_shared
            FROM fps n JOIN fps o ON n.fp = o.fp
            WHERE n.doc_id % 2 = 1 AND o.doc_id % 2 = 0
            GROUP BY 1, 2
        """,
        "winnow_overlap": """
            WITH words AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ),
            grams AS (
              SELECT doc_id, i - 1 AS pos, len(ws) - 3 AS n_grams,
                     md5(array_to_string(ws[i:i+3], ' ')) AS g
              FROM words, unnest(generate_series(1, len(ws) - 3)) AS t(i)
              WHERE len(ws) >= 4
            ),
            keyed AS (
              SELECT doc_id, pos, n_grams,
                     g || '#' || lpad(CAST(99999999 - pos AS VARCHAR), 8, '0') AS key
              FROM grams
            ),
            sel AS (
              SELECT doc_id, n_grams, pos,
                     min(key) OVER (PARTITION BY doc_id ORDER BY pos
                                    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp_key
              FROM keyed
            ),
            fps AS (
              SELECT DISTINCT doc_id, substr(fp_key, 1, 32) AS fp
              FROM sel WHERE pos <= n_grams - 4
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
            FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2
            HAVING count(*) >= 1
        """,
        "substring_overlap": """
            WITH words AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ),
            win AS (
              SELECT DISTINCT doc_id, md5(array_to_string(ws[i:i+4], ' ')) AS w_md5
              FROM words, unnest(generate_series(1, len(ws) - 4)) AS t(i)
              WHERE len(ws) >= 5
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
            FROM win a JOIN win b ON a.w_md5 = b.w_md5 AND a.doc_id < b.doc_id
            GROUP BY 1, 2
            HAVING count(*) >= 1
        """,
        "ngram_jaccard_pairs": """
            WITH words AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
              FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(i)
              WHERE len(ws) >= 3
            ),
            sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   round(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON doc_a = sa.doc_id
            JOIN sizes sb ON doc_b = sb.doc_id
            WHERE round(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.8
        """,
        "shingle_containment": """
            WITH words AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
              FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(i)
              WHERE len(ws) >= 3
            ),
            sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT doc_a, doc_b, n_inter,
                   round(n_inter * 1.0 / least(sa.n_sh, sb.n_sh), 6)
                     AS containment
            FROM inter
            JOIN sizes sa ON doc_a = sa.doc_id
            JOIN sizes sb ON doc_b = sb.doc_id
            WHERE round(n_inter * 1.0 / least(sa.n_sh, sb.n_sh), 6) >= 0.9
        """,
        "minhash_lsh_pairs": """
            WITH words AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
              FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(i)
              WHERE len(ws) >= 3
            ),
            bands AS (
              SELECT doc_id, b.band_id, shingle
              FROM sh, unnest(generate_series(0, 3)) AS b(band_id)
            ),
            sig AS (
              SELECT doc_id, band_id, min(md5(band_id || '|' || shingle)) AS sig
              FROM bands GROUP BY doc_id, band_id
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands
            FROM sig a
            JOIN sig b ON a.band_id = b.band_id AND a.sig = b.sig
                      AND a.doc_id < b.doc_id
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        "dedup_clusters": """
            WITH RECURSIVE words AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
              FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(i)
              WHERE len(ws) >= 3
            ),
            bands AS (
              SELECT doc_id, b.band_id, shingle
              FROM sh, unnest(generate_series(0, 3)) AS b(band_id)
            ),
            sig AS (
              SELECT doc_id, band_id, min(md5(band_id || '|' || shingle)) AS sig
              FROM bands GROUP BY doc_id, band_id
            ),
            pairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM sig a
              JOIN sig b ON a.band_id = b.band_id AND a.sig = b.sig
                        AND a.doc_id < b.doc_id
              GROUP BY 1, 2 HAVING count(*) >= 2
            ),
            e AS (
              SELECT doc_a AS s, doc_b AS t FROM pairs
              UNION
              SELECT doc_b AS s, doc_a AS t FROM pairs
            ),
            reach(s, t) AS (
              SELECT s, t FROM e
              UNION
              SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s
            )
            SELECT s AS doc_id, least(s, min(t)) AS cluster_id
            FROM reach GROUP BY s
        """,
        "dedup_impact": """
            WITH RECURSIVE words AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
              FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(i)
              WHERE len(ws) >= 3
            ),
            bands AS (
              SELECT doc_id, b.band_id, shingle
              FROM sh, unnest(generate_series(0, 3)) AS b(band_id)
            ),
            sig AS (
              SELECT doc_id, band_id, min(md5(band_id || '|' || shingle)) AS sig
              FROM bands GROUP BY doc_id, band_id
            ),
            pairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM sig a
              JOIN sig b ON a.band_id = b.band_id AND a.sig = b.sig
                        AND a.doc_id < b.doc_id
              GROUP BY 1, 2 HAVING count(*) >= 2
            ),
            e AS (
              SELECT doc_a AS s, doc_b AS t FROM pairs
              UNION
              SELECT doc_b AS s, doc_a AS t FROM pairs
            ),
            reach(s, t) AS (
              SELECT s, t FROM e
              UNION
              SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s
            ),
            clusters AS (
              SELECT s AS doc_id, least(s, min(t)) AS cluster_id
              FROM reach GROUP BY s
            ),
            toks AS (
              SELECT doc_id,
                CAST(len(list_filter(
                  string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
                  x -> len(x) > 0)) AS BIGINT) AS n_tok
              FROM documents
            ),
            cl AS (
              SELECT t.doc_id, t.n_tok,
                     coalesce(c.cluster_id, t.doc_id) AS cluster_id
              FROM toks t LEFT JOIN clusters c USING (doc_id)
            ),
            per_cluster AS (
              SELECT cluster_id, count(*) AS size,
                     CAST(sum(CASE WHEN doc_id != cluster_id THEN n_tok
                                   ELSE 0 END) AS BIGINT) AS tokens_removed
              FROM cl GROUP BY cluster_id
            )
            SELECT size, count(*) AS n_clusters,
                   CAST((size - 1) * count(*) AS BIGINT) AS docs_removed,
                   CAST(sum(tokens_removed) AS BIGINT) AS tokens_removed
            FROM per_cluster GROUP BY size
        """,
        "minhash_banded_pairs": """
            WITH words AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
              FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(i)
              WHERE len(ws) >= 3
            ),
            rows_ AS (
              SELECT doc_id, h.hash_id, shingle
              FROM sh, unnest(generate_series(0, 7)) AS h(hash_id)
            ),
            sigs AS (
              SELECT doc_id, hash_id,
                     min(md5(hash_id || '|' || shingle)) AS sig
              FROM rows_ GROUP BY doc_id, hash_id
            ),
            bands AS (
              SELECT doc_id, hash_id // 2 AS band_id,
                     md5(array_to_string(list(sig ORDER BY hash_id), '|'))
                       AS band_sig
              FROM sigs GROUP BY doc_id, hash_id // 2
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   count(*) AS n_bands
            FROM bands a JOIN bands b
              ON a.band_id = b.band_id AND a.band_sig = b.band_sig
             AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        """,
        "ngram_jaccard_capped": """
            WITH words AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
              FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(i)
              WHERE len(ws) >= 3
            ),
            sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
            rare AS (
              SELECT shingle FROM (
                SELECT shingle, count(*) AS df FROM sh GROUP BY shingle
              ) WHERE df <= 5
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM sh a
              JOIN rare r ON a.shingle = r.shingle
              JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            ),
            inter AS (
              SELECT c.doc_a, c.doc_b, count(*) AS n_inter
              FROM cand c
              JOIN sh a ON a.doc_id = c.doc_a
              JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
              GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   round(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON doc_a = sa.doc_id
            JOIN sizes sb ON doc_b = sb.doc_id
            WHERE round(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.8
        """,
        "lang_id": """
            WITH scored AS (
              SELECT doc_id, lang,
                len(list_intersect(list_distinct(
                  string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')),
                  ['the','and','of','to','in'])) AS s_en,
                len(list_intersect(list_distinct(
                  string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')),
                  ['el','la','de','que','los'])) AS s_es,
                len(list_intersect(list_distinct(
                  string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')),
                  ['le','la','les','des','est'])) AS s_fr,
                len(list_intersect(list_distinct(
                  string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')),
                  ['der','die','das','und','ist'])) AS s_de
              FROM documents
            )
            SELECT doc_id, lang,
              CASE
                WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                ELSE 'fr' END AS lang_pred,
              CAST(CASE WHEN lang = (CASE
                WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                ELSE 'fr' END) THEN 1 ELSE 0 END AS BIGINT) AS agree
            FROM scored
        """,
        "repetition_suite": """
            WITH words AS (
              SELECT doc_id,
                string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ),
            gr AS (
              SELECT doc_id, 3 AS n,
                     ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
              FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(i)
              WHERE len(ws) >= 3
              UNION ALL
              SELECT doc_id, 4 AS n,
                     ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
              FROM words, unnest(generate_series(1, len(ws) - 3)) AS t(i)
              WHERE len(ws) >= 4
              UNION ALL
              SELECT doc_id, 5 AS n,
                     ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
                           || ' ' || ws[i+4]
              FROM words, unnest(generate_series(1, len(ws) - 4)) AS t(i)
              WHERE len(ws) >= 5
            ),
            c AS (
              SELECT doc_id, n, gram, count(*) AS cnt
              FROM gr GROUP BY doc_id, n, gram
            ),
            p AS (
              SELECT doc_id, n,
                     -- CAST, not *1.0: decimal arithmetic would diverge
                     -- from Spark's double division under _pin
                     CAST(max(cnt) AS DOUBLE) / sum(cnt) AS top_ratio,
                     CAST(sum(CASE WHEN cnt >= 2 THEN len(gram) * cnt ELSE 0 END)
                          AS DOUBLE) / sum(len(gram) * cnt) AS dup_char_frac
              FROM c GROUP BY doc_id, n
            )
            SELECT doc_id,
              floor(max(CASE WHEN n = 3 THEN top_ratio END) * 1000000.0 + 0.5)
                / 1000000.0 AS top3_ratio,
              floor(max(CASE WHEN n = 4 THEN top_ratio END) * 1000000.0 + 0.5)
                / 1000000.0 AS top4_ratio,
              floor(max(CASE WHEN n = 5 THEN dup_char_frac END) * 1000000.0 + 0.5)
                / 1000000.0 AS dup5_char_frac
            FROM p GROUP BY doc_id
        """,
        "repetition_stats": """
            WITH words AS (
              SELECT doc_id,
                string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ),
            bg AS (
              SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bigram
              FROM words, unnest(generate_series(1, len(ws) - 1)) AS t(i)
              WHERE len(ws) >= 2
            ),
            c AS (SELECT doc_id, bigram, count(*) AS cnt FROM bg GROUP BY 1, 2)
            SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
                   round(max(cnt) * 1.0 / sum(cnt), 6) AS top_bigram_ratio
            FROM c GROUP BY doc_id
        """,
        "sequence_packing": """
            WITH t AS (
              SELECT doc_id,
                CAST(len(list_filter(
                  string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
                  x -> len(x) > 0)) AS BIGINT) AS n_tokens,
                doc_id % 32 AS bucket
              FROM documents
            ),
            r AS (
              SELECT *, sum(n_tokens) OVER (
                PARTITION BY bucket ORDER BY n_tokens DESC, doc_id
              ) AS cum FROM t
            )
            SELECT bucket,
                   CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS bin_id,
                   count(*) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS tokens_packed,
                   round(sum(n_tokens) / 512.0, 6) AS fill_ratio
            FROM r GROUP BY bucket, bin_id
        """,
        "join_key_skew": """
            WITH p1 AS (SELECT l_partkey AS k, count(*) AS n FROM lineitem GROUP BY 1),
            p2 AS (SELECT l_suppkey AS k, count(*) AS n FROM lineitem GROUP BY 1),
            p3 AS (SELECT o_custkey AS k, count(*) AS n FROM orders GROUP BY 1),
            p4 AS (SELECT user_id AS k, count(*) AS n FROM events GROUP BY 1)
            SELECT 'l_partkey' AS join_col, CAST(sum(n) AS BIGINT) AS n_rows,
                   count(*) AS n_keys,
                   round(max(n) * 1.0 / sum(n), 6) AS top_key_share,
                   round(max(n) * 1.0 / avg(n), 6) AS max_avg_ratio FROM p1
            UNION ALL
            SELECT 'l_suppkey', CAST(sum(n) AS BIGINT), count(*),
                   round(max(n) * 1.0 / sum(n), 6),
                   round(max(n) * 1.0 / avg(n), 6) FROM p2
            UNION ALL
            SELECT 'o_custkey', CAST(sum(n) AS BIGINT), count(*),
                   round(max(n) * 1.0 / sum(n), 6),
                   round(max(n) * 1.0 / avg(n), 6) FROM p3
            UNION ALL
            SELECT 'user_id', CAST(sum(n) AS BIGINT), count(*),
                   round(max(n) * 1.0 / sum(n), 6),
                   round(max(n) * 1.0 / avg(n), 6) FROM p4
        """,
        "corpus_health": """
            WITH base AS (
              SELECT lang,
                md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
                CASE WHEN n_words >= 50 AND n_words <= 100000
                      AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                      AND distinct_ratio >= 0.2 AND stop_hits >= 1
                     THEN 1 ELSE 0 END AS passes
              FROM (
                SELECT lang, text,
                  CAST(len(toks) AS INTEGER) AS n_words,
                  round(list_sum(list_transform(toks, t -> len(t))) * 1.0
                        / greatest(len(toks), 1), 6) AS mean_word_len,
                  round(len(list_distinct(toks)) * 1.0
                        / greatest(len(toks), 1), 6) AS distinct_ratio,
                  len(list_intersect(toks, ['the','and','of','to','in'])) AS stop_hits
                FROM (
                  SELECT lang, text,
                    list_filter(
                      string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
                      t -> len(t) > 0) AS toks
                  FROM documents
                )
              )
            ),
            core AS (
              SELECT count(*) AS n_docs, count(DISTINCT fp) AS n_unique,
                     sum(passes) AS n_pass
              FROM base
            ),
            lh AS (
              SELECT -sum(p * ln(p)) AS lang_entropy FROM (
                SELECT count(*) * 1.0 / (SELECT n_docs FROM core) AS p
                FROM base GROUP BY lang
              )
            )
            SELECT n_docs,
                   round((n_docs - n_unique) * 1.0 / n_docs, 6) AS dup_rate,
                   round(n_pass * 1.0 / n_docs, 6) AS gopher_pass_rate,
                   round(lang_entropy, 6) AS lang_entropy
            FROM core CROSS JOIN lh
        """,
        "null_safe_match": """
            WITH ev AS (
              SELECT event_id,
                     nullif(cast(json_extract(props, '$.k') AS BIGINT) % 7, 0) AS k
              FROM events
            ),
            l AS (SELECT k, count(*) AS n_left FROM ev
                  WHERE event_id % 2 = 0 GROUP BY k),
            r AS (SELECT k, count(*) AS n_right FROM ev
                  WHERE event_id % 2 = 1 GROUP BY k)
            SELECT l.k, n_left, n_right, n_left * n_right AS n_pairs
            FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
        """,
        "retention_cohorts": """
            WITH ev AS (
              SELECT user_id,
                     CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week
              FROM events
            ),
            first_ AS (
              SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id
            ),
            act AS (
              SELECT DISTINCT ev.user_id, cohort_week,
                     week - cohort_week AS week_offset
              FROM ev JOIN first_ USING (user_id)
            )
            SELECT cohort_week, week_offset, count(*) AS n_active
            FROM act GROUP BY cohort_week, week_offset
        """,
        "event_transitions": """
            WITH pairs AS (
              SELECT lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS prev_type,
                     event_type AS next_type
              FROM events
            ),
            c AS (
              SELECT prev_type, next_type, count(*) AS n
              FROM pairs WHERE prev_type IS NOT NULL
              GROUP BY prev_type, next_type
            )
            SELECT prev_type, next_type, n,
                   round(n * 1.0 / sum(n) OVER (PARTITION BY prev_type), 6) AS p
            FROM c
        """,
        "event_funnel": """
            WITH fv AS (
              SELECT user_id, min(ts) AS t_view FROM events
              WHERE event_type = 'view' GROUP BY user_id
            ),
            fc AS (
              SELECT e.user_id, min(e.ts) AS t_click
              FROM events e JOIN fv USING (user_id)
              WHERE e.event_type = 'click' AND e.ts > fv.t_view
              GROUP BY e.user_id
            ),
            fp AS (
              SELECT e.user_id, min(e.ts) AS t_purchase
              FROM events e JOIN fc USING (user_id)
              WHERE e.event_type = 'purchase' AND e.ts > fc.t_click
              GROUP BY e.user_id
            )
            SELECT '1_view' AS stage, count(*) AS n FROM fv
            UNION ALL
            SELECT '2_click_after_view', count(*) FROM fc
            UNION ALL
            SELECT '3_purchase_after_click', count(*) FROM fp
        """,
        "pii_redaction": f"""
            WITH seeded AS (
              SELECT doc_id,
                CASE {_hexdig_sql("cast(doc_id AS varchar)", 8)} % 4
                  WHEN 0 THEN text || ' contact user' || doc_id || '@example.com now'
                  WHEN 1 THEN text || ' call +1555' || lpad(cast(doc_id % 10000000 AS varchar), 7, '0')
                  WHEN 2 THEN text || ' from 10.' || (doc_id % 256) || '.0.' || ((doc_id * 7) % 256)
                  ELSE text
                END AS text
              FROM documents
            )
            SELECT doc_id,
              CAST(len(regexp_extract_all(text,
                '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{{2,}}')) AS INTEGER) AS n_emails,
              CAST(len(regexp_extract_all(text, '\\+[0-9]{{11}}')) AS INTEGER) AS n_phones,
              CAST(len(regexp_extract_all(text,
                '[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}')) AS INTEGER) AS n_ips,
              CAST(length(
                regexp_replace(regexp_replace(regexp_replace(text,
                  '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{{2,}}', '<EMAIL>', 'g'),
                  '\\+[0-9]{{11}}', '<PHONE>', 'g'),
                  '[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}', '<IP>', 'g')
              ) AS BIGINT) AS redacted_len
            FROM seeded
        """,
        "contamination_check": """
            WITH words AS (
              SELECT doc_id,
                string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ),
            grams AS (
              SELECT DISTINCT doc_id,
                ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' '
                || ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' || ws[i+7] AS shingle
              FROM words, unnest(generate_series(1, len(ws) - 7)) AS t(i)
              WHERE len(ws) >= 8
            ),
            ev AS (SELECT DISTINCT shingle FROM grams WHERE doc_id < 50)
            SELECT g.doc_id, count(*) AS n_shared_grams
            FROM grams g JOIN ev USING (shingle)
            WHERE g.doc_id >= 50
            GROUP BY g.doc_id
        """,
        "shard_skew": """
            WITH t AS (
              SELECT doc_id,
                CAST(len(list_filter(
                  string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
                  x -> len(x) > 0)) AS BIGINT) AS n_tokens,
                doc_id % 32 AS bucket
              FROM documents
            ),
            r AS (
              SELECT *, sum(n_tokens) OVER (
                PARTITION BY bucket ORDER BY n_tokens DESC, doc_id
              ) AS cum FROM t
            ),
            bins AS (
              SELECT bucket,
                     CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS bin_id,
                     round(sum(n_tokens) / 512.0, 6) AS fill_ratio
              FROM r GROUP BY bucket, bin_id
            ),
            ranked AS (
              SELECT CAST(fill_ratio AS DECIMAL(20,6)) AS x, fill_ratio,
                     row_number() OVER (
                       ORDER BY fill_ratio, bucket, bin_id) AS i
              FROM bins
            ),
            agg AS (
              SELECT count(*) AS n_bins,
                     round(quantile_cont(fill_ratio, 0.1), 6) AS p10_fill,
                     round(quantile_cont(fill_ratio, 0.5), 6) AS p50_fill,
                     round(quantile_cont(fill_ratio, 0.9), 6) AS p90_fill,
                     min(fill_ratio) AS min_fill,
                     max(fill_ratio) AS max_fill,
                     sum(x) AS sum_x,
                     sum(i * x) AS sum_ix
              FROM ranked
            )
            SELECT n_bins, p10_fill, p50_fill, p90_fill, min_fill, max_fill,
                   floor(CAST(2 * sum_ix - (n_bins + 1) * sum_x AS DOUBLE)
                         / CAST(n_bins * sum_x AS DOUBLE)
                         * 1000000.0 + 0.5) / 1000000.0 AS gini
            FROM agg
        """,
        "training_shards": """
            WITH base AS (
              SELECT doc_id, text,
                list_filter(
                  string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
                  t -> len(t) > 0) AS toks
              FROM documents
            ),
            gated AS (
              SELECT doc_id,
                     CAST(len(toks) AS BIGINT) AS n_tokens,
                     md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
              FROM (
                SELECT *,
                  CAST(len(toks) AS INTEGER) AS n_words,
                  round(list_sum(list_transform(toks, t -> len(t))) * 1.0
                        / greatest(len(toks), 1), 6) AS mean_word_len,
                  round(len(list_distinct(toks)) * 1.0
                        / greatest(len(toks), 1), 6) AS distinct_ratio,
                  len(list_intersect(toks, ['the','and','of','to','in'])) AS stop_hits
                FROM base
              )
              WHERE n_words >= 50 AND n_words <= 100000
                AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                AND distinct_ratio >= 0.2 AND stop_hits >= 1
            ),
            keep AS (SELECT fp, min(doc_id) AS doc_id FROM gated GROUP BY fp),
            deduped AS (
              SELECT g.doc_id, g.n_tokens, g.doc_id % 16 AS bucket
              FROM gated g JOIN keep k ON g.fp = k.fp AND g.doc_id = k.doc_id
            ),
            r AS (
              SELECT *, sum(n_tokens) OVER (
                PARTITION BY bucket ORDER BY n_tokens DESC, doc_id
              ) AS cum FROM deduped
            )
            SELECT bucket,
                   CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS bin_id,
                   count(*) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS tokens_packed
            FROM r GROUP BY bucket, bin_id
        """,
        "gopher_flags": """
            WITH base AS (
              SELECT doc_id,
                list_filter(
                  string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
                  t -> len(t) > 0) AS toks
              FROM documents
            ),
            r AS (
              SELECT doc_id,
                CAST(len(toks) AS INTEGER) AS n_words,
                round(list_sum(list_transform(toks, t -> len(t))) * 1.0
                      / greatest(len(toks), 1), 6) AS mean_word_len,
                round(len(list_distinct(toks)) * 1.0
                      / greatest(len(toks), 1), 6) AS distinct_ratio,
                CAST(len(list_intersect(toks, ['the','and','of','to','in']))
                     AS INTEGER) AS stop_hits
              FROM base
            )
            SELECT doc_id, n_words, mean_word_len, distinct_ratio, stop_hits,
                   (n_words >= 50 AND n_words <= 100000
                    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                    AND distinct_ratio >= 0.2 AND stop_hits >= 1) AS pass_gopher
            FROM r
        """,
        "quality_scores": """
            WITH base AS (
              SELECT doc_id, text, length(text) AS n,
                string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
              FROM documents
            ),
            r AS (
              SELECT doc_id,
                len(list_intersect(toks, ['the','and','of','to','in'])) * 1.0
                  / greatest(len(toks), 1) AS stop_ratio,
                length(regexp_replace(lower(text), '[^a-z ]', '', 'g')) * 1.0
                  / greatest(n, 1) AS alpha_ratio,
                length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) * 1.0
                  / greatest(n, 1) AS punct_ratio,
                CASE WHEN n >= 100 AND n <= 10000 THEN 1.0 ELSE 0.5 END AS len_band
              FROM base
            )
            SELECT doc_id,
              round(greatest(least(
                len_band * 0.4 + least(stop_ratio * 5, 1.0) * 0.3
                + alpha_ratio * 0.3 - punct_ratio * 0.2, 1.0), 0.0), 6) AS quality
            FROM r
        """,
        "quality_tradeoff": """
            WITH base AS (
              SELECT doc_id, text, length(text) AS n,
                string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
              FROM documents
            ),
            q AS (
              SELECT
                round(greatest(least(
                  (CASE WHEN n >= 100 AND n <= 10000 THEN 1.0 ELSE 0.5 END) * 0.4
                  + least(len(list_intersect(toks, ['the','and','of','to','in'])) * 1.0
                          / greatest(len(toks), 1) * 5, 1.0) * 0.3
                  + length(regexp_replace(lower(text), '[^a-z ]', '', 'g')) * 1.0
                    / greatest(n, 1) * 0.3
                  - length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) * 1.0
                    / greatest(n, 1) * 0.2, 1.0), 0.0), 6) AS quality,
                CAST(len(list_filter(toks, x -> len(x) > 0)) AS BIGINT) AS n_tok
              FROM base
            ),
            tot AS (SELECT CAST(sum(n_tok) AS DOUBLE) AS tot_tok FROM q)
            SELECT t.t AS threshold,
                   CAST(sum(CASE WHEN quality >= t.t THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_docs,
                   CAST(sum(CASE WHEN quality >= t.t THEN n_tok ELSE 0 END)
                        AS BIGINT) AS tokens_kept,
                   floor(CAST(sum(CASE WHEN quality >= t.t THEN n_tok ELSE 0 END)
                              AS DOUBLE) / tot_tok * 1000000.0 + 0.5)
                     / 1000000.0 AS token_frac
            FROM q CROSS JOIN tot,
                 (VALUES (CAST(0.0 AS DOUBLE)), (0.1), (0.2), (0.3), (0.4),
                         (0.5), (0.6), (0.7), (0.8), (0.9)) AS t(t)
            GROUP BY t.t, tot_tok
        """,
        "image_curriculum": f"""
            WITH meta AS ({_PAIR_META_SQL}),
            m AS (
              SELECT image_id, CAST(w AS BIGINT) * h AS px, n_tokens
              FROM meta
            ),
            cuts AS (
              SELECT round(quantile_cont(px, 0.25), 9) AS c1,
                     round(quantile_cont(px, 0.5), 9) AS c2,
                     round(quantile_cont(px, 0.75), 9) AS c3
              FROM m
            ),
            staged AS (
              SELECT px, n_tokens,
                     CASE WHEN px >= c3 THEN 1
                          WHEN px >= c2 THEN 2
                          WHEN px >= c1 THEN 3
                          ELSE 4 END AS stage
              FROM m CROSS JOIN cuts
            )
            SELECT stage, count(*) AS n_images,
                   floor(CAST(sum(px) AS DOUBLE) / (count(*) * 1048576.0)
                         * 1000000.0 + 0.5) / 1000000.0 AS mean_mpx,
                   CAST(sum(n_tokens) AS BIGINT) AS caption_tokens
            FROM staged GROUP BY stage
        """,
        "host_concentration": f"""
            WITH f AS ({_FRONTIER_SQL}),
            per_host AS (SELECT host, count(*) AS n FROM f GROUP BY host),
            tot AS (
              SELECT count(*) AS n_hosts, CAST(sum(n) AS BIGINT) AS total,
                     CAST(sum(n * n) AS BIGINT) AS sum_sq
              FROM per_host
            ),
            top3 AS (
              SELECT CAST(sum(n) AS BIGINT) AS top3_n,
                     CAST(max(n) AS BIGINT) AS top1_n
              FROM (SELECT n FROM per_host ORDER BY n DESC, host LIMIT 3)
            )
            SELECT n_hosts, total,
                   floor(CAST(sum_sq AS DOUBLE) / (total * total)
                         * 1000000.0 + 0.5) / 1000000.0 AS hhi,
                   floor(CAST(top1_n AS DOUBLE) / total
                         * 1000000.0 + 0.5) / 1000000.0 AS top1_share,
                   floor(CAST(top3_n AS DOUBLE) / total
                         * 1000000.0 + 0.5) / 1000000.0 AS top3_share
            FROM tot CROSS JOIN top3
        """,
        "token_stats": """
            SELECT doc_id,
              CAST(len(list_filter(
                string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
                t -> length(t) > 0)) AS BIGINT) AS n_tokens,
              CAST(len(list_filter(
                string_split_regex(lower(text), '[^a-z0-9]+'),
                t -> length(t) > 0))
                + length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
                AS BIGINT) AS n_subwords
            FROM documents
        """,
        "fingerprints": """
            SELECT doc_id,
              md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
            FROM documents
        """,
        "corpus_select": """
            WITH base AS (
              SELECT doc_id, text, length(text) AS n,
                string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
              FROM documents
            ),
            scored AS (
              SELECT doc_id,
                len(list_intersect(list_distinct(toks), ['the','and','of','to','in'])) AS s_en,
                len(list_intersect(list_distinct(toks), ['el','la','de','que','los'])) AS s_es,
                len(list_intersect(list_distinct(toks), ['le','la','les','des','est'])) AS s_fr,
                len(list_intersect(list_distinct(toks), ['der','die','das','und','ist'])) AS s_de,
                len(list_intersect(toks, ['the','and','of','to','in'])) * 1.0
                  / greatest(len(toks), 1) AS stop_ratio,
                length(regexp_replace(lower(text), '[^a-z ]', '', 'g')) * 1.0
                  / greatest(n, 1) AS alpha_ratio,
                length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) * 1.0
                  / greatest(n, 1) AS punct_ratio,
                CASE WHEN n >= 100 AND n <= 10000 THEN 1.0 ELSE 0.5 END AS len_band,
                CAST(len(list_filter(toks, t -> length(t) > 0)) AS BIGINT) AS n_tokens
              FROM base
            ),
            graded AS (
              SELECT doc_id,
                CASE
                  WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                  WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                  WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                  WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                  ELSE 'fr' END AS lang_pred,
                round(greatest(least(
                  len_band * 0.4 + least(stop_ratio * 5, 1.0) * 0.3
                  + alpha_ratio * 0.3 - punct_ratio * 0.2, 1.0), 0.0), 6) AS quality,
                n_tokens
              FROM scored
            ),
            keep AS (
              SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
            )
            SELECT g.doc_id, g.lang_pred, g.quality, g.n_tokens
            FROM graded g JOIN keep k ON g.doc_id = k.doc_id
            WHERE g.lang_pred != 'und' AND g.quality >= 0.55 AND g.n_tokens >= 5
        """,
        "vocab_topk": """
            WITH t AS (
              SELECT doc_id, tok FROM (
                SELECT doc_id,
                  unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
                FROM documents
              ) WHERE length(tok) > 0
            )
            SELECT tok, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs
            FROM t GROUP BY tok
            ORDER BY n_occ DESC, tok ASC LIMIT 50
        """,
        "tfidf_top": """
            WITH t AS (
              SELECT doc_id, tok FROM (
                SELECT doc_id,
                  unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
                FROM documents
              ) WHERE length(tok) > 0
            ),
            tf AS (
              SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY doc_id, tok
            ),
            df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
            n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
            scored AS (
              SELECT doc_id, tok, tf,
                     round(tf * ln(n.n * 1.0 / df), 6) AS score
              FROM tf JOIN df USING (tok), n
            )
            SELECT doc_id, tok AS top_tok, tf, score FROM (
              SELECT doc_id, tok, tf, score,
                ROW_NUMBER() OVER (PARTITION BY doc_id
                  ORDER BY score DESC, tf DESC, tok ASC) AS rn
              FROM scored
            ) WHERE rn = 1
        """,
        "image_pairs_select": f"""
            WITH meta AS ({_PAIR_META_SQL}),
            ok AS (
              SELECT * FROM meta
              WHERE w >= 64 AND h >= 64
                AND greatest(w, h) <= 3 * least(w, h)
                AND n_tokens >= 5
            ),
            keep AS (SELECT phash, min(image_id) AS image_id FROM ok GROUP BY phash)
            SELECT o.image_id, o.w, o.h, o.fmt, o.n_tokens, o.phash
            FROM ok o JOIN keep k ON o.phash = k.phash AND o.image_id = k.image_id
        """,
        "pair_corpus_stats": f"""
            WITH meta AS ({_PAIR_META_SQL}),
            shaped AS (
              SELECT *, CASE WHEN w > h THEN 'landscape'
                             WHEN w < h THEN 'portrait'
                             ELSE 'square' END AS orientation
              FROM meta
            )
            SELECT fmt, orientation, count(*) AS n_pairs,
                   round(avg(w), 6) AS avg_w, round(avg(h), 6) AS avg_h,
                   round(avg(n_tokens), 6) AS avg_tokens
            FROM shaped GROUP BY fmt, orientation
        """,
        "caption_alignment": """
            WITH cap AS (
              SELECT doc_id, md5(text) AS m FROM documents
            ),
            comp AS (
              SELECT c.doc_id,
                     (instr('0123456789abcdef', substring(c.m, i, 1)) - 1)
                       / 7.5 - 1.0 AS a,
                     CAST(e.embedding[i] AS DOUBLE) AS b
              FROM cap c
              JOIN embeddings e ON e.vec_id = c.doc_id,
              unnest(generate_series(1, 32)) AS t(i)
            ),
            scores AS (
              SELECT doc_id AS image_id,
                     round(round(sum(a * b), 9)
                           / (sqrt(round(sum(a * a), 9))
                              * sqrt(round(sum(b * b), 9))), 6)
                       AS align_score
              FROM comp GROUP BY doc_id
            )
            SELECT image_id, align_score, align_score >= 0.05 AS kept
            FROM scores
        """,
        "ar_bucket_batches": f"""
            WITH meta AS ({_PAIR_META_SQL}),
            banded AS (
              SELECT image_id, w, h,
                     CASE WHEN w > 2 * h THEN 'ultrawide'
                          WHEN w * 3 > h * 4 THEN 'wide'
                          WHEN h > 2 * w THEN 'ultratall'
                          WHEN h * 3 > w * 4 THEN 'tall'
                          ELSE 'square' END AS bucket
              FROM meta
            ),
            packed AS (
              SELECT *, CAST(floor((ROW_NUMBER() OVER (
                       PARTITION BY bucket ORDER BY image_id
                     ) - 1) / 32.0) AS BIGINT) AS batch_id
              FROM banded
            )
            SELECT bucket, batch_id, count(*) AS n_images,
                   min(image_id) AS first_id, max(image_id) AS last_id,
                   round(avg(CAST(w AS DOUBLE) / h), 6) AS avg_ar
            FROM packed GROUP BY bucket, batch_id
        """,
        "caption_stats_by_resolution": f"""
            WITH meta AS ({_PAIR_META_SQL})
            SELECT fmt,
                   CAST(length(bin(CAST(w AS BIGINT) * h)) - 1 AS INTEGER)
                     AS res_bucket,
                   count(*) AS n_pairs,
                   round(avg(n_tokens), 6) AS avg_tokens,
                   CAST(max(n_tokens) AS BIGINT) AS max_tokens
            FROM meta GROUP BY fmt, res_bucket
        """,
        "pair_caption_canonical": """
            WITH pairs AS (
              SELECT doc_id AS image_id,
                     substring(md5(cast(cast(floor(doc_id / 7) as bigint)
                       as varchar)), 1, 16) AS content_key,
                     concat('v', cast((instr('0123456789abcdef',
                       substring(md5(cast(doc_id as varchar)), 6, 1)) - 1)
                       % 3 as varchar), ':',
                       substring(md5(cast(cast(floor(doc_id / 7) as bigint)
                         as varchar)), 1, 16)) AS caption,
                     source
              FROM documents
            ),
            vc AS (
              SELECT content_key, caption, count(*) AS n
              FROM pairs GROUP BY content_key, caption
            ),
            ranked AS (
              SELECT content_key, caption, n,
                ROW_NUMBER() OVER (PARTITION BY content_key
                  ORDER BY n DESC, caption ASC) AS rn,
                MAX(n) OVER (PARTITION BY content_key) AS top_n,
                SUM(n) OVER (PARTITION BY content_key) AS n_pairs,
                COUNT(*) OVER (PARTITION BY content_key) AS n_variants
              FROM vc
            )
            SELECT content_key, caption AS canonical_caption,
                   CAST(n_pairs AS BIGINT) AS n_pairs,
                   CAST(n_variants AS BIGINT) AS n_variants,
                   round(top_n * 1.0 / n_pairs, 6) AS canonical_share
            FROM ranked WHERE rn = 1
        """,
        "caption_noise_by_source": """
            WITH pairs AS (
              SELECT doc_id AS image_id,
                     substring(md5(cast(cast(floor(doc_id / 7) as bigint)
                       as varchar)), 1, 16) AS content_key,
                     concat('v', cast((instr('0123456789abcdef',
                       substring(md5(cast(doc_id as varchar)), 6, 1)) - 1)
                       % 3 as varchar), ':',
                       substring(md5(cast(cast(floor(doc_id / 7) as bigint)
                         as varchar)), 1, 16)) AS caption,
                     source
              FROM documents
            ),
            vc AS (
              SELECT content_key, caption, count(*) AS n
              FROM pairs GROUP BY content_key, caption
            ),
            canon AS (
              SELECT content_key, caption AS canonical_caption
              FROM (
                SELECT content_key, caption,
                  ROW_NUMBER() OVER (PARTITION BY content_key
                    ORDER BY n DESC, caption ASC) AS rn
                FROM vc
              ) WHERE rn = 1
            ),
            tagged AS (
              SELECT p.source,
                     (p.caption <> c.canonical_caption) AS is_noise
              FROM pairs p JOIN canon c USING (content_key)
            )
            SELECT source, count(*) AS n_pairs,
                   CAST(sum(CASE WHEN is_noise THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_noise_pairs,
                   round(sum(CASE WHEN is_noise THEN 1.0 ELSE 0.0 END)
                     / count(*), 6) AS noise_rate
            FROM tagged GROUP BY source
        """,
        "dup_rate_by_source": """
            WITH fp AS (
              SELECT source,
                     md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS f,
                     count(*) AS n
              FROM documents GROUP BY source, f
            )
            SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
                   CAST(sum(n - 1) AS BIGINT) AS n_dup_docs,
                   round(sum(n - 1) * 1.0 / sum(n), 6) AS dup_rate
            FROM fp GROUP BY source
        """,
        "zorder_key": f"""
            WITH meta AS ({_PAIR_META_SQL})
            SELECT image_id, {_zvalue_duckdb_sql("w", "h", bits=12)} AS zkey
            FROM meta
        """,
        "hilbert_key": f"""
            WITH meta AS ({_PAIR_META_SQL}),
            {_hvalue_duckdb_ctes("meta", "w", "h", bits=12, out="hkey")}
            SELECT image_id, hkey FROM _hbout
        """,
        "image_dedup_keep_best": f"""
            WITH RECURSIVE meta AS ({_PAIR_META_SQL}),
            sigs AS (
              SELECT CAST(image_id AS BIGINT) AS image_id, phash AS sig FROM meta
              UNION ALL
              SELECT image_id + 1000000000, {_twin_sig_sql(1)} FROM meta
              UNION ALL
              SELECT image_id + 2000000000, {_twin_sig_sql(2)} FROM meta
            ),
            pairs AS (
              SELECT a.image_id AS s, b.image_id AS t
              FROM sigs a JOIN sigs b ON a.image_id < b.image_id
              WHERE bit_count(xor(a.sig, b.sig)) <= 7
            ),
            e AS (
              SELECT s, t FROM pairs
              UNION
              SELECT t AS s, s AS t FROM pairs
            ),
            reach(s, t) AS (
              SELECT s, t FROM e
              UNION
              SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s
            )
            , cl AS (
              SELECT s AS image_id, least(s, min(t)) AS cluster_id
              FROM reach GROUP BY s
            ),
            allr AS (
              SELECT s.image_id,
                     coalesce(c.cluster_id, s.image_id) AS cluster_id
              FROM sigs s LEFT JOIN cl c ON s.image_id = c.image_id
            ),
            sized AS (
              SELECT a.image_id, a.cluster_id, m.w, m.h,
                     row_number() OVER (
                       PARTITION BY a.cluster_id
                       ORDER BY m.w * m.h DESC, a.image_id
                     ) AS rn
              FROM allr a JOIN meta m
                ON a.image_id % 1000000000 = CAST(m.image_id AS BIGINT)
            )
            SELECT image_id, cluster_id, w, h, (rn = 1) AS kept FROM sized
        """,
        "image_dup_clusters": f"""
            WITH RECURSIVE meta AS ({_PAIR_META_SQL}),
            sigs AS (
              SELECT CAST(image_id AS BIGINT) AS image_id, phash AS sig FROM meta
              UNION ALL
              SELECT image_id + 1000000000, {_twin_sig_sql(1)} FROM meta
              UNION ALL
              SELECT image_id + 2000000000, {_twin_sig_sql(2)} FROM meta
            ),
            pairs AS (
              SELECT a.image_id AS s, b.image_id AS t
              FROM sigs a JOIN sigs b ON a.image_id < b.image_id
              WHERE bit_count(xor(a.sig, b.sig)) <= 7
            ),
            e AS (
              SELECT s, t FROM pairs
              UNION
              SELECT t AS s, s AS t FROM pairs
            ),
            reach(s, t) AS (
              SELECT s, t FROM e
              UNION
              SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s
            )
            SELECT s AS image_id, least(s, min(t)) AS cluster_id
            FROM reach GROUP BY s
        """,
        "embedding_centroids": """
            SELECT label, CAST(t.i - 1 AS INTEGER) AS dim,
                   round(avg(CAST(embedding[t.i] AS DOUBLE)), 6) AS centroid
            FROM embeddings,
                 unnest(generate_series(1, len(embedding))) AS t(i)
            GROUP BY label, dim
        """,
        "embedding_classifier": f"""
            WITH comp AS (
              SELECT vec_id, label,
                     CAST(embedding[i] AS DOUBLE)
                       * ([{", ".join(repr(w) for w in _clf64_weights())}][i]) AS p
              FROM embeddings, unnest(generate_series(1, 64)) AS t(i)
            ),
            s AS (
              SELECT vec_id, label, round(sum(p), 9) AS raw
              FROM comp GROUP BY vec_id, label
            )
            SELECT vec_id, label,
                   round(1.0 / (1.0 + exp(-raw)), 6) AS score,
                   round(1.0 / (1.0 + exp(-raw)), 6) > 0.5 AS flagged
            FROM s
        """,
        "embedding_quantization": """
            WITH m AS (
              SELECT vec_id, embedding,
                list_max(list_transform(embedding,
                  x -> abs(CAST(x AS DOUBLE)))) AS max_abs
              FROM embeddings
            )
            SELECT vec_id, round(max_abs, 6) AS max_abs,
              CAST(list_sum(list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE)
                     * (127.0 / greatest(max_abs, 1e-30)) + 0.5) AS BIGINT)))
                AS BIGINT) AS int8_checksum
            FROM m
        """,
        "kcenter_coreset": _kcenter_sql(k=6),
        "cosine_topk": """
            WITH q AS (
              SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
              FROM embeddings WHERE vec_id = 0
            ),
            scored AS (
              SELECT vec_id,
                round(
                  list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)), qv)
                  / (sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                           list_transform(embedding, x -> CAST(x AS DOUBLE))))
                     * sqrt(list_dot_product(qv, qv))), 6) AS cosine
              FROM embeddings, q
            )
            SELECT vec_id, cosine FROM scored WHERE vec_id != 0
            ORDER BY cosine DESC, vec_id ASC LIMIT 10
        """,
        "embedding_neardup_mp": """
            WITH e AS (
              SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings
            ),
            votes AS (
              SELECT vec_id, p.p, v[t.pos] AS x,
                CASE WHEN substr(md5(p.p || '_' || (t.pos - 1)), 1, 1) >= '8'
                     THEN 1.0 ELSE -1.0 END AS w
              FROM e,
                   unnest(generate_series(1, len(v))) AS t(pos),
                   unnest(generate_series(0, 15)) AS p(p)
            ),
            dots AS (
              SELECT vec_id, p,
                     sum(CAST(round(x * w, 9) AS DECIMAL(18,9))) AS dot
              FROM votes GROUP BY vec_id, p
            ),
            sig AS (
              SELECT vec_id, CAST(p // 4 AS INT) AS band_id,
                     CAST(sum((CASE WHEN dot >= 0 THEN 1 ELSE 0 END)
                          * CAST(pow(2, p % 4) AS BIGINT)) AS BIGINT) AS band_val
              FROM dots GROUP BY vec_id, p // 4
            ),
            fl AS (
              SELECT vec_id, CAST(p // 4 AS INT) AS band_id,
                     CAST(p % 4 AS BIGINT) AS flip_bit,
                     row_number() OVER (PARTITION BY vec_id, p // 4
                                        ORDER BY abs(dot), p) AS rn
              FROM dots
            ),
            probe AS (
              SELECT vec_id, band_id, band_val FROM sig
              UNION ALL
              SELECT s.vec_id, s.band_id,
                     xor(s.band_val, CAST(pow(2, f.flip_bit) AS BIGINT))
              FROM sig s JOIN fl f
                ON s.vec_id = f.vec_id AND s.band_id = f.band_id AND f.rn = 1
            ),
            cand AS (
              SELECT DISTINCT least(a.vec_id, b.vec_id) AS id_a,
                              greatest(a.vec_id, b.vec_id) AS id_b
              FROM probe a JOIN sig b
                ON a.band_id = b.band_id AND a.band_val = b.band_val
               AND a.vec_id != b.vec_id
            )
            SELECT id_a, id_b,
                   round(list_dot_product(ea.v, eb.v)
                     / (sqrt(list_dot_product(ea.v, ea.v))
                        * sqrt(list_dot_product(eb.v, eb.v))), 6) AS cosine
            FROM cand
            JOIN e ea ON id_a = ea.vec_id
            JOIN e eb ON id_b = eb.vec_id
            WHERE round(list_dot_product(ea.v, eb.v)
                  / (sqrt(list_dot_product(ea.v, ea.v))
                     * sqrt(list_dot_product(eb.v, eb.v))), 6) >= 0.35
        """,
        "embedding_neardup": """
            WITH e AS (
              SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings
            ),
            votes AS (
              SELECT vec_id, p.p, v[t.pos] AS x,
                CASE WHEN substr(md5(p.p || '_' || (t.pos - 1)), 1, 1) >= '8'
                     THEN 1.0 ELSE -1.0 END AS w
              FROM e,
                   unnest(generate_series(1, len(v))) AS t(pos),
                   unnest(generate_series(0, 15)) AS p(p)
            ),
            dots AS (
              SELECT vec_id, p, sum(x * w) AS dot FROM votes GROUP BY vec_id, p
            ),
            sig AS (
              SELECT vec_id, CAST(p // 4 AS INT) AS band_id,
                     CAST(sum((CASE WHEN dot >= 0 THEN 1 ELSE 0 END)
                          * CAST(pow(2, p % 4) AS BIGINT)) AS BIGINT) AS band_val
              FROM dots GROUP BY vec_id, p // 4
            ),
            cand AS (
              SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
              FROM sig a JOIN sig b
                ON a.band_id = b.band_id AND a.band_val = b.band_val
               AND a.vec_id < b.vec_id
            )
            SELECT id_a, id_b,
                   round(list_dot_product(ea.v, eb.v)
                     / (sqrt(list_dot_product(ea.v, ea.v))
                        * sqrt(list_dot_product(eb.v, eb.v))), 6) AS cosine
            FROM cand
            JOIN e ea ON id_a = ea.vec_id
            JOIN e eb ON id_b = eb.vec_id
            WHERE round(list_dot_product(ea.v, eb.v)
                  / (sqrt(list_dot_product(ea.v, ea.v))
                     * sqrt(list_dot_product(eb.v, eb.v))), 6) >= 0.35
        """,
        "dedup_simhash64": """
            WITH toks AS (
              SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id,
                  unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
                FROM documents
              ) WHERE length(tok) > 0
            ),
            hs AS (SELECT doc_id, md5(tok) AS h FROM toks),
            votes AS (
              SELECT doc_id, t.k,
                     CASE WHEN (((instr('0123456789abcdef',
                                        substr(h, (t.k // 4) + 1, 1)) - 1)
                                 >> (t.k % 4)) & 1) = 1
                          THEN 1 ELSE -1 END AS vote
              FROM hs, unnest(generate_series(0, 63)) AS t(k)
            ),
            per_bit AS (
              SELECT doc_id, k,
                     CASE WHEN sum(vote) > 0 THEN 1 ELSE 0 END AS b
              FROM votes GROUP BY doc_id, k
            )
            SELECT doc_id, CAST(k // 16 AS INT) AS band_id,
                   CAST(sum(b * CAST(pow(2, k % 16) AS BIGINT)) AS BIGINT)
                     AS band_val
            FROM per_bit GROUP BY doc_id, k // 16
        """,
        "simhash64_pairs": """
            WITH toks AS (
              SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id,
                  unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
                FROM documents
              ) WHERE length(tok) > 0
            ),
            hs AS (SELECT doc_id, md5(tok) AS h FROM toks),
            votes AS (
              SELECT doc_id, t.k,
                     CASE WHEN (((instr('0123456789abcdef',
                                        substr(h, (t.k // 4) + 1, 1)) - 1)
                                 >> (t.k % 4)) & 1) = 1
                          THEN 1 ELSE -1 END AS vote
              FROM hs, unnest(generate_series(0, 63)) AS t(k)
            ),
            per_bit AS (
              SELECT doc_id, k,
                     CASE WHEN sum(vote) > 0 THEN 1 ELSE 0 END AS b
              FROM votes GROUP BY doc_id, k
            ),
            sig AS (
              SELECT doc_id, CAST(k // 16 AS INT) AS band_id,
                     CAST(sum(b * CAST(pow(2, k % 16) AS BIGINT)) AS BIGINT)
                       AS band_val
              FROM per_bit GROUP BY doc_id, k // 16
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM sig a JOIN sig b
                ON a.band_id = b.band_id AND a.band_val = b.band_val
               AND a.doc_id < b.doc_id
            )
            SELECT doc_a, doc_b,
                   CAST(sum(bit_count(xor(sa.band_val, sb.band_val))) AS BIGINT)
                     AS hamming
            FROM cand
            JOIN sig sa ON doc_a = sa.doc_id
            JOIN sig sb ON doc_b = sb.doc_id AND sa.band_id = sb.band_id
            GROUP BY doc_a, doc_b
            HAVING sum(bit_count(xor(sa.band_val, sb.band_val))) <= 3
        """,
        "cc_star_clusters": """
            WITH RECURSIVE toks AS (
              SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id,
                  unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
                FROM documents
              ) WHERE length(tok) > 0
            ),
            hs AS (SELECT doc_id, md5(tok) AS h FROM toks),
            votes AS (
              SELECT doc_id, t.k,
                     CASE WHEN (((instr('0123456789abcdef',
                                        substr(h, (t.k // 4) + 1, 1)) - 1)
                                 >> (t.k % 4)) & 1) = 1
                          THEN 1 ELSE -1 END AS vote
              FROM hs, unnest(generate_series(0, 63)) AS t(k)
            ),
            per_bit AS (
              SELECT doc_id, k,
                     CASE WHEN sum(vote) > 0 THEN 1 ELSE 0 END AS b
              FROM votes GROUP BY doc_id, k
            ),
            sig AS (
              SELECT doc_id, CAST(k // 16 AS INT) AS band_id,
                     CAST(sum(b * CAST(pow(2, k % 16) AS BIGINT)) AS BIGINT)
                       AS band_val
              FROM per_bit GROUP BY doc_id, k // 16
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM sig a JOIN sig b
                ON a.band_id = b.band_id AND a.band_val = b.band_val
               AND a.doc_id < b.doc_id
            ),
            pairs AS (
              SELECT doc_a, doc_b
              FROM cand
              JOIN sig sa ON doc_a = sa.doc_id
              JOIN sig sb ON doc_b = sb.doc_id AND sa.band_id = sb.band_id
              GROUP BY doc_a, doc_b
              HAVING sum(bit_count(xor(sa.band_val, sb.band_val))) <= 3
            ),
            e AS (
              SELECT doc_a AS s, doc_b AS t FROM pairs
              UNION
              SELECT doc_b AS s, doc_a AS t FROM pairs
            ),
            reach(s, t) AS (
              SELECT s, t FROM e
              UNION
              SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s
            )
            SELECT s AS doc_id, least(s, min(t)) AS cluster_id
            FROM reach GROUP BY s ORDER BY doc_id
        """,
        "trap_gate": """
            WITH u AS (
              SELECT doc_id,
                     'host-' || (doc_id % 20) || '.test' AS host,
                     CASE WHEN doc_id % 20 = 7 THEN
                            '/cal/' || repeat('2024/', CAST(doc_id % 6 AS INT) + 1) || 'p'
                          WHEN doc_id % 20 = 13 THEN '/p/' || doc_id
                          ELSE '/' || source || '/' ||
                               translate(CAST(doc_id % 64 AS VARCHAR),
                                         '0123456789', 'abcdefghij')
                               || '/item/' || doc_id END AS path
              FROM documents
            ),
            segs AS (
              SELECT doc_id, host,
                     list_filter(string_split(path, '/'), x -> len(x) > 0) AS sg,
                     regexp_replace(path, '[0-9]+', 'N', 'g') AS template
              FROM u
            ),
            per_seg AS (
              SELECT doc_id, seg, count(*) AS c
              FROM (SELECT doc_id, unnest(sg) AS seg FROM segs)
              GROUP BY doc_id, seg
            ),
            url_rep AS (
              SELECT doc_id, max(c) AS max_rep FROM per_seg GROUP BY doc_id
            ),
            sig AS (
              SELECT s.host, s.template, len(s.sg) AS depth,
                     coalesce(r.max_rep, 0) AS max_rep
              FROM segs s LEFT JOIN url_rep r USING (doc_id)
            ),
            tpl AS (
              SELECT host, template, count(*) AS n
              FROM sig GROUP BY host, template
            ),
            tph AS (
              SELECT host, count(*) AS n_templates,
                     max(n) AS max_urls_per_template
              FROM tpl GROUP BY host
            ),
            hh AS (
              SELECT host, count(*) AS n_urls,
                     max(max_rep) AS max_seg_repeat,
                     sum(depth) AS sd
              FROM sig GROUP BY host
            )
            SELECT h.host,
                   CAST(n_urls AS BIGINT) AS n_urls,
                   CAST(n_templates AS BIGINT) AS n_templates,
                   CAST(max_urls_per_template AS BIGINT) AS max_urls_per_template,
                   CAST(max_seg_repeat AS BIGINT) AS max_seg_repeat,
                   floor(CAST(sd AS DOUBLE) / n_urls * 1000000.0 + 0.5)
                     / 1000000.0 AS avg_path_depth,
                   (max_seg_repeat >= 3 OR max_urls_per_template >= 50)
                     AS trap_suspect
            FROM hh h JOIN tph t USING (host)
        """,
        "dup_line_gate": """
            WITH w AS (
              SELECT doc_id,
                     list_filter(
                       string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
                       x -> len(x) > 0) AS ws
              FROM documents
            ),
            l AS (
              SELECT doc_id,
                     array_to_string(ws[(i.i - 1) * 8 + 1 : (i.i - 1) * 8 + 8], ' ')
                       AS line
              FROM w,
                   unnest(generate_series(1, CAST(ceil(len(ws) / 8.0) AS INT)))
                     AS i(i)
              WHERE len(ws) > 0
            ),
            lc AS (
              SELECT doc_id, line, count(*) AS c, length(line) AS ch
              FROM l GROUP BY doc_id, line
            ),
            la AS (
              SELECT doc_id,
                     sum(c) AS n_lines,
                     sum(c - 1) AS dup_lines,
                     sum((c - 1) * ch) AS dup_chars,
                     sum(c * ch) AS tot_chars
              FROM lc GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(n_lines, 0) AS INT) AS n_lines,
                   floor(CAST(coalesce(dup_lines, 0) AS DOUBLE)
                         / greatest(coalesce(n_lines, 0), 1) * 1000000.0 + 0.5)
                     / 1000000.0 AS dup_line_frac,
                   floor(CAST(coalesce(dup_chars, 0) AS DOUBLE)
                         / greatest(coalesce(tot_chars, 0), 1) * 1000000.0 + 0.5)
                     / 1000000.0 AS dup_line_char_frac,
                   (floor(CAST(coalesce(dup_lines, 0) AS DOUBLE)
                          / greatest(coalesce(n_lines, 0), 1) * 1000000.0 + 0.5)
                      / 1000000.0 <= 0.30
                    AND
                    floor(CAST(coalesce(dup_chars, 0) AS DOUBLE)
                          / greatest(coalesce(tot_chars, 0), 1) * 1000000.0 + 0.5)
                      / 1000000.0 <= 0.20) AS pass_dup_lines
            FROM documents d LEFT JOIN la USING (doc_id)
        """,
        "curation_funnel": """
            WITH base AS (
              SELECT doc_id,
                list_filter(
                  string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
                  t -> len(t) > 0) AS toks
              FROM documents
            ),
            gop AS (
              SELECT doc_id,
                (len(toks) >= 50 AND len(toks) <= 100000
                 AND round(list_sum(list_transform(toks, t -> len(t))) * 1.0
                           / greatest(len(toks), 1), 6) BETWEEN 3.0 AND 10.0
                 AND round(len(list_distinct(toks)) * 1.0
                           / greatest(len(toks), 1), 6) >= 0.2
                 AND len(list_intersect(toks, ['the','and','of','to','in'])) >= 1
                ) AS pass_gopher
              FROM base
            ),
            bg AS (
              SELECT doc_id, toks[i.i] || ' ' || toks[i.i + 1] AS gram
              FROM base, unnest(generate_series(1, len(toks) - 1)) AS i(i)
              WHERE len(toks) >= 2
            ),
            bgc AS (
              SELECT doc_id, gram, count(*) AS c FROM bg GROUP BY doc_id, gram
            ),
            top2 AS (
              SELECT doc_id,
                floor(CAST(max(c) AS DOUBLE) / sum(c) * 1000000.0 + 0.5)
                  / 1000000.0 AS r
              FROM bgc GROUP BY doc_id
            ),
            l AS (
              SELECT doc_id,
                array_to_string(toks[(i.i - 1) * 8 + 1 : (i.i - 1) * 8 + 8], ' ')
                  AS line
              FROM base,
                   unnest(generate_series(1, CAST(ceil(len(toks) / 8.0) AS INT)))
                     AS i(i)
              WHERE len(toks) > 0
            ),
            lc AS (
              SELECT doc_id, line, count(*) AS c, length(line) AS ch
              FROM l GROUP BY doc_id, line
            ),
            la AS (
              SELECT doc_id,
                (floor(CAST(sum(c - 1) AS DOUBLE) / greatest(sum(c), 1)
                       * 1000000.0 + 0.5) / 1000000.0 <= 0.30
                 AND
                 floor(CAST(sum((c - 1) * ch) AS DOUBLE)
                       / greatest(sum(c * ch), 1) * 1000000.0 + 0.5)
                   / 1000000.0 <= 0.20) AS pass_dl
              FROM lc GROUP BY doc_id
            ),
            f AS (
              SELECT d.doc_id,
                CASE WHEN NOT g.pass_gopher THEN 'gopher'
                     WHEN coalesce(t.r, 0.0) > 0.20 THEN 'rep_top2'
                     WHEN NOT coalesce(la.pass_dl, TRUE) THEN 'dup_lines'
                     ELSE 'pass' END AS gate
              FROM documents d
              JOIN gop g USING (doc_id)
              LEFT JOIN top2 t USING (doc_id)
              LEFT JOIN la USING (doc_id)
            ),
            c AS (SELECT gate, count(*) AS n FROM f GROUP BY gate),
            gates(stage, gate) AS (
              VALUES (1, 'gopher'), (2, 'rep_top2'), (3, 'dup_lines'),
                     (4, 'pass')
            ),
            j AS (
              SELECT stage, gates.gate, coalesce(c.n, 0) AS n
              FROM gates LEFT JOIN c ON gates.gate = c.gate
            ),
            k AS (
              SELECT stage, gate,
                CAST(sum(n) OVER ()
                     - coalesce(sum(n) OVER (ORDER BY stage
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS BIGINT) AS n_reached,
                CAST(CASE WHEN gate = 'pass' THEN 0 ELSE n END AS BIGINT)
                  AS n_rejected
              FROM j
            )
            SELECT stage, gate, n_reached, n_rejected,
                   floor(CAST(n_reached - n_rejected AS DOUBLE)
                         / greatest(n_reached, 1) * 1000000.0 + 0.5)
                     / 1000000.0 AS survival
            FROM k ORDER BY stage
        """,
        "scenario_generate": """
            WITH base AS (
              SELECT doc_id,
                     source || ' ' || lang || ' ' || (doc_id % 7) AS q
              FROM documents
            ),
            scen AS (
              SELECT doc_id,
                list_concat(
                  list_transform(
                    generate_series(len(string_split(q, ' ')), 1, -1),
                    i -> array_to_string(string_split(q, ' ')[1:i], ' ')),
                  ['*']) AS scenarios
              FROM base
            ),
            exploded AS (
              SELECT doc_id, t.pos - 1 AS pos, scenarios[t.pos] AS q
              FROM scen, unnest(generate_series(1, len(scenarios))) AS t(pos)
            ),
            lookup AS (
              SELECT q, upper(q) AS val FROM (
                SELECT DISTINCT source || ' ' || lang AS q
                FROM documents WHERE lang = 'en'
                UNION
                SELECT DISTINCT source AS q
                FROM documents WHERE length(source) % 2 = 0
                UNION
                SELECT '*' AS q
              )
            ),
            hits AS (
              SELECT e.doc_id, e.pos, l.val
              FROM exploded e JOIN lookup l ON e.q = l.q
            )
            SELECT doc_id, arg_min(val, pos) AS hit_val,
                   CAST(min(pos) AS BIGINT) AS hit_pos
            FROM hits GROUP BY doc_id
        """,
        "domain_budget_rollup": """
            WITH hosts AS (
              SELECT doc_id,
                concat(
                  CASE WHEN (strpos('0123456789abcdef',
                         substr(md5(CAST(doc_id AS VARCHAR)), 8, 1)) - 1) % 3 = 0
                       THEN concat('img', CAST(doc_id % 4 AS VARCHAR), '.')
                       ELSE '' END,
                  'site-', CAST(doc_id % 10 AS VARCHAR), '.',
                  (['com', 'co.uk', 'test', 'org.uk'])[
                    (strpos('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR)), 9, 1)) - 1) % 4 + 1]
                ) AS host
              FROM documents
            ),
            sfx AS (
              SELECT unnest(['com', 'org', 'net', 'test', 'uk', 'co.uk',
                             'org.uk', 'jp', 'co.jp', 'io']) AS suffix
            ),
            lab AS (
              SELECT doc_id, host, string_split(host, '.') AS labels FROM hosts
            ),
            cand AS (
              SELECT doc_id, host, k.k,
                array_to_string(labels[len(labels) - k.k + 1 : len(labels)], '.')
                  AS cand_sfx
              FROM lab, unnest(generate_series(1, least(len(labels), 3))) AS k(k)
            ),
            matched AS (
              SELECT host, max(k) AS best_n
              FROM cand JOIN sfx ON cand_sfx = suffix
              GROUP BY host
            ),
            dom AS (
              SELECT l.doc_id, l.host,
                CASE WHEN m.best_n IS NOT NULL AND len(l.labels) > m.best_n
                     THEN array_to_string(
                       l.labels[len(l.labels) - m.best_n : len(l.labels)], '.')
                     ELSE l.host END AS registrable_domain
              FROM lab l LEFT JOIN matched m ON l.host = m.host
            )
            SELECT registrable_domain, count(*) AS n_docs,
                   count(DISTINCT host) AS n_hosts
            FROM dom GROUP BY registrable_domain
        """,
        "adaptive_politeness": """
            WITH outcomes AS (
              SELECT 'host-' || CAST(doc_id % 20 AS VARCHAR) AS host,
                     (strpos('0123456789abcdef',
                        substr(md5(CAST(doc_id AS VARCHAR)), 7, 1)) - 1) >= 4 AS ok
              FROM documents
            ),
            agg AS (
              SELECT host, count(*) AS n,
                     sum(CASE WHEN ok THEN 0 ELSE 1 END) AS n_fail
              FROM outcomes GROUP BY host
            )
            SELECT host, n, n_fail,
                   CAST(CASE WHEN n_fail * 10 > n * 2
                        THEN greatest(1, CAST(floor(8 / 2.0) AS INTEGER))
                        ELSE least(32, 10) END AS INTEGER) AS next_budget,
                   CAST(floor(1000.0 * (1.0 + 9.0 * n_fail / n)) AS BIGINT)
                     AS next_delay_ms
            FROM agg
        """,
        "sitemap_coverage": f"""
            WITH flagged AS (
              SELECT doc_id % 20 AS host_id,
                     CASE WHEN {_hexdig_sql("cast(doc_id AS varchar)", 8)} < 12
                          THEN 1 ELSE 0 END AS listed,
                     CASE WHEN {_hexdig_sql("cast(doc_id AS varchar)", 9)} < 10
                          THEN 1 ELSE 0 END AS discovered
              FROM documents
            ),
            agg AS (
              SELECT host_id,
                     cast(sum(listed) AS BIGINT) AS n_listed,
                     cast(sum(discovered) AS BIGINT) AS n_discovered,
                     cast(sum(listed * discovered) AS BIGINT) AS n_both
              FROM flagged GROUP BY host_id
            )
            SELECT host_id, n_listed, n_discovered, n_both,
                   CASE WHEN n_listed = 0 THEN 0.0
                        ELSE floor(cast(n_both AS DOUBLE)
                                   / cast(n_listed AS DOUBLE)
                                   * 1000000.0 + 0.5) / 1000000.0
                   END AS coverage,
                   CASE WHEN n_discovered = 0 THEN 0.0
                        ELSE floor(cast(n_discovered - n_both AS DOUBLE)
                                   / cast(n_discovered AS DOUBLE)
                                   * 1000000.0 + 0.5) / 1000000.0
                   END AS orphan_rate
            FROM agg
        """,
        "sitemap_ingest": """
            WITH entries AS (
              SELECT 'host-' || CAST(doc_id % 20 AS VARCHAR) AS host,
                     'http://host-' || CAST(doc_id % 20 AS VARCHAR)
                       || '.test/doc/' || CAST(doc_id AS VARCHAR) AS loc,
                     '0.' || CAST((strpos('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR)), 6, 1)) - 1) % 10
                       AS VARCHAR) AS prio
              FROM documents
            ),
            xml AS (
              SELECT host,
                     '<urlset>' || string_agg(
                       '<url><loc>' || loc || '</loc><priority>' || prio
                         || '</priority></url>', '' ORDER BY loc, prio)
                       || '</urlset>' AS xml
              FROM entries GROUP BY host
            ),
            ent AS (
              SELECT host,
                     unnest(regexp_extract_all(xml, '<url>(.*?)</url>', 1))
                       AS entry
              FROM xml
            ),
            flat AS (
              SELECT host,
                     regexp_extract(entry, '<loc>([^<]*)</loc>', 1) AS loc,
                     CASE WHEN regexp_extract(entry,
                            '<priority>([^<]*)</priority>', 1) = ''
                          THEN 0.5
                          ELSE CAST(regexp_extract(entry,
                            '<priority>([^<]*)</priority>', 1) AS DOUBLE)
                     END AS priority
              FROM ent
            )
            SELECT host, loc, priority, rk FROM (
              SELECT *, ROW_NUMBER() OVER (
                PARTITION BY host ORDER BY priority DESC, loc ASC) AS rk
              FROM flat WHERE loc <> ''
            ) WHERE rk <= 3
        """,
        "pq_adc_topk": """
            WITH e AS (
              SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings
            ),
            sub AS (
              SELECT vec_id, t.m, v[t.m * 16 + 1 : t.m * 16 + 16] AS subv
              FROM e, (SELECT unnest(generate_series(0, 3)) AS m) t
            ),
            g AS (
              SELECT *, (strpos('0123456789abcdef',
                substr(md5(concat(CAST(vec_id AS VARCHAR), ':', CAST(m AS VARCHAR))), 1, 1)) - 1) % 16
                  AS code_id
              FROM sub
            ),
            means AS (
              SELECT m, code_id, t.pos, round(avg(subv[t.pos]), 9) AS c
              FROM g, unnest(generate_series(1, len(subv))) AS t(pos)
              GROUP BY m, code_id, t.pos
            ),
            cb AS (
              SELECT m, code_id, list(c ORDER BY pos) AS codeword
              FROM means GROUP BY m, code_id
            ),
            enc AS (
              SELECT s.vec_id, s.m, cb.code_id,
                CAST(floor(list_sum(list_transform(generate_series(1, len(s.subv)),
                  i -> (s.subv[i] - cb.codeword[i]) * (s.subv[i] - cb.codeword[i])))
                  * 1e9) AS BIGINT) AS d2_e9
              FROM sub s JOIN cb ON s.m = cb.m
            ),
            codes AS (
              SELECT vec_id, m, code_id AS code FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY vec_id, m ORDER BY d2_e9, code_id) AS rn
                FROM enc
              ) WHERE rn = 1
            ),
            q AS (SELECT m, subv AS qsub FROM sub WHERE vec_id = 0),
            qtab AS (
              SELECT cb.m, cb.code_id,
                CAST(floor(list_sum(list_transform(generate_series(1, len(q.qsub)),
                  i -> (q.qsub[i] - cb.codeword[i]) * (q.qsub[i] - cb.codeword[i])))
                  * 1e9) AS BIGINT) AS qd_e9
              FROM cb JOIN q ON cb.m = q.m
            )
            SELECT vec_id, CAST(sum(qd_e9) AS BIGINT) AS adc_e9
            FROM codes JOIN qtab ON codes.m = qtab.m AND codes.code = qtab.code_id
            GROUP BY vec_id
            ORDER BY adc_e9, vec_id LIMIT 10
        """,
        "ann_ivf_topk": """
            WITH e AS (
              SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings
            ),
            cells AS (
              SELECT vec_id, v,
                (strpos('0123456789abcdef',
                        substr(md5(CAST(vec_id AS VARCHAR)), 1, 1)) - 1) % 8
                  AS cell_id
              FROM e
            ),
            means AS (
              SELECT cell_id, t.pos, round(avg(v[t.pos]), 9) AS m
              FROM cells, unnest(generate_series(1, len(v))) AS t(pos)
              GROUP BY cell_id, t.pos
            ),
            cents AS (
              SELECT cell_id, list(m ORDER BY pos) AS centroid
              FROM means GROUP BY cell_id
            ),
            q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
            assigned AS (
              SELECT vec_id, v, cell_id FROM (
                SELECT c.vec_id, c.v, ct.cell_id,
                  ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
                    round(list_dot_product(c.v, ct.centroid)
                      / (sqrt(list_dot_product(c.v, c.v))
                         * sqrt(list_dot_product(ct.centroid, ct.centroid))), 9)
                      DESC, ct.cell_id ASC) AS rn
                FROM cells c CROSS JOIN cents ct
              ) WHERE rn = 1
            ),
            probe AS (
              SELECT cell_id FROM (
                SELECT ct.cell_id,
                  ROW_NUMBER() OVER (ORDER BY
                    round(list_dot_product(ct.centroid, q.qv)
                      / (sqrt(list_dot_product(ct.centroid, ct.centroid))
                         * sqrt(list_dot_product(q.qv, q.qv))), 9)
                      DESC, ct.cell_id ASC) AS rn
                FROM cents ct, q
              ) WHERE rn <= 3
            )
            SELECT a.vec_id,
                   round(list_dot_product(a.v, q.qv)
                     / (sqrt(list_dot_product(a.v, a.v))
                        * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
            FROM assigned a JOIN probe USING (cell_id), q
            ORDER BY cosine DESC, vec_id ASC LIMIT 10
        """,
        "ann_ivf_kmeans": """
            WITH e AS (
              SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings
            ),
            cells AS (
              SELECT vec_id, v,
                (strpos('0123456789abcdef',
                        substr(md5(CAST(vec_id AS VARCHAR)), 1, 1)) - 1) % 8
                  AS cell_id
              FROM e
            ),
            means0 AS (
              SELECT cell_id, t.pos, round(avg(v[t.pos]), 9) AS m
              FROM cells, unnest(generate_series(1, len(v))) AS t(pos)
              GROUP BY cell_id, t.pos
            ),
            cents0 AS (
              SELECT cell_id, list(m ORDER BY pos) AS centroid
              FROM means0 GROUP BY cell_id
            ),
            a1 AS (
              SELECT vec_id, v, cell_id FROM (
                SELECT c.vec_id, c.v, ct.cell_id,
                  ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
                    round(list_dot_product(c.v, ct.centroid)
                      / (sqrt(list_dot_product(c.v, c.v))
                         * sqrt(list_dot_product(ct.centroid, ct.centroid))), 9)
                      DESC, ct.cell_id ASC) AS rn
                FROM e c CROSS JOIN cents0 ct
              ) WHERE rn = 1
            ),
            means1 AS (
              SELECT cell_id, t.pos, round(avg(v[t.pos]), 9) AS m
              FROM a1, unnest(generate_series(1, len(v))) AS t(pos)
              GROUP BY cell_id, t.pos
            ),
            cents1 AS (
              SELECT cell_id, list(m ORDER BY pos) AS centroid
              FROM means1 GROUP BY cell_id
            ),
            a2 AS (
              SELECT vec_id, v, cell_id FROM (
                SELECT c.vec_id, c.v, ct.cell_id,
                  ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
                    round(list_dot_product(c.v, ct.centroid)
                      / (sqrt(list_dot_product(c.v, c.v))
                         * sqrt(list_dot_product(ct.centroid, ct.centroid))), 9)
                      DESC, ct.cell_id ASC) AS rn
                FROM e c CROSS JOIN cents1 ct
              ) WHERE rn = 1
            ),
            means2 AS (
              SELECT cell_id, t.pos, round(avg(v[t.pos]), 9) AS m
              FROM a2, unnest(generate_series(1, len(v))) AS t(pos)
              GROUP BY cell_id, t.pos
            ),
            cents2 AS (
              SELECT cell_id, list(m ORDER BY pos) AS centroid
              FROM means2 GROUP BY cell_id
            ),
            q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
            assigned AS (
              SELECT vec_id, v, cell_id FROM (
                SELECT c.vec_id, c.v, ct.cell_id,
                  ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
                    round(list_dot_product(c.v, ct.centroid)
                      / (sqrt(list_dot_product(c.v, c.v))
                         * sqrt(list_dot_product(ct.centroid, ct.centroid))), 9)
                      DESC, ct.cell_id ASC) AS rn
                FROM e c CROSS JOIN cents2 ct
              ) WHERE rn = 1
            ),
            probe AS (
              SELECT cell_id FROM (
                SELECT ct.cell_id,
                  ROW_NUMBER() OVER (ORDER BY
                    round(list_dot_product(ct.centroid, q.qv)
                      / (sqrt(list_dot_product(ct.centroid, ct.centroid))
                         * sqrt(list_dot_product(q.qv, q.qv))), 9)
                      DESC, ct.cell_id ASC) AS rn
                FROM cents2 ct, q
              ) WHERE rn <= 3
            )
            SELECT a.vec_id,
                   round(list_dot_product(a.v, q.qv)
                     / (sqrt(list_dot_product(a.v, a.v))
                        * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
            FROM assigned a JOIN probe USING (cell_id), q
            ORDER BY cosine DESC, vec_id ASC LIMIT 10
        """,
        "redirect_resolution": """
            WITH RECURSIVE e AS (
              SELECT doc_id AS src,
                     CASE WHEN doc_id % 100 IN (56, 57) THEN doc_id + 1
                          ELSE doc_id - 1 END AS dst
              FROM documents
              WHERE (doc_id % 100 BETWEEN 1 AND 12)
                 OR doc_id % 100 IN (56, 57, 58)
            ),
            walk(src, cur, hops) AS (
              SELECT src, dst, 1 FROM e
              UNION ALL
              SELECT w.src, e.dst, w.hops + 1
              FROM walk w JOIN e ON w.cur = e.src
              WHERE w.hops < 8
            ),
            parked AS (
              SELECT src, max_by(cur, hops) AS cur, max(hops) AS hops
              FROM walk GROUP BY src
            )
            SELECT p.src AS url_id,
                   CASE WHEN s.src IS NULL THEN p.cur END AS final,
                   CASE WHEN s.src IS NULL THEN p.hops END AS n_hops,
                   s.src IS NULL AS resolved
            FROM parked p
            LEFT JOIN (SELECT DISTINCT src FROM e) s ON p.cur = s.src
        """,
        "rolling_latency_anomaly": f"""
            WITH f AS ({_FRONTIER_SQL}),
            lat AS (
              SELECT host, discovery_seq AS seq,
                     CAST(50.0 + ({_hexdig_sql("cast(doc_id AS varchar)", 1)}
                                  * 16
                                  + {_hexdig_sql("cast(doc_id AS varchar)", 2)})
                            * 7.0
                          + priority * 100.0 AS DOUBLE) AS lat_ms
              FROM f
            ),
            w AS (
              SELECT host, seq, lat_ms,
                     median(lat_ms) OVER (
                       PARTITION BY host ORDER BY seq
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
                     ) AS roll_med
              FROM lat
            )
            SELECT host, seq, lat_ms, roll_med,
                   lat_ms > 3.0 * roll_med AS spike
            FROM w
        """,
        "redirect_aware_seen": """
            WITH RECURSIVE e AS (
              SELECT doc_id AS src,
                     CASE WHEN doc_id % 100 IN (56, 57) THEN doc_id + 1
                          ELSE doc_id - 1 END AS dst
              FROM documents
              WHERE (doc_id % 100 BETWEEN 1 AND 12)
                 OR doc_id % 100 IN (56, 57, 58)
            ),
            walk(src, cur, hops) AS (
              SELECT src, dst, 1 FROM e
              UNION ALL
              SELECT w.src, e.dst, w.hops + 1
              FROM walk w JOIN e ON w.cur = e.src
              WHERE w.hops < 8
            ),
            parked AS (
              SELECT src, max_by(cur, hops) AS cur FROM walk GROUP BY src
            ),
            res AS (
              SELECT p.src AS doc_id,
                     CASE WHEN s.src IS NULL THEN p.cur END AS final,
                     s.src IS NULL AS resolved
              FROM parked p
              LEFT JOIN (SELECT DISTINCT src FROM e) s ON p.cur = s.src
            ),
            j AS (
              SELECT d.doc_id, r.final, r.resolved,
                     (d.doc_id % 7 = 0) AS self_seen,
                     (r.final % 7 = 0) AS final_seen
              FROM (SELECT doc_id FROM documents) d
              LEFT JOIN res r USING (doc_id)
            ),
            cls AS (
              SELECT doc_id, final AS final_id,
                     CASE WHEN self_seen THEN 'direct'
                          WHEN resolved AND final_seen THEN 'via_redirect'
                          WHEN resolved = FALSE THEN 'unresolved'
                          ELSE 'unseen' END AS status
              FROM j
            )
            SELECT doc_id, final_id, status,
                   status IN ('direct', 'via_redirect') AS effectively_seen
            FROM cls
        """,
        "matryoshka_eval": """
            WITH base AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings
            ),
            tagged AS (
              SELECT k.k,
                round(sqrt(round(list_sum(
                        list_transform(v[1:k.k], x -> x * x)), 9))
                      / sqrt(round(list_sum(
                        list_transform(v, x -> x * x)), 9)), 6) AS ret
              FROM base, (VALUES (8), (16), (32)) AS k(k)
            )
            SELECT k, count(*) AS n_vecs,
                   floor(CAST(sum(CAST(ret AS DECIMAL(20,6))) AS DOUBLE)
                         / count(*) * 1000000.0 + 0.5) / 1000000.0
                     AS mean_retention,
                   min(ret) AS min_retention,
                   floor(CAST(sum(CASE WHEN ret >= CAST(0.9 AS DOUBLE)
                                       THEN 1 ELSE 0 END) AS DOUBLE)
                         / count(*) * 1000000.0 + 0.5) / 1000000.0
                     AS frac_ge_090
            FROM tagged GROUP BY k
        """,
        "anchor_topk": """
            WITH edges AS (
              SELECT doc_id - doc_id % 16 AS target_id,
                     string_split(regexp_replace(lower(trim(text)),
                                                 '\\s+', ' ', 'g'), ' ')[1]
                       AS term
              FROM documents
            ),
            counts AS (
              SELECT target_id, term, count(*) AS n_links
              FROM edges GROUP BY target_id, term
            )
            SELECT target_id, term, n_links, rnk FROM (
              SELECT *, ROW_NUMBER() OVER (
                PARTITION BY target_id ORDER BY n_links DESC, term
              ) AS rnk FROM counts
            ) WHERE rnk <= 2
        """,
        "crawl_trap_score": f"""
            WITH f AS ({_FRONTIER_SQL}),
            fp AS (
              SELECT doc_id,
                     md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                       AS fp
              FROM documents
            ),
            g AS (
              SELECT f.host, count(*) AS n_urls,
                     count(DISTINCT fp.fp) AS n_distinct
              FROM f JOIN fp USING (doc_id) GROUP BY f.host
            )
            SELECT host, n_urls, n_distinct,
                   round(n_urls * 1.0 / n_distinct, 6) AS dup_factor,
                   n_urls >= 3 * n_distinct AS is_trap
            FROM g
        """,
        "boilerplate_removal": """
            WITH w AS (
              SELECT doc_id, doc_id % 20 AS host_id,
                     string_split(regexp_replace(lower(trim(text)),
                                                 '\\s+', ' ', 'g'), ' ')
                       AS words
              FROM documents
            ),
            l AS (
              SELECT doc_id, host_id,
                     unnest([
                       array_to_string(
                         list_slice(words, i*4 + 1, i*4 + 4), ' ')
                       for i in generate_series(
                         0, greatest(cast(ceil(len(words) / 4.0)
                                          AS int) - 1, 0))
                     ]) AS line
              FROM w
            ),
            freq AS (
              SELECT host_id, line, count(DISTINCT doc_id) AS df
              FROM l GROUP BY host_id, line
            )
            SELECT l.doc_id,
                   count(*) AS n_lines,
                   cast(sum(CASE WHEN df >= 3 THEN 1 ELSE 0 END)
                        AS bigint) AS n_boiler,
                   round(1 - sum(CASE WHEN df >= 3 THEN 1 ELSE 0 END)
                             * 1.0 / count(*), 6) AS keep_ratio
            FROM l JOIN freq USING (host_id, line)
            GROUP BY l.doc_id
        """,
        "change_rate": f"""
            WITH f AS ({_FRONTIER_SQL}),
            est AS (
              SELECT host,
                     -ln((4 + doc_id % 5
                          - ({_hexdig_sql("cast(doc_id AS varchar)", 8)}
                             % (4 + doc_id % 5 + 1)) + 0.5)
                         / (4 + doc_id % 5 + 0.5)) AS lam
              FROM f
            )
            SELECT host, count(*) AS n_urls,
                   round(avg(lam), 6) AS avg_lambda,
                   round(max(lam), 6) AS max_lambda,
                   cast(sum(CASE WHEN lam > 0.7 THEN 1 ELSE 0 END)
                        AS bigint) AS n_hot
            FROM est GROUP BY host
        """,
        "salsa_scores": """
            WITH e AS (
              SELECT DISTINCT src, dst FROM (
                SELECT doc_id AS src, doc_id - doc_id % 16 AS dst
                FROM documents
                UNION ALL
                SELECT doc_id, (doc_id * 7) % 160 FROM documents
              ) WHERE src <> dst
            ),
            odg AS (SELECT src, count(*) AS od FROM e GROUP BY src),
            idg AS (SELECT dst, count(*) AS indeg FROM e GROUP BY dst),
            ed AS (SELECT e.src, e.dst, odg.od, idg.indeg
                   FROM e JOIN odg USING (src) JOIN idg USING (dst)),
            nodes AS (SELECT src AS node FROM e
                      UNION SELECT dst FROM e),
            a1r AS (SELECT dst AS node, sum(1.0 / od) AS a
                    FROM ed GROUP BY dst),
            a1f AS (SELECT n.node, coalesce(a1r.a, 0) AS a
                    FROM nodes n LEFT JOIN a1r USING (node)),
            a1 AS (SELECT node, a / sum(a) OVER () AS a FROM a1f),
            h1r AS (SELECT ed.src AS node, sum(a1.a / ed.indeg) AS h
                    FROM ed JOIN a1 ON ed.dst = a1.node GROUP BY ed.src),
            h1f AS (SELECT n.node, coalesce(h1r.h, 0) AS h
                    FROM nodes n LEFT JOIN h1r USING (node)),
            h1 AS (SELECT node, h / sum(h) OVER () AS h FROM h1f),
            a2r AS (SELECT ed.dst AS node, sum(h1.h / ed.od) AS a
                    FROM ed JOIN h1 ON ed.src = h1.node GROUP BY ed.dst),
            a2f AS (SELECT n.node, coalesce(a2r.a, 0) AS a
                    FROM nodes n LEFT JOIN a2r USING (node)),
            a2 AS (SELECT node, a / sum(a) OVER () AS a FROM a2f),
            h2r AS (SELECT ed.src AS node, sum(a2.a / ed.indeg) AS h
                    FROM ed JOIN a2 ON ed.dst = a2.node GROUP BY ed.src),
            h2f AS (SELECT n.node, coalesce(h2r.h, 0) AS h
                    FROM nodes n LEFT JOIN h2r USING (node)),
            h2 AS (SELECT node, h / sum(h) OVER () AS h FROM h2f)
            SELECT a2.node, round(a2.a, 6) AS authority,
                   round(h2.h, 6) AS hub
            FROM a2 JOIN h2 USING (node)
        """,
        "hits_scores": """
            WITH e AS (
              SELECT DISTINCT src, dst FROM (
                SELECT doc_id AS src, doc_id - doc_id % 16 AS dst
                FROM documents
                UNION ALL
                SELECT doc_id, (doc_id * 7) % 160 FROM documents
              ) WHERE src <> dst
            ),
            nodes AS (SELECT src AS node FROM e
                      UNION SELECT dst FROM e),
            a1r AS (SELECT e.dst AS node, cast(count(*) AS double) AS a
                    FROM e GROUP BY e.dst),
            a1f AS (SELECT n.node, coalesce(a1r.a, 0) AS a
                    FROM nodes n LEFT JOIN a1r USING (node)),
            a1 AS (SELECT node, a / sqrt(sum(a*a) OVER ()) AS a FROM a1f),
            h1r AS (SELECT e.src AS node, sum(a1.a) AS h
                    FROM e JOIN a1 ON e.dst = a1.node GROUP BY e.src),
            h1f AS (SELECT n.node, coalesce(h1r.h, 0) AS h
                    FROM nodes n LEFT JOIN h1r USING (node)),
            h1 AS (SELECT node, h / sqrt(sum(h*h) OVER ()) AS h FROM h1f),
            a2r AS (SELECT e.dst AS node, sum(h1.h) AS a
                    FROM e JOIN h1 ON e.src = h1.node GROUP BY e.dst),
            a2f AS (SELECT n.node, coalesce(a2r.a, 0) AS a
                    FROM nodes n LEFT JOIN a2r USING (node)),
            a2 AS (SELECT node, a / sqrt(sum(a*a) OVER ()) AS a FROM a2f),
            h2r AS (SELECT e.src AS node, sum(a2.a) AS h
                    FROM e JOIN a2 ON e.dst = a2.node GROUP BY e.src),
            h2f AS (SELECT n.node, coalesce(h2r.h, 0) AS h
                    FROM nodes n LEFT JOIN h2r USING (node)),
            h2 AS (SELECT node, h / sqrt(sum(h*h) OVER ()) AS h FROM h2f)
            SELECT a2.node, round(a2.a, 6) AS authority,
                   round(h2.h, 6) AS hub
            FROM a2 JOIN h2 USING (node)
        """,
        "warc_roundtrip": """
            SELECT list_extract([200, 200, 200, 301, 404],
                                cast(doc_id % 5 AS int) + 1) AS status,
                   count(*) AS n_records,
                   cast(sum(length(regexp_replace(lower(trim(text)),
                                                  '\\s+', ' ', 'g')))
                        AS bigint) AS total_chars,
                   count(DISTINCT 'host-' || (doc_id % 20) || '.test')
                     AS n_hosts
            FROM documents GROUP BY 1
        """,
        "dust_params": """
            WITH urls AS (
              SELECT doc_id % 20 AS host_id,
                     doc_id - doc_id % 80 + doc_id % 20 AS grp,
                     md5(cast(CASE WHEN (doc_id % 20) % 2 = 0
                              THEN doc_id - doc_id % 80 + doc_id % 20
                              ELSE doc_id END AS varchar)) AS fp
              FROM documents
            ),
            g AS (
              SELECT host_id, grp, count(DISTINCT fp) AS n_fp,
                     count(*) AS n_urls
              FROM urls GROUP BY host_id, grp
            )
            SELECT host_id, count(*) AS n_groups,
                   cast(sum(CASE WHEN n_fp = 1 THEN 1 ELSE 0 END)
                        AS bigint) AS n_uniform,
                   cast(sum(n_urls) AS bigint) AS n_urls,
                   sum(CASE WHEN n_fp = 1 THEN 1 ELSE 0 END) = count(*)
                     AS strip_safe
            FROM g GROUP BY host_id
        """,
        "dust_apply": """
            WITH urls AS (
              SELECT doc_id % 20 AS host_id, doc_id AS url_id,
                     doc_id - doc_id % 80 + doc_id % 20 AS grp,
                     md5(cast(CASE WHEN (doc_id % 20) % 2 = 0
                              THEN doc_id - doc_id % 80 + doc_id % 20
                              ELSE doc_id END AS varchar)) AS fp
              FROM documents
            ),
            g AS (
              SELECT host_id, grp, count(DISTINCT fp) AS n_fp
              FROM urls GROUP BY host_id, grp
            ),
            rules AS (
              SELECT host_id,
                     sum(CASE WHEN n_fp = 1 THEN 1 ELSE 0 END) = count(*)
                       AS strip_safe
              FROM g GROUP BY host_id
            ),
            applied AS (
              SELECT u.host_id,
                     CASE WHEN r.strip_safe THEN u.grp
                          ELSE u.url_id END AS canonical_id
              FROM urls u JOIN rules r ON u.host_id = r.host_id
            )
            SELECT host_id,
                   cast(count(*) AS BIGINT) AS n_raw,
                   cast(count(DISTINCT canonical_id) AS BIGINT) AS n_canonical,
                   floor((1.0 - cast(count(DISTINCT canonical_id) AS DOUBLE)
                                / cast(count(*) AS DOUBLE))
                         * 1000000.0 + 0.5) / 1000000.0 AS reduction
            FROM applied GROUP BY host_id
        """,
        "quality_classifier": f"""
            WITH w AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)),
                                                 '\\s+', ' ', 'g'), ' ')
                       AS words
              FROM documents
            ),
            t AS (
              SELECT doc_id, cast(len(words) AS bigint) AS n_tokens,
                     unnest(words) AS tok
              FROM w
            ),
            s AS (
              SELECT doc_id, any_value(n_tokens) AS n_tokens,
                     sum(list_extract([{", ".join(repr(w) for w in _clf_weights())}],
                         instr('0123456789abcdef', substring(md5(tok), 1, 1))))
                       AS raw
              FROM t GROUP BY doc_id
            )
            SELECT doc_id, n_tokens,
                   round(1 / (1 + exp(-raw / n_tokens)), 6) AS quality,
                   1 / (1 + exp(-raw / n_tokens)) > 0.5 AS passed
            FROM s
        """,
        "snapshot_diff": """
            WITH d AS (SELECT doc_id FROM documents),
            a AS (
              SELECT doc_id, doc_id % 20 AS host_a,
                     md5(cast(doc_id AS varchar)) AS fp_a
              FROM d WHERE doc_id % 10 <> 9
            ),
            b AS (
              SELECT doc_id, doc_id % 20 AS host_b,
                     md5(cast(CASE WHEN doc_id % 7 = 3
                              THEN doc_id + 1000000
                              ELSE doc_id END AS varchar)) AS fp_b
              FROM d WHERE doc_id % 10 <> 0
            )
            SELECT coalesce(host_a, host_b) AS host_id,
                   CASE WHEN fp_a IS NULL THEN 'added'
                        WHEN fp_b IS NULL THEN 'removed'
                        WHEN fp_a <> fp_b THEN 'modified'
                        ELSE 'unchanged' END AS change,
                   count(*) AS n_urls
            FROM a FULL OUTER JOIN b USING (doc_id)
            GROUP BY 1, 2
        """,
        "budget_allocation": f"""
            WITH f AS ({_FRONTIER_SQL}),
            planned AS (
              SELECT host,
                     doc_id % 5 + 1 AS cost,
                     sum(doc_id % 5 + 1) OVER (
                       PARTITION BY host
                       ORDER BY priority DESC, discovery_seq
                     ) AS cum_cost
              FROM f
            )
            SELECT host,
                   cast(sum(CASE WHEN cum_cost <= 40 THEN 1 ELSE 0 END)
                        AS bigint) AS n_admitted,
                   cast(max(CASE WHEN cum_cost <= 40 THEN cum_cost
                            ELSE 0 END) AS bigint) AS spent,
                   cast(sum(CASE WHEN cum_cost > 40 THEN 1 ELSE 0 END)
                        AS bigint) AS n_deferred
            FROM planned GROUP BY host
        """,
        "cdc_chunk_dedup": """
            WITH w AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)),
                                                 '\\s+', ' ', 'g'), ' ')
                       AS words
              FROM documents
            ),
            t AS (
              SELECT doc_id,
                     unnest(words) AS tok,
                     unnest(generate_series(1, len(words))) AS pos
              FROM w
            ),
            flagged AS (
              SELECT doc_id, tok, pos,
                     CASE WHEN (instr('0123456789abcdef',
                                      substring(md5(tok), 1, 1)) - 1)
                               % 8 = 0 THEN 1 ELSE 0 END AS is_boundary
              FROM t
            ),
            chunked AS (
              SELECT doc_id, tok, pos,
                     sum(is_boundary) OVER (
                       PARTITION BY doc_id ORDER BY pos
                     ) AS chunk_idx
              FROM flagged
            ),
            chunks AS (
              SELECT doc_id, chunk_idx,
                     md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_md5,
                     count(*) AS n_tokens
              FROM chunked GROUP BY doc_id, chunk_idx
            ),
            occ AS (
              SELECT chunk_md5, count(*) AS n_occ FROM chunks GROUP BY 1
            )
            SELECT c.doc_id,
                   count(*) AS n_chunks,
                   cast(sum(CASE WHEN o.n_occ > 1 THEN 1 ELSE 0 END)
                        AS bigint) AS n_shared,
                   round(sum(CASE WHEN o.n_occ > 1 THEN 1 ELSE 0 END)
                         * 1.0 / count(*), 6) AS shared_ratio
            FROM chunks c JOIN occ o USING (chunk_md5)
            GROUP BY c.doc_id
        """,
        "bpe_apply": """
            WITH s0 AS (
              SELECT doc_id,
                     ' ' || regexp_replace(lower(trim(text)),
                                           '\\s+', ' ', 'g') || ' ' AS s
              FROM documents
            ),
            s1 AS (SELECT doc_id, s,
                          replace(s, ' table value ', ' table_value ') AS t
                   FROM s0),
            s2 AS (SELECT doc_id, s, replace(t, ' the line ', ' the_line ')
                            AS t FROM s1),
            s3 AS (SELECT doc_id, s, replace(t, ' a a ', ' a_a ') AS t
                   FROM s2)
            SELECT doc_id,
                   cast(len(string_split(trim(s), ' ')) AS bigint)
                     AS n_before,
                   cast(len(list_filter(string_split(trim(t), ' '),
                                        x -> x = 'table_value'))
                        AS bigint) AS n_table_value,
                   cast(len(list_filter(string_split(trim(t), ' '),
                                        x -> x = 'the_line'))
                        AS bigint) AS n_the_line,
                   cast(len(list_filter(string_split(trim(t), ' '),
                                        x -> x = 'a_a'))
                        AS bigint) AS n_a_a,
                   cast(len(string_split(trim(t), ' ')) AS bigint)
                     AS n_after
            FROM s3
        """,
        "kmv_jaccard": """
            WITH ev AS (
              SELECT event_type, md5(cast(user_id AS varchar)) AS h,
                     user_id
              FROM events WHERE event_type IN ('click', 'view')
            ),
            sets AS (SELECT DISTINCT event_type, h FROM ev),
            sk AS (
              SELECT event_type, h FROM (
                SELECT event_type, h, ROW_NUMBER() OVER (
                  PARTITION BY event_type ORDER BY h) AS rnk
                FROM sets
              ) WHERE rnk <= 64
            ),
            uni AS (SELECT DISTINCT h FROM sk ORDER BY h LIMIT 64),
            est AS (
              SELECT count(*) AS k_eff,
                     cast(sum(CASE WHEN a.h IS NOT NULL
                                    AND b.h IS NOT NULL
                              THEN 1 ELSE 0 END) AS bigint) AS n_both
              FROM uni u
              LEFT JOIN (SELECT h FROM sk WHERE event_type = 'click') a
                ON u.h = a.h
              LEFT JOIN (SELECT h FROM sk WHERE event_type = 'view') b
                ON u.h = b.h
            ),
            pres AS (
              SELECT user_id,
                     max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       AS ia,
                     max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                       AS ib
              FROM ev GROUP BY user_id
            ),
            ex AS (SELECT sum(ia * ib) * 1.0 / count(*) AS exact_j
                   FROM pres)
            SELECT cast(k_eff AS int) AS k_eff,
                   round(n_both * 1.0 / k_eff, 6) AS kmv_jaccard,
                   round(exact_j, 6) AS exact_jaccard
            FROM est, ex
        """,
        "trustrank": """
            WITH e AS (
              SELECT DISTINCT src, dst FROM (
                SELECT doc_id AS src, doc_id - doc_id % 16 AS dst
                FROM documents
                UNION ALL
                SELECT doc_id, (doc_id * 7) % 160 FROM documents
              ) WHERE src <> dst
            ),
            outdeg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
            nodes AS (SELECT src AS node FROM e
                      UNION SELECT dst FROM e),
            seeds AS (
              SELECT node,
                     1.0 / (SELECT count(*) FROM nodes
                            WHERE node % 100 = 0) AS d0
              FROM nodes WHERE node % 100 = 0
            ),
            c1 AS (
              SELECT e.dst AS node, sum(s.d0 / o.deg) AS c
              FROM e JOIN outdeg o USING (src)
                     JOIN seeds s ON e.src = s.node
              GROUP BY e.dst
            ),
            t1 AS (
              SELECT n.node,
                     floor((0.85 * coalesce(c1.c, 0)
                            + 0.15 * coalesce(s.d0, 0))
                           * 1000000000.0 + 0.5) / 1000000000.0 AS t
              FROM nodes n LEFT JOIN c1 USING (node)
                           LEFT JOIN seeds s USING (node)
            ),
            c2 AS (
              SELECT e.dst AS node, sum(t1.t / o.deg) AS c
              FROM e JOIN outdeg o USING (src)
                     JOIN t1 ON e.src = t1.node
              GROUP BY e.dst
            ),
            t2 AS (
              SELECT n.node,
                     floor((0.85 * coalesce(c2.c, 0)
                            + 0.15 * coalesce(s.d0, 0))
                           * 1000000000.0 + 0.5) / 1000000000.0 AS t
              FROM nodes n LEFT JOIN c2 USING (node)
                           LEFT JOIN seeds s USING (node)
            )
            SELECT node, floor(t * 1000000.0 + 0.5) / 1000000.0 AS trust
            FROM t2 WHERE t > 0
        """,
        "weighted_sample": f"""
            WITH f AS ({_FRONTIER_SQL}),
            keyed AS (
              SELECT doc_id, host, priority + 1 AS w,
                     ln((({_hexdig_sql("cast(doc_id AS varchar)", 1)} * 16
                          + {_hexdig_sql("cast(doc_id AS varchar)", 2)})
                         + 0.5) / 256.0) / (priority + 1) AS es_key
              FROM f
            )
            SELECT doc_id, host, w, round(es_key, 6) AS es_key
            FROM keyed ORDER BY es_key DESC, doc_id LIMIT 32
        """,
        "vocab_coverage": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(string_split(regexp_replace(lower(trim(text)),
                                                        '\\s+', ' ', 'g'),
                                         ' ')) AS tok
              FROM documents
            ),
            vocab AS (
              SELECT tok FROM (
                SELECT tok, count(*) AS n FROM toks GROUP BY tok
                ORDER BY n DESC, tok LIMIT 64
              )
            )
            SELECT doc_id, count(*) AS n_tokens,
                   cast(sum(CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END)
                        AS bigint) AS n_in_vocab,
                   round(1 - sum(CASE WHEN v.tok IS NOT NULL
                                 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
                     AS oov_rate
            FROM toks t LEFT JOIN vocab v USING (tok)
            GROUP BY doc_id
        """,
        "latency_percentiles": f"""
            WITH f AS ({_FRONTIER_SQL}),
            lat AS (
              -- cast: DuckDB reads 50.0 as DECIMAL and quantile_cont
              -- would return a scale-1 DECIMAL, truncating p99
              SELECT host,
                     cast(50.0 + ({_hexdig_sql("cast(doc_id AS varchar)", 1)}
                                  * 16
                                  + {_hexdig_sql("cast(doc_id AS varchar)", 2)})
                                 * 7.0
                               + priority * 100.0 AS double) AS lat_ms
              FROM f
            )
            SELECT host, count(*) AS n,
                   round(quantile_cont(lat_ms, 0.5), 6) AS p50,
                   round(quantile_cont(lat_ms, 0.95), 6) AS p95,
                   round(quantile_cont(lat_ms, 0.99), 6) AS p99,
                   max(lat_ms) AS max_ms
            FROM lat GROUP BY host
        """,
        "hdr_latency_quantiles": f"""
            WITH f AS ({_FRONTIER_SQL}),
            lat AS (
              SELECT host, doc_id,
                     CAST(50 + ({_hexdig_sql("cast(doc_id AS varchar)", 1)} * 16
                                + {_hexdig_sql("cast(doc_id AS varchar)", 2)}) * 7
                             + priority * 100 AS BIGINT) AS lat_ms
              FROM f
            ),
            bk AS (
              SELECT host,
                     CAST(length(bin(lat_ms)) - 1 AS INT) AS e,
                     CAST(((lat_ms - (CAST(1 AS BIGINT) << (length(bin(lat_ms)) - 1))) * 16)
                          // (CAST(1 AS BIGINT) << (length(bin(lat_ms)) - 1)) AS INT) AS m,
                     CAST(count(*) AS BIGINT) AS cnt
              FROM lat WHERE lat_ms >= 1 GROUP BY 1, 2, 3
            ),
            sk AS (
              SELECT host, e, m, cnt FROM bk
              UNION ALL
              SELECT '__fleet__' AS host, e, m, CAST(sum(cnt) AS BIGINT) AS cnt
              FROM bk GROUP BY e, m
            ),
            cum AS (
              SELECT host, e, m, cnt,
                     CAST(sum(cnt) OVER (PARTITION BY host) AS BIGINT) AS n,
                     CAST(sum(cnt) OVER (PARTITION BY host ORDER BY e, m
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
              FROM sk
            ),
            qq AS (SELECT unnest([500, 950, 990]) AS q_permille),
            hit AS (
              SELECT host, q_permille, n,
                     CAST((q_permille * n + 999) // 1000 AS BIGINT) AS rnk,
                     ((CAST(1 AS BIGINT) << e) * (32 + 2 * m + 1)) / 32.0 AS est_mid
              FROM cum CROSS JOIN qq
              WHERE cum >= (q_permille * n + 999) // 1000
                AND cum - cnt < (q_permille * n + 999) // 1000
            ),
            rk AS (
              SELECT host, lat_ms,
                     CAST(row_number() OVER (PARTITION BY host
                           ORDER BY lat_ms, doc_id) AS BIGINT) AS rn
              FROM lat
            )
            SELECT h.host, h.q_permille, h.n, h.rnk, h.est_mid,
                   r.lat_ms AS exact_ms,
                   CAST(floor(abs(h.est_mid - r.lat_ms) / r.lat_ms * 1000.0)
                        AS BIGINT) AS rel_err_permille
            FROM hit h LEFT JOIN rk r ON h.host = r.host AND h.rnk = r.rn
        """,
        "snm_blocking_pairs": """
            WITH n AS (
              SELECT doc_id,
                     regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
              FROM documents
            ),
            rk AS (
              SELECT doc_id, substring(t, 1, 12) AS k,
                     row_number() OVER (ORDER BY substring(t, 1, 12), doc_id)
                       AS rn
              FROM n
            ),
            cand AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     CAST(b.rn - a.rn AS INT) AS gap
              FROM rk a JOIN rk b ON b.rn - a.rn >= 1 AND b.rn - a.rn <= 3
            ),
            toks AS (
              SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split(t, ' ')) AS tok FROM n
              ) WHERE length(tok) > 0
            ),
            sizes AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS nt
              FROM toks GROUP BY doc_id
            ),
            inter AS (
              SELECT c.doc_a, c.doc_b, c.gap, count(*) AS ni
              FROM cand c
              JOIN toks x ON x.doc_id = c.doc_a
              JOIN toks y ON y.doc_id = c.doc_b AND y.tok = x.tok
              GROUP BY 1, 2, 3
            )
            SELECT i.doc_a, i.doc_b, i.gap,
                   floor(i.ni * 1000000.0 / (sa.nt + sb.nt - i.ni) + 0.5)
                     / 1000000.0 AS jaccard
            FROM inter i
            JOIN sizes sa ON i.doc_a = sa.doc_id
            JOIN sizes sb ON i.doc_b = sb.doc_id
            WHERE floor(i.ni * 1000000.0 / (sa.nt + sb.nt - i.ni) + 0.5)
                    / 1000000.0 >= 0.5
        """,
        "slo_burn_alerts": """
            WITH h AS (
              SELECT event_type,
                     CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hour,
                     CASE WHEN value > 300.0 THEN 1 ELSE 0 END AS is_err
              FROM events
            ),
            hourly AS (
              SELECT event_type, hour, count(*) AS n, sum(is_err) AS errs
              FROM h GROUP BY event_type, hour
            ),
            b AS (
              SELECT event_type, hour,
                     sum(n) OVER w1 AS n1, sum(errs) OVER w1 AS e1,
                     sum(n) OVER w6 AS n6, sum(errs) OVER w6 AS e6
              FROM hourly
              WINDOW w1 AS (PARTITION BY event_type ORDER BY hour
                            RANGE BETWEEN CURRENT ROW AND CURRENT ROW),
                     w6 AS (PARTITION BY event_type ORDER BY hour
                            RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
            ),
            r AS (
              SELECT event_type, hour, n1, e1,
                     CAST(e1 AS DOUBLE) / n1 / CAST(0.02 AS DOUBLE)
                       AS burn_short,
                     CAST(e6 AS DOUBLE) / n6 / CAST(0.02 AS DOUBLE)
                       AS burn_long
              FROM b
            )
            SELECT event_type, hour,
                   CAST(n1 AS BIGINT) AS n_short,
                   CAST(e1 AS BIGINT) AS err_short,
                   CAST(floor(burn_short * 1e6 + 0.5) AS DOUBLE) / 1e6
                     AS burn_short6,
                   CAST(floor(burn_long * 1e6 + 0.5) AS DOUBLE) / 1e6
                     AS burn_long6,
                   burn_short > 6.0 AND burn_long > 6.0 AS page
            FROM r
        """,
        "suffix_repeats": """
            WITH docs2 AS (
              SELECT doc_id, lower(text) AS t
              FROM documents WHERE length(text) >= 12
            ),
            grams AS (
              SELECT doc_id, substring(t, pos, 12) AS snippet
              FROM (SELECT doc_id, t,
                           unnest(range(1, length(t) - 10)) AS pos
                    FROM docs2)
            )
            SELECT snippet,
                   count(*) AS n_occurrences,
                   count(DISTINCT doc_id) AS n_docs
            FROM grams GROUP BY snippet HAVING count(*) >= 2
        """,
        "kn_perplexity": """
            WITH d AS (
              SELECT doc_id,
                     list_filter(
                       string_split(
                         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                         ' '),
                       x -> len(x) > 0) AS a
              FROM documents
            ),
            big AS (
              SELECT doc_id,
                     CASE WHEN i = 1 THEN '<s>' ELSE a[i - 1] END AS v,
                     a[i] AS w
              FROM (SELECT doc_id, a, unnest(range(1, len(a) + 1)) AS i
                    FROM d WHERE len(a) > 0)
            ),
            cvw AS (SELECT v, w, count(*) AS n_vw FROM big GROUP BY v, w),
            ctx AS (
              SELECT v, CAST(sum(n_vw) AS DOUBLE) AS c_v,
                     CAST(count(*) AS DOUBLE) AS n1f
              FROM cvw GROUP BY v
            ),
            cont AS (
              SELECT w, CAST(count(*) AS DOUBLE) AS n1b FROM cvw GROUP BY w
            ),
            types AS (
              SELECT CAST(count(*) AS DOUBLE) AS n_types FROM cvw
            ),
            scored AS (
              SELECT doc_id,
                     CAST(round(ln(
                       greatest(CAST(n_vw AS DOUBLE) - CAST(0.75 AS DOUBLE),
                                CAST(0 AS DOUBLE)) / c_v
                       + CAST(0.75 AS DOUBLE) * n1f / c_v
                         * (n1b / n_types)
                     ), 6) AS DECIMAL(20,6)) AS lp6
              FROM big
              JOIN cvw USING (v, w)
              JOIN ctx USING (v)
              JOIN cont USING (w)
              CROSS JOIN types
            ),
            agg AS (
              SELECT doc_id, count(*) AS n_tok, sum(lp6) AS sum_lp
              FROM scored GROUP BY doc_id
            )
            SELECT doc_id, n_tok,
                   floor(CAST(sum_lp AS DOUBLE) / n_tok * 1000000.0 + 0.5)
                     / 1000000.0 AS avg_logprob,
                   floor(exp(-(floor(CAST(sum_lp AS DOUBLE) / n_tok
                                     * 1000000.0 + 0.5) / 1000000.0))
                         * 10000.0 + 0.5) / 10000.0 AS ppl
            FROM agg
        """,
        "ht_corpus_totals": """
            WITH rates AS (
              SELECT * FROM (VALUES
                ('1-URGENT', 400), ('2-HIGH', 200), ('3-MEDIUM', 100),
                ('4-NOT SPECIFIED', 100), ('5-LOW', 50)
              ) t(o_orderpriority, permille)
            ),
            p AS (
              SELECT o.o_orderpriority, o.o_orderkey, o.o_totalprice,
                     r.permille
              FROM orders o JOIN rates r USING (o_orderpriority)
            ),
            samp AS (
              SELECT * FROM p
              WHERE CAST('0x' || substring(md5('ht:'
                         || CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT)
                    % 1000 < permille
            ),
            est AS (
              SELECT o_orderpriority,
                     CAST(count(*) AS BIGINT) AS n_sampled,
                     CAST(sum(CAST(CAST(floor(CAST(1000.0 AS DOUBLE)
                                 / permille * 1e9 + 0.5) AS DOUBLE) / 1e9
                              AS DECIMAL(28, 9))) AS DOUBLE) AS est_rows,
                     CAST(sum(CAST(CAST(floor(o_totalprice
                                 * CAST(1000.0 AS DOUBLE) / permille
                                 * 1e9 + 0.5) AS DOUBLE) / 1e9
                              AS DECIMAL(28, 9))) AS DOUBLE) AS est_total
              FROM samp GROUP BY o_orderpriority
            ),
            ex AS (
              SELECT o_orderpriority,
                     CAST(count(*) AS BIGINT) AS exact_rows,
                     CAST(sum(CAST(CAST(floor(o_totalprice * 1e9 + 0.5)
                                        AS DOUBLE) / 1e9
                              AS DECIMAL(28, 9))) AS DOUBLE) AS exact_total
              FROM p GROUP BY o_orderpriority
            )
            SELECT est.o_orderpriority, est.n_sampled,
                   CAST(floor(est_rows * 1e6 + 0.5) AS DOUBLE) / 1e6
                     AS est_rows6,
                   CAST(floor(est_total * 1e6 + 0.5) AS DOUBLE) / 1e6
                     AS est_total6,
                   ex.exact_rows,
                   CAST(floor(exact_total * 1e6 + 0.5) AS DOUBLE) / 1e6
                     AS exact_total6
            FROM est JOIN ex USING (o_orderpriority)
        """,
        "host_latency_mk_trend": """
            WITH samp AS (
              SELECT event_type AS g,
                     (epoch_us(ts) - 1704067200000000)
                       / CAST(3.6e9 AS DOUBLE) AS xh,
                     value AS y
              FROM events
              WHERE CAST('0x' || substring(md5('ts:'
                         || CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT)
                    % 1000 < 10
            ),
            s AS (
              SELECT a.g,
                     CAST(sum(CAST(sign(b.y - a.y) AS BIGINT)) AS BIGINT)
                       AS s_stat
              FROM samp a JOIN samp b ON a.g = b.g AND a.xh < b.xh
              GROUP BY a.g
            ),
            n AS (SELECT g, count(*) AS n FROM samp GROUP BY g),
            ties AS (
              SELECT g, sum(t * (t - 1) * (2 * t + 5)) AS tie_term FROM (
                SELECT g, y, count(*) AS t FROM samp GROUP BY g, y
              ) WHERE t > 1 GROUP BY g
            ),
            j AS (
              SELECT n.g, n.n,
                     CAST(coalesce(s.s_stat, 0) AS BIGINT) AS s_stat,
                     CAST(n.n * (n.n - 1) * (2 * n.n + 5)
                          - coalesce(ties.tie_term, 0) AS BIGINT) AS var_s18
              FROM n LEFT JOIN s ON s.g = n.g
              LEFT JOIN ties ON ties.g = n.g
            ),
            z AS (
              SELECT g, n, s_stat, var_s18,
                     CASE WHEN var_s18 > 0 THEN
                       CAST(CASE WHEN s_stat > 0 THEN s_stat - 1
                                 WHEN s_stat < 0 THEN s_stat + 1
                                 ELSE 0 END AS DOUBLE)
                       / sqrt(CAST(var_s18 AS DOUBLE) / CAST(18.0 AS DOUBLE))
                     ELSE CAST(0.0 AS DOUBLE) END AS zv
              FROM j
            )
            SELECT g AS event_type, CAST(n AS BIGINT) AS n_points, s_stat,
                   var_s18,
                   CAST(floor(zv * 1e6 + 0.5) AS DOUBLE) / 1e6 AS z6,
                   abs(zv) > 1.96 AS trending
            FROM z
        """,
        "psi_feature_drift": """
            WITH binned AS (
              SELECT o_orderkey, o_orderpriority,
                     least(CAST(floor(o_totalprice / 50000.0) AS INT), 11)
                       AS bin
              FROM orders
            ),
            bins AS (SELECT CAST(i AS INT) AS bin FROM range(0, 12) t(i)),
            parity_ca AS (
              SELECT bin, count(*) AS n_a FROM binned WHERE o_orderkey % 2 = 0
              GROUP BY bin
            ),
            parity_cb AS (
              SELECT bin, count(*) AS n_b FROM binned WHERE o_orderkey % 2 = 1
              GROUP BY bin
            ),
            parity_j AS (
              SELECT b.bin,
                     CAST(coalesce(ca.n_a, 0) AS BIGINT) AS n_a,
                     CAST(coalesce(cb.n_b, 0) AS BIGINT) AS n_b
              FROM bins b
              LEFT JOIN parity_ca ca ON ca.bin = b.bin
              LEFT JOIN parity_cb cb ON cb.bin = b.bin
            ),
            parity_t AS (
              SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM parity_j
            ),
            parity_p AS (
              SELECT bin, n_a, n_b,
                     (n_a + CAST(0.5 AS DOUBLE))
                       / ((SELECT ta FROM parity_t) + CAST(6.0 AS DOUBLE))
                       AS pa,
                     (n_b + CAST(0.5 AS DOUBLE))
                       / ((SELECT tb FROM parity_t) + CAST(6.0 AS DOUBLE))
                       AS pb
              FROM parity_j
            ),
            parity_c AS (
              SELECT bin, n_a, n_b, pa, pb,
                     CAST(floor((pa - pb) * ln(pa / pb) * 1e9 + 0.5)
                          AS DOUBLE) / 1e9 AS contrib
              FROM parity_p
            ),
            parity_f AS (
              SELECT 'parity' AS cmp,
                     bin, n_a, n_b,
                     CAST(floor(pa * 1e6 + 0.5) AS DOUBLE) / 1e6 AS pa6,
                     CAST(floor(pb * 1e6 + 0.5) AS DOUBLE) / 1e6 AS pb6,
                     CAST(floor(contrib * 1e6 + 0.5) AS DOUBLE) / 1e6
                       AS contrib6,
                     CAST(floor(CAST(sum(CAST(contrib AS DECIMAL(28, 9)))
                                     OVER () AS DOUBLE) * 1e6 + 0.5)
                          AS DOUBLE) / 1e6 AS psi6
              FROM parity_c
            ),
            pr_ca AS (
              SELECT bin, count(*) AS n_a FROM binned WHERE o_orderkey % 2 = 0
              GROUP BY bin
            ),
            pr_cb AS (
              SELECT bin, count(*) AS n_b FROM binned WHERE o_orderpriority = '1-URGENT'
              GROUP BY bin
            ),
            pr_j AS (
              SELECT b.bin,
                     CAST(coalesce(ca.n_a, 0) AS BIGINT) AS n_a,
                     CAST(coalesce(cb.n_b, 0) AS BIGINT) AS n_b
              FROM bins b
              LEFT JOIN pr_ca ca ON ca.bin = b.bin
              LEFT JOIN pr_cb cb ON cb.bin = b.bin
            ),
            pr_t AS (
              SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM pr_j
            ),
            pr_p AS (
              SELECT bin, n_a, n_b,
                     (n_a + CAST(0.5 AS DOUBLE))
                       / ((SELECT ta FROM pr_t) + CAST(6.0 AS DOUBLE))
                       AS pa,
                     (n_b + CAST(0.5 AS DOUBLE))
                       / ((SELECT tb FROM pr_t) + CAST(6.0 AS DOUBLE))
                       AS pb
              FROM pr_j
            ),
            pr_c AS (
              SELECT bin, n_a, n_b, pa, pb,
                     CAST(floor((pa - pb) * ln(pa / pb) * 1e9 + 0.5)
                          AS DOUBLE) / 1e9 AS contrib
              FROM pr_p
            ),
            pr_f AS (
              SELECT 'priority_biased' AS cmp,
                     bin, n_a, n_b,
                     CAST(floor(pa * 1e6 + 0.5) AS DOUBLE) / 1e6 AS pa6,
                     CAST(floor(pb * 1e6 + 0.5) AS DOUBLE) / 1e6 AS pb6,
                     CAST(floor(contrib * 1e6 + 0.5) AS DOUBLE) / 1e6
                       AS contrib6,
                     CAST(floor(CAST(sum(CAST(contrib AS DECIMAL(28, 9)))
                                     OVER () AS DOUBLE) * 1e6 + 0.5)
                          AS DOUBLE) / 1e6 AS psi6
              FROM pr_c
            )
            SELECT * FROM parity_f UNION ALL SELECT * FROM pr_f
        """,
        "ivm_incremental_join": """
            WITH oo AS (SELECT o_orderkey FROM orders
                        WHERE o_orderkey % 13 != 7),
            onw AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 13 = 7),
            lo AS (SELECT l_orderkey FROM lineitem
                   WHERE l_linenumber % 5 != 3),
            ln2 AS (SELECT l_orderkey FROM lineitem
                    WHERE l_linenumber % 5 = 3),
            base AS (
              SELECT o_orderkey AS k, count(*) AS n_base
              FROM oo JOIN lo ON o_orderkey = l_orderkey GROUP BY 1
            ),
            d1 AS (
              SELECT o_orderkey AS k, count(*) AS n_dr_s
              FROM onw JOIN lo ON o_orderkey = l_orderkey GROUP BY 1
            ),
            d2 AS (
              SELECT o_orderkey AS k, count(*) AS n_r_ds
              FROM oo JOIN ln2 ON o_orderkey = l_orderkey GROUP BY 1
            ),
            d3 AS (
              SELECT o_orderkey AS k, count(*) AS n_dr_ds
              FROM onw JOIN ln2 ON o_orderkey = l_orderkey GROUP BY 1
            ),
            fl AS (
              SELECT o_orderkey AS k, count(*) AS n_full
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey
              GROUP BY 1
            )
            SELECT fl.k,
                   CAST(coalesce(base.n_base, 0) AS BIGINT) AS n_base,
                   CAST(coalesce(d1.n_dr_s, 0) AS BIGINT) AS n_dr_s,
                   CAST(coalesce(d2.n_r_ds, 0) AS BIGINT) AS n_r_ds,
                   CAST(coalesce(d3.n_dr_ds, 0) AS BIGINT) AS n_dr_ds,
                   CAST(fl.n_full AS BIGINT) AS n_full,
                   coalesce(base.n_base, 0) + coalesce(d1.n_dr_s, 0)
                   + coalesce(d2.n_r_ds, 0) + coalesce(d3.n_dr_ds, 0)
                     = fl.n_full AS delta_rule_holds
            FROM fl
            LEFT JOIN base ON base.k = fl.k
            LEFT JOIN d1 ON d1.k = fl.k
            LEFT JOIN d2 ON d2.k = fl.k
            LEFT JOIN d3 ON d3.k = fl.k
        """,
        "ivm_incremental_agg": """
            WITH ev AS (
              SELECT event_id, event_type, CAST(value AS DECIMAL(38,9)) AS v
              FROM events
            ),
            b AS (
              SELECT event_type, count(*) AS c, sum(v) AS s,
                     min(v) AS mn, max(v) AS mx
              FROM ev WHERE event_id % 10 <> 7 GROUP BY event_type
            ),
            d AS (
              SELECT event_type, count(*) AS c, sum(v) AS s,
                     min(v) AS mn, max(v) AS mx
              FROM ev WHERE event_id % 10 = 7 GROUP BY event_type
            ),
            m AS (
              SELECT coalesce(b.event_type, d.event_type) AS event_type,
                     coalesce(b.c, 0) + coalesce(d.c, 0) AS mc,
                     coalesce(b.s, 0) + coalesce(d.s, 0) AS ms,
                     CASE WHEN b.mn IS NULL THEN d.mn
                          WHEN d.mn IS NULL THEN b.mn
                          WHEN b.mn < d.mn THEN b.mn ELSE d.mn END AS mmn,
                     CASE WHEN b.mx IS NULL THEN d.mx
                          WHEN d.mx IS NULL THEN b.mx
                          WHEN b.mx > d.mx THEN b.mx ELSE d.mx END AS mmx
              FROM b FULL OUTER JOIN d ON b.event_type = d.event_type
            ),
            f AS (
              SELECT event_type, count(*) AS c, sum(v) AS s,
                     min(v) AS mn, max(v) AS mx
              FROM ev GROUP BY event_type
            )
            SELECT m.event_type,
                   CAST(m.mc AS BIGINT) AS cnt,
                   m.mc = f.c AS cnt_ok,
                   m.ms = f.s AS sum_ok,
                   m.mmn = f.mn AS min_ok,
                   m.mmx = f.mx AS max_ok,
                   floor(CAST(m.ms AS DOUBLE) * 1000000 + 0.5) / 1000000
                     AS sum_v,
                   floor(CAST(m.ms AS DOUBLE) / m.mc * 1000000 + 0.5)
                     / 1000000 AS avg_v
            FROM m JOIN f ON m.event_type = f.event_type
        """,
        "host_two_hop_reach": f"""
            WITH e AS (
              SELECT DISTINCT CAST(doc_id % 40 AS BIGINT) AS src,
                     CAST(({_hexdig_sql("cast(doc_id AS varchar)", 6)} * 16
                           + {_hexdig_sql("cast(doc_id AS varchar)", 7)})
                          % 40 AS BIGINT) AS dst
              FROM documents
              WHERE CAST(doc_id % 40 AS BIGINT)
                    <> CAST(({_hexdig_sql("cast(doc_id AS varchar)", 6)} * 16
                             + {_hexdig_sql("cast(doc_id AS varchar)", 7)})
                            % 40 AS BIGINT)
            ),
            two AS (
              SELECT DISTINCT a.src AS src, b.dst AS dst
              FROM e a JOIN e b ON a.dst = b.src
              WHERE a.src <> b.dst
            ),
            noadj AS (
              SELECT t.src, t.dst
              FROM two t LEFT JOIN e ON e.src = t.src AND e.dst = t.dst
              WHERE e.src IS NULL
            )
            SELECT src, CAST(count(*) AS BIGINT) AS n_two_hop
            FROM noadj GROUP BY src
        """,
        "jsonl_quarantine": """
            WITH raw AS (
              SELECT doc_id,
                     CASE
                       WHEN doc_id % 7 = 3
                         THEN '{"a": ' || doc_id || ', "b": '
                       WHEN doc_id % 7 = 5
                         THEN '{"a": "x", "b": "v"}'
                       ELSE '{"a": ' || doc_id || ', "b": "v'
                            || (doc_id % 5) || '"}'
                     END AS js
              FROM documents
            ),
            parsed AS (
              SELECT doc_id,
                     CASE WHEN json_valid(js)
                          THEN TRY_CAST(json_extract_string(js, '$.a')
                                        AS BIGINT)
                     END AS a,
                     CASE WHEN json_valid(js)
                          THEN json_extract_string(js, '$.b')
                     END AS b
              FROM raw
            ),
            cls AS (
              SELECT CASE
                       WHEN a IS NULL AND b IS NULL THEN 'corrupt'
                       WHEN a IS NULL THEN 'badtype'
                       ELSE 'ok'
                     END AS status,
                     a
              FROM parsed
            )
            SELECT status, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(a) AS BIGINT) AS sum_a
            FROM cls GROUP BY status
        """,
        "locf_daily_revenue": """
            WITH daily AS (
              SELECT o_orderpriority,
                     date_trunc('day', o_orderdate) AS day,
                     sum(CAST(o_totalprice AS DECIMAL(38,9))) AS rev
              FROM orders GROUP BY 1, 2
            ),
            bounds AS (
              SELECT date_trunc('day', min(o_orderdate)) AS lo,
                     date_trunc('day', max(o_orderdate)) AS hi
              FROM orders
            ),
            spine AS (
              SELECT p.o_orderpriority, g.day
              FROM (SELECT DISTINCT o_orderpriority FROM orders) p
              CROSS JOIN bounds b,
              LATERAL (
                SELECT unnest(generate_series(b.lo, b.hi,
                                              INTERVAL 1 DAY)) AS day
              ) g
            ),
            j AS (
              SELECT s.o_orderpriority, s.day, d.rev
              FROM spine s
              LEFT JOIN daily d
                ON s.o_orderpriority = d.o_orderpriority AND s.day = d.day
            ),
            f AS (
              SELECT o_orderpriority, day, rev,
                     last_value(rev IGNORE NULLS) OVER (
                       PARTITION BY o_orderpriority ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS locf
              FROM j
            )
            SELECT o_orderpriority,
                   strftime(day, '%Y-%m-%d') AS day,
                   floor(CAST(locf AS DOUBLE) * 100 + 0.5) / 100
                     AS revenue_locf,
                   (rev IS NULL AND locf IS NOT NULL) AS carried
            FROM f
        """,
        "explode_outer_audit": """
            WITH arrs AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 10 < 7 THEN
                       list_slice(list_filter(
                         string_split(regexp_replace(lower(trim(text)),
                                                     '\\s+', ' ', 'g'), ' '),
                         x -> x <> ''), 1, 3)
                     ELSE [] END AS l
              FROM documents
            )
            SELECT a.doc_id,
                   CAST(t.i - 1 AS BIGINT) AS pos,
                   a.l[t.i] AS tok
            FROM arrs a
            LEFT JOIN LATERAL (
              SELECT unnest(generate_series(1, len(a.l))) AS i
            ) t ON true
        """,
        "dense_daily_revenue": """
            WITH daily AS (
              SELECT o_orderpriority,
                     date_trunc('day', o_orderdate) AS day,
                     sum(CAST(o_totalprice AS DECIMAL(38,9))) AS rev
              FROM orders GROUP BY 1, 2
            ),
            bounds AS (
              SELECT date_trunc('day', min(o_orderdate)) AS lo,
                     date_trunc('day', max(o_orderdate)) AS hi
              FROM orders
            ),
            spine AS (
              SELECT p.o_orderpriority, g.day
              FROM (SELECT DISTINCT o_orderpriority FROM orders) p
              CROSS JOIN bounds b,
              LATERAL (
                SELECT unnest(generate_series(b.lo, b.hi,
                                              INTERVAL 1 DAY)) AS day
              ) g
            )
            SELECT s.o_orderpriority,
                   strftime(s.day, '%Y-%m-%d') AS day,
                   floor(CAST(coalesce(d.rev, 0) AS DOUBLE) * 100 + 0.5)
                     / 100 AS revenue,
                   d.rev IS NULL AS gap_filled
            FROM spine s
            LEFT JOIN daily d
              ON s.o_orderpriority = d.o_orderpriority AND s.day = d.day
        """,
        "event_unpivot_roundtrip": """
            -- the direct long form: hash equality proves the Spark
            -- side's pivot -> stack round trip is lossless
            SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
            FROM events
            GROUP BY user_id, event_type
        """,
        "grouping_sets_mix": """
            SELECT l_returnflag, l_linestatus, ship_month,
                   CAST(grouping(l_returnflag) * 4
                        + grouping(l_linestatus) * 2
                        + grouping(ship_month) AS BIGINT) AS gid,
                   CAST(count(*) AS BIGINT) AS n,
                   floor(CAST(sum(CAST(l_quantity AS DECIMAL(38,9)))
                              AS DOUBLE) * 1000000 + 0.5) / 1000000
                     AS sum_qty
            FROM (SELECT *, strftime(l_shipdate, '%Y-%m') AS ship_month
                  FROM lineitem)
            GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                    (ship_month), ())
        """,
        "image_dims_native": """
            WITH spec AS (
              SELECT doc_id,
                     CAST(16 + doc_id % 64 AS BIGINT) AS w0,
                     CAST(16 + (doc_id * 7) % 64 AS BIGINT) AS h0,
                     CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'qdct' END
                       AS fmt
              FROM documents
            ),
            blobs AS (
              SELECT doc_id, fmt, w0, h0,
                     CASE WHEN fmt = 'png' THEN
                       unhex('89504E470D0A1A0A' || '0000000D' || '49484452'
                             || lpad(hex(w0), 8, '0') || lpad(hex(h0), 8, '0'))
                     ELSE
                       unhex(lpad(hex(w0), 4, '0') || lpad(hex(h0), 4, '0')
                             || '04')
                     END AS b
              FROM spec
            ),
            dims AS (
              -- DuckDB has no substring on BLOB: parse via the hex
              -- string (byte k -> hex chars 2k-1..2k); values equal the
              -- engine's binary-substring route by construction
              SELECT doc_id, fmt, w0, h0,
                     CASE WHEN fmt = 'png' THEN
                       CAST(concat('0x', substring(hex(b), 33, 8)) AS BIGINT)
                     ELSE
                       CAST(concat('0x', substring(hex(b), 1, 4)) AS BIGINT)
                     END AS w,
                     CASE WHEN fmt = 'png' THEN
                       CAST(concat('0x', substring(hex(b), 41, 8)) AS BIGINT)
                     ELSE
                       CAST(concat('0x', substring(hex(b), 5, 4)) AS BIGINT)
                     END AS h
              FROM blobs
            )
            SELECT doc_id, fmt, w, h, (w = w0 AND h = h0) AS ok FROM dims
        """,
        "snm_blocking_eval": """
            WITH norm AS (
              SELECT doc_id,
                     regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
              FROM documents
            ),
            rk AS (
              SELECT doc_id,
                     row_number() OVER (ORDER BY substring(t, 1, 12), doc_id)
                       AS rn
              FROM norm
            ),
            pred AS (
              SELECT DISTINCT least(a.doc_id, b.doc_id) AS doc_a,
                              greatest(a.doc_id, b.doc_id) AS doc_b
              FROM rk a JOIN rk b ON b.rn - a.rn >= 1 AND b.rn - a.rn <= 3
            ),
            words AS (
              SELECT doc_id, string_split(t, ' ') AS ws FROM norm
            ),
            sh AS (
              SELECT DISTINCT doc_id,
                     ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
              FROM words, unnest(generate_series(1, len(ws) - 2)) AS tt(i)
              WHERE len(ws) >= 3
            ),
            sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
              FROM sh a JOIN sh b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            truth AS (
              SELECT doc_a, doc_b
              FROM inter
              JOIN sizes sa ON doc_a = sa.doc_id
              JOIN sizes sb ON doc_b = sb.doc_id
              WHERE round(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6)
                    >= 0.5
            ),
            j AS (
              SELECT p.doc_a IS NOT NULL AS in_p, t.doc_a IS NOT NULL AS in_t
              FROM pred p FULL OUTER JOIN truth t
                ON p.doc_a = t.doc_a AND p.doc_b = t.doc_b
            )
            SELECT
              sum(CASE WHEN in_p THEN 1 ELSE 0 END) AS n_pred,
              sum(CASE WHEN in_t THEN 1 ELSE 0 END) AS n_truth,
              sum(CASE WHEN in_p AND in_t THEN 1 ELSE 0 END) AS n_hit,
              round(sum(CASE WHEN in_p AND in_t THEN 1 ELSE 0 END) * 1.0
                / nullif(sum(CASE WHEN in_p THEN 1 ELSE 0 END), 0), 6)
                AS precision,
              round(sum(CASE WHEN in_p AND in_t THEN 1 ELSE 0 END) * 1.0
                / nullif(sum(CASE WHEN in_t THEN 1 ELSE 0 END), 0), 6)
                AS recall,
              round(2.0 * sum(CASE WHEN in_p AND in_t THEN 1 ELSE 0 END)
                / nullif(sum(CASE WHEN in_p THEN 1 ELSE 0 END)
                         + sum(CASE WHEN in_t THEN 1 ELSE 0 END), 0), 6)
                AS f1
            FROM j
        """,
        "trailing_window_load": """
            WITH ev AS (
              SELECT event_id, event_type,
                     -- integer floor of epoch seconds: matches Spark's
                     -- cast(timestamp as long) truncation; CAST from
                     -- epoch()'s double would ROUND and disagree
                     epoch_us(ts) // 1000000 AS t,
                     CAST(value AS DECIMAL(38,9)) AS v
              FROM events
            )
            SELECT event_id, event_type, t,
                   CAST(count(*) OVER (
                     PARTITION BY event_type ORDER BY t
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS n_trailing,
                   floor(CAST(sum(v) OVER (
                     PARTITION BY event_type ORDER BY t
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
                   ) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS sum_trailing
            FROM ev
        """,
        "html_extract": """
            -- independent re-derivation from the raw text: stripped
            -- visible text is title + body + 'next' (+ 'skip' on every
            -- third doc), links are 1 + the conditional nav link
            WITH n AS (
              SELECT doc_id,
                     regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')
                       AS norm
              FROM documents
            )
            SELECT doc_id,
                   array_to_string(
                     list_slice(string_split(norm, ' '), 1, 3), ' ')
                     AS title,
                   cast(1 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                        AS bigint) AS n_links,
                   cast(length(array_to_string(
                          list_slice(string_split(norm, ' '), 1, 3), ' '))
                        + length(norm) + 4
                        + CASE WHEN doc_id % 3 = 0 THEN 4 ELSE 0 END
                        AS bigint) AS visible_chars
            FROM n
        """,
        "conditional_get": f"""
            WITH f AS ({_FRONTIER_SQL}),
            rev AS (
              SELECT f.host, length(d.text) AS body_len,
                     CASE WHEN ({_hexdig_sql("cast(f.doc_id AS varchar)", 8)}
                                % (4 + f.doc_id % 5 + 1)) > 0
                          THEN 1 ELSE 0 END AS changed
              FROM f JOIN documents d USING (doc_id)
            )
            SELECT host, count(*) AS n_revisits,
                   cast(sum(1 - changed) AS bigint) AS n_304,
                   round(avg(1 - changed), 6) AS not_modified_share,
                   cast(sum(CASE WHEN changed = 0 THEN body_len ELSE 0 END)
                        AS bigint) AS bytes_saved
            FROM rev GROUP BY host
        """,
        "source_mixture": """
            WITH per_src AS (
              SELECT source, count(*) AS n_docs,
                     cast(sum(len(string_split(
                       regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                       ' '))) AS bigint) AS n_tokens
              FROM documents GROUP BY source
            ),
            w AS (SELECT *, sqrt(n_tokens) AS raw_w FROM per_src),
            tot AS (SELECT sum(raw_w) AS tot_w FROM w)
            SELECT source, n_docs, n_tokens,
                   round(raw_w / tot_w, 6) AS mix_weight,
                   round(raw_w / tot_w * 1000000 / n_tokens, 6)
                     AS epoch_sample_rate
            FROM w, tot
        """,
        "bucket_rebalance": f"""
            WITH f AS ({_FRONTIER_SQL}),
            per_bucket AS (
              SELECT ({_hexdig_sql("url", 1)} * 16
                      + {_hexdig_sql("url", 2)}) % 32 AS bucket,
                     count(*) AS n_rows
              FROM f GROUP BY 1
            ),
            m AS (SELECT avg(n_rows) AS mean_rows FROM per_bucket)
            SELECT bucket, n_rows,
                   round(n_rows / mean_rows, 6) AS load,
                   CASE WHEN n_rows > 1.25 * mean_rows THEN 'split'
                        WHEN n_rows < 0.5 * mean_rows THEN 'compact'
                        ELSE 'ok' END AS action
            FROM per_bucket, m
        """,
        "source_kl": """
            WITH toks AS (
              SELECT source,
                     unnest(string_split(regexp_replace(lower(trim(text)),
                                                        '\\s+', ' ', 'g'),
                                         ' ')) AS tok
              FROM documents
            ),
            v AS (SELECT count(DISTINCT tok) AS vocab_n FROM toks),
            ct AS (SELECT count(*) AS corpus_tot FROM toks),
            corpus AS (SELECT tok, count(*) AS n_corpus FROM toks
                       GROUP BY tok),
            per_src AS (SELECT source, tok, count(*) AS n_src FROM toks
                        GROUP BY source, tok),
            src_tot AS (SELECT source, count(*) AS tot_src FROM toks
                        GROUP BY source),
            j AS (
              SELECT s.source,
                     (s.n_src + 1) * 1.0 / (st.tot_src + v.vocab_n) AS p,
                     (c.n_corpus + 1) * 1.0
                       / (ct.corpus_tot + v.vocab_n) AS q
              FROM per_src s JOIN corpus c USING (tok)
                             JOIN src_tot st USING (source), v, ct
            )
            SELECT source, round(sum(p * ln(p / q)), 6) AS kl_nats,
                   count(*) AS n_types
            FROM j GROUP BY source
        """,
        # crawl_smoke, image_decode_stats, image_sharpness, audio_stats,
        # mime_sniff: intentionally no SQL oracle (engine-internal tables
        # / binary codec); driver records rows-only checks.
    }
    # the map-side repetition gate computes per-document values DEFINED
    # to equal the grouped-count suite's — one oracle serves both, so a
    # divergence between the two plans is itself a correctness failure
    sqls["repetition_mapside"] = sqls["repetition_suite"]
    return sqls
