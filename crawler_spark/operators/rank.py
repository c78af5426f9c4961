"""Link-based host authority for frontier prioritization.

The reference schedules work FIFO per category (crawler.py round loop);
an OCIP-style frontier at 10^10 URLs wants a smarter priority column.
This operator computes fixed-iteration weighted PageRank over the host
link graph (hosts = nodes, aggregated outlink counts = edge weights) —
the standard authority prior a crawl scheduler multiplies into its
(priority, depth, discovery_seq) ordering key.

Scale shape: per iteration, one hash join of edges against the current
rank vector (both partitioned by the join key) + one map-side-combined
aggregation — the canonical Spark PageRank dataflow. The node count is
folded in as a broadcast scalar (one-row crossJoin), never a driver-side
collect. Hosts are ~10^7 at web scale (vs 10^10 URLs), so each
iteration's state is small relative to the frontier; the edge table is
reused across iterations (cache-friendly, lineage truncated by the
caller if iterating deep).

Determinism: ranks are rounded to 9 decimals each iteration (the same
stabilization the IVF k-means refinement uses) so an ANSI-SQL oracle
unrolling the iterations reproduces hashes exactly. Dangling-node mass
is dropped (the classic contribs formulation, as in Spark's own
PageRank example) — documented, mirrored by the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def link_rank(
    edges: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    round_iter: int = 9,
) -> DataFrame:
    """Fixed-iteration weighted PageRank.

    ``edges``: (src, dst, weight). Returns (node, rank) for every node
    appearing as src or dst, rank rounded to ``round_iter`` decimals.

    r_0(v) = 1/N;  r_{k+1}(v) = (1-d)/N + d * sum over in-edges (u,v)
    of r_k(u) * w_uv / outw(u), where outw(u) = sum of u's out-weights.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.agg(F.count("*").cast("double").alias("n_nodes"))
    outw = edges.groupBy("src").agg(
        F.sum(F.col("weight").cast("double")).alias("outw")
    )
    # (src, dst, share): share = weight/outw, fixed across iterations
    shares = (
        edges.join(outw, "src")
        .select(
            "src",
            "dst",
            (F.col("weight").cast("double") / F.col("outw")).alias("share"),
        )
        .persist()
    )
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node", F.round(F.lit(1.0) / F.col("n_nodes"), round_iter).alias("rank")
    )
    for it in range(n_iter):
        inflow = (
            shares.join(ranks, shares["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("share")).alias("inflow"))
        )
        ranks = (
            nodes.join(inflow, nodes["node"] == inflow["dst"], "left")
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "node",
                F.round(
                    (1.0 - damping) / F.col("n_nodes")
                    + damping * F.coalesce(F.col("inflow"), F.lit(0.0)),
                    round_iter,
                ).alias("rank"),
            )
        )
        # checkpoint every 4th iteration: keeps the plan from growing
        # exponentially at deep n_iter (same concern as dedup_clusters'
        # label loop) while short runs stay one fully-lazy plan — the
        # eager per-iteration jobs were 6x the wall time of the final
        # query for n_iter=3.
        if (it + 1) % 4 == 0 and it + 1 < n_iter:
            ranks = ranks.localCheckpoint()
    shares.unpersist()
    return ranks


def opic_importance(
    edges: DataFrame,
    n_iter: int = 3,
    round_iter: int = 9,
) -> DataFrame:
    """Adaptive OPIC (Abiteboul/Preda/Cobena, WWW 2003) — the on-line
    page-importance estimator the north rule's "OPIC-style priority
    queue" names, as a synchronous batch wave.

    State per node: (cash, history). Init cash = 1/N, history = 0. Each
    iteration EVERY node banks its cash into history and distributes it
    across its out-edges proportional to edge weight; a node with no
    out-edges pays its cash to the paper's *virtual page*, whose pot is
    redistributed uniformly to all nodes in the same step. Total cash
    stays exactly 1 per step, so after k steps total history is k and
    the importance estimate is (history + cash) / (k + 1).

    Unlike PageRank (link_rank above) there is no damping and no
    fixpoint — OPIC is an anytime estimator whose partial sums are
    already usable, which is why crawlers use it: the frontier can
    re-prioritize after every wave without waiting for convergence.

    ``edges``: (src, dst, weight). Returns (node, importance).

    Scale shape: per iteration one hash join of the share table against
    the state vector plus one map-side-combined aggregation — identical
    dataflow to link_rank — and the dangling pot is a one-row aggregate
    folded in via broadcast crossJoin (never a driver collect). Ranks
    round to ``round_iter`` decimals per iteration so the unrolled-CTE
    ANSI oracle reproduces hashes exactly.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.agg(F.count("*").cast("double").alias("n_nodes"))
    outw = edges.groupBy("src").agg(
        F.sum(F.col("weight").cast("double")).alias("outw")
    )
    shares = (
        edges.join(outw, "src")
        .select(
            "src",
            "dst",
            (F.col("weight").cast("double") / F.col("outw")).alias("share"),
        )
        .persist()
    )
    state = (
        nodes.join(outw, nodes["node"] == outw["src"], "left")
        .crossJoin(F.broadcast(n_nodes))
        .select(
            "node",
            F.round(F.lit(1.0) / F.col("n_nodes"), round_iter).alias("cash"),
            F.lit(0.0).alias("history"),
            F.col("outw").isNull().alias("dangling"),
        )
    )
    for it in range(n_iter):
        # the virtual page's pot: cash held by dangling nodes this step
        pot = state.filter("dangling").agg(
            F.coalesce(F.sum("cash"), F.lit(0.0)).alias("pot")
        )
        inflow = (
            shares.join(state, shares["src"] == state["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("cash") * F.col("share")).alias("inflow"))
        )
        state = (
            state.join(inflow, state["node"] == inflow["dst"], "left")
            .crossJoin(F.broadcast(pot))
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "node",
                F.round(
                    F.coalesce(F.col("inflow"), F.lit(0.0))
                    + F.col("pot") / F.col("n_nodes"),
                    round_iter,
                ).alias("cash"),
                F.round(F.col("history") + F.col("cash"), round_iter).alias(
                    "history"
                ),
                "dangling",
            )
        )
        # the pot branch references the previous state too, so the plan
        # doubles per iteration — checkpoint more eagerly than link_rank
        if (it + 1) % 2 == 0 and it + 1 < n_iter:
            state = state.localCheckpoint()
    shares.unpersist()
    return state.select(
        "node",
        F.round(
            (F.col("history") + F.col("cash")) / F.lit(float(n_iter) + 1.0),
            round_iter,
        ).alias("importance"),
    )


def trust_rank(
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    round_iter: int = 9,
) -> DataFrame:
    """Weighted TrustRank (Gyongyi/Garcia-Molina/Pedersen, public
    VLDB'04): PageRank with teleport mass restricted to a vetted seed
    set, so trust decays with link distance from known-good hosts and
    link farms — which no seed points at — starve.

    ``edges``: (src, dst, weight); ``seeds``: one ``node`` column, the
    trusted subset. Returns (node, trust) for every node in the graph.

    t_0(v) = seed(v)/|S|;  t_{k+1}(v) = (1-d)*seed(v)/|S|
             + d * sum over in-edges (u,v) of t_k(u) * w_uv / outw(u).

    Same dataflow as link_rank (one share-vs-state hash join + one
    map-side-combined agg per iteration); the seed indicator joins in
    as a broadcast (seed sets are small by construction — hand-vetted),
    and |S| folds in as a one-row broadcast aggregate, never a driver
    collect. Per-iteration pinned rounding (floor(x*10^k + 0.5)/10^k —
    identical IEEE ops in Spark and DuckDB, immune to the .5-boundary
    HALF_UP/double divergence that plain round() has on decimal-ish
    teleport products like 0.15 * 1/|S|) keeps the unrolled-CTE ANSI
    oracle hash-exact.
    """

    def pin(col, k=round_iter):
        sc = float(10**k)
        return F.floor(col * F.lit(sc) + F.lit(0.5)) / F.lit(sc)

    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    seed_nodes = nodes.join(F.broadcast(seeds), "node", "left_semi")
    n_seeds = seed_nodes.agg(F.count("*").cast("double").alias("n_seeds"))
    outw = edges.groupBy("src").agg(
        F.sum(F.col("weight").cast("double")).alias("outw")
    )
    shares = (
        edges.join(outw, "src")
        .select(
            "src",
            "dst",
            (F.col("weight").cast("double") / F.col("outw")).alias("share"),
        )
        .persist()
    )
    # d0 = teleport share: 1/|S| on seeds, 0 elsewhere
    base = (
        nodes.join(
            F.broadcast(seed_nodes.withColumn("is_seed", F.lit(True))),
            "node",
            "left",
        )
        .crossJoin(F.broadcast(n_seeds))
        .select(
            "node",
            F.when(
                F.col("is_seed"), F.lit(1.0) / F.col("n_seeds")
            ).otherwise(F.lit(0.0)).alias("d0"),
        )
    )
    trust = base.select("node", pin(F.col("d0")).alias("trust"))
    for it in range(n_iter):
        inflow = (
            shares.join(trust, shares["src"] == trust["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("trust") * F.col("share")).alias("inflow"))
        )
        trust = (
            base.join(inflow, base["node"] == inflow["dst"], "left")
            .select(
                "node",
                pin(
                    (1.0 - damping) * F.col("d0")
                    + damping * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("trust"),
            )
        )
        if (it + 1) % 4 == 0 and it + 1 < n_iter:
            trust = trust.localCheckpoint()
    shares.unpersist()
    return trust


def focused_priority(
    pages: DataFrame,
    edges: DataFrame,
    topic_terms: list[str],
    decay: float = 0.5,
) -> DataFrame:
    """Shark-search focused-crawl priority (Hersovici et al., WWW 1998
    shape): a child URL inherits a decayed share of its parent page's
    topic relevance, plus an anchor-text bonus when the linking anchor
    itself mentions the topic — the scheduler feed that steers a
    topical crawl toward its subject instead of breadth-first drift.

    ``pages``: (doc_id, text). ``edges``: (src_id, dst_id, anchor_term).
    Parent relevance = |distinct page terms ∩ topic| / |topic| (exact
    rational). Edge score = decay * parent_relevance +
    (1 - decay) * [anchor_term ∈ topic]. Output per dst_id: n_parents,
    best_priority (max edge score — best-first), avg_priority.

    Scale shape: relevance is one explode + semi-join against the
    broadcast topic list + map-side-combinable count per doc; the edge
    scoring is a fact-to-fact equi-join on src_id; the per-target
    reduce is a combinable max/avg. No windows over the edge table, no
    iteration — this runs per crawl wave on the wave's new pages only.
    """
    topic = [t.lower() for t in topic_terms]
    toks = pages.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ")
            )
        ).alias("term"),
    )
    rel = (
        toks.filter(F.col("term").isin(topic))
        .groupBy("doc_id")
        .agg((F.count("*") / F.lit(len(topic))).alias("relevance"))
    )
    parent = pages.select("doc_id").join(rel, "doc_id", "left").select(
        F.col("doc_id").alias("src_id"),
        F.coalesce("relevance", F.lit(0.0)).alias("relevance"),
    )
    scored = edges.join(parent, "src_id").select(
        "dst_id",
        F.round(
            F.lit(decay) * F.col("relevance")
            + F.lit(1.0 - decay)
            * F.col("anchor_term").isin(topic).cast("double"),
            6,
        ).alias("score"),
    )
    return scored.groupBy("dst_id").agg(
        F.count("*").alias("n_parents"),
        F.max("score").alias("best_priority"),
        F.round(F.avg("score"), 6).alias("avg_priority"),
    )


def url_static_features(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Static URL-feature priority (the IRLbot/BUbiNG-style pre-fetch
    heuristic): before any content exists, a frontier ranks candidates
    by URL shape alone — shallow paths, few query params, and low digit
    density correlate with hub/landing pages; deep digit-heavy
    parameterized URLs correlate with calendar traps and session noise.

    Pure native expressions (regexp_replace + length arithmetic, no
    UDF), so the whole scoring stage is one whole-stage-codegen map over
    the frontier — exactly what a 10^10-row priority backfill needs.
    Emits per URL: path_depth, n_params, digit_ratio, static_score
    (higher = fetch earlier); the scheduler multiplies static_score
    into its (priority, depth, discovery_seq) key."""
    path = F.regexp_replace(F.col(url_col), r"^[a-z]+://[^/]*", "")
    pre_q = F.regexp_replace(path, r"\?.*$", "")
    query = F.when(
        F.instr(path, "?") > 0, F.regexp_replace(path, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    depth = F.length(pre_q) - F.length(F.regexp_replace(pre_q, r"/", ""))
    n_params = F.when(F.length(query) == 0, F.lit(0)).otherwise(
        F.length(query) - F.length(F.regexp_replace(query, r"=", "")),
    )
    digits = F.length(F.regexp_replace(F.col(url_col), r"[^0-9]", ""))
    digit_ratio = F.round(digits / F.length(F.col(url_col)), 6)
    score = F.round(
        (F.lit(4.0) / (F.lit(4.0) + depth.cast("double")))
        * (F.lit(2.0) / (F.lit(2.0) + n_params.cast("double")))
        * (F.lit(1.0) - digit_ratio / F.lit(2.0)),
        6,
    )
    return urls.select(
        F.col(url_col).alias("url"),
        depth.cast("int").alias("path_depth"),
        n_params.cast("int").alias("n_params"),
        digit_ratio.alias("digit_ratio"),
        score.alias("static_score"),
    )


def rank_to_priorities(
    ranks: DataFrame,
    key_col: str = "node",
    score_col: str = "rank",
    n_bands: int = 4,
) -> DataFrame:
    """Quantize a rank pass's scores into integer frontier priorities
    (band 0 = highest-scored hosts, scheduled first) — the glue between
    link_rank / opic_importance output and the crawl scheduler's
    ``host_priorities``. Band cuts are EXACT percentiles broadcast back
    (two distributed passes — no global window over the host dimension,
    same construction as curriculum staging); ties straddling a cut
    share the better band, so the mapping is total and deterministic.

    Returns (``key_col``, priority int). The output is host-dimension
    sized: collect it into the literal map for a sandbox crawl, or feed
    it to the broadcast-join form of the priority lookup at 10^7 hosts.
    """
    probs = [i / n_bands for i in range(1, n_bands)]
    cuts = ranks.agg(
        *[
            F.round(
                F.expr(f"percentile({score_col}, {1.0 - p})"), 9
            ).alias(f"c{i}")
            for i, p in enumerate(probs)
        ]
    )
    out = ranks.crossJoin(F.broadcast(cuts))
    prio = F.lit(n_bands - 1)
    for i in range(len(probs) - 1, -1, -1):
        prio = F.when(
            F.col(score_col) >= F.col(f"c{i}"), F.lit(i)
        ).otherwise(prio)
    return out.select(F.col(key_col), prio.cast("int").alias("priority"))


def anchor_text_index(
    edges: DataFrame,
    authority: DataFrame,
    k: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    term_col: str = "term",
    auth_col: str = "auth",
) -> DataFrame:
    """Target-side anchor-text index — the oldest off-page relevance
    signal in web search (Brin & Page '98 §2.2: anchors describe the
    TARGET better than its own text describes itself, and they exist
    for pages the crawler has not fetched yet). Per (target, term):
    link count, distinct linking sources, and an authority-weighted
    score = sum of the linking sources' authority (so one spam farm
    repeating an anchor 10^6 times scores below three trusted hosts
    saying it once); the top-k terms per target survive.

    Shape: one groupBy (dst, term) with map-side partial agg — the
    O(edges) stage; authority is a broadcast host dimension; the top-k
    is a window over the (dst, term) AGGREGATE (|dst| * terms rows,
    never the edge multiset). Weighted sums are 1e-9-pinned and
    decimal-accumulated, order-independent (SCALE.md determinism).

    Output: (dst, term, n_links, n_src, score, rnk) with rnk 1..k by
    (score desc, term) per dst.
    """
    from crawler_spark.functions.num import pin9

    term = pin9(F.coalesce(F.col(auth_col), F.lit(0.0)))
    agg = (
        edges.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            F.col(term_col).alias("term"),
        )
        .join(
            F.broadcast(
                authority.select(
                    F.col(src_col).alias("src"), F.col(auth_col).alias(auth_col)
                )
            ),
            "src",
            "left",
        )
        .withColumn("w", term.cast("decimal(28, 9)"))
        .groupBy("dst", "term")
        .agg(
            F.count("*").alias("n_links"),
            F.countDistinct("src").alias("n_src"),
            F.sum("w").cast("double").alias("score"),
        )
    )
    w = Window.partitionBy("dst").orderBy(F.desc("score"), "term")
    return (
        agg.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "dst",
            "term",
            F.col("n_links").cast("long").alias("n_links"),
            F.col("n_src").cast("long").alias("n_src"),
            "score",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )
