"""Redirect-chain resolution by pointer doubling.

A crawl frontier constantly meets HTTP redirects (301/302/308): the
fetched URL is not the canonical one, and chains (a -> b -> c) and
cycles (a -> b -> a) both occur in the wild. The reference follows
redirects implicitly inside the browser (crawler.py navigation waits);
a batch engine must resolve them as data: map every redirect source to
its terminal URL, the hop count, and an unresolved flag for
cycles/over-long chains.

The naive dataflow walks one hop per join — O(max_hops) shuffles, and
at 10^10 URLs a 16-hop budget means 16 full shuffle joins. This
operator uses POINTER DOUBLING (path contraction): after k rounds every
pointer has advanced 2^k hops (or parked on a terminal), so a
``max_hops`` budget costs only ceil(log2(max_hops)) self-joins. Hop
counts stay exact under doubling because each join concatenates two
exactly-measured path segments (b's segment starts where a's ends).

Scale shape: each round is one hash self-join of the mapping on
(cur = src) — both sides partitioned by the join key, size O(redirect
sources), which is a small fraction of the frontier. Rows already
parked on a terminal URL survive the left join unchanged and carry no
build-side cost. No driver-side collect; no per-row Python.

Determinism: each source has at most one out-edge (a URL redirects to
exactly one place), so the walk is a function — unique fixpoint,
oracle-reproducible with a hop-bounded recursive CTE.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_propagation(edges: DataFrame, n_iter: int = 3) -> DataFrame:
    """Synchronous weighted label propagation (Raghavan et al., public
    Phys. Rev. E 2007) — community detection one notch finer than
    connected components: hosts that HEAVILY interlink group together
    even when a stray edge joins two clusters into one component. The
    crawl scheduler uses communities to cap per-community budget (a
    link farm is one community no matter how many hosts it spawns).

    ``edges``: (src, dst, weight), treated as undirected (symmetrized
    here, parallel weights summed). Every node starts labeled with its
    own id; each synchronous round a node adopts the label carrying
    the max total incident weight among its neighbors' current labels,
    ties to the SMALLEST label — fully deterministic, so an
    unrolled-CTE ANSI oracle reproduces the run exactly (classic LPA
    breaks ties randomly; determinism costs nothing here and buys
    testability).

    Scale shape: per round one hash join of the symmetrized edge list
    against the label vector + one map-side-combined (node, label)
    weight agg + one per-node top-1 window — all partitioned by node;
    state is O(nodes), edges are reused across rounds. Integer weight
    sums only, no float drift.
    """
    from pyspark.sql import Window

    und = (
        edges.select("src", "dst", "weight")
        .unionByName(
            edges.select(
                F.col("dst").alias("src"),
                F.col("src").alias("dst"),
                "weight",
            )
        )
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
        .persist()
    )
    labels = und.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for it in range(n_iter):
        votes = (
            und.join(
                labels.select(
                    F.col("node").alias("dst"), F.col("label").alias("nlabel")
                ),
                "dst",
            )
            .groupBy("src", "nlabel")
            .agg(F.sum("weight").alias("w"))
        )
        top = Window.partitionBy("src").orderBy(
            F.desc("w"), F.asc("nlabel")
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(top))
            .filter(F.col("rn") == 1)
            .select(F.col("src").alias("node"), F.col("nlabel").alias("label"))
        )
        if (it + 1) % 4 == 0 and it + 1 < n_iter:
            labels = labels.localCheckpoint()
    out = labels.select("node", F.col("label").alias("community"))
    und.unpersist()
    return out


def hits_scores(
    edges: DataFrame,
    iters: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """HITS (Kleinberg) hubs-and-authorities over a link graph.

    PageRank (see plans' link_rank) scores global popularity; HITS
    separates *hubs* (pages that link to many good authorities — link
    farms and directory pages light up here) from *authorities* (pages
    linked by many good hubs). A crawl scheduler uses the two scores
    differently: fetch authorities for content, fetch hubs for frontier
    expansion.

    Update rule per iteration: auth(v) = sum of hub(u) over u->v, then
    L2-normalize; hub(u) = sum of auth(v) over u->v, then L2-normalize.
    All hub/auth state lives on the EDGE LIST (joined by key) — no
    driver-side vectors, so the graph can be 10^10 edges. Each
    iteration is two shuffle joins on (src)/(dst) plus a 1-row L2-norm
    agg broadcast back; iterations are localCheckpoint-bounded like
    ``resolve_redirects`` so the plan stays linear in ``iters``.

    Returns (node, authority, hub) for every node in the graph; nodes
    with no in-links have authority 0, nodes with no out-links hub 0.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    hub = nodes.select("node", F.lit(1.0).alias("h"))
    auth = None
    for _ in range(max(1, iters)):
        # auth(v) = sum hub(u) over in-edges, then L2-normalize
        a = (
            e.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("h").alias("a"))
        )
        a = nodes.join(a, "node", "left").select(
            "node", F.coalesce("a", F.lit(0.0)).alias("a")
        )
        norm = a.agg(F.sqrt(F.sum(F.col("a") * F.col("a"))).alias("n"))
        auth = a.crossJoin(F.broadcast(norm)).select(
            "node", (F.col("a") / F.col("n")).alias("a")
        ).localCheckpoint()
        # hub(u) = sum auth(v) over out-edges, then L2-normalize
        h = (
            e.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a").alias("h"))
        )
        h = nodes.join(h, "node", "left").select(
            "node", F.coalesce("h", F.lit(0.0)).alias("h")
        )
        norm = h.agg(F.sqrt(F.sum(F.col("h") * F.col("h"))).alias("n"))
        hub = h.crossJoin(F.broadcast(norm)).select(
            "node", (F.col("h") / F.col("n")).alias("h")
        ).localCheckpoint()
    return auth.join(hub, "node").select(
        "node",
        F.col("a").alias("authority"),
        F.col("h").alias("hub"),
    )


def salsa_scores(
    edges: DataFrame,
    iters: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """SALSA (Lempel & Moran, WWW'00): the random-walk normalization of
    HITS. Where HITS sums raw neighbor scores (so tightly-knit link
    farms capture both scores — the TKC effect), SALSA walks the
    bipartite hub/authority graph with DEGREE-NORMALIZED steps:

        auth(v) = sum over u->v of hub(u)  / outdeg(u)
        hub(u)  = sum over u->v of auth(v) / indeg(v)

    each side L1-normalized per iteration (the scores are the walk's
    occupancy distributions; within one connected component the
    stationary authority is indeg-proportional, which the tests pin).

    Dataflow mirrors :func:`hits_scores`: degrees are computed ONCE and
    attached to the edge list (two broadcast-or-shuffle joins amortized
    across iterations), then every iteration is two key joins + a 1-row
    L1 norm broadcast back; state lives on the edge list, never the
    driver, and iterations are localCheckpoint-bounded so the plan stays
    linear in ``iters``. Safe at 10^10 edges.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    indeg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("id"))
    ed = e.join(outdeg, "src").join(indeg, "dst").localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    hub = nodes.select("node", F.lit(1.0).alias("h"))
    auth = None
    for _ in range(max(1, iters)):
        a = (
            ed.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("h") / F.col("od")).alias("a"))
        )
        a = nodes.join(a, "node", "left").select(
            "node", F.coalesce("a", F.lit(0.0)).alias("a")
        )
        norm = a.agg(F.sum("a").alias("n"))
        auth = a.crossJoin(F.broadcast(norm)).select(
            "node", (F.col("a") / F.col("n")).alias("a")
        ).localCheckpoint()
        h = (
            ed.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum(F.col("a") / F.col("id")).alias("h"))
        )
        h = nodes.join(h, "node", "left").select(
            "node", F.coalesce("h", F.lit(0.0)).alias("h")
        )
        norm = h.agg(F.sum("h").alias("n"))
        hub = h.crossJoin(F.broadcast(norm)).select(
            "node", (F.col("h") / F.col("n")).alias("h")
        ).localCheckpoint()
    return auth.join(hub, "node").select(
        "node",
        F.col("a").alias("authority"),
        F.col("h").alias("hub"),
    )


def resolve_redirects(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 8,
) -> DataFrame:
    """Resolve every redirect source to its terminal target.

    ``edges``: one row per redirect, at most one out-edge per
    ``src_col`` value (caller dedups; HTTP gives one Location per URL).

    Returns one row per distinct source:
      (src, final, n_hops, resolved) — ``final``/``n_hops`` are NULL
    and ``resolved`` false when the chain is cyclic or longer than
    ``max_hops`` (indistinguishable within the budget, and a crawler
    treats both as fetch-this-URL-as-is).
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    srcs = e.select(F.col("src").alias("_s")).distinct()
    # state: src -> (cur, hops); parked rows have cur not in srcs.
    # Each round's state feeds the next join TWICE (probe + build) —
    # without truncation the self-join would inline the whole prior
    # subtree on the build side (2^k logical joins and recompute), so
    # every round is localCheckpoint-materialized: exactly one executed
    # hash join per round, the dedup_clusters/link_rank iteration
    # pattern.
    m = e.select(
        "src", F.col("dst").alias("cur"), F.lit(1).alias("hops")
    ).localCheckpoint()
    for _ in range(max(1, math.ceil(math.log2(max_hops)))):
        step = m.select(
            F.col("src").alias("_src2"),
            F.col("cur").alias("_cur2"),
            F.col("hops").alias("_hops2"),
        )
        m = (
            m.join(step, m["cur"] == step["_src2"], "left")
            .select(
                "src",
                F.coalesce(F.col("_cur2"), F.col("cur")).alias("cur"),
                F.when(
                    F.col("_cur2").isNotNull(),
                    F.col("hops") + F.col("_hops2"),
                )
                .otherwise(F.col("hops"))
                .alias("hops"),
            )
            .localCheckpoint()
        )
    # doubling advances up to 2^k >= max_hops hops; the explicit budget
    # predicate below restores exact max_hops semantics when max_hops is
    # not a power of two (a terminal reached in more hops than the
    # budget counts as unresolved, same as a cycle)
    ok = F.col("_s").isNull() & (F.col("hops") <= F.lit(max_hops))
    out = (
        m.join(srcs, m["cur"] == srcs["_s"], "left")
        .select(
            "src",
            F.when(ok, F.col("cur")).alias("final"),
            F.when(ok, F.col("hops")).cast("int").alias("n_hops"),
            ok.alias("resolved"),
        )
    )
    return out


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 8,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    directed: bool = False,
) -> DataFrame:
    """Multi-source BFS: minimum hop distance from ANY seed to every
    reachable node within ``max_hops`` — the crawl-planning primitive
    behind "how far is this host from the vetted seed set" (the
    distance prior TrustRank approximates smoothly; a hard hop cutoff
    is the classic focused-crawl frontier fence).

    Level-synchronous dataflow: each hop joins only the CURRENT
    frontier (nodes first reached last hop) against the edge list, then
    anti-joins the accumulated distance table so every node is assigned
    exactly once — at its first (= minimum, by BFS induction) hop. Work
    per hop is O(frontier-adjacent edges), total O(E) across the run
    regardless of max_hops; lineage is localCheckpoint-truncated per
    level like the other iterative operators here. The per-hop
    empty-frontier check is one count on a host-dimension-sized
    DataFrame (the early-exit that stops dead components from paying
    the full hop budget).

    Undirected by default (edges symmetrized); pass directed=True to
    respect edge direction. Returns (node, dist), seeds at dist 0.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if not directed:
        e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    e = e.filter(F.col("a") != F.col("b")).distinct().persist()
    dist = (
        seeds.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0))
        .localCheckpoint()
    )
    frontier = dist.select("node")
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["a"])
            .select(F.col("b").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(hop))
            .localCheckpoint()
        )
        if not nxt.take(1):
            break
        dist = dist.unionByName(nxt).localCheckpoint()
        frontier = nxt.select("node")
    e.unpersist()
    return dist


def hyperball_balls(
    edges: DataFrame,
    n_iter: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """HyperBall (Boldi & Vigna, WWW 2013): per-node HyperLogLog
    counters of the out-ball B(v,t) = nodes reachable from v in <= t
    hops, grown by t synchronous counter-union rounds — THE algorithm
    that made neighborhood functions / geometric centralities feasible
    on billion-node web graphs, and exactly what a frontier
    prioritizer wants: |B(v,t)| is "how much of the web this host
    unlocks within t hops", computable without any per-pair BFS.

    State is the register table (node, idx, rho_max) — O(n * m) rows
    with m = 256 registers capped by the true ball size, never a
    per-node visited set. One round = one hash join of the edge list
    against the register table (B_t(v) ∪= B_{t-1}(w) for v -> w) plus
    one map-side-combinable (node, idx) max-agg; lineage is
    localCheckpoint-truncated per round like the other iterative
    operators here. The register/estimator recipe is byte-identical to
    sketches.hll_registers/hll_estimate (integer-scaled harmonic
    denominator, raw Flajolet estimator, md5-digit hashing), so the
    whole run unrolls into an exact ANSI-SQL oracle.

    Returns (node, t, ball_est) for t = 0..n_iter; ball_est is
    monotone nondecreasing in t (registers only grow).
    """
    from crawler_spark.operators.sketches import HLL_ALPHA, HLL_M, HLL_P

    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    h = F.expr(
        "cast(conv(substring(md5(cast(node as string)), 1, 15), 16, 10)"
        " as bigint)"
    )
    hw = nodes.select("node", h.alias("h")).select(
        "node",
        (F.col("h") % HLL_M).cast("int").alias("idx"),
        F.expr(f"shiftright(h, {HLL_P})").alias("w"),
    )
    b = hw.select(
        "node",
        "idx",
        F.when(F.col("w") == 0, F.lit(53))
        .otherwise(F.length(F.bin(F.col("w").bitwiseAND(-F.col("w")))))
        .alias("rho_max"),
    ).localCheckpoint()

    def est(bt: DataFrame, t: int) -> DataFrame:
        # Flajolet's raw estimator is flat (~alpha*m) below ~2.5m items —
        # useless for small balls, which is exactly where HyperBall
        # starts. Standard small-range correction: when raw <= 2.5m and
        # V = m - occupied > 0, use linear counting m*ln(m/V) (within a
        # branch the estimate stays monotone in the registers; the
        # branch switch itself happens far above any sandbox ball).
        raw = (
            F.lit(HLL_ALPHA * HLL_M * HLL_M)
            * F.pow(F.lit(2.0), 53)
            / F.col("denom_scaled")
        )
        v_zero = F.lit(HLL_M) - F.col("occupied")
        lin = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v_zero)
        return (
            bt.groupBy("node")
            .agg(
                (
                    F.sum(F.expr("shiftleft(1L, 53 - rho_max)"))
                    + (F.lit(HLL_M) - F.count(F.lit(1)))
                    * F.lit(1 << 53).cast("long")
                ).alias("denom_scaled"),
                F.count(F.lit(1)).alias("occupied"),
            )
            .select(
                "node",
                F.lit(t).alias("t"),
                F.round(
                    F.when(
                        (raw <= F.lit(2.5 * HLL_M)) & (v_zero > 0), lin
                    ).otherwise(raw),
                    3,
                ).alias("ball_est"),
            )
        )

    out = est(b, 0)
    for t in range(1, n_iter + 1):
        contrib = e.join(b.withColumnRenamed("node", "dst"), "dst").select(
            F.col("src").alias("node"), "idx", "rho_max"
        )
        b = (
            b.unionByName(contrib)
            .groupBy("node", "idx")
            .agg(F.max("rho_max").alias("rho_max"))
            .localCheckpoint()
        )
        out = out.unionByName(est(b, t))
    e.unpersist()
    return out


def harmonic_from_balls(
    balls: DataFrame, n_iter: int = 3, node_col: str = "node"
) -> DataFrame:
    """Harmonic centrality from HyperBall output: sum over t >= 1 of
    (|B(v,t)| - |B(v,t-1)|) / t — each newly reached node weighted by
    1/distance (Boldi & Vigna's estimator; balls are monotone so every
    term is >= 0). All arithmetic runs in INTEGER space — round-3
    estimates scale exactly to int64 thousandths, each 1/t reweights
    via lcm(1..n_iter) integer factors — so the sum is
    order-independent and the single float division at the end is
    engine-exact."""
    import math as _math

    from pyspark.sql import Window

    lcm = _math.lcm(*range(1, n_iter + 1))
    w = Window.partitionBy(node_col).orderBy("t")
    s = balls.withColumn(
        "sc", F.round(F.col("ball_est") * 1000).cast("long")
    )
    d = s.withColumn("prev", F.lag("sc").over(w)).filter(F.col("t") >= 1)
    term = (F.col("sc") - F.col("prev")) * F.expr(f"{lcm} div t")
    return (
        d.groupBy(node_col)
        .agg(F.sum(term).alias("num"))
        .select(
            node_col,
            F.round(F.col("num") / F.lit(1000.0 * lcm), 6).alias("harmonic"),
        )
    )


def effective_diameter(
    balls: DataFrame, n_iter: int = 3, q_permille: int = 900
) -> DataFrame:
    """Effective diameter from HyperBall output: the interpolated hop
    count t at which the neighborhood function N(t) = sum_v |B(v,t)|
    first reaches q of N(t_max) (q = 900 permille = the standard 90%
    effective diameter; Palmer et al. KDD'02, Boldi & Vigna WWW'13).

    All comparisons run in int64 space — N(t) sums the round-3 ball
    estimates as exact thousandths, and the q-threshold test is
    1000*N(t) >= q*N(T) in integers — so the crossing index is
    engine-exact; the single interpolated division at the end is one
    double op on int64 inputs (deterministic cross-engine). Returns one
    row (t_lo, t_hi, eff_diameter)."""
    nf = balls.groupBy("t").agg(
        F.sum(F.round(F.col("ball_est") * 1000).cast("long")).alias("nf_sc")
    )
    total = nf.filter(F.col("t") == n_iter).select(
        F.col("nf_sc").alias("nf_total")
    )
    j = nf.crossJoin(F.broadcast(total))
    # first t where 1000*N(t) >= q*N(T)  (exact integer test)
    hit = (
        j.filter(F.lit(1000) * F.col("nf_sc") >= F.lit(q_permille) * F.col("nf_total"))
        .agg(F.min("t").alias("t_hi"))
    )
    prev = (
        j.join(F.broadcast(hit), F.col("t") == F.col("t_hi") - 1)
        .select(F.col("nf_sc").alias("nf_lo"))
    )
    at = j.join(F.broadcast(hit), F.col("t") == F.col("t_hi")).select(
        F.col("nf_sc").alias("nf_hi"), "t_hi", "nf_total"
    )
    # t_hi == 0 (the ball at t=0 already crosses q): diameter 0, no prev
    return (
        at.join(F.broadcast(prev), how="left")
        .select(
            F.greatest(F.col("t_hi") - 1, F.lit(0)).cast("long").alias("t_lo"),
            F.col("t_hi").cast("long").alias("t_hi"),
            F.round(
                F.when(F.col("t_hi") == 0, F.lit(0.0)).otherwise(
                    (F.col("t_hi") - 1)
                    + (
                        F.col("nf_total") * (F.lit(q_permille) / 1000.0)
                        - F.col("nf_lo")
                    )
                    / (F.col("nf_hi") - F.col("nf_lo"))
                ),
                6,
            ).alias("eff_diameter"),
        )
    )


def bowtie_classes(
    edges: DataFrame,
    max_hops: int = 10,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Bow-tie decomposition of a directed graph (Broder et al. WWW'00
    "Graph structure in the web"): classify every node relative to the
    core component around a deterministic pivot — ``SCC`` (reaches the
    pivot AND is reached by it), ``IN`` (reaches it only), ``OUT``
    (reached only), ``OTHER`` (tendrils/disconnected). The original
    web-graph census ran exactly this from BFS pivots; a crawler reads
    it as "which hosts can seed the core (IN), which are sinks (OUT),
    and which the current seed set can never reach (OTHER)".

    Pivot = highest-degree node (ties: smallest id) — the FW-BW SCC
    pivot rule, deterministic so the SQL oracle reproduces it. Forward
    and backward reach are two level-synchronous multi-source BFS runs
    (``bfs_distances`` with directed edges; the backward run just swaps
    endpoint roles), each O(E) total across hops, one equi-join shuffle
    per hop. ``max_hops`` must cover the graph's directed diameter for
    the census to be exact — at web scale run with hops ~ effective
    diameter + slack (the neighborhood function from HyperBall tells
    you where reach saturates).

    Returns (node, cls). Classification is two broadcast-sized hash
    left-joins over the node dimension — no shuffle beyond the BFS.
    Node ids must be integers below 2^62 (the direction tag is packed
    into the low bit so one BFS loop serves both directions).
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    pivot = deg.orderBy(F.col("deg").desc(), F.col("node")).limit(1).select(
        "node"
    )
    # ONE level-synchronous loop covers both directions: pack the
    # direction into the node id (node*2 for forward, node*2+1 for the
    # reversed graph) and seed both pivots — half the per-hop driver
    # jobs of two sequential BFS runs, identical reach sets.
    packed = e.select(
        (F.col("src") * 2).alias("src"), (F.col("dst") * 2).alias("dst")
    ).unionByName(
        e.select(
            (F.col("dst") * 2 + 1).alias("src"),
            (F.col("src") * 2 + 1).alias("dst"),
        )
    )
    seeds = pivot.select(F.explode(F.array(F.col("node") * 2, F.col("node") * 2 + 1)).alias("node"))
    reach = bfs_distances(packed, seeds, max_hops=max_hops, directed=True)
    fwd = reach.filter(F.col("node") % 2 == 0).select(
        F.expr("node div 2").alias("node"), F.lit(1).alias("f")
    )
    bwd = reach.filter(F.col("node") % 2 == 1).select(
        F.expr("(node - 1) div 2").alias("node"), F.lit(1).alias("b")
    )
    return (
        nodes.join(fwd, "node", "left")
        .join(bwd, "node", "left")
        .select(
            "node",
            F.when(F.col("f").isNotNull() & F.col("b").isNotNull(), "SCC")
            .when(F.col("b").isNotNull(), "IN")
            .when(F.col("f").isNotNull(), "OUT")
            .otherwise("OTHER")
            .alias("cls"),
        )
    )


def adjacency_gap_bits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """WebGraph-style adjacency compression estimate (Boldi & Vigna
    WWW'04 "The WebGraph framework"): per source node, the γ-coded size
    of its GAP-ENCODED successor list vs the flat ceil(log2 n) encoding
    — the storage planning number for a link graph at 10^10 edges
    (BV coding is why a web graph fits in RAM at ~2-3 bits/link).

    Encoding mirrored exactly from the paper's basic scheme (no copy
    lists/intervals — the gap+γ core): successors sorted ascending;
    first gap is the signed difference to the source, folded to a
    natural by v(d) = 2d if d >= 0 else 2|d|-1; subsequent gaps are
    successive differences minus 1 (>= 0). Each natural x is γ-coded
    in 2*floor(log2(x+1)) + 1 bits. floor(log2) is computed as
    length(bin(x+1)) - 1 — pure integer/string ops, so the SQL oracle
    is bit-for-bit identical (no float log hazards).

    One window (lag over dst within src) + one aggregate; at scale this
    is a single shuffle on src — the same partitioning an adjacency
    build already pays.
    """
    w = Window.partitionBy("s").orderBy("d")
    g = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .filter(F.col("s") != F.col("d"))
        .distinct()
        .withColumn("prev", F.lag("d").over(w))
        .withColumn(
            "nat",
            F.when(
                F.col("prev").isNull(),
                # signed first gap d - s folded to a natural
                F.when(
                    F.col("d") >= F.col("s"),
                    2 * (F.col("d") - F.col("s")),
                ).otherwise(2 * (F.col("s") - F.col("d")) - 1),
            ).otherwise(F.col("d") - F.col("prev") - 1),
        )
        .withColumn(
            "gamma_bits",
            2 * (F.length(F.expr("bin(nat + 1)")) - 1) + 1,
        )
    )
    n_nodes = (
        edges.select(F.col(src).alias("n"))
        .union(edges.select(F.col(dst).alias("n")))
        .distinct()
        .agg(F.count("*").alias("n_nodes"))
        .select((F.length(F.expr("bin(n_nodes - 1)"))).alias("flat_w"))
    )
    return (
        g.groupBy("s")
        .agg(
            F.count("*").cast("long").alias("deg"),
            F.sum("gamma_bits").cast("long").alias("bits_gamma"),
        )
        .crossJoin(F.broadcast(n_nodes))
        .select(
            F.col("s").alias("host_id"),
            "deg",
            "bits_gamma",
            (F.col("deg") * F.col("flat_w")).cast("long").alias("bits_flat"),
        )
    )


def scc_decompose(
    edges: DataFrame,
    max_rounds: int = 8,
    max_color_iters: int = 32,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Exact strongly-connected-component decomposition of a directed
    graph — the full census behind bow-tie analysis (bowtie_classes
    resolves only the pivot's SCC; this labels EVERY node), link-farm
    collapse (a spam ring is one SCC crawled as one unit), and
    redirect-cycle detection at component granularity.

    Algorithm: Trim + forward-coloring + per-color backward sweep (the
    FW-BW-Trim family every distributed SCC system uses — Orzan's
    coloring, Hong et al. / Slota et al.'s trimming; Tarjan's stack is
    inherently sequential and cannot shuffle). Each outer round:

      1. TRIM to fixpoint: a node with no in-edges or no out-edges
         inside the active set can't sit on a cycle — it is a singleton
         SCC, removed immediately. This shreds the DAG-like mantle/
         tendrils of a web graph (most of it) for two anti-joins per
         pass, no reachability computation at all.
      2. COLOR to fixpoint: c(v) = min(v, min over in-neighbors'
         colors) iterated until stable — c(v) = the smallest active
         node that reaches v. One edge join + (dst, min) agg per pass;
         fixpoint detected by a changed-row count on the node
         dimension.
      3. BACKWARD sweep: pivots are nodes with c(v) = v; the pivot's
         SCC is exactly the nodes with its color that reach it, found
         by a multi-source backward BFS that only walks edges whose
         BOTH endpoints carry the pivot's color (sound + complete:
         every node on a return path provably shares the color). All
         pivots sweep simultaneously — one BFS, color carried as a
         second frontier column.

    Every emitted SCC is final (scc_id = the component's minimum node
    id); survivors re-enter the next round with the settled components
    removed, which splits their colors further. Deterministic
    throughout (min-label, no randomness); lineage localCheckpoint-
    truncated per pass like the other iterative operators here.

    Raises RuntimeError if the budget rounds leave active nodes — the
    honest contract at sandbox scale; production tuning is raising the
    budgets (rounds needed ≈ SCC-DAG depth, small for web graphs).

    Returns (node, scc_id)."""
    e_all = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .distinct()
        .persist()
    )
    nodes = (
        e_all.select(F.col("a").alias("node"))
        .union(e_all.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    assigned = None  # (node, scc_id)
    active = nodes
    for _ in range(max_rounds):
        if not active.take(1):
            break
        # ---- 1. trim to fixpoint --------------------------------------
        while True:
            e = (
                e_all.join(active, e_all["a"] == active["node"], "left_semi")
                .join(active, e_all["b"] == active["node"], "left_semi")
                .filter(F.col("a") != F.col("b"))
                .localCheckpoint()
            )
            keep = (
                active.join(e, active["node"] == e["b"], "left_semi")
                .join(e, active["node"] == e["a"], "left_semi")
                .localCheckpoint()
            )
            trimmed = active.join(keep, "node", "left_anti").select(
                "node", F.col("node").alias("scc_id")
            )
            if not trimmed.take(1):
                break
            t = trimmed.localCheckpoint()
            assigned = t if assigned is None else assigned.unionByName(t)
            active = keep
        if not active.take(1):
            break
        # ---- 2. forward min-label coloring to fixpoint ------------------
        colors = active.select("node", F.col("node").alias("color"))
        for _ in range(max_color_iters):
            incoming = (
                e.join(colors, e["a"] == colors["node"])
                .select(F.col("b").alias("node"), F.col("color"))
                .groupBy("node")
                .agg(F.min("color").alias("in_color"))
            )
            nxt = (
                colors.join(incoming, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("color"), F.coalesce("in_color", F.col("color"))
                    ).alias("color"),
                )
                .localCheckpoint()
            )
            n_changed = (
                nxt.join(
                    colors.withColumnRenamed("color", "old"), "node"
                )
                .filter(F.col("color") != F.col("old"))
                .count()
            )
            colors = nxt
            if n_changed == 0:
                break
        else:
            raise RuntimeError(
                "coloring did not converge within max_color_iters"
            )
        # ---- 3. simultaneous per-color backward sweep from pivots -------
        # edge (a -> b) is walkable backward from b to a iff both ends
        # share the sweep color; attach both colors once
        ec = (
            e.join(
                colors.select(
                    F.col("node").alias("a"), F.col("color").alias("ca")
                ),
                "a",
            )
            .join(
                colors.select(
                    F.col("node").alias("b"), F.col("color").alias("cb")
                ),
                "b",
            )
            .filter(F.col("ca") == F.col("cb"))
            .select("a", "b", F.col("ca").alias("color"))
            .localCheckpoint()
        )
        members = colors.filter(F.col("node") == F.col("color")).select(
            "node", "color"
        ).localCheckpoint()
        frontier = members
        while frontier.take(1):
            nxt = (
                frontier.join(
                    ec,
                    (frontier["node"] == ec["b"])
                    & (frontier["color"] == ec["color"]),
                )
                .select(F.col("a").alias("node"), ec["color"].alias("color"))
                .distinct()
                .join(members, "node", "left_anti")
                .localCheckpoint()
            )
            if not nxt.take(1):
                break
            members = members.unionByName(nxt).localCheckpoint()
            frontier = nxt
        sccs = members.select("node", F.col("color").alias("scc_id"))
        assigned = (
            sccs if assigned is None else assigned.unionByName(sccs)
        ).localCheckpoint()
        active = active.join(members.select("node"), "node", "left_anti")
    else:
        if active.take(1):
            raise RuntimeError("scc_decompose: round budget exhausted")
    e_all.unpersist()
    if assigned is None:
        return nodes.select("node", F.col("node").alias("scc_id")).limit(0)
    return assigned


# ------------------------------------------ large-star / small-star CC


def cc_star(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 16,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14 — public): the scale path ``dedup_clusters``'s
    docstring promises. Min-label propagation moves a component's
    minimum ONE hop per round, so rounds = graph diameter — fine for
    shallow near-dup clusters, ruinous for chained duplicates (doc A
    near-dups B near-dups C ... — mirror chains and boilerplate
    families produce exactly this). The star operations contract paths,
    flattening the pointer forest in O(log d) rounds: a 64-hop chain
    converges in ~6 alternations instead of 64 propagation rounds
    (tests/test_graph.py pins both the label equality and the round
    budget).

    large-star(u): every neighbor v > u re-attaches to
    m = min(Γ(u) ∪ {u}).  small-star(u): every neighbor v <= u and u
    itself re-attach to m = min({v ∈ Γ(u): v <= u} ∪ {u}). Each is one
    groupBy(u) + one join on u (co-partitioned with the groupBy — AQE
    reuses the exchange) + distinct. Labels only decrease, so the
    fixpoint check is a narrow count + hash-sum signature aggregate
    (decimal(38) accumulator: no overflow at 10^10 edges), never a join
    against the previous state. ``localCheckpoint`` per round keeps the
    plan flat.

    At convergence the edge set is a min-rooted star forest: every edge
    reads (node, component-min). Output matches ``dedup_clusters``:
    (doc_id, cluster_id) for every doc appearing in ``pairs``; roots
    label themselves. ``stats['rounds']`` reports alternations used.
    """
    # one materialization of the (possibly expensive) pair generation:
    # nodes AND the working edge set both read this checkpoint — deriving
    # nodes from `pairs` directly would recompute the whole upstream
    # plan (e.g. a banded Hamming join) a second time at the final join
    pe = pairs.select(
        F.col(a_col).alias("u"), F.col(b_col).alias("v")
    ).localCheckpoint()
    nodes = (
        pe.select(F.col("u").alias("id"))
        .unionByName(pe.select(F.col("v").alias("id")))
        .distinct()
    )
    e = pe.filter(F.col("u") != F.col("v")).distinct().localCheckpoint()

    def _sig(df: DataFrame):
        r = df.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("s"),
        ).first()
        return (r["n"], r["s"])

    def _swap(df: DataFrame) -> DataFrame:
        return df.select(F.col("v").alias("u"), F.col("u").alias("v"))

    def _star(df: DataFrame, large: bool) -> DataFrame:
        nbr = df.unionByName(_swap(df))
        sub = nbr if large else nbr.filter(F.col("v") <= F.col("u"))
        mins = (
            sub.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least(F.col("mv"), F.col("u")).alias("m"))
        )
        if large:
            out = (
                nbr.join(mins, "u")
                .filter(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
            )
        else:
            out = (
                sub.join(mins, "u")
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .unionByName(mins.select("u", F.col("m").alias("v")))
            )
        return out.filter(F.col("u") != F.col("v")).distinct()

    sig = _sig(e)
    rounds = 0
    for _ in range(max_iter):
        e = _star(_star(e, large=True), large=False).localCheckpoint()
        rounds += 1
        new_sig = _sig(e)
        if new_sig == sig:
            break
        sig = new_sig
    if stats is not None:
        stats["rounds"] = rounds
    parent = e.groupBy("u").agg(F.min("v").alias("label"))
    return (
        nodes.join(parent, nodes["id"] == parent["u"], "left")
        .select(
            F.col("id").alias("doc_id"),
            F.coalesce(F.col("label"), F.col("id")).alias("cluster_id"),
        )
    )


def seed_attribution(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 8,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    directed: bool = True,
) -> DataFrame:
    """Per-node seed LINEAGE: which seed each reachable node descends
    from, and at what hop — the attribution half of `bfs_distances`
    ("how far" -> "from which seed"). The crawl-audit question this
    answers is the north rule's per-URL lineage at graph granularity:
    blame a spam cluster on the seed that admitted it, or bill
    discovered hosts to the campaign that seeded them.

    Same level-synchronous O(E) dataflow as bfs_distances, but the
    frontier CARRIES the seed label; a node reached by two seeds in
    the same wave resolves deterministically to the SMALLEST seed
    label (min over candidates — first-wins under (hop, seed) order,
    matching the sequential oracle's tie rule). Returns (node, seed,
    dist); seeds attribute to themselves at dist 0.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if not directed:
        e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    e = e.filter(F.col("a") != F.col("b")).distinct().persist()
    attr = (
        seeds.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("seed", F.col("node"))
        .withColumn("dist", F.lit(0))
        .localCheckpoint()
    )
    frontier = attr.select("node", "seed")
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["a"])
            .groupBy(F.col("b").alias("node"))
            .agg(F.min("seed").alias("seed"))
            .join(attr.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(hop))
            .localCheckpoint()
        )
        if not nxt.take(1):
            break
        attr = attr.unionByName(nxt).localCheckpoint()
        frontier = nxt.select("node", "seed")
    e.unpersist()
    return attr


def wl_colors(
    edges: DataFrame,
    n_iter: int = 3,
) -> DataFrame:
    """1-dimensional Weisfeiler-Lehman color refinement (Weisfeiler &
    Lehman 1968; the WL graph-kernel base, Shervashidze et al. JMLR'11)
    over a DIRECTED graph: every node's color is iteratively rehashed
    with the sorted multisets of its in- and out-neighbor colors, so
    after k rounds two nodes share a color iff their k-hop rooted
    neighborhood STRUCTURE is indistinguishable. The crawl read: hosts
    in a machine-generated link farm are structurally interchangeable
    and collapse into one WL class, while organic hosts spread across
    many classes — a purely topological farm signal that needs no
    content, complementing spam_mass (rank-based) and
    host_clustering_coeff (triangle-based).

    Spark shape per round: two edge-vs-color hash joins (in-messages
    and out-messages), two groupBy collect_list + sort_array
    aggregations (sort_array makes the multiset canonical — safe
    against collect_list's arbitrary order), one left join back onto
    the node spine, md5 rehash. All string/integer arithmetic — no
    floats anywhere, so the unrolled-CTE oracle is bit-exact. At web
    scale the multiset strings are md5-compressed every round, so
    message width stays bounded regardless of degree; a degree-capped
    variant (truncate the sorted list) is the swap if single nodes
    reach 10^8 neighbors.

    Returns (node, wl_color, class_size) after n_iter rounds.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    colors = nodes.withColumn("c", F.lit("0"))
    for _ in range(n_iter):
        cin = (
            edges.join(
                colors.select(F.col("node").alias("src"), F.col("c").alias("cu")),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.concat_ws(",", F.sort_array(F.collect_list("cu"))).alias(
                    "in_ms"
                )
            )
        )
        cout = (
            edges.join(
                colors.select(F.col("node").alias("dst"), F.col("c").alias("cv")),
                "dst",
            )
            .groupBy(F.col("src").alias("node"))
            .agg(
                F.concat_ws(",", F.sort_array(F.collect_list("cv"))).alias(
                    "out_ms"
                )
            )
        )
        colors = (
            colors.join(cin, "node", "left")
            .join(cout, "node", "left")
            .select(
                "node",
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("c"),
                        F.coalesce(F.col("in_ms"), F.lit("")),
                        F.coalesce(F.col("out_ms"), F.lit("")),
                    )
                ).alias("c"),
            )
            .localCheckpoint(eager=True)
        )
    sizes = colors.groupBy("c").agg(F.count("*").alias("class_size"))
    return colors.join(sizes, "c").select(
        "node", F.col("c").alias("wl_color"), "class_size"
    )


def betweenness_bounded(
    edges: DataFrame,
    max_depth: int = 4,
    sources: DataFrame | None = None,
) -> DataFrame:
    """Bounded-distance betweenness centrality (Brandes J.Math.Soc'01
    accumulation; distance bound per Brandes & Pich '07, whose source
    SAMPLING is the 10^7-host scale dial): score each node by how much
    shortest-path traffic (within ``max_depth`` hops) flows THROUGH it
    — the bridge-host signal: a host with modest degree but high
    betweenness is the cut vertex between crawl regions, exactly what
    frontier prioritization wants to fetch early and what link spam
    cannot fake cheaply (farms raise degree, not brokerage).

    Two level-synchronous phases, both plain DataFrame ops:
      forward  — multi-source tagged BFS ((source, node) keyed rows, so
                 ALL sources advance in ONE dataflow per hop): level d
                 holds sigma = #shortest s->v paths, built by summing
                 predecessor sigmas; anti-join against visited keeps
                 each (s, v) at its FIRST (= shortest) level.
      backward — Brandes' dependency accumulation delta(v) =
                 sum over successors w one level deeper of
                 sigma_v/sigma_w * (1 + delta_w), walked from the
                 deepest level up; per-level terms are pinned to the
                 1e-9 grid and decimal-summed (order-independent,
                 engine-exact).
    Betweenness(v) = sum over sources of delta, excluding v's own
    source rows. Rounds = 2 * max_depth joins total, each hash-keyed on
    (source, node); levels are localCheckpoint-bounded.

    ``sources``: optional (source) DataFrame — default every node (the
    exact variant; sample k sources for the estimator at scale).
    Returns (node, betweenness) rounded at 1e-6.
    """
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    srcs = (sources or nodes.select(F.col("node").alias("source"))).select(
        "source"
    )
    # forward: levels[d] = (source, node, sigma)
    cur = srcs.select(
        "source", F.col("source").alias("node"), F.lit(1).cast("long").alias("sigma")
    ).localCheckpoint(eager=True)
    visited = cur.select("source", "node").localCheckpoint(eager=True)
    levels = [cur]
    for _d in range(1, max_depth + 1):
        nxt = (
            cur.join(e, cur["node"] == e["src"])
            .groupBy("source", F.col("dst").alias("node"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(visited, ["source", "node"], "left_anti")
            .localCheckpoint(eager=True)
        )
        levels.append(nxt)
        visited = visited.unionByName(
            nxt.select("source", "node")
        ).localCheckpoint(eager=True)
        cur = nxt
    # backward: delta at the deepest level is 0
    pin9 = lambda c: F.floor(c * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)  # noqa: E731
    delta = levels[max_depth].select(
        "source", "node", "sigma", F.lit(0.0).alias("delta")
    )
    acc = None
    for d in range(max_depth - 1, -1, -1):
        succ = delta.select(
            "source",
            F.col("node").alias("w"),
            F.col("sigma").alias("sigma_w"),
            F.col("delta").alias("delta_w"),
        )
        contrib = (
            levels[d]
            .join(e, levels[d]["node"] == e["src"])
            .join(
                succ,
                (F.col("dst") == F.col("w"))
                & (levels[d]["source"] == succ["source"]),
            )
            .select(
                levels[d]["source"].alias("source"),
                levels[d]["node"].alias("node"),
                pin9(
                    F.col("sigma").cast("double")
                    / F.col("sigma_w").cast("double")
                    * (F.lit(1.0) + F.col("delta_w"))
                )
                .cast("decimal(29,9)")
                .alias("term"),
            )
            .groupBy("source", "node")
            .agg(F.sum("term").cast("double").alias("dsum"))
        )
        delta = (
            levels[d]
            .join(contrib, ["source", "node"], "left")
            .select(
                "source",
                "node",
                "sigma",
                F.coalesce(F.col("dsum"), F.lit(0.0)).alias("delta"),
            )
            .localCheckpoint(eager=True)
        )
        part = delta.filter(F.col("source") != F.col("node")).select(
            "source", "node", "delta"
        )
        acc = part if acc is None else acc.unionByName(part)
    bc = (
        acc.select("node", F.col("delta").cast("decimal(29,9)").alias("delta"))
        .groupBy("node")
        .agg(F.sum("delta").cast("double").alias("b"))
    )
    return nodes.join(bc, "node", "left").select(
        "node",
        (
            F.floor(
                F.coalesce(F.col("b"), F.lit(0.0)) * F.lit(1e6) + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("betweenness"),
    )


def maximal_matching(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_rounds: int = 8,
) -> DataFrame:
    """Deterministic parallel MAXIMAL MATCHING over a conflict graph —
    Luby-style symmetry breaking (Luby SICOMP'86; Israeli-Itai's
    matching form) with md5 priorities instead of per-round coin
    flips, so the run is reproducible and oracle-checkable. The dedup
    application: a near-dup pair list says "merge these", but merges
    touching the same document cannot run in one pass; a maximal
    matching is the largest-per-round set of pairs where EVERY document
    participates at most once — the safe concurrent merge batch, with
    the classic guarantee that the greedy/maximal answer is >= 1/2 of
    the maximum matching.

    Per round (all DataFrame ops, one groupBy + one join family):
    every alive pair carries priority = md5(a||'-'||b); per ENDPOINT
    the minimum alive priority is computed (one two-role explode +
    groupBy); a pair is SELECTED iff it holds the minimum at BOTH its
    endpoints (local minima are independent by construction — no two
    selected pairs share a document); selected pairs retire their
    endpoints, and alive pairs touching a retired endpoint drop out.
    With pseudo-random md5 priorities the alive set shrinks
    geometrically (expected O(log n) rounds); ``max_rounds`` bounds the
    unrolled oracle and a RuntimeError reports honest non-drain rather
    than silently returning a non-maximal matching.

    Returns (a_col, b_col, round) for the selected pairs.
    """
    alive = (
        pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .withColumn(
            "prio",
            F.md5(
                F.concat_ws("-", F.col("a").cast("string"), F.col("b").cast("string"))
            ),
        )
        .localCheckpoint(eager=True)
    )
    picked = None
    for rnd in range(1, max_rounds + 1):
        if alive.isEmpty():
            break
        ends = alive.select(F.col("a").alias("v"), "prio").unionByName(
            alive.select(F.col("b").alias("v"), "prio")
        )
        vmin = ends.groupBy("v").agg(F.min("prio").alias("pmin"))
        sel = (
            alive.join(
                vmin.select(F.col("v").alias("a"), F.col("pmin").alias("pa")),
                "a",
            )
            .join(
                vmin.select(F.col("v").alias("b"), F.col("pmin").alias("pb")),
                "b",
            )
            .filter((F.col("prio") == F.col("pa")) & (F.col("prio") == F.col("pb")))
            .select("a", "b", F.lit(rnd).alias("round"))
            .localCheckpoint(eager=True)
        )
        picked = sel if picked is None else picked.unionByName(sel)
        matched = (
            sel.select(F.col("a").alias("v"))
            .unionByName(sel.select(F.col("b").alias("v")))
            .distinct()
        )
        alive = (
            alive.join(matched.select(F.col("v").alias("a")), "a", "left_anti")
            .join(matched.select(F.col("v").alias("b")), "b", "left_anti")
            .localCheckpoint(eager=True)
        )
    if not alive.isEmpty():
        raise RuntimeError(
            f"maximal_matching did not drain in {max_rounds} rounds"
        )
    spark = pairs.sparkSession
    if picked is None:
        return spark.createDataFrame(
            [], f"{a_col} long, {b_col} long, round int"
        )
    return picked.select(
        F.col("a").alias(a_col), F.col("b").alias(b_col), "round"
    )


def densest_subgraph_peel(
    edges: DataFrame,
    eps_num: int = 5,
    eps_den: int = 2,
    max_rounds: int = 8,
) -> DataFrame:
    """Greedy densest-subgraph peeling (Charikar APPROX'00; the
    parallel batched form of Bahmani et al. VLDB'12): repeatedly
    remove every node whose degree is below (eps_num/eps_den) x the
    current average degree — with eps_num/eps_den = 2(1+eps) = 5/2 the
    surviving densest prefix is a 2(1+eps)-approximation of the true
    maximum-density subgraph, in O(log n) rounds. The crawl read: the
    densest subgraph of the host graph IS the tightest link spam core
    (organic webs are sparse everywhere; farms are built dense), and
    peeling gives the full density profile, not just a threshold.

    Undirected density |E|/|V|; edges are symmetrized and deduped
    here. The removal test is INTEGER-exact (deg * |V| * eps_den <
    eps_num * |E| — no float ratio), so every round is engine-exact.
    Per round: one degree aggregation + one broadcast of the two
    scalars + one semi-join filter of the edge set; rounds are
    localCheckpoint-bounded.

    Returns the per-round profile (round, n_nodes, n_edges, density6,
    is_best): round 0 = the full graph, density6 pinned at 1e-6,
    is_best marks the max-density round (ties -> earliest). The
    judge-the-threshold table; the best round's node set is the spam
    core."""
    und = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .filter(F.col("src") < F.col("dst"))
        .localCheckpoint(eager=True)
    )
    rows = []
    cur = und
    for rnd in range(0, max_rounds + 1):
        deg = (
            cur.select(F.col("src").alias("v"))
            .unionByName(cur.select(F.col("dst").alias("v")))
            .groupBy("v")
            .agg(F.count("*").alias("deg"))
            .localCheckpoint(eager=True)
        )
        stats = deg.agg(
            F.count("*").alias("nv"), F.sum("deg").alias("deg2")
        ).first()
        nv = int(stats["nv"] or 0)
        ne = int(stats["deg2"] or 0) // 2
        if nv == 0:
            break
        if rows and (nv, ne) == (rows[-1][1], rows[-1][2]):
            break  # peel fixpoint: nothing below threshold remains
        dens = (ne * 1000000) // nv / 1e6  # floor at 1e-6, integer-exact
        rows.append((rnd, nv, ne, dens))
        # peel: keep nodes with deg * nv * eps_den >= eps_num * ne
        keep = deg.filter(
            F.col("deg") * F.lit(nv) * F.lit(eps_den)
            >= F.lit(eps_num) * F.lit(ne)
        ).select("v")
        nxt = (
            cur.join(keep.select(F.col("v").alias("src")), "src", "left_semi")
            .join(keep.select(F.col("v").alias("dst")), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        cur = nxt
    best = max(range(len(rows)), key=lambda i: (rows[i][3], -i))
    spark = edges.sparkSession
    return spark.createDataFrame(
        [
            (r, nv, ne, d, i == best)
            for i, (r, nv, ne, d) in enumerate(rows)
        ],
        "round int, n_nodes long, n_edges long, density6 double, is_best boolean",
    )


def temporal_bfs(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 4,
) -> DataFrame:
    """Earliest-arrival (foremost-journey) computation over a TEMPORAL
    link graph — edges carry the round they first became traversable
    (``page_links`` records exactly this), and a path is valid only if
    edge times are non-decreasing along it (you cannot follow a link
    before it existed). Static BFS over the flattened edge set
    overstates reachability: a chain whose link times DECREASE is
    walkable in the static graph but impossible in time — this
    operator is the discovery-provenance audit that catches it
    ("could host X really have been reached from the seeds by round
    t, honoring when each link appeared?").

    arrival(seed) = 0; traversing (u, v, t) requires t >= arrival(u)
    and yields arrival t. ``rounds`` synchronous relaxations compute
    the exact minimum over journeys of <= rounds edges (arrivals are
    monotone non-increasing, so each pass is one edge-vs-arrival join
    + one min-agg + one least() merge — the Bellman-Ford shape, NOT
    level-synchronous BFS: a later hop can lower an earlier node's
    arrival time via a different journey). Integer times, min
    aggregations — fully deterministic, oracle unrolls the same
    passes.

    ``edges``: (src, dst, t); ``seeds``: (node). Returns
    (node, arrival) with NULL arrival = not reachable within
    ``rounds`` hops.
    """
    e = edges.select("src", "dst", F.col("t").cast("long").alias("t"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .unionByName(seeds.select(F.col("node")))
        .distinct()
    )
    arr = nodes.join(
        seeds.select("node").withColumn("_s", F.lit(0).cast("long")),
        "node",
        "left",
    ).select("node", F.col("_s").alias("arrival")).localCheckpoint(eager=True)
    for _ in range(int(rounds)):
        reach = (
            e.join(
                arr.filter(F.col("arrival").isNotNull()).select(
                    F.col("node").alias("src"), F.col("arrival").alias("au")
                ),
                "src",
            )
            .filter(F.col("t") >= F.col("au"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("t").alias("cand"))
        )
        arr = (
            arr.join(reach, "node", "left")
            .select(
                "node",
                F.least(
                    F.coalesce(F.col("arrival"), F.col("cand")),
                    F.coalesce(F.col("cand"), F.col("arrival")),
                ).alias("arrival"),
            )
            .localCheckpoint(eager=True)
        )
    return arr


def cc_star_incremental(
    old_labels: DataFrame,
    new_pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 16,
) -> DataFrame:
    """Incremental connected components — absorb a NEW wave of
    near-dup pairs into existing cluster labels without reprocessing
    history (the IVM story for the dedup graph: a daily crawl adds
    O(wave) edges to a 10^10-node pair graph; re-clustering from
    scratch re-shuffles everything ever seen).

    Construction: contract every old cluster to its label (component
    MIN id), rewrite the new wave's endpoints through that mapping
    (old docs -> their label, unseen docs -> themselves), run cc_star
    on the CONTRACTED graph — O(wave + touched clusters) work — and
    compose: every old doc re-labels through its old label's new
    root, new docs label directly. Because cc_star labels components
    by their minimum id and the contracted nodes are exactly the old
    minima plus new ids, the composed labels are IDENTICAL to a full
    recompute over (old pairs ∪ new pairs) — not just isomorphic —
    which the parity test pins.

    Returns (doc_id, cluster_id) covering every old doc and every doc
    in new_pairs.
    """
    reps = old_labels.select(
        F.col("doc_id").alias("_d"), F.col("cluster_id").alias("_r")
    ).localCheckpoint(eager=True)
    np_ = new_pairs.select(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    )
    contracted = (
        np_.join(reps.withColumnRenamed("_d", "a"), "a", "left")
        .withColumn("ca", F.coalesce(F.col("_r"), F.col("a")))
        .drop("_r")
        .join(reps.withColumnRenamed("_d", "b"), "b", "left")
        .withColumn("cb", F.coalesce(F.col("_r"), F.col("b")))
        .select(F.col("ca").alias(a_col), F.col("cb").alias(b_col))
    )
    root_map = cc_star(contracted, a_col, b_col, max_iter=max_iter).select(
        F.col("doc_id").alias("_rep"), F.col("cluster_id").alias("_root")
    )
    # old docs re-label through their old label's new root (old labels
    # untouched by the wave keep themselves: left join -> coalesce)
    old_out = (
        old_labels.join(
            root_map, old_labels["cluster_id"] == root_map["_rep"], "left"
        )
        .select(
            "doc_id",
            F.coalesce(F.col("_root"), F.col("cluster_id")).alias("cluster_id"),
        )
    )
    # new-wave docs not in old_labels label directly via the root map
    new_nodes = (
        np_.select(F.col("a").alias("doc_id"))
        .unionByName(np_.select(F.col("b").alias("doc_id")))
        .distinct()
        .join(old_labels.select("doc_id"), "doc_id", "left_anti")
    )
    new_out = new_nodes.join(
        root_map, new_nodes["doc_id"] == root_map["_rep"], "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("_root"), F.col("doc_id")).alias("cluster_id"),
    )
    return old_out.unionByName(new_out)
