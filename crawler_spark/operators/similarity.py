"""Similarity search over an embedding column (array<float>).

* :func:`cosine_topk` — brute-force exact top-k by cosine against a query
  vector. Native ``zip_with``/``aggregate`` expressions (JVM-side, no
  UDF); the top-k is a single ``orderBy(...).limit(k)`` which Spark
  executes as per-partition TakeOrdered + driver merge — no full sort, no
  single-partition window. This is the correctness baseline.
* :func:`ivf_topk` — the scale path: IVF-style inverted file. A small
  centroid table (broadcast) assigns each vector to its nearest centroid
  once (one pass); queries probe only the ``n_probe`` nearest cells. At
  100 TB the data side is partitioned/clustered by ``cell_id`` so a probe
  touches ~n_probe/n_cells of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    # cast operands to double BEFORE multiplying: float32 products lose
    # ~1e-7 relative precision, enough to flip a round(.., 6) vs an
    # oracle that computes in double throughout
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda s, x: s + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine; deterministic tie-break on id."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = sum(x * x for x in query_vec) ** 0.5
    scored = emb.select(
        F.col(id_col).alias("vec_id"),
        F.round(
            _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn)), 6
        ).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def assign_cells(
    emb: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF build: nearest centroid per vector via broadcast join + min_by.
    centroids: (cell_id int, centroid array<double|float>)."""
    joined = emb.crossJoin(F.broadcast(centroids))
    d = _dot(F.col(vec_col), F.col("centroid"))
    na, nb = _norm(F.col(vec_col)), _norm(F.col("centroid"))
    scored = joined.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        F.col("cell_id"),
        # round(.., 9) pins the argmax against float-summation-order
        # differences so an ANSI-SQL oracle lands on the same cell
        F.round(d / (na * nb), 9).alias("sim"),
    )
    return scored.groupBy("vec_id").agg(
        F.max_by("cell_id", F.struct(F.col("sim"), -F.col("cell_id"))).alias("cell_id"),
        F.any_value("v").alias("v"),
    )


def make_centroids(
    emb: DataFrame, n_cells: int = 8, vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Cheap deterministic centroids: mean vector per hash-assigned group
    (a k-means++ stand-in; one aggregation pass, broadcastable result).

    The group hash is the first md5 hex digit of the id (portable to any
    ANSI-SQL oracle, uniform for n_cells <= 16); means are rounded to 9
    decimals so cross-engine float-summation order can't flip downstream
    nearest-centroid ties."""
    g = emb.withColumn(
        "cell_id",
        F.expr(
            f"pmod(instr('0123456789abcdef', "
            f"substring(md5(cast({id_col} as string)), 1, 1)) - 1, {n_cells})"
        ).cast("int"),
    )
    # element-wise mean via posexplode + groupBy — stays native
    exploded = g.select("cell_id", F.posexplode(F.col(vec_col)).alias("pos", "x"))
    means = exploded.groupBy("cell_id", "pos").agg(
        F.round(F.avg(F.col("x").cast("double")), 9).alias("m")
    )
    return (
        means.groupBy("cell_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("cell_id", F.transform("pm", lambda s: s["m"]).alias("centroid"))
    )


def kmeans_refine(
    emb: DataFrame,
    centroids: DataFrame,
    n_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Lloyd refinement of seeded centroids (spherical k-means: cosine
    assignment, mean update). A FIXED iteration count keeps the plan
    deterministic — no convergence actions — and both steps round to 9
    decimals so an ANSI-SQL oracle reproduces every iteration
    bit-for-bit. Empty cells drop out naturally (GROUP BY emits no row).

    Per iteration: one broadcast crossJoin + max_by argmax, then one
    posexplode mean aggregation — the data side is scanned twice, never
    shuffled on anything wider than (cell_id, pos)."""
    cents = centroids
    for _ in range(n_iter):
        assigned = assign_cells(emb, cents, vec_col, id_col)
        exploded = assigned.select(
            "cell_id", F.posexplode(F.col("v")).alias("pos", "x")
        )
        means = exploded.groupBy("cell_id", "pos").agg(
            F.round(F.avg(F.col("x").cast("double")), 9).alias("m")
        )
        cents = (
            means.groupBy("cell_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell_id", F.transform("pm", lambda s: s["m"]).alias("centroid"))
        )
    return cents


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_iter: int = 0,
) -> DataFrame:
    """Approximate top-k: probe the n_probe cells nearest to the query.
    ``n_iter > 0`` runs that many Lloyd refinement passes over the
    hash-seeded centroids first (better-balanced cells -> better recall
    at the same n_probe)."""
    cents = make_centroids(emb, n_cells, vec_col)
    if n_iter:
        cents = kmeans_refine(emb, cents, n_iter, vec_col, id_col)
    assigned = assign_cells(emb, cents, vec_col, id_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = sum(x * x for x in query_vec) ** 0.5
    probe_cells = [
        r["cell_id"]
        for r in cents.select(
            "cell_id",
            F.round(
                _dot(F.col("centroid"), q) / (_norm(F.col("centroid")) * F.lit(qn)), 9
            ).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc("cell_id"))
        .limit(n_probe)
        .collect()
    ]
    scored = assigned.filter(F.col("cell_id").isin(probe_cells)).select(
        "vec_id",
        F.round(_dot(F.col("v"), q) / (_norm(F.col("v")) * F.lit(qn)), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def kcenter_sample(
    emb: DataFrame,
    k: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed_id: int = 0,
) -> DataFrame:
    """Greedy k-center / farthest-point coreset (Gonzalez, public TCS
    1985; the 2-approximation every diversity-sampling pipeline leans
    on): pick the seed, then k-1 times pick the point FARTHEST from
    everything picked so far. The radius sequence (each pick's distance
    at selection) is the coverage diagnostic — when it plateaus, the
    coreset already spans the embedding space and curation can stop.

    Scale shape: greedy FPS is inherently k-sequential (pick t depends
    on all t-1 prior picks), but each round is O(n·d) narrow work: the
    incremental identity mind_t(x) = least(mind_{t-1}(x), d²(x, c_t))
    means only the NEWEST center is ever compared — one map over the
    persisted (vec_id, v, mind) state + one TakeOrdered(1) argmax per
    round, never a k-way join, never a global sort. Each round's
    driver traffic is ONE row (the next center); the k-row result is a
    scheduler-side artifact like IVF centroids. d² uses the dot-product
    identity (a·a - 2a·b + b·b), round-9, so the unrolled-CTE oracle
    (list_dot_product) reproduces picks and radii exactly. For k in
    the thousands, swap in recursive-bisection FPS; this exact variant
    is for curation-scale k (10²-10³).
    """
    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    seed = e.filter(F.col("vec_id") == seed_id).head()
    if seed is None:
        raise ValueError(f"seed_id {seed_id} not found")
    picks = [(int(seed.vec_id), 0, 0.0)]
    cur = list(seed.v)
    state = e.select("vec_id", "v", _dot("v", "v").alias("vv")).withColumn(
        "mind", F.lit(None).cast("double")
    )
    for t in range(1, k):
        cvec = F.array(*[F.lit(float(x)) for x in cur])
        cc = 0.0
        for x in cur:  # left fold, matching the SQL dot's order
            cc += x * x
        d2 = F.round(
            F.col("vv") - 2.0 * _dot(F.col("v"), cvec) + F.lit(cc), 9
        )
        state = state.withColumn(
            "mind", F.least(F.coalesce(F.col("mind"), d2), d2)
        )
        if t % 3 == 0:
            state = state.localCheckpoint()
        nxt = (
            state.orderBy(F.desc("mind"), F.asc("vec_id"))
            .select("vec_id", "v", "mind")
            .head()
        )
        picks.append((int(nxt.vec_id), t, float(nxt.mind)))
        cur = list(nxt.v)
    spark = emb.sparkSession
    return spark.createDataFrame(
        picks, "vec_id long, pick_order int, radius double"
    )


# -------------------------------------------- persisted incremental IVF index


def ivf_index_init(catalog, emb: DataFrame, n_cells: int = 8, n_iter: int = 2,
                   vec_col: str = "embedding", id_col: str = "vec_id") -> None:
    """Build a PERSISTED IVF index as catalog tables: ``ivf_centroids``
    (k-means-refined, frozen from here on — the standard incremental-IVF
    contract) and ``ivf_cells`` (vec_id, cell_id, v). Committed in one
    snapshot, so searchers never see a half-built index."""
    cents = make_centroids(emb, n_cells, vec_col, id_col)
    if n_iter:
        cents = kmeans_refine(emb, cents, n_iter, vec_col, id_col)
    cents = cents.localCheckpoint()
    catalog.stage_overwrite("ivf_centroids", cents)
    catalog.stage_overwrite(
        "ivf_cells",
        assign_cells(emb, cents, vec_col, id_col).select("vec_id", "cell_id", "v"),
    )
    catalog.commit(meta={"ivf_n_cells": n_cells})


def ivf_add_wave(catalog, emb: DataFrame, vec_col: str = "embedding",
                 id_col: str = "vec_id") -> int:
    """Absorb a new vector wave into the persisted IVF index: anti-join
    the already-indexed ids (idempotent — a replayed wave adds nothing),
    assign survivors to the FROZEN centroids (one broadcast join over
    O(wave) rows, the index base is never rescanned), and append. This
    is how a daily crawl's embeddings join a 10^10-vector ANN index
    without a rebuild; recall drifts only as the data distribution
    leaves the frozen centroids, which `ivf_index_init` re-runs on a
    maintenance cadence. Returns the number of vectors actually added."""
    cents = catalog.read("ivf_centroids")
    existing = catalog.read("ivf_cells").select("vec_id")
    new = emb.join(
        existing.withColumnRenamed("vec_id", id_col), id_col, "left_anti"
    )
    assigned = assign_cells(new, cents, vec_col, id_col).select(
        "vec_id", "cell_id", "v"
    ).persist()
    n = assigned.count()
    if n:
        catalog.stage_append("ivf_cells", assigned)
        catalog.commit()
    assigned.unpersist()
    return n


def ivf_index_search(catalog, query_vec: list[float], k: int = 10,
                     n_probe: int = 2) -> DataFrame:
    """Top-k over the PERSISTED index: rank the (broadcast-sized)
    centroid table against the query, probe the n_probe nearest cells
    — a partition-pruned scan of ivf_cells — and exact-cosine rank the
    survivors. Same argmax pinning as ivf_topk (round-9 sims, id
    tie-break)."""
    cents = catalog.read("ivf_centroids")
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = sum(x * x for x in query_vec) ** 0.5
    probe_cells = [
        r["cell_id"]
        for r in cents.select(
            "cell_id",
            F.round(
                _dot(F.col("centroid"), q) / (_norm(F.col("centroid")) * F.lit(qn)), 9
            ).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc("cell_id"))
        .limit(n_probe)
        .collect()
    ]
    scored = (
        catalog.read("ivf_cells")
        .filter(F.col("cell_id").isin(probe_cells))
        .select(
            "vec_id",
            F.round(
                _dot(F.col("v"), q) / (_norm(F.col("v")) * F.lit(qn)), 6
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


# ------------------------------------------------------ product quantization


def _l2sq(a, b):
    """Squared L2 between two arrays, summed in index order via one
    sequential fold — bit-identical on any engine that folds left-to-
    right (same guarantee the cosine path relies on)."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda s, x: s + x,
    )


def pq_codebook(
    emb: DataFrame,
    m_subs: int = 4,
    n_codes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product-quantization codebook: the vector is split into `m_subs`
    contiguous subspaces; each gets `n_codes` codewords = hash-group mean
    subvectors (the same deterministic k-means-0 seeding as IVF's
    make_centroids, per subspace). Output (m, code_id, codeword).

    The codebook is m_subs * n_codes rows regardless of corpus size —
    always broadcastable. At 100 TB the build is ONE pass: posexplode to
    (group, pos) partial means, no iteration, no driver loop."""
    sub = emb.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {m_subs - 1}), "
                f"m -> slice({vec_col}, m * (size({vec_col}) div {m_subs}) + 1, "
                f"size({vec_col}) div {m_subs}))"
            )
        ).alias("m", "subv"),
    )
    g = sub.withColumn(
        "code_id",
        F.expr(
            f"pmod(instr('0123456789abcdef', substring(md5(concat("
            f"cast(vec_id as string), ':', cast(m as string))), 1, 1)) - 1, {n_codes})"
        ).cast("int"),
    )
    means = g.select("m", "code_id", F.posexplode("subv").alias("pos", "x")).groupBy(
        "m", "code_id", "pos"
    ).agg(F.round(F.avg(F.col("x").cast("double")), 9).alias("c"))
    return (
        means.groupBy("m", "code_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select("m", "code_id", F.transform("pc", lambda s: s["c"]).alias("codeword"))
    )


def pq_encode(
    emb: DataFrame,
    codebook: DataFrame,
    m_subs: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode every vector as (vec_id, m, code): nearest codeword per
    subspace by squared L2 (floor(d2 * 1e9) pins the argmin in integer
    space, so no float-tie can diverge between engines). One broadcast
    join against the tiny codebook; the 100 TB side never shuffles."""
    sub = emb.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {m_subs - 1}), "
                f"m -> slice({vec_col}, m * (size({vec_col}) div {m_subs}) + 1, "
                f"size({vec_col}) div {m_subs}))"
            )
        ).alias("m", "subv"),
    )
    scored = sub.join(F.broadcast(codebook), "m").select(
        "vec_id",
        "m",
        "code_id",
        F.floor(_l2sq(F.col("subv"), F.col("codeword")) * 1e9).alias("d2_e9"),
    )
    return scored.groupBy("vec_id", "m").agg(
        F.min_by("code_id", F.struct(F.col("d2_e9"), F.col("code_id"))).alias("code")
    )


def pq_adc_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    m_subs: int = 4,
    n_codes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k: the query is NOT quantized; its
    distance to every codeword is a tiny (m_subs x n_codes) table, and a
    vector's approximate distance is the sum of its m_subs table entries
    (integer-summed, order-independent). The scan side touches only the
    code columns — at scale that is m_subs bytes per vector instead of
    the full float array, the whole point of PQ."""
    codebook = pq_codebook(emb, m_subs, n_codes, vec_col, id_col)
    codes = pq_encode(emb, codebook, m_subs, vec_col, id_col)
    d = len(query_vec) // m_subs
    qsub = [
        F.array(*[F.lit(float(x)) for x in query_vec[m * d : (m + 1) * d]])
        for m in range(m_subs)
    ]
    qtab = codebook.select(
        "m",
        "code_id",
        F.floor(
            sum(
                (
                    F.when(F.col("m") == m, _l2sq(qsub[m], F.col("codeword"))).otherwise(
                        F.lit(0.0)
                    )
                    for m in range(m_subs)
                ),
                F.lit(0.0),
            )
            * 1e9
        ).alias("qd_e9"),
    )
    adc = (
        codes.join(
            F.broadcast(qtab),
            (codes.m == qtab.m) & (codes.code == qtab.code_id),
        )
        .groupBy("vec_id")
        .agg(F.sum("qd_e9").alias("adc_e9"))
    )
    return adc.orderBy(F.asc("adc_e9"), F.asc("vec_id")).limit(k)


def ivf_topk_batch(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Multi-query IVF top-k, fully distributed — the serving shape for
    a batch of queries (``ivf_topk`` takes ONE driver-side vector; a
    training-data pipeline scores millions of queries per wave).

    ``queries``: (query_id, qv array<double>). Plan: one centroid build
    over the data (broadcastable), one broadcast crossJoin ranking the
    ``n_probe`` nearest cells PER QUERY (window over n_cells rows per
    query, never the data), then a hash join of the probe list against
    the cell-assigned data — candidate volume is
    ~(n_probe / n_cells) x |data| x |queries| / |data per cell| — and a
    per-query top-k window over candidates only. The data side shuffles
    once on cell_id regardless of query count; queries are the small
    side everywhere. Same round-9/round-6 pinning as ivf_topk so the
    ANSI oracle lands on identical cells and ranks."""
    from pyspark.sql.window import Window

    cents = make_centroids(emb, n_cells, vec_col)
    assigned = assign_cells(emb, cents, vec_col, id_col)
    qc = queries.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "qv",
        "cell_id",
        F.round(
            _dot(F.col("qv"), F.col("centroid"))
            / (_norm(F.col("qv")) * _norm(F.col("centroid"))),
            9,
        ).alias("sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("cell_id")
    )
    probes = (
        qc.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", "cell_id")
    )
    cand = probes.join(assigned, "cell_id").select(
        "query_id",
        "vec_id",
        F.round(
            _dot(F.col("v"), F.col("qv"))
            / (_norm(F.col("v")) * _norm(F.col("qv"))),
            6,
        ).alias("cosine"),
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        cand.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "cosine", F.col("rn").alias("rank"))
    )


def kmeans_parallel_init(
    emb: DataFrame,
    k: int = 4,
    oversample: int = 4,
    rounds: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """k-means|| initialization (Bahmani et al., VLDB'12) — the
    distributed k-means++ the IVF index wants instead of hash-grouped
    means: k-means++'s D²-weighted seeding needs k SEQUENTIAL passes;
    k-means|| gets the same quality guarantee in O(log n) rounds by
    OVERSAMPLING ~`oversample` candidates per round with probability
    min(1, l*d²/phi), then reducing the weighted candidate set to k.

    Deterministic throughout (the repo's md5-uniform discipline): the
    seed is the md5-minimal point; each round's Bernoulli draw uses
    u = (md5(vec_id||'#'||round)[0:4] + 0.5)/65536 and selects iff
    u * phi < l * d² (identical double operands both engines — no
    division); candidate weights are nearest-candidate counts
    (lexicographic (d², cand_id) argmin); the reduction is WEIGHTED
    farthest-point (first = max weight; then argmax of pinned
    w * min-d²-to-picks — the paper's "recluster the weighted
    candidates" step in its deterministic greedy form).

    Scale shape: per round one broadcast join of the tiny candidate set
    against the points + a grouped min + a one-row decimal phi — the
    candidate set never exceeds oversample*rounds+1 rows, and the
    reduction runs on that dimension alone (one driver row per pick,
    kcenter_sample's contract). Returns (cell_id 0..k-1 in pick order,
    cand_id, weight, centroid).
    """
    def pin9(c):
        return F.floor(c * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)

    def d2(a, b):
        return pin9(_dot(a, a) - 2 * _dot(a, b) + _dot(b, b))

    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).localCheckpoint(eager=True)
    seed = (
        e.orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .head()
    )
    spark = emb.sparkSession
    cands = spark.createDataFrame(
        [(int(seed["vec_id"]), list(seed["v"]))],
        "cand_id long, c array<double>",
    )
    l = float(oversample)
    for r in range(1, int(rounds) + 1):
        costs = (
            e.crossJoin(F.broadcast(cands))
            .select("vec_id", d2(F.col("v"), F.col("c")).alias("d2"))
            .groupBy("vec_id")
            .agg(F.min("d2").alias("d2"))
        )
        phi = costs.agg(
            F.sum(F.col("d2").cast("decimal(38,9)")).cast("double").alias("phi")
        )
        u = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("vec_id").cast("string"), F.lit(f"#{r}")
                        )
                    ),
                    1,
                    4,
                ),
                16,
                10,
            )
            .cast("long")
            .cast("double")
            + F.lit(0.5)
        ) / F.lit(65536.0)
        sel = (
            costs.crossJoin(F.broadcast(phi))
            .filter(u * F.col("phi") < F.lit(l) * F.col("d2"))
            .select("vec_id")
            .join(
                cands.select(F.col("cand_id").alias("vec_id")),
                "vec_id",
                "left_anti",
            )
            .join(e, "vec_id")
            .select(F.col("vec_id").alias("cand_id"), F.col("v").alias("c"))
        )
        cands = cands.unionByName(sel).localCheckpoint(eager=True)
    # weights: nearest-candidate counts, (d2, cand_id) lexicographic tie
    asg = (
        e.crossJoin(F.broadcast(cands))
        .select(
            "vec_id",
            F.struct(d2(F.col("v"), F.col("c")).alias("d2"), "cand_id").alias(
                "s"
            ),
        )
        .groupBy("vec_id")
        .agg(F.min("s").alias("s"))
        .select(F.col("s.cand_id").alias("cand_id"))
        .groupBy("cand_id")
        .agg(F.count("*").alias("w"))
    )
    wc = (
        cands.join(asg, "cand_id", "left")
        .select("cand_id", "c", F.coalesce("w", F.lit(0)).alias("w"))
        .localCheckpoint(eager=True)
    )
    # weighted farthest-point reduction to k
    first = wc.orderBy(F.desc("w"), F.asc("cand_id")).head()
    picks = [(0, int(first["cand_id"]), int(first["w"]), list(first["c"]))]
    state = wc.filter(F.col("cand_id") != int(first["cand_id"])).withColumn(
        "mind", F.lit(None).cast("double")
    )
    for t in range(1, int(k)):
        cvec = F.array(*[F.lit(float(x)) for x in picks[-1][3]])
        nd = d2(F.col("c"), cvec)
        state = state.withColumn(
            "mind", F.least(F.coalesce(F.col("mind"), nd), nd)
        )
        nxt = (
            state.withColumn(
                "score", pin9(F.col("w").cast("double") * F.col("mind"))
            )
            .orderBy(F.desc("score"), F.asc("cand_id"))
            .head()
        )
        if nxt is None:
            break
        picks.append((t, int(nxt["cand_id"]), int(nxt["w"]), list(nxt["c"])))
        state = state.filter(F.col("cand_id") != int(nxt["cand_id"]))
    return spark.createDataFrame(
        picks, "cell_id int, cand_id long, weight long, centroid array<double>"
    )
