"""Crawl-round driver: one round = one batch DataFrame DAG = one snapshot.

The §3.1 pipeline (SURVEY.md) as a declarative plan:

  frontier.filter(pending)
    -> robots gate (broadcast dim join)              [T5]
    -> politeness select (salted window rank)        [T1/W3]
    -> mapInPandas fetch/parse (Arrow batches)       [S1/S5]
    -> split: results / links / failures             [F1-F8, T4]
    -> links: canonicalize -> first-discovery dedup -> bloom+exact
       anti-join vs URL-seen -> new pending rows     [J1/C1-C13]
    -> per-partition metrics                         [A6]
    -> atomic snapshot commit (resume point)         [T2/T3]

Scale notes: the frontier is MERGE-ON-READ (the Iceberg v2 model): a
``frontier`` base plus an append-only ``frontier_updates`` delta of
status changes and new discoveries. A round writes O(round) delta rows —
never a full frontier rewrite; reads resolve latest-row-per-key; a
compaction folds deltas into the base only when they exceed a fraction
of it (amortized O(frontier) every ~1/frac rounds of updates). The one
shuffle join per round is the seen anti-join, pre-filtered by the
persisted bucketed bloom so only "maybe seen" rows shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawler_spark.functions.canon import with_url_cols
from crawler_spark.operators.fetch import run_fetch
from crawler_spark.operators.politeness import politeness_select, robots_gate
from crawler_spark.operators.cuckoo import (
    CUCKOO_CFG,
    BucketedCuckoo,
    cuckoo_delta_rows,
    merge_cuckoo_rows,
)
from crawler_spark.operators.seen import (
    BucketedBloom,
    anti_join_seen,
    anti_join_seen_pruned,
    bloom_delta_rows,
    merge_bloom_rows,
)
from crawler_spark.operators.sequence import assign_dense_seq
from crawler_spark.sources.catalog import SnapshotCatalog
from crawler_spark.sources.synth import SynthWeb

# sandbox bloom sizing: 4 slices x 2^21 bits. At the 10^10 design scale
# this becomes 4096 slices sized per-bucket (SCALE.md §URL-seen); the
# maintenance protocol below is identical — only the constants grow.
BLOOM_CFG = {"n_buckets": 4, "m_bits": 1 << 21, "k": 5}

FRONTIER_COLS = [
    "url_canon",
    "url_hash",
    "host",
    "priority",
    "depth",
    "discovery_seq",
    "discovery_ts",
    "status",
    "round_id",
    "attempts",
    # the round the row was inserted (never updated, retries keep it):
    # the anchor for starvation-free priority aging (run_round
    # aging_every) — age = current round - born_round
    "born_round",
]

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("deny_prefixes", T.ArrayType(T.StringType())),
        T.StructField("crawl_delay_s", T.DoubleType()),
    ]
)


def _frontier_select(df: DataFrame) -> DataFrame:
    return df.select(*FRONTIER_COLS)


def read_frontier(catalog: SnapshotCatalog) -> DataFrame:
    """Resolved frontier view: base minus updated keys, union the latest
    update row per key (max round_id wins; a key appears at most once
    per round, so the order is total).

    The anti-join's build side is only the delta KEY set — small between
    compactions, so Spark broadcasts it and the base never shuffles."""
    base = catalog.read("frontier")
    if not catalog.exists("frontier_updates"):
        return base
    delta = catalog.read("frontier_updates")
    keys = ["url_hash", "url_canon"]
    latest = (
        delta.groupBy(*keys)
        .agg(
            F.max_by(
                F.struct(*[F.col(c) for c in FRONTIER_COLS]), F.col("round_id")
            ).alias("r")
        )
        .select("r.*")
    )
    return base.join(latest.select(*keys), keys, "left_anti").unionByName(latest)


def _priority_col(host_priorities: dict[str, int] | None):
    """Frontier priority from a host -> int map (lower schedules first).

    The map is a literal ``create_map`` here — fine for the dimension
    sizes a rank pass emits per wave; at 10^7-host web scale the same
    lookup is a broadcast-joined dimension table (host_link_rank /
    opic_importance output), identical semantics. Hosts absent from the
    map crawl at priority 0, the reference's FIFO-by-discovery default."""
    if not host_priorities:
        return F.lit(0)
    m = F.create_map(
        *[F.lit(x) for kv in sorted(host_priorities.items()) for x in kv]
    )
    return F.coalesce(m[F.col("host")], F.lit(0)).cast("int")


def init_crawl(
    catalog: SnapshotCatalog, web: SynthWeb, seeds_raw: list[str] | None = None,
    seen_filter: str = "bloom",
    host_priorities: dict[str, int] | None = None,
) -> int:
    """Snapshot 0: canonicalized+deduped seeds as the pending frontier,
    seeds in the seen set, robots dimension loaded.

    ``seen_filter`` picks the persisted prefilter sidecar: "bloom"
    (default, densest) or "cuckoo" (supports DELETE — required for the
    recrawl-expiry path, see ``expire_urls``). Both share the same
    contract: negatives skip the exact anti-join, positives are
    confirmed by it."""
    spark = catalog.spark
    seeds_raw = seeds_raw if seeds_raw is not None else web.seeds_raw()
    seeds = spark.createDataFrame(
        [(u, i) for i, u in enumerate(seeds_raw)], "url string, seq long"
    )
    canon = with_url_cols(seeds)
    # first-wins dedup on the canonical form (reference analog: ordered
    # seen-set dedup, kakao_api.py:147-155)
    frontier = (
        canon.groupBy("url_canon")
        .agg(
            F.min("seq").alias("discovery_seq"),
            F.any_value("url_hash").alias("url_hash"),
            F.any_value("host").alias("host"),
        )
        .withColumn("priority", _priority_col(host_priorities))
        .withColumn("depth", F.lit(0))
        .withColumn("discovery_ts", F.timestamp_micros(F.col("discovery_seq")))
        .withColumn("status", F.lit("pending"))
        .withColumn("round_id", F.lit(0))
        .withColumn("attempts", F.lit(0))
        .withColumn("born_round", F.lit(0))
    )
    robots = spark.createDataFrame(web.robots_rows(), schema=ROBOTS_SCHEMA)
    catalog.stage_overwrite("frontier", _frontier_select(frontier))
    catalog.stage_overwrite("seen", frontier.select("url_hash", "url_canon"))
    catalog.stage_overwrite("robots", robots)
    # persistent bucketed prefilter over the seen set, seeded here and
    # then incrementally updated each round (never rebuilt from a full
    # seen-table scan)
    if seen_filter == "cuckoo":
        filter_meta = {"cuckoo": CUCKOO_CFG}
        catalog.stage_overwrite(
            "cuckoo",
            merge_cuckoo_rows(
                cuckoo_delta_rows(frontier.select("url_hash"), **CUCKOO_CFG),
                CUCKOO_CFG["n_slots"], CUCKOO_CFG["slot_width"],
            ),
        )
    else:
        filter_meta = {"bloom": BLOOM_CFG}
        catalog.stage_overwrite(
            "bloom",
            merge_bloom_rows(
                bloom_delta_rows(frontier.select("url_hash"), **BLOOM_CFG)
            ),
        )
    # global discovery counter continues after the largest seed seq
    # (raw seed indexes; duplicates collapsed by the first-wins dedup);
    # row counts ride in meta so compaction decisions never need a job
    agg = frontier.agg(
        F.max("discovery_seq").alias("mx"), F.count("*").alias("n")
    ).first()
    n_seeds = int(agg["n"] or 0)
    return catalog.commit(
        meta={
            "next_seq": int(agg["mx"]) + 1 if agg["mx"] is not None else 0,
            **filter_meta,
            "frontier_rows": n_seeds,
            "frontier_base_rows": n_seeds,
            "frontier_delta_rows": 0,
        }
    )


def run_round(
    catalog: SnapshotCatalog,
    web: SynthWeb,
    round_seconds: float = 16.0,
    n_salt: int = 16,
    use_bloom: bool = True,
    target_host_contains: str | None = None,
    max_attempts: int = 2,
    stop_on_caption_contains: str | None = None,
    compact_frac: float = 0.3,
    compact_min: int = 1024,
    host_priorities: dict[str, int] | None = None,
    adaptive: bool = False,
    aging_every: int | None = None,
    max_pages_per_host: int | None = None,
    politeness_by: str = "host",
    n_ips: int = 4,
    trap_max_seg_repeat: int | None = None,
    store_links: bool = False,
) -> dict:
    """Execute one crawl round; returns counters (crawling_stats analog,
    reference: src/crawler/base_crawler.py:38-47).

    ``store_links=True`` additionally persists the round's raw outlink
    rows as the ``page_links`` table — (src page, dst canonical, sibling
    index, round): the crawl-NATIVE link graph. Everything the graph
    suite computes (link-rank, HITS, components, trap reports) can then
    run over edges the crawl actually observed instead of a derived
    fixture, and the rank output loops back in as ``host_priorities``
    for the next wave (the OPIC feedback cycle). Off by default: it is
    an extra canon pass + table write per round, O(links) like the
    expansion itself.

    ``trap_max_seg_repeat`` arms the spider-trap gate (Heritrix
    PathologicalPathDecideRule shape, operators/traps.py): a pending
    URL whose path repeats any single segment that many times is marked
    terminally ``trapped`` this round — never fetched, never
    rescheduled — which is what lets a crawl of an infinite calendar
    chain (/cal/2024/2024/...) DRAIN instead of looping until
    max_rounds. The signal is a shuffle-free native expression over the
    pending slice; the sequential oracle applies the identical rule, so
    ordering/seen parity holds across the cut (test_rounds_oracle).

    ``politeness_by="ip"`` switches the admission window to the Mercator
    shared-IP refinement: virtual hosting maps many hostnames onto one
    server, so the budget is enforced per IP, not per hostname. The IP
    stand-in is ``xxhash64(host) pmod n_ips`` (a DNS dimension would
    slot in identically), and an IP's budget is the MIN of its member
    hosts' budgets this round — exactly floor(round_seconds / max
    member delay), i.e. the shared server is as slow as its slowest
    declared crawl-delay. Mutually exclusive with ``adaptive`` and
    ``max_pages_per_host`` (both are host-keyed budget clamps).

    ``max_pages_per_host`` is the cumulative host quota (the Heritrix
    host-quota control; the reference's per-region result cap is the
    same idea, crawler.py result-count break): a host that has consumed
    that many schedule SLOTS over the whole crawl (retries count — every
    slot is a fetch) never schedules again. Its surplus rows stay
    pending and the crawl loop drains naturally when only quota-starved
    work remains. State is a per-round (host, n_scheduled) append —
    O(hosts) rows per round, summed at read and broadcast, never a scan
    of the schedule itself.

    ``aging_every`` enables starvation-free priority aging (the
    Heritrix/BUbiNG frontier refinement): a pending row's EFFECTIVE
    priority this round is ``max(0, priority - (round_id - born_round)
    // aging_every)`` — every ``aging_every`` rounds a waiting row gains
    one priority level, so low-priority hosts eventually schedule even
    under a permanently hot frontier. The aging is stateless (derived
    from the immutable born_round column — no per-round frontier
    rewrite), the stored priority is never mutated, and link expansion
    orders children by the parent's effective key so the sequential
    oracle (plans/oracle.py, same rule) stays exact.

    ``target_host_contains`` is the single-region targeting filter (F9,
    reference: crawler.py:1205-1226) — a frontier pre-filter, i.e.
    partition pruning by seed subset.

    ``max_attempts`` is the fetch retry budget (T3, reference:
    base_crawler.py:33,232-284 retries failed work up to 2 attempts):
    a failed URL below the budget re-enters the frontier as pending with
    ``attempts+1`` — the batch analog of the reference's in-place retry
    is a re-queue into the NEXT round, keeping its original ordering key
    — and only at the budget does it become terminal in fetch_failures.

    ``stop_on_caption_contains`` reports ``target_hits`` in the returned
    stats — the crawl loop's stop-on-found signal (reference:
    crawler.py:1149-1157 breaks out once the targeted name is found).

    ``compact_frac``/``compact_min``: fold the frontier_updates delta
    into the base when it exceeds max(compact_min, compact_frac * base
    rows) — the merge-on-read compaction cadence.
    """
    if politeness_by not in ("host", "ip"):
        raise ValueError("politeness_by must be 'host' or 'ip'")
    if politeness_by == "ip" and (adaptive or max_pages_per_host is not None):
        raise ValueError(
            "politeness_by='ip' is incompatible with the host-keyed "
            "budget clamps (adaptive, max_pages_per_host)"
        )
    spark = catalog.spark
    round_id = catalog.current_id() + 1
    meta = catalog.meta()
    frontier = read_frontier(catalog)
    seen = catalog.read("seen")
    robots = catalog.read("robots")

    # ---- merge-on-read compaction (decided from meta counts: no jobs) --
    base_rows = meta.get("frontier_base_rows")
    delta_rows = meta.get("frontier_delta_rows", 0)
    compacting = (
        base_rows is not None
        and delta_rows > max(compact_min, compact_frac * base_rows)
    )

    pending = frontier.filter(F.col("status") == "pending")
    if target_host_contains:
        pending = pending.filter(F.col("host").contains(target_host_contains))

    trapped = None
    if trap_max_seg_repeat is not None:
        from crawler_spark.operators.traps import trap_signals

        sig = trap_signals(pending, url_col="url_canon")
        trapped = (
            sig.filter(F.col("max_seg_repeat") >= F.lit(trap_max_seg_repeat))
            .drop("path_depth", "max_seg_repeat", "path_template")
            .persist()
        )
        pending = sig.filter(
            F.col("max_seg_repeat") < F.lit(trap_max_seg_repeat)
        ).drop("path_depth", "max_seg_repeat", "path_template")

    allowed, denied = robots_gate(pending, robots, round_seconds)
    if adaptive and catalog.exists("host_outcomes"):
        # closed-loop politeness (reference parity: the crawler slows on
        # a host as soon as it misbehaves): hosts with ANY fetch failure
        # in the PREVIOUS round crawl at half budget this round (floor,
        # min 1). The outcome table is host-dimension sized and
        # broadcast; the sequential oracle mirrors the same rule.
        prev_failed = (
            catalog.read("host_outcomes")
            .filter(
                (F.col("round_id") == round_id - 1) & (F.col("n_failed") > 0)
            )
            .select("host")
            .withColumn("_halve", F.lit(True))
        )
        allowed = (
            allowed.join(F.broadcast(prev_failed), "host", "left")
            .withColumn(
                "budget",
                F.when(
                    F.col("_halve"),
                    F.greatest(
                        F.lit(1), F.floor(F.col("budget") / 2)
                    ).cast("int"),
                ).otherwise(F.col("budget")),
            )
            .drop("_halve")
        )
    if max_pages_per_host is not None:
        # cumulative host quota: this round's budget is capped by the
        # host's remaining lifetime slots. Served state is the tiny
        # host_served table (one row per host per past round), summed
        # and broadcast — the fact side never shuffles.
        if catalog.exists("host_served"):
            served = (
                catalog.read("host_served")
                .groupBy("host")
                .agg(F.sum("n_scheduled").alias("_served"))
            )
            allowed = allowed.join(F.broadcast(served), "host", "left")
        else:
            allowed = allowed.withColumn("_served", F.lit(None).cast("long"))
        allowed = allowed.withColumn(
            "budget",
            F.least(
                F.col("budget").cast("long"),
                F.greatest(
                    F.lit(0).cast("long"),
                    F.lit(int(max_pages_per_host))
                    - F.coalesce(F.col("_served"), F.lit(0)),
                ),
            ).cast("int"),
        ).drop("_served")
    # denied is referenced by the frontier rewrite, the status anti-join
    # and the denied counter; persist so the robots-gate branch runs once
    denied = denied.persist()
    # effective scheduling priority: aged when aging_every is set,
    # otherwise identical to the stored priority. Carried through the
    # fetch stage so link expansion orders children by the key their
    # parent actually scheduled under (oracle parity).
    if aging_every:
        eff = F.greatest(
            F.lit(0),
            F.col("priority")
            - F.floor(
                (F.lit(round_id) - F.col("born_round")) / F.lit(aging_every)
            ).cast("int"),
        ).cast("int")
    else:
        eff = F.col("priority")
    allowed = allowed.withColumn("eff_priority", eff)
    sched_key = "host"
    if politeness_by == "ip":
        # Mercator shared-IP politeness: key the admission window by the
        # (deterministic) IP and give each IP the MIN of its member
        # hosts' budgets — floor(round_seconds / max member delay),
        # since floor and min commute through the monotone 1/delay.
        # The per-IP budget dimension is O(n_ips): broadcast.
        allowed = allowed.withColumn(
            "ip_id", F.pmod(F.xxhash64("host"), F.lit(n_ips))
        )
        ipb = allowed.groupBy("ip_id").agg(F.min("budget").alias("_ipb"))
        allowed = (
            allowed.drop("budget")
            .join(F.broadcast(ipb), "ip_id")
            .withColumnRenamed("_ipb", "budget")
        )
        sched_key = "ip_id"
    scheduled = (
        politeness_select(
            allowed,
            n_salt=n_salt,
            order_cols=["eff_priority", "depth", "discovery_seq", "url_hash"],
            key_col=sched_key,
        )
        .drop("ip_id")
        .persist()
    )
    # The fetch stage is compute-heavy but byte-light: AQE would coalesce
    # the window shuffle's ~MBs of URL rows into 1-2 partitions and
    # serialize the Python fetch workers. Explicitly hash-repartition to
    # the cluster's parallelism (explicit numPartitions is exempt from
    # AQE coalescing); url_hash spreads any single mega-host evenly.
    # 2x cores: fine enough that the straggler tail is at most half a
    # wave, coarse enough to amortize the per-task Arrow stream setup
    # (each task pairs with a python worker, so task count is also
    # worker churn) -- measured ~20% faster than 4x on the 200k round;
    # SPARK_GRAFT_FETCH_FANOUT overrides the multiplier for tuning
    import os as _os2

    _fanout = int(_os2.environ.get("SPARK_GRAFT_FETCH_FANOUT", "2"))
    n_fetch = _fanout * spark.sparkContext.defaultParallelism
    fetched = (
        run_fetch(scheduled.repartition(n_fetch, "url_hash"), web)
        .withColumn("partition_id", F.spark_partition_id())
        .persist()
    )

    results_new = fetched.filter(F.col("kind") == "result").select(
        "url_canon",
        "url_hash",
        "host",
        F.lit(round_id).alias("round_id"),
        "partition_id",
        "image_id",
        "bytes",
        "w",
        "h",
        "fmt",
        "caption",
        "phash",
    )
    # only failures that exhausted the retry budget are terminal; the
    # rest re-enter the frontier as pending below (T3)
    failures_new = (
        fetched.filter(F.col("kind") == "fail")
        .select(
            "url_canon",
            "url_hash",
            "host",
            F.lit(round_id).alias("round_id"),
            "partition_id",
            "error_reason",
            (F.col("attempts") + F.lit(1)).alias("attempts"),
        )
        .filter(F.col("attempts") >= F.lit(max_attempts))
    )

    # ---- per-partition metrics (A6: crawling_stats analog) --------------
    # aggregated FIRST: this one job materializes scheduled+fetched into
    # the cache, replaces four separate count() actions, and tells us
    # whether the round discovered any links at all
    metrics = (
        fetched.groupBy("partition_id")
        .agg(
            F.count_distinct("url_hash", "url_canon").alias("scheduled"),
            F.sum((F.col("kind") == "result").cast("long")).alias("results"),
            F.sum((F.col("kind") == "fail").cast("long")).alias("failed"),
            F.sum((F.col("kind") == "link").cast("long")).alias("links"),
        )
        .withColumn("round_id", F.lit(round_id))
    )
    # ONE driver action computes every round counter: the fetch totals,
    # the denied/trapped branch sizes, and the stop-on-found hit count
    # ride along as crossJoins of 1-row aggregates over already-persisted
    # branches — replacing what used to be up to four separate .count()
    # jobs per round (each a full task wave even against cache)
    agg_m = metrics.groupBy().agg(
        F.sum("scheduled").alias("scheduled"),
        F.sum("results").alias("results"),
        F.sum("failed").alias("failed"),
        F.sum("links").alias("links"),
    ).crossJoin(denied.agg(F.count(F.lit(1)).alias("denied_n")))
    if trapped is not None:
        agg_m = agg_m.crossJoin(
            trapped.agg(F.count(F.lit(1)).alias("trapped_n"))
        )
    if stop_on_caption_contains is not None:
        # stop-on-found signal (reference: crawler.py:1149-1157): did any
        # result landed this round match the target?
        agg_m = agg_m.crossJoin(
            results_new.filter(
                F.col("caption").contains(stop_on_caption_contains)
            ).agg(F.count(F.lit(1)).alias("target_hits_n"))
        )
    # optional phase timing (SPARK_GRAFT_ROUND_TIMINGS=1): wall seconds
    # of the round's three driver-blocking phases, for bench profiling —
    # zero-cost when off, never changes the plan
    import os as _os
    import time as _time

    _timing = _os.environ.get("SPARK_GRAFT_ROUND_TIMINGS") == "1"
    _t0 = _time.monotonic() if _timing else 0.0
    m = agg_m.first()
    _t_fetch = _time.monotonic() - _t0 if _timing else 0.0
    n_links = int(m["links"] or 0)

    # ---- expand frontier: canonicalize links, first-discovery-wins dedup,
    # bloom-prefiltered exact anti-join against the seen set, then assign
    # each survivor a dense global discovery_seq in encounter order ------
    # Link rows carry the PARENT's ordering key; a sequential crawler
    # encounters link (P, i) before (P', i') iff P precedes P' in the
    # schedule order or P == P' and i < i'. min(struct(...)) per
    # url_canon = the first encounter, which also pins the child's depth
    # to the winning parent's depth + 1 (a min over a separate depth
    # column could disagree with the winning encounter).
    links = fetched.filter(F.col("kind") == "link").select(
        F.col("link_raw").alias("url"),
        F.struct(
            F.col("eff_priority").alias("p_priority"),
            F.col("depth").alias("p_depth"),
            F.col("discovery_seq").alias("p_seq"),
            F.col("url_hash").alias("p_hash"),
            F.col("link_seq").alias("sibling"),
        ).alias("dk"),
    )
    link_canon = with_url_cols(links)
    new_urls = (
        link_canon.groupBy("url_canon")
        .agg(
            F.min("dk").alias("dk"),
            F.any_value("url_hash").alias("url_hash"),
            F.any_value("host").alias("host"),
        )
        .withColumn("depth", (F.col("dk.p_depth") + F.lit(1)).cast("int"))
    )
    seq_handle = None
    bloom_cfg = meta.get("bloom")
    cuckoo_cfg = meta.get("cuckoo")
    if n_links:
        # the prefilter is a PERSISTED bucketed sidecar (bloom or cuckoo,
        # whichever init_crawl seeded), incrementally updated each round.
        # Bucket-pruned load: only the slices the round's candidate
        # links actually touch are read (In-predicate pushed into the
        # parquet scan) and each is deserialized on its executor task —
        # the filter never materializes on the driver (SCALE.md §URL-seen)
        sidecar = None
        if use_bloom and cuckoo_cfg and catalog.exists("cuckoo"):
            sidecar = ("cuckoo", catalog.read("cuckoo"), cuckoo_cfg)
        elif use_bloom and bloom_cfg and catalog.exists("bloom"):
            sidecar = ("bloom", catalog.read("bloom"), bloom_cfg)
        if sidecar is not None:
            kind, sdf, scfg = sidecar
            unseen_raw = anti_join_seen_pruned(new_urls, seen, sdf, kind, scfg)
        else:
            unseen_raw = anti_join_seen(new_urls, seen, None)
        # dense discovery_seq: offset carried in snapshot meta (no
        # per-round rescan of the frontier); fallback aggregates the
        # frontier's max once for catalogs created before this counter
        offset = meta.get("next_seq")
        if offset is None:
            mx = frontier.agg(F.max("discovery_seq")).first()[0]
            offset = int(mx) + 1 if mx is not None else 0
        seqd, n_new, seq_handle = assign_dense_seq(
            unseen_raw,
            order_cols=["dk.p_priority", "dk.p_depth", "dk.p_seq",
                        "dk.p_hash", "dk.sibling"],
            seq_col="discovery_seq",
            offset=offset,
        )
        # persisted: referenced by the frontier rewrite, the seen append
        # AND the metrics — without it the bloom UDF + anti-join run 3x
        unseen = seqd.drop("dk").persist()
        next_seq = offset + n_new
    else:
        # leaf-only round: skip the bloom build and the anti-join stages
        n_new = 0
        next_seq = meta.get("next_seq")
        empty_schema = new_urls.drop("dk").schema.add("discovery_seq", T.LongType())
        unseen = spark.createDataFrame([], empty_schema)
    new_frontier = (
        unseen.withColumn("priority", _priority_col(host_priorities))
        .withColumn("discovery_ts", F.timestamp_micros(F.col("discovery_seq")))
        .withColumn("status", F.lit("pending"))
        .withColumn("round_id", F.lit(round_id))
        .withColumn("attempts", F.lit(0))
        .withColumn("born_round", F.lit(round_id))
    )

    # ---- frontier status update ----------------------------------------
    keys = ["url_hash", "url_canon"]
    fail_keys = (
        fetched.filter(F.col("kind") == "fail")
        .select(*keys)
        .withColumn("_failed", F.lit(True))
    )
    # T3 retry budget: a failed fetch below max_attempts goes BACK to
    # pending (with its original ordering key, so it reschedules in
    # order next round); at the budget it becomes terminal 'failed'
    done = (
        scheduled.join(fail_keys, keys, "left")
        .withColumn(
            "status",
            F.when(
                F.col("_failed")
                & (F.col("attempts") + F.lit(1) < F.lit(max_attempts)),
                F.lit("pending"),
            )
            .when(F.col("_failed"), F.lit("failed"))
            .otherwise(F.lit("fetched")),
        )
        .withColumn("attempts", (F.col("attempts") + F.lit(1)).cast("int"))
        .withColumn("round_id", F.lit(round_id))
    )
    denied_rows = denied.withColumn("status", F.lit("denied")).withColumn(
        "round_id", F.lit(round_id)
    )
    # merge-on-read: ONLY the touched rows are written — status changes
    # (fetched/failed/retry-pending/denied/trapped) plus newly discovered
    # pending rows. Unscheduled pending and historical rows are never
    # rewritten.
    delta_round = (
        _frontier_select(done)
        .unionByName(_frontier_select(denied_rows))
        .unionByName(_frontier_select(new_frontier))
    )
    if trapped is not None:
        trapped_rows = trapped.withColumn(
            "status", F.lit("trapped")
        ).withColumn("round_id", F.lit(round_id))
        delta_round = delta_round.unionByName(_frontier_select(trapped_rows))

    schedule_log = scheduled.select(
        F.lit(round_id).alias("round_id"),
        "url_canon",
        "url_hash",
        "host",
        "priority",
        # the key the row actually scheduled under (aged) — the
        # within-round order is (eff_priority, depth, seq, hash)
        "eff_priority",
        "depth",
        "discovery_seq",
    )

    # Stage all table writes concurrently: the writes are independent
    # jobs over the persisted fetch output, and overlapping them lets the
    # scheduler backfill each job's straggler tail with the next job's
    # tasks (serial writes idle (cores-1) slots at every tail).
    if compacting:
        # fold: base <- resolved frontier as-of round start (the one
        # amortized full write), updates <- just this round's delta
        frontier_writes = [
            ("frontier", frontier, True),
            ("frontier_updates", delta_round, True),
        ]
    else:
        frontier_writes = [("frontier_updates", delta_round, False)]
    writes = [
        *frontier_writes,
        ("results", results_new, False),
    ]
    if adaptive:
        host_outcomes = (
            fetched.groupBy("host")
            .agg(
                F.sum((F.col("kind") == "fail").cast("long")).alias(
                    "n_failed"
                )
            )
            .withColumn("round_id", F.lit(round_id))
        )
        writes.append(("host_outcomes", host_outcomes, False))
    if max_pages_per_host is not None:
        # quota state delta: one row per host scheduled this round
        host_served_delta = (
            scheduled.groupBy("host")
            .agg(F.count(F.lit(1)).cast("long").alias("n_scheduled"))
            .withColumn("round_id", F.lit(round_id))
        )
        writes.append(("host_served", host_served_delta, False))
    if store_links:
        page_links = with_url_cols(
            fetched.filter(F.col("kind") == "link").select(
                F.col("url_canon").alias("src_canon"),
                F.col("url_hash").alias("src_hash"),
                F.col("host").alias("src_host"),
                F.col("link_raw").alias("url"),
                "link_seq",
            )
        ).select(
            "src_canon",
            "src_hash",
            "src_host",
            F.col("url_canon").alias("dst_canon"),
            F.col("url_hash").alias("dst_hash"),
            F.col("host").alias("dst_host"),
            "link_seq",
            F.lit(round_id).alias("round_id"),
        )
        writes.append(("page_links", page_links, False))
    writes += [
        ("fetch_failures", failures_new, False),
        # one row per fetch partition -> single small file per round
        ("round_metrics", metrics.coalesce(1), False),
        ("schedule_log", schedule_log, False),
    ]
    if n_links:
        writes.append(("seen", unseen.select("url_hash", "url_canon"), False))
        if bloom_cfg and catalog.exists("bloom"):
            # incremental maintenance: OR only the round's new keys into
            # the persisted slices (distributed per-bucket reduce) —
            # O(round) work, not O(total seen). Maintained even when
            # use_bloom=False so the filter can never go stale (a stale
            # bloom's false negatives would skip the exact join and
            # re-enqueue seen URLs).
            delta = bloom_delta_rows(unseen.select("url_hash"), **bloom_cfg)
            updated = merge_bloom_rows(catalog.read("bloom").unionByName(delta))
            writes.append(("bloom", updated, True))
        if cuckoo_cfg and catalog.exists("cuckoo"):
            # same incremental protocol for the cuckoo sidecar; this is
            # also what self-heals an expired key once it is refetched:
            # it re-enters via the unseen set and its fingerprint is
            # re-inserted here.
            delta = cuckoo_delta_rows(unseen.select("url_hash"), **cuckoo_cfg)
            updated = merge_cuckoo_rows(
                catalog.read("cuckoo").unionByName(delta),
                cuckoo_cfg["n_slots"], cuckoo_cfg["slot_width"],
            )
            writes.append(("cuckoo", updated, True))
    from concurrent.futures import ThreadPoolExecutor

    _t1 = _time.monotonic() if _timing else 0.0
    with ThreadPoolExecutor(max_workers=4) as pool:
        futs = [
            pool.submit(
                catalog.stage_overwrite if ow else catalog.stage_append, t, df
            )
            for t, df, ow in writes
        ]
        for f in futs:
            f.result()
    _t_writes = _time.monotonic() - _t1 if _timing else 0.0

    stats = {
        "round_id": round_id,
        "scheduled": int(m["scheduled"] or 0),
        "results": int(m["results"] or 0),
        "failed": int(m["failed"] or 0),
        "new_links": n_new,
        "denied": int(m["denied_n"]),
    }
    if trapped is not None:
        stats["trapped"] = int(m["trapped_n"])
    if stop_on_caption_contains is not None:
        stats["target_hits"] = int(m["target_hits_n"])

    new_meta: dict = {}
    if next_seq is not None:
        new_meta["next_seq"] = next_seq
    total = meta.get("frontier_rows")
    if total is not None:
        round_delta = stats["scheduled"] + stats["denied"] + n_new
        new_meta["frontier_rows"] = total + n_new
        if compacting:
            new_meta["frontier_base_rows"] = total
            new_meta["frontier_delta_rows"] = round_delta
        else:
            new_meta["frontier_delta_rows"] = delta_rows + round_delta
    _t2 = _time.monotonic() if _timing else 0.0
    catalog.commit(meta=new_meta or None)
    if _timing:
        stats["timings"] = {
            "fetch_and_metrics_sec": round(_t_fetch, 3),
            "expand_and_stage_writes_sec": round(_t_writes, 3),
            "commit_sec": round(_time.monotonic() - _t2, 3),
        }
    scheduled.unpersist()
    fetched.unpersist()
    denied.unpersist()
    if trapped is not None:
        trapped.unpersist()
    if n_links:
        unseen.unpersist()
    if seq_handle is not None:
        seq_handle.unpersist()
    return stats


def run_crawl(
    spark: SparkSession,
    root: str,
    web: SynthWeb,
    max_rounds: int = 32,
    round_seconds: float = 16.0,
    seeds_raw: list[str] | None = None,
    use_bloom: bool = True,
    n_salt: int = 16,
    max_attempts: int = 2,
    target_host_contains: str | None = None,
    stop_on_caption_contains: str | None = None,
    compact_frac: float = 0.3,
    compact_min: int = 1024,
    seen_filter: str = "bloom",
    host_priorities: dict[str, int] | None = None,
    adaptive: bool = False,
    aging_every: int | None = None,
    max_pages_per_host: int | None = None,
    politeness_by: str = "host",
    n_ips: int = 4,
    trap_max_seg_repeat: int | None = None,
    store_links: bool = False,
) -> tuple[SnapshotCatalog, list[dict]]:
    """Full crawl loop: init + rounds until the frontier drains, or —
    with ``stop_on_caption_contains`` — until a round lands a matching
    result (the reference's stop-on-found early exit,
    crawler.py:1149-1157,1308-1334)."""
    catalog = SnapshotCatalog(root, spark)
    init_crawl(catalog, web, seeds_raw, seen_filter=seen_filter,
               host_priorities=host_priorities)
    history: list[dict] = []
    for _ in range(max_rounds):
        stats = run_round(
            catalog, web, round_seconds=round_seconds, n_salt=n_salt,
            use_bloom=use_bloom, max_attempts=max_attempts,
            target_host_contains=target_host_contains,
            stop_on_caption_contains=stop_on_caption_contains,
            compact_frac=compact_frac, compact_min=compact_min,
            host_priorities=host_priorities, adaptive=adaptive,
            aging_every=aging_every, max_pages_per_host=max_pages_per_host,
            politeness_by=politeness_by, n_ips=n_ips,
            trap_max_seg_repeat=trap_max_seg_repeat,
            store_links=store_links,
        )
        history.append(stats)
        if stats.get("target_hits", 0) > 0:
            break
        if stats["scheduled"] == 0:
            break
    return catalog, history


def resume_crawl(
    spark: SparkSession,
    root: str,
    web: SynthWeb,
    max_rounds: int = 32,
    round_seconds: float = 16.0,
    use_bloom: bool = True,
    max_attempts: int = 2,
    aging_every: int | None = None,
    host_priorities: dict[str, int] | None = None,
    adaptive: bool = False,
    max_pages_per_host: int | None = None,
    politeness_by: str = "host",
    n_ips: int = 4,
    trap_max_seg_repeat: int | None = None,
) -> tuple[SnapshotCatalog, list[dict]]:
    """Resume from the latest committed snapshot (T2: save_crawling_state
    analog). Staged-but-uncommitted files from a crashed round are
    invisible, so the interrupted round simply re-runs. Pass the same
    scheduler flags the crawl was started with: aging is stateless
    (derived from born_round), adaptive feedback and the host quota read
    their own committed state tables (host_outcomes / host_served), so
    resume needs no extra stored state beyond the snapshot itself."""
    catalog = SnapshotCatalog(root, spark)
    history: list[dict] = []
    for _ in range(max_rounds):
        stats = run_round(
            catalog, web, round_seconds=round_seconds, use_bloom=use_bloom,
            max_attempts=max_attempts, aging_every=aging_every,
            host_priorities=host_priorities, adaptive=adaptive,
            max_pages_per_host=max_pages_per_host,
            politeness_by=politeness_by, n_ips=n_ips,
            trap_max_seg_repeat=trap_max_seg_repeat,
        )
        history.append(stats)
        if stats["scheduled"] == 0:
            break
    return catalog, history


def expire_urls(catalog: SnapshotCatalog, url_hashes: list[int]) -> int:
    """Recrawl expiry: delete the given keys' fingerprints from the
    persisted cuckoo sidecar — an O(touched-slices) update, NOT a
    10^10-row seen-table MERGE. An expired URL then reads as unseen the
    next time any page rediscovers it (filter-negative rows skip the
    exact anti-join by contract), it is refetched once, and the round's
    incremental filter maintenance re-inserts its fingerprint — after
    which rediscoveries are blocked again. The seen table itself is
    never rewritten; its duplicate (url_hash, url_canon) row after the
    refetch is harmless to ``left_anti`` semantics.

    Requires the catalog to have been initialized with
    ``seen_filter="cuckoo"`` — a bloom cannot delete (the reason the
    north rule names both filters). Returns how many fingerprints were
    actually removed.

    Bucket-pruned, executor-side: the expiry keys (an operator-sized
    list) route to their touched buckets; ONLY those slice rows are
    read (In-predicate pushed into the scan) and each bucket's delete
    runs in its own ``applyInPandas`` task with the keys broadcast.
    Untouched slices flow through lazily to the overwrite — the filter
    never materializes on the driver (round-3 VERDICT finding #1)."""
    meta = catalog.meta()
    cfg = meta.get("cuckoo")
    if not cfg or not catalog.exists("cuckoo"):
        raise ValueError(
            "expire_urls requires seen_filter='cuckoo' (bloom filters "
            "cannot delete; init_crawl(..., seen_filter='cuckoo'))"
        )
    import numpy as np
    import pandas as pd

    keys = np.asarray(url_hashes, dtype=np.int64)
    if keys.size == 0:
        return 0
    n_buckets = int(cfg["n_buckets"])
    n_slots, slot_width = int(cfg["n_slots"]), int(cfg["slot_width"])
    buckets = (keys.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int64)
    touched = sorted(int(b) for b in np.unique(buckets))
    spark = catalog.spark
    tbl = catalog.read("cuckoo")
    bc = spark.sparkContext.broadcast(keys)

    def del_group(pdf: pd.DataFrame) -> pd.DataFrame:
        from crawler_spark.operators.cuckoo import NumpyCuckoo

        assert len(pdf) == 1, "one slice row per bucket by merge contract"
        b = int(pdf["bucket_id"].iloc[0])
        sl = NumpyCuckoo.from_bytes(
            bytes(pdf["tbl"].iloc[0]), bytes(pdf["stash"].iloc[0]),
            n_slots, slot_width,
        )
        k = bc.value
        kb = (k.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int64)
        n_rm = sl.delete_many(k[kb == b])
        t, s = sl.to_bytes()
        return pd.DataFrame(
            {"bucket_id": [b], "tbl": [t], "stash": [s], "removed": [n_rm]}
        )

    updated = (
        tbl.filter(F.col("bucket_id").isin(touched))
        .groupBy("bucket_id")
        .applyInPandas(
            del_group,
            schema="bucket_id int, tbl binary, stash binary, removed long",
        )
        .persist()
    )
    removed = int(updated.agg(F.sum("removed")).first()[0] or 0)
    untouched = tbl.filter(~F.col("bucket_id").isin(touched))
    catalog.stage_overwrite(
        "cuckoo", updated.drop("removed").unionByName(untouched)
    )
    catalog.commit()
    updated.unpersist()
    bc.unpersist()
    return removed


def reprioritize(
    catalog: SnapshotCatalog, host_priorities: dict[str, int] | None
) -> int:
    """Mid-crawl frontier reprioritization: REPLACE the host-priority
    map for every pending row (absent hosts fall back to priority 0,
    the same rule ``_priority_col`` applies to new discoveries) — the
    step that closes the rank-feedback loop: link_rank / opic output
    -> ``rank_to_priorities`` -> this -> the next round schedules under
    the new order.

    Merge-on-read: ONLY pending rows whose priority actually changes
    are appended to ``frontier_updates`` (O(changed), never a frontier
    rewrite), tagged with this commit's round id so latest-per-key
    resolution picks them up before the next round. Fetched / failed /
    denied history rows are never touched. Callers must pass the SAME
    map to subsequent ``run_round`` calls so new discoveries and the
    re-keyed pending rows order consistently — the sequential oracle's
    ``reprioritize`` mirrors exactly this contract
    (tests/test_rounds_oracle.py proves schedule + seen parity across
    a mid-crawl priority flip).

    Returns the number of re-keyed rows."""
    spark = catalog.spark
    round_id = catalog.current_id() + 1
    rows = (
        read_frontier(catalog)
        .filter(F.col("status") == "pending")
        .withColumn("_new_priority", _priority_col(host_priorities))
        .filter(F.col("_new_priority") != F.col("priority"))
        .withColumn("priority", F.col("_new_priority"))
        .drop("_new_priority")
        .withColumn("round_id", F.lit(round_id))
    )
    delta = _frontier_select(rows).persist()
    n = delta.count()
    catalog.stage_append("frontier_updates", delta)
    meta = catalog.meta()
    new_meta = {}
    if meta.get("frontier_rows") is not None:
        new_meta["frontier_delta_rows"] = meta.get("frontier_delta_rows", 0) + n
    catalog.commit(meta=new_meta or None)
    delta.unpersist()
    return n


def refresh_requeue(
    catalog: SnapshotCatalog, alloc: DataFrame, host_col: str = "host"
) -> int:
    """Close the Cho & Garcia-Molina refresh loop: spend
    ``refresh_allocation``'s granted visits (``n_visits`` per host) on
    each host's most-STALE fetched rows — smallest last-fetch round, ties by
    the standard frontier order key — selected with the SAME salted
    two-phase politeness window the scheduler uses (skew-proof: a
    mega-host's fetched history never funnels through one partition).

    The chosen rows re-enter pending as a merge-on-read delta with
    attempts reset; priority / depth / discovery_seq / born_round are
    preserved, so the next round schedules the refreshed URLs under the
    normal ordering contract, and their re-fetch appends REVISIT rows
    to the results table (the WARC revisit-record semantics) while the
    seen-gate keeps their outlinks from re-entering the frontier.
    Everything is DataFrame-native — the allocation may be 10^8 rows;
    nothing is collected. Returns the number of rows requeued."""
    round_id = catalog.current_id() + 1
    visits = alloc.select(
        F.col(host_col).alias("__h"),
        F.col("n_visits").cast("int").alias("budget"),
    )
    fetched = read_frontier(catalog).filter(F.col("status") == "fetched")
    cands = fetched.join(
        F.broadcast(visits), fetched["host"] == F.col("__h")
    ).drop("__h")
    chosen = politeness_select(
        cands,
        order_cols=["round_id", "priority", "depth", "discovery_seq",
                    "url_hash"],
    ).drop("budget")
    rows = (
        chosen.withColumn("status", F.lit("pending"))
        .withColumn("attempts", F.lit(0))
        .withColumn("round_id", F.lit(round_id))
    )
    delta = _frontier_select(rows).persist()
    n = delta.count()
    catalog.stage_append("frontier_updates", delta)
    meta = catalog.meta()
    new_meta = {}
    if meta.get("frontier_rows") is not None:
        new_meta["frontier_delta_rows"] = meta.get("frontier_delta_rows", 0) + n
    catalog.commit(meta=new_meta or None)
    delta.unpersist()
    return n


def requeue_urls(catalog: SnapshotCatalog, url_hashes: list[int]) -> int:
    """Direct recrawl: flip the given frontier rows back to pending (an
    O(keys) merge-on-read delta append — the frontier base is never
    rewritten). The rows keep their original ordering key, so they
    reschedule at their original position among this wave's pending
    work. Use when the frontier row is known; use ``expire_urls`` when
    re-entry should instead happen on organic rediscovery. Do not do
    both for the same key in the same round (two same-round updates to
    one key would tie in the latest-per-key resolution)."""
    spark = catalog.spark
    round_id = catalog.current_id() + 1
    keys = spark.createDataFrame(
        [(int(h),) for h in url_hashes], "url_hash long"
    )
    rows = (
        read_frontier(catalog)
        .join(F.broadcast(keys), "url_hash", "left_semi")
        .withColumn("status", F.lit("pending"))
        .withColumn("attempts", F.lit(0))
        .withColumn("round_id", F.lit(round_id))
    )
    delta = _frontier_select(rows).persist()
    n = delta.count()
    catalog.stage_append("frontier_updates", delta)
    meta = catalog.meta()
    new_meta = {}
    if meta.get("frontier_rows") is not None:
        new_meta["frontier_delta_rows"] = meta.get("frontier_delta_rows", 0) + n
    catalog.commit(meta=new_meta or None)
    delta.unpersist()
    return n


def takedown_host(catalog: SnapshotCatalog, host: str) -> dict:
    """Compliance takedown (retroactive robots change, DMCA, GDPR): drop
    every stored payload from ``host`` WITHOUT touching the crawl's
    memory of it.

    The mechanics are the catalog's merge-on-read equality deletes
    (sources/catalog.py stage_delete): ONE delete-key row per table
    removes every matching row at read time — an O(1)-write operation
    however many millions of rows the host contributed, with the
    physical rewrite deferred to the next ``compact()``. Three
    properties matter and are pinned by tests/test_takedown.py:

    * results and fetch_failures for the host disappear from reads
      (and from the §3.3 stats path / CLI stats mode) immediately;
    * the SEEN set and frontier are deliberately untouched — takedown
      means "stop storing", not "forget you crawled": a resumed crawl
      must NOT refetch the host's URLs (the reference's dedup gate
      keeps skipping them, database.py:126-136);
    * pre-takedown snapshots still time-travel (auditability), and the
      delete is itself a snapshot commit with a meta marker.

    Rows the host contributes AFTER the takedown are NOT covered by the
    old delete (sequence scoping) — by design: a host can be re-allowed
    and recrawled (expire_urls) without resurrecting the purged rows.
    Returns per-table counts of rows hidden by the delete.
    """
    spark = catalog.spark
    key = spark.createDataFrame([(host,)], "host string")
    out: dict = {"host": host}
    for table in ("results", "fetch_failures"):
        if not catalog.exists(table):
            out[table] = 0
            continue
        n = (
            catalog.read(table)
            .filter(F.col("host") == host)
            .count()
        )
        if n:
            catalog.stage_delete(table, key)
        out[table] = int(n)
    catalog.commit(meta={"takedown_host": host})
    return out
