"""Rendezvous (highest-random-weight) host->fetcher assignment.

A distributed crawler statically partitions hosts across fetcher
workers so per-host politeness state (last-fetch time, robots cache,
connection pool) lives on exactly one worker — the reference is a
single process so the property is trivial there (one browser owns every
host, crawler.py's single driver); at N fetchers it must be engineered.
Rendezvous hashing (Thaler & Ravishankar 1996, the scheme UbiCrawler
popularized for crawler host assignment) gives:

  * determinism — assignment is a pure function of (key, worker set),
    so every executor computes it locally with zero coordination;
  * balance — each worker receives ~1/N of keys (hash uniformity);
  * minimal disruption — removing a worker reassigns ONLY that
    worker's keys (each surviving worker keeps its argmax), unlike
    ``hash(key) % N`` where resizing reshuffles almost everything.

Implementation is pure native expressions: per row, build the
array<struct<score,worker>> with ``transform(sequence(...))`` and take
``array_max`` (struct ordering compares score first) — no explode, no
shuffle, no UDF; whole-stage codegen keeps it JVM-side. Scores are
md5 hex strings, which order identically in any engine that can md5 —
the ANSI oracle mirrors the argmax with ``arg_max`` over the same
strings.

Scale shape: O(n_workers) work per row with n_workers in the hundreds —
a scan-local projection, embarrassingly parallel at 10^10 rows. For
n_workers in the tens of thousands, switch the inner loop to a two-level
rendezvous (rack then worker), same function composed twice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hrw_score(key: Column, worker: Column, salt: str = "hrw") -> Column:
    """The rendezvous score of (key, worker): md5 over a canonical
    ``salt:key:worker`` encoding. Hex strings compare lexicographically
    the same everywhere, so the argmax is portable."""
    return F.md5(
        F.concat_ws(":", F.lit(salt), key.cast("string"), worker.cast("string"))
    )


def hrw_assign(
    df: DataFrame,
    key_col: str,
    n_workers: int,
    out_col: str = "worker_id",
    salt: str = "hrw",
) -> DataFrame:
    """Append ``out_col``: the rendezvous-hash worker (0..n_workers-1)
    owning ``key_col``. Deterministic, shuffle-free, codegen-friendly."""
    scores = F.transform(
        F.sequence(F.lit(0), F.lit(n_workers - 1)),
        lambda w: F.struct(
            hrw_score(F.col(key_col), w, salt).alias("score"),
            w.alias("w"),
        ),
    )
    return df.withColumn(out_col, F.array_max(scores)["w"].cast("int"))


def hrw_assign_workers(
    df: DataFrame,
    key_col: str,
    workers: list[str],
    out_col: str = "worker",
    salt: str = "hrw",
) -> DataFrame:
    """Same, over an explicit worker-name list (survives non-contiguous
    worker sets — the form used when a fetcher is drained: pass the
    surviving names and only the drained worker's hosts move)."""
    arr = F.array(*[F.lit(w) for w in workers])
    scores = F.transform(
        arr,
        lambda w: F.struct(
            hrw_score(F.col(key_col), w, salt).alias("score"),
            w.alias("w"),
        ),
    )
    return df.withColumn(out_col, F.array_max(scores)["w"])


def ring_positions(workers: list[str], vnodes: int, salt: str = "ring") -> list[tuple[str, str]]:
    """The consistent-hash ring as a sorted (position, worker) list:
    every worker owns ``vnodes`` pseudo-random ring positions
    md5('salt:worker:v'). Plain data so both the Spark literal array
    and the SQL oracle derive byte-identical rings."""
    import hashlib

    pts = [
        (
            hashlib.md5(f"{salt}:{w}:{v}".encode()).hexdigest(),
            w,
        )
        for w in workers
        for v in range(vnodes)
    ]
    return sorted(pts)


def ring_assign(
    df: DataFrame,
    key_col: str,
    workers: list[str],
    vnodes: int = 8,
    out_col: str = "worker",
    salt: str = "ring",
) -> DataFrame:
    """Consistent-hash ring assignment (Karger et al. STOC'97; the
    Dynamo/Cassandra partitioner): a key belongs to the first ring
    position clockwise from md5('key:' + key), wrapping to the ring
    start. The classic alternative to rendezvous hashing: same minimal
    disruption (removing a worker moves only the keys in ITS arcs, to
    each arc's successor), O(log V) lookup on a ring snapshot instead
    of O(W) scores per key — the trade is vnode count, since arc
    lengths are exponential order statistics and per-worker load
    balances only as ~1/sqrt(vnodes) (the imbalance query quantifies
    exactly that against HRW's native balance).

    The ring is a PLAN-TIME literal array of (position, worker) structs
    — per row one filter + array_min over V elements, pure codegen, no
    shuffle, no UDF; hex md5 strings order identically everywhere so
    the SQL oracle reproduces the argmin bit-for-bit.
    """
    pts = ring_positions(workers, vnodes, salt)
    ring = F.array(
        *[
            F.struct(F.lit(p).alias("pos"), F.lit(w).alias("w"))
            for p, w in pts
        ]
    )
    khash = F.md5(F.concat(F.lit("key:"), F.col(key_col).cast("string")))
    succ = F.filter(ring, lambda s: s["pos"] >= khash)
    first = F.array_min(ring)["w"]
    return df.withColumn(
        out_col,
        F.coalesce(F.array_min(succ)["w"], first),
    )


def dns_refresh_plan(
    hosts: DataFrame,
    current_wave: int,
    wave_seconds: int,
    n_shards: int,
    host_col: str = "host",
    ttl_col: str = "ttl_s",
    resolved_col: str = "resolved_wave",
) -> DataFrame:
    """Batched DNS re-resolution plan for a crawl wave.

    A distributed crawler cannot resolve per fetch (a 10^10-URL wave
    would melt any resolver fleet) — it keeps a host->IP dimension with
    per-record TTLs and re-resolves in BATCHES each wave, sharded across
    resolver workers so no single resolver sees a thundering herd
    (Mercator's DNS-bottleneck lesson: its authors measured DNS, not
    fetching, as the first scaling wall). This computes the wave's plan
    from the host dimension alone: a record is EXPIRED when
    (current_wave - resolved_wave) * wave_seconds >= ttl, due-soon when
    the NEXT wave would expire it (resolve-ahead hides latency — the
    stale-while-revalidate pattern), fresh otherwise. Expired + due-soon
    hosts shard by a keyed md5 hash pmod n_shards — deterministic,
    coordination-free, balanced by hash uniformity (the same reasons the
    HRW assignment above uses a keyed hash), and engine-portable (the
    oracle mirrors the identical digits).

    Returns one row per (shard, status) with host counts plus the
    shard's min/max TTL — the per-resolver work manifest. O(hosts)
    everywhere: the host dimension is millions of rows where the
    frontier is billions; one hash agg, no window, no join.
    """
    age_s = (F.lit(int(current_wave)) - F.col(resolved_col)) * F.lit(
        int(wave_seconds)
    )
    next_age_s = age_s + F.lit(int(wave_seconds))
    status = (
        F.when(age_s >= F.col(ttl_col), F.lit("expired"))
        .when(next_age_s >= F.col(ttl_col), F.lit("due_soon"))
        .otherwise(F.lit("fresh"))
    )
    return (
        hosts.select(
            F.col(host_col).alias("h"),
            F.col(ttl_col).cast("long").alias("ttl"),
            status.alias("status"),
        )
        .withColumn(
            "shard",
            F.when(
                F.col("status") != "fresh",
                F.pmod(
                    F.expr(
                        "cast(conv(substring(md5(concat('dns:', h)), 1, "
                        "15), 16, 10) as bigint)"
                    ),
                    F.lit(int(n_shards)),
                ),
            ).otherwise(F.lit(-1)),  # fresh hosts need no resolver
        )
        .groupBy("shard", "status")
        .agg(
            F.count("*").cast("long").alias("n_hosts"),
            F.min("ttl").alias("min_ttl_s"),
            F.max("ttl").alias("max_ttl_s"),
        )
    )
