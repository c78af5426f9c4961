"""Mid-crawl robots.txt refresh (T5 gating-state dynamics): the engine
re-reads the robots dimension from the catalog every round, so a rule
change between rounds must gate the NEXT round exactly like a sequential
crawler that re-fetched robots.txt — proven by exact schedule + denied
match against the oracle with the same rule change applied at the same
round boundary."""

from pyspark.sql import functions as F

from crawler_spark.plans.oracle import OracleCrawler
from crawler_spark.plans.rounds import ROBOTS_SCHEMA, init_crawl, run_round
from crawler_spark.sources.catalog import SnapshotCatalog
from crawler_spark.sources.synth import T2_CORRECTNESS

ROUND_S = 8.0
ORDER = ["priority", "depth", "discovery_seq", "url_hash"]


def _schedule_dense_rounds(catalog):
    """Engine (round, url) schedule with round ids densified: the
    robots-refresh commit consumes a snapshot id, so engine round ids
    skip one relative to the oracle's 1..n counter."""
    rows = (
        catalog.read("schedule_log")
        .orderBy("round_id", *ORDER)
        .select("round_id", "url_canon")
        .collect()
    )
    ids = sorted({r["round_id"] for r in rows})
    dense = {rid: i + 1 for i, rid in enumerate(ids)}
    return [(dense[r["round_id"]], r["url_canon"]) for r in rows]


def test_mid_crawl_robots_refresh_matches_oracle(spark, tmp_path):
    web = T2_CORRECTNESS
    catalog = SnapshotCatalog(str(tmp_path / "cat"), spark)
    init_crawl(catalog, web)
    oracle = OracleCrawler(web, round_seconds=ROUND_S)

    # round 1 under the original rules
    run_round(catalog, web, round_seconds=ROUND_S)
    oracle.run_round(1)

    # robots refresh between rounds: one host goes fully denied, another
    # slows to crawl_delay 4 (budget floor(8/4) = 2)
    rows = [dict(r) for r in web.robots_rows()]
    host_deny, host_slow = rows[0]["host"], rows[1]["host"]
    for r in rows:
        if r["host"] == host_deny:
            r["deny_prefixes"] = ["/"]
        if r["host"] == host_slow:
            r["crawl_delay_s"] = 4.0
    catalog.stage_overwrite(
        "robots", spark.createDataFrame(rows, schema=ROBOTS_SCHEMA)
    )
    catalog.commit()
    oracle.robots = {r["host"]: r for r in rows}

    for rid in range(2, 24):
        stats = run_round(catalog, web, round_seconds=ROUND_S)
        took = oracle.run_round(rid)
        assert (stats["scheduled"] == 0) == (took == 0)
        if took == 0:
            break

    assert _schedule_dense_rounds(catalog) == oracle.schedule

    # the denied set matches, and the refresh actually bit after round 1
    engine_denied = {
        r["url_canon"]
        for r in catalog.read("frontier_updates")
        .filter(F.col("status") == "denied")
        .select("url_canon")
        .collect()
    }
    assert engine_denied == set(oracle.denied)
    assert any(host_deny in u for u in oracle.denied)

    # nothing for the denied host was scheduled after the refresh
    post = [u for rnd, u in oracle.schedule if rnd >= 2]
    assert all(host_deny not in u for u in post)
