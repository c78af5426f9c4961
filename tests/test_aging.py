"""Starvation-free priority aging (run_round aging_every): the engine
matches the aging oracle exactly, and aging genuinely changes the
schedule under host priorities without changing coverage."""

from crawler_spark.plans.oracle import OracleCrawler
from crawler_spark.plans.rounds import run_crawl
from crawler_spark.sources.synth import T1_SMOKE

ROUND_S = 8.0
PR = {"host-0.test": 2, "host-1.test": 1}


def _engine_schedule(catalog):
    rows = (
        catalog.read("schedule_log")
        .orderBy("round_id", "eff_priority", "depth", "discovery_seq", "url_hash")
        .select("round_id", "url_canon")
        .collect()
    )
    return [(r["round_id"], r["url_canon"]) for r in rows]


def test_aging_crawl_matches_oracle_exactly(spark, tmp_path):
    catalog, _ = run_crawl(
        spark, str(tmp_path / "age"), T1_SMOKE, round_seconds=ROUND_S,
        host_priorities=PR, aging_every=2,
    )
    oracle = OracleCrawler(
        T1_SMOKE, round_seconds=ROUND_S, host_priorities=PR, aging_every=2
    )
    oracle.run()
    assert _engine_schedule(catalog) == oracle.schedule
    engine_seen = {
        r["url_canon"] for r in catalog.read("seen").select("url_canon").collect()
    }
    assert engine_seen == oracle.seen


def test_aging_reorders_without_changing_coverage(spark):
    aged = OracleCrawler(
        T1_SMOKE, round_seconds=ROUND_S, host_priorities=PR, aging_every=2
    )
    aged.run()
    static = OracleCrawler(T1_SMOKE, round_seconds=ROUND_S, host_priorities=PR)
    static.run()
    assert aged.schedule != static.schedule  # aging took effect
    assert aged.seen == static.seen          # ...without changing coverage
    # the starved host's first fetch happens no later under aging
    first_aged = next(r for r, u in aged.schedule if "host-0.test" in u)
    first_static = next(r for r, u in static.schedule if "host-0.test" in u)
    assert first_aged <= first_static
