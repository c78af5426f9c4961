"""Compliance takedown (plans/rounds.takedown_host): stored payloads
for a host vanish from reads via ONE equality-delete key (no data
rewrite), the seen set / frontier keep remembering the URLs (a resumed
crawl must not refetch them), pre-takedown snapshots still time-travel,
compaction materializes, and post-takedown re-appends are not covered
by the old delete (sequence scoping)."""

from pyspark.sql import functions as F

from crawler_spark.plans.rounds import resume_crawl, run_crawl, takedown_host
from crawler_spark.sources.synth import T1_SMOKE

ROUND_S = 8.0


def test_takedown_hides_host_keeps_seen(spark, tmp_path):
    root = str(tmp_path / "cat")
    catalog, history = run_crawl(spark, root, T1_SMOKE, round_seconds=ROUND_S)
    host = "host-1.test"
    pre_snapshot = catalog.current_id()
    n_host = catalog.read("results").filter(F.col("host") == host).count()
    n_all = catalog.read("results").count()
    seen_before = catalog.read("seen").count()
    assert n_host > 0

    out = takedown_host(catalog, host)
    assert out["results"] == n_host

    # reads exclude the host immediately, others untouched
    assert catalog.read("results").filter(F.col("host") == host).count() == 0
    assert catalog.read("results").count() == n_all - n_host
    assert (
        catalog.read("fetch_failures").filter(F.col("host") == host).count()
        == 0
    )
    # seen set untouched: the crawl still remembers every URL
    assert catalog.read("seen").count() == seen_before
    # auditability: the pre-takedown snapshot still shows the rows
    assert (
        catalog.read("results", snapshot=pre_snapshot)
        .filter(F.col("host") == host)
        .count()
        == n_host
    )

    # a resumed crawl does NOT refetch the host (frontier is drained and
    # seen remembers), and the purged rows stay purged
    catalog2, history2 = resume_crawl(
        spark, root, T1_SMOKE, round_seconds=ROUND_S
    )
    assert sum(s["scheduled"] for s in history2) == 0
    assert catalog2.read("results").filter(F.col("host") == host).count() == 0

    # compaction materializes the delete and clears delete files
    catalog2.compact("results", target_bytes=1 << 30)
    assert catalog2.deletes().get("results", []) == []
    assert catalog2.read("results").count() == n_all - n_host
