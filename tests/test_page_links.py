"""Crawl-native link graph (run_round(store_links=True) -> page_links):
the stored edges must be exactly the web's outlinks in document order
(canonicalized), deterministic across runs, and directly consumable by
the rank layer — closing the OPIC loop (crawl -> observed edges ->
link-rank -> host_priorities for the next wave) over edges the crawl
actually saw rather than a derived fixture."""

from pyspark.sql import functions as F

from crawler_spark.functions.canon import normalize_url
from crawler_spark.plans.rounds import run_crawl
from crawler_spark.sources.synth import T1_SMOKE

ROUND_S = 8.0


def _edges(catalog):
    return {
        (r["src_canon"], r["dst_canon"], r["link_seq"])
        for r in catalog.read("page_links").collect()
    }


def test_page_links_match_web_truth_and_determinism(spark, tmp_path):
    cat1, _ = run_crawl(
        spark, str(tmp_path / "a"), T1_SMOKE, round_seconds=ROUND_S,
        store_links=True,
    )
    got = _edges(cat1)
    assert got, "no edges stored"

    # every fetched non-leaf page's stored outlinks == the web's, in
    # document order, canonicalized
    fetched_pages = {
        r["src_canon"]
        for r in cat1.read("page_links").select("src_canon").distinct().collect()
    }
    for src in fetched_pages:
        truth = [
            normalize_url(u) for u in T1_SMOKE.outlinks_raw(src)
        ]
        stored = sorted(
            ((s, d, i) for (s, d, i) in got if s == src), key=lambda t: t[2]
        )
        assert [d for (_, d, _) in stored] == truth, src

    # determinism: an identical crawl stores the identical edge set
    cat2, _ = run_crawl(
        spark, str(tmp_path / "b"), T1_SMOKE, round_seconds=ROUND_S,
        store_links=True,
    )
    assert _edges(cat2) == got


def test_page_links_feed_link_rank(spark, tmp_path):
    from crawler_spark.operators.rank import link_rank

    cat, _ = run_crawl(
        spark, str(tmp_path / "c"), T1_SMOKE, round_seconds=ROUND_S,
        store_links=True,
    )
    host_edges = (
        cat.read("page_links")
        .groupBy(
            F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )
    ranks = link_rank(host_edges).collect()
    assert len(ranks) == 3  # T1_SMOKE has 3 hosts
    assert all(r["rank"] > 0 for r in ranks)
