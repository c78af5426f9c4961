"""Sitemap-protocol parsing + AIMD politeness feedback."""

from pyspark.sql import functions as F

from crawler_spark.operators.politeness import adaptive_budgets
from crawler_spark.sources.sitemap import parse_sitemaps, top_candidates_per_host


def test_parse_sitemap_entries_and_priority_fallback(spark):
    rows = [
        (
            "a.test",
            "<urlset><url><loc>http://a.test/1</loc><priority>0.9</priority></url>"
            "<url><loc>http://a.test/2</loc><priority>0.1</priority></url></urlset>",
        ),
        # one entry missing its <priority>: protocol default 0.5 for IT,
        # the sibling keeps its declared value
        (
            "b.test",
            "<urlset><url><loc>http://b.test/x</loc></url>"
            "<url><loc>http://b.test/y</loc><priority>0.8</priority></url></urlset>",
        ),
    ]
    parsed = parse_sitemaps(spark.createDataFrame(rows, ["host", "xml"]))
    got = {(r["host"], r["loc"]): r["priority"] for r in parsed.collect()}
    assert got[("a.test", "http://a.test/1")] == 0.9
    assert got[("a.test", "http://a.test/2")] == 0.1
    assert got[("b.test", "http://b.test/x")] == 0.5
    assert got[("b.test", "http://b.test/y")] == 0.8


def test_top_candidates_ranking(spark):
    xml = "<urlset>" + "".join(
        f"<url><loc>http://h/{i}</loc><priority>0.{i}</priority></url>"
        for i in range(6)
    ) + "</urlset>"
    parsed = parse_sitemaps(spark.createDataFrame([("h", xml)], ["host", "xml"]))
    top = top_candidates_per_host(parsed, per_host=2).collect()
    assert [(r["loc"], r["rk"]) for r in sorted(top, key=lambda r: r["rk"])] == [
        ("http://h/5", 1),
        ("http://h/4", 2),
    ]


def test_adaptive_budgets_aimd(spark):
    # host bad: 3/6 failures (50% > 20%) -> halved budget, stretched delay
    # host good: 0/4 failures -> +2 budget, base delay
    rows = [("bad", i % 2 == 0) for i in range(6)] + [("good", True)] * 4
    out = adaptive_budgets(
        spark.createDataFrame(rows, ["host", "ok"]), base_budget=8
    ).collect()
    by = {r["host"]: r for r in out}
    assert by["bad"]["next_budget"] == 4 and by["bad"]["n_fail"] == 3
    assert by["bad"]["next_delay_ms"] == 1000 + 4500
    assert by["good"]["next_budget"] == 10 and by["good"]["next_delay_ms"] == 1000


def test_adaptive_budgets_clamps(spark):
    all_fail = spark.createDataFrame([("h", False)] * 3, ["host", "ok"])
    r = adaptive_budgets(all_fail, base_budget=2, min_budget=1).first()
    assert r["next_budget"] == 1  # floor(2/2)=1, clamped at min
    assert r["next_delay_ms"] == 10000  # 1000 * (1 + 9*1.0)


def test_sitemap_seeded_crawl_matches_plain_seeds(spark, tmp_path):
    """Bootstrap parity: a crawl seeded from sitemap XML advertising the
    synth web's seed URLs produces the exact same (round, url) schedule
    and seen set as the same seeds passed as a literal list."""
    from crawler_spark.plans.rounds import run_crawl
    from crawler_spark.sources.sitemap import seeds_from_sitemaps
    from crawler_spark.sources.synth import T1_SMOKE

    web = T1_SMOKE
    plain = web.seeds_raw()
    # one sitemap per host advertising its seeds, priority 0.9 for all
    by_host = {}
    for u in plain:
        host = u.split("/")[2]
        by_host.setdefault(host, []).append(u)
    rows = [
        (
            h,
            "<urlset>"
            + "".join(
                f"<url><loc>{u}</loc><priority>0.9</priority></url>"
                for u in sorted(us)
            )
            + "</urlset>",
        )
        for h, us in by_host.items()
    ]
    sm = spark.createDataFrame(rows, ["host", "xml"])
    seeds = seeds_from_sitemaps(sm, per_host=10)
    assert sorted(seeds) == sorted(plain)

    def schedule(catalog):
        return [
            (r["round_id"], r["url_canon"])
            for r in catalog.read("schedule_log")
            .orderBy("round_id", "priority", "depth", "discovery_seq", "url_hash")
            .select("round_id", "url_canon")
            .collect()
        ]

    # discovery_seq is assigned by seed-list position, so the plain-list
    # crawl must receive the seeds in the same global order the sitemap
    # admission emits (priority all-equal -> loc asc == sorted)
    cat_a, _ = run_crawl(spark, str(tmp_path / "a"), web, round_seconds=8.0,
                         seeds_raw=seeds)
    cat_b, _ = run_crawl(spark, str(tmp_path / "b"), web, round_seconds=8.0,
                         seeds_raw=sorted(plain))
    assert schedule(cat_a) == schedule(cat_b)
    seen = lambda c: {r["url_canon"] for r in c.read("seen").select("url_canon").collect()}
    assert seen(cat_a) == seen(cat_b)


def test_registrable_domain_psl_semantics(spark):
    """eTLD+1 longest-suffix match (functions/domains.py): multi-label
    public suffixes beat their single-label prefixes; a host that IS a
    bare suffix (or has no matching suffix) falls back to itself."""
    from crawler_spark.functions.domains import suffix_dim, with_registrable_domain

    hosts = spark.createDataFrame(
        [
            ("a.b.example.com",),
            ("img1.example.co.uk",),   # 'co.uk' wins over 'uk'
            ("example.co.uk",),
            ("co.uk",),                # bare suffix: fallback
            ("weird.zz",),             # unknown TLD: fallback
        ],
        ["host"],
    )
    out = {
        r["host"]: r["registrable_domain"]
        for r in with_registrable_domain(hosts, suffix_dim(spark)).collect()
    }
    assert out["a.b.example.com"] == "example.com"
    assert out["img1.example.co.uk"] == "example.co.uk"
    assert out["example.co.uk"] == "example.co.uk"
    assert out["co.uk"] == "co.uk"
    assert out["weird.zz"] == "weird.zz"


def test_adaptive_delay_feedback_shrinks_next_round_budget(spark):
    """Closing the AIMD loop: fold adaptive budgets into the robots
    dimension and the next round's politeness gate schedules fewer URLs
    for the failing host — while the robots.txt delay stays a floor the
    feedback can only tighten, never loosen."""
    from crawler_spark.operators.politeness import (
        apply_adaptive_delays,
        politeness_select,
        robots_gate,
    )

    robots = spark.createDataFrame(
        [("h1", [], 1.0), ("h2", [], 1.0)],
        "host string, deny_prefixes array<string>, crawl_delay_s double",
    )
    pending = spark.createDataFrame(
        [
            ("http://%s/p%d" % (h, i), h, 0, 1, i, i * 7 + hash(h) % 100)
            for h in ("h1", "h2")
            for i in range(10)
        ],
        "url_canon string, host string, priority int, depth int, "
        "discovery_seq long, url_hash long",
    )
    # round 1 budget: floor(8 / 1.0) = 8 per host
    allowed, _ = robots_gate(pending, robots, round_seconds=8.0)
    r1 = politeness_select(allowed)
    assert r1.groupBy("host").count().orderBy("host").rdd.map(tuple).collect() == [
        ("h1", 8), ("h2", 8)
    ]

    # h1 failed 3/6 last round -> next_budget 4 -> delay max(1, 8/4) = 2
    outcomes = spark.createDataFrame(
        [("h1", i % 2 == 0) for i in range(6)] + [("h2", True)] * 6, ["host", "ok"]
    )
    robots2 = apply_adaptive_delays(robots, adaptive_budgets(outcomes, base_budget=8), 8.0)
    allowed2, _ = robots_gate(pending, robots2, round_seconds=8.0)
    r2 = politeness_select(allowed2)
    assert r2.groupBy("host").count().orderBy("host").rdd.map(tuple).collect() == [
        ("h1", 4), ("h2", 8)  # h2 healthy: +2 budget but robots floor holds (8/10 < 1.0)
    ]


def test_parse_sitemaps_differential_fuzz(spark):
    """Differential fuzz: 200 seeded random sitemaps (entries with
    shuffled optional tags, whitespace padding, missing loc/priority,
    decoy tags) parsed by the Spark plan must equal a Python `re`
    reference implementing the same per-entry semantics — one batch, one
    comparison."""
    import random
    import re

    rng = random.Random(20260818)
    rows, expected = [], set()
    for s in range(200):
        host = f"h{s}.test"
        parts = []
        for i in range(rng.randint(0, 6)):
            loc = f"http://{host}/p{i}" if rng.random() < 0.85 else None
            prio = round(rng.random(), 1) if rng.random() < 0.7 else None
            inner = []
            if loc is not None:
                inner.append(f"<loc>{loc}</loc>")
            if prio is not None:
                inner.append(f"<priority>{prio}</priority>")
            if rng.random() < 0.4:
                inner.append(f"<lastmod>2026-0{rng.randint(1, 9)}-01</lastmod>")
            rng.shuffle(inner)
            pad = " " * rng.randint(0, 2)
            parts.append(f"<url>{pad}{''.join(inner)}{pad}</url>")
            if loc is not None:
                expected.add((host, loc, prio if prio is not None else 0.5))
        rows.append((host, "<urlset>" + "".join(parts) + "</urlset>"))

    from crawler_spark.sources.sitemap import parse_sitemaps

    got = {
        (r["host"], r["loc"], r["priority"])
        for r in parse_sitemaps(spark.createDataFrame(rows, ["host", "xml"])).collect()
    }
    # python reference uses the same regexes — this guards the Spark
    # plan's explode/extract wiring, not the regex itself
    ref = set()
    for host, xml in rows:
        for entry in re.findall(r"<url>(.*?)</url>", xml):
            m = re.search(r"<loc>([^<]*)</loc>", entry)
            if not m or not m.group(1):
                continue
            p = re.search(r"<priority>([^<]*)</priority>", entry)
            ref.add((host, m.group(1), float(p.group(1)) if p else 0.5))
    assert got == ref == expected
