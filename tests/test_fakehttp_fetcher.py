"""The pluggable-fetcher seam (round-3 VERDICT item 6): inject an
HTTP-shaped fake fetcher (status codes, 3xx chains, per-attempt
timeouts, robots denials — all data-driven, no network) through
``make_fetch_parse`` and prove the FULL crawl gate against the
sequential oracle: exact schedule order, seen set, results, failures.
Plus: the batch pointer-doubling resolver ``resolve_redirects`` must
agree with the client-side chain chase on every 3xx edge, including
loops."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.functions.canon import normalize_url
from crawler_spark.operators.graph import resolve_redirects
from crawler_spark.plans.oracle import OracleCrawler
from crawler_spark.plans.rounds import run_crawl
from crawler_spark.sources.fakehttp import FakeHttpWeb, HttpResponse

ROUND_S = 8.0

A = "http://a.example"
B = "http://b.example"


def _site() -> FakeHttpWeb:
    """Two hosts; exercises every protocol path at once:
    2-hop 301/302 chain to an image, a redirect loop, a dead link
    (404), a 503 page (terminal after retry budget), a
    timeout-once-then-200 image (T3 retry success), a robots-denied
    subtree, and a cross-host duplicate discovery."""
    r = {
        f"{A}/": HttpResponse(links=(
            f"{A}/page1",
            f"{A}/r1",            # -> 301 -> 302 -> /c (HTML)
            f"{A}/gone",          # 404
            f"{A}/flaky",         # image, times out on attempt 1
            f"{A}/private/secret",  # robots-denied
            f"{A}/loop1",         # 301 loop
        )),
        f"{A}/page1": HttpResponse(links=(
            f"{A}/img/p1", f"{A}/r2",
        )),
        f"{A}/r1": HttpResponse(status=301, location=f"{A}/r2"),
        f"{A}/r2": HttpResponse(status=302, location=f"{A}/c"),
        f"{A}/c": HttpResponse(links=(f"{A}/img/c1",)),
        f"{A}/img/p1": HttpResponse(payload_seed=101),
        f"{A}/img/c1": HttpResponse(payload_seed=102),
        f"{A}/flaky": HttpResponse(payload_seed=103, fail_attempts=1),
        f"{A}/gone": HttpResponse(status=404),
        f"{A}/private/secret": HttpResponse(links=()),
        f"{A}/loop1": HttpResponse(status=301, location=f"{A}/loop2"),
        f"{A}/loop2": HttpResponse(status=301, location=f"{A}/loop1"),
        f"{B}/": HttpResponse(links=(
            f"{B}/img/b1",
            f"{A}/page1",         # cross-host duplicate discovery
            f"{B}/err",           # 503 every attempt -> terminal failure
            f"{B}/nowhere",       # dead link (absent from the table)
        )),
        f"{B}/img/b1": HttpResponse(payload_seed=201),
        f"{B}/err": HttpResponse(status=503),
    }
    robots = (
        {"host": "a.example", "deny_prefixes": ["/private"],
         "crawl_delay_s": 4.0},
        {"host": "b.example", "deny_prefixes": [], "crawl_delay_s": 2.0},
    )
    # messy seed forms: canonicalization must collapse them
    return FakeHttpWeb(
        responses=r,
        seeds=(f"{A}/", "HTTP://B.EXAMPLE"),
        robots=robots,
    )


def test_fakehttp_crawl_matches_oracle_exactly(spark, tmp_path):
    web = _site()
    catalog, history = run_crawl(
        spark, str(tmp_path / "cat"), web, round_seconds=ROUND_S,
        use_bloom=True, max_attempts=2,
    )
    oracle = OracleCrawler(web, round_seconds=ROUND_S, max_attempts=2)
    oracle.run()

    sched = [
        (r["round_id"], r["url_canon"])
        for r in catalog.read("schedule_log")
        .orderBy("round_id", "eff_priority", "depth", "discovery_seq",
                 "url_hash")
        .select("round_id", "url_canon")
        .collect()
    ]
    assert sched == oracle.schedule
    # the retry actually happened: /flaky appears twice in the schedule
    flaky = normalize_url(f"{A}/flaky")
    assert [u for _, u in sched].count(flaky) == 2

    assert {
        r["url_canon"] for r in catalog.read("seen").collect()
    } == oracle.seen
    assert {
        r["url_canon"] for r in catalog.read("results").collect()
    } == set(oracle.results)
    # /flaky succeeded on attempt 2 -> a result, not a failure
    assert flaky in set(oracle.results)

    fails = {
        r["url_canon"]: r["error_reason"]
        for r in catalog.read("fetch_failures").collect()
    }
    assert fails == dict(oracle.failures)
    # every protocol failure mode surfaced with its HTTP-shaped reason
    assert fails[normalize_url(f"{A}/gone")] == "http_404"
    assert fails[normalize_url(f"{A}/loop1")] == "redirect_loop"
    assert fails[normalize_url(f"{B}/err")] == "http_503"
    assert fails[normalize_url(f"{B}/nowhere")] == "http_404"

    # robots gate: the denied URL never scheduled, logged as denied
    denied = {
        r["url_canon"]
        for r in catalog.read("frontier_updates")
        .filter(F.col("status") == "denied")
        .collect()
    }
    assert normalize_url(f"{A}/private/secret") in denied
    assert normalize_url(f"{A}/private/secret") not in {u for _, u in sched}

    # the 3xx chain entry /r1 was fetched and surfaced the TERMINAL
    # page's outlinks: /img/c1 was discovered and crawled as a result
    assert normalize_url(f"{A}/img/c1") in set(oracle.results)


def test_resolve_redirects_agrees_with_client_chase(spark):
    web = _site()
    edges = spark.createDataFrame(
        web.redirect_edges(), "src string, dst string"
    )
    got = {
        r["src"]: (r["final"], r["n_hops"], r["resolved"])
        for r in resolve_redirects(edges, max_hops=8).collect()
    }
    assert len(got) == 4  # r1, r2, loop1, loop2
    # 2-hop chain: r1 -> r2 -> c ; 1-hop: r2 -> c
    assert got[normalize_url(f"{A}/r1")] == (normalize_url(f"{A}/c"), 2, True)
    assert got[normalize_url(f"{A}/r2")] == (normalize_url(f"{A}/c"), 1, True)
    # the loop is unresolved for the batch resolver AND a fetch error
    # for the client-side chase — the two views must agree edge by edge
    for src, (final, _, ok) in got.items():
        cfinal, cerr = web._resolve(src)
        if ok:
            assert cerr is None and cfinal == final, src
        else:
            assert cerr == "redirect_loop", src
    assert not got[normalize_url(f"{A}/loop1")][2]
    assert not got[normalize_url(f"{A}/loop2")][2]


def test_fakehttp_payload_row_invariants(spark):
    """input_hint per-row invariant on the injected fetcher's results:
    decode(bytes) round-trips (PSNR >= 40 dB for the lossy codec) and
    the caption matches the page identity."""
    import numpy as np

    from crawler_spark.functions.codecs import decode, psnr

    web = _site()
    for url in (f"{A}/img/p1", f"{A}/flaky", f"{B}/img/b1"):
        u = normalize_url(url)
        p = web.payload(u)
        px = decode(p["bytes"], p["fmt"])
        assert px.shape == (p["h"], p["w"])
        truth = web.pixels(u)
        if p["fmt"] == "png":
            assert np.array_equal(px, truth)
        else:
            assert psnr(px, truth) >= 40.0
        assert p["caption"].startswith("caption " + p["image_id"])
    # a redirect to an image serves the TARGET's payload (duplicate
    # content under two URLs — what image-dedup downstream catches)
    web2 = FakeHttpWeb(
        responses={
            f"{A}/shortcut": HttpResponse(status=301,
                                          location=f"{A}/img/p1"),
            f"{A}/img/p1": HttpResponse(payload_seed=101),
        },
        seeds=(f"{A}/shortcut",),
        robots=({"host": "a.example", "deny_prefixes": [],
                 "crawl_delay_s": 1.0},),
    )
    assert web2.is_leaf(normalize_url(f"{A}/shortcut"))
    assert (
        web2.payload(normalize_url(f"{A}/shortcut"))["image_id"]
        == web2.payload(normalize_url(f"{A}/img/p1"))["image_id"]
    )
