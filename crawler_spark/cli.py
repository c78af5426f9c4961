"""User-facing CLI — the reference's ``main.py`` entry points, re-homed.

The reference drives everything through ``python main.py --mode X``
(reference: main.py:254-265 argparse, :342-359 dispatch):

  full_crawl     -> crawl_all_regions            (main.py:64-146)
  single_region  -> targeted crawl w/ early exit (main.py:324-340)
  stats          -> show_database_stats          (main.py:223-249, §3.3)
  map_test       -> enrichment pipeline on 4 fixture rows (main.py:25-61)

This module gives a reference user the same verbs over the Spark
engine::

  python -m crawler_spark.cli --mode full_crawl --workdir /tmp/crawl
  python -m crawler_spark.cli --mode single_region --target host-2 \
      --workdir /tmp/crawl2
  python -m crawler_spark.cli --mode resume --workdir /tmp/crawl
  python -m crawler_spark.cli --mode stats --workdir /tmp/crawl
  python -m crawler_spark.cli --mode map_test

``resume`` has no reference flag (the reference restarts its callable
and re-reads crawling_state, base_crawler.py:151-160,232-284); here it
is explicit because snapshot resume is a first-class engine feature.

Crawls run over the deterministic synthetic webs (sources/synth.py) —
the same fixtures the oracle suite proves exact — selected with
``--web``; a real deployment swaps the fetcher, not the loop.
"""

from __future__ import annotations

import argparse
import json
import sys


WEBS = {
    "t1": "T1_SMOKE",
    "t2": "T2_CORRECTNESS",
    "t3": "T3_DEEP",
    "t4": "T4_FLAKY",
    "t5": "T5_TRAP",
    "bench": "BENCH",
}


def _spark():
    from crawler_spark.session import get_spark

    return get_spark(app="crawler_spark_cli")


def _web(name: str):
    from crawler_spark.sources import synth

    return getattr(synth, WEBS[name])


def _print_history(history: list[dict]) -> None:
    for st in history:
        print(json.dumps(st))
    total = {
        "rounds": len(history),
        "scheduled": sum(s.get("scheduled", 0) for s in history),
        "results": sum(s.get("results", 0) for s in history),
        "failed": sum(s.get("failed", 0) for s in history),
        "denied": sum(s.get("denied", 0) for s in history),
        "new_links": sum(s.get("new_links", 0) for s in history),
    }
    # the reference's end-of-run crawling_stats print (main.py:116-129)
    print("TOTAL " + json.dumps(total))


def cmd_crawl(args, target: str | None = None) -> int:
    from crawler_spark.plans.rounds import run_crawl

    spark = _spark()
    _, history = run_crawl(
        spark,
        args.workdir,
        _web(args.web),
        max_rounds=args.rounds,
        round_seconds=args.round_seconds,
        adaptive=args.adaptive,
        target_host_contains=target,
        stop_on_caption_contains=args.stop_on,
        trap_max_seg_repeat=args.trap_gate,
    )
    _print_history(history)
    return 0


def cmd_resume(args) -> int:
    from crawler_spark.plans.rounds import resume_crawl

    spark = _spark()
    _, history = resume_crawl(
        spark,
        args.workdir,
        _web(args.web),
        max_rounds=args.rounds,
        round_seconds=args.round_seconds,
        adaptive=args.adaptive,
        trap_max_seg_repeat=args.trap_gate,
    )
    _print_history(history)
    return 0


def cmd_stats(args) -> int:
    """The §3.3 pure query path (reference: database.py:166-204):
    scalar count (A1), filtered count (A2), group-by (A3/A4), derived
    ratio (A5) — over the crawl's own tables in ``--workdir``."""
    from pyspark.sql import functions as F

    from crawler_spark.sources.catalog import SnapshotCatalog

    spark = _spark()
    cat = SnapshotCatalog(args.workdir, spark)
    results = cat.read("results")
    n_results = results.count()  # A1
    n_fail = (
        cat.read("fetch_failures").count() if cat.exists("fetch_failures") else 0
    )  # A2 analog: rows that never made it
    per_host = (  # A3/A4: group-by over the joined dimension (host)
        results.groupBy("host")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "host")
        .limit(10)
    )
    denom = n_results + n_fail
    out = {
        "results": n_results,
        "failures": n_fail,
        "success_rate_pct": round(100.0 * n_results / denom, 2) if denom else 0.0,  # A5
        "snapshot": cat.current_id(),
        "top_hosts": {r["host"]: r["n"] for r in per_host.collect()},
    }
    print(json.dumps(out, indent=2))
    return 0


def cmd_takedown(args) -> int:
    """Compliance takedown: hide every stored payload from --target via
    one merge-on-read equality delete (plans/rounds.takedown_host) —
    the seen set keeps remembering the URLs so a resume never refetches
    them."""
    from crawler_spark.plans.rounds import takedown_host
    from crawler_spark.sources.catalog import SnapshotCatalog

    spark = _spark()
    out = takedown_host(SnapshotCatalog(args.workdir, spark), args.target)
    print(json.dumps(out))
    return 0


def cmd_map_test(args) -> int:
    """The reference's map_test mode (main.py:25-61): run the
    enrichment pipeline standalone on 4 fixture rows — primary dim hit,
    secondary-fallback hit, two-tier alias resolution, and a full miss."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.enrich import fallback_join

    spark = _spark()
    base = spark.createDataFrame(
        [(1, "host-0.test"), (2, "host-1.test"), (3, "HOST-0"), (4, "nowhere.test")],
        "row_id int, host string",
    )
    primary = spark.createDataFrame(
        [("host-0.test", 37.5, 127.0)], "host string, lat double, lon double"
    )
    secondary = spark.createDataFrame(
        [("host-1.test", 35.1, 129.0), ("HOST-0", 37.5, 127.0)],
        "host string, lat double, lon double",
    )
    out = fallback_join(base, primary, secondary, "host", ["lat", "lon"]).orderBy(
        "row_id"
    )
    for r in out.collect():
        print(json.dumps(r.asDict()))
    n_found = out.filter(F.col("lat").isNotNull()).count()
    print(f"TOTAL found={n_found}/4")
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="crawler_spark.cli", description=__doc__)
    ap.add_argument(
        "--mode",
        required=True,
        choices=[
            "full_crawl", "single_region", "resume", "stats", "map_test",
            "takedown",
        ],
    )
    ap.add_argument("--workdir", help="catalog root (crawl state lives here)")
    ap.add_argument("--web", default="t2", choices=sorted(WEBS))
    ap.add_argument("--rounds", type=int, default=32)
    ap.add_argument("--round-seconds", type=float, default=16.0)
    ap.add_argument("--adaptive", action="store_true")
    ap.add_argument(
        "--trap-gate", type=int, default=None, metavar="K",
        help="drop frontier URLs whose path repeats a segment >= K times",
    )
    ap.add_argument(
        "--target", help="substring host filter (reference single_region F9)"
    )
    ap.add_argument(
        "--stop-on",
        help="stop the crawl once a result caption contains this "
        "(reference stop-on-found early exit)",
    )
    args = ap.parse_args(argv)

    if args.mode != "map_test" and not args.workdir:
        ap.error(f"--mode {args.mode} requires --workdir")
    if args.mode in ("single_region", "takedown") and not args.target:
        ap.error(f"--mode {args.mode} requires --target")

    if args.mode == "full_crawl":
        return cmd_crawl(args)
    if args.mode == "single_region":
        return cmd_crawl(args, target=args.target)
    if args.mode == "resume":
        return cmd_resume(args)
    if args.mode == "stats":
        return cmd_stats(args)
    if args.mode == "takedown":
        return cmd_takedown(args)
    return cmd_map_test(args)


if __name__ == "__main__":
    sys.exit(main())
