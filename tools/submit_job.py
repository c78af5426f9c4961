"""Cluster-entry job for the packaging check: run a full synthetic crawl
and print one JSON line of round stats.

Shipped to executors via ``spark-submit --py-files crawler_spark.zip``
(see tools/submit_check.py) — the exact deployment shape the engine uses
on a real multi-executor cluster; only the master URL changes.
"""

from __future__ import annotations

import json
import sys
import tempfile

from pyspark.sql import SparkSession


def main():
    # spark-submit provides the session config (master, --py-files); the
    # job itself is cluster-agnostic
    spark = SparkSession.builder.appName("crawler_spark_submit_check").getOrCreate()
    from crawler_spark.plans.rounds import run_crawl
    from crawler_spark.sources.synth import T1_SMOKE

    with tempfile.TemporaryDirectory() as td:
        catalog, history = run_crawl(spark, td, T1_SMOKE, round_seconds=8.0)
        n_results = catalog.read("results").count()
    print(
        json.dumps(
            {
                "rounds": len(history),
                "scheduled_total": sum(h["scheduled"] for h in history),
                "results": n_results,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
