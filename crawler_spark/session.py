"""SparkSession factory tuned for this engine.

Local mode for tests/bench; the same settings (AQE, Arrow, shuffle
partitions sized to cores) are what we would ship to a real cluster via
spark-submit --py-files.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app: str = "crawler_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    master defaults to ``local[$SPARK_GRAFT_CPUS]`` (or local[*]).
    """
    defaulted = master is None
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    # Local-mode thread sizing: every Arrow-UDF stage pairs each JVM task
    # thread with a Python worker process. At local[ncpu] that is 2x ncpu
    # runnable processes plus GC/driver threads — measured 3-4x slowdown
    # at exactly ncpu threads (convoying), while ncpu-8 is stable. A real
    # cluster sizes executors with vcore accounting; local mode must
    # leave the headroom manually. Applied ONLY when the master was
    # defaulted (env/None) — an explicitly passed local[N] is honored
    # verbatim — and can be disabled with SPARK_GRAFT_NO_DOWNSIZE=1.
    # Callers that record parallelism must read the effective master from
    # spark.sparkContext.master, not from their own request.
    ncpu = os.cpu_count() or 8
    m = re.fullmatch(r"local\[(\*|\d+)\]", master)
    downsize_ok = defaulted and not os.environ.get("SPARK_GRAFT_NO_DOWNSIZE")
    if m and ncpu >= 16 and downsize_ok:
        n = ncpu if m.group(1) == "*" else int(m.group(1))
        if n >= ncpu:
            master = f"local[{max(4, ncpu - 8)}]"
    nshuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE", DEFAULT_SHUFFLE_PARTITIONS)
    )
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # binary image payloads: keep Arrow batches bounded so a batch of
        # pages never exceeds executor memory at 100TB scale
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # zstd over snappy: ~3.5x faster writes for the incompressible
        # image-bytes payload (measured), and the standard choice at
        # 100TB scale for size; snappy spends CPU for no ratio here
        .config("spark.sql.parquet.compression.codec", "zstd")
        # let Catalyst push supported predicates INTO Python data
        # sources (sources/webds.py prunes unwalked hosts this way);
        # off by default in Spark 4.1, no effect on other plans
        .config("spark.sql.python.filterPushdown.enabled", "true")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
