"""Z-order clustering key (functions/zorder.py).

Correct Morton interleave vs a pure-Python reference, and the property
that makes it worth shipping: a z-ordered layout keeps BOTH dimensions'
per-file ranges tight, where a single-column sort leaves the other
dimension spanning its whole domain (i.e. unprunable).
"""

from pyspark.sql import functions as F

from crawler_spark.functions.zorder import zorder_layout, zvalue


def _morton(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_pure_python(spark):
    rows = [(x, y) for x in (0, 1, 5, 255, 4095) for y in (0, 3, 128, 4095)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn("z", zvalue("x", "y", bits=12)).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _morton(x, y, 12), (x, y)
    # interleave is a bijection on the sampled grid
    assert len(set(got.values())) == len(rows)


def test_zorder_layout_keeps_both_dims_tight(spark):
    # a full independent 256x256 grid ((id*7)%256 would make h a pure
    # function of w — sorting by w would then accidentally order h too)
    bits, files = 8, 16
    df = spark.range(256 * 256).select(
        (F.col("id") % 256).cast("int").alias("w"),
        (F.col("id") / 256).cast("int").alias("h"),
    )

    def spreads(frame, col):
        return sorted(
            r.spread
            for r in frame.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg((F.max(col) - F.min(col)).alias("spread"))
            .collect()
        )

    z = zorder_layout(df, "w", "h", n_files=files, bits=bits)
    w_sorted = df.repartitionByRange(files, "w").sortWithinPartitions("w")

    z_h = spreads(z, "h")
    lin_h = spreads(w_sorted, "h")
    # single-column sort leaves h unprunable (spread ~ full domain)…
    assert lin_h[len(lin_h) // 2] >= 200
    # …z-order keeps the median h-spread a fraction of the domain
    assert z_h[len(z_h) // 2] <= 128, z_h
    # and w stays prunable too (both dims tight, not a trade)
    z_w = spreads(z, "w")
    assert z_w[len(z_w) // 2] <= 128, z_w


def test_zorder_compaction_tightens_rowgroup_stats(spark, tmp_path):
    """compact(zorder_by=...) must produce parquet files whose FOOTER
    min/max (what scans actually prune on) are tight on BOTH columns —
    verified from real row-group metadata, not partition contents."""
    import duckdb

    from crawler_spark.sources.catalog import SnapshotCatalog

    cat = SnapshotCatalog(str(tmp_path / "cat"), spark)
    # appends arrive in insertion (w-major) order, as crawl rounds would
    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).cast("int").alias("w"),
        (F.col("id") / 256).cast("int").alias("h"),
    )
    cat.stage_append("imgs", grid)
    cat.commit()
    cat.compact("imgs", target_bytes=1, zorder_by=("w", "h"), zorder_bits=8)

    con = duckdb.connect()
    d = cat.tables()["imgs"][0]
    stats = con.execute(
        f"""
        SELECT path_in_schema,
               avg(stats_max::INT - stats_min::INT) AS avg_spread
        FROM parquet_metadata('{d}/*.parquet')
        WHERE path_in_schema IN ('w', 'h')
        GROUP BY path_in_schema
        """
    ).fetchall()
    spreads = {r[0]: r[1] for r in stats}
    # row counts force multiple row groups; both dims must stay tight
    assert spreads["w"] <= 128, spreads
    assert spreads["h"] <= 128, spreads
    # rows preserved
    assert cat.read("imgs").count() == 256 * 256
