"""Hilbert curve key (functions/zorder.py hvalue) vs the textbook
rot()-based recursion, plus the continuity property Z-order lacks."""

from pyspark.sql import functions as F

from crawler_spark.functions.zorder import hilbert_layout, hvalue, zvalue


def _xy2d(bits: int, x: int, y: int) -> int:
    """Classic coordinate-mutating Hilbert xy->d (masking variant)."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) else 0
        ry = 1 if (y & s) else 0
        d += s * s * ((3 * rx) ^ ry)
        x &= s - 1
        y &= s - 1
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hvalue_matches_recursion_full_grid(spark):
    bits = 5  # full 32x32 grid, every cell
    n = 1 << bits
    df = spark.range(n * n).select(
        (F.col("id") % n).cast("int").alias("x"),
        (F.col("id") / n).cast("int").alias("y"),
    )
    got = {
        (r.x, r.y): r.hk
        for r in df.withColumn("hk", hvalue("x", "y", bits=bits)).collect()
    }
    for (x, y), hk in got.items():
        assert hk == _xy2d(bits, x, y), (x, y)
    # bijection onto 0..n*n-1
    assert sorted(got.values()) == list(range(n * n))


def test_hilbert_is_continuous_zorder_is_not(spark):
    """THE property that buys tighter file boxes: consecutive Hilbert
    keys are always grid neighbors (Manhattan distance 1); consecutive
    Morton keys jump across seams."""
    bits = 4
    n = 1 << bits
    pts = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(pts, "x int, y int")
    rows = df.select(
        "x", "y",
        hvalue("x", "y", bits=bits).alias("hk"),
        zvalue("x", "y", bits=bits).alias("zk"),
    ).collect()
    by_h = sorted(rows, key=lambda r: r.hk)
    h_steps = [
        abs(a.x - b.x) + abs(a.y - b.y) for a, b in zip(by_h, by_h[1:])
    ]
    assert all(s == 1 for s in h_steps)
    by_z = sorted(rows, key=lambda r: r.zk)
    z_steps = [
        abs(a.x - b.x) + abs(a.y - b.y) for a, b in zip(by_z, by_z[1:])
    ]
    assert max(z_steps) > 1  # Morton seam jumps exist


def test_hilbert_layout_tightens_file_boxes(spark):
    """Per-split bounding-box half-perimeter under hilbert_layout must
    beat a single-column sort and be <= the Z-order layout's (equality
    allowed split-by-split; strictly better in total on a square grid)."""
    from crawler_spark.functions.zorder import zorder_layout

    bits, files = 5, 8
    n = 1 << bits
    df = spark.range(n * n).select(
        (F.col("id") % n).cast("int").alias("x"),
        (F.col("id") / n).cast("int").alias("y"),
    )

    def total_halfperim(layout):
        stats = (
            layout.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(
                (F.max("x") - F.min("x")) + (F.max("y") - F.min("y"))
            )
            .collect()
        )
        return sum(r[1] for r in stats)

    hp_h = total_halfperim(hilbert_layout(df, "x", "y", files, bits))
    hp_z = total_halfperim(zorder_layout(df, "x", "y", files, bits))
    hp_x = total_halfperim(
        df.repartitionByRange(files, "x").sortWithinPartitions("x")
    )
    assert hp_h <= hp_z
    assert hp_h < hp_x


def test_catalog_compact_hilbert_layout(spark, tmp_path):
    """compact(layout='hilbert') rewrites atomically, preserves rows and
    time travel, and the rewritten files carry tight 2-D boxes."""
    from pyspark.sql import functions as F

    from crawler_spark.sources.catalog import SnapshotCatalog

    cat = SnapshotCatalog(str(tmp_path / "cat"), spark)
    n = 1 << 10
    df = spark.range(n).select(
        F.col("id").alias("rid"),
        (F.col("id") % 32).cast("int").alias("x"),
        (F.col("id") / 32).cast("int").alias("y"),
    )
    cat.stage_append("pts", df.repartition(8))
    s1 = cat.commit()
    s2 = cat.compact(
        "pts", target_bytes=4 << 10, zorder_by=("x", "y"), zorder_bits=5,
        layout="hilbert",
    )
    assert s2 > s1
    out = cat.read("pts")
    assert out.count() == n
    assert out.agg(F.sum("rid")).first()[0] == n * (n - 1) // 2
    # time travel still shows the pre-compaction snapshot
    assert cat.read("pts", snapshot=s1).count() == n
