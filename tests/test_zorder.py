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
