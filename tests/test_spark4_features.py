"""Spark 4 native features cross-checked against the engine's own
operators: recursive CTE vs the iterative BFS, VARIANT round-trip."""

from pyspark.sql import functions as F


def test_recursive_cte_matches_bfs_distances(spark):
    """The declarative WITH RECURSIVE reachability and the iterative
    bfs_distances operator agree on every (node, min-hops) pair."""
    from crawler_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(0, 2), (1, 3), (2, 4), (3, 4), (4, 5), (5, 2), (7, 8)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(0,), (1,)], "node long")
    want = {
        (r.node, r.dist)
        for r in bfs_distances(
            edges, seeds, max_hops=8, directed=True
        ).collect()
    }
    edges.createOrReplaceTempView("rc_edges")
    got = {
        (r.node, r.dist)
        for r in spark.sql(
            """
            WITH RECURSIVE d(node, dist) AS (
              SELECT CAST(node AS BIGINT), CAST(0 AS BIGINT)
              FROM (VALUES (0), (1)) t(node)
              UNION ALL
              SELECT e.dst, d.dist + 1
              FROM d JOIN rc_edges e ON e.src = d.node
              WHERE d.dist < 8
            )
            SELECT node, min(dist) AS dist FROM d GROUP BY node
            """
        ).collect()
    }
    assert got == want
    assert (7, 0) not in got and all(n != 8 for n, _ in got)  # unreachable


def test_variant_typed_extraction_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "click", 7), (2, "view", 9)], "e long, t string, u long"
    )
    v = df.select(
        F.parse_json(
            F.to_json(
                F.struct("t", F.struct("u", "e").alias("m"))
            )
        ).alias("var")
    )
    got = sorted(
        (r.t, r.u, r.e)
        for r in v.select(
            F.expr("variant_get(var, '$.t', 'string')").alias("t"),
            F.expr("variant_get(var, '$.m.u', 'long')").alias("u"),
            F.expr("variant_get(var, '$.m.e', 'long')").alias("e"),
        ).collect()
    )
    assert got == [("click", 7, 1), ("view", 9, 2)]
    # absent path -> NULL, not an error (the schema-drift tolerance
    # from_json's fixed schema cannot give without a migration)
    missing = v.select(
        F.expr("variant_get(var, '$.nope.deep', 'long')").alias("x")
    ).collect()
    assert all(r.x is None for r in missing)
