"""Bucketed co-located join evidence (SCALE.md §URL-seen cluster swap).

The snapshot catalog's parquet tables hash-shuffle on every anti-join;
on a real cluster the seen table is bucketed by url_hash so the join is
co-located. Spark's bucketing metadata lives in the session catalog
(saveAsTable), so this is exercised here as a standalone proof: two
tables bucketed by the join key must join with ZERO Exchange operators
in the physical plan.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    for t in ("t_seen_b", "t_new_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    seen = spark.range(0, 10000).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
        F.col("id").alias("seen_round"),
    )
    new = spark.range(5000, 15000).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
        F.concat(F.lit("http://h/"), F.col("id")).alias("url_canon"),
    )
    seen.write.bucketBy(8, "url_hash").sortBy("url_hash").mode(
        "overwrite"
    ).saveAsTable("t_seen_b")
    new.write.bucketBy(8, "url_hash").sortBy("url_hash").mode(
        "overwrite"
    ).saveAsTable("t_new_b")
    yield spark.table("t_new_b"), spark.table("t_seen_b")
    for t in ("t_seen_b", "t_new_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_anti_join_is_shuffle_free(spark, bucketed):
    new, seen = bucketed
    unseen = new.join(seen, "url_hash", "left_anti")
    plan = unseen._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # co-located: no shuffle either side
    # and it is still CORRECT: ids 10000..14999 survive
    assert unseen.count() == 5000


def test_unbucketed_same_join_shuffles(spark, bucketed):
    """Control: the same data read as plain DataFrames must show the
    Exchange the bucketed layout eliminates."""
    new, seen = bucketed
    plain_new = spark.createDataFrame(new.collect(), new.schema)
    plain_seen = spark.createDataFrame(seen.collect(), seen.schema)
    plan = (
        plain_new.join(plain_seen, "url_hash", "left_anti")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" in plan
