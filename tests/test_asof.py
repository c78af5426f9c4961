"""As-of join (operators/asof.py): backward-inclusive point-in-time
semantics on a hand-checked timeline, plus the single-shuffle plan
property that justifies the union-and-carry construction."""

from pyspark.sql import functions as F

from crawler_spark.operators.asof import asof_join


def _dfs(spark):
    left = spark.createDataFrame(
        [(1, "u1", 10, 100.0), (2, "u1", 20, 200.0), (3, "u1", 5, 50.0),
         (4, "u2", 15, 150.0), (5, "u3", 30, 300.0)],
        "event_id long, user_id string, ts long, value double",
    )
    right = spark.createDataFrame(
        [("u1", 10, 1.0),   # equal ts -> matches event 1 (inclusive)
         ("u1", 12, 2.0),   # matches event 2 (latest <= 20)
         ("u2", 99, 9.0)],  # after event 4 -> no match
        "user_id string, ts long, value double",
    )
    return left, right


def test_asof_backward_inclusive_semantics(spark):
    left, right = _dfs(spark)
    out = {r.event_id: r for r in asof_join(left, right, on="user_id").collect()}
    assert len(out) == 5
    assert (out[1].asof_ts, out[1].asof_value) == (10, 1.0)   # equal ts matches
    assert (out[2].asof_ts, out[2].asof_value) == (12, 2.0)   # latest prior wins
    assert out[3].asof_ts is None                             # before any right row
    assert out[4].asof_ts is None                             # right row is later
    assert out[5].asof_ts is None                             # key absent from right
    # left columns pass through untouched
    assert out[2].value == 200.0


def test_asof_single_shuffle_plan(spark):
    """The construction must cost one hash Exchange (by key), not a
    per-key range join: count Exchange nodes in the physical plan."""
    left, right = _dfs(spark)
    plan = asof_join(left, right, on="user_id")._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange")
    assert n_exchange <= 2, plan  # one per union branch pre-AQE, never more
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_asof_multiple_value_cols(spark):
    left = spark.createDataFrame([(1, "k", 10)], "id long, k string, ts long")
    right = spark.createDataFrame(
        [("k", 8, 1.5, "a")], "k string, ts long, px double, tag string"
    )
    row = asof_join(left, right, on="k", value_cols=["px", "tag"]).collect()[0]
    assert (row.asof_ts, row.asof_px, row.asof_tag) == (8, 1.5, "a")
