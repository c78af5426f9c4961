"""SCD2 interval build/lookup edges and the Count-Min join-size
estimator's one-sided error guarantee."""

from pyspark.sql import functions as F

from crawler_spark.operators.enrich import scd2_intervals, scd2_lookup
from crawler_spark.operators.sketches import countmin_join_size


def test_scd2_intervals_and_lookup(spark):
    changes = spark.createDataFrame(
        [("h1", 1, 5.0), ("h1", 4, 2.0), ("h1", 9, 7.0), ("h2", 2, 3.0)],
        "host string, round_id int, delay double",
    )
    dim = scd2_intervals(changes, ["host"], "round_id")
    ivals = {
        (r.host, r.valid_from): (r.valid_to, r.delay)
        for r in dim.collect()
    }
    assert ivals[("h1", 1)] == (3, 5.0)
    assert ivals[("h1", 4)] == (8, 2.0)
    assert ivals[("h1", 9)] == (999999, 7.0)  # open current row
    assert ivals[("h2", 2)] == (999999, 3.0)
    facts = spark.createDataFrame(
        [("h1", 1), ("h1", 3), ("h1", 4), ("h1", 100), ("h2", 1), ("h3", 5)],
        "host string, at int",
    )
    got = {
        (r.host, r.at): r.delay
        for r in scd2_lookup(facts, dim, ["host"], "at").collect()
    }
    assert got[("h1", 1)] == 5.0 and got[("h1", 3)] == 5.0  # boundary incl.
    assert got[("h1", 4)] == 2.0  # change round uses the new value
    assert got[("h1", 100)] == 7.0  # open interval covers the future
    assert got[("h2", 1)] is None  # before first version -> no match
    assert got[("h3", 5)] is None  # unknown key survives (left join)
    # disjoint intervals -> lookup is 1:1 per fact row
    assert scd2_lookup(facts, dim, ["host"], "at").count() == facts.count()


def test_countmin_join_size_one_sided(spark):
    a = spark.createDataFrame(
        [(f"k{i % 13}",) for i in range(300)], "ka string"
    )
    b = spark.createDataFrame(
        [(f"k{i % 7}",) for i in range(150)], "kb string"
    )
    row = countmin_join_size(a, "ka", b, "kb").first()
    exact = sum(
        (300 // 13 + (1 if i < 300 % 13 else 0))
        * (150 // 7 + (1 if i < 150 % 7 else 0))
        for i in range(7)
    )
    assert row.join_size_exact == exact
    # CM collisions only ADD mass: the estimate never undershoots
    assert row.join_size_est >= row.join_size_exact
    # disjoint key spaces: exact is 0 and the sketch should stay tiny
    c = spark.createDataFrame([(f"z{i}",) for i in range(50)], "kc string")
    row2 = countmin_join_size(a, "ka", c, "kc").first()
    assert row2.join_size_exact == 0
    assert row2.join_size_est >= 0


def test_session_window_gap_semantics(spark):
    """Native session_window: adjacent windows MERGE (a gap of exactly
    the window length continues the session; only a strictly larger
    gap breaks it) — the boundary rule the SQL oracle mirrors with
    `> 1800`."""
    rows = [
        (1, "2026-01-01 10:00:00"),
        (1, "2026-01-01 10:29:59"),  # same session (diff < 30 min)
        (1, "2026-01-01 10:59:59"),  # still chained
        (1, "2026-01-01 11:29:59"),  # chained again
        (1, "2026-01-01 12:00:00"),  # diff 30:01 > gap -> new session
        (2, "2026-01-01 10:00:00"),
        (2, "2026-01-01 10:30:00"),  # diff EXACTLY the gap -> adjacent
        #                              windows merge (next <= prev end)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.to_timestamp("ts").alias("ts")
    )
    out = (
        df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    per_user = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r.n)
    assert sorted(per_user[1]) == [1, 4]
    assert sorted(per_user[2]) == [2]
