"""Manifest-level file statistics + scan pruning (the Iceberg
data-skipping analog): appends record per-file column (min, max) bounds
from parquet footers; read_where prunes files from the manifest alone and
still returns exactly the filtered rows."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.sources.catalog import SnapshotCatalog


@pytest.fixture()
def cat(spark, tmp_path):
    return SnapshotCatalog(str(tmp_path / "cat"), spark)


def _append_range(cat, table, lo, hi, host):
    df = cat.spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.lit(host).alias("host"),
        (F.col("id") * 2).cast("double").alias("score"),
    )
    cat.stage_append(table, df.coalesce(1))


def test_file_pruning_matches_full_filter(cat):
    # four single-file appends with disjoint k ranges -> a point/range
    # predicate must touch a strict subset of files
    for i, host in enumerate(["a.com", "b.com", "c.com", "d.com"]):
        _append_range(cat, "m", i * 100, (i + 1) * 100, host)
    cat.commit()

    kept, total = cat.plan_scan("m", {"k": (150, 160)})
    assert total == 4 and len(kept) == 1

    got = sorted(r["k"] for r in cat.read_where("m", {"k": (150, 160)}).collect())
    want = sorted(
        r["k"] for r in cat.read("m").filter(F.col("k").between(150, 160)).collect()
    )
    assert got == want == list(range(150, 161))

    # open-ended bounds
    kept, _ = cat.plan_scan("m", {"k": (300, None)})
    assert len(kept) == 1
    kept, _ = cat.plan_scan("m", {"k": (None, 99)})
    assert len(kept) == 1

    # string-column pruning works off footer stats too
    kept, _ = cat.plan_scan("m", {"host": ("c.com", "c.com")})
    assert len(kept) == 1
    assert cat.read_where("m", {"host": ("c.com", "c.com")}).count() == 100

    # conjunctive predicates: contradictory ranges -> zero files, empty
    # df with the table schema
    kept, _ = cat.plan_scan("m", {"k": (0, 50), "host": ("d.com", "d.com")})
    assert kept == []
    empty = cat.read_where("m", {"k": (0, 50), "host": ("d.com", "d.com")})
    assert empty.count() == 0 and set(empty.columns) == {"k", "host", "score"}


def test_pruning_is_superset_safe_without_stats(cat):
    # a column absent from stats (binary) never prunes; unknown columns
    # never prune; files always survive unless provably disjoint
    df = cat.spark.range(10).select(
        F.col("id").alias("k"), F.encode(F.lit("x"), "utf-8").alias("payload")
    )
    cat.stage_append("t", df.coalesce(1))
    cat.commit()
    kept, total = cat.plan_scan("t", {"payload": (b"a", b"z"), "nope": (0, 1)})
    assert len(kept) == total == 1


def test_stats_survive_snapshots_and_overwrite(cat):
    _append_range(cat, "m", 0, 100, "a.com")
    s1 = cat.commit()
    _append_range(cat, "m", 100, 200, "b.com")
    cat.commit()

    # time travel prunes against the OLD manifest
    kept, total = cat.plan_scan("m", {"k": (150, 151)}, snapshot=s1)
    assert total == 1 and kept == []  # range didn't exist at s1
    kept, total = cat.plan_scan("m", {"k": (150, 151)})
    assert total == 2 and len(kept) == 1

    # overwrite drops stale dirs' stats; the rewritten file gets fresh
    # bounds covering everything
    cat.stage_overwrite("m", cat.read("m").coalesce(1))
    cat.commit()
    kept, total = cat.plan_scan("m", {"k": (150, 151)})
    assert total == 1 and len(kept) == 1
    assert cat.read_where("m", {"k": (150, 151)}).count() == 2


def test_compact_preserves_prunability(cat):
    # many small appends -> compact to few files; pruning still sound
    for i in range(6):
        _append_range(cat, "m", i * 10, (i + 1) * 10, "h%d.com" % i)
    cat.commit()
    cat.compact("m", target_bytes=1 << 30)  # everything into one file
    kept, total = cat.plan_scan("m", {"k": (5, 6)})
    assert total == len(kept) == 1
    assert cat.read_where("m", {"k": (5, 6)}).count() == 2
