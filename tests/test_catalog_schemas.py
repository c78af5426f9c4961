"""Manifest-recorded schemas (sources/catalog.py): read() resolves the
scan schema from snapshot metadata — the Iceberg behavior — instead of a
per-read footer-union job. Checks: schemas land in the manifest, schema
evolution (added column -> nulls for old dirs) works from metadata alone,
type conflicts fall back to Spark's footer merge, and delete-dir
equality-column sets resolve without opening the delete files.
"""

import json

from pyspark.sql import functions as F

from crawler_spark.sources.catalog import SnapshotCatalog


def _cat(spark, tmp_path):
    return SnapshotCatalog(str(tmp_path / "cat"), spark)


def test_schemas_recorded_and_carried(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.stage_append("t", spark.range(5).select(F.col("id").alias("a")))
    cat.commit()
    cat.stage_append("t", spark.range(3).select(F.col("id").alias("a")))
    cat.commit()
    rec = cat._schemas()
    dirs = cat.tables()["t"]
    assert len(dirs) == 2 and all(d in rec for d in dirs)
    # carried forward across an unrelated commit
    cat.stage_append("u", spark.range(2).select(F.col("id").alias("b")))
    cat.commit()
    assert all(d in cat._schemas() for d in cat.tables()["t"])
    assert cat.read("t").count() == 8


def test_schema_evolution_from_manifest_only(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.stage_append("t", spark.range(4).select(F.col("id").alias("a")))
    cat.commit()
    cat.stage_append(
        "t",
        spark.range(2).select(
            (F.col("id") + 100).alias("a"), (F.col("id") * 10).alias("extra")
        ),
    )
    cat.commit()
    df = cat.read("t")
    assert set(df.columns) == {"a", "extra"}
    rows = {r.a: r.extra for r in df.collect()}
    assert rows[0] is None and rows[101] == 10  # old dir null-filled
    # merged schema came from the manifest, not footers
    merged = cat._merge_schemas(
        [cat._schemas()[d] for d in cat.tables()["t"]]
    )
    assert merged is not None and set(merged.fieldNames()) == {"a", "extra"}


def test_type_conflict_falls_back_to_footer_merge(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.stage_append("t", spark.range(2).select(F.col("id").alias("a")))
    cat.commit()
    cat.stage_append(
        "t", spark.range(2).select(F.col("id").cast("double").alias("a"))
    )
    cat.commit()
    jsons = [cat._schemas()[d] for d in cat.tables()["t"]]
    assert cat._merge_schemas(jsons) is None  # conflict detected
    # the fallback surfaces Spark's own schema-merge error (footer
    # union refuses long vs double too) instead of silently picking one
    import pytest

    with pytest.raises(Exception, match="CANNOT_MERGE_SCHEMAS"):
        cat.read("t").count()


def test_pre_schema_manifests_still_read(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.stage_append("t", spark.range(4).select(F.col("id").alias("a")))
    sid = cat.commit()
    # simulate a catalog written before schemas existed
    mp = tmp_path / "cat" / "snapshots" / f"{sid}.json"
    man = json.loads(mp.read_text())
    man.pop("schemas")
    mp.write_text(json.dumps(man))
    assert cat.read("t").count() == 4


def test_delete_column_sets_resolved_from_manifest(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.stage_append(
        "t",
        spark.range(10).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("g")
        ),
    )
    cat.commit()
    cat.stage_delete("t", spark.createDataFrame([(1,), (2,)], "k long"))
    cat.stage_delete("t", spark.createDataFrame([(0,)], "g long"))
    cat.commit()
    # both delete dirs carry schemas in the manifest
    del_dirs = cat.deletes()["t"]
    assert len(del_dirs) == 2
    assert all(d in cat._schemas() for d in del_dirs)
    got = sorted(r.k for r in cat.read("t").collect())
    # k in {1,2} removed by the k-delete; k%3==0 removed by the g-delete
    assert got == [4, 5, 7, 8]
