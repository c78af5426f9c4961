"""S12/K6: CSV source and sink with explicit schemas (never inferred),
round-tripped (reference: src/utils/csv_handler.py:129-173)."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_csv_roundtrip(spark, tmp_path):
    src = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("event_id", "event_type", F.round("value", 6).alias("value"))
        .limit(500)
    )
    out = str(tmp_path / "events_csv")
    src.write.mode("overwrite").option("header", "true").csv(out)

    back = spark.read.schema(SCHEMA).option("header", "true").csv(out)
    assert back.schema == SCHEMA  # explicit schema, no inference
    assert back.count() == src.count()
    a = {r["event_id"]: (r["event_type"], r["value"]) for r in src.collect()}
    b = {r["event_id"]: (r["event_type"], r["value"]) for r in back.collect()}
    assert a == b
