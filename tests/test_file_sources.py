"""Source/sink format breadth beyond parquet/CSV/WARC:

* ORC round trip — Spark ships the ORC reader/writer natively; the
  catalog stays parquet, but an engine claiming source coverage must
  ingest the other mainstream columnar format losslessly.
* binaryFile ingestion — `spark.read.format("binaryFile")` is how a
  directory of scraped image files enters the engine WITHOUT a custom
  reader: path/length/content columns, then the normal decode pipeline
  (operators/multimodal.decode_stats) runs on `content` exactly as it
  does on crawl-fetched bytes. Proves the image pipeline is
  source-agnostic.
"""

import os

import numpy as np
from pyspark.sql import functions as F

from crawler_spark.functions.codecs import png_encode
from crawler_spark.operators.multimodal import decode_stats


def test_orc_round_trip(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"u{i}", float(i) / 3.0, i % 2 == 0) for i in range(500)],
        "id long, name string, score double, flag boolean",
    )
    p = str(tmp_path / "events_orc")
    df.write.mode("overwrite").orc(p)
    back = spark.read.orc(p)
    assert back.schema == df.schema
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
    # predicate pushdown reaches the ORC scan (PushedFilters in plan)
    plan = back.filter(F.col("id") > 400)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(id,400)" in plan


def test_binaryfile_ingests_images_into_decode_pipeline(spark, tmp_path):
    d = tmp_path / "imgs"
    os.makedirs(d)
    sizes = {}
    for i in range(6):
        rng = np.random.default_rng(i)
        w, h = 16 + 4 * i, 12 + 2 * i
        px = rng.integers(0, 255, size=(h, w), dtype=np.uint8)
        (d / f"img-{i}.png").write_bytes(png_encode(px))
        sizes[f"img-{i}"] = (w, h)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(str(d))
    )
    assert set(files.columns) == {"path", "modificationTime", "length", "content"}
    images = files.select(
        F.regexp_extract("path", r"(img-\d+)\.png$", 1).alias("image_id"),
        F.col("content").alias("bytes"),
        F.lit("png").alias("fmt"),
    )
    got = {r["image_id"]: (r["w"], r["h"]) for r in decode_stats(images).collect()}
    assert got == sizes
