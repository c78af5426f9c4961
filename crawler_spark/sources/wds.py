"""WebDataset-style tar shard sink + source for image+caption pairs.

WebDataset (tar archives of `{key}.img / {key}.txt / {key}.json`
members, public convention of the webdataset/img2dataset ecosystem) is
the de-facto delivery format for image+caption training corpora — the
natural final hop for this engine's results table. The sink here is
Spark-first:

* **one tar per shard via groupBy(shard_id).applyInPandas** — a shard
  is the unit of sequential-read I/O downstream, so it is also the unit
  of parallel write here; shard size is bounded by the caller's shard
  assignment (pair_shards / training_shards produce exactly that), so
  the per-task pandas frame is bounded too.
* **byte-deterministic tars** — fixed mtime/uid/gid, USTAR format,
  members emitted in sorted key order: the same rows produce the same
  sha256 whatever the partitioning or task order (proven in
  test_wds). Determinism is what makes shard checksums meaningful
  (shard_checksums query) and re-runs idempotent.
* **two-phase commit** — tasks write under `_temporary/` with unique
  names and report back; the DRIVER publishes each shard with one
  rename and then writes `_MANIFEST.json` atomically (same protocol as
  the warcsink DataSource). A speculative or failed task's file is
  never listed; a crash before manifest = nothing published.

The reader walks the manifest, one task per shard, and re-emits the
original rows — the round trip is exact.

Reference parity: the reference's terminal sink is one MySQL INSERT per
store (src/database.py:138-164); this is the bulk-artifact analog the
survey's K-series maps to at corpus scale.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import tarfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SHARD_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.IntegerType()),
        T.StructField("path", T.StringType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)

PAIR_SCHEMA = (
    "sample_id string, bytes binary, fmt string, caption string, shard_id int"
)


def _tar_bytes(pdf) -> tuple[bytes, int]:
    """Deterministic tar of one shard's rows: sorted by key, zeroed
    metadata — identical bytes for identical rows on any engine."""
    pdf = pdf.sort_values("sample_id")
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tar:

        def add(name: str, data: bytes) -> None:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tar.addfile(info, io.BytesIO(data))

        for r in pdf.itertuples(index=False):
            img = bytes(r.bytes)
            add(f"{r.sample_id}.{r.fmt}", img)
            add(f"{r.sample_id}.txt", ("" if r.caption is None else r.caption).encode("utf-8"))
            meta = json.dumps(
                {"fmt": r.fmt, "n_bytes": len(img)}, sort_keys=True
            ).encode("utf-8")
            add(f"{r.sample_id}.json", meta)
    return buf.getvalue(), len(pdf)


def write_webdataset(pairs: DataFrame, out_dir: str) -> DataFrame:
    """Write (sample_id, bytes, fmt, caption, shard_id) rows as
    WebDataset tar shards under ``out_dir``; returns the published
    shard manifest as a DataFrame (shard_id, path, n_samples, sha256).

    Tasks write to ``_temporary/`` and the driver publishes — only the
    driver's manifest makes shards visible, so failed or duplicated
    (speculative/retried) task attempts never corrupt the output; for a
    shard reported twice the lexicographically first attempt file wins,
    mirroring FileOutputCommitter's first-commit-wins.
    """
    os.makedirs(os.path.join(out_dir, "_temporary"), exist_ok=True)

    def _write(pdf):
        import pandas as pd

        sid = int(pdf["shard_id"].iloc[0])
        blob, n = _tar_bytes(pdf)
        name = f"attempt-{uuid.uuid4().hex}.tar"
        with open(os.path.join(out_dir, "_temporary", name), "wb") as f:
            f.write(blob)
        return pd.DataFrame(
            {
                "shard_id": [sid],
                "path": [name],
                "n_samples": [n],
                "sha256": [hashlib.sha256(blob).hexdigest()],
            }
        )

    reported = (
        pairs.repartition("shard_id")
        .groupBy("shard_id")
        .applyInPandas(_write, SHARD_RESULT_SCHEMA)
        .collect()
    )
    # driver-side publish: first attempt per shard wins, rename + manifest
    published = []
    by_shard: dict[int, list] = {}
    for r in sorted(reported, key=lambda r: (r["shard_id"], r["path"])):
        by_shard.setdefault(r["shard_id"], []).append(r)
    for sid, attempts in sorted(by_shard.items()):
        win = attempts[0]
        final = f"shard-{sid:06d}.tar"
        os.replace(
            os.path.join(out_dir, "_temporary", win["path"]),
            os.path.join(out_dir, final),
        )
        for loser in attempts[1:]:
            p = os.path.join(out_dir, "_temporary", loser["path"])
            if os.path.exists(p):
                os.remove(p)
        published.append(
            (sid, final, int(win["n_samples"]), win["sha256"])
        )
    man = os.path.join(out_dir, "_MANIFEST.json")
    with open(man + ".tmp", "w") as f:
        json.dump(
            {
                "shards": [
                    {"shard_id": s, "path": p, "n_samples": n, "sha256": h}
                    for s, p, n, h in published
                ]
            },
            f,
        )
    os.replace(man + ".tmp", man)
    spark = pairs.sparkSession
    return spark.createDataFrame(published, SHARD_RESULT_SCHEMA)


def read_webdataset(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read published shards back to (sample_id, bytes, fmt, caption)
    rows — one task per shard, manifest-gated (unpublished or temporary
    files are invisible, exactly like the sink's commit contract)."""
    man = os.path.join(out_dir, "_MANIFEST.json")
    with open(man) as f:
        shards = json.load(f)["shards"]
    paths = spark.createDataFrame(
        [(s["path"],) for s in shards], "path string"
    ).repartition(max(len(shards), 1))

    def _read(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                with tarfile.open(os.path.join(out_dir, p)) as tar:
                    samples: dict[str, dict] = {}
                    for m in tar.getmembers():
                        key, ext = m.name.rsplit(".", 1)
                        data = tar.extractfile(m).read()
                        d = samples.setdefault(key, {})
                        if ext == "txt":
                            d["caption"] = data.decode("utf-8")
                        elif ext == "json":
                            d["fmt"] = json.loads(data)["fmt"]
                        else:
                            d["bytes"] = data
                    for key in sorted(samples):
                        d = samples[key]
                        rows.append(
                            (key, d.get("bytes"), d.get("fmt"), d.get("caption"))
                        )
            yield pd.DataFrame(
                rows, columns=["sample_id", "bytes", "fmt", "caption"]
            )

    return paths.mapInPandas(
        _read, "sample_id string, bytes binary, fmt string, caption string"
    )
