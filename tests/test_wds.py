"""WebDataset tar shard sink/source (sources/wds.py): exact round trip,
byte-deterministic shards (same rows -> same sha256 under any
partitioning), manifest-gated visibility, and first-attempt-wins
publishing."""

import json
import os

import numpy as np
import pytest

from crawler_spark.functions.codecs import png_encode
from crawler_spark.sources.wds import read_webdataset, write_webdataset


@pytest.fixture(scope="module")
def pairs(spark):
    rows = []
    for i in range(24):
        rng = np.random.default_rng(i)
        px = rng.integers(0, 255, size=(16, 16), dtype=np.uint8)
        rows.append(
            (f"img-{i:04d}", bytearray(png_encode(px)), "png",
             f"caption number {i}", i % 4)
        )
    return spark.createDataFrame(
        rows,
        "sample_id string, bytes binary, fmt string, caption string, shard_id int",
    )


def test_round_trip_exact(spark, tmp_path, pairs):
    out = str(tmp_path / "wds")
    man = write_webdataset(pairs, out)
    got = {r["shard_id"]: r for r in man.collect()}
    assert set(got) == {0, 1, 2, 3}
    assert all(r["n_samples"] == 6 for r in got.values())
    back = {
        r["sample_id"]: r for r in read_webdataset(spark, out).collect()
    }
    orig = {r["sample_id"]: r for r in pairs.collect()}
    assert set(back) == set(orig)
    for k in orig:
        assert bytes(back[k]["bytes"]) == bytes(orig[k]["bytes"])
        assert back[k]["caption"] == orig[k]["caption"]
        assert back[k]["fmt"] == "png"


def test_shards_byte_deterministic(spark, tmp_path, pairs):
    a = {
        r["shard_id"]: r["sha256"]
        for r in write_webdataset(
            pairs.repartition(1), str(tmp_path / "a")
        ).collect()
    }
    b = {
        r["shard_id"]: r["sha256"]
        for r in write_webdataset(
            pairs.repartition(7), str(tmp_path / "b")
        ).collect()
    }
    assert a == b


def test_manifest_gates_visibility(spark, tmp_path, pairs):
    out = str(tmp_path / "gated")
    write_webdataset(pairs, out)
    # a stray temporary file must stay invisible to the reader
    os.makedirs(os.path.join(out, "_temporary"), exist_ok=True)
    with open(os.path.join(out, "_temporary", "attempt-junk.tar"), "wb") as f:
        f.write(b"not a tar")
    assert read_webdataset(spark, out).count() == 24
    # removing the manifest makes the directory unreadable (atomicity)
    os.remove(os.path.join(out, "_MANIFEST.json"))
    with pytest.raises(FileNotFoundError):
        read_webdataset(spark, out)


def test_manifest_matches_disk(tmp_path, spark, pairs):
    out = str(tmp_path / "m")
    write_webdataset(pairs, out)
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        man = json.load(f)["shards"]
    for s in man:
        assert os.path.exists(os.path.join(out, s["path"]))
        assert s["path"] == f"shard-{s['shard_id']:06d}.tar"
