"""Enrichment joins (J6/W2/A7/W1), multimodal plumbing, streaming agg."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark.functions.codecs import encode
from crawler_spark.operators.enrich import (
    fallback_join,
    jaccard_tokens,
    latest_per_key,
    scenario_first_hit,
    top1_per_group,
)
from crawler_spark.operators.multimodal import (
    decode_external,
    decode_stats,
    embed_images,
    frame_sample,
    resize_images,
)


def test_fallback_join(spark):
    base = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    prim = spark.createDataFrame([(1, 10.0)], "k int, val double")
    sec = spark.createDataFrame([(2, 20.0), (1, 99.0)], "k int, val double")
    out = {r["k"]: (r["val"], r["enrich_source"]) for r in
           fallback_join(base, prim, sec, "k", ["val"]).collect()}
    assert out[1] == (10.0, "primary")    # primary wins even if secondary has it
    assert out[2] == (20.0, "secondary")  # fallback fires only on miss
    assert out[3] == (None, "none")


def test_scenario_first_hit(spark):
    base = spark.createDataFrame(
        [(1, ["full addr q", "shorter q", "name"]), (2, ["nope", "name"])],
        "id int, scenarios array<string>",
    )
    lookup = spark.createDataFrame(
        [("shorter q", 5.0), ("name", 7.0)], "q string, score double"
    )
    out = {r["id"]: (r["hit_val"], r["hit_pos"]) for r in
           scenario_first_hit(base, "scenarios", lookup, "q", "score", "id").collect()}
    assert out[1] == (5.0, 1)  # first validated scenario wins, not best score
    assert out[2] == (7.0, 1)


def test_generate_scenarios(spark):
    """C12 prefix reduction: full query -> shorter prefixes -> wildcard,
    in that exact order (kakao_api.py:131-145 semantics)."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.enrich import generate_scenarios

    df = spark.createDataFrame(
        [("seoul gangnam dong",), ("single",), ("  padded   q  ",)], "q string"
    )
    out = [r["s"] for r in df.select(generate_scenarios(F.col("q")).alias("s")).collect()]
    assert out[0] == ["seoul gangnam dong", "seoul gangnam", "seoul", "*"]
    assert out[1] == ["single", "*"]
    assert out[2] == ["padded q", "padded", "*"]  # whitespace-robust


def test_two_tier_lookup(spark):
    """J5 exact-then-substring alias resolution: earliest token wins,
    exact beats substring within a token, fallback marker default."""
    from crawler_spark.operators.enrich import two_tier_lookup

    base = spark.createDataFrame(
        [
            (1, ["seoul", "x"]),       # exact at pos 0
            (2, ["seoul-city", "x"]),  # substring at pos 0
            (3, ["nope", "busan"]),    # exact at pos 1
            (4, ["nope", "zzz"]),      # no hit + marker -> fallback
            (5, ["nope", "nah"]),      # no hit, no marker -> null
        ],
        "id int, parts array<string>",
    )
    mapping = spark.createDataFrame(
        [("seoul", "SEOUL-FULL"), ("busan", "BUSAN-FULL")], "alias string, canon string"
    )
    out = {
        r["id"]: (r["canon"], r["tier"])
        for r in two_tier_lookup(
            base, "parts", mapping, "alias", "canon", "id",
            fallback_contains="zzz", fallback_value="DEFAULT",
        ).collect()
    }
    assert out[1] == ("SEOUL-FULL", 0)
    assert out[2] == ("SEOUL-FULL", 1)
    assert out[3] == ("BUSAN-FULL", 0)
    assert out[4] == ("DEFAULT", -1)
    assert out[5] == (None, None)


def test_latest_and_top1(spark):
    df = spark.createDataFrame(
        [(1, 10, 1.0), (1, 20, 2.0), (2, 15, 9.0), (2, 15, 3.0)],
        "k int, ts int, v double",
    )
    latest = {r["k"]: r["ts"] for r in latest_per_key(df, "k", "ts", "v").collect()}
    assert latest == {1: 20, 2: 15}
    top = {r["k"]: r["v"] for r in top1_per_group(df, "k", "v", "ts").collect()}
    assert top == {1: 2.0, 2: 9.0}


def test_jaccard_tokens(spark):
    df = spark.createDataFrame([("a b c", "b c d")], "x string, y string")
    assert df.select(jaccard_tokens(F.col("x"), F.col("y")).alias("j")).first()["j"] == 0.5


@pytest.fixture(scope="module")
def images(spark):
    rng = np.random.default_rng(3)
    rows = []
    for i in range(6):
        px = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
        fmt = "png" if i % 2 else "qdct"
        rows.append((f"img-{i}", bytearray(encode(px, fmt)), fmt))
    return spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")


def test_decode_stats_and_resize(images):
    stats = decode_stats(images).collect()
    assert len(stats) == 6
    assert all(r["w"] == 32 and r["h"] == 32 and 0 <= r["mean_px"] <= 255 for r in stats)
    small = resize_images(images, 8, 8).collect()
    assert all(r["w"] == 8 and r["h"] == 8 for r in small)
    embs = embed_images(images, dim=16).collect()
    assert all(len(r["embedding"]) == 16 for r in embs)
    for r in embs:
        assert abs(float(np.linalg.norm(r["embedding"])) - 1.0) < 1e-5


def test_frame_sample_udtf_shape(spark):
    vids = spark.createDataFrame(
        [("v1", bytearray(b"x" * 4096)), ("v2", bytearray(b"y" * 1024))],
        "media_id string, bytes binary",
    )
    frames = frame_sample(vids, every_n=2).collect()
    assert {r["media_id"] for r in frames} == {"v1", "v2"}
    assert len([r for r in frames if r["media_id"] == "v1"]) == 2  # 4 frames, every 2


def test_decode_external_is_stubbed(images):
    with pytest.raises(NotImplementedError):
        decode_external(images, "jpeg")


def test_stateful_sessionize_stream(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): per-user
    inactivity-gap sessions. A gap-exceeding event CLOSES and emits the
    previous session; still-open sessions stay in state (emitted only at
    event-time timeout). Event-time driven — deterministic on replay."""
    import datetime as dt

    from crawler_spark.streaming.events import (
        EVENTS_SCHEMA,
        run_sessionize_stream,
    )

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        # user 10: two events 10 min apart (one session), then an event
        # 2 h later that closes it (gap = 30 min)
        (1, base, 10, "a", 1.0, None),
        (2, base + dt.timedelta(minutes=10), 10, "a", 2.0, None),
        (3, base + dt.timedelta(hours=2), 10, "a", 3.0, None),
        # user 20: single event -> open session, must NOT be emitted
        (4, base, 20, "a", 5.0, None),
    ]
    d = str(tmp_path / "events_stream")
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.parquet(d)
    name = run_sessionize_stream(spark, d, gap_seconds=1800)
    got = spark.table(name).collect()
    assert len(got) == 1  # only the closed session
    s = got[0]
    assert s["user_id"] == 10
    assert s["n_events"] == 2 and s["total_value"] == 3.0
    assert s["session_start"] == base
    assert s["session_end"] == base + dt.timedelta(minutes=10)


def test_streaming_windowed_counts(spark, tmp_path):
    import shutil

    from crawler_spark.streaming.events import run_events_stream

    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", d / "events.parquet")
    name = run_events_stream(spark, str(d))
    out = spark.sql(f"SELECT * FROM {name}")
    rows = out.collect()
    assert rows and {"window", "event_type", "n", "total_value"} <= set(out.columns)
    # reconcile against batch: same totals per event_type
    batch = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .groupBy("event_type").count().collect()
    )
    batch_n = {r["event_type"]: r["count"] for r in batch}
    stream_n = {}
    for r in rows:
        stream_n[r["event_type"]] = stream_n.get(r["event_type"], 0) + r["n"]
    assert stream_n == batch_n


def test_streaming_url_dedup(spark, tmp_path):
    """Streaming URL-seen gate: duplicates within AND across micro-batches
    are suppressed; each url_hash survives exactly once (first sighting)."""
    import datetime as dt

    from crawler_spark.streaming.events import URLS_SCHEMA, run_url_dedup_stream

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    batch1 = [
        ("http://a.test/1", 101, "a.test", base),
        ("http://a.test/1", 101, "a.test", base + dt.timedelta(seconds=1)),
        ("http://b.test/2", 202, "b.test", base),
    ]
    batch2 = [
        ("http://a.test/1", 101, "a.test", base + dt.timedelta(minutes=5)),
        ("http://c.test/3", 303, "c.test", base + dt.timedelta(minutes=5)),
    ]
    import glob
    import shutil

    d = tmp_path / "urls_stream"
    d.mkdir()
    # two plain files in the dir -> two micro-batches (maxFilesPerTrigger=1)
    for i, batch in enumerate([batch1, batch2]):
        staged = str(tmp_path / f"stage{i}")
        spark.createDataFrame(batch, URLS_SCHEMA).coalesce(1).write.parquet(staged)
        shutil.copy(glob.glob(f"{staged}/part-*.parquet")[0], d / f"b{i}.parquet")
    name = run_url_dedup_stream(spark, str(d))
    got = sorted(r["url_hash"] for r in spark.table(name).collect())
    assert got == [101, 202, 303]


def test_stream_stream_attribution(spark, tmp_path):
    """Stream-stream time-bound inner join: purchases attributed to the
    same user's click within 30 min, state evictable via the range
    condition + watermarks. Inner join => result must equal the batch
    join of the same inputs, including across micro-batch boundaries
    (clicks and purchases arrive in different files)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from crawler_spark.streaming.events import (
        EVENTS_SCHEMA,
        run_attribution_stream,
        stream_stream_attribution,
    )

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    clicks = [
        (1, base, 10, "click", 1.0, None),
        (2, base + dt.timedelta(minutes=50), 10, "click", 2.0, None),
        (3, base, 20, "click", 3.0, None),
    ]
    purchases = [
        # matches click 1 (10 min after) but NOT click 2
        (4, base + dt.timedelta(minutes=10), 10, "purchase", 9.0, None),
        # matches click 2 (within 30 min of it)
        (5, base + dt.timedelta(minutes=70), 10, "purchase", 8.0, None),
        # user 20: 40 min after the click -> outside horizon, no match
        (6, base + dt.timedelta(minutes=40), 20, "purchase", 7.0, None),
    ]
    d = tmp_path / "attr_stream"
    d.mkdir()
    # separate files => separate micro-batches; the join must buffer
    # click state across batches to match later purchase arrivals
    for i, batch in enumerate((clicks, purchases)):
        staged = str(tmp_path / f"attr_stage{i}")
        spark.createDataFrame(batch, EVENTS_SCHEMA).coalesce(1).write.parquet(staged)
        import glob
        import shutil

        for f in glob.glob(staged + "/part-*.parquet"):
            shutil.copy(f, str(d / f"b{i}.parquet"))
    name = run_attribution_stream(spark, str(d))
    got = sorted(tuple(r) for r in spark.table(name).collect())
    ev = spark.createDataFrame(clicks + purchases, EVENTS_SCHEMA)
    want = sorted(
        tuple(r)
        for r in stream_stream_attribution(
            ev.filter(F.col("event_type") == "click"),
            ev.filter(F.col("event_type") == "purchase"),
        ).collect()
    )
    assert got == want
    assert len(got) == 2
    matched_pairs = {(r[1], r[2]) for r in got}
    assert (base, base + dt.timedelta(minutes=10)) in matched_pairs
    assert (
        base + dt.timedelta(minutes=50),
        base + dt.timedelta(minutes=70),
    ) in matched_pairs


def test_streaming_politeness_budget_across_batches(spark, tmp_path):
    """Per-host budget enforced per micro-batch in frontier order;
    serve_slot is contiguous per host ACROSS batches (the stateful
    carry); overflow rows are emitted deferred, never dropped."""
    import glob
    import shutil

    from crawler_spark.streaming.events import (
        POLITE_URLS_SCHEMA,
        run_politeness_stream,
    )

    # batch 1: host a has 3 candidates (budget 2), host b has 1
    batch1 = [
        ("a.test", "http://a.test/low", 2, 1, 10),
        ("a.test", "http://a.test/hi", 0, 0, 11),
        ("a.test", "http://a.test/mid", 1, 0, 12),
        ("b.test", "http://b.test/1", 0, 0, 13),
    ]
    # batch 2: host a gets 2 more, host b 2 more
    batch2 = [
        ("a.test", "http://a.test/p4", 0, 2, 14),
        ("a.test", "http://a.test/p5", 0, 2, 15),
        ("b.test", "http://b.test/2", 1, 1, 16),
        ("b.test", "http://b.test/3", 0, 1, 17),
    ]
    d = tmp_path / "polite_stream"
    d.mkdir()
    for i, batch in enumerate([batch1, batch2]):
        staged = str(tmp_path / f"pstage{i}")
        spark.createDataFrame(batch, POLITE_URLS_SCHEMA).coalesce(1).write.parquet(
            staged
        )
        shutil.copy(glob.glob(f"{staged}/part-*.parquet")[0], d / f"b{i}.parquet")
    name = run_politeness_stream(spark, str(d), budget_per_batch=2)
    rows = {r["url_canon"]: r for r in spark.table(name).collect()}
    assert len(rows) == 8  # every candidate emitted exactly once

    # batch 1, host a: priority order hi(0) < mid(1) < low(2); budget 2
    assert rows["http://a.test/hi"]["decision"] == "admitted"
    assert rows["http://a.test/hi"]["serve_slot"] == 1
    assert rows["http://a.test/mid"]["decision"] == "admitted"
    assert rows["http://a.test/mid"]["serve_slot"] == 2
    assert rows["http://a.test/low"]["decision"] == "deferred"
    assert rows["http://a.test/low"]["serve_slot"] == -1
    assert rows["http://b.test/1"]["serve_slot"] == 1

    # batch 2: host a's slots CONTINUE at 3,4 (state carried);
    # b.test/3 (priority 0) outranks b.test/2 (priority 1)
    assert rows["http://a.test/p4"]["serve_slot"] == 3
    assert rows["http://a.test/p5"]["serve_slot"] == 4
    assert rows["http://b.test/3"]["serve_slot"] == 2
    assert rows["http://b.test/2"]["serve_slot"] == 3
    admitted = [r for r in rows.values() if r["decision"] == "admitted"]
    assert len(admitted) == 7


def test_stream_stream_left_outer_emits_after_watermark(spark, tmp_path):
    """Left-outer stream-stream join: an unmatched click is held in
    state until the watermark provably closes its attribution window,
    then emitted ONCE with NULL right columns; a click whose window is
    still open when the stream drains is NOT emitted (no premature
    outer rows). Matched rows are identical to the inner form."""
    import datetime as dt
    import glob
    import shutil

    from crawler_spark.streaming.events import (
        EVENTS_SCHEMA,
        run_attribution_stream,
    )

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    h = dt.timedelta(hours=1)
    b0 = [
        (1, base, 10, "click", 1.0, None),
        (2, base + dt.timedelta(minutes=10), 10, "purchase", 9.0, None),
        (3, base, 20, "click", 3.0, None),  # orphan — window closes later
    ]
    # batch 1 advances the right watermark far past base+30min -> the
    # orphan's window is provably closed by the NEXT batch
    b1 = [
        (4, base + 3 * h, 30, "click", 5.0, None),
        (5, base + 3 * h + dt.timedelta(minutes=5), 30, "purchase", 6.0, None),
    ]
    # batch 2 triggers the eviction pass; its own click's window is
    # still open when the stream drains -> must NOT be emitted
    b2 = [(6, base + 6 * h, 40, "click", 7.0, None)]
    d = tmp_path / "outer_stream"
    d.mkdir()
    for i, batch in enumerate((b0, b1, b2)):
        staged = str(tmp_path / f"outer_stage{i}")
        spark.createDataFrame(batch, EVENTS_SCHEMA).coalesce(1).write.parquet(staged)
        for f in glob.glob(staged + "/part-*.parquet"):
            shutil.copy(f, str(d / f"b{i}.parquet"))
    name = run_attribution_stream(spark, str(d), how="left_outer",
                                  name="attribution_outer")
    rows = {
        (r["user_id"], r["left_ts"], r["right_ts"], r["right_value"])
        for r in spark.table(name).collect()
    }
    assert (10, base, base + dt.timedelta(minutes=10), 9.0) in rows
    assert (30, base + 3 * h, base + 3 * h + dt.timedelta(minutes=5), 6.0) in rows
    # the orphan emitted exactly once, with NULL right side
    assert (20, base, None, None) in rows
    # the still-open click did not leak a premature outer row
    assert all(u != 40 for u, *_ in rows)
    assert len(rows) == 3
