"""Image+caption pair curation (operators/pairs.py).

Checks the selection invariants directly (filter bounds, first-wins
phash dedup) and the scale properties (binary column never scanned,
derivation deterministic).
"""

from pyspark.sql import functions as F

from crawler_spark.operators.pairs import (
    pair_corpus_stats,
    select_training_pairs,
    synth_pair_meta,
)

META_COLS = ["image_id", "w", "h", "fmt", "n_tokens", "phash"]


def _meta(spark, rows):
    return spark.createDataFrame(rows, "image_id long, w int, h int, fmt string, n_tokens long, phash long")


def test_select_filters_and_first_wins_dedup(spark):
    rows = [
        (1, 640, 480, "png", 10, 111),   # keep
        (2, 640, 480, "png", 10, 111),   # dup phash, larger id -> dropped
        (3, 32, 480, "png", 10, 222),    # below min side
        (4, 2000, 480, "png", 10, 333),  # aspect > 3
        (5, 640, 480, "png", 3, 444),    # too few caption tokens
        (6, 64, 192, "qdct", 5, 555),    # boundary: exactly min side + 3:1 aspect -> keep
    ]
    got = {r.image_id: r for r in select_training_pairs(_meta(spark, rows)).collect()}
    assert sorted(got) == [1, 6]
    assert got[1].phash == 111 and got[6].fmt == "qdct"


def test_synth_meta_deterministic_and_caption_dup_collides(spark):
    docs = spark.createDataFrame(
        [(1, "a shared caption"), (2, "a shared caption"), (3, "different words here")],
        "doc_id long, text string",
    )
    a = synth_pair_meta(docs).orderBy("image_id").collect()
    b = synth_pair_meta(docs).orderBy("image_id").collect()
    assert a == b
    assert [r.image_id for r in a] == [1, 2, 3]
    # identical captions -> identical phash (the dedup key); distinct text differs
    assert a[0].phash == a[1].phash != a[2].phash
    # geometry is in range and 64-bit-safe
    for r in a:
        assert 32 <= r.w <= 2072 and 32 <= r.h <= 2072
        assert 0 <= r.phash < 1 << 60


def test_meta_scan_prunes_binary_column(spark, tmp_path):
    """The curation pass must never read `bytes` — column pruning down to
    the parquet scan is the difference between a metadata pass and a
    100 TB full read."""
    docs = spark.createDataFrame(
        [(1, "caption one two three four five", bytearray(b"\x00" * 64))],
        "doc_id long, text string, bytes binary",
    )
    p = str(tmp_path / "pairs_docs")
    docs.write.mode("overwrite").parquet(p)
    plan = select_training_pairs(
        synth_pair_meta(spark.read.parquet(p))
    )._jdf.queryExecution().executedPlan().toString()
    assert "bytes" not in plan, plan


def test_pair_stats_shape(spark):
    rows = [
        (1, 100, 50, "png", 5, 1),
        (2, 50, 100, "png", 7, 2),
        (3, 80, 80, "qdct", 9, 3),
    ]
    got = {(r.fmt, r.orientation): r for r in pair_corpus_stats(_meta(spark, rows)).collect()}
    assert got[("png", "landscape")].n_pairs == 1
    assert got[("png", "portrait")].avg_tokens == 7.0
    assert got[("qdct", "square")].avg_w == 80.0


def test_phash_twins_hamming_bound_and_cluster_recall(spark):
    """Every perturbed twin must sit within Hamming 3 of its base (and 6
    of the sibling twin), so banded Hamming<=7 + connected components
    must recover exactly one 3-node cluster per distinct caption."""
    from crawler_spark.operators.dedup import dedup_clusters, hamming64_pairs
    from crawler_spark.operators.pairs import phash_with_twins

    docs = spark.createDataFrame(
        [(i, f"caption number {i} alpha beta gamma") for i in range(1, 9)],
        "doc_id long, text string",
    )
    sigs = phash_with_twins(synth_pair_meta(docs))
    rows = {r.image_id: r.sig for r in sigs.collect()}
    assert len(rows) == 24
    for i in range(1, 9):
        base, t1, t2 = rows[i], rows[i + 10**9], rows[i + 2 * 10**9]
        assert 1 <= bin(base ^ t1).count("1") <= 3
        assert 1 <= bin(base ^ t2).count("1") <= 3
        assert bin(t1 ^ t2).count("1") <= 6
    pairs = hamming64_pairs(
        sigs, id_col="image_id", sig_col="sig", max_hamming=7, n_bands=8
    )
    labels = dedup_clusters(pairs).collect()
    by_cluster = {}
    for r in labels:
        by_cluster.setdefault(r.cluster_id, set()).add(r.doc_id)
    assert len(by_cluster) == 8
    for i in range(1, 9):
        assert by_cluster[i] == {i, i + 10**9, i + 2 * 10**9}


def test_ar_bucket_batches_partition_and_fill(spark):
    """Every image lands in exactly one AR band; batches fill to
    batch_size in image_id order with at most one partial batch per
    band; band edges are exact integer cross-multiplication."""
    from crawler_spark.operators.pairs import ar_bucket_batches

    rows = [(i, 100 + (i % 7) * 40, 100, "png", 5, i) for i in range(70)]
    rows += [(100 + i, 50, 300, "png", 5, 100 + i) for i in range(5)]
    out = ar_bucket_batches(_meta(spark, rows), batch_size=16).collect()
    assert sum(r.n_images for r in out) == 75
    for bucket in {r.bucket for r in out}:
        batches = sorted(
            (r for r in out if r.bucket == bucket), key=lambda r: r.batch_id
        )
        assert [r.batch_id for r in batches] == list(range(len(batches)))
        assert all(r.n_images == 16 for r in batches[:-1])  # only tail partial
        # batches are contiguous id ranges (packed in image_id order)
        for a, b in zip(batches, batches[1:]):
            assert a.last_id < b.first_id
    # w=50,h=300 -> h > 2w: ultratall, exactly the 5 planted rows
    ut = [r for r in out if r.bucket == "ultratall"]
    assert sum(r.n_images for r in ut) == 5


def test_caption_alignment_scores_and_threshold(spark):
    """align_score is the cosine of the md5-digit caption vector vs the
    stored embedding's first 32 dims (numpy-verified), and `kept`
    mirrors the threshold on the rounded score."""
    import numpy as np

    from crawler_spark.operators.pairs import caption_alignment

    docs = spark.createDataFrame(
        [(i, f"caption {i} with words") for i in range(8)],
        "doc_id long, text string",
    )
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(8, 64)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    out = {r.image_id: r for r in caption_alignment(docs, emb).collect()}
    import hashlib

    for i in range(8):
        m = hashlib.md5(f"caption {i} with words".encode()).hexdigest()
        a = np.array(
            ["0123456789abcdef".index(c) / 7.5 - 1.0 for c in m], dtype=np.float64
        )
        b = vecs[i][:32].astype(np.float64)
        want = round(
            round(float((a * b).sum()), 9)
            / (np.sqrt(round(float((a * a).sum()), 9)) * np.sqrt(round(float((b * b).sum()), 9))),
            6,
        )
        assert abs(out[i].align_score - want) < 2e-6
        assert out[i].kept == (out[i].align_score >= 0.05)


def test_caption_canonical_modal_election_and_shares(spark):
    from crawler_spark.operators.pairs import caption_canonical

    pairs = spark.createDataFrame(
        [
            # image A: "cat" x3 beats "dog" x2 and "emu" x1
            (1, "A", "dog", "s1"), (2, "A", "cat", "s1"),
            (3, "A", "cat", "s2"), (4, "A", "dog", "s2"),
            (5, "A", "cat", "s2"), (6, "A", "emu", "s3"),
            # image B: tie 2-2 -> lexicographically smaller wins
            (7, "B", "zebra", "s1"), (8, "B", "ant", "s1"),
            (9, "B", "zebra", "s2"), (10, "B", "ant", "s3"),
            # image C: single caption -> share 1.0
            (11, "C", "solo", "s1"),
        ],
        "image_id long, content_key string, caption string, source string",
    )
    got = {r.content_key: r for r in caption_canonical(pairs).collect()}
    assert got["A"].canonical_caption == "cat"
    assert got["A"].n_pairs == 6 and got["A"].n_variants == 3
    assert abs(got["A"].canonical_share - 0.5) < 1e-9
    assert got["B"].canonical_caption == "ant"  # tie broken ascending
    assert abs(got["B"].canonical_share - 0.5) < 1e-9
    assert got["C"].canonical_caption == "solo"
    assert got["C"].canonical_share == 1.0 and got["C"].n_variants == 1


def test_caption_noise_report_counts_minority_pairs(spark):
    from crawler_spark.operators.pairs import caption_noise_report

    pairs = spark.createDataFrame(
        [
            (1, "A", "cat", "good"), (2, "A", "cat", "good"),
            (3, "A", "dog", "bad"),                 # loses election
            (4, "B", "x", "good"), (5, "B", "x", "bad"),
        ],
        "image_id long, content_key string, caption string, source string",
    )
    got = {r.source: r for r in caption_noise_report(pairs).collect()}
    assert got["good"].n_noise_pairs == 0 and got["good"].noise_rate == 0.0
    assert got["bad"].n_pairs == 2 and got["bad"].n_noise_pairs == 1
    assert abs(got["bad"].noise_rate - 0.5) < 1e-9


def test_content_key_grouping_and_variant_multiplicity(spark):
    from crawler_spark.operators.pairs import with_content_key

    docs = spark.createDataFrame(
        [(i, f"text {i}", "s") for i in range(21)],
        "doc_id long, text string, source string",
    )
    out = with_content_key(docs, group=7, n_variants=3)
    agg = out.groupBy("content_key").agg(
        F.count("*").alias("n"),
        F.count_distinct("caption").alias("nv"),
    )
    rows = agg.collect()
    assert len(rows) == 3
    assert all(r.n == 7 for r in rows)
    # 7 pages over <=3 variants: pigeonhole guarantees a real modal vote
    assert all(1 <= r.nv <= 3 for r in rows)
    # without n_variants the raw text is the caption (all distinct)
    raw = with_content_key(docs, group=7)
    assert raw.select(F.count_distinct("caption")).first()[0] == 21
