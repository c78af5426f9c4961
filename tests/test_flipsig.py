"""Orientation-canonical perceptual hash (codecs.flip_min_phash64 +
multimodal.flip_canonical_sigs).

Invariance: the canonical hash is bit-identical across all 4
axis-preserving orientations of the same pixels. Recall: mirrored
twins that plain pHash scatters far apart land at canonical Hamming 0
and are recovered by the banded pair join; plain pHash demonstrably
misses them at the same band.
"""

import numpy as np

from crawler_spark.functions.codecs import (
    decode,
    encode,
    flip_min_phash64,
    phash64,
)
from crawler_spark.operators.dedup import hamming64_pairs
from crawler_spark.operators.multimodal import flip_canonical_sigs
from crawler_spark.sources.synth import T1_SMOKE


def _pixels(n=12):
    urls = [f"http://host-0.test/p0/d0/img-{i}" for i in range(n)]
    out = []
    for u in urls:
        r = T1_SMOKE.payload(u)
        out.append((r["image_id"], decode(r["bytes"], r["fmt"])))
    return out


def test_flip_min_phash_invariant_under_orientations():
    for image_id, px in _pixels():
        base = flip_min_phash64(px)
        for t in (px[:, ::-1], px[::-1, :], px[::-1, ::-1]):
            assert flip_min_phash64(t) == base, image_id
        # and it is one of the member orientation hashes
        members = {
            phash64(px),
            phash64(px[:, ::-1]),
            phash64(px[::-1, :]),
            phash64(px[::-1, ::-1]),
        }
        assert base == min(members)


def test_flip_sigs_recall_mirror_twins_plain_phash_misses(spark):
    pixels = _pixels(12)
    rows = [(i, encode(px, "png"), "png") for i, px in pixels]
    mirrored = [
        (i + "-m", encode(np.ascontiguousarray(px[:, ::-1]), "png"), "png")
        for i, px in pixels[:6]
    ]
    df = spark.createDataFrame(
        rows + mirrored, "image_id string, bytes binary, fmt string"
    )
    sigs = flip_canonical_sigs(df)
    canon = {
        (r.doc_a, r.doc_b): r.hamming
        for r in hamming64_pairs(
            sigs, id_col="image_id", sig_col="flip_phash", max_hamming=3
        ).collect()
    }
    plain = {
        (r.doc_a, r.doc_b)
        for r in hamming64_pairs(
            sigs, id_col="image_id", sig_col="phash", max_hamming=3
        ).collect()
    }
    plain_h = {r.image_id: r.phash for r in sigs.collect()}
    missed = 0
    for i, px in pixels[:6]:
        key = tuple(sorted((i, i + "-m")))
        assert key in canon and canon[key] == 0, key  # canonical: exact
        d = bin(
            (plain_h[i] ^ plain_h[i + "-m"]) & ((1 << 64) - 1)
        ).count("1")
        if key not in plain:
            missed += 1
            assert d > 3  # plain pHash sees them as far apart
    # the mirror trick must actually be LOAD-BEARING for most twins
    assert missed >= 4, f"only {missed} of 6 twins needed the canonical hash"


def test_hamming64_join_matches_bruteforce(spark):
    from crawler_spark.operators.dedup import hamming64_join

    pixels = _pixels(10)
    catalog_rows = [(i, encode(px, "png"), "png") for i, px in pixels]
    probe_rows = []
    for j, (i, px) in enumerate(pixels[:5]):
        q = np.clip(px.astype(np.int16) + 1, 0, 255).astype(np.uint8)
        probe_rows.append((i + "-b", encode(q, "png"), "png"))
    from crawler_spark.operators.multimodal import decode_stats

    mk = lambda r: spark.createDataFrame(
        r, "image_id string, bytes binary, fmt string"
    )
    cat = decode_stats(mk(catalog_rows)).select("image_id", "phash")
    probe = decode_stats(mk(probe_rows)).select("image_id", "phash")
    got = {
        (r.probe_id, r.index_id): r.hamming
        for r in hamming64_join(
            probe, cat, id_col="image_id", sig_col="phash", max_hamming=3
        ).collect()
    }
    # brute force over the same signatures
    ch = {r.image_id: r.phash for r in cat.collect()}
    ph = {r.image_id: r.phash for r in probe.collect()}
    want = {}
    for pi, psig in ph.items():
        for ci, csig in ch.items():
            d = bin((psig ^ csig) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                want[(pi, ci)] = d
    assert got == want
    # every +1-brightness probe finds its own catalog source
    for pi in ph:
        assert (pi, pi[: -len("-b")]) in got


def test_dihedral_min_phash_invariant_under_full_d4():
    from crawler_spark.functions.codecs import dihedral_min_phash64

    for image_id, px in _pixels():
        base = dihedral_min_phash64(px)
        orbit = [
            px[:, ::-1], px[::-1, :], px[::-1, ::-1],
            px.T, np.rot90(px), np.rot90(px, 2), np.rot90(px, 3),
            px.T[::-1, ::-1],
        ]
        for t in orbit:
            assert dihedral_min_phash64(np.ascontiguousarray(t)) == base, image_id


def test_d4_sigs_recall_rot90_twins_flip_hash_misses(spark):
    """90°-rotated re-uploads land at d4 Hamming 0 and are recalled by
    the banded join; the flip-canonical hash (which only folds
    axis-preserving orientations) scatters them to large distances."""
    from crawler_spark.operators.multimodal import dihedral_canonical_sigs

    rows = []
    for image_id, px in _pixels(10):
        rows.append((image_id, encode(px.copy(), "png"), "png"))
        rows.append(
            (image_id + "-r", encode(np.rot90(px).copy(), "png"), "png")
        )
    images = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string"
    )
    sigs = dihedral_canonical_sigs(images).collect()
    by_id = {r["image_id"]: r for r in sigs}
    flip_misses = 0
    for image_id, px in _pixels(10):
        a, b = by_id[image_id], by_id[image_id + "-r"]
        assert a["d4_phash"] == b["d4_phash"], image_id
        if bin((a["flip_phash"] ^ b["flip_phash"]) & (2**64 - 1)).count("1") > 3:
            flip_misses += 1
    assert flip_misses >= 7  # flip canonical demonstrably insufficient
    got = {
        tuple(sorted((r["doc_a"], r["doc_b"])))
        for r in hamming64_pairs(
            dihedral_canonical_sigs(images),
            id_col="image_id", sig_col="d4_phash", max_hamming=3, n_bands=8,
        ).collect()
    }
    for image_id, _ in _pixels(10):
        assert tuple(sorted((image_id, image_id + "-r"))) in got
