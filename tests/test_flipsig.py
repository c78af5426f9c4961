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
