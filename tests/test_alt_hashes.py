"""Perceptual-hash ensemble (pHash/dHash/aHash) and border/letterbox
gate — exactness tests against direct numpy computation and planted
borders."""

import numpy as np

from crawler_spark.functions.codecs import ahash64, decode, dhash64, encode, phash64
from crawler_spark.operators.multimodal import alt_hashes, border_scores


def _noise(h, w, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8).astype(np.uint8)


def _img_df(spark, items):
    return spark.createDataFrame(
        [(i, encode(px, "png"), "png") for i, px in items],
        "image_id string, bytes binary, fmt string",
    )


def test_alt_hashes_match_direct_computation(spark):
    items = [(f"im-{i}", _noise(40, 56, seed=i)) for i in range(6)]
    got = {
        r["image_id"]: (r["phash"], r["dhash"], r["ahash"])
        for r in alt_hashes(_img_df(spark, items)).collect()
    }
    for i, px in items:
        rt = decode(encode(px, "png"), "png")
        assert got[i] == (phash64(rt), dhash64(rt), ahash64(rt))


def test_dhash_flip_sensitivity_and_dup_equality(spark):
    px = _noise(48, 64, seed=3)
    items = [("orig", px), ("dup", px.copy()), ("flip", px[:, ::-1].copy())]
    got = {
        r["image_id"]: (r["phash"], r["dhash"], r["ahash"])
        for r in alt_hashes(_img_df(spark, items)).collect()
    }
    assert got["orig"] == got["dup"]  # exact dup -> all three identical
    assert got["orig"][1] != got["flip"][1]  # gradient hash sees the flip


def test_border_widths_exact_on_planted_letterbox(spark):
    core = _noise(36, 64, seed=11)
    boxed = np.pad(core, ((6, 6), (0, 0)), constant_values=0)  # 48x64
    framed = np.pad(core, ((2, 2), (5, 5)), constant_values=255)
    clean = _noise(48, 64, seed=12)
    flat = np.full((32, 32), 128, dtype=np.uint8)
    got = {
        r["image_id"]: r
        for r in border_scores(
            _img_df(
                spark,
                [("boxed", boxed), ("framed", framed), ("clean", clean), ("flat", flat)],
            )
        ).collect()
    }
    b = got["boxed"]
    assert (b["top"], b["bottom"], b["left"], b["right"]) == (6, 6, 0, 0)
    assert b["letterboxed"]  # 12/48 = 25% of height lost
    f = got["framed"]
    assert (f["top"], f["bottom"], f["left"], f["right"]) == (2, 2, 5, 5)
    assert f["letterboxed"]  # 10/74 of width >= 8%
    c = got["clean"]
    assert (c["top"], c["bottom"], c["left"], c["right"]) == (0, 0, 0, 0)
    assert not c["letterboxed"]
    fl = got["flat"]  # fully flat: capped at half each dimension, flagged
    assert (fl["top"], fl["bottom"], fl["left"], fl["right"]) == (16, 16, 16, 16)
    assert fl["letterboxed"]


def test_tile_hash_finds_planted_quadrant_crop(spark):
    from crawler_spark.functions.codecs import phash64
    from crawler_spark.operators.multimodal import tile_hashes

    src = _noise(32, 48, seed=21)  # 2x3 grid of 16px tiles
    crop = src[16:32, 32:48].copy()  # exact tile (gy=1, gx=2)
    other = _noise(16, 16, seed=22)
    idx = tile_hashes(_img_df(spark, [("src", src)]), tile=16).collect()
    assert len(idx) == 6  # full grid indexed
    by_pos = {(r["gy"], r["gx"]): r["tile_phash"] for r in idx}
    crop_ph = phash64(decode(encode(crop, "png"), "png"))
    other_ph = phash64(decode(encode(other, "png"), "png"))
    hits = [pos for pos, ph in by_pos.items() if ph == crop_ph]
    assert hits == [(1, 2)]  # found at exactly the planted position
    assert all(ph != other_ph for ph in by_pos.values())  # no false hit
