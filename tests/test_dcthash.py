"""DCT pHash: affine invariance proofs, operator parity, planted-twin
recall of the image_dct_neardup query."""

import numpy as np

from crawler_spark.functions.codecs import dct_phash64, encode


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & (2**64 - 1)).count("1")


def test_dct_phash_affine_invariance_exact():
    """px + c moves only the DC coefficient; px * s (s > 0) scales all
    AC terms uniformly — both leave every AC-vs-median comparison, and
    therefore the hash, bit-identical (no rounding applied here)."""
    rng = np.random.default_rng(11)
    for shape in [(32, 32), (40, 56), (17, 23), (128, 96)]:
        px = rng.integers(0, 200, shape).astype(np.float64)
        h = dct_phash64(px)
        assert dct_phash64(px + 31.0) == h
        assert dct_phash64(px * 1.73) == h
        assert dct_phash64(px * 0.4 + 12.0) == h


def test_dct_phash_rounded_contrast_twin_is_near():
    """uint8 re-quantization after a contrast edit breaks exact
    linearity but must stay within the Hamming<=6 join band."""
    rng = np.random.default_rng(23)
    flips = []
    for _ in range(20):
        px = rng.integers(10, 200, (48, 64)).astype(np.float64)
        tw = np.clip(np.round(px * 1.2), 0, 255)
        flips.append(_ham(dct_phash64(px), dct_phash64(tw)))
    assert max(flips) <= 6


def test_dct_phash_discriminates_unrelated():
    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, (40, 40)).astype(np.float64) for _ in range(12)]
    hams = [
        _ham(dct_phash64(imgs[i]), dct_phash64(imgs[j]))
        for i in range(12)
        for j in range(i + 1, 12)
    ]
    # 63 random AC comparisons: expect ~31 differing bits, never near 0
    assert min(hams) > 12


def test_dct_hashes_operator_parity(spark):
    """Spark mapInPandas output == direct numpy loop on the same rows."""
    from crawler_spark.functions.codecs import decode, phash64
    from crawler_spark.operators.multimodal import dct_hashes
    from crawler_spark.sources.synth import T1_SMOKE

    rows = [
        (r["image_id"], r["bytes"], r["fmt"])
        for r in (
            T1_SMOKE.payload(f"http://host-2.test/p0/d0/img-{i}")
            for i in range(24)
        )
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    got = {
        r["image_id"]: (r["phash"], r["dct_phash"])
        for r in dct_hashes(df).collect()
    }
    want = {
        image_id: (phash64(decode(data, fmt)), dct_phash64(decode(data, fmt)))
        for image_id, data, fmt in rows
    }
    assert got == want


def test_image_dct_neardup_recalls_contrast_twins(spark):
    """Every planted contrast twin appears as a pair with dct_hamming
    <= 6, and the two hash families disagree in both directions across
    the cohort (the decorrelation the ensemble relies on)."""
    import __spark_entry__ as entry_mod

    out = entry_mod.q_image_dct_neardup(spark, "/root/testdata/sf0.001").collect()
    pairs = {(r.doc_a, r.doc_b): (r.dct_hamming, r.blockhash_hamming) for r in out}
    twins = [(a, b) for (a, b) in pairs if a + "-c" == b or b + "-c" == a]
    assert len(twins) == 16
    assert all(pairs[t][0] <= 6 for t in twins)
    # ensemble-decorrelation claim: the two families flip DIFFERENT
    # bits under re-quantization, so across the cohort each one beats
    # the other on some pair (if they always agreed, shipping both
    # would add nothing to a >=2-of-k ensemble)
    assert any(pairs[t][1] > pairs[t][0] for t in twins)
    assert any(pairs[t][0] > pairs[t][1] for t in twins)
