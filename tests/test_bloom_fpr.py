"""Bloom false-positive-rate audit: the measured FPR of the engine's
BucketedBloom must track the textbook estimate (1 - e^(-kn/m))^k — the
number SCALE.md's 10^10 URL-seen sizing math relies on. Inserted keys
must NEVER read negative (zero false negatives is the anti-join safety
contract: a false negative would skip the exact join and re-enqueue a
seen URL)."""

import math

import numpy as np
from pyspark.sql import functions as F

from crawler_spark.operators.seen import (
    BucketedBloom,
    bloom_delta_rows,
    merge_bloom_rows,
)

CFG = {"n_buckets": 4, "m_bits": 1 << 15, "k": 5}  # small m -> measurable FPR


def _keys(spark, n, salt):
    return spark.range(n).select(
        F.xxhash64(F.concat(F.lit(salt), F.col("id").cast("string"))).alias(
            "url_hash"
        )
    )


def test_bloom_fpr_tracks_theory_and_no_false_negatives(spark):
    n_in, n_probe = 8000, 20000
    inserted = _keys(spark, n_in, "in-")
    bloom = BucketedBloom.from_rows(
        merge_bloom_rows(bloom_delta_rows(inserted, **CFG)).collect(), **CFG
    )

    # zero false negatives on every inserted key
    ins = np.array([r["url_hash"] for r in inserted.collect()], dtype=np.int64)
    assert bloom.contains_many(ins).all()

    # measured FPR on disjoint probes vs theory for the PER-BUCKET load
    probes = np.array(
        [r["url_hash"] for r in _keys(spark, n_probe, "out-").collect()],
        dtype=np.int64,
    )
    probes = np.setdiff1d(probes, ins)
    measured = bloom.contains_many(probes).mean()
    m, k = CFG["m_bits"], CFG["k"]
    n_per_bucket = n_in / CFG["n_buckets"]
    theory = (1.0 - math.exp(-k * n_per_bucket / m)) ** k
    assert theory > 0.001  # the config genuinely stresses the filter
    # within 2x of theory in both directions (hash quality check)
    assert theory / 2 <= measured <= theory * 2, (measured, theory)
