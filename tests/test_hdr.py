"""HDR log-linear quantile sketch (operators/sketches.py hdr_buckets /
hdr_quantiles): the relative-error guarantee and the merge property.

The sketch exists for the 100 TB case where exact `percentile` can't
hold a group's values in one task: state is capped at 64*SUB rows per
group, and merging = summing bucket counts. These tests pin the two
claims the design rests on:

* every quantile estimate is within 1/(2*SUB) relative error of the
  exact nearest-rank value (the bucket-midpoint bound, by construction);
* merging per-group sketches gives BIT-IDENTICAL buckets to sketching
  the union directly (the roll-up the fleet row in
  hdr_latency_quantiles relies on).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.sketches import HDR_SUB, hdr_buckets, hdr_quantiles

QS = (500, 950, 990)


@pytest.fixture(scope="module")
def lat_df(spark):
    rng = np.random.default_rng(7)
    # lognormal-ish positive integer latencies across 5 hosts, spanning
    # several octaves so bucket logic sees e from 0 to ~14
    rows = [
        (f"h{int(i % 5)}", int(v))
        for i, v in enumerate(
            np.clip(np.exp(rng.normal(4.0, 1.5, size=4000)), 1, 20000).astype(int)
        )
    ]
    return spark.createDataFrame(rows, "host string, lat long")


def test_quantile_estimates_within_bound(spark, lat_df):
    sk = hdr_buckets(lat_df, "lat", ["host"])
    got = {
        (r["host"], r["q_permille"]): (r["est_mid"], r["n"], r["rnk"])
        for r in hdr_quantiles(sk, ["host"], QS).collect()
    }
    pdf = lat_df.toPandas()
    bound = 1.0 / (2 * HDR_SUB)
    for host, grp in pdf.groupby("host"):
        vals = np.sort(grp["lat"].to_numpy())
        n = len(vals)
        for q in QS:
            rank = -(-q * n // 1000)  # ceil(q*n/1000)
            exact = float(vals[rank - 1])
            est, got_n, got_rnk = got[(host, q)]
            assert got_n == n and got_rnk == rank
            assert abs(est - exact) / exact <= bound, (host, q, est, exact)


def test_merge_equals_sketch_of_union(spark, lat_df):
    per_host = hdr_buckets(lat_df, "lat", ["host"])
    merged = (
        per_host.groupBy("e", "m").agg(F.sum("cnt").alias("cnt")).collect()
    )
    direct = hdr_buckets(lat_df, "lat").collect()
    assert {(r["e"], r["m"]): r["cnt"] for r in merged} == {
        (r["e"], r["m"]): r["cnt"] for r in direct
    }


def test_bucket_math_is_integer_exact(spark):
    # boundary values: exact powers of two land in m=0 of their octave,
    # one below lands in the top sub-bucket of the previous octave
    df = spark.createDataFrame(
        [(int(v),) for v in (1, 2, 3, 15, 16, 17, 1023, 1024, 1025)],
        "lat long",
    )
    rows = {
        (r["e"], r["m"]): r["cnt"]
        for r in hdr_buckets(df, "lat").collect()
    }
    def em(v):
        e = v.bit_length() - 1
        return e, ((v - (1 << e)) * HDR_SUB) // (1 << e)
    expect = {}
    for v in (1, 2, 3, 15, 16, 17, 1023, 1024, 1025):
        expect[em(v)] = expect.get(em(v), 0) + 1
    assert rows == expect
