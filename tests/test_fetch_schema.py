"""The fetch stage's Arrow schema twin must track FETCHED_SCHEMA.

mapInArrow validates yielded batches against the declared Spark schema
at RUNTIME, per batch — a drift between _PA_SCHEMA and FETCHED_SCHEMA
would surface as a mid-crawl task failure, not an import error. Pin the
correspondence structurally so it fails at test time instead.
"""

import pyarrow as pa
from pyspark.sql import types as T

from crawler_spark.operators.fetch import _PA_SCHEMA, FETCHED_SCHEMA

_SPARK_TO_ARROW = {
    T.StringType(): pa.string(),
    T.BinaryType(): pa.binary(),
    T.IntegerType(): pa.int32(),
    T.LongType(): pa.int64(),
}


def test_arrow_schema_mirrors_spark_schema():
    assert [f.name for f in FETCHED_SCHEMA.fields] == _PA_SCHEMA.names
    for sf, name in zip(FETCHED_SCHEMA.fields, _PA_SCHEMA.names):
        expected = _SPARK_TO_ARROW[sf.dataType]
        assert _PA_SCHEMA.field(name).type == expected, (
            f"{name}: spark {sf.dataType} -> arrow "
            f"{_PA_SCHEMA.field(name).type}, expected {expected}"
        )


def test_fetch_batch_carries_exact_schema(spark):
    """An end-to-end batch through make_fetch_parse carries _PA_SCHEMA
    verbatim (names, types, order) — what mapInArrow checks per batch."""
    import numpy as np
    import pyarrow as pa

    from crawler_spark.operators.fetch import make_fetch_parse
    from crawler_spark.sources.synth import SynthWeb

    web = SynthWeb(n_hosts=2)
    urls = ["http://host-0.test/", "http://host-0.test/p0/d0/img-1"]
    n = len(urls)
    rb = pa.RecordBatch.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(np.arange(n), pa.int64()),
            pa.array(["host-0.test"] * n, pa.string()),
            pa.array(np.zeros(n, dtype=np.int32), pa.int32()),
            pa.array(np.zeros(n, dtype=np.int32), pa.int32()),
            pa.array(np.arange(n), pa.int64()),
            pa.array(np.zeros(n, dtype=np.int32), pa.int32()),
            pa.array(np.zeros(n, dtype=np.int32), pa.int32()),
        ],
        names=[
            "url_canon", "url_hash", "host", "priority", "depth",
            "discovery_seq", "attempts", "eff_priority",
        ],
    )
    out = list(make_fetch_parse(web)(iter([rb])))
    assert len(out) == 1
    assert out[0].schema.equals(_PA_SCHEMA)
    kinds = set(out[0].column(0).to_pylist())
    assert "link" in kinds and ("result" in kinds or "fail" in kinds)
