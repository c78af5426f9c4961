"""Fetch/parse stage: Arrow-batched ``mapInArrow`` over scheduled frontier
rows — the UDTF-shaped stage (one page -> many records).

Reference parity: navigate + extract_data (reference:
src/crawler/crawler.py:30, :559-683) — the browser fetch and in-page JS
projection become one vectorized batch stage. The fetcher is pluggable;
tests/bench use the deterministic :class:`SynthWeb` so executors and the
oracle agree. A real deployment swaps ``make_fetch_parse``'s inner
``fetch_one`` for batched HTTP.

Output is a single union-schema DataFrame tagged by ``kind``:
  'result' — leaf page payload (input_hint image+caption schema)
  'link'   — raw outlink + sibling index (document order within the page)
  'fail'   — fetch failure + error_reason (failed-stores CSV analog,
             reference: src/crawler/base_crawler.py:350-362)
One pass produces all three; the round driver filters and persists.

Link rows carry the PARENT's full ordering key (priority, depth,
discovery_seq, url_hash) plus ``link_seq`` = sibling index. The round
driver orders new discoveries by (parent key, sibling) and assigns each
a dense global ``discovery_seq`` via ``operators/sequence.py`` — the
encounter order of a sequential crawler, computed as a batch. (The
previous positional-radix encoding, parent_seq*4096+sibling, consumed
12 bits per depth level and overflowed int64 at depth >= 6.)

The stage is ``mapInArrow``, not ``mapInPandas``: the worker reads the
input columns straight off the Arrow record batch and writes the output
columns back as Arrow arrays, so no pandas block manager, no Int64
extension-array layer, and no per-batch pandas<->Arrow conversion copies
exist on either side of the boundary. Parent-key columns are gathered
with Arrow ``take`` — the URL/host strings of link and result rows never
re-box through python at all. At 2-8 pinned cores this stage is memory-
bandwidth-sensitive (local mode shares one memory controller across
workers — see BENCH/BASELINE.md), so removed copies buy scaling, not
just wall time.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawler_spark.sources.synth import SynthWeb

FETCHED_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("url_canon", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("host", T.StringType()),
        T.StructField("priority", T.IntegerType()),
        # the key the row actually scheduled under this round (aged when
        # run_round(aging_every=...) is on, == priority otherwise); link
        # expansion orders children by it so the oracle stays exact
        T.StructField("eff_priority", T.IntegerType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("discovery_seq", T.LongType()),
        T.StructField("attempts", T.IntegerType()),  # prior attempt count
        # result payload (input_hint)
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
        # link
        T.StructField("link_raw", T.StringType()),
        T.StructField("link_seq", T.LongType()),
        # failure
        T.StructField("error_reason", T.StringType()),
    ]
)

# Arrow twin of FETCHED_SCHEMA (Spark maps string->utf8, binary->binary,
# int->int32, long->int64); mapInArrow requires yielded batches to carry
# exactly these names and types
_PA_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),
        ("url_canon", pa.string()),
        ("url_hash", pa.int64()),
        ("host", pa.string()),
        ("priority", pa.int32()),
        ("eff_priority", pa.int32()),
        ("depth", pa.int32()),
        ("discovery_seq", pa.int64()),
        ("attempts", pa.int32()),
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
        ("link_raw", pa.string()),
        ("link_seq", pa.int64()),
        ("error_reason", pa.string()),
    ]
)


def make_fetch_parse(web: SynthWeb):
    """Build the mapInArrow function over scheduled rows.

    The batch is processed as four row SEGMENTS (fail / result / empty /
    link): the per-row python work is exactly the fetcher calls
    (fetch_error / payload / outlinks_raw) plus list appends. Parent-key
    columns are gathered from the INPUT Arrow arrays with ``take`` over
    one concatenated index array — zero python objects for those nine
    columns; nullable int columns are built from (values, mask) numpy
    pairs so 64-bit hashes never round-trip through float64.
    """
    import inspect

    # SynthWeb's fetch_error/payload accept a precomputed url hash (saves
    # one xxh64 per leaf); other fetchers behind this seam (e.g.
    # sources/fakehttp.py) may not — detect once, not per row.
    _takes_uh = (
        "uh" in inspect.signature(web.payload).parameters
        and "uh" in inspect.signature(web.fetch_error).parameters
    )
    if _takes_uh:
        from crawler_spark.sources.synth import _uh

    def fetch_parse(
        batches: Iterator[pa.RecordBatch],
    ) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            n = rb.num_rows
            col = {name: rb.column(i) for i, name in enumerate(rb.schema.names)}
            # the fetch loop needs python urls + attempt ints; everything
            # else stays Arrow-side
            urls = col["url_canon"].to_pylist()
            attempts = col["attempts"].to_numpy(zero_copy_only=False)

            fail_i: list[int] = []
            fail_reason: list[str] = []
            res_i: list[int] = []
            p_img: list[str] = []
            p_bytes: list[bytes] = []
            p_w: list[int] = []
            p_h: list[int] = []
            p_fmt: list[str] = []
            p_cap: list[str] = []
            p_ph: list[int] = []
            empty_i: list[int] = []
            link_i: list[int] = []  # parent row index, repeated per link
            link_raw: list[str] = []
            link_seq: list[int] = []

            is_leaf = web.is_leaf
            fetch_error = web.fetch_error
            payload = web.payload
            outlinks_raw = web.outlinks_raw
            for i in range(n):
                url = urls[i]
                leaf = is_leaf(url)
                if leaf and _takes_uh:
                    h = _uh(url)
                    err = fetch_error(url, attempt=int(attempts[i]) + 1, uh=h)
                else:
                    err = fetch_error(url, attempt=int(attempts[i]) + 1)
                if err is not None:
                    fail_i.append(i)
                    fail_reason.append(err)
                    continue
                if leaf:
                    p = payload(url, uh=h) if _takes_uh else payload(url)
                    res_i.append(i)
                    p_img.append(p["image_id"])
                    p_bytes.append(p["bytes"])
                    p_w.append(p["w"])
                    p_h.append(p["h"])
                    p_fmt.append(p["fmt"])
                    p_cap.append(p["caption"])
                    p_ph.append(p["phash"])
                    continue
                links = outlinks_raw(url)
                if not links:
                    # navigable page with no results — still a "result" of
                    # zero records; record nothing but count as fetched
                    empty_i.append(i)
                    continue
                link_i.extend([i] * len(links))
                link_raw.extend(links)
                link_seq.extend(range(len(links)))  # sibling/document order

            nf, nr, ne, nl = len(fail_i), len(res_i), len(empty_i), len(link_i)
            total = nf + nr + ne + nl
            seg = pa.array(
                np.concatenate(
                    [
                        np.asarray(fail_i, dtype=np.int64),
                        np.asarray(res_i, dtype=np.int64),
                        np.asarray(empty_i, dtype=np.int64),
                        np.asarray(link_i, dtype=np.int64),
                    ]
                )
            )

            def result_int(vals: list[int], np_t, pa_t) -> pa.Array:
                v = np.zeros(total, dtype=np_t)
                m = np.ones(total, dtype=bool)
                v[nf : nf + nr] = np.asarray(vals, dtype=np_t)
                m[nf : nf + nr] = False
                return pa.array(v, type=pa_t, mask=m)

            def str_col(segments, pa_t=pa.string()) -> pa.Array:
                # (count, values-or-None) segments -> one nullable array
                out: list = []
                for ln, vals in segments:
                    out.extend(vals if vals is not None else [None] * ln)
                return pa.array(out, type=pa_t)

            link_seq_v = np.zeros(total, dtype=np.int64)
            link_seq_m = np.ones(total, dtype=bool)
            link_seq_v[nf + nr + ne :] = np.asarray(link_seq, dtype=np.int64)
            link_seq_m[nf + nr + ne :] = False

            yield pa.RecordBatch.from_arrays(
                [
                    str_col(
                        [(nf, ["fail"] * nf), (nr, ["result"] * nr),
                         (ne, ["empty"] * ne), (nl, ["link"] * nl)]
                    ),
                    col["url_canon"].take(seg),
                    col["url_hash"].take(seg),
                    col["host"].take(seg),
                    col["priority"].take(seg),
                    col["eff_priority"].take(seg),
                    col["depth"].take(seg),
                    col["discovery_seq"].take(seg),
                    col["attempts"].take(seg),
                    str_col([(nf, None), (nr, p_img), (ne + nl, None)]),
                    str_col(
                        [(nf, None), (nr, p_bytes), (ne + nl, None)],
                        pa_t=pa.binary(),
                    ),
                    result_int(p_w, np.int32, pa.int32()),
                    result_int(p_h, np.int32, pa.int32()),
                    str_col([(nf, None), (nr, p_fmt), (ne + nl, None)]),
                    str_col([(nf, None), (nr, p_cap), (ne + nl, None)]),
                    result_int(p_ph, np.int64, pa.int64()),
                    str_col([(nf + nr + ne, None), (nl, link_raw)]),
                    pa.array(link_seq_v, type=pa.int64(), mask=link_seq_m),
                    str_col([(nf, fail_reason), (nr + ne + nl, None)]),
                ],
                schema=_PA_SCHEMA,
            )

    return fetch_parse


def run_fetch(scheduled: DataFrame, web: SynthWeb) -> DataFrame:
    cols = ["url_canon", "url_hash", "host", "priority", "depth",
            "discovery_seq", "attempts"]
    if "eff_priority" not in scheduled.columns:
        scheduled = scheduled.withColumn("eff_priority", F.col("priority"))
    return scheduled.select(*cols, "eff_priority").mapInArrow(
        make_fetch_parse(web), schema=FETCHED_SCHEMA
    )
