"""Fetch/parse stage: Arrow-batched ``mapInPandas`` over scheduled frontier
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
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
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

def make_fetch_parse(web: SynthWeb):
    """Build the mapInPandas function over scheduled rows.

    The batch is processed as four row SEGMENTS (fail / result / empty /
    link) with the parent-key columns gathered by vectorized index
    arrays: the per-row python work is exactly the fetcher calls
    (fetch_error / payload / outlinks_raw) plus list appends. The former
    one-dict-per-output-row form spent as long building and re-reading
    ~20-field dicts as it did fetching — at 200k URLs/round that was half
    the fetch stage's CPU. Nullable Int64 arrays are built directly from
    (values, mask) pairs so 64-bit hashes never round-trip through
    float64.
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

    def fetch_parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            urls = pdf["url_canon"].to_numpy(dtype=object)
            hosts = pdf["host"].to_numpy(dtype=object)
            base_int = {
                c: pdf[c].to_numpy()
                for c in (
                    "url_hash", "priority", "eff_priority", "depth",
                    "discovery_seq", "attempts",
                )
            }
            attempts = base_int["attempts"]

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
            seg = np.concatenate(
                [
                    np.asarray(fail_i, dtype=np.int64),
                    np.asarray(res_i, dtype=np.int64),
                    np.asarray(empty_i, dtype=np.int64),
                    np.asarray(link_i, dtype=np.int64),
                ]
            )

            def gather_int(col: np.ndarray) -> pd.arrays.IntegerArray:
                v = col[seg].astype(np.int64, copy=False)
                return pd.arrays.IntegerArray(v, np.zeros(len(v), dtype=bool))

            def result_int(vals: list[int]) -> pd.arrays.IntegerArray:
                v = np.zeros(nf + nr + ne + nl, dtype=np.int64)
                m = np.ones(nf + nr + ne + nl, dtype=bool)
                v[nf : nf + nr] = np.asarray(vals, dtype=np.int64)
                m[nf : nf + nr] = False
                return pd.arrays.IntegerArray(v, m)

            def obj(segments: list[tuple[int, list | np.ndarray | None]]):
                out = np.empty(nf + nr + ne + nl, dtype=object)
                pos = 0
                for ln, vals in segments:
                    if vals is not None:
                        # explicit object dtype: a bare list of bytes would
                        # coerce to a |S fixed-width array mid-assignment
                        seg_arr = np.empty(ln, dtype=object)
                        seg_arr[:] = vals
                        out[pos : pos + ln] = seg_arr
                    pos += ln
                return out

            link_seq_v = np.zeros(nf + nr + ne + nl, dtype=np.int64)
            link_seq_m = np.ones(nf + nr + ne + nl, dtype=bool)
            link_seq_v[nf + nr + ne :] = np.asarray(link_seq, dtype=np.int64)
            link_seq_m[nf + nr + ne :] = False

            yield pd.DataFrame(
                {
                    "kind": obj(
                        [(nf, ["fail"] * nf), (nr, ["result"] * nr),
                         (ne, ["empty"] * ne), (nl, ["link"] * nl)]
                    ),
                    "url_canon": urls[seg],
                    "url_hash": gather_int(base_int["url_hash"]),
                    "host": hosts[seg],
                    "priority": gather_int(base_int["priority"]),
                    "eff_priority": gather_int(base_int["eff_priority"]),
                    "depth": gather_int(base_int["depth"]),
                    "discovery_seq": gather_int(base_int["discovery_seq"]),
                    "attempts": gather_int(base_int["attempts"]),
                    "image_id": obj([(nf, None), (nr, p_img), (ne + nl, None)]),
                    "bytes": obj([(nf, None), (nr, p_bytes), (ne + nl, None)]),
                    "w": result_int(p_w),
                    "h": result_int(p_h),
                    "fmt": obj([(nf, None), (nr, p_fmt), (ne + nl, None)]),
                    "caption": obj([(nf, None), (nr, p_cap), (ne + nl, None)]),
                    "phash": result_int(p_ph),
                    "link_raw": obj(
                        [(nf + nr + ne, None), (nl, link_raw)]
                    ),
                    "link_seq": pd.arrays.IntegerArray(link_seq_v, link_seq_m),
                    "error_reason": obj(
                        [(nf, fail_reason), (nr + ne + nl, None)]
                    ),
                }
            )

    return fetch_parse


def run_fetch(scheduled: DataFrame, web: SynthWeb) -> DataFrame:
    cols = ["url_canon", "url_hash", "host", "priority", "depth",
            "discovery_seq", "attempts"]
    if "eff_priority" not in scheduled.columns:
        scheduled = scheduled.withColumn("eff_priority", F.col("priority"))
    return scheduled.select(*cols, "eff_priority").mapInPandas(
        make_fetch_parse(web), schema=FETCHED_SCHEMA
    )
