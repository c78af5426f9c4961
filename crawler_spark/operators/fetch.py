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

_NULLS = {f.name: None for f in FETCHED_SCHEMA.fields}


def make_fetch_parse(web: SynthWeb):
    """Build the mapInPandas function over scheduled rows."""

    def fetch_parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for row in pdf.itertuples(index=False):
                base = dict(_NULLS)
                base.update(
                    url_canon=row.url_canon,
                    url_hash=int(row.url_hash),
                    host=row.host,
                    priority=int(row.priority),
                    eff_priority=int(row.eff_priority),
                    depth=int(row.depth),
                    discovery_seq=int(row.discovery_seq),
                    attempts=int(row.attempts),
                )
                err = web.fetch_error(row.url_canon, attempt=int(row.attempts) + 1)
                if err is not None:
                    out.append({**base, "kind": "fail", "error_reason": err})
                    continue
                if web.is_leaf(row.url_canon):
                    out.append({**base, "kind": "result", **web.payload(row.url_canon)})
                    continue
                links = web.outlinks_raw(row.url_canon)
                if not links:
                    # navigable page with no results — still a "result" of
                    # zero records; record nothing but count as fetched
                    out.append({**base, "kind": "empty"})
                for i, raw in enumerate(links):
                    out.append(
                        {
                            **base,
                            "kind": "link",
                            "link_raw": raw,
                            "link_seq": i,  # sibling index (document order)
                        }
                    )
            # build columns explicitly: pd.DataFrame(list-of-dicts) infers
            # float64 for int+None columns, silently rounding 64-bit hashes
            # past 2^53 — nullable Int64 arrays keep them exact
            int_cols = {
                "phash", "link_seq", "w", "h", "url_hash", "discovery_seq",
                "priority", "eff_priority", "attempts",
            }
            names = [f.name for f in FETCHED_SCHEMA.fields]
            pdf_out = pd.DataFrame(
                {
                    n: (
                        pd.array([r[n] for r in out], dtype="Int64")
                        if n in int_cols
                        else pd.array([r[n] for r in out], dtype=object)
                    )
                    for n in names
                }
            )
            yield pdf_out

    return fetch_parse


def run_fetch(scheduled: DataFrame, web: SynthWeb) -> DataFrame:
    cols = ["url_canon", "url_hash", "host", "priority", "depth",
            "discovery_seq", "attempts"]
    if "eff_priority" not in scheduled.columns:
        scheduled = scheduled.withColumn("eff_priority", F.col("priority"))
    return scheduled.select(*cols, "eff_priority").mapInPandas(
        make_fetch_parse(web), schema=FETCHED_SCHEMA
    )
