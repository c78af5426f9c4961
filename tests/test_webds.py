"""Custom Python DataSource (sources/webds.py): batch parity with an
independent walk, filter pushdown pruning, streaming level waves."""

import time

import pytest
from pyspark.sql.datasource import EqualTo, GreaterThan, In, LessThanOrEqual

from crawler_spark.functions.canon import normalize_url
from crawler_spark.sources.synth import SynthWeb
from crawler_spark.sources.webds import (
    SynthWebDataSource,
    SynthWebReader,
)


def _mirror_walk(n_hosts, max_depth=None):
    """Independent BFS enumeration of the synth web (canonical urls)."""
    web = SynthWeb(n_hosts=n_hosts)
    out = []
    for i in range(n_hosts):
        seen = set()
        level = [(normalize_url(web.root(i)), None)]
        seen.add(level[0][0])
        depth = 0
        while level:
            nxt = []
            for url, parent in level:
                leaf = web.is_leaf(url)
                out.append((url, web.host(i), depth, parent, leaf))
                if leaf or (max_depth is not None and depth >= max_depth):
                    continue
                for raw in web.outlinks_raw(url):
                    c = normalize_url(raw)
                    if c not in seen:
                        seen.add(c)
                        nxt.append((c, url))
            level = nxt
            depth += 1
    return sorted(out)


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(SynthWebDataSource)
    return spark


def test_batch_read_matches_independent_walk(registered):
    df = registered.read.format("synthweb").option("n_hosts", 4).load()
    got = sorted(
        (r.url, r.host, r.depth, r.parent, r.is_leaf) for r in df.collect()
    )
    assert got == _mirror_walk(4)


def test_filter_pushdown_prunes_hosts_and_depth(registered):
    """Pushed host/depth predicates produce exactly the mirror's
    answer — while the reader-level unit test below proves the pruning
    actually happened at the SOURCE, not post-scan."""
    df = registered.read.format("synthweb").option("n_hosts", 4).load()
    one = df.filter("host = 'host-2.test'")
    assert sorted(
        (r.url, r.depth) for r in one.collect()
    ) == sorted((u, d) for u, h, d, p, l in _mirror_walk(4) if h == "host-2.test")
    shallow = df.filter("depth <= 1")
    assert sorted((r.url, r.depth) for r in shallow.collect()) == sorted(
        (u, d) for u, h, d, p, l in _mirror_walk(4) if d <= 1
    )


def test_reader_pushdown_unit():
    """pushFilters contract: host EqualTo/In prune partitions, depth
    bounds tighten the walk, everything else is handed back."""
    r = SynthWebReader({"n_hosts": "4"})
    leftover = list(
        r.pushFilters(
            [
                EqualTo(("host",), "host-1.test"),
                LessThanOrEqual(("depth",), 2),
                GreaterThan(("depth",), 0),  # unsupported -> returned
            ]
        )
    )
    assert len(leftover) == 1 and isinstance(leftover[0], GreaterThan)
    parts = r.partitions()
    assert [p.host_idx for p in parts] == [1]
    assert r.max_depth == 2

    r2 = SynthWebReader({"n_hosts": "4"})
    list(r2.pushFilters([In(("host",), ("host-0.test", "host-3.test"))]))
    assert [p.host_idx for p in r2.partitions()] == [0, 3]


def test_stream_emits_one_level_per_batch(registered, tmp_path):
    q = (
        registered.readStream.format("synthweb")
        .option("n_hosts", 3)
        .option("max_depth", 3)
        .load()
        .writeStream.format("memory")
        .queryName("webds_waves")
        .outputMode("append")
        .start()
    )
    want = _mirror_walk(3)
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            n = registered.sql(
                "select count(*) c from webds_waves"
            ).first().c
            if n >= len(want):
                break
            time.sleep(1)
    finally:
        q.stop()
    rows = registered.sql("select * from webds_waves").collect()
    got = sorted((r.url, r.host, r.depth, r.parent, r.is_leaf) for r in rows)
    assert got == want  # stream == batch == mirror
    # one BFS level per micro-batch: batch k contains only depth-k rows
    per_depth = registered.sql(
        "select depth, count(*) n from webds_waves group by depth"
    ).collect()
    assert {r.depth for r in per_depth} == {0, 1, 2, 3}
