"""CLI parity surface (crawler_spark/cli.py — the reference's main.py
modes): full_crawl drains the smoke web, single_region's --target
filters the schedule, stats reproduces the §3.3 query path from the
crawl's own tables, resume picks up a drained crawl as a no-op, and
map_test exercises the enrichment fixture path. Runs in-process
(get_spark getOrCreate reuses the test session)."""

import json

import pytest

from crawler_spark.cli import main


def _run(capsys, argv):
    rc = main(argv)
    assert rc == 0
    return capsys.readouterr().out.strip().splitlines()


def test_full_crawl_stats_resume(spark, tmp_path, capsys):
    wd = str(tmp_path / "crawl")
    out = _run(
        capsys,
        ["--mode", "full_crawl", "--workdir", wd, "--web", "t1",
         "--round-seconds", "8.0"],
    )
    total = json.loads(out[-1].removeprefix("TOTAL "))
    assert total["results"] > 0 and total["rounds"] >= 2

    sout = _run(capsys, ["--mode", "stats", "--workdir", wd])
    stats = json.loads("\n".join(sout))
    assert stats["results"] == total["results"]
    assert 0 < stats["success_rate_pct"] <= 100.0
    assert stats["top_hosts"]

    rout = _run(
        capsys,
        ["--mode", "resume", "--workdir", wd, "--web", "t1",
         "--round-seconds", "8.0"],
    )
    rtotal = json.loads(rout[-1].removeprefix("TOTAL "))
    assert rtotal["scheduled"] == 0  # drained crawl resumes as a no-op


def test_single_region_target_filters(spark, tmp_path, capsys):
    out = _run(
        capsys,
        ["--mode", "single_region", "--target", "host-1", "--workdir",
         str(tmp_path / "sr"), "--web", "t1", "--round-seconds", "8.0"],
    )
    total = json.loads(out[-1].removeprefix("TOTAL "))
    assert 0 < total["scheduled"]


def test_map_test_fixture(spark, capsys):
    out = _run(capsys, ["--mode", "map_test"])
    assert out[-1] == "TOTAL found=3/4"
    rows = [json.loads(x) for x in out[:-1]]
    assert [r["enrich_source"] for r in rows] == [
        "primary", "secondary", "secondary", "none",
    ]


def test_arg_validation():
    with pytest.raises(SystemExit):
        main(["--mode", "full_crawl"])  # workdir required
    with pytest.raises(SystemExit):
        main(["--mode", "single_region", "--workdir", "/tmp/x"])  # target
