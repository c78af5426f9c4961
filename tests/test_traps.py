"""Spider-trap detection: per-URL signals against hand-computed values,
host report thresholds in both directions."""

from crawler_spark.operators.traps import host_trap_report, trap_signals


def _urls(spark, rows):
    return spark.createDataFrame(rows, "host string, url string")


def test_trap_signals_hand_values(spark):
    rows = [
        ("a.test", "http://a.test/cal/2024/2024/2024/p"),
        ("a.test", "http://a.test/x/y/z"),
        ("a.test", "http://a.test/"),
        ("a.test", "http://a.test/item/12?page=3#frag"),
        ("a.test", "http://a.test/a/b/a/b/a"),
    ]
    got = {
        r["url"]: (r["path_depth"], r["max_seg_repeat"], r["path_template"])
        for r in trap_signals(_urls(spark, rows)).collect()
    }
    assert got["http://a.test/cal/2024/2024/2024/p"] == (5, 3, "/cal/N/N/N/p")
    assert got["http://a.test/x/y/z"] == (3, 1, "/x/y/z")
    assert got["http://a.test/"] == (0, 0, "/")
    # query string and fragment are not part of the path
    assert got["http://a.test/item/12?page=3#frag"] == (2, 1, "/item/N")
    assert got["http://a.test/a/b/a/b/a"] == (5, 3, "/a/b/a/b/a")


def test_host_trap_report_flags_and_clears(spark):
    rows = (
        # clean host: distinct shallow paths, distinct templates
        [("clean.test", f"http://clean.test/s{chr(97 + i)}/item") for i in range(6)]
        # loop host: one URL with a 3-run segment
        + [
            ("loop.test", "http://loop.test/cal/2024/2024/2024/p"),
            ("loop.test", "http://loop.test/ok"),
        ]
        # mill host: one template, many members
        + [("mill.test", f"http://mill.test/p/{i}") for i in range(10)]
    )
    rep = {
        r["host"]: r.asDict()
        for r in host_trap_report(
            _urls(spark, rows), repeat_threshold=3, template_threshold=10
        ).collect()
    }
    assert not rep["clean.test"]["trap_suspect"]
    assert rep["clean.test"]["n_templates"] == 6
    assert rep["loop.test"]["trap_suspect"]
    assert rep["loop.test"]["max_seg_repeat"] == 3
    assert rep["mill.test"]["trap_suspect"]
    assert rep["mill.test"]["n_templates"] == 1
    assert rep["mill.test"]["max_urls_per_template"] == 10
    assert rep["mill.test"]["avg_path_depth"] == 2.0
    # raising the thresholds clears both flags
    rep2 = {
        r["host"]: r["trap_suspect"]
        for r in host_trap_report(
            _urls(spark, rows), repeat_threshold=4, template_threshold=11
        ).collect()
    }
    assert rep2 == {"clean.test": False, "loop.test": False, "mill.test": False}


def test_url_prefix_rollup_hand_case(spark):
    from crawler_spark.operators.traps import url_prefix_rollup

    urls = spark.createDataFrame(
        [
            ("h", "http://h/a/b/c"),
            ("h", "http://h/a/b"),
            ("h", "http://h/a/x"),
            ("h", "http://h/"),          # rootonly: no segments, dropped
            ("g", "http://g/a?q=1"),     # query stripped from the path
        ],
        "host string, url string",
    )
    got = {
        (r["host"], r["prefix"]): (r["depth"], r["n_urls"], r["n_exact"])
        for r in url_prefix_rollup(urls, max_depth=6).collect()
    }
    assert got[("h", "/a")] == (1, 3, 0)
    assert got[("h", "/a/b")] == (2, 2, 1)
    assert got[("h", "/a/b/c")] == (3, 1, 1)
    assert got[("h", "/a/x")] == (2, 1, 1)
    assert got[("g", "/a")] == (1, 1, 1)
    assert ("h", "/") not in got


def test_front_coding_hand_case(spark):
    from crawler_spark.operators.traps import front_coding_estimate

    urls = spark.createDataFrame(
        [
            ("h", "http://h/aaa/one"),
            ("h", "http://h/aaa/two"),
            ("h", "http://h/bbb"),
            ("g", "http://g/x"),
        ],
        "host string, url string",
    )
    got = {r["host"]: r for r in front_coding_estimate(urls, cap=48).collect()}
    # sorted: /aaa/one, /aaa/two, /bbb -> lcps 0, 13 ("http://h/aaa/"),
    # 9 ("http://h/")
    h = got["h"]
    assert h["n_urls"] == 3
    assert h["bytes_flat"] == 16 + 16 + 12
    assert h["bytes_front"] == (16 + 2) + (16 - 13 + 2) + (12 - 9 + 2)
    g = got["g"]
    assert g["bytes_front"] == g["bytes_flat"] + 2  # single URL: overhead only
