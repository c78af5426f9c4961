"""Driver-contract hygiene: the queries()/oracle_sql() registries stay
consistent without spinning up Spark."""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "spark_entry_contract",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "__spark_entry__.py"),
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)


def test_every_oracle_has_a_query():
    q = set(_mod.queries())
    o = set(_mod.oracle_sql())
    assert o <= q, f"orphan oracles: {sorted(o - q)}"


def test_rows_only_queries_are_documented():
    """Every query WITHOUT a SQL oracle must say why in its docstring
    (the driver records a weaker rows-only check; the judge sees
    which) — 'no sql oracle' / 'rows-only' must appear."""
    q = _mod.queries()
    o = set(_mod.oracle_sql())
    undocumented = []
    for name, fn in q.items():
        if name in o:
            continue
        doc = " ".join((fn.__doc__ or "").lower().split())
        if (
            "no sql oracle" not in doc
            and "rows-only" not in doc
            and "rows only" not in doc
        ):
            undocumented.append(name)
    assert not undocumented, undocumented


def test_bench_battery_subset_of_queries():
    import bench

    q = set(_mod.queries())
    missing = [name for name in bench.HEADLINE if name not in q]
    assert not missing, missing


def test_no_duplicate_query_callables_by_name():
    q = _mod.queries()
    names = [fn.__name__ for fn in q.values()]
    assert len(set(names)) == len(names)
