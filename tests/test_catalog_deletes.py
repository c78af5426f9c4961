"""Merge-on-read equality deletes (Iceberg v2 analog) on the snapshot
catalog: delete files instead of data rewrites, sequence-number scoping
(a delete never touches rows committed at or after it), time travel to
pre-delete state, compaction as the materialize-and-clear step, and the
CDC guard (incremental reads across a delete window are unsound and must
refuse).
"""

import pytest

from crawler_spark.sources.catalog import SnapshotCatalog


def _keys(spark, vals):
    return spark.createDataFrame([(int(v),) for v in vals], "k long")


def _rows(spark, vals):
    return spark.createDataFrame(
        [(int(v), f"p{v}") for v in vals], "k long, payload string"
    )


def test_delete_hides_rows_and_time_travels(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "c"), spark)
    cat.stage_append("t", _rows(spark, range(10)))
    s1 = cat.commit()
    cat.stage_delete("t", _keys(spark, [2, 3, 7]))
    s2 = cat.commit()
    assert sorted(r["k"] for r in cat.read("t").collect()) == [0, 1, 4, 5, 6, 8, 9]
    # pre-delete snapshot unaffected
    assert cat.read("t", snapshot=s1).count() == 10
    assert cat.read("t", snapshot=s2).count() == 7


def test_delete_scopes_by_sequence_reappend_resurrects(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "c"), spark)
    cat.stage_append("t", _rows(spark, [1, 2, 3]))
    cat.commit()
    cat.stage_delete("t", _keys(spark, [2]))
    cat.commit()
    # re-append k=2 AFTER the delete: the old delete must not hit it
    cat.stage_append("t", _rows(spark, [2]))
    cat.commit()
    ks = sorted(r["k"] for r in cat.read("t").collect())
    assert ks == [1, 2, 3]
    # and the resurrected row appears exactly once
    assert cat.read("t").filter("k = 2").count() == 1


def test_compact_materializes_and_clears_deletes(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "c"), spark)
    cat.stage_append("t", _rows(spark, range(8)))
    cat.commit()
    cat.stage_delete("t", _keys(spark, [0, 5]))
    pre = cat.commit()
    cat.compact("t", target_bytes=1 << 30)
    assert cat.deletes().get("t", []) == []  # delete files gone
    assert sorted(r["k"] for r in cat.read("t").collect()) == [1, 2, 3, 4, 6, 7]
    # old layout (with live delete files) still time-travels
    assert cat.read("t", snapshot=pre).count() == 6


def test_incremental_read_refuses_delete_window(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "c"), spark)
    cat.stage_append("t", _rows(spark, range(4)))
    s1 = cat.commit()
    cat.stage_append("t", _rows(spark, range(4, 6)))
    s2 = cat.commit()
    # pure appends: fine
    assert cat.read_incremental("t", s1, s2).count() == 2
    cat.stage_delete("t", _keys(spark, [1]))
    s3 = cat.commit()
    with pytest.raises(ValueError, match="equality deletes"):
        cat.read_incremental("t", s1, s3)
    with pytest.raises(ValueError, match="equality deletes"):
        cat.read_incremental("t", s2, s3)
    # windows that end before the delete stay readable
    assert cat.read_incremental("t", s1, s2).count() == 2


def test_read_where_applies_deletes(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "c"), spark)
    cat.stage_append("t", _rows(spark, range(20)))
    cat.commit()
    cat.stage_delete("t", _keys(spark, [12, 13]))
    cat.commit()
    got = sorted(
        r["k"] for r in cat.read_where("t", {"k": (10, 15)}).collect()
    )
    assert got == [10, 11, 14, 15]


def test_overwrite_voids_deletes(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "c"), spark)
    cat.stage_append("t", _rows(spark, range(5)))
    cat.commit()
    cat.stage_delete("t", _keys(spark, [1]))
    cat.commit()
    cat.stage_overwrite("t", _rows(spark, [1, 2]))
    cat.commit()
    assert sorted(r["k"] for r in cat.read("t").collect()) == [1, 2]
    assert cat.deletes().get("t", []) == []


def test_tags_pin_snapshots_through_gc(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "c"), spark)
    for i in range(5):
        cat.stage_overwrite("t", _rows(spark, range(i + 1)))
        cat.commit()
    cat.tag("golden", snapshot=1)
    assert cat.ref("golden") == 1
    cat.expire_snapshots(keep_last=2)
    # tagged snapshot survives GC and still reads
    assert cat.read("t", snapshot=cat.ref("golden")).count() == 2
    # untagged old snapshot is gone
    with pytest.raises(FileNotFoundError):
        cat._manifest(0)
    # dropping the tag releases it for the next GC
    cat.drop_tag("golden")
    cat.stage_overwrite("t", _rows(spark, range(9)))
    cat.commit()
    cat.expire_snapshots(keep_last=2)
    with pytest.raises(FileNotFoundError):
        cat._manifest(1)


def test_mixed_keyset_deletes_apply_independently(spark, tmp_path):
    """Two delete files with DIFFERENT equality-column sets in the same
    read window must each anti-join on their own key set (Iceberg
    semantics) — schema-merging them into one frame would null-pad and
    delete the wrong rows (or none)."""
    cat = SnapshotCatalog(str(tmp_path / "c"), spark)
    cat.stage_append("t", _rows(spark, range(6)))
    cat.commit()
    cat.stage_delete("t", _keys(spark, [1]))  # keyed on k
    cat.commit()
    cat.stage_delete(  # keyed on payload
        "t", spark.createDataFrame([("p4",)], "payload string")
    )
    cat.commit()
    assert sorted(r["k"] for r in cat.read("t").collect()) == [0, 2, 3, 5]


def test_position_delete_removes_exact_physical_rows(spark, tmp_path):
    """Position deletes (the second Iceberg v2 delete form) remove the
    EXACT physical rows — even when key columns are duplicated, which
    equality deletes cannot distinguish — respect sequence scoping,
    and reject malformed position frames."""
    from pyspark.sql import functions as F

    cat = SnapshotCatalog(str(tmp_path / "c"), spark)
    # two physically identical rows (k=5) among others
    cat.stage_append(
        "t",
        spark.createDataFrame(
            [(5, "dup"), (5, "dup"), (1, "a"), (2, "b")], "k long, payload string"
        ),
    )
    cat.commit()
    pos = (
        cat.read_with_positions("t")
        .filter(F.col("k") == 5)
        .orderBy("_pos")
        .limit(1)
        .select("_file", "_pos")
    )
    cat.stage_position_delete("t", pos)
    cat.commit()
    rows = cat.read("t").collect()
    assert sorted(r["k"] for r in rows) == [1, 2, 5]  # ONE of the dups gone
    # sequence scoping: re-append k=5 afterwards; old position delete
    # must not touch the new file's row 0
    cat.stage_append("t", spark.createDataFrame([(5, "new")], "k long, payload string"))
    cat.commit()
    assert sorted(r["k"] for r in cat.read("t").collect()) == [1, 2, 5, 5]
    # compaction materializes and clears
    cat.compact("t", target_bytes=1 << 30)
    assert cat.deletes().get("t", []) == []
    assert sorted(r["k"] for r in cat.read("t").collect()) == [1, 2, 5, 5]
    import pytest

    with pytest.raises(ValueError, match="_file, _pos"):
        cat.stage_position_delete(
            "t", spark.createDataFrame([(1,)], "k long")
        )


def test_write_audit_publish_flow(spark, tmp_path):
    """WAP: an unpublished commit is invisible to default readers but
    auditable by snapshot id; publishing flips the pointer atomically;
    a stale audit (head moved) is refused; an abandoned audit never
    surfaces and a subsequent commit does not collide with its id."""
    import pytest

    cat = SnapshotCatalog(str(tmp_path / "c"), spark)
    cat.stage_append("t", _rows(spark, [1, 2]))
    cat.commit()
    # stage round 2 under audit
    cat.stage_append("t", _rows(spark, [3]))
    audit_sid = cat.commit(publish=False)
    assert sorted(r["k"] for r in cat.read("t").collect()) == [1, 2]  # hidden
    assert sorted(
        r["k"] for r in cat.read("t", snapshot=audit_sid).collect()
    ) == [1, 2, 3]  # auditable
    assert f"wap-{audit_sid}" in cat.refs()  # GC-protected while auditing
    cat.publish_snapshot(audit_sid)
    assert sorted(r["k"] for r in cat.read("t").collect()) == [1, 2, 3]
    assert f"wap-{audit_sid}" not in cat.refs()
    # stale audit: two audits from the same head; publishing the first
    # moves the head, the second must be refused
    cat.stage_append("t", _rows(spark, [4]))
    a1 = cat.commit(publish=False)
    cat.stage_append("t", _rows(spark, [5]))
    a2 = cat.commit(publish=False)
    assert a1 != a2  # no id collision between in-flight audits
    cat.publish_snapshot(a1)
    with pytest.raises(ValueError, match="re-stage"):
        cat.publish_snapshot(a2)
    # abandoned a2 never surfaces; next commit is collision-free
    cat.stage_append("t", _rows(spark, [6]))
    s3 = cat.commit()
    assert s3 > a2
    ks = sorted(r["k"] for r in cat.read("t").collect())
    assert ks == [1, 2, 3, 4, 6]  # 5 was only in the refused audit


def test_fuzz_position_and_equality_delete_interleavings(spark, tmp_path):
    """Round-3 VERDICT item 8: randomized interleavings of appends,
    equality deletes (both (k) and (k, v) key shapes), position
    deletes, and compactions — after every schedule, ``read()`` must
    equal a pure-Python shadow table that implements the Iceberg
    sequence-scoping rules directly (a delete applies only to data
    dirs committed strictly before it; compaction materializes the
    live set under a fresh sequence and clears delete files). 200
    deterministic schedules, duplicate (k, v) rows included."""
    import numpy as np
    from collections import Counter
    from pyspark.sql import functions as F

    rng = np.random.default_rng(2024)
    n_schedules = 200

    for sched in range(n_schedules):
        cat = SnapshotCatalog(str(tmp_path / f"f{sched}"), spark)
        shadow: list[dict] = []  # {k, v, seq}
        vc = 0

        def commit_seq():
            return cat.current_id() + 1  # the seq staged ops will carry

        n_ops = int(rng.integers(3, 7))
        for op_i in range(n_ops):
            op = (
                "append" if op_i == 0
                else rng.choice(
                    ["append", "eq_k", "eq_kv", "pos", "compact"],
                    p=[0.35, 0.15, 0.15, 0.2, 0.15],
                )
            )
            if op == "append":
                n = int(rng.integers(1, 6))
                ks = rng.integers(0, 5, size=n)
                # v collides on purpose: duplicate (k, v) rows must
                # delete/survive as a multiset, not a set
                vs = [(vc + i) % 7 for i in range(n)]
                vc += n
                s = commit_seq()
                cat.stage_append(
                    "t",
                    spark.createDataFrame(
                        [(int(k), int(v)) for k, v in zip(ks, vs)],
                        "k long, v long",
                    ),
                )
                cat.commit()
                shadow.extend(
                    {"k": int(k), "v": int(v), "seq": s}
                    for k, v in zip(ks, vs)
                )
            elif op == "eq_k":
                kill = {int(x) for x in rng.integers(0, 5, size=2)}
                s = commit_seq()
                cat.stage_delete(
                    "t",
                    spark.createDataFrame([(k,) for k in kill], "k long"),
                )
                cat.commit()
                shadow = [
                    r for r in shadow
                    if not (r["seq"] < s and r["k"] in kill)
                ]
            elif op == "eq_kv":
                if shadow and rng.random() < 0.8:
                    pick = [shadow[int(i)] for i in
                            rng.integers(0, len(shadow), size=2)]
                    kill = {(r["k"], r["v"]) for r in pick}
                else:  # sometimes a miss (keys not in the table)
                    kill = {(99, 99)}
                s = commit_seq()
                cat.stage_delete(
                    "t",
                    spark.createDataFrame(
                        [(int(k), int(v)) for k, v in kill],
                        "k long, v long",
                    ),
                )
                cat.commit()
                shadow = [
                    r for r in shadow
                    if not (r["seq"] < s and (r["k"], r["v"]) in kill)
                ]
            elif op == "pos":
                m = int(rng.integers(0, 3))
                s = commit_seq()
                sel = (
                    cat.read_with_positions("t")
                    .filter(F.col("v") % 3 == m)
                    .select("_file", "_pos")
                )
                cat.stage_position_delete("t", sel)
                cat.commit()
                # every live physical row matching the predicate was
                # selected; all carry seq < s by construction
                shadow = [r for r in shadow if r["v"] % 3 != m]
            else:  # compact
                s = commit_seq()
                cat.compact("t", target_bytes=1 << 30)
                assert cat.deletes().get("t", []) == []
                for r in shadow:
                    r["seq"] = s

            got = Counter(
                (r["k"], r["v"]) for r in cat.read("t").collect()
            )
            want = Counter((r["k"], r["v"]) for r in shadow)
            assert got == want, (sched, op_i, op, got, want)
