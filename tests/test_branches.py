"""Named branches: multi-commit write-audit-publish on the lake table."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import types as T

from etl_documentos_spark.lake.table import LakeTable, SpecConflictError

SCHEMA = "conv_id string, turn_idx int, text string"


def _table(cas: bool = False):
    root = tempfile.mkdtemp(prefix="branch_t_")
    props = {"commit.mode": "cas"} if cas else None
    return LakeTable.create(
        root,
        T.StructType.fromDDL(SCHEMA),
        bucket_col="conv_id",
        num_buckets=2,
        properties=props,
    )


def _rows(spark, t, **kw):
    return {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in t.scan(spark, **kw).collect()
    }


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_branch_write_invisible_on_main_until_fast_forward(spark):
    t = _table()
    t.append(_df(spark, [("c1", 0, "base")]), salts=1)
    t.create_branch("audit")
    t.append(_df(spark, [("c1", 1, "staged-a")]), salts=1, branch="audit")
    t.append(_df(spark, [("c2", 0, "staged-b")]), salts=1, branch="audit")
    # main unchanged; branch sees both commits stacked on base
    assert _rows(spark, t) == {("c1", 0): "base"}
    assert _rows(spark, t, ref="audit") == {
        ("c1", 0): "base",
        ("c1", 1): "staged-a",
        ("c2", 0): "staged-b",
    }
    head = t.branches["audit"]
    assert t.fast_forward("audit") == head
    assert t.current_snapshot.snapshot_id == head
    assert len(_rows(spark, t)) == 3
    # publish keeps the ref; ff is idempotent at the head
    assert t.fast_forward("audit") == head


def test_fast_forward_conflict_when_main_advanced(spark):
    t = _table()
    t.append(_df(spark, [("c1", 0, "base")]), salts=1)
    t.create_branch("wap")
    t.append(_df(spark, [("c1", 1, "branch")]), salts=1, branch="wap")
    t.append(_df(spark, [("c9", 0, "main-moved")]), salts=1)  # main advances
    with pytest.raises(SpecConflictError):
        t.fast_forward("wap")
    # main kept its own write; branch kept its own
    assert ("c9", 0) in _rows(spark, t)
    assert ("c1", 1) in _rows(spark, t, ref="wap")


def test_branch_name_rules_and_drop(spark):
    t = _table()
    t.append(_df(spark, [("c1", 0, "x")]), salts=1)
    t.tag("v1")
    with pytest.raises(ValueError):
        t.create_branch("v1")  # collides with tag
    t.create_branch("b")
    with pytest.raises(ValueError):
        t.tag("b")  # tag colliding with branch
    with pytest.raises(ValueError):
        t.create_branch("b")  # duplicate
    t.create_branch("b", replace=True)
    with pytest.raises(KeyError):
        t.append(_df(spark, [("c1", 1, "y")]), salts=1, branch="nope")
    t.drop_branch("b")
    assert "b" not in t.branches
    with pytest.raises(KeyError):
        t.drop_branch("b")


def test_expiry_pins_branch_chain(spark):
    t = _table()
    t.append(_df(spark, [("c1", 0, "base")]), salts=1)
    t.create_branch("keep")
    for i in range(1, 4):
        t.append(_df(spark, [("c1", i, f"b{i}")]), salts=1, branch="keep")
    for i in range(10):
        t.append(_df(spark, [("c2", i, f"m{i}")]), salts=1)
    t.expire_snapshots(keep_last=2, manifest_grace_seconds=0.0)
    # branch chain survived expiry: read AND publish still work
    assert len(_rows(spark, t, ref="keep")) == 4
    with pytest.raises(SpecConflictError):
        t.fast_forward("keep")  # main advanced — conflict, not a crash
    # after dropping the branch, its snapshots become expirable
    n_before = len(t.snapshots)
    t.drop_branch("keep")
    t.expire_snapshots(keep_last=2, manifest_grace_seconds=0.0)
    assert len(t.snapshots) < n_before  # unpinned chain actually expired
    assert len(_rows(spark, t)) == 11  # main state intact


def test_sql_wap_flow(spark, tmp_path):
    """The whole write-audit-publish loop through the SQL door."""
    import datetime

    from etl_documentos_spark.lake.sql import refs_df, sql
    from etl_documentos_spark.operators.merge import (
        merge_into,
        physical_schema,
    )
    from etl_documentos_spark.schemas import TRANSCRIPTS

    t0 = datetime.datetime(2024, 1, 1)
    t = LakeTable.create(
        str(tmp_path / "t"), physical_schema(TRANSCRIPTS), num_buckets=2
    )
    base = spark.createDataFrame(
        [("insert", "c1", 0, "user", "hello", None, t0, 1, 0)],
        "op string, conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp, lsn long, source_partition int",
    )
    merge_into(spark, t, base)
    tb = {"t": t}
    sql(spark, tb, "ALTER TABLE t CREATE BRANCH audit")
    # two commits on the branch: a new turn and an LWW overwrite of turn 0
    sql(
        spark, tb,
        "INSERT INTO t.branch_audit (conv_id, turn_idx, role, text, ts)"
        " VALUES ('c1', 1, 'bot', 'reply', TIMESTAMP '2024-01-01 00:01:00')",
    )
    sql(
        spark, tb,
        "INSERT INTO t.branch_audit (conv_id, turn_idx, role, text, ts)"
        " VALUES ('c1', 0, 'user', 'hello v2',"
        " TIMESTAMP '2024-01-01 00:02:00')",
    )
    # audit: branch read sees the merged (LWW) branch state, main doesn't
    main = sql(spark, tb, "SELECT text FROM t ORDER BY turn_idx").collect()
    br = sql(
        spark, tb, "SELECT text FROM t.branch_audit ORDER BY turn_idx"
    ).collect()
    assert [r.text for r in main] == ["hello"]
    assert [r.text for r in br] == ["hello v2", "reply"]
    refs = {
        (r.name, r.type): r.snapshot_id
        for r in refs_df(spark, t).collect()
    }
    assert ("audit", "branch") in refs
    # publish
    sql(spark, tb, "ALTER TABLE t FAST FORWARD TO audit")
    t._refresh()
    got = sql(spark, tb, "SELECT text FROM t ORDER BY turn_idx").collect()
    assert [r.text for r in got] == ["hello v2", "reply"]
    sql(spark, tb, "ALTER TABLE t DROP BRANCH audit")
    assert "audit" not in t.branches


def test_sql_branch_errors(spark, tmp_path):
    from etl_documentos_spark.lake.sql import sql
    from etl_documentos_spark.operators.merge import physical_schema
    from etl_documentos_spark.schemas import TRANSCRIPTS

    t = LakeTable.create(
        str(tmp_path / "t"), physical_schema(TRANSCRIPTS), num_buckets=2
    )
    tb = {"t": t}
    with pytest.raises(KeyError):
        sql(spark, tb, "INSERT INTO t.branch_nope VALUES ('c', 0)")
    with pytest.raises(KeyError):
        sql(spark, tb, "SELECT * FROM t.branch_nope")
    sql(spark, tb, "ALTER TABLE t CREATE BRANCH b")
    with pytest.raises(ValueError):
        sql(spark, tb, "ALTER TABLE t CREATE BRANCH b")
    sql(spark, tb, "ALTER TABLE t CREATE OR REPLACE BRANCH b")


def test_branch_survives_reload_and_cas_mode(spark):
    t = _table(cas=True)
    t.append(_df(spark, [("c1", 0, "base")]), salts=1)
    t.create_branch("audit")
    t.append(_df(spark, [("c1", 1, "staged")]), salts=1, branch="audit")
    t2 = LakeTable.load(t.root)  # fresh handle: metadata round-trips
    assert t2.branches == t.branches
    assert _rows(spark, t2, ref="audit")[("c1", 1)] == "staged"
    assert _rows(spark, t2) == {("c1", 0): "base"}
    t2.fast_forward("audit")
    assert len(_rows(spark, t2)) == 2
