"""Snapshot tags, ref-aware expiry, and rollback (Iceberg refs semantics)."""

from __future__ import annotations

import datetime

import pytest

from etl_documentos_spark.lake.changelog import read_changes
from etl_documentos_spark.lake.table import LakeTable
from etl_documentos_spark.operators.merge import (
    changes_to_physical,
    physical_schema,
    read_current,
)
from etl_documentos_spark.schemas import CHANGE_EVENTS, TRANSCRIPTS

T0 = datetime.datetime(2024, 1, 1)


def _batch(spark, table, convs, n0=0):
    rows = [
        ("insert", c, 0, "user", f"{c} v{n0}", None,
         T0 + datetime.timedelta(seconds=n0 + i), n0 + i, 0)
        for i, c in enumerate(convs)
    ]
    return changes_to_physical(
        spark.createDataFrame(rows, CHANGE_EVENTS), table.schema
    )


@pytest.fixture()
def table3(spark, tmp_path):
    """Three append snapshots (ids 2, 3, 4) over distinct conv sets."""
    t = LakeTable.create(
        str(tmp_path / "t"), physical_schema(TRANSCRIPTS), num_buckets=4
    )
    for i, convs in enumerate((["a1", "a2"], ["b1"], ["c1", "c2"])):
        t.append(_batch(spark, t, convs, n0=10 * (i + 1)), salts=1)
    return t


def _convs(df):
    return sorted(r["conv_id"] for r in df.collect())


def test_tag_and_scan_by_ref(spark, table3):
    t = table3
    t.tag("after-first", snapshot_id=2)
    t.tag("latest")  # defaults to current
    assert t.refs == {"after-first": 2, "latest": 4}
    assert _convs(t.scan(spark, ref="after-first")) == ["a1", "a2"]
    assert _convs(t.scan(spark, ref="latest")) == [
        "a1", "a2", "b1", "c1", "c2"
    ]
    with pytest.raises(KeyError):
        t.scan(spark, ref="nope")
    with pytest.raises(ValueError):
        t.scan(spark, ref="latest", snapshot_id=2)
    with pytest.raises(KeyError):
        t.tag("bad", snapshot_id=99)


def test_expire_keeps_tagged_snapshots(spark, table3):
    t = table3
    t.tag("pinned", snapshot_id=2)
    t.expire_snapshots(keep_last=1)
    ids = {s.snapshot_id for s in t.snapshots}
    assert ids == {2, 4}  # tagged + most recent survive
    # the pinned snapshot still READS correctly (its files survived)
    assert _convs(t.scan(spark, ref="pinned")) == ["a1", "a2"]
    # drop the tag -> next expiry reclaims it
    t.drop_tag("pinned")
    t.expire_snapshots(keep_last=1)
    assert {s.snapshot_id for s in t.snapshots} == {4}
    assert _convs(read_current(spark, t)) == ["a1", "a2", "b1", "c1", "c2"]


def test_rollback_restores_state_history_preserved(spark, table3):
    t = table3
    t.rollback(2)
    assert _convs(read_current(spark, t)) == ["a1", "a2"]
    assert t.current_snapshot.operation == "rollback"
    assert t.current_snapshot.summary == {"to": 2}
    # history preserved: the rolled-back snapshots still exist
    assert {s.snapshot_id for s in t.snapshots} == {1, 2, 3, 4, 5}
    # new commits build on the restored state
    t.append(_batch(spark, t, ["d1"], n0=99), salts=1)
    assert _convs(read_current(spark, t)) == ["a1", "a2", "d1"]
    with pytest.raises(KeyError):
        t.rollback(42)


def test_changelog_refuses_rollback_then_skips(spark, table3):
    t = table3
    t.rollback(2)
    t.append(_batch(spark, t, ["d1"], n0=99), salts=1)
    with pytest.raises(ValueError, match="logical rollback"):
        read_changes(spark, t, 1).collect()
    skipped = read_changes(spark, t, 1, on_logical_overwrite="skip")
    # appends flow; the rollback contributes nothing; the post-rollback
    # append is attributed to its own snapshot
    sids = {r["_change_snapshot_id"] for r in skipped.collect()}
    assert 5 not in sids and 6 in sids


def test_rollback_point_lookup_uses_restored_stats(spark, table3):
    """The rollback snapshot carries the target's file stats, so pruned
    reads keep working on the restored state."""
    t = table3
    t.rollback(2)
    df = t.scan(spark, prune={"conv_id": ("a1", "a1")})
    assert sorted(set(r["conv_id"] for r in df.collect())) <= ["a1", "a2"]
