"""Write-audit-publish: staged appends, publish fast-forward, discard."""

from __future__ import annotations

import datetime
import glob
import os

import pytest

from etl_documentos_spark.lake.changelog import read_changes
from etl_documentos_spark.lake.table import LakeTable, SpecConflictError
from etl_documentos_spark.operators.merge import (
    changes_to_physical,
    physical_schema,
    read_current,
)
from etl_documentos_spark.schemas import CHANGE_EVENTS, TRANSCRIPTS

T0 = datetime.datetime(2024, 1, 1)


def _batch(spark, table, convs, n0=0, text="v"):
    rows = [
        ("insert", c, 0, "user", f"{c} {text}{n0}", None,
         T0 + datetime.timedelta(seconds=n0 + i), n0 + i, 0)
        for i, c in enumerate(convs)
    ]
    return changes_to_physical(
        spark.createDataFrame(rows, CHANGE_EVENTS), table.schema
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(
        str(tmp_path / "t"), physical_schema(TRANSCRIPTS), num_buckets=4
    )
    t.append(_batch(spark, t, ["a1", "a2"], n0=10), salts=1)
    return t


def _convs(df):
    return sorted(r["conv_id"] for r in df.collect())


def test_stage_audit_publish(spark, table):
    staged = table.stage_append(_batch(spark, table, ["b1"], n0=20), salts=1)
    # readers are unaffected until publish
    assert _convs(read_current(spark, table)) == ["a1", "a2"]
    # the auditor sees the staged state by snapshot id
    assert _convs(table.scan(spark, snapshot_id=staged)) == [
        "a1", "a2", "b1"
    ]
    table.publish(staged)
    assert table.current_snapshot.snapshot_id == staged
    assert _convs(read_current(spark, table)) == ["a1", "a2", "b1"]
    # the published stage is an ordinary append to the changelog
    feed = read_changes(spark, table, 2)
    assert sorted(r["conv_id"] for r in feed.collect()) == ["b1"]


def test_discard_deletes_only_staged_files(spark, table):
    files_before = {
        os.path.relpath(p, table.root)
        for p in glob.glob(
            os.path.join(table.root, "data", "**", "*.parquet"),
            recursive=True,
        )
    }
    staged = table.stage_append(_batch(spark, table, ["b1"], n0=20), salts=1)
    removed = table.discard_staged(staged)
    assert removed >= 1
    after = {
        os.path.relpath(p, table.root)
        for p in glob.glob(
            os.path.join(table.root, "data", "**", "*.parquet"),
            recursive=True,
        )
    }
    assert after == files_before
    assert all(s.snapshot_id != staged for s in table.snapshots)
    assert _convs(read_current(spark, table)) == ["a1", "a2"]
    with pytest.raises(KeyError):
        table.publish(staged)


def test_publish_conflicts_with_interleaved_commit(spark, table):
    staged = table.stage_append(_batch(spark, table, ["b1"], n0=20), salts=1)
    # another writer lands first
    table.append(_batch(spark, table, ["c1"], n0=30), salts=1)
    with pytest.raises(SpecConflictError, match="re-stage"):
        table.publish(staged)
    # discard and re-stage against the new state
    table.discard_staged(staged)
    staged2 = table.stage_append(_batch(spark, table, ["b1"], n0=40), salts=1)
    table.publish(staged2)
    assert _convs(read_current(spark, table)) == ["a1", "a2", "b1", "c1"]


def test_discard_refuses_current_and_parents(spark, table):
    cur = table.current_snapshot.snapshot_id
    with pytest.raises(ValueError, match="current"):
        table.discard_staged(cur)
    staged = table.stage_append(_batch(spark, table, ["b1"], n0=20), salts=1)
    with pytest.raises(ValueError, match="descendants"):
        table.discard_staged(cur)  # parent of the stage now
    table.publish(staged)


def test_expire_never_drops_current_under_unpublished_stage(spark, table):
    staged = table.stage_append(_batch(spark, table, ["b1"], n0=20), salts=1)
    assert staged > table.current_snapshot.snapshot_id
    table.expire_snapshots(keep_last=1)
    # current survives even though the stage out-ids it
    assert _convs(read_current(spark, table)) == ["a1", "a2"]
    ids = {s.snapshot_id for s in table.snapshots}
    assert table.current_snapshot.snapshot_id in ids


def test_changelog_default_bound_ignores_unpublished_stage(spark, table):
    base = table.current_snapshot.snapshot_id
    table.stage_append(_batch(spark, table, ["b1"], n0=20), salts=1)
    # default feed ends at CURRENT: the dead branch contributes nothing
    assert read_changes(spark, table, base).count() == 0
