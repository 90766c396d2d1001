"""remove_orphan_files: GC for files staged by crashed writers."""

from __future__ import annotations

import datetime
import glob
import os

from etl_documentos_spark.lake.table import LakeTable
from etl_documentos_spark.operators.merge import (
    changes_to_physical,
    physical_schema,
    read_current,
)
from etl_documentos_spark.schemas import CHANGE_EVENTS, TRANSCRIPTS

T0 = datetime.datetime(2024, 1, 1)


def _batch(spark, table, n0=0):
    rows = [
        ("insert", f"c{i}", 0, "user", f"t{i}", None,
         T0 + datetime.timedelta(seconds=i), n0 + i, 0)
        for i in range(8)
    ]
    return changes_to_physical(
        spark.createDataFrame(rows, CHANGE_EVENTS), table.schema
    )


def _parquet_on_disk(root):
    return {
        os.path.relpath(p, root)
        for p in glob.glob(os.path.join(root, "data", "**", "*.parquet"),
                           recursive=True)
    }


def test_orphans_removed_committed_kept(spark, tmp_path):
    root = str(tmp_path / "t")
    table = LakeTable.create(root, physical_schema(TRANSCRIPTS), num_buckets=4)
    table.append(_batch(spark, table), salts=1)
    committed = _parquet_on_disk(root)

    # a writer stages files then crashes before commit_append
    table.write_data_files(_batch(spark, table, n0=100), salts=1)
    staged = _parquet_on_disk(root) - committed
    assert staged, "staging produced no files?"

    # inside the grace window nothing is deleted (could be in-flight)
    assert table.remove_orphan_files(grace_seconds=3600) == 0
    assert _parquet_on_disk(root) == committed | staged

    # past the grace window the orphans go, committed files stay
    removed = table.remove_orphan_files(grace_seconds=0)
    assert removed == len(staged)
    assert _parquet_on_disk(root) == committed
    assert read_current(spark, table).count() == 8


def test_all_snapshots_protect_their_files(spark, tmp_path):
    """Files referenced ONLY by an old snapshot are not orphans — time
    travel keeps them until expire_snapshots drops the snapshot."""
    root = str(tmp_path / "t")
    table = LakeTable.create(root, physical_schema(TRANSCRIPTS), num_buckets=4)
    table.append(_batch(spark, table), salts=1)
    first = _parquet_on_disk(root)
    table.append(_batch(spark, table, n0=50), salts=1)

    assert table.remove_orphan_files(grace_seconds=0) == 0
    assert first <= _parquet_on_disk(root)

    # expire the old snapshots, then their files are deletable — but by
    # expire_snapshots itself, not the orphan GC (which sees a clean disk)
    table.expire_snapshots(keep_last=1)
    assert table.remove_orphan_files(grace_seconds=0) == 0
    assert read_current(spark, table).count() == 8
