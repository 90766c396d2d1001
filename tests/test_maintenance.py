"""One-call maintenance pass: split + compact + snapshot expiry + orphan GC.

Contract: maintenance never changes the logical table state (read_current
equality across the pass), bounds physical shape (delta-file counts, split
hot buckets, snapshot count), and removes only provably dead files.
"""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from etl_documentos_spark.lake.maintenance import maintain
from etl_documentos_spark.lake.table import LakeTable
from etl_documentos_spark.operators.merge import (
    merge_mor,
    physical_schema,
    read_current,
)
from etl_documentos_spark.schemas import TRANSCRIPTS


def _batch(spark, batch, n_convs=8, turns=4):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (
            "insert",
            f"conv_{c}",
            t,
            "user",
            f"b{batch} c{c} t{t}",
            None,
            t0 + datetime.timedelta(seconds=batch),
            batch * 1000 + c * 10 + t,
            0,
        )
        for c in range(n_convs)
        for t in range(turns)
    ]
    return spark.createDataFrame(
        rows,
        "op string, conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp, lsn long, source_partition int",
    )


@pytest.fixture()
def messy_table(spark, tmp_path):
    """12 small MOR appends -> many delta files + 13 snapshots."""
    table = LakeTable.create(
        str(tmp_path / "t"), physical_schema(TRANSCRIPTS), num_buckets=2
    )
    for b in range(12):
        merge_mor(spark, table, _batch(spark, b), target_tasks=1)
    table._refresh()
    return table


def _state(spark, table):
    return sorted(tuple(r) for r in read_current(spark, table).collect())


def test_maintain_preserves_state_and_bounds_shape(spark, messy_table):
    table = messy_table
    before = _state(spark, table)
    n_files_before = sum(
        len(fs) for fs in table.current_snapshot.files.values()
    )
    # plant an orphan (staged-then-crashed writer shape)
    orphan = os.path.join(table.root, "data", "orphan-crashed.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not really parquet")

    report = maintain(
        spark,
        table,
        compact_over_files=2,
        keep_snapshots=1,  # only the post-compaction snapshot survives,
        # so the pre-compaction deltas it alone referenced get deleted
        orphan_grace_seconds=0.0,
    )
    table._refresh()

    assert _state(spark, table) == before
    assert report.buckets_compacted, "delta-heavy buckets must compact"
    files = table.current_snapshot.files
    # sorted compaction emits ranges over (bucket, key): bounded by the
    # range-partition count plus one straddle file per bucket boundary
    assert sum(len(fs) for fs in files.values()) <= table.num_buckets + 2, files
    assert sum(len(fs) for fs in files.values()) < n_files_before
    assert len(table.snapshots) <= 2  # keep_last=1 + pinned current
    assert not os.path.exists(orphan)
    assert report.orphan_files_deleted >= 1
    assert report.expired_files_deleted > 0  # old deltas died with snapshots

    # second pass: converged — nothing left to compact or delete
    report2 = maintain(
        spark,
        table,
        compact_over_files=2,
        keep_snapshots=1,
        orphan_grace_seconds=0.0,
    )
    table._refresh()
    assert report2.buckets_compacted == []
    assert report2.orphan_files_deleted == 0
    assert _state(spark, table) == before


def test_maintain_splits_hot_buckets(spark, messy_table):
    table = messy_table
    before = _state(spark, table)
    report = maintain(
        spark,
        table,
        compact_over_files=2,
        split_over_bytes=1,  # every non-empty bucket qualifies
    )
    table._refresh()
    assert report.buckets_split, "hot buckets must split"
    assert set(report.buckets_split) <= {0, 1}
    if set(report.buckets_split) == {0, 1}:
        # every base split -> spec normalizes to 2N flat buckets
        assert table.num_buckets == 4 and table.split_buckets == []
    else:
        assert table.split_buckets == sorted(report.buckets_split)
    assert _state(spark, table) == before
    # split children are addressable and pruned scans see all rows
    n = read_current(spark, table).count()
    per_bucket = sum(
        table.scan(spark, buckets=[b]).count()
        for b in table.live_buckets()
    )
    assert per_bucket >= n  # physical rows >= logical (pre-compact deltas)


def test_maintain_respects_tags(spark, messy_table):
    table = messy_table
    first = table.snapshots[1].snapshot_id
    table.tag("keep-me", first)
    maintain(spark, table, compact_over_files=2, keep_snapshots=1)
    table._refresh()
    ids = {s.snapshot_id for s in table.snapshots}
    assert first in ids, "tagged snapshot must survive expiry"
    # and it still reads (its files were not GC'd)
    assert table.scan(spark, snapshot_id=first).count() > 0
