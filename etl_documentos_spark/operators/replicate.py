"""Incremental lake-to-lake replication over the changelog (CDC chaining).

The ingest pipeline turns a change stream into a table; this operator turns
a table back into a change stream and applies it to ANOTHER lake table —
the disaster-recovery / multi-region / derived-table shape. Built entirely
from primitives this engine already guarantees:

- **delta planning**: `lake.changelog.read_changes` diffs manifests, so one
  replication tick reads exactly the files the source added since the last
  tick (compaction/split/rebucket commits are skipped as maintenance) —
  never the table;
- **exactly-once effect without two-phase commit**: the replication cursor
  (last shipped source snapshot id) is stored as a property on the TARGET
  table and advanced in a separate metadata commit AFTER the data merge. A
  crash between the two re-applies the same changes on the next tick, and
  the version-checked LWW merge absorbs the replay — at-least-once delivery
  plus an idempotent sink, the same contract the ingest path uses for its
  commit log;
- **ordering**: tombstones replicate as ordinary delete events carrying
  their original (ts, lsn) version, so late/duplicate ticks cannot
  resurrect deleted keys on the target.

The source must run MOR mode for an incremental feed (every data commit is
an append); a logical COW overwrite surfaces through ``read_changes``'s
contract and triggers a full resync (also idempotent). First call on a
fresh cursor bootstraps with a full physical sync for the same reason.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_documentos_spark.lake.changelog import read_changes
from etl_documentos_spark.lake.table import LakeTable
from etl_documentos_spark.operators.merge import merge_into

#: target-table property holding the last replicated source snapshot id
CURSOR_PROP = "replication.source-snapshot-id"


@dataclass
class ReplicationTick:
    mode: str  # "bootstrap" | "incremental" | "resync" | "noop"
    from_snapshot_id: int | None
    to_snapshot_id: int
    events: int


def _as_change_stream(df: DataFrame, op_col) -> DataFrame:
    """Physical/changelog rows -> the change shape `merge_into` consumes
    (op + payload + the ORIGINAL version columns ts/_lsn as lsn)."""
    payload = [
        c
        for c in df.columns
        if c
        not in (
            "_deleted",
            "_lsn",
            "_change_op",
            "_change_snapshot_id",
            "_change_ts_ms",
        )
    ]
    return df.select(
        op_col.alias("op"),
        *payload,
        F.col("_lsn").alias("lsn"),
    )


def replicate(
    spark: SparkSession, source: LakeTable, target: LakeTable
) -> ReplicationTick:
    """Ship source changes since the last tick into the target; returns
    what happened. Safe to call on any schedule, concurrently with source
    ingest, and to re-run after any crash (idempotent)."""
    source._refresh()
    target._refresh()
    cur = source.current_snapshot.snapshot_id
    raw = target._meta["properties"].get(CURSOR_PROP)
    cursor = int(raw) if raw is not None else None

    known = {s.snapshot_id for s in source.snapshots}
    if cursor is not None and cursor == cur:
        return ReplicationTick("noop", cursor, cur, 0)

    mode = "incremental"
    changes = None
    if cursor is None or cursor not in known:
        # fresh cursor, or the cursor snapshot was expired on the source:
        # full resync from the physical current state (idempotent merge)
        mode = "bootstrap" if cursor is None else "resync"
    else:
        try:
            delta = read_changes(spark, source, cursor, cur)
            changes = _as_change_stream(
                delta,
                F.when(
                    F.col("_change_op") == "delete", F.lit("delete")
                ).otherwise(F.lit("update")),
            )
        except ValueError:
            # logical COW overwrite inside the range: attribution lost,
            # fall back to a full resync
            mode = "resync"
    if changes is None:
        phys = source.scan(spark, snapshot_id=cur)
        changes = _as_change_stream(
            phys,
            F.when(
                F.coalesce(F.col("_deleted"), F.lit(False)), F.lit("delete")
            ).otherwise(F.lit("update")),
        )

    changes = changes.persist()
    try:
        n = changes.count()
        if n:
            # evolve the target first: additive source columns replicate
            # as additive target columns (no rewrite)
            from etl_documentos_spark.operators.evolve import evolve_if_needed

            evolve_if_needed(changes, target)
            merge_into(spark, target, changes)
    finally:
        changes.unpersist()
    # advance the cursor only after the data commit is durable — a crash
    # before this line replays the same delta next tick (absorbed by LWW)
    target.set_property(CURSOR_PROP, str(cur))
    return ReplicationTick(mode, cursor, cur, int(n))
