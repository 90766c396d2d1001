"""Incremental changelog read between snapshots (CDC-out).

The inverse of the ingest path: having applied a change stream INTO the
lake, downstream consumers (index builders, cache invalidation, derived
tables) want the changes back OUT without rescanning the table. Because
every snapshot keeps its full file manifest, the rows a snapshot added are
exactly the parquet files present in it but not in its parent — a pure
metadata diff, zero data reads to plan, O(files-added) to execute. This is
the public Iceberg incremental append scan / ``table_changes`` semantics:

- ``append`` snapshots are emitted (the MOR ingest path commits these);
- maintenance rewrites — compaction (``overwrite`` stamped
  ``maintenance: true``), ``split-bucket``, ``rebucket``,
  ``add-columns`` — move or re-cluster existing rows without logical
  change, so they are skipped, like Iceberg skips ``replace`` commits;
- a LOGICAL overwrite (the COW merge path) rewrites winners in place, so
  per-row change attribution is not recoverable from the manifest alone;
  the reader refuses by default (``on_logical_overwrite="error"``), again
  matching Iceberg's incremental-scan contract. CDC-out pipelines run the
  table in MOR mode, where every data commit is an append.

Reference parity: the reference exposes per-document processing history as
an audit list (/root/reference/app/api/documentos.py list endpoints over
/root/reference/app/models/database.py:89-117 processing-log rows); here
the whole table IS the log, so history is a manifest diff.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_documentos_spark.lake.table import LakeTable, Snapshot

#: snapshot operations that never carry logical row changes
_MAINTENANCE_OPS = {"create", "split-bucket", "rebucket", "add-columns"}

#: changelog metadata columns appended to the table's physical schema
CHANGE_META = [
    T.StructField("_change_op", T.StringType(), False),
    T.StructField("_change_snapshot_id", T.LongType(), False),
    T.StructField("_change_ts_ms", T.LongType(), False),
]


def _is_maintenance(snap: Snapshot) -> bool:
    if snap.operation in _MAINTENANCE_OPS:
        return True
    return snap.operation == "overwrite" and bool(
        snap.summary.get("maintenance")
    )


def read_changes(
    spark: SparkSession,
    table: LakeTable,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
    on_logical_overwrite: str = "error",
) -> DataFrame:
    """Rows added by snapshots in ``(from_snapshot_id, to_snapshot_id]``.

    Output: the table's physical columns minus ``_deleted`` (folded into
    ``_change_op``: ``'delete'`` for tombstones, ``'upsert'`` otherwise),
    plus ``_change_snapshot_id`` and ``_change_ts_ms`` (commit wall time).
    ``_lsn`` rides along — consumers resume from max position per key.

    Planning is metadata-only (manifest set-diff per snapshot); execution
    reads exactly the added files. At 10^10 rows an incremental consumer
    therefore reads the delta, never the table.

    ``on_logical_overwrite``: ``"error"`` (default) raises on a COW merge
    commit inside the range; ``"skip"`` ignores it (consumer accepts an
    incomplete feed and re-syncs from a full read).
    """
    if on_logical_overwrite not in ("error", "skip"):
        raise ValueError(f"on_logical_overwrite={on_logical_overwrite!r}")
    by_id = {s.snapshot_id: s for s in table.snapshots}
    if from_snapshot_id not in by_id:
        raise KeyError(f"unknown from_snapshot_id {from_snapshot_id}")
    # default upper bound is CURRENT, not max-id: an unpublished staged
    # (WAP) snapshot may hold a higher id than the published state
    hi = (
        to_snapshot_id
        if to_snapshot_id is not None
        else table.current_snapshot.snapshot_id
    )
    if hi not in by_id:
        raise KeyError(f"unknown to_snapshot_id {to_snapshot_id}")

    # walk the PARENT CHAIN from hi back to from — snapshot history is a
    # tree once WAP staging exists (unpublished stages are dead branches),
    # so id order is not lineage order
    chain: list[Snapshot] = []
    cur = by_id[hi]
    while cur.snapshot_id != from_snapshot_id:
        chain.append(cur)
        if cur.parent_id is None or cur.parent_id not in by_id:
            raise KeyError(
                f"snapshot {from_snapshot_id} is not an ancestor of {hi}"
            )
        cur = by_id[cur.parent_id]
    chain.reverse()

    schema = table.schema
    out_fields = [f for f in schema.fields if f.name != "_deleted"]
    out_schema = T.StructType(out_fields + CHANGE_META)

    parts: list[DataFrame] = []
    for snap in chain:
        parent = by_id[snap.parent_id]
        parent_paths = {p for fs in parent.files.values() for p in fs}
        added = sorted(
            p
            for fs in snap.files.values()
            for p in fs
            if p not in parent_paths
        )
        if _is_maintenance(snap):
            continue
        if snap.operation in ("overwrite", "rollback"):
            # a COW merge rewrites winners in place; a rollback makes rows
            # VANISH — neither is expressible as a manifest add-diff
            if on_logical_overwrite == "error":
                raise ValueError(
                    f"snapshot {snap.snapshot_id} is a logical "
                    f"{snap.operation}; per-row changes are not recoverable "
                    "from the manifest — run the table in MOR mode for "
                    "CDC-out (and resync after rollbacks), or pass "
                    "on_logical_overwrite='skip'"
                )
            continue
        if not added:
            continue
        # the table's sanctioned file reader, not a bare schema read —
        # after a rename_column, pre-rename snapshots' files physically
        # hold the historical name; a bare read would emit NULL for the
        # renamed column on every one of those change rows
        df = table._read_data_files(
            spark, [os.path.join(table.root, p) for p in added]
        )
        parts.append(
            df.select(
                *[F.col(f.name) for f in out_fields],
                F.when(
                    F.coalesce(F.col("_deleted"), F.lit(False)),
                    F.lit("delete"),
                )
                .otherwise(F.lit("upsert"))
                .alias("_change_op"),
                F.lit(snap.snapshot_id).cast("long").alias(
                    "_change_snapshot_id"
                ),
                F.lit(snap.ts_ms).cast("long").alias("_change_ts_ms"),
            )
        )
    if not parts:
        return spark.createDataFrame([], out_schema)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
