"""One-call table maintenance: the background service a lake table needs.

The reference runs its housekeeping imperatively inside the request path
(per-document status flips and cleanup,
``/root/reference/app/services/document_processor.py:205-218``). At lake
scale maintenance is a standing service beside the ingest stream — Iceberg
ships it as separate procedures (``rewrite_data_files``,
``expire_snapshots``, ``remove_orphan_files``); this module composes this
engine's equivalents into one idempotent pass a scheduler can call on a
timer, with a machine-readable report per step.

Order matters and is deliberate:

1. **split** oversized buckets first (power-of-two, per-bucket fenced) so
   the compaction that follows rewrites the post-split layout instead of
   immediately invalidating its own output;
2. **compact** buckets whose delta-file count exceeds the threshold —
   sorted, size-capped rewrite (tight manifest stats, bounded read
   amplification), expiring delete tombstones past the lateness watermark;
3. **expire** old snapshots (bounded time-travel window; tagged snapshots
   and the current WAP-published state stay pinned);
4. **GC** orphaned files outside the grace window (crashed stagings).

Every step is crash-safe on its own (atomic snapshot commits, flock'd
metadata), so a maintenance pass that dies mid-way leaves the table valid
and the next pass finishes the job — no coordination with the ingest
pipeline is required beyond the ordinary commit locks.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from etl_documentos_spark.lake.table import LakeTable, SpecConflictError
from etl_documentos_spark.operators.merge import compact


@dataclass
class MaintenanceReport:
    buckets_split: list[int] = field(default_factory=list)
    buckets_compacted: list[int] = field(default_factory=list)
    orphan_files_deleted: int = 0
    expired_files_deleted: int = 0


def maintain(
    spark: SparkSession,
    table: LakeTable,
    compact_over_files: int = 8,
    target_file_bytes: int = 128 << 20,
    expire_tombstones_before: int | None = None,
    keep_snapshots: int = 8,
    orphan_grace_seconds: float = 3600.0,
    split_over_bytes: int | None = None,
) -> MaintenanceReport:
    """Run one maintenance pass; returns what each step did.

    ``split_over_bytes``: base buckets whose physical size exceeds this get
    a power-of-two split (None = never split — the right default while the
    table still fits its bucket count). ``expire_tombstones_before``: epoch
    MICROSECONDS bound for delete-tombstone expiry during compaction
    (callers with a `CdcPipeline` pass its ``tombstone_expiry``).
    """
    report = MaintenanceReport()

    if split_over_bytes is not None:
        sizes = table.bucket_sizes()
        already = set(table.split_buckets)
        for b, nbytes in sorted(sizes.items()):
            if (
                nbytes > split_over_bytes
                and b < table.num_buckets
                and b not in already
            ):
                try:
                    table.split_bucket(spark, b)
                    report.buckets_split.append(b)
                except (ValueError, SpecConflictError):
                    # concurrently split / spec moved on — next pass re-checks
                    pass

    files = table.current_snapshot.files
    hot = sorted(
        int(b) for b, fs in files.items() if len(fs) > compact_over_files
    )
    if hot:
        compact(
            spark,
            table,
            buckets=hot,
            expire_tombstones_before=expire_tombstones_before,
            target_file_bytes=target_file_bytes,
        )
        report.buckets_compacted = hot

    report.expired_files_deleted = table.expire_snapshots(
        keep_last=keep_snapshots
    )
    report.orphan_files_deleted = table.remove_orphan_files(
        grace_seconds=orphan_grace_seconds
    )
    return report
