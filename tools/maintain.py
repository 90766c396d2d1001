"""Lake table maintenance entrypoint: compact + expire + orphan GC.

The three background jobs a 10^10-row MOR table needs, in the safe order:

1. ``compact``    — LWW-rewrite buckets whose delta-file count crossed the
                    threshold (sorted output -> tight manifest stats),
                    expiring delete tombstones past the lateness watermark;
2. ``expire``     — drop snapshots beyond the time-travel window (tagged
                    snapshots are pinned) and delete files only they
                    referenced;
3. ``orphans``    — delete files referenced by NO snapshot (crashed
                    writers), outside the staging grace window.

Each step is independently safe under concurrent writers (all commits and
deletes run under the cross-process commit flock; staging is protected by
the grace window), so this script can run from cron/Airflow while the
ingest stream is live — the same operational contract as Iceberg's
maintenance procedures (rewrite_data_files / expire_snapshots /
remove_orphan_files).

Usage:
    python tools/maintain.py --table /lake/transcripts \
        [--keep-snapshots 20] [--orphan-grace-hours 2] [--skip-compact]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="LakeTable root")
    ap.add_argument("--keep-snapshots", type=int, default=20,
                    help="time-travel window (tagged snapshots always kept)")
    ap.add_argument("--orphan-grace-hours", type=float, default=2.0,
                    help="never delete unreferenced files younger than this")
    ap.add_argument("--skip-compact", action="store_true")
    ap.add_argument("--compact-at-files", type=int, default=8,
                    help="rewrite buckets holding more delta files than this")
    ap.add_argument("--split-over-gb", type=float, default=None,
                    help="power-of-two split base buckets larger than this")
    ap.add_argument("--master", default="local[*]")
    args = ap.parse_args()

    from etl_documentos_spark.lake.maintenance import maintain
    from etl_documentos_spark.lake.table import LakeTable
    from etl_documentos_spark.session import get_spark

    table = LakeTable.load(args.table)
    spark = get_spark("maintain", master=args.master)
    before = len(
        [p for fs in table.current_snapshot.files.values() for p in fs]
    )
    r = maintain(
        spark,
        table,
        compact_over_files=(10**9 if args.skip_compact else args.compact_at_files),
        keep_snapshots=args.keep_snapshots,
        orphan_grace_seconds=args.orphan_grace_hours * 3600,
        split_over_bytes=(
            int(args.split_over_gb * (1 << 30)) if args.split_over_gb else None
        ),
    )
    table._refresh()
    after = len(
        [p for fs in table.current_snapshot.files.values() for p in fs]
    )
    report = {
        "table": args.table,
        "compact_buckets": r.buckets_compacted,
        "split_buckets": r.buckets_split,
        "compact_files_before": before,
        "compact_files_after": after,
        "snapshots_expired_files": r.expired_files_deleted,
        "orphans_removed": r.orphan_files_deleted,
    }
    print(report)


if __name__ == "__main__":
    main()
