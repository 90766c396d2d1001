"""apply_epoch — the exactly-once unit of work inside foreachBatch.

Per epoch (micro-batch):

1. commit-log guard: skip if this epoch already committed (restart replay);
2. fingerprint + per-source-partition offsets (one agg pass);
3. additive schema evolution if the batch carries new columns;
4. LWW dedup -> version-checked key-partitioned MERGE into the lake table;
5. append per-source-partition lineage rows and one epoch metrics row;
6. write the commit record (atomic rename) — the epoch is now durable.

Crash-safety ordering: the table snapshot commit (step 4) lands before the
commit record (step 6). A crash between them leaves a committed snapshot and
no commit record; on replay the epoch re-applies, and the version-checked
merge makes that re-application a no-op (idempotence test asserts table-hash
equality). Reference analogue of the lifecycle: insert ``processando`` ->
update ``concluido``/``erro`` + audit rows
(``/root/reference/app/services/document_processor.py:126-143, 205-218,
615-631``).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from etl_documentos_spark.lake.table import LakeTable
from etl_documentos_spark.operators.evolve import evolve_if_needed
from etl_documentos_spark.operators.merge import compact, merge_into, merge_mor
from etl_documentos_spark.streaming.commitlog import (
    CommitLog,
    batch_stats,
    observe_exprs,
    stats_from_observation,
)
from etl_documentos_spark.streaming.lineage import (
    append_lineage_rows,
    append_metrics,
)


@dataclass
class EpochResult:
    epoch_id: int
    skipped: bool
    events: int
    duration_s: float
    added_columns: list[str]


class CdcPipeline:
    """Owns the table + sidecar paths; one instance drives batch or stream.

    ``mode``:
    - ``"mor"`` (default): merge-on-read — per-epoch appends of delta files,
      LWW at read time, automatic compaction when a bucket accumulates more
      than ``compact_at_files`` files. The high-throughput ingest shape.
    - ``"cow"``: copy-on-write — every epoch rewrites the touched buckets
      with the reduction applied. Read-optimal, write-amplified.

    ``n_source_partitions``: when set (the partition count of the binlog /
    Kafka source — a known source property), epoch stats are collected as
    observed metrics on the write job itself: ONE pass per epoch, no persist.
    When None, a separate stats aggregation runs first (two passes).
    """

    def __init__(
        self,
        spark: SparkSession,
        table_root: str,
        workdir: str,
        mode: str = "mor",
        compact_at_files: int = 64,
        n_source_partitions: int | None = 8,
    ):
        assert mode in ("mor", "cow")
        self.spark = spark
        self.table_root = table_root
        self.workdir = workdir
        self.mode = mode
        self.compact_at_files = compact_at_files
        self.n_source_partitions = n_source_partitions
        self.commitlog = CommitLog(os.path.join(workdir, "commits"))
        self.lineage_path = os.path.join(workdir, "lineage")
        self.metrics_path = os.path.join(workdir, "metrics")

    @property
    def table(self) -> LakeTable:
        return LakeTable.load(self.table_root)

    def _maybe_compact(self, table: LakeTable) -> None:
        """Compact buckets whose delta-file count exceeds the threshold —
        bounds MOR read amplification; amortized O(table/epochs) instead of
        COW's O(table) per epoch."""
        files = table.current_snapshot.files
        hot = [int(b) for b, fs in files.items() if len(fs) > self.compact_at_files]
        if hot:
            compact(self.spark, table, buckets=hot)

    def apply_epoch(self, changes: DataFrame, epoch_id: int) -> EpochResult:
        t0 = time.monotonic()
        if self.commitlog.is_committed(epoch_id):
            return EpochResult(epoch_id, True, 0, 0.0, [])

        table = self.table
        added = evolve_if_needed(changes, table)

        if self.mode == "mor" and self.n_source_partitions:
            # single-pass path: the append write job carries the stats as
            # observed metrics — one scan of the batch per epoch, no persist
            from pyspark.sql import Observation

            obs = Observation()
            observed = changes.observe(
                obs, *observe_exprs(changes.columns, self.n_source_partitions)
            )
            merge_mor(self.spark, table, observed)
            stats = stats_from_observation(obs.get, self.n_source_partitions)
            if stats.n_events > 0:
                self._maybe_compact(table)
        else:
            # two-pass path: explicit stats aggregation, then the merge
            changes = changes.persist()
            try:
                stats = batch_stats(changes)
                if stats.n_events > 0:
                    if self.mode == "mor":
                        merge_mor(self.spark, table, changes)
                        self._maybe_compact(table)
                    else:
                        # a batch much larger than the bucket count almost
                        # surely touches every bucket — skip the pruning job
                        # (safe overestimate)
                        merge_into(
                            self.spark,
                            table,
                            changes,
                            assume_all_buckets=stats.n_events
                            > 1000 * table.num_buckets,
                        )
            finally:
                changes.unpersist()

        if stats.n_events == 0:
            self.commitlog.commit(epoch_id, stats.fingerprint, stats.offsets)
            return EpochResult(epoch_id, False, 0, time.monotonic() - t0, added)

        # lineage rows come from the collected stats (no second agg job)
        append_lineage_rows(
            self.spark, self.lineage_path, epoch_id, stats.lineage_rows
        )

        duration = time.monotonic() - t0
        append_metrics(
            self.spark,
            self.metrics_path,
            epoch_id,
            events=stats.n_events,
            duration_s=duration,
            lag_events=0,
        )

        self.commitlog.commit(epoch_id, stats.fingerprint, stats.offsets)
        return EpochResult(
            epoch_id, False, stats.n_events, time.monotonic() - t0, added
        )
