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
from pyspark.sql import functions as F

from etl_documentos_spark.lake.table import LakeTable
from etl_documentos_spark.operators.evolve import evolve_if_needed
from etl_documentos_spark.operators.merge import merge_into
from etl_documentos_spark.streaming.commitlog import CommitLog, fingerprint
from etl_documentos_spark.streaming.lineage import append_lineage, append_metrics


@dataclass
class EpochResult:
    epoch_id: int
    skipped: bool
    events: int
    duration_s: float
    added_columns: list[str]


class CdcPipeline:
    """Owns the table + sidecar paths; one instance drives batch or stream."""

    def __init__(self, spark: SparkSession, table_root: str, workdir: str):
        self.spark = spark
        self.table_root = table_root
        self.workdir = workdir
        self.commitlog = CommitLog(os.path.join(workdir, "commits"))
        self.lineage_path = os.path.join(workdir, "lineage")
        self.metrics_path = os.path.join(workdir, "metrics")

    @property
    def table(self) -> LakeTable:
        return LakeTable.load(self.table_root)

    def apply_epoch(self, changes: DataFrame, epoch_id: int) -> EpochResult:
        t0 = time.monotonic()
        if self.commitlog.is_committed(epoch_id):
            return EpochResult(epoch_id, True, 0, 0.0, [])

        # cache: the batch feeds fingerprint, lineage agg and the merge
        changes = changes.persist()
        try:
            fp, offsets, n_events = fingerprint(changes)
            if n_events == 0:
                self.commitlog.commit(epoch_id, fp, offsets)
                return EpochResult(epoch_id, False, 0, time.monotonic() - t0, [])

            table = self.table
            added = evolve_if_needed(changes, table)

            merge_into(self.spark, table, changes)

            # lineage: per-source-partition counters (one partial-agg pass)
            lineage = changes.groupBy("source_partition").agg(
                F.count("*").alias("events_read"),
                F.sum(F.when(F.col("op") != "delete", 1).otherwise(0)).alias(
                    "rows_upserted"
                ),
                F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias(
                    "rows_deleted"
                ),
                F.approx_count_distinct("conv_id").alias("conv_ids_touched"),
            )
            append_lineage(self.spark, self.lineage_path, epoch_id, lineage)

            duration = time.monotonic() - t0
            append_metrics(
                self.spark,
                self.metrics_path,
                epoch_id,
                events=n_events,
                duration_s=duration,
                lag_events=0,
            )

            self.commitlog.commit(epoch_id, fp, offsets)
            return EpochResult(
                epoch_id, False, n_events, time.monotonic() - t0, added
            )
        finally:
            changes.unpersist()
