"""Lineage + throughput/lag metrics emission (FIXTURES.md §5 shapes).

Append-only parquet tables, one write per epoch. Reference analogues: the
date-partitioned JSONL processing log
(``/root/reference/app/core/document_tracking.py:255-274``) and the
incrementally-updated per-endpoint metrics
(``/root/reference/app/services/analytics_service.py:269-292``).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_documentos_spark.schemas import LINEAGE, METRICS


def append_lineage(
    spark: SparkSession, path: str, epoch_id: int, per_partition: DataFrame
) -> None:
    """``per_partition``: source_partition, events_read, rows_upserted,
    rows_deleted, conv_ids_touched — epoch_id is stamped here."""
    out = per_partition.select(
        F.lit(epoch_id).cast("long").alias("epoch_id"),
        F.col("source_partition").cast("int"),
        F.col("events_read").cast("long"),
        F.col("rows_upserted").cast("long"),
        F.col("rows_deleted").cast("long"),
        F.col("conv_ids_touched").cast("long"),
    )
    out.write.mode("append").parquet(path)


def append_metrics(
    spark: SparkSession,
    path: str,
    epoch_id: int,
    events: int,
    duration_s: float,
    lag_events: int,
) -> None:
    row = [
        (
            epoch_id,
            (events / duration_s) if duration_s > 0 else 0.0,
            lag_events,
            duration_s,
            datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None),
        )
    ]
    spark.createDataFrame(row, METRICS).coalesce(1).write.mode("append").parquet(path)


def read_lineage(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(LINEAGE).parquet(path)


def read_metrics(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(METRICS).parquet(path)
