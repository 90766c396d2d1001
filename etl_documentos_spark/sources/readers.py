"""Multi-format readers with explicit schemas (no inference in prod paths).

Reference analogue: the format-dispatch scan layer
(``/root/reference/app/providers/docling_provider.py:64-74`` — 20 file
formats routed to one extraction contract). Here: one function per lake
format, all returning the caller's schema, plus the date-partitioned JSONL
log reader/writer that mirrors the reference's processing log
(``/root/reference/app/core/document_tracking.py:255-274``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).parquet(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON/JSONL with explicit schema — inference would scan twice."""
    return spark.read.schema(schema).json(path)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def write_jsonl_log(df: DataFrame, path: str, ts_col: str = "ts") -> None:
    """Date-partitioned JSONL append — the reference's
    ``logs/document_processing/processing_YYYYMMDD.jsonl`` shape as a
    distributed sink (one dir per day, JSON lines inside)."""
    (
        df.withColumn("log_date", F.date_format(F.col(ts_col), "yyyyMMdd"))
        .write.mode("append")
        .partitionBy("log_date")
        .json(path)
    )


def read_jsonl_log(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Read the date-partitioned JSONL log back (partition column included)."""
    full = T.StructType(list(schema.fields))
    return spark.read.schema(full).option("basePath", path).json(path + "/*")
