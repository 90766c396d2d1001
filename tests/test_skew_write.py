"""Hot-bucket write salting: the straggler bound in practice.

A conversation holding ~30% of a change batch lands in ONE bucket; the write
must spread that bucket across multiple tasks/files or the hottest writer
serializes the append (SURVEY §4 item 4). Asserts the spread exists, is
roughly uniform (LSN-derived salt), and that explicit salt overrides hold.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_documentos_spark.lake.table import LakeTable
from etl_documentos_spark.operators.merge import (
    changes_to_physical,
    physical_schema,
)
from etl_documentos_spark.schemas import TRANSCRIPTS


def _skewed_batch(spark, n=20_000, hot_frac=0.3):
    e = spark.range(0, n).withColumnRenamed("id", "lsn")
    is_hot = F.pmod(F.xxhash64("lsn"), F.lit(1000)) < int(hot_frac * 1000)
    return e.select(
        F.lit("insert").alias("op"),
        F.when(is_hot, F.lit("conv_hot"))
        .otherwise(F.concat(F.lit("conv_"), (F.col("lsn") % 500).cast("string")))
        .alias("conv_id"),
        (F.col("lsn") % 30).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("txt "), F.col("lsn").cast("string")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("lsn")).alias("ts"),
        F.col("lsn"),
        (F.col("lsn") % 8).cast("int").alias("source_partition"),
    )


@pytest.fixture()
def table(tmp_path):
    return LakeTable.create(
        str(tmp_path / "t"), physical_schema(TRANSCRIPTS), num_buckets=8
    )


def _file_rows(spark, table, bucket_files):
    return [
        spark.read.parquet(os.path.join(table.root, f)).count()
        for f in bucket_files
    ]


def test_hot_bucket_spreads_across_salt_files(spark, table):
    batch = _skewed_batch(spark)
    phys = changes_to_physical(batch, table.schema)
    table.append(phys, salts=4)
    files = table.current_snapshot.files
    hot_bucket = max(
        files, key=lambda b: sum(_file_rows(spark, table, files[b]))
    )
    rows = _file_rows(spark, table, files[hot_bucket])
    assert len(rows) == 4, "hot bucket must split into `salts` files"
    # LSN-derived salt: near-uniform split (multinomial at n≈6000/4)
    assert max(rows) < 2 * min(rows), rows


def test_explicit_salt_overrides_property(spark, tmp_path):
    t = LakeTable.create(
        str(tmp_path / "t2"),
        physical_schema(TRANSCRIPTS),
        num_buckets=8,
        properties={"write.salts": "7"},
    )
    phys = changes_to_physical(_skewed_batch(spark, n=5000), t.schema)
    t.append(phys, salts=1)
    files = t.current_snapshot.files
    assert all(len(fs) == 1 for fs in files.values()), "salts=1 => 1 file/bucket"


def test_property_salt_used_when_no_override(spark, tmp_path):
    t = LakeTable.create(
        str(tmp_path / "t3"),
        physical_schema(TRANSCRIPTS),
        num_buckets=8,
        properties={"write.salts": "3"},
    )
    phys = changes_to_physical(_skewed_batch(spark, n=20_000), t.schema)
    t.append(phys)
    files = t.current_snapshot.files
    assert max(len(fs) for fs in files.values()) == 3
