"""Minimal lake-table format: parquet data files + JSON snapshot metadata.

The sandbox has no Iceberg runtime jars, so this package provides the same
contract a real Iceberg hadoop-catalog table would give the engine — atomic
snapshot commits, bucket(conv_id) partition pruning, partition-level
copy-on-write overwrite (the MERGE primitive), additive schema evolution
without rewriting data files, and time travel — implemented over plain
parquet. On a cluster with Iceberg jars, `LakeTable` is the single seam to
swap for `spark.sql("MERGE INTO ...")`.
"""

from etl_documentos_spark.lake.table import LakeTable

__all__ = ["LakeTable"]
