"""Real-Iceberg backend behind the same merge API as the custom LakeTable.

The north-star targets "MERGE into an Iceberg table". The engine's own
``LakeTable`` is a faithful stand-in (snapshots, bucket partitioning,
additive evolution, atomic pointer commits) built because the sandbox has no
Iceberg runtime jars; this adapter is the drop-in path for environments that
DO have them (``spark-submit --packages org.apache.iceberg:...`` + a
configured catalog). Same semantics, expressed as Iceberg SQL:

- ``merge_into``     -> ``MERGE INTO t USING s ON keys WHEN MATCHED [AND
  version-check] UPDATE / DELETE WHEN NOT MATCHED INSERT``
- schema evolution   -> ``ALTER TABLE ... ADD COLUMNS`` (metadata-only)
- bucket partitioning-> ``PARTITIONED BY (bucket(N, conv_id))``
- compaction         -> ``CALL catalog.system.rewrite_data_files``

The LWW version check rides inside the MERGE condition: an update only wins
when ``(s.ts, s.lsn) > (t.ts, t._lsn)``, so re-applied epochs and late
events are no-ops exactly as in ``operators/merge.py``. Delete tombstones
are unnecessary on real Iceberg ONLY if the stream is in-order per key;
with out-of-order input keep the ``_deleted`` flag columns as here, so a
late update cannot resurrect a deleted key (same design as the custom
table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_documentos_spark.operators.lww import lww_dedup
from etl_documentos_spark.schemas import KEY_COLS


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg SparkSessionExtensions + catalog is usable."""
    try:
        jvm = spark._jvm  # type: ignore[attr-defined]
        jvm.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:  # noqa: BLE001 — any failure means "not installed"
        return False


def create_table(
    spark: SparkSession,
    table: str,
    num_buckets: int = 16,
    bucket_col: str = "conv_id",
) -> None:
    """CREATE the transcripts table bucket-partitioned like LakeTable."""
    from etl_documentos_spark.operators.merge import physical_schema
    from etl_documentos_spark.schemas import TRANSCRIPTS

    cols = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in physical_schema(TRANSCRIPTS).fields
    )
    spark.sql(
        f"CREATE TABLE {table} ({cols}) USING iceberg "
        f"PARTITIONED BY (bucket({num_buckets}, {bucket_col})) "
        f"TBLPROPERTIES ('write.merge.mode'='merge-on-read', "
        f"'write.distribution-mode'='hash')"
    )


def evolve_if_needed(spark: SparkSession, table: str, changes: DataFrame) -> list[str]:
    """Additive schema evolution: ADD COLUMNS for new change columns."""
    existing = {f.name for f in spark.table(table).schema.fields}
    skip = {"op", "lsn", "source_partition", "epoch"}
    added = [
        f
        for f in changes.schema.fields
        if f.name not in existing and f.name not in skip
    ]
    if added:
        cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in added)
        spark.sql(f"ALTER TABLE {table} ADD COLUMNS ({cols})")
    return [f.name for f in added]


def merge_into(spark: SparkSession, table: str, changes: DataFrame) -> None:
    """Version-checked LWW MERGE of one change batch into an Iceberg table.

    Batch-internal LWW first (same ``lww_dedup``), then one MERGE whose
    matched-clauses carry the ``(ts, lsn)`` version check — identical
    semantics to ``operators.merge.merge_into`` on the custom table.
    """
    from etl_documentos_spark.operators.merge import changes_to_physical

    target_schema = spark.table(table).schema
    deduped = changes_to_physical(
        lww_dedup(changes, key_cols=KEY_COLS, order_cols=("ts", "lsn")),
        target_schema,
    )
    deduped.createOrReplaceTempView("_cdc_updates")
    on = " AND ".join(f"t.{k} = s.{k}" for k in KEY_COLS)
    newer = "(s.ts > t.ts) OR (s.ts = t.ts AND s._lsn > t._lsn)"
    set_cols = ", ".join(
        f"t.{f.name} = s.{f.name}" for f in target_schema.fields
    )
    insert_cols = ", ".join(f.name for f in target_schema.fields)
    insert_vals = ", ".join(f"s.{f.name}" for f in target_schema.fields)
    spark.sql(
        f"""
        MERGE INTO {table} t USING _cdc_updates s ON {on}
        WHEN MATCHED AND ({newer}) THEN UPDATE SET {set_cols}
        WHEN NOT MATCHED THEN INSERT ({insert_cols}) VALUES ({insert_vals})
        """
    )


def read_current(spark: SparkSession, table: str) -> DataFrame:
    """Reader view matching ``operators.merge.read_current``."""
    from pyspark.sql import functions as F

    df = spark.table(table)
    live = df.filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
    return live.drop("_deleted", "_lsn")


def compact(spark: SparkSession, catalog: str, table: str) -> None:
    """Read-optimize via Iceberg's maintenance procedure."""
    spark.sql(
        f"CALL {catalog}.system.rewrite_data_files(table => '{table}')"
    )
