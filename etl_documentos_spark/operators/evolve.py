"""Additive schema evolution: propagate new event columns to the table.

Diffs the incoming change-batch schema against the table schema (the set
logic the reference applies to required-vs-extracted fields,
``/root/reference/app/core/document_tracking.py:127-137``, and resolves with
Alembic autogenerate, ``/root/reference/app/database/migrations.py:49-107``)
and ADDs the missing columns as nullable — metadata-only, no data-file
rewrite. Pre-evolution rows read back null.

Only *additive* evolution is supported (new nullable columns). Type changes
or drops raise — same guardrail Iceberg applies to unsafe evolutions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from etl_documentos_spark.lake.table import LakeTable

#: change-envelope columns that never become table columns
ENVELOPE_COLS = {"op", "lsn", "source_partition", "epoch"}


def diff_schema(changes: DataFrame, table: LakeTable) -> list[T.StructField]:
    """Columns present in the batch but not in the table (envelope excluded)."""
    existing = {f.name for f in table.schema.fields}
    out = []
    for f in changes.schema.fields:
        if f.name in ENVELOPE_COLS or f.name in existing:
            continue
        out.append(T.StructField(f.name, f.dataType, True))
    return out


def check_compatible(changes: DataFrame, table: LakeTable) -> None:
    """Reject non-additive drift: same-name columns must keep their type."""
    table_types = {f.name: f.dataType for f in table.schema.fields}
    for f in changes.schema.fields:
        if f.name in ENVELOPE_COLS:
            continue
        if f.name in table_types and f.dataType != table_types[f.name]:
            raise TypeError(
                f"incompatible evolution of column {f.name!r}: "
                f"{table_types[f.name].simpleString()} -> {f.dataType.simpleString()}"
            )


def evolve_if_needed(changes: DataFrame, table: LakeTable) -> list[str]:
    """Additively evolve the table to cover the batch. Returns added names."""
    check_compatible(changes, table)
    added = diff_schema(changes, table)
    if added:
        table.add_columns(added)
    return [f.name for f in added]
