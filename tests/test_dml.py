"""Predicate DML (DELETE WHERE / UPDATE WHERE) over the lake table.

Contract under test: DML compiles onto the same version-checked merge as the
CDC stream, so (a) results equal the obvious DataFrame restatement, (b) the
pre-DML snapshot stays readable (time travel), (c) tombstones fence late
pre-DML duplicates but lose to genuinely newer stream updates, and (d) a
re-run delete is a no-op.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from etl_documentos_spark import datagen
from etl_documentos_spark.lake.table import LakeTable
from etl_documentos_spark.operators.dml import delete_where, update_where
from etl_documentos_spark.operators.merge import (
    merge_into,
    physical_schema,
    read_current,
)
from etl_documentos_spark.schemas import TRANSCRIPTS


def _rows(df, cols=("conv_id", "turn_idx", "role", "text", "tool", "ts")):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture()
def dml_table(spark, tmp_path):
    table = LakeTable.create(
        str(tmp_path / "t"), physical_schema(TRANSCRIPTS), num_buckets=4
    )
    ch = datagen.change_stream(
        spark, n_events=2_000, n_convs=30, turns_per_conv=10
    ).persist()
    merge_into(spark, table, ch)
    return table, ch


def test_delete_where_removes_only_matches(spark, dml_table):
    table, _ = dml_table
    before = read_current(spark, table).persist()
    victims = _rows(before.filter("role = 'tool'"))
    survivors = _rows(before.filter("role <> 'tool'"))
    assert victims, "fixture must have matching rows"

    n = delete_where(spark, table, "role = 'tool'")
    assert n == len(victims)
    after = read_current(spark, table)
    assert _rows(after) == survivors
    # re-run: nothing left to match, no-op
    assert delete_where(spark, table, "role = 'tool'") == 0


def test_delete_where_is_time_travelable(spark, dml_table):
    table, _ = dml_table
    snap_before = table.current_snapshot.snapshot_id
    before = _rows(read_current(spark, table))
    delete_where(spark, table, F.col("role") == "tool")
    # the pre-DML snapshot still reads complete
    old = table.scan(spark, snapshot_id=snap_before)
    from etl_documentos_spark.operators.lww import lww_dedup

    cur = lww_dedup(old, order_cols=("ts", "_lsn")).filter(
        ~F.coalesce(F.col("_deleted"), F.lit(False))
    )
    assert _rows(cur) == before


def test_delete_tombstone_fences_late_duplicate(spark, dml_table):
    """A late re-delivery of a pre-DML event (same version as the erased
    row) must NOT resurrect the key; a genuinely newer update must."""
    table, ch = dml_table
    target = (
        read_current(spark, table)
        .filter("role = 'tool'")
        .select("conv_id", "turn_idx", "ts")
        .first()
    )
    delete_where(spark, table, "role = 'tool'")

    # replay the original events for that key (at-least-once duplicate)
    dup = ch.filter(
        (F.col("conv_id") == target.conv_id)
        & (F.col("turn_idx") == target.turn_idx)
    )
    merge_into(spark, table, dup)
    gone = read_current(spark, table).filter(
        (F.col("conv_id") == target.conv_id)
        & (F.col("turn_idx") == target.turn_idx)
    )
    assert gone.count() == 0, "late duplicate resurrected a deleted key"

    # a newer stream update (later event time) wins over the tombstone
    newer = spark.createDataFrame(
        [
            (
                "insert",
                target.conv_id,
                int(target.turn_idx),
                "user",
                "re-created",
                None,
                target.ts + datetime.timedelta(seconds=60),
                10_000_000,
                0,
            )
        ],
        "op string, conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp, lsn long, source_partition int",
    )
    merge_into(spark, table, newer)
    back = read_current(spark, table).filter(
        (F.col("conv_id") == target.conv_id)
        & (F.col("turn_idx") == target.turn_idx)
    )
    assert [r.text for r in back.collect()] == ["re-created"]


def test_update_where_matches_dataframe_restatement(spark, dml_table):
    table, _ = dml_table
    before = read_current(spark, table).persist()
    pred = F.col("role") == "assistant"
    expected = sorted(
        tuple(r)
        for r in before.select(
            "conv_id",
            "turn_idx",
            "role",
            F.when(pred, F.lit("[redacted]")).otherwise(F.col("text")).alias(
                "text"
            ),
            F.when(pred, F.lit("redactor")).otherwise(F.col("tool")).alias(
                "tool"
            ),
        ).collect()
    )
    n_match = before.filter(pred).count()

    n = update_where(
        spark,
        table,
        pred,
        {"text": F.lit("[redacted]"), "tool": F.lit("redactor")},
    )
    assert n == n_match
    got = sorted(
        tuple(r)
        for r in read_current(spark, table)
        .select("conv_id", "turn_idx", "role", "text", "tool")
        .collect()
    )
    assert got == expected


def test_update_where_expression_sees_old_row(spark, dml_table):
    table, _ = dml_table
    one = read_current(spark, table).first()
    pred = (F.col("conv_id") == one.conv_id) & (
        F.col("turn_idx") == one.turn_idx
    )
    update_where(
        spark, table, pred, {"text": F.concat(F.col("text"), F.lit("+X"))}
    )
    got = read_current(spark, table).filter(pred).first()
    assert got.text == one.text + "+X"
    # version advanced by exactly the engine tick
    assert got.ts == one.ts + datetime.timedelta(microseconds=1)


def test_update_where_rejects_key_and_version_columns(spark, dml_table):
    table, _ = dml_table
    with pytest.raises(ValueError, match="key columns|engine-managed"):
        update_where(spark, table, "true", {"conv_id": F.lit("x")})
    with pytest.raises(ValueError, match="engine-managed"):
        update_where(spark, table, "true", {"ts": F.current_timestamp()})
    with pytest.raises(ValueError, match="unknown columns"):
        update_where(spark, table, "true", {"nope": F.lit(1)})
