"""SQL INSERT INTO / MERGE INTO through the catalog door (lake/sql.py ->
operators/dml.py). Contracts under test: value-correctness vs a Python
re-derivation, single-snapshot atomicity per statement, clause-order
semantics (first matching WHEN wins), and the ON-must-be-key-equality
restriction that keeps MERGE bucket-prunable."""

from __future__ import annotations

import datetime

import pytest

from etl_documentos_spark.lake.sql import sql
from etl_documentos_spark.lake.table import LakeTable
from etl_documentos_spark.operators.merge import (
    merge_into,
    physical_schema,
    read_current,
)
from etl_documentos_spark.schemas import TRANSCRIPTS

T0 = datetime.datetime(2024, 1, 1)


def _events(spark, lo, hi):
    rows = [
        ("insert", f"conv_{i % 6}", i % 4, "user" if i % 2 else "bot",
         f"text {i}", None, T0 + datetime.timedelta(seconds=i), i, 0)
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(
        rows,
        "op string, conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp, lsn long, source_partition int",
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(
        str(tmp_path / "t"), physical_schema(TRANSCRIPTS), num_buckets=2
    )
    merge_into(spark, t, _events(spark, 0, 40))
    return t


def _state(spark, table):
    return {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"])
        for r in read_current(spark, table).collect()
    }


def test_insert_values(spark, table):
    before = _state(spark, table)
    res = sql(
        spark,
        {"transcripts": table},
        "INSERT INTO transcripts (conv_id, turn_idx, role, text, ts) "
        "VALUES ('conv_new', 0, 'user', 'hello', TIMESTAMP '2024-02-01'), "
        "('conv_new', 1, 'bot', 'hi', TIMESTAMP '2024-02-01 00:00:01')",
    ).collect()
    assert res[0]["affected_rows"] == 2
    after = _state(spark, table)
    assert after[("conv_new", 0)] == ("user", "hello", None)
    assert after[("conv_new", 1)] == ("bot", "hi", None)
    assert {k: v for k, v in after.items() if k[0] != "conv_new"} == before


def test_insert_select_snapshot_isolated(spark, table):
    """INSERT ... SELECT reads the statement-start snapshot of the SAME
    table it writes (no Halloween problem: the scan is pinned first)."""
    res = sql(
        spark,
        {"transcripts": table},
        "INSERT INTO transcripts (conv_id, turn_idx, role, text, ts) "
        "SELECT concat(conv_id, '_copy'), turn_idx, role, text, "
        "ts + INTERVAL 1 DAY FROM transcripts WHERE conv_id = 'conv_1'",
    ).collect()
    n_src = len(
        [k for k in _state(spark, table) if k[0] == "conv_1"]
    )
    assert res[0]["affected_rows"] == n_src
    copies = {k for k in _state(spark, table) if k[0] == "conv_1_copy"}
    assert len(copies) == n_src


def test_insert_is_lww_upsert(spark, table):
    """Inserting an existing key with an OLDER version loses to the
    current row; with a newer version it wins — upsert-by-version."""
    key_state = _state(spark, table)[("conv_1", 1)]
    sql(
        spark,
        {"transcripts": table},
        "INSERT INTO transcripts (conv_id, turn_idx, role, text, ts) "
        "VALUES ('conv_1', 1, 'user', 'stale', TIMESTAMP '2020-01-01')",
    )
    assert _state(spark, table)[("conv_1", 1)] == key_state
    sql(
        spark,
        {"transcripts": table},
        "INSERT INTO transcripts (conv_id, turn_idx, role, text, ts) "
        "VALUES ('conv_1', 1, 'user', 'fresh', TIMESTAMP '2030-01-01')",
    )
    assert _state(spark, table)[("conv_1", 1)] == ("user", "fresh", None)


def test_merge_full_statement_atomic(spark, table):
    """UPDATE + DELETE + INSERT clauses apply as ONE snapshot commit with
    first-matching-clause-wins semantics."""
    before = _state(spark, table)
    snaps_before = len(table.snapshots)
    res = sql(
        spark,
        {"transcripts": table},
        """
        MERGE INTO transcripts t USING (
          SELECT 'conv_1' AS conv_id, 1 AS turn_idx, 'patched' AS new_text
          UNION ALL SELECT 'conv_2', 2, 'unused'
          UNION ALL SELECT 'conv_ins', 9, 'brand new'
        ) s
        ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        WHEN MATCHED AND s.conv_id = 'conv_2' THEN DELETE
        WHEN MATCHED THEN UPDATE SET text = s.new_text
        WHEN NOT MATCHED THEN INSERT (conv_id, turn_idx, role, text, ts)
          VALUES (s.conv_id, s.turn_idx, 'system', s.new_text,
                  TIMESTAMP '2024-03-01')
        """,
    ).collect()[0]
    table._refresh()
    assert (res["updated"], res["deleted"], res["inserted"]) == (1, 1, 1)
    assert len(table.snapshots) == snaps_before + 1  # atomic: ONE commit
    after = _state(spark, table)
    assert after[("conv_1", 1)][1] == "patched"
    assert ("conv_2", 2) not in after
    assert after[("conv_ins", 9)] == ("system", "brand new", None)
    untouched = {
        k: v for k, v in before.items()
        if k not in {("conv_1", 1), ("conv_2", 2)}
    }
    assert {k: after[k] for k in untouched} == untouched


def test_merge_clause_order_first_wins(spark, table):
    """A row matching BOTH matched clauses takes the first one only."""
    res = sql(
        spark,
        {"transcripts": table},
        """
        MERGE INTO transcripts t
        USING (SELECT 'conv_1' AS conv_id, 1 AS turn_idx) s
        ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        WHEN MATCHED THEN UPDATE SET text = 'first'
        WHEN MATCHED THEN DELETE
        """,
    ).collect()[0]
    assert (res["updated"], res["deleted"]) == (1, 0)
    assert _state(spark, table)[("conv_1", 1)][1] == "first"


def test_merge_insert_star(spark, table):
    src = spark.createDataFrame(
        [("conv_star", 5, "bot", "starred", None,
          T0 + datetime.timedelta(days=40))],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    src.createOrReplaceTempView("star_src")
    res = sql(
        spark,
        {"transcripts": table},
        "MERGE INTO transcripts t USING star_src s "
        "ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx "
        "WHEN NOT MATCHED THEN INSERT *",
    ).collect()[0]
    assert res["inserted"] == 1
    assert _state(spark, table)[("conv_star", 5)] == ("bot", "starred", None)


def test_merge_on_must_be_key_equality(spark, table):
    with pytest.raises(ValueError, match="key"):
        sql(
            spark,
            {"transcripts": table},
            "MERGE INTO transcripts t "
            "USING (SELECT 'conv_1' AS conv_id, 1 AS turn_idx) s "
            "ON t.conv_id = s.conv_id "
            "WHEN MATCHED THEN DELETE",
        )
    with pytest.raises(ValueError, match="key equalit"):
        sql(
            spark,
            {"transcripts": table},
            "MERGE INTO transcripts t "
            "USING (SELECT 'conv_1' AS conv_id, 1 AS turn_idx) s "
            "ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx "
            "AND t.role = 'user' "
            "WHEN MATCHED THEN DELETE",
        )


def test_merge_idempotent_reapply(spark, table):
    """Re-running the same MERGE re-matches like SQL does and stays
    value-stable for idempotent assignments; the insert branch becomes a
    no-op (key now exists)."""
    stmt = (
        "MERGE INTO transcripts t "
        "USING (SELECT 'conv_idem' AS conv_id, 3 AS turn_idx) s "
        "ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx "
        "WHEN MATCHED THEN UPDATE SET text = 'settled' "
        "WHEN NOT MATCHED THEN INSERT (conv_id, turn_idx, role, text, ts) "
        "VALUES (s.conv_id, s.turn_idx, 'sys', 'settled', "
        "TIMESTAMP '2024-04-01')"
    )
    r1 = sql(spark, {"transcripts": table}, stmt).collect()[0]
    r2 = sql(spark, {"transcripts": table}, stmt).collect()[0]
    assert (r1["inserted"], r1["updated"]) == (1, 0)
    assert (r2["inserted"], r2["updated"]) == (0, 1)
    assert _state(spark, table)[("conv_idem", 3)][1] == "settled"
