"""CDC-out through the SQL door: ``FROM t CHANGES BETWEEN a AND b``
(lake/sql.py) rewrites onto `lake.changelog.read_changes` views. Contracts:
equality with the direct API, tag-name endpoints, CURRENT upper bound,
coexistence with an unpinned read of the same table in one statement."""

from __future__ import annotations

import datetime

import pytest

from etl_documentos_spark.lake.changelog import read_changes
from etl_documentos_spark.lake.sql import sql
from etl_documentos_spark.lake.table import LakeTable
from etl_documentos_spark.operators.merge import (
    changes_to_physical,
    physical_schema,
)
from etl_documentos_spark.schemas import CHANGE_EVENTS, TRANSCRIPTS

T0 = datetime.datetime(2024, 1, 1)


def ev(op, conv, turn, ts_s, lsn, text=None):
    return (
        op, conv, turn,
        "user" if op != "delete" else None,
        text, None, T0 + datetime.timedelta(seconds=ts_s), lsn, 0,
    )


@pytest.fixture()
def mor_table(spark, tmp_path):
    root = str(tmp_path / "t")
    table = LakeTable.create(root, physical_schema(TRANSCRIPTS), num_buckets=4)
    batches = [
        [ev("insert", "c1", 0, 10, 1, "a"), ev("insert", "c2", 0, 11, 2, "b")],
        [ev("update", "c1", 0, 20, 3, "a2"), ev("delete", "c2", 0, 21, 4)],
        [ev("insert", "c3", 5, 30, 5, "c")],
    ]
    for i, b in enumerate(batches):
        table.append(
            changes_to_physical(
                spark.createDataFrame(b, CHANGE_EVENTS), table.schema
            )
        )
        if i == 0:
            table.tag("after_first")
    return table


def _rows(df):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["text"], r["_change_op"])
        for r in df.select(
            "conv_id", "turn_idx", "text", "_change_op"
        ).collect()
    )


def test_changes_between_ids_matches_api(spark, mor_table):
    t = mor_table
    first_append = t.refs["after_first"]
    got = sql(
        spark,
        {"transcripts": t},
        f"SELECT conv_id, turn_idx, text, _change_op "
        f"FROM transcripts CHANGES BETWEEN {first_append} AND CURRENT",
    )
    want = read_changes(spark, t, first_append)
    assert _rows(got) == _rows(want)
    assert _rows(got) == [
        ("c1", 0, "a2", "upsert"),
        ("c2", 0, None, "delete"),
        ("c3", 5, "c", "upsert"),
    ]


def test_changes_between_tags(spark, mor_table):
    t = mor_table
    t.tag("head")
    got = sql(
        spark,
        {"transcripts": t},
        "SELECT conv_id, _change_op FROM transcripts "
        "CHANGES BETWEEN 'after_first' AND 'head'",
    )
    assert sorted((r[0], r[1]) for r in got.collect()) == [
        ("c1", "upsert"), ("c2", "delete"), ("c3", "upsert"),
    ]


def test_changes_and_current_state_in_one_statement(spark, mor_table):
    """The changelog view and the unpinned current state of the SAME name
    join in one statement — change rows enriched with live-row presence."""
    t = mor_table
    lo = t.refs["after_first"]
    got = sql(
        spark,
        {"transcripts": t},
        f"""
        SELECT c.conv_id, c._change_op,
               CASE WHEN cur.conv_id IS NULL THEN false ELSE true END
                 AS still_live
        FROM transcripts CHANGES BETWEEN {lo} AND CURRENT c
        LEFT JOIN transcripts cur
          ON c.conv_id = cur.conv_id AND c.turn_idx = cur.turn_idx
        """,
    )
    assert sorted(tuple(r) for r in got.collect()) == [
        ("c1", "upsert", True),
        ("c2", "delete", False),
        ("c3", "upsert", True),
    ]


def test_changes_unknown_ref_raises(spark, mor_table):
    with pytest.raises(KeyError, match="unknown ref"):
        sql(
            spark,
            {"transcripts": mor_table},
            "SELECT * FROM transcripts CHANGES BETWEEN 'nope' AND CURRENT",
        )
