"""as-of join semantics: backward inclusive, deterministic ties, null when
no earlier right row exists."""

from __future__ import annotations

import datetime

from etl_documentos_spark.operators.asof import asof_join

T0 = datetime.datetime(2024, 1, 1)


def _ts(s):
    return T0 + datetime.timedelta(seconds=s)


def test_asof_backward_inclusive_and_nulls(spark):
    left = spark.createDataFrame(
        [("u1", 1, _ts(10)), ("u1", 2, _ts(20)), ("u2", 3, _ts(5))],
        "k string, lid int, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", 100, _ts(10)), ("u1", 101, _ts(15)), ("u2", 102, _ts(9))],
        "k string, rid int, ts timestamp",
    )
    out = {
        r["lid"]: (r["rid_right"], r["ts_right"])
        for r in asof_join(
            left, right, on="k", right_cols=["rid"], tiebreak="rid"
        ).collect()
    }
    # equal-ts right row matches (inclusive)
    assert out[1] == (100, _ts(10))
    # latest right at-or-before 20 is rid=101
    assert out[2] == (101, _ts(15))
    # u2's only right row is AFTER the left row -> no match
    assert out[3] == (None, None)


def test_asof_tiebreak_deterministic(spark):
    left = spark.createDataFrame(
        [("u1", 1, _ts(10))], "k string, lid int, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u1", 7, _ts(10)), ("u1", 9, _ts(10)), ("u1", 8, _ts(10))],
        "k string, rid int, ts timestamp",
    )
    [row] = asof_join(
        left, right, on="k", right_cols=["rid"], tiebreak="rid"
    ).collect()
    assert row["rid_right"] == 9  # max tiebreak wins deterministically


def test_asof_string_tiebreak_not_nulled(spark):
    """A non-numeric tiebreak (string id) must order natively — the old cast
    to long nulled it and made equal-ts ordering nondeterministic."""
    left = spark.createDataFrame(
        [("u1", 1, _ts(10))], "k string, lid int, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u1", "a", _ts(10)), ("u1", "c", _ts(10)), ("u1", "b", _ts(10))],
        "k string, rid string, ts timestamp",
    )
    [row] = asof_join(
        left, right, on="k", right_cols=["rid"], tiebreak="rid"
    ).collect()
    assert row["rid_right"] == "c"  # lexicographically-last string wins
