"""Aggregation merge engine vs a sequential fold oracle."""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_documentos_spark.operators.aggregate_engine import aggregate_dedup

T0 = datetime.datetime(2024, 1, 1)
SCHEMA = (
    "op string, conv_id string, turn_idx int, tokens long, cost double,"
    " model string, ts timestamp, lsn long"
)
COLS = [c.split()[0] for c in SCHEMA.split(", ")]
FOLDS = {"tokens": "sum", "cost": "max", "model": "last_non_null"}


def _fold(rows):
    state: dict = {}
    for r in sorted(rows, key=lambda r: (r["ts"], r["lsn"])):
        k = (r["conv_id"], r["turn_idx"])
        if r["op"] == "delete":
            state.pop(k, None)
            continue
        cur = state.setdefault(
            k, {"tokens": None, "cost": None, "model": None}
        )
        if r["tokens"] is not None:
            cur["tokens"] = (cur["tokens"] or 0) + r["tokens"]
        if r["cost"] is not None:
            cur["cost"] = max(cur["cost"], r["cost"]) if cur["cost"] is not None else r["cost"]
        if r["model"] is not None:
            cur["model"] = r["model"]
        cur["ts"], cur["lsn"] = r["ts"], r["lsn"]
    return state


def _run(spark, events):
    df = spark.createDataFrame(events, SCHEMA)
    got = {
        (r["conv_id"], r["turn_idx"]): (
            r["tokens"], r["cost"], r["model"], r["ts"], r["lsn"]
        )
        for r in aggregate_dedup(df, FOLDS).collect()
    }
    want = {
        k: (v["tokens"], v["cost"], v["model"], v["ts"], v["lsn"])
        for k, v in _fold([dict(zip(COLS, e)) for e in events]).items()
    }
    assert got == want


def test_counter_semantics(spark):
    ev = [
        ("insert", "c0", 0, 10, 0.5, "m1", T0, 1),
        ("update", "c0", 0, 7, 0.2, None, T0 + datetime.timedelta(seconds=1), 2),
        ("update", "c0", 0, None, 0.9, "m2", T0 + datetime.timedelta(seconds=2), 3),
        # reset-by-delete, then a fresh count
        ("delete", "c1", 0, None, None, None, T0 + datetime.timedelta(seconds=3), 4),
        ("insert", "c1", 0, 5, 0.1, "m1", T0 + datetime.timedelta(seconds=4), 5),
    ]
    _run(spark, ev)


def test_rejects_bad_fold_spec(spark):
    df = spark.createDataFrame([], SCHEMA)
    with pytest.raises(ValueError, match="unknown folds"):
        aggregate_dedup(df, {"tokens": "median"})
    with pytest.raises(ValueError, match="not in stream"):
        aggregate_dedup(df, {"nope": "sum"})


@st.composite
def counter_streams(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    events = []
    for lsn in range(n):
        op = draw(st.sampled_from(["insert", "update", "update", "delete"]))
        conv = f"c{draw(st.integers(0, 2))}"
        ts = T0 + datetime.timedelta(seconds=draw(st.integers(0, 5)))
        if op == "delete":
            events.append((op, conv, 0, None, None, None, ts, lsn))
        else:
            events.append(
                (
                    op, conv, 0,
                    draw(st.sampled_from([None, 1, 5])),
                    draw(st.sampled_from([None, 0.25, 1.5])),
                    draw(st.sampled_from([None, "m1", "m2"])),
                    ts, lsn,
                )
            )
    return events


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(counter_streams())
def test_aggregate_engine_matches_oracle(spark, events):
    _run(spark, events)
