"""Field-level LWW (partial-update merge engine) vs a sequential oracle."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_documentos_spark.operators.partial import partial_update_dedup

T0 = datetime.datetime(2024, 1, 1)
SCHEMA = (
    "op string, conv_id string, turn_idx int, role string, text string,"
    " tool string, ts timestamp, lsn long, source_partition int"
)
COLS = [c.split()[0] for c in SCHEMA.split(", ")]
PAYLOAD = ["role", "text", "tool"]


def _fold(rows: list[dict]) -> dict:
    """Sequential oracle: apply events in (ts, lsn) order; delete resets."""
    state: dict = {}
    for r in sorted(rows, key=lambda r: (r["ts"], r["lsn"])):
        k = (r["conv_id"], r["turn_idx"])
        if r["op"] == "delete":
            state.pop(k, None)
            continue
        cur = state.setdefault(
            k, {c: None for c in PAYLOAD} | {"ts": None, "lsn": None}
        )
        for c in PAYLOAD:
            if r[c] is not None:
                cur[c] = r[c]
        cur["ts"], cur["lsn"] = r["ts"], r["lsn"]
    return state


def _run(spark, events):
    df = spark.createDataFrame(events, SCHEMA)
    got = {
        (r["conv_id"], r["turn_idx"]): (
            r["role"], r["text"], r["tool"], r["ts"], r["lsn"]
        )
        for r in partial_update_dedup(df).drop("source_partition").collect()
    }
    want = {
        k: (v["role"], v["text"], v["tool"], v["ts"], v["lsn"])
        for k, v in _fold([dict(zip(COLS, e)) for e in events]).items()
    }
    assert got == want


def test_sparse_updates_meld(spark):
    ev = [
        ("insert", "c0", 0, "user", "hello", None, T0, 1, 0),
        # sparse update: only tool set -> role/text survive from the insert
        ("update", "c0", 0, None, None, "calc", T0 + datetime.timedelta(seconds=1), 2, 0),
        # sparse update: only text set
        ("update", "c0", 0, None, "edited", None, T0 + datetime.timedelta(seconds=2), 3, 0),
    ]
    _run(spark, ev)


def test_delete_resets_fields(spark):
    ev = [
        ("insert", "c0", 0, "user", "old", "t1", T0, 1, 0),
        ("delete", "c0", 0, None, None, None, T0 + datetime.timedelta(seconds=1), 2, 0),
        # re-insert after delete: pre-delete tool must NOT leak through
        ("insert", "c0", 0, "bot", "new", None, T0 + datetime.timedelta(seconds=2), 3, 0),
        # fully deleted key stays absent
        ("insert", "c1", 0, "user", "gone", None, T0, 4, 0),
        ("delete", "c1", 0, None, None, None, T0 + datetime.timedelta(seconds=5), 5, 0),
    ]
    _run(spark, ev)


@st.composite
def sparse_streams(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    events = []
    for lsn in range(n):
        op = draw(st.sampled_from(["insert", "update", "delete"]))
        conv = f"c{draw(st.integers(0, 2))}"
        turn = draw(st.integers(0, 1))
        ts = T0 + datetime.timedelta(seconds=draw(st.integers(0, 5)))
        if op == "delete":
            events.append((op, conv, turn, None, None, None, ts, lsn, 0))
        else:
            events.append(
                (
                    op, conv, turn,
                    draw(st.sampled_from([None, "user", "bot"])),
                    draw(st.sampled_from([None, f"t{lsn}"])),
                    draw(st.sampled_from([None, "calc", "web"])),
                    ts, lsn, 0,
                )
            )
    return events


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sparse_streams())
def test_partial_update_matches_oracle(spark, events):
    _run(spark, events)
