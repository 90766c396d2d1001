"""Property-based check: predicate DML interleaved with stream merges equals
the sequential oracle.

Hypothesis generates a little adversarial change stream split into two
epochs with a DELETE WHERE or UPDATE WHERE applied between them; the engine
sequence merge(b1) -> DML -> merge(b2) must equal the one-row-at-a-time
reduction over (b1 + generated-DML-events + b2), where the DML events carry
the victim row's version plus the engine's one-microsecond tick. This pins
the DML consistency contract: snapshot-consistent against b1, fenced
against b1's late duplicates, transparent to b2's genuinely newer events.
"""

from __future__ import annotations

import datetime
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_documentos_spark.lake.table import LakeTable
from etl_documentos_spark.operators.dml import delete_where, update_where
from etl_documentos_spark.operators.merge import (
    merge_into,
    physical_schema,
    read_current,
)
from etl_documentos_spark.schemas import CHANGE_EVENTS, TRANSCRIPTS

BASE = datetime.datetime(2024, 1, 1)
COLS = [f.name for f in CHANGE_EVENTS.fields]
TICK = datetime.timedelta(microseconds=1)

PREDICATES = [
    ("turn_idx = 1", lambda r: r["turn_idx"] == 1),
    ("role = 'user'", lambda r: r["role"] == "user"),
    ("conv_id = 'c0'", lambda r: r["conv_id"] == "c0"),
]


@st.composite
def scenarios(draw):
    n = draw(st.integers(min_value=2, max_value=20))
    events = []
    for lsn in range(n):
        conv = f"c{draw(st.integers(0, 2))}"
        turn = draw(st.integers(0, 2))
        op = draw(st.sampled_from(["insert", "update", "delete"]))
        role = None if op == "delete" else draw(st.sampled_from(["user", "bot"]))
        ts = BASE + datetime.timedelta(seconds=draw(st.integers(0, 5)))
        text = None if op == "delete" else f"t{lsn}"
        events.append((op, conv, turn, role, text, None, ts, lsn, 0))
    cut = draw(st.integers(0, n))
    which = draw(st.integers(0, len(PREDICATES) - 1))
    kind = draw(st.sampled_from(["delete", "update"]))
    return events[:cut], events[cut:], which, kind


def _live_state(rows: list[dict]) -> dict:
    """Sequential LWW reduction keeping the full winning row (incl. lsn)."""
    state: dict = {}
    for r in sorted(rows, key=lambda r: (r["ts"], r["lsn"])):
        k = (r["conv_id"], r["turn_idx"])
        if r["op"] == "delete":
            state.pop(k, None)
        else:
            state[k] = r
    return state


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(scenarios())
def test_dml_interleaved_with_merges_matches_oracle(spark, scenario):
    b1, b2, which, kind = scenario
    sql_pred, py_pred = PREDICATES[which]

    root = tempfile.mkdtemp(prefix="prop_dml_")
    try:
        table = LakeTable.create(
            f"{root}/t", physical_schema(TRANSCRIPTS), num_buckets=2
        )
        if b1:
            merge_into(spark, table, spark.createDataFrame(b1, CHANGE_EVENTS))
        if kind == "delete":
            delete_where(spark, table, sql_pred)
        else:
            update_where(
                spark, table, sql_pred,
                {"text": F.concat(F.lit("X"), F.coalesce("text", F.lit("")))},
            )
        if b2:
            merge_into(spark, table, spark.createDataFrame(b2, CHANGE_EVENTS))

        got = {
            (r["conv_id"], r["turn_idx"]): (r["text"], r["ts"])
            for r in read_current(spark, table).collect()
        }

        # oracle: replay b1 + generated DML events + b2 sequentially
        rows1 = [dict(zip(COLS, e)) for e in b1]
        dml_events = []
        for r in _live_state(rows1).values():
            if not py_pred(r):
                continue
            g = dict(r)
            g["ts"] = r["ts"] + TICK
            if kind == "delete":
                g.update(op="delete", role=None, text=None)
            else:
                g.update(op="update", text="X" + (r["text"] or ""))
            dml_events.append(g)
        rows = rows1 + dml_events + [dict(zip(COLS, e)) for e in b2]
        want = {
            (r["conv_id"], r["turn_idx"]): (r["text"], r["ts"])
            for r in _live_state(rows).values()
        }
        assert got == want
    finally:
        shutil.rmtree(root, ignore_errors=True)
