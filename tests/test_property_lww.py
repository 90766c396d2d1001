"""Property-based check: engine LWW == sequential oracle on arbitrary streams.

Hypothesis generates adversarial little change streams (key collisions, equal
timestamps, duplicate lsns with identical payloads, deletes); the distributed
reduction must agree with the one-row-at-a-time oracle on every one.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_documentos_spark import oracle
from etl_documentos_spark.operators.lww import lww_dedup
from etl_documentos_spark.schemas import CHANGE_EVENTS

BASE = datetime.datetime(2024, 1, 1)


@st.composite
def change_streams(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    events = []
    for lsn in range(n):
        conv = f"c{draw(st.integers(0, 2))}"
        turn = draw(st.integers(0, 2))
        op = draw(st.sampled_from(["insert", "update", "delete"]))
        ts = BASE + datetime.timedelta(seconds=draw(st.integers(0, 5)))
        text = None if op == "delete" else f"t{lsn}"
        events.append(
            (op, conv, turn, None if op == "delete" else "user", text, None,
             ts, lsn, 0)
        )
    # exact duplicates of a random subset (same lsn + payload)
    for i in draw(st.lists(st.integers(0, n - 1), max_size=5)):
        events.append(events[i])
    return events


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(change_streams())
def test_lww_matches_oracle_on_arbitrary_streams(spark, events):
    df = spark.createDataFrame(events, CHANGE_EVENTS)
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in lww_dedup(df).collect()
        if r["op"] != "delete"
    }
    rows = [
        dict(zip([f.name for f in CHANGE_EVENTS.fields], e)) for e in events
    ]
    want = {
        (w["conv_id"], w["turn_idx"]): w["text"]
        for w in oracle.reduce_events(rows)
    }
    assert got == want
