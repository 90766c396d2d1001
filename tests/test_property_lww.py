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


# ---------------------------------------------------------------------------
# commit-log roll-up properties (pure python, no Spark)
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    committed=st.sets(st.integers(min_value=0, max_value=60), max_size=40),
    keep_last=st.integers(min_value=0, max_value=10),
    rounds=st.integers(min_value=1, max_value=3),
)
def test_commitlog_rollup_never_lies(tmp_path_factory, committed, keep_last, rounds):
    """After any number of compactions with any keep_last, is_committed
    answers exactly the ground-truth membership and max_offsets is exact."""
    import uuid

    from etl_documentos_spark.streaming.commitlog import CommitLog

    root = tmp_path_factory.mktemp("cl") / uuid.uuid4().hex
    log = CommitLog(str(root))
    truth_offsets = {}
    for e in sorted(committed):
        off = {0: e * 3, 1: e * 5 + 1}
        log.commit(e, f"fp{e}", off)
        for k, v in off.items():
            truth_offsets[k] = max(truth_offsets.get(k, -1), v)
    for _ in range(rounds):
        log.compact_log(keep_last=keep_last)
    for e in range(62):
        assert log.is_committed(e) == (e in committed), (e, committed, keep_last)
    if committed:
        assert log.max_offsets() == truth_offsets
