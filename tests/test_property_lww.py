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


# ---------------------------------------------------------------------------
# end-to-end merge + mid-stream evolution property (Spark + LakeTable)
# ---------------------------------------------------------------------------
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(change_streams(), st.integers(min_value=0, max_value=24))
def test_merge_with_mid_stream_evolution_matches_oracle(
    spark, tmp_path_factory, events, thr
):
    """Arbitrary stream split at an arbitrary lsn watermark; tranche 2
    arrives with additive tool metadata -> evolve + merge. Final state must
    equal the sequential oracle over the combined stream, including NULL
    evolved columns for pre-evolution winners — for every adversarial
    stream hypothesis finds (key collisions, equal ts, dup lsns, deletes)."""
    import uuid

    from etl_documentos_spark.lake.table import LakeTable
    from etl_documentos_spark.operators.evolve import evolve_if_needed
    from etl_documentos_spark.operators.merge import (
        merge_into,
        physical_schema,
        read_current,
    )
    from etl_documentos_spark.schemas import CHANGE_EVENTS_V2, TRANSCRIPTS

    root = str(tmp_path_factory.mktemp("ev") / uuid.uuid4().hex)
    table = LakeTable.create(root, physical_schema(TRANSCRIPTS), num_buckets=4)
    names = [f.name for f in CHANGE_EVENTS.fields]
    rows = [dict(zip(names, e)) for e in events]
    t1 = [r for r in rows if r["lsn"] < thr]
    t2 = [
        dict(
            r,
            tool_call_id=None if r["op"] == "delete" else f"tc{r['lsn']}",
            tool_latency_ms=None,
        )
        for r in rows
        if r["lsn"] >= thr
    ]
    if t1:
        merge_into(spark, table, spark.createDataFrame(t1, CHANGE_EVENTS))
    if t2:
        wide = spark.createDataFrame(t2, CHANGE_EVENTS_V2)
        evolve_if_needed(wide, table)
        table = LakeTable.load(root)
        merge_into(spark, table, wide)

    got = {
        (r["conv_id"], r["turn_idx"]): (r["text"], r.asDict().get("tool_call_id"))
        for r in read_current(spark, LakeTable.load(root)).collect()
    }
    want = {
        (w["conv_id"], w["turn_idx"]): (w["text"], w.get("tool_call_id"))
        for w in oracle.reduce_events(t1 + t2)
    }
    assert got == want
