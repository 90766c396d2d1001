"""Property-based check: `merge_when` (ANSI MERGE) equals the sequential
oracle under arbitrary clause combinations.

Hypothesis generates a base stream, a source table (unique keys, as SQL
MERGE requires), and a drawn clause set — ordered WHEN MATCHED
update/delete clauses with row-level conditions over both sides, plus an
optional WHEN NOT MATCHED INSERT. The engine's one-statement merge must
equal replaying (base + the events the clauses would generate) through the
one-row-at-a-time LWW reduction, where matched events carry the matched
row's version + the engine's one-microsecond tick and inserts enter at the
source-provided version with lsn 0 — bumped one tick above the key's
delete-tombstone fence when that fence is equal-or-newer (hypothesis found
the exact-tie case where the fence silently swallowed the insert). This
pins: first-matching-clause-wins, snapshot-consistency against the base,
and the insert version contract.
"""

from __future__ import annotations

import datetime
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_documentos_spark.lake.table import LakeTable
from etl_documentos_spark.operators.dml import merge_when
from etl_documentos_spark.operators.merge import (
    merge_into,
    physical_schema,
    read_current,
)
from etl_documentos_spark.schemas import CHANGE_EVENTS, TRANSCRIPTS

BASE = datetime.datetime(2024, 1, 1)
COLS = [f.name for f in CHANGE_EVENTS.fields]
TICK = datetime.timedelta(microseconds=1)

#: matched-clause conditions: (SQL over aliases t/s, python over (row, src))
MATCH_CONDS = [
    (None, lambda r, s: True),
    ("t.turn_idx = 1", lambda r, s: r["turn_idx"] == 1),
    ("s.tag = 'a'", lambda r, s: s["tag"] == "a"),
]


@st.composite
def scenarios(draw):
    n = draw(st.integers(min_value=2, max_value=16))
    events = []
    for lsn in range(n):
        conv = f"c{draw(st.integers(0, 2))}"
        turn = draw(st.integers(0, 2))
        op = draw(st.sampled_from(["insert", "update", "delete"]))
        role = None if op == "delete" else draw(st.sampled_from(["user", "bot"]))
        ts = BASE + datetime.timedelta(seconds=draw(st.integers(0, 5)))
        text = None if op == "delete" else f"t{lsn}"
        events.append((op, conv, turn, role, text, None, ts, lsn, 0))
    # source rows: UNIQUE keys (the SQL MERGE cardinality contract)
    keys = draw(
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 3)),
            min_size=1, max_size=6, unique=True,
        )
    )
    src = [
        (
            f"c{c}", t, draw(st.sampled_from(["a", "b"])),
            f"s{j}",
            BASE + datetime.timedelta(seconds=draw(st.integers(0, 10))),
        )
        for j, (c, t) in enumerate(keys)
    ]
    # drawn clause set: 0-2 matched clauses in drawn order + optional insert
    clause_kinds = draw(
        st.sampled_from(
            [
                ["update"], ["delete"], ["update", "delete"],
                ["delete", "update"], [],
            ]
        )
    )
    clauses = [
        (kind, draw(st.integers(0, len(MATCH_CONDS) - 1)))
        for kind in clause_kinds
    ]
    with_insert = draw(st.booleans()) or not clauses
    return events, src, clauses, with_insert


def _live_state(rows: list[dict]) -> dict:
    state: dict = {}
    for r in sorted(rows, key=lambda r: (r["ts"], r["lsn"])):
        k = (r["conv_id"], r["turn_idx"])
        if r["op"] == "delete":
            state.pop(k, None)
        else:
            state[k] = r
    return state


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(scenarios())
def test_merge_when_matches_sequential_oracle(spark, scenario):
    events, src, clauses, with_insert = scenario

    root = tempfile.mkdtemp(prefix="prop_mw_")
    try:
        table = LakeTable.create(
            f"{root}/t", physical_schema(TRANSCRIPTS), num_buckets=2
        )
        merge_into(spark, table, spark.createDataFrame(events, CHANGE_EVENTS))

        source = spark.createDataFrame(
            src,
            "conv_id string, turn_idx int, tag string, new_text string,"
            " ts timestamp",
        )
        matched = [
            (
                kind,
                MATCH_CONDS[ci][0],
                {"text": F.expr("concat('M:', s.new_text)")}
                if kind == "update"
                else None,
            )
            for kind, ci in clauses
        ]
        not_matched = (
            (None, {"role": F.lit("sys"), "text": F.col("new_text")})
            if with_insert
            else None
        )
        merge_when(
            spark, table, source, matched=matched, not_matched=not_matched
        )

        got = {
            (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["ts"])
            for r in read_current(spark, table).collect()
        }

        # --- oracle: base + generated events, sequential LWW
        rows1 = [dict(zip(COLS, e)) for e in events]
        live = _live_state(rows1)
        winners: dict = {}  # per-key max-version event incl. deletes
        for r in sorted(rows1, key=lambda r: (r["ts"], r["lsn"])):
            winners[(r["conv_id"], r["turn_idx"])] = r
        gen = []
        for j, (conv, turn, tag, new_text, ts) in enumerate(src):
            s = {"tag": tag, "new_text": new_text}
            k = (conv, turn)
            if k in live:
                r = live[k]
                for kind, ci in clauses:
                    if not MATCH_CONDS[ci][1](r, s):
                        continue
                    g = dict(r)
                    g["ts"] = r["ts"] + TICK
                    if kind == "delete":
                        g.update(op="delete", role=None, text=None)
                    else:
                        g.update(op="update", text=f"M:{new_text}")
                    gen.append(g)
                    break  # first matching clause wins
            elif with_insert:
                # insert-version contract: source ts, bumped one tick
                # above the key's delete-tombstone fence when that fence
                # is equal-or-newer (ANSI MERGE: the insert must land)
                fence = winners.get(k)
                ts_i = ts
                if (
                    fence is not None
                    and fence["op"] == "delete"
                    and ts <= fence["ts"]
                ):
                    ts_i = fence["ts"] + TICK
                gen.append(
                    dict(
                        op="insert", conv_id=conv, turn_idx=turn,
                        role="sys", text=new_text, tool=None, ts=ts_i,
                        lsn=0, source_partition=0,
                    )
                )
        want = {
            (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["ts"])
            for r in _live_state(rows1 + gen).values()
        }
        assert got == want
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_not_matched_insert_lands_over_newer_tombstone(spark):
    """Deterministic pin of the hypothesis find: a key deleted at a LATER
    version than the source row's ts must still be inserted by WHEN NOT
    MATCHED (ANSI), entering one tick above the tombstone fence."""
    root = tempfile.mkdtemp(prefix="mw_fence_")
    try:
        table = LakeTable.create(
            f"{root}/t", physical_schema(TRANSCRIPTS), num_buckets=2
        )
        t5 = BASE + datetime.timedelta(seconds=5)
        events = [
            ("insert", "c0", 0, "user", "old", None, BASE, 0, 0),
            ("delete", "c0", 0, None, None, None, t5, 1, 0),
        ]
        merge_into(spark, table, spark.createDataFrame(events, CHANGE_EVENTS))
        assert read_current(spark, table).count() == 0

        source = spark.createDataFrame(
            [("c0", 0, "a", "reborn", BASE)],  # ts BEFORE the tombstone
            "conv_id string, turn_idx int, tag string, new_text string,"
            " ts timestamp",
        )
        counts = merge_when(
            spark, table, source,
            not_matched=(None, {"role": F.lit("sys"),
                                "text": F.col("new_text")}),
        )
        assert counts["inserted"] == 1
        rows = read_current(spark, table).collect()
        assert len(rows) == 1 and rows[0]["text"] == "reborn"
        assert rows[0]["ts"] == t5 + TICK  # one tick above the fence
    finally:
        shutil.rmtree(root, ignore_errors=True)
