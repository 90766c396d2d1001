"""Custom stateful streaming operator via ``applyInPandasWithState``.

`streaming/windows.py` covers the reference's per-key state that Spark's
built-in windowed aggregations can express. This module is the escape
hatch the input hint names for semantics they cannot: an arbitrary
per-key register updated per micro-batch with an event-time timeout —
here, the reference's conversation-session lifecycle
(open on first event, enrich while active, CLOSE and emit exactly once
when the conversation goes idle — the ``fim_sessao`` transition in
/root/reference/app/core/document_tracking.py:328-351) carrying per-
session columns the built-in ``session_window`` cannot: tombstone traffic
and the last role by VERSION order ``(ts, lsn)``, not arrival order.

Semantics are exactly ``session_window(gap)``'s: per key, events chain
into a session while consecutive event times are within ``gap``; the
state register holds ALL still-open sessions for the key (interval merge
with the gap slack — so a late event that bridges two open sessions
merges them, like the built-in), and a session is emitted EXACTLY ONCE
when the event-time watermark passes ``last event + gap`` (event-time
timeout + ``GroupState.getCurrentWatermarkMs``). State per key is O(open
sessions), Arrow-batched per group per micro-batch, no per-row Python.
The test pins equality against the batch ``session_window`` oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: emitted closed-session record
SESSION_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("session_start", T.TimestampType(), False),
        T.StructField("session_last", T.TimestampType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("n_deletes", T.LongType(), False),
        T.StructField("last_role", T.StringType(), True),
    ]
)

#: open sessions per key, as parallel arrays (timestamps in int64 micros;
#: the state store round-trips primitives and arrays)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("first_us", T.ArrayType(T.LongType()), False),
        T.StructField("last_us", T.ArrayType(T.LongType()), False),
        T.StructField("n", T.ArrayType(T.LongType()), False),
        T.StructField("deletes", T.ArrayType(T.LongType()), False),
        T.StructField("role_ts_us", T.ArrayType(T.LongType()), False),
        T.StructField("role_lsn", T.ArrayType(T.LongType()), False),
        T.StructField("role", T.ArrayType(T.StringType()), True),
    ]
)

def _emit_df(key: str, sessions: list[dict]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": [key] * len(sessions),
            "session_start": [
                pd.Timestamp(s["first"], unit="us") for s in sessions
            ],
            "session_last": [
                pd.Timestamp(s["last"], unit="us") for s in sessions
            ],
            "n_events": [s["n"] for s in sessions],
            "n_deletes": [s["deletes"] for s in sessions],
            "last_role": [s["role"] for s in sessions],
        }
    )


def track_conversations(
    src: DataFrame,
    gap_seconds: int = 120,
    watermark: str = "5 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Closed conversation sessions from a change-event stream.

    Append-mode output: one row per (conversation, idle-gap session),
    emitted when the watermark passes ``last event + gap_seconds``.
    Session bounds/counts equal the batch ``session_window(gap)``
    computation; ``n_deletes`` and ``last_role`` (LWW by ``(ts, lsn)``)
    are the custom registers that motivate the escape hatch.
    """
    gap_us = int(gap_seconds) * 1_000_000

    def merge(sessions: list[dict]) -> list[dict]:
        """Interval-merge with gap slack: ``session_window`` merges
        INCLUSIVELY at the boundary — events exactly ``gap`` apart are one
        session (verified against the built-in on second-quantized
        streams, which hit this edge constantly). The closure rule below
        is therefore STRICT (``last + gap < watermark``): only then can no
        future event — which always carries ``ts >= watermark`` — still
        merge into a session we already emitted."""
        sessions.sort(key=lambda s: s["first"])
        out: list[dict] = []
        for s in sessions:
            if out and s["first"] <= out[-1]["last"] + gap_us:
                p = out[-1]
                p["last"] = max(p["last"], s["last"])
                p["n"] += s["n"]
                p["deletes"] += s["deletes"]
                if (s["role_ts"], s["role_lsn"]) > (
                    p["role_ts"], p["role_lsn"]
                ):
                    p["role_ts"], p["role_lsn"], p["role"] = (
                        s["role_ts"], s["role_lsn"], s["role"]
                    )
            else:
                out.append(dict(s))
        return out

    def to_state(sessions: list[dict]) -> tuple:
        return (
            [s["first"] for s in sessions],
            [s["last"] for s in sessions],
            [s["n"] for s in sessions],
            [s["deletes"] for s in sessions],
            [s["role_ts"] for s in sessions],
            [s["role_lsn"] for s in sessions],
            [s["role"] for s in sessions],
        )

    def from_state(st: tuple) -> list[dict]:
        first, last, n, deletes, rts, rlsn, role = st
        return [
            {
                "first": first[i], "last": last[i], "n": n[i],
                "deletes": deletes[i], "role_ts": rts[i],
                "role_lsn": rlsn[i], "role": role[i],
            }
            for i in range(len(first))
        ]

    def arm_or_finish(state: GroupState, sessions: list[dict]):
        """Persist open sessions and arm the next event-time timeout (the
        earliest close not yet past the watermark)."""
        if not sessions:
            state.remove()
            return
        state.update(to_state(sessions))
        wm_ms = state.getCurrentWatermarkMs()
        next_ms = min((s["last"] + gap_us) // 1000 for s in sessions)
        # a timeout must sit strictly past the current watermark
        state.setTimeoutTimestamp(max(next_ms, wm_ms + 1))

    def fn(key, pdf_iter, state: GroupState):
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.hasTimedOut:
            sessions = from_state(state.get)
            # STRICT: an event at ts == last + gap == wm is not late and
            # must still merge (inclusive boundary above)
            closed = [s for s in sessions if s["last"] + gap_us < wm_us]
            still_open = [s for s in sessions if s["last"] + gap_us >= wm_us]
            arm_or_finish(state, still_open)
            if closed:  # yielding empty frames trips pandas' concat
                yield _emit_df(key[0], closed)  # FutureWarning downstream
            return

        # vectorized within-batch sessionization (sort + gap-diff +
        # cumsum + groupby — no per-event python), then interval-merge
        # the per-session summaries against the open-session registers
        df = pd.concat(
            [p[[ts_col, "lsn", "op", "role"]] for p in pdf_iter],
            ignore_index=True,
        )
        df["_t"] = df[ts_col].astype("datetime64[us]").astype("int64")
        # Spark only drops below-watermark rows for BUILT-IN aggregations;
        # applyInPandasWithState sees them. Drop them here to match the
        # built-in session_window's late-data semantics — a late event
        # must not re-open (and re-emit) a session already closed by an
        # earlier timeout.
        df = df[df["_t"] >= wm_us]
        if df.empty:
            if state.exists:  # nothing new; keep state + armed timeout
                arm_or_finish(state, from_state(state.get))
            return
        df["_del"] = (df["op"] == "delete").astype("int64")
        df = df.sort_values(["_t", "lsn"], ignore_index=True)
        sid = (df["_t"].diff() > gap_us).cumsum()  # inclusive boundary
        agg = df.groupby(sid).agg(
            first=("_t", "min"),
            last=("_t", "max"),
            n=("_t", "size"),
            deletes=("_del", "sum"),
        )
        # one row per session, positionally aligned with agg (both are in
        # ascending-sid order; df is (_t, lsn)-sorted so tail(1) is the
        # session's version-max row)
        tails = df.groupby(sid).tail(1)
        new = [
            {
                "first": int(a.first), "last": int(a.last),
                "n": int(a.n), "deletes": int(a.deletes),
                "role_ts": int(t_row["_t"]), "role_lsn": int(t_row["lsn"]),
                "role": None if pd.isna(t_row["role"]) else str(t_row["role"]),
            }
            for a, (_, t_row) in zip(agg.itertuples(), tails.iterrows())
        ]
        sessions = merge(
            (from_state(state.get) if state.exists else []) + new
        )
        arm_or_finish(state, sessions)

    return (
        src.withWatermark(ts_col, watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            SESSION_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Sliding-window rate limiter (second stateful operator)
# ---------------------------------------------------------------------------
VIOLATION_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("lsn", T.LongType(), False),
        T.StructField("n_in_window", T.LongType(), False),
    ]
)

RATE_STATE_SCHEMA = T.StructType(
    [T.StructField("recent_us", T.ArrayType(T.LongType()), False)]
)


def rate_limit_stream(
    src: DataFrame,
    limit: int,
    window_seconds: int,
    watermark: str = "5 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-conversation SLIDING-window rate limiting as a stateful stream.

    The reference's middleware keeps an in-memory per-client counter over
    fixed minute windows (/root/reference/app/api/middleware.py:69-97);
    this is the stronger sliding form over event time: an event VIOLATES
    when more than ``limit`` events of its key fall in
    ``(ts - window, ts]`` — the count every fixed-window limiter
    under-approximates at window boundaries. Counting is CAUSAL: each
    event counts the window events at-or-before itself in ``(ts, lsn)``
    order (a limiter cannot see the future; pure RANGE-frame semantics
    would retro-count same-ts peers that arrive in a later micro-batch,
    making the emitted count depend on batching). Emission happens in the
    DATA path (each violating event emits exactly one row with its exact
    causal count), so completeness needs no timer batches; the event-time
    timeout only EVICTS state older than ``watermark - window``, which
    can no longer affect any admissible future event — state per key is
    O(events in window), not O(history).

    Batch oracle: ``row_number() OVER (ORDER BY ts, lsn)`` minus the
    count of events with ``ts <= t - window`` (RANGE UNBOUNDED PRECEDING
    TO window PRECEDING) — the pytest and the driver row pin equality
    against it. Exactness requires per-key arrival in ``(ts, lsn)`` order
    across batches (the binlog contract); within a batch the operator
    sorts.
    """
    import numpy as np

    window_us = int(window_seconds) * 1_000_000

    def fn(key, pdf_iter, state: GroupState):
        wm_us = state.getCurrentWatermarkMs() * 1000
        keep_from = wm_us - window_us

        if state.hasTimedOut:
            (recent,) = state.get
            recent = [t for t in recent if t >= keep_from]
            if recent:
                state.update((recent,))
                state.setTimeoutTimestamp(
                    max((max(recent) + window_us) // 1000,
                        state.getCurrentWatermarkMs() + 1)
                )
            else:
                state.remove()
            return

        df = pd.concat(
            [p[[ts_col, "lsn"]] for p in pdf_iter], ignore_index=True
        )
        df["_t"] = df[ts_col].astype("datetime64[us]").astype("int64")
        # drop below-watermark rows (applyInPandasWithState does not):
        # a late event must neither be counted against already-evicted
        # state nor enter state the eviction timer has already passed
        df = df[df["_t"] >= wm_us]
        if df.empty:
            # timeouts are cleared on EVERY invocation unless re-set
            # (GroupState contract) — an all-late batch must re-arm the
            # eviction timer or the key's window tail leaks forever
            if state.exists:
                (recent,) = state.get
                recent = [t for t in recent if t >= keep_from]
                if recent:
                    state.update((recent,))
                    state.setTimeoutTimestamp(
                        max((max(recent) + window_us) // 1000,
                            state.getCurrentWatermarkMs() + 1)
                    )
                else:
                    state.remove()
            return
        df = df.sort_values(["_t", "lsn"], ignore_index=True)
        old = np.array(
            state.get[0] if state.exists else [], dtype="int64"
        )
        new = df["_t"].to_numpy()
        # causal count per NEW event: prior-batch events in the window
        # plus this batch's events at-or-before it in (ts, lsn) order
        old_lo = np.searchsorted(old, new - window_us, side="right")
        old_hi = np.searchsorted(old, new, side="right")
        new_lo = np.searchsorted(new, new - window_us, side="right")
        counts = (old_hi - old_lo) + (np.arange(len(new)) - new_lo + 1)
        mask = counts > int(limit)

        merged = np.sort(np.concatenate([old, new]))
        recent = [int(t) for t in merged if t >= keep_from]
        state.update((recent,))
        state.setTimeoutTimestamp(
            max((int(merged.max()) + window_us) // 1000,
                state.getCurrentWatermarkMs() + 1)
        )
        if mask.any():
            hit = df.loc[mask.nonzero()[0]]
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]] * int(mask.sum()),
                    "ts": hit[ts_col].values,
                    "lsn": hit["lsn"].values,
                    "n_in_window": counts[mask].astype("int64"),
                }
            )

    return (
        src.withWatermark(ts_col, watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            VIOLATION_SCHEMA,
            RATE_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
