"""Single-threaded Python reference reducer.

Computes the ground-truth final table state from a change-event list by
replaying events one row at a time in (ts, lsn) order — exactly the semantics
the reference implements per-row with SQLAlchemy: ``update()`` blindly
overwrites the row's columns with the latest values
(``/root/reference/app/database/repositories.py:51-68``), ``delete()`` removes
it (``repositories.py:70-83``), and the audit log keeps every version
(``/root/reference/app/core/document_tracking.py:307-317``).

Used only in tests at small scale (the engine's distributed result must equal
this reducer's output row-for-row under ORDER BY conv_id, turn_idx).
"""

from __future__ import annotations

from typing import Any


def reduce_events(rows: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """Replay events sequentially; return the final visible table state.

    ``rows``: dicts with at least op, conv_id, turn_idx, ts, lsn and payload
    columns. Later (ts, lsn) wins; delete removes the key (a later re-insert
    resurrects it). Exact duplicates are naturally idempotent.

    Returns rows sorted by (conv_id, turn_idx) with payload columns only
    (op/lsn/source_partition/epoch dropped), i.e. the transcripts shape.
    """
    ordered = sorted(rows, key=lambda r: (r["ts"], r["lsn"]))
    state: dict[tuple[Any, Any], dict[str, Any]] = {}
    drop = {"op", "lsn", "source_partition", "epoch"}
    for r in ordered:
        key = (r["conv_id"], r["turn_idx"])
        if r["op"] == "delete":
            state.pop(key, None)
        else:
            state[key] = {k: v for k, v in r.items() if k not in drop}
    return [state[k] for k in sorted(state, key=lambda k: (k[0], k[1]))]
