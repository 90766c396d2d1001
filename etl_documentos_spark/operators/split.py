"""Deterministic leakage-safe corpus splits (train/val/test).

A 100 TB training-data pipeline must carve held-out sets such that (a) the
assignment is a pure function of the data — reproducible across reruns,
cluster sizes, and partitionings, with no RNG state to checkpoint — and
(b) correlated rows never straddle a split boundary (all turns of one
conversation, all members of one near-dup cluster).  Both fall out of
hashing a GROUP key, not the row: ``split = f(md5(salt || group_key))``.

Mechanics: the first four hex digits of ``md5(salt || key)`` give a uniform
bucket in [0, 65536); cumulative fraction thresholds are rendered as 4-char
hex strings and compared lexicographically, so the whole assignment is one
codegen'd projection — no shuffle, no join, no Python, and the identical
expression is writable in any SQL dialect with an ``md5`` function (the
DuckDB oracle string-compares the same digests).  Changing ``salt`` redraws
the entire split; keeping it pins the split forever, which is what makes
eval sets stable across pipeline re-runs.

Scale: zero-exchange — each task assigns its own rows.  Skew is a
non-issue because nothing groups; downstream per-split writers see the
hash-uniform bucket distribution.

Reference semantics analogue: the reference pins deterministic
document-type routing by normalized name (``/root/reference/app/services/
classification_service.py``); this extends determinism-by-content-key to
set membership.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1 << 16  # 4 hex digits


def split_thresholds(
    fracs: tuple[float, ...], names: tuple[str, ...]
) -> list[tuple[str, str]]:
    """(name, exclusive upper hex bound) per split, cumulative order.

    The last split absorbs rounding remainder (its bound is 'ffff' + 1,
    i.e. no upper test) so fractions that don't divide 65536 exactly still
    partition every bucket.
    """
    if len(fracs) != len(names):
        raise ValueError("fracs and names must align")
    if any(f <= 0 for f in fracs) or abs(sum(fracs) - 1.0) > 1e-9:
        raise ValueError("fractions must be positive and sum to 1")
    out: list[tuple[str, str]] = []
    acc = 0.0
    for name, frac in zip(names[:-1], fracs[:-1]):
        acc += frac
        out.append((name, format(round(acc * _BUCKETS), "04x")))
    out.append((names[-1], "g"))  # > 'ffff': matches everything left
    return out


def split_column(
    group_col: Column | str,
    fracs: tuple[float, ...] = (0.8, 0.1, 0.1),
    names: tuple[str, ...] = ("train", "val", "test"),
    salt: str = "",
) -> Column:
    """The split label as a pure column expression over the group key."""
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    bucket = F.substring(F.md5(F.concat(F.lit(salt), g.cast("string"))), 1, 4)
    expr = None
    for name, bound in split_thresholds(fracs, names):
        cond = bucket < F.lit(bound)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    return expr


def split_sql(
    group_expr: str,
    fracs: tuple[float, ...] = (0.8, 0.1, 0.1),
    names: tuple[str, ...] = ("train", "val", "test"),
    salt: str = "",
) -> str:
    """The identical assignment as an ANSI/DuckDB SQL CASE expression —
    kept in lockstep with ``split_column`` so oracles can re-derive the
    split independently."""
    bucket = f"substr(md5('{salt}' || CAST({group_expr} AS VARCHAR)), 1, 4)"
    arms = [
        f"WHEN {bucket} < '{bound}' THEN '{name}'"
        for name, bound in split_thresholds(fracs, names)
    ]
    return "CASE " + " ".join(arms) + " END"


def assign_split(
    df: DataFrame,
    group_col: str,
    fracs: tuple[float, ...] = (0.8, 0.1, 0.1),
    names: tuple[str, ...] = ("train", "val", "test"),
    salt: str = "",
) -> DataFrame:
    """Tag every row with its group's split label (column ``split``).

    NULL group keys yield a NULL split (md5 of NULL is NULL, every CASE
    arm false) — surfaced rather than guessed; coalesce the key upstream
    if NULL groups should participate.
    """
    return df.withColumn(
        "split", split_column(group_col, fracs, names, salt)
    )
