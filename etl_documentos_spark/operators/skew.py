"""Hot-key (skew) handling for the change stream.

A transcript change stream is conversation-skewed: one viral/agentic
conversation can carry 30%+ of events (FIXTURES.md §2). Three defenses,
layered:

1. **Fine-grained reduce keys.** The LWW dedup keys on (conv_id, turn_idx),
   not conv_id — a hot conversation spreads over its turns, and the agg form
   collapses duplicates map-side before the shuffle (operators/lww.py).
2. **Salted writes.** The lake-table write re-shuffles on (bucket, salt) so a
   hot bucket produces many files written by many tasks (lake/table.py
   ``_write_data``).
3. **Explicit two-phase salted reduction** (this module) for aggregations
   whose key IS the hot dimension (e.g. per-conversation rollups): reduce
   within (key, salt) first — map-side-combine-like — then across salts.
   AQE's skew-join handles joins; groupBy skew needs this manual split.

Plus a cheap detector to decide when to bother.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_hot_keys(
    df: DataFrame, key: str = "conv_id", threshold_frac: float = 0.05
) -> DataFrame:
    """Keys holding more than ``threshold_frac`` of rows (approximate, cheap:
    one partial-agg pass; at 10^10 scale swap count for a CountMinSketch via
    ``F.count_min_sketch`` if even the groupBy is too hot)."""
    total = df.count()
    return (
        df.groupBy(key)
        .count()
        .filter(F.col("count") >= threshold_frac * total)
        .select(key, (F.col("count") / total).alias("frac"))
    )


def with_salt(
    df: DataFrame,
    n_salts: int = 16,
    salt_col: str = "_salt",
    src_col: str | None = None,
) -> DataFrame:
    """Deterministic salt (stable across retries/replays): hashes the log
    sequence number when present, else ``src_col`` / the first column."""
    src = src_col or ("lsn" if "lsn" in df.columns else df.columns[0])
    return df.withColumn(salt_col, F.pmod(F.xxhash64(src), F.lit(n_salts)))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation for algebraic aggregates.

    ``aggs``: {out_name: "fn(col)"} with fn in sum/count/min/max.
    Phase 1 reduces within (keys, salt); phase 2 combines partials across
    salts. Equivalent to a direct groupBy for these algebraic functions, but
    no single reducer ever sees a whole hot key.
    """
    phase1_exprs, phase2_exprs = [], []
    for name, spec in aggs.items():
        fn, col = spec.rstrip(")").split("(", 1)
        fn = fn.strip().lower()
        if fn == "count":
            phase1_exprs.append(F.count(col if col != "*" else "*").alias(name))
            phase2_exprs.append(F.sum(name).alias(name))
        elif fn in ("sum", "min", "max"):
            phase1_exprs.append(getattr(F, fn)(col).alias(name))
            phase2_exprs.append(getattr(F, fn)(name).alias(name))
        else:
            raise ValueError(f"unsupported algebraic aggregate: {fn}")
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "_salt").agg(*phase1_exprs)
    return partial.groupBy(*keys).agg(*phase2_exprs)
