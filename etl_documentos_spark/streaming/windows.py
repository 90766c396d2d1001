"""Streaming window aggregations — the declarative restatement of the
reference's imperative per-key state.

Reference shapes covered (SURVEY §2.9):

- session open/close with ``fim_sessao IS NULL`` while active
  (``/root/reference/app/models/database.py:111-130``,
  ``app/database/repositories.py:230-234``) ->
  ``session_window(ts, gap)`` with a watermark: Spark's state store holds
  the open sessions, the watermark closes and emits them — no imperative
  open/close bookkeeping.
- incremental running mean / success-rate update per endpoint+day
  (``app/services/analytics_service.py:269-292``: read row, recompute mean
  from (old_mean, n), write back) -> a streaming groupBy aggregation; the
  state store IS the (mean, n) register, updated by partial aggregation
  instead of read-modify-write rows.

Both builders take any streaming (or batch — the expressions are identical)
DataFrame; callers pick output mode: ``append`` + watermark emits each
session/window once when it closes (bounded state), ``complete``/``update``
for live dashboards.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def session_counts(
    src: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Gap-based session windows per key: (key, session start/end, n_events).

    On a stream, pair with ``outputMode("append")``: a session row is
    emitted exactly once, when the watermark passes its close — the
    declarative form of the reference's open/close session lifecycle. State
    per open session is O(1) (count + bounds), evicted at emission.
    """
    if watermark is not None and src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.session_window(F.col(ts_col), gap).alias("session"),
            F.col(key_col),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
        )
    )


def running_daily_metrics(
    src: DataFrame,
    key_col: str,
    value_col: str,
    is_success: Column | None = None,
    ts_col: str = "ts",
    window: str = "1 day",
    watermark: str | None = None,
) -> DataFrame:
    """Per (key, day) running mean + count + success rate (A11).

    ``update``/``complete`` mode re-emits a key's row whenever new events
    move its mean — the streaming equivalent of the reference's
    read-recompute-write metric rows; ``append`` + watermark emits final
    values per closed day.
    """
    if watermark is not None and src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    aggs = [
        F.count("*").alias("n"),
        F.avg(F.col(value_col)).alias("mean_value"),
    ]
    if is_success is not None:
        aggs.append(
            (
                F.sum(F.when(is_success, 1).otherwise(0)) / F.count("*")
            ).alias("success_rate")
        )
    return (
        src.groupBy(
            F.window(F.col(ts_col), window).alias("day"), F.col(key_col)
        )
        .agg(*aggs)
        .select(
            key_col,
            F.col("day.start").alias("day_start"),
            *[c for c in ("n", "mean_value", "success_rate")
              if is_success is not None or c != "success_rate"],
        )
    )
