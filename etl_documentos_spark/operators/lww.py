"""Last-writer-wins deduplication of a change batch.

Semantics: per key ``(conv_id, turn_idx)``, the event with the greatest
``(ts, lsn)`` wins; exact duplicate events (same lsn re-delivered) collapse
for free. This encodes the reference's blind overwrite-by-PK update
(``/root/reference/app/database/repositories.py:51-68`` — every update
replaces the row's columns with the latest values) plus its priority-merge of
field dicts (``/root/reference/app/services/document_extractors.py:267-284``)
as one set-oriented reduction.

Two implementations, chosen for scale:

- ``lww_dedup`` (default): ``groupBy(key).agg(max_by(payload, version))``.
  Hash aggregation with **map-side partial aggregation** — duplicates and
  overwrites collapse before the shuffle, so a 10^10-event stream with a 30%
  hot conversation ships only surviving rows per map task. No sort needed.
- ``lww_dedup_window``: the window/row_number formulation from the north
  rule — kept for parity tests and for callers that need losing rows too
  (rank > 1). Requires a full shuffle + per-key sort; use the agg form in the
  hot path.

Both are deterministic under ties: the version struct extends (ts, lsn) with
the payload hash, so equal-(ts,lsn) events (which are exact duplicates by
construction) pick a stable winner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_documentos_spark.schemas import KEY_COLS


def _version_struct(df: DataFrame, order_cols: tuple[str, ...]):
    payload = [c for c in df.columns if c not in order_cols]
    return F.struct(
        *[F.col(c) for c in order_cols],
        F.xxhash64(*[F.col(c) for c in payload]).alias("_payload_hash"),
    )


def lww_dedup(
    df: DataFrame,
    key_cols: list[str] | None = None,
    order_cols: tuple[str, ...] = ("ts", "lsn"),
) -> DataFrame:
    """One winning row per key via max_by aggregation (partial-agg friendly)."""
    keys = key_cols or KEY_COLS
    others = [c for c in df.columns if c not in keys]
    version = _version_struct(df, order_cols)
    row = F.struct(*[F.col(c) for c in others])
    out = df.groupBy(*keys).agg(F.max_by(row, version).alias("_w"))
    return out.select(*keys, *[F.col(f"_w.{c}").alias(c) for c in others])


def lww_dedup_window(
    df: DataFrame,
    key_cols: list[str] | None = None,
    order_cols: tuple[str, ...] = ("ts", "lsn"),
) -> DataFrame:
    """Window/row_number formulation (north-rule reference shape)."""
    keys = key_cols or KEY_COLS
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in order_cols],
        _version_struct(df, order_cols).desc(),
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
