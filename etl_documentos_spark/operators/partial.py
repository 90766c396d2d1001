"""Field-level LWW: the partial-update merge engine.

Row-level LWW (`operators/lww.py`) replaces the whole payload with the
latest event's — correct when every event carries the full row. CDC
sources often emit SPARSE updates instead (only changed fields non-null):
the reference PATCHes individual fields on existing documents
(``/root/reference/app/database/repositories.py:51-68``, update with a
partial kwargs dict). This operator restates that as a distributed fold —
the Paimon ``partial-update`` merge-engine semantic:

- per key, EACH payload column independently takes its value from the
  latest event (by ``(ts, lsn)``) in which that column is non-null;
- a delete RESETS the key: events at or below the delete's version
  contribute nothing, so a re-insert after a delete starts from a clean
  row (and a key with no later events stays deleted);
- the row's reported version (``ts``/``lsn``) is the latest contributing
  event's.

Execution shape: two hash aggregations on the key (delete fence, then the
per-column folds — each fold is a conditional struct-max with map-side
partial aggregation; no window, no sort). The join between them is
key-partitioned on the same key as both aggs, so AQE plans it without an
extra exchange of the big side. At 10^10 events this is the same scaling
story as row-level LWW with one more reduce.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_documentos_spark.schemas import KEY_COLS


def _version(df: DataFrame, order_cols: tuple[str, ...]) -> Column:
    return F.struct(*[F.col(c) for c in order_cols])


def partial_update_dedup(
    df: DataFrame,
    key_cols: list[str] | None = None,
    order_cols: tuple[str, ...] = ("ts", "lsn"),
    payload_cols: list[str] | None = None,
    op_col: str = "op",
) -> DataFrame:
    """One live row per key with field-level last-non-null folds.

    ``payload_cols`` defaults to every column that is neither a key, an
    order column, nor the op column. Output: keys + payload + order cols
    (the latest contributing event's version).
    """
    keys = key_cols or KEY_COLS
    payload = payload_cols or [
        c
        for c in df.columns
        if c not in keys and c not in order_cols and c != op_col
    ]
    v = _version(df, order_cols)

    # 1) delete fence per key: the max version among delete events
    fence = df.groupBy(*keys).agg(
        F.max(F.when(F.col(op_col) == "delete", v)).alias("_dv")
    )

    # 2) events surviving the fence (strictly newer than the last delete)
    alive = df.join(fence, keys).filter(
        (F.col(op_col) != "delete")
        & (F.col("_dv").isNull() | (v > F.col("_dv")))
    )

    # 3) per-column conditional struct-max: latest event where the column
    #    is non-null wins that column; plus the row version
    folds = [
        F.max(
            F.when(
                F.col(c).isNotNull(),
                F.struct(v.alias("v"), F.col(c).alias("c")),
            )
        )["c"].alias(c)
        for c in payload
    ]
    row_v = F.max(v).alias("_v")
    out = alive.groupBy(*keys).agg(*folds, row_v)
    return out.select(
        *keys,
        *payload,
        *[F.col(f"_v.{c}").alias(c) for c in order_cols],
    )
