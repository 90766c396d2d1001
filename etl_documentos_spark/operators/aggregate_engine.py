"""Aggregation merge engine: per-column fold semantics on merge.

Third member of the merge-engine family (with row-level LWW in
`operators/lww.py` and field-level LWW in `operators/partial.py`; the
Paimon ``aggregation`` merge engine): each payload column declares HOW its
values combine across the key's change events — ``sum`` for counters,
``max``/``min`` for high-water marks, ``last_non_null`` for dimensions.
The reference maintains exactly this shape imperatively: per-client usage
counters incremented on every processed document
(``/root/reference/app/services/analytics_service.py:280-292``, quota
fields updated in place); here the counter IS the fold of the change
stream. Out-of-order delivery is safe by construction (the folds are
order-insensitive), and epoch replays are safe because the pipeline's
commit log deduplicates whole epochs before they reach the log — a
duplicated individual event that somehow entered the log twice WOULD sum
twice (folds have no per-(key, ts, lsn) dedup; add a dropDuplicates on
keys + order columns upstream if the source is not exactly-once).

Delete fence semantics match `partial_update_dedup`: a delete resets the
key — only events strictly newer than the last delete contribute — so
"reset the counter" is just a delete event.

Execution: the same two hash aggregations as the partial engine (fence,
then one agg with every fold as a native Spark aggregate — sum/max/min are
codegen'd with map-side partials; ``last_non_null`` is the conditional
struct-max). No window, no sort, scales like any grouped aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_documentos_spark.schemas import KEY_COLS

#: supported per-column fold names
FOLDS = ("sum", "max", "min", "last_non_null")


def _version(df: DataFrame, order_cols: tuple[str, ...]) -> Column:
    return F.struct(*[F.col(c) for c in order_cols])


def aggregate_dedup(
    df: DataFrame,
    folds: dict[str, str],
    key_cols: list[str] | None = None,
    order_cols: tuple[str, ...] = ("ts", "lsn"),
    op_col: str = "op",
) -> DataFrame:
    """One live row per key; each column combined by its declared fold.

    ``folds`` maps payload column -> one of ``sum | max | min |
    last_non_null``. Output: keys + folded payload + order cols (latest
    contributing event's version).
    """
    bad = {c: f for c, f in folds.items() if f not in FOLDS}
    if bad:
        raise ValueError(f"unknown folds {bad}; supported: {FOLDS}")
    missing = set(folds) - set(df.columns)
    if missing:
        raise ValueError(f"fold columns not in stream: {sorted(missing)}")
    keys = key_cols or KEY_COLS
    v = _version(df, order_cols)

    fence = df.groupBy(*keys).agg(
        F.max(F.when(F.col(op_col) == "delete", v)).alias("_dv")
    )
    alive = df.join(fence, keys).filter(
        (F.col(op_col) != "delete")
        & (F.col("_dv").isNull() | (v > F.col("_dv")))
    )

    aggs = []
    for c, how in folds.items():
        if how == "sum":
            aggs.append(F.sum(c).alias(c))
        elif how == "max":
            aggs.append(F.max(c).alias(c))
        elif how == "min":
            aggs.append(F.min(c).alias(c))
        else:  # last_non_null
            aggs.append(
                F.max(
                    F.when(
                        F.col(c).isNotNull(),
                        F.struct(v.alias("v"), F.col(c).alias("c")),
                    )
                )["c"].alias(c)
            )
    out = alive.groupBy(*keys).agg(*aggs, F.max(v).alias("_v"))
    return out.select(
        *keys,
        *folds.keys(),
        *[F.col(f"_v.{c}").alias(c) for c in order_cols],
    )
