"""As-of (event-time) join — an operator Spark lacks natively.

For every left row, attach the most recent right row of the same key with
``right.ts <= left.ts`` (backward as-of, inclusive). The reference has no
as-of joins (SURVEY §2.3 — all its joins are FK equi-joins); this is part of
the beyond-reference training-data-pipeline surface (e.g. "state of the
world at the time of this event" feature joins).

Spark-first plan: no per-row Python, no range-explosion —

1. tag and union both sides (right rows sort BEFORE left rows at equal ts,
   making the join inclusive; a trailing tiebreak column keeps ties
   deterministic);
2. one window pass per key ordered by (ts, tag, tiebreak):
   ``last(right_payload, ignorenulls=True)`` over rows-unbounded-preceding
   carries the latest right payload forward onto each left row;
3. filter back to left rows.

Cost: ONE shuffle on the key + a per-key sort — the same budget as a
sort-merge join, independent of time-gap sizes (a naive range join is
O(left x right) per key). Skew note: the window partitions by the raw key;
for a hot key, pre-split lefts by time range or include a coarse time bucket
in the partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_cols: list[str] | None = None,
    tiebreak: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward inclusive as-of join of ``right`` onto ``left``.

    ``right_cols``: right columns to carry (default: all but key+ts).
    ``tiebreak``: column ordering equal-ts right rows (last one wins);
    recommended whenever right can repeat (key, ts).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, ts)]

    l_type = T.StructType(left.schema.fields)
    r_type = T.StructType(
        [T.StructField(f"{ts}{suffix}", right.schema[ts].dataType, True)]
        + [
            T.StructField(f"{c}{suffix}", right.schema[c].dataType, True)
            for c in right_cols
        ]
    )

    # order by the tiebreak column's NATIVE type: casting (e.g. a string id)
    # to long would silently null it out and collapse the deterministic
    # equal-ts ordering. Only right rows ever compare on _tb (left rows sort
    # after all right rows at equal ts via _is_left), so the left side just
    # carries a typed null.
    tb_type = right.schema[tiebreak].dataType if tiebreak else T.IntegerType()
    l_tag = left.select(
        F.col(on),
        F.col(ts),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(tb_type).alias("_tb"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(r_type).alias("_r"),
    )
    tb = F.col(tiebreak) if tiebreak else F.lit(0)
    r_tag = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_is_left"),
        tb.cast(tb_type).alias("_tb"),
        F.lit(None).cast(l_type).alias("_l"),
        F.struct(
            F.col(ts).alias(f"{ts}{suffix}"),
            *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        ).alias("_r"),
    )

    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts), F.col("_is_left"), F.col("_tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = (
        l_tag.unionByName(r_tag)
        .withColumn("_match", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_is_left") == 1)
    )
    out = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out.append(F.col(f"_match.{ts}{suffix}").alias(f"{ts}{suffix}"))
    out += [
        F.col(f"_match.{c}{suffix}").alias(f"{c}{suffix}") for c in right_cols
    ]
    return joined.select(*out)
