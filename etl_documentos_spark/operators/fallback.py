"""Quality-gated provider fallback chain.

The reference tries extraction providers in priority order, early-exits as
soon as one clears the quality threshold, and otherwise keeps the
best-quality result seen
(``/root/reference/app/services/extraction_service.py:409-496``). The
set-oriented restatement is a single column expression — an N-level
``when(quality_i >= t, result_i)`` chain falling back to the argmax-quality
candidate — so the whole selection stays inside whole-stage codegen (no UDF,
no join): every provider's result is a column on the row and the chain picks
one.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (provider_name, result_column, quality_column)
Candidate = tuple[str, Column, Column]


def quality_gated_fallback(
    candidates: list[Candidate], threshold: float
) -> Column:
    """First candidate (in list order) with quality >= threshold; if none
    clears the bar, the best-quality candidate (ties -> earlier provider).

    Returns a struct column ``(result, provider, quality)``. NULL qualities
    never win the best-of fallback (treated as -inf) but a NULL quality also
    never passes the gate, matching the reference's 'provider failed' path.
    """
    if not candidates:
        raise ValueError("quality_gated_fallback needs >= 1 candidate")

    def payload(name: str, r: Column, q: Column) -> Column:
        return F.struct(
            r.alias("result"),
            F.lit(name).alias("provider"),
            q.cast("double").alias("quality"),
        )

    ranked = [
        F.struct(
            F.coalesce(q.cast("double"), F.lit(float("-inf"))).alias("_q"),
            F.lit(float(-i)).alias("_rank"),
            payload(name, r, q).alias("_p"),
        )
        for i, (name, r, q) in enumerate(candidates)
    ]
    best = (
        ranked[0] if len(ranked) == 1 else F.greatest(*ranked)
    ).getField("_p")

    expr: Column | None = None
    for name, r, q in candidates:
        cond = q >= F.lit(float(threshold))
        branch = payload(name, r, q)
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    return expr.otherwise(best)
