"""Deterministic weighted source-mixing (training-data interleave).

LLM pretraining mixes sources at target ratios (web 60%, code 20%, books
10%, ...). Doing it with RNG state breaks resumability and cluster-size
invariance; doing it with per-source round-robin needs exact global ranks
(a skew-prone window). The exponential-race formulation needs neither:
every row gets the key

    key = -ln(u) / w      u = uniform(0,1) from md5(salt || id), w = source weight

and the ascending-key order IS a weighted interleave (the minimum of
exponentials race; equivalently Efraimidis–Spirakis A-ES weighted sampling
without replacement, arXiv cs/0502087 shape). ``w`` is a PER-ROW rate:
a schedule prefix holds source s in proportion to ``N_s * w_s`` (rows ×
rate — each row is an independent racer), so to hit a target SHARE
independent of source size, divide by the source's row count —
``share_weights`` and ``temperature_weights`` below do exactly that.
Pure projection: no RNG state, no window over the corpus, reproducible at
any parallelism, and the
identical arithmetic is expressible in any SQL with ``md5``/``ln`` (the
DuckDB oracle re-derives the full order: Spark ``conv(hex)`` and DuckDB
``'0x…'::BIGINT`` agree bit-for-bit on the 52-bit mantissa-sized slice).

Scale: ``orderBy(key).limit(k)`` plans as TakeOrderedAndProject —
per-partition top-k then a driver-side merge of k-row heaps, never a
global sort of the corpus; the epoch schedule for ANY k comes off a 100 TB
corpus with one scan. The rank window afterwards is over k rows only. For
a FULL corpus ordering (k = everything), drop the limit and let the
range-partitioned sort do it — still one shuffle.

Reference semantics analogue: the reference's provider chain picks sources
by fixed priority (``/root/reference/app/services/document_service.py``);
this generalizes fixed priority to proportional representation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: 13 hex digits = 52 bits — exactly a double's mantissa, so the uniform
#: is exact in both engines and never rounds differently
_HEX_DIGITS = 13
_SCALE = float(1 << 52)


def uniform_from(id_col: Column | str, salt: str = "") -> Column:
    """Deterministic uniform(0,1) from a row id — md5-derived, engine-
    portable (+0.5 keeps it strictly inside (0,1): no ln(0))."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    hx = F.substring(
        F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, _HEX_DIGITS
    )
    return (F.conv(hx, 16, 10).cast("double") + F.lit(0.5)) / F.lit(_SCALE)


def exp_race_key(
    id_col: Column | str, weight: Column, salt: str = ""
) -> Column:
    """The interleave sort key: exponential with rate = weight."""
    return -F.log(uniform_from(id_col, salt)) / weight


def weight_column(
    source_col: Column | str, weights: dict[str, float]
) -> Column:
    """Literal source->weight map as a when-chain (unknown sources get
    weight 0 via an explicit error-raising NULL: silently dropping or
    silently equal-weighting a new source are both wrong answers)."""
    c = F.col(source_col) if isinstance(source_col, str) else source_col
    expr = None
    for s, w in weights.items():
        cond = c == F.lit(s)
        expr = (
            F.when(cond, F.lit(float(w)))
            if expr is None
            else expr.when(cond, F.lit(float(w)))
        )
    return expr  # implicit else NULL -> key NULL -> caller sees the gap


def weighted_interleave(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    id_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """First ``k`` rows of the deterministic weighted interleave.

    Output = input columns + ``rank`` (1-based schedule position). Rows
    whose source has no weight raise AT EXECUTION (inline ``raise_error``
    in the key projection — no extra validation scan): a training mix
    must be total. NULL sources pass through with a NULL key and sort
    first; filter them upstream if that is not intended.
    """
    w = weight_column(source_col, weights)
    # validation is INLINE in the key expression (raise_error), not a
    # separate probe job: a pre-scan would double the corpus cost, and
    # letting NULL keys through would be worse — ascending order puts
    # NULLS FIRST, silently seating unknown sources at the schedule head
    key = F.when(
        w.isNull() & F.col(source_col).isNotNull(),
        F.raise_error(
            F.concat(
                F.lit("source without a mix weight: "), F.col(source_col)
            )
        ),
    ).otherwise(exp_race_key(id_col, w, salt))
    tagged = df.withColumn("_mix_key", key)
    head = tagged.orderBy("_mix_key", id_col).limit(k)
    return head.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy("_mix_key", F.col(id_col)))
        .cast("int"),
    ).drop("_mix_key")


def temperature_weights(
    df: DataFrame, source_col: str, alpha: float = 0.5
) -> dict[str, float]:
    """Per-row rates giving a schedule share ∝ count^alpha — temperature
    mixing.

    Since a prefix holds source s in proportion to ``N_s * w_s``, the
    per-row rate is ``count^(alpha-1)``: alpha=1 gives w=1 everywhere
    (natural frequencies), alpha=0 gives w=1/N (uniform shares), and the
    0.3-0.7 range is the standard multilingual rebalancing knob (XLM,
    arXiv:1901.07291 §3.1 shape: low-resource sources upsampled relative
    to their natural share). One count aggregation; the collect is
    bounded by source cardinality, not corpus size. Only RATIOS matter
    to the race, so the rates are returned un-normalized.
    """
    counts = df.groupBy(source_col).count().collect()
    return {
        r[source_col]: float(r["count"]) ** (alpha - 1.0)
        for r in counts
        if r[source_col] is not None
    }


def share_weights(
    df: DataFrame, source_col: str, shares: dict[str, float]
) -> dict[str, float]:
    """Per-row rates hitting explicit target shares (web 60%, code 20%,
    ...) regardless of how many rows each source has: ``share / count``.

    Sources present in ``shares`` but absent from the data are dropped
    (nothing to schedule); sources in the data but not in ``shares`` are
    left out of the returned map, so the interleave's inline validation
    raises on them — an unmixed source is an error, not a silent skip.

    Targets hold for prefixes short relative to each source's row count:
    the race samples WITHOUT replacement, so once a small source starts
    depleting, deeper prefixes bend toward the remaining mass (epochs
    that want replacement should re-salt per epoch instead).
    """
    counts = {
        r[source_col]: r["count"]
        for r in df.groupBy(source_col).count().collect()
        if r[source_col] is not None
    }
    return {
        s: float(share) / counts[s]
        for s, share in shares.items()
        if s in counts
    }
