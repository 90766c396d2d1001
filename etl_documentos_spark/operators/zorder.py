"""Z-order (Morton-curve) clustering for multi-dimension file skipping.

The key-sorted compaction (``operators/merge.compact``) makes per-file
``conv_id`` ranges tight — a point lookup opens ~1 file — but leaves every
file's ``ts`` range spanning the whole bucket, so a time-slice query
("yesterday's turns across all conversations") prunes NOTHING. Sorting by
``ts`` instead would invert the problem. Z-ordering sorts the rewrite by
the bit-interleave of both dimensions' rank codes, so every emitted file
covers a small square of the (conv_id, ts) plane: each file's manifest
min/max range on EACH dimension is ~sqrt-of-file-fraction of the domain,
and both point lookups and time slices skip most files. This is the
Delta/Iceberg ``ZORDER BY`` / ``sort_order(zorder(...))`` layout strategy,
rebuilt on this lake's existing machinery: the z-value is a pure codegen
column used only as the rewrite's range-partition + sort key, the manifest
stats layer (``stats.cols`` table property) records per-file min/max for
the z dimensions, and ``scan(prune=...)`` skips files exactly as before —
z-order changes the LAYOUT, not the read path.

Rank codes are EQUAL-FREQUENCY (``ntile`` per bucket), not min/max
normalized: a skewed dimension (one hot day, lexicographically clumped
conversation ids) collapses a min/max grid into a few cells — quantile
codes keep the curve's cells equally populated regardless of distribution.
The ntile windows sort within the bucket being rewritten, which is work
compaction's clustered write was already doing; z-order swaps WHICH sort,
it does not add one.

Usage::

    table.set_property("stats.cols", "conv_id,ts")
    compact(spark, table, zorder=("conv_id", "ts"))
    table.scan(spark, prune={"ts": (lo_us, hi_us)})   # skips files

Reference parity: the reference's hot queries mix per-document fetches
with time-windowed dashboards over the same rows
(/root/reference/app/database/repositories.py:230-260,
/root/reference/app/services/analytics_service.py:217-254) — the two
access patterns z-order reconciles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["interleave_bits", "attach_zorder", "ZCLUSTER_COL"]

#: ephemeral clustering column — consumed (and dropped) by the sorted
#: writer; never lands in data files
ZCLUSTER_COL = "_zcluster"


def interleave_bits(dims: list[Column], bits: int = 12) -> Column:
    """Morton interleave of ``bits``-wide integer dimension codes.

    Bit ``b`` of dimension ``d`` lands at output bit ``b * D + d`` — the
    standard z-curve. Pure shift/and/or expression tree (``bits * D``
    terms), fully whole-stage-codegen; for the default 2 dims x 12 bits
    the z-value fits in 24 bits of a long. Callers must pass codes in
    ``[0, 2^bits)``.
    """
    ndims = len(dims)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for d, c in enumerate(dims):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * ndims + d))
    return z


def attach_zorder(
    df: DataFrame,
    cols: tuple[str, ...],
    partition_expr: Column | None = None,
    bits: int = 12,
) -> DataFrame:
    """Add ``ZCLUSTER_COL``: the z-value of ``cols`` rank codes.

    Codes are equal-frequency: ``ntile(2^bits)`` per dimension over a
    window partitioned by ``partition_expr`` (the bucket being rewritten —
    each bucket is clustered independently, so the window sort shuffles no
    more than the clustered write itself; pass ``F.lit(0)`` only for
    single-bucket toys). NULLs sort first and land in cell 0.
    """
    n = 1 << bits
    part = partition_expr if partition_expr is not None else F.lit(0)
    dims = [
        F.ntile(n).over(Window.partitionBy(part).orderBy(F.col(c))) - 1
        for c in cols
    ]
    return df.withColumn(ZCLUSTER_COL, interleave_bits(dims, bits=bits))
