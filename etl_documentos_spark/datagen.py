"""Deterministic seeded generator for the transcript change stream.

Pure Spark column expressions over ``spark.range`` — no RNG on the driver, so
the same (seed, size) always produces byte-identical data on any cluster size.
This matters twice: tests replay against a Python oracle, and the bench runs
the identical input at two parallelism levels.

The generated stream is structurally faithful to a 10^10-event binlog tail
(FIXTURES.md §2): overlapping updates to the same key with later ts/lsn, exact
duplicate events, late events, deletes followed by re-inserts, equal-ts pairs
differing only in lsn, a hot-key tranche (~30% of events on one conv_id), and
an optional additive schema-evolution tranche (tool metadata columns).

Reference analogue: the insert-then-update document lifecycle
(``/root/reference/app/services/document_processor.py:126-143, 205-218``) and
the append-only audit log (``/root/reference/app/models/database.py:90-108``).
The "reference-flavored" text seasoning embeds the bank-receipt patterns from
``/root/reference/tests/conftest.py:22-35`` so scalar extractors can be
spot-checked on the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_TS = "2024-01-01 00:00:00"

ROLES = ["user", "assistant", "tool", "system"]

#: reference-flavored seasoning (bank-receipt patterns, conftest.py:22-35)
SEASONING = (
    " Comprovante: valor R$ 1.500,00 em 15/01/2024 CPF 123.456.789-00"
    " agencia 1234-5 conta 67890-1 contato suporte@banco.com.br"
)


def _u(col, seed: int, mod: int):
    """Deterministic uniform integer in [0, mod) derived from a column."""
    return F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(mod))


def change_stream(
    spark: SparkSession,
    n_events: int,
    n_convs: int = 100,
    turns_per_conv: int = 20,
    seed: int = 42,
    hot_frac: float = 0.30,
    delete_pct: int = 8,
    dup_pct: int = 5,
    n_source_partitions: int = 8,
    events_per_epoch: int = 1000,
    evolve_from_lsn: int | None = None,
    ts_quantum: int = 4,
    late_range: int = 64,
    lsn_range: tuple[int, int] | None = None,
) -> DataFrame:
    """Generate the CDC change stream as a DataFrame.

    Columns: op, conv_id, turn_idx, role, text, tool, ts, lsn,
    source_partition, epoch (+ tool_call_id / tool_latency_ms when
    ``evolve_from_lsn`` is set, null before that lsn).

    - ``lsn`` = the range id (strictly monotonic log order).
    - ``ts`` is quantized to ``ts_quantum``-second buckets and jittered
      backwards by up to ``late_range`` seconds -> equal-ts pairs (lsn
      tie-break) and late arrivals (older ts at higher lsn) both occur.
    - ~``hot_frac`` of events land on a single hot conversation.
    - exact duplicates (same lsn, same payload) are unioned in at ``dup_pct``%.
    - ``lsn_range=(lo, hi)`` generates only that offset slice — every column
      derives per-row from the lsn, so the slice is byte-identical to
      filtering the full stream (the offset-addressed read contract a
      Kafka/binlog source offers; see ``stream.SyntheticChangeSource``).
    """
    lo, hi = (0, n_events) if lsn_range is None else lsn_range
    e = spark.range(lo, hi).withColumnRenamed("id", "lsn")

    is_hot = _u(F.col("lsn"), seed, 1_000_000) < int(hot_frac * 1_000_000)
    conv_id = F.when(is_hot, F.lit("conv_hot")).otherwise(
        F.concat(F.lit("conv_"), _u(F.col("lsn"), seed + 1, n_convs).cast("string"))
    )
    turn_idx = _u(F.col("lsn"), seed + 2, turns_per_conv).cast("int")

    opv = _u(F.col("lsn"), seed + 3, 100)
    op = (
        F.when(opv < delete_pct, F.lit("delete"))
        .when(opv < delete_pct + 30, F.lit("insert"))
        .otherwise(F.lit("update"))
    )

    # event time: forward with lsn, quantized, with bounded backward jitter
    ts_off = (
        (F.col("lsn") - _u(F.col("lsn"), seed + 4, late_range)) / F.lit(ts_quantum)
    ).cast("long") * F.lit(ts_quantum)
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(BASE_TS), "yyyy-MM-dd HH:mm:ss") + ts_off
    )

    role = F.element_at(
        F.array(*[F.lit(r) for r in ROLES]),
        (_u(F.col("lsn"), seed + 5, len(ROLES)) + 1).cast("int"),
    )
    tool = F.when(
        role == "tool",
        F.concat(F.lit("tool_"), _u(F.col("lsn"), seed + 6, 5).cast("string")),
    )

    season = F.when(_u(F.col("lsn"), seed + 7, 97) == 0, F.lit(SEASONING)).otherwise(
        F.lit("")
    )
    text = F.concat(
        F.lit("turn text v"),
        F.col("lsn").cast("string"),
        F.lit(" for "),
        conv_id,
        F.lit("#"),
        turn_idx.cast("string"),
        season,
    )

    df = e.select(
        op.alias("op"),
        conv_id.alias("conv_id"),
        turn_idx.alias("turn_idx"),
        F.when(op != "delete", role).alias("role"),
        F.when(op != "delete", text).alias("text"),
        F.when(op != "delete", tool).alias("tool"),
        ts.alias("ts"),
        F.col("lsn"),
        F.pmod(F.xxhash64(conv_id, F.lit(seed + 8)), F.lit(n_source_partitions))
        .cast("int")
        .alias("source_partition"),
    )

    if evolve_from_lsn is not None:
        evolved = (F.col("lsn") >= evolve_from_lsn) & (F.col("op") != "delete")
        df = df.withColumn(
            "tool_call_id",
            F.when(evolved, F.concat(F.lit("call_"), F.col("lsn").cast("string"))),
        ).withColumn(
            "tool_latency_ms",
            F.when(evolved, (_u(F.col("lsn"), seed + 9, 10_000) / 10.0)),
        )

    # exact duplicates: re-emit dup_pct% of events unchanged (same lsn/payload)
    dups = df.filter(_u(F.col("lsn"), seed + 10, 100) < dup_pct)
    df = df.unionByName(dups)

    return df.withColumn(
        "epoch", (F.col("lsn") / F.lit(events_per_epoch)).cast("long")
    )


def write_epochs(df: DataFrame, path: str, files_per_epoch: int = 32) -> int:
    """Write the change stream as one parquet subdir per epoch.

    Batch replay reads ``{path}/epoch={k}`` in order; the streaming driver
    points a file source at the same layout. ``files_per_epoch`` fixes the
    file fan-out per epoch (a binlog tail arrives as many shard files; it is
    also the read parallelism ceiling for the replay). Returns the number of
    epochs.
    """
    n_epochs = (
        df.agg(F.max("epoch")).first()[0] + 1 if df.schema["epoch"] else 0
    )
    salt = F.pmod(F.xxhash64("lsn"), F.lit(files_per_epoch))
    (
        df.repartition(int(n_epochs) * files_per_epoch, F.col("epoch"), salt)
        .write.mode("overwrite")
        .partitionBy("epoch")
        .parquet(path)
    )
    # Stamp file mtimes in epoch order: a parallel write leaves arbitrary
    # mtimes, and Spark's FileStreamSource admits files oldest-mtime-first —
    # so a throttled stream (maxFilesPerTrigger) would otherwise replay
    # epochs in RANDOM order, teleporting the event-time watermark ahead
    # and dropping whole earlier epochs as late. A real binlog tail arrives
    # in log order; the fixture should too. (The exactly-once CDC apply is
    # deliberately order-insensitive, but watermark-driven operators —
    # session windows, stateful timeouts — are entitled to in-order files.)
    import glob as _glob
    import os as _os
    import time as _time

    base = _time.time() - 2 * int(n_epochs) - 2
    for k in range(int(n_epochs)):
        for f in _glob.glob(_os.path.join(path, f"epoch={k}", "*.parquet")):
            _os.utime(f, (base + 2 * k, base + 2 * k))
    return int(n_epochs)
