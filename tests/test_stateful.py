"""Custom stateful operator (applyInPandasWithState): emitted closed
sessions equal the batch ``session_window`` oracle, plus the custom
registers (delete count, last role by version) recomputed in batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_documentos_spark import datagen
from etl_documentos_spark.streaming.stateful import track_conversations


def _batch_truth(stream, gap_seconds):
    """session_window oracle + the custom per-session registers."""
    return (
        stream.groupBy(
            F.session_window(F.col("ts"), f"{gap_seconds} seconds").alias(
                "w"
            ),
            F.col("conv_id"),
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_last"),
            F.count("*").alias("n_events"),
            F.sum((F.col("op") == "delete").cast("long")).alias("n_deletes"),
            F.max_by("role", F.struct("ts", "lsn")).alias("last_role"),
        )
        .select(
            "conv_id", "session_start", "session_last",
            "n_events", "n_deletes", "last_role",
        )
    )


def _key(r):
    return (r["conv_id"], r["session_start"])


def _val(r):
    return (
        r["session_last"], r["n_events"], r["n_deletes"], r["last_role"]
    )


def test_stateful_sessions_match_session_window(spark, tmp_path):
    gap = 120
    stream = datagen.change_stream(spark, n_events=2000, events_per_epoch=400)
    path = str(tmp_path / "ev")
    datagen.write_epochs(stream, path, files_per_epoch=1)

    src = (
        spark.readStream.schema(stream.drop("epoch").schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1)  # several micro-batches, so state
        .parquet(path)                    # genuinely carries across batches
    )
    q = (
        track_conversations(src, gap_seconds=gap, watermark="5 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("conv_sessions")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    emitted = {
        _key(r): _val(r)
        for r in spark.sql("SELECT * FROM conv_sessions").collect()
    }
    truth = {
        _key(r): _val(r) for r in _batch_truth(stream, gap).collect()
    }
    # the watermark only closes sessions idle >= gap behind it; every
    # emitted session must match the batch oracle exactly
    assert emitted, "watermark closed no sessions"
    for k, v in emitted.items():
        assert truth[k] == v, k
    # and nothing is emitted twice
    rows = spark.sql("SELECT * FROM conv_sessions").collect()
    assert len(rows) == len(emitted)


def test_stateful_state_survives_restart(spark, tmp_path):
    """Checkpoint recovery: stop mid-stream, restart with a fresh query on
    the same checkpoint — sessions still emit exactly once and match the
    oracle (the state store carries the open sessions across restarts)."""
    gap = 120
    stream = datagen.change_stream(spark, n_events=1500, events_per_epoch=300)
    path = str(tmp_path / "ev")
    datagen.write_epochs(stream, path, files_per_epoch=1)

    out = str(tmp_path / "out")

    def start():
        src = (
            spark.readStream.schema(stream.drop("epoch").schema)
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", 2)
            .parquet(path)
        )
        return (
            track_conversations(src, gap_seconds=gap, watermark="5 minutes")
            .writeStream.outputMode("append")
            .format("parquet")  # memory sink cannot recover a checkpoint
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )

    q = start()
    try:
        # let at least one micro-batch commit, then crash
        while not q.recentProgress:
            q.processAllAvailable()
    finally:
        q.stop()

    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    rows = spark.read.parquet(out).collect()
    emitted = {_key(r): _val(r) for r in rows}
    assert len(emitted) == len(rows)  # exactly-once across the restart
    assert emitted
    truth = {
        _key(r): _val(r) for r in _batch_truth(stream, gap).collect()
    }
    for k, v in emitted.items():
        assert truth[k] == v, k
