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


def test_rate_limit_stream_matches_causal_window_oracle(spark, tmp_path):
    """Sliding-window rate limiter: streamed violations equal the batch
    CAUSAL-window oracle exactly — every event whose (ts - window, ts]
    at-or-before count (in (ts, lsn) order) exceeds the limit emits one
    row with the exact count, across micro-batch boundaries (state
    carries the window tail)."""
    from pyspark.sql import Window

    from etl_documentos_spark.streaming.stateful import rate_limit_stream

    limit, window_s = 3, 3600
    stream = datagen.change_stream(spark, n_events=2000, events_per_epoch=400)
    # a binlog tail is log-ordered; re-epoch by event time so the file
    # stream replays in ts order (no artificial late-drops)
    ordered = stream.orderBy("ts", "lsn").coalesce(1).drop("epoch")
    ordered = ordered.withColumn(
        "epoch", (F.monotonically_increasing_id() / 400).cast("long")
    )
    path = str(tmp_path / "ev")
    datagen.write_epochs(ordered, path, files_per_epoch=1)

    src = (
        spark.readStream.schema(ordered.drop("epoch").schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    q = (
        rate_limit_stream(src, limit=limit, window_seconds=window_s)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("rate_violations")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        (r["conv_id"], r["ts"], r["lsn"], r["n_in_window"])
        for r in spark.sql("SELECT * FROM rate_violations").collect()
    )
    # causal oracle: events at-or-before in (ts, lsn) order, minus those
    # at or beyond one window back
    w_rows = (
        Window.partitionBy("conv_id")
        .orderBy("ts", "lsn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_older = (
        Window.partitionBy("conv_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(Window.unboundedPreceding, -(window_s * 1_000_000))
    )
    oracle = sorted(
        (r["conv_id"], r["ts"], r["lsn"], r["n"])
        for r in stream.withColumn(
            "n", F.count("*").over(w_rows) - F.count("*").over(w_older)
        )
        .filter(F.col("n") > limit)
        .collect()
    )
    assert got == oracle
    assert len(got) > 0, "fixture should produce violations"

def _stage_files(spark, tmp_path, batches, schema):
    """Write each batch of rows as one parquet file, mtime-ordered so the
    file stream replays them as successive micro-batches."""
    import os
    import shutil
    import time

    src_dir = str(tmp_path / "late_ev")
    os.makedirs(src_dir)
    stamp = time.time() - 60
    for k, rows in enumerate(batches):
        tmp = str(tmp_path / f"stage_{k}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(tmp)
        pf = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(src_dir, f"e{k}.parquet")
        shutil.move(os.path.join(tmp, pf), dst)
        os.utime(dst, (stamp + k, stamp + k))
    return src_dir


def test_stateful_sessions_drop_late_events(spark, tmp_path):
    """applyInPandasWithState sees below-watermark rows (Spark only drops
    them for built-in aggregations); the operator must drop them itself,
    or a late event re-opens a session whose close was already scheduled
    and the session emits with the late event merged in — diverging from
    the built-in session_window. Pin: the late event changes nothing."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(conv, sec, lsn, op="insert", role="user"):
        return (conv, t0 + dt.timedelta(seconds=sec), lsn, op, role)

    schema = (
        "conv_id string, ts timestamp, lsn long, op string, role string"
    )
    batches = [
        # session for "a": two events; sentinel advances the watermark
        # far past the session close (gap=120s, watermark hold=5min)
        [ev("a", 0, 1), ev("a", 10, 2), ev("wm1", 2400, 3)],
        # LATE event for "a" (ts far below the watermark) + sentinel
        [ev("a", 30, 4, op="delete"), ev("wm2", 2460, 5)],
        # sentinel with no data on "a": fires "a"'s timeout -> emission
        [ev("wm3", 3000, 6)],
    ]
    src_dir = _stage_files(spark, tmp_path, batches, schema)

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        track_conversations(src, gap_seconds=120, watermark="5 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("late_sessions")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = [
        r
        for r in spark.sql("SELECT * FROM late_sessions").collect()
        if r["conv_id"] == "a"
    ]
    assert len(rows) == 1, rows  # emitted exactly once, never re-opened
    r = rows[0]
    # the late delete at +30s is NOT merged: bounds and counts are those
    # of the two on-time events only
    assert r["n_events"] == 2 and r["n_deletes"] == 0
    assert r["session_last"] == t0 + dt.timedelta(seconds=10)


def test_rate_limit_stream_drops_late_events(spark, tmp_path):
    """A below-watermark event must neither emit a violation nor enter
    (already-evicted) window state."""
    import datetime as dt

    from etl_documentos_spark.streaming.stateful import rate_limit_stream

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(conv, sec, lsn):
        return (conv, t0 + dt.timedelta(seconds=sec), lsn)

    schema = "conv_id string, ts timestamp, lsn long"
    batches = [
        # two on-time events for "a" -> one violation (limit=1), then a
        # sentinel pushing the watermark far ahead
        [ev("a", 0, 1), ev("a", 10, 2), ev("wm1", 2400, 3)],
        # LATE event for "a": without the drop it would count against
        # state and emit a second violation with n=3
        [ev("a", 20, 4), ev("wm2", 2460, 5)],
    ]
    src_dir = _stage_files(spark, tmp_path, batches, schema)

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        rate_limit_stream(
            src, limit=1, window_seconds=3600, watermark="5 minutes"
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("late_violations")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = [
        (r["ts"], r["lsn"], r["n_in_window"])
        for r in spark.sql(
            "SELECT * FROM late_violations WHERE conv_id = 'a'"
        ).collect()
    ]
    assert got == [(t0 + dt.timedelta(seconds=10), 2, 2)]
