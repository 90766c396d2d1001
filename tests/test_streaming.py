"""Structured Streaming coverage: checkpointed tail + watermarked windows."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_documentos_spark import datagen, oracle
from etl_documentos_spark.lake.table import LakeTable
from etl_documentos_spark.operators.merge import physical_schema, read_current
from etl_documentos_spark.schemas import TRANSCRIPTS
from etl_documentos_spark.streaming.apply import CdcPipeline
from etl_documentos_spark.streaming.stream import run_stream_until_drained


def test_streaming_tail_matches_oracle(spark, tmp_path):
    """File-source tail through foreachBatch: drained state == oracle."""
    stream = datagen.change_stream(
        spark, n_events=3000, n_convs=60, turns_per_conv=10, events_per_epoch=1000
    ).persist()
    events_path = str(tmp_path / "events")
    datagen.write_epochs(stream, events_path, files_per_epoch=4)

    table_root = str(tmp_path / "transcripts")
    LakeTable.create(table_root, physical_schema(TRANSCRIPTS), num_buckets=8)
    pipeline = CdcPipeline(spark, table_root, str(tmp_path / "work"))
    run_stream_until_drained(
        pipeline, events_path, str(tmp_path / "ckpt"), max_files_per_trigger=5
    )

    got = [
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in read_current(spark, pipeline.table)
        .orderBy("conv_id", "turn_idx")
        .collect()
    ]
    want = [
        (w["conv_id"], w["turn_idx"], w["text"])
        for w in oracle.reduce_events([r.asDict() for r in stream.collect()])
    ]
    assert got == want
    stream.unpersist()

    # restart over the same checkpoint: nothing new -> no extra snapshots
    snap = pipeline.table.current_snapshot.snapshot_id
    run_stream_until_drained(
        pipeline, events_path, str(tmp_path / "ckpt"), max_files_per_trigger=5
    )
    assert pipeline.table.current_snapshot.snapshot_id == snap


def test_streaming_session_windows_match_batch(spark, tmp_path):
    """session_window over a stream (append mode + watermark): every emitted
    session equals the batch session_window computation — the declarative
    open/close session lifecycle (SURVEY §2.9 S-sessions, A11 sibling)."""
    from etl_documentos_spark.streaming.windows import session_counts

    stream = datagen.change_stream(spark, n_events=2000, events_per_epoch=500)
    path = str(tmp_path / "ev")
    datagen.write_epochs(stream, path, files_per_epoch=2)

    src = (
        spark.readStream.schema(stream.drop("epoch").schema)
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )
    q = (
        session_counts(src, "conv_id", gap="2 minutes", watermark="5 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    emitted = {
        (r["conv_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    truth = {
        (r["conv_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in session_counts(stream, "conv_id", gap="2 minutes").collect()
    }
    assert emitted  # watermark closed and emitted sessions
    for k, v in emitted.items():
        assert truth[k] == v


def test_streaming_running_mean_matches_batch(spark, tmp_path):
    """A11: groupBy(day, key) running mean/success-rate as a streaming agg
    (complete mode) — final state equals the batch aggregation."""
    from pyspark.sql import functions as SF

    from etl_documentos_spark.streaming.windows import running_daily_metrics

    stream = datagen.change_stream(spark, n_events=1500, events_per_epoch=500)
    path = str(tmp_path / "ev")
    datagen.write_epochs(stream, path, files_per_epoch=2)

    src = (
        spark.readStream.schema(stream.drop("epoch").schema)
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )

    def metrics(df):
        return running_daily_metrics(
            df, "source_partition", "lsn",
            is_success=SF.col("op") != "delete", window="1 hour",
        )

    q = (
        metrics(src)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("runmean")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["source_partition"], r["day_start"]): (
            r["n"], round(r["mean_value"], 6), round(r["success_rate"], 6)
        )
        for r in spark.sql("SELECT * FROM runmean").collect()
    }
    want = {
        (r["source_partition"], r["day_start"]): (
            r["n"], round(r["mean_value"], 6), round(r["success_rate"], 6)
        )
        for r in metrics(stream.drop("epoch")).collect()
    }
    assert got == want


def test_watermarked_window_agg(spark, tmp_path):
    """Event-time tumbling windows with a watermark over a streamed source —
    the streaming form of the rate-limit/metrics aggregation (reference:
    middleware.py:69-97). Late data beyond the watermark is dropped."""
    stream = datagen.change_stream(spark, n_events=2000, events_per_epoch=500)
    path = str(tmp_path / "ev")
    datagen.write_epochs(stream, path, files_per_epoch=2)

    src = (
        spark.readStream.schema(stream.drop("epoch").schema)
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )
    agg = (
        src.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), "op")
        .agg(F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_counts")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("SELECT * FROM win_counts")
    # closed windows were emitted and counts match the batch computation
    batch = (
        stream.groupBy(F.window("ts", "5 minutes"), "op")
        .agg(F.count("*").alias("n"))
    )
    emitted = {(r["window"], r["op"]): r["n"] for r in out.collect()}
    full = {(r["window"], r["op"]): r["n"] for r in batch.collect()}
    assert emitted  # something was emitted
    for k, v in emitted.items():
        assert full[k] == v  # every emitted window matches the batch truth


def test_streaming_schema_evolution_across_restart(spark, tmp_path):
    """Mid-stream additive evolution in the STREAMING path (the binlog-DDL
    restart shape): a v1 tail is drained with the narrow schema, wider
    epochs land, and the stream restarts over the SAME checkpoint with the
    v2 reader schema. ``apply_epoch`` must ADD the new columns
    metadata-only; the drained state equals the oracle including the
    evolved columns (NULL for pre-evolution winners).

    North-rule parity: "additive schema evolution ... propagated to the
    table schema without rewrite" exercised end-to-end through
    checkpointed Structured Streaming, not just batch replay."""
    import os
    import shutil

    from etl_documentos_spark.schemas import CHANGE_EVENTS, CHANGE_EVENTS_V2
    from etl_documentos_spark.streaming.stream import run_stream_until_drained

    stream = datagen.change_stream(
        spark, n_events=3000, n_convs=50, turns_per_conv=10,
        events_per_epoch=1000, evolve_from_lsn=2000,
    ).persist()
    staging = str(tmp_path / "staging")
    datagen.write_epochs(stream, staging, files_per_epoch=4)

    live = str(tmp_path / "events")
    os.makedirs(live)
    for e in (0, 1):  # phase 1: v1 tranche (evolved cols all-null below 2000)
        shutil.move(f"{staging}/epoch={e}", f"{live}/epoch={e}")

    table_root = str(tmp_path / "transcripts")
    LakeTable.create(table_root, physical_schema(TRANSCRIPTS), num_buckets=8)
    pipeline = CdcPipeline(spark, table_root, str(tmp_path / "work"))
    run_stream_until_drained(
        pipeline, live, str(tmp_path / "ckpt"),
        schema=CHANGE_EVENTS, max_files_per_trigger=4,
    )
    names_v1 = [f.name for f in pipeline.table.schema.fields]
    assert "tool_call_id" not in names_v1
    files_before = dict(pipeline.table.current_snapshot.files)

    # phase 2: the wider tranche lands; restart with the v2 reader schema
    shutil.move(f"{staging}/epoch=2", f"{live}/epoch=2")
    pipeline2 = CdcPipeline(spark, table_root, str(tmp_path / "work"))
    run_stream_until_drained(
        pipeline2, live, str(tmp_path / "ckpt"),
        schema=CHANGE_EVENTS_V2, max_files_per_trigger=4,
    )
    names_v2 = [f.name for f in pipeline2.table.schema.fields]
    assert "tool_call_id" in names_v2 and "tool_latency_ms" in names_v2
    # the ADD COLUMNS snapshot rewrote no pre-evolution data file
    add_snap = next(
        s for s in pipeline2.table.snapshots if s.operation == "add-columns"
    )
    for b, fs in files_before.items():
        assert set(fs) <= set(add_snap.files.get(b, [])) or fs == add_snap.files.get(b)

    got = [
        r.asDict()
        for r in read_current(spark, pipeline2.table)
        .orderBy("conv_id", "turn_idx")
        .collect()
    ]
    want = oracle.reduce_events([r.asDict() for r in stream.collect()])
    stream.unpersist()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["text"] == w["text"]
        assert g.get("tool_call_id") == w.get("tool_call_id")
    assert any(g["tool_call_id"] is not None for g in got)
