"""Snapshot bootstrap -> change-stream handoff.

The contract: ``bootstrap(snapshot, W)`` loads the upstream state as of log
position W, then every replayed epoch applies only ``lsn > W``. Three things
must hold: (1) bootstrap + full replay (INCLUDING the pre-watermark epochs)
equals a plain full replay; (2) a delete that predates the snapshot is not
resurrected by replaying its older insert; (3) bootstrap is crash-idempotent
(re-call is a no-op; the watermark survives a pipeline restart).
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from etl_documentos_spark import datagen
from etl_documentos_spark.lake.table import LakeTable
from etl_documentos_spark.operators.lww import lww_dedup
from etl_documentos_spark.operators.merge import physical_schema, read_current
from etl_documentos_spark.schemas import CHANGE_EVENTS, TRANSCRIPTS
from etl_documentos_spark.streaming.apply import CdcPipeline


def _state(spark, table):
    rows = (
        read_current(spark, table)
        .select("conv_id", "turn_idx", "role", "text", "ts")
        .orderBy("conv_id", "turn_idx")
        .collect()
    )
    return [tuple(r) for r in rows]


def _snapshot_asof(ch, wm):
    """LWW state of the stream at log position wm (transcripts shape)."""
    pre = lww_dedup(ch.filter(F.col("lsn") <= wm))
    return pre.filter(F.col("op") != "delete").select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )


def _replay_grouped(pipe, ch, epoch_size=2000, first_epoch=1):
    ids = sorted(
        r["e"]
        for r in ch.select(
            (F.floor(F.col("lsn") / epoch_size)).alias("e")
        )
        .distinct()
        .collect()
    )
    for k in ids:
        batch = ch.filter(F.floor(F.col("lsn") / epoch_size) == k)
        pipe.apply_epoch(batch, first_epoch + int(k))


def test_bootstrap_equals_full_replay(spark, tmp_path):
    ch = datagen.change_stream(
        spark, n_events=12_000, events_per_epoch=2000
    ).select(*[f.name for f in CHANGE_EVENTS.fields])
    wm = ch.agg(F.max("lsn")).first()[0] // 2

    # reference: plain full replay
    full_root = str(tmp_path / "full")
    LakeTable.create(full_root, physical_schema(TRANSCRIPTS), num_buckets=4)
    full = CdcPipeline(spark, full_root, str(tmp_path / "w_full"))
    _replay_grouped(full, ch)

    # bootstrap at wm, then replay EVERY epoch (pre-wm ones must no-op)
    boot_root = str(tmp_path / "boot")
    LakeTable.create(boot_root, physical_schema(TRANSCRIPTS), num_buckets=4)
    boot = CdcPipeline(spark, boot_root, str(tmp_path / "w_boot"))
    boot.bootstrap(_snapshot_asof(ch, wm), wm, epoch_id=0)
    assert boot.bootstrap_watermark == wm
    _replay_grouped(boot, ch)

    assert _state(spark, boot.table) == _state(spark, full.table)


def test_pre_snapshot_delete_not_resurrected(spark, tmp_path):
    t0 = dt.datetime(2026, 1, 1)
    rows = [
        # key (a,0): inserted then deleted BEFORE the snapshot position —
        # absent from the snapshot, no tombstone shipped with it
        ("insert", "a", 0, "user", "ghost", None, t0, 1, 0),
        ("delete", "a", 0, None, None, None, t0 + dt.timedelta(seconds=1), 2, 0),
        # key (b,0): lives across the handoff
        ("insert", "b", 0, "user", "keep", None, t0, 3, 0),
        # post-watermark traffic
        ("update", "b", 0, "user", "kept!", None, t0 + dt.timedelta(seconds=9), 5, 0),
    ]
    ch = spark.createDataFrame(rows, CHANGE_EVENTS)
    wm = 4

    root = str(tmp_path / "t")
    LakeTable.create(root, physical_schema(TRANSCRIPTS), num_buckets=2)
    pipe = CdcPipeline(spark, root, str(tmp_path / "w"))
    pipe.bootstrap(_snapshot_asof(ch, wm), wm, epoch_id=0)

    # an at-least-once source replays the WHOLE log from offset 0: the
    # (a,0) insert at lsn=1 arrives again. Without the fence it would
    # resurrect the deleted row (the snapshot carries no tombstone).
    pipe.apply_epoch(ch, epoch_id=1)

    got = _state(spark, pipe.table)
    assert [(r[0], r[1], r[3]) for r in got] == [("b", 0, "kept!")]


def test_bootstrap_idempotent_and_restartable(spark, tmp_path):
    ch = datagen.change_stream(
        spark, n_events=6_000, events_per_epoch=1000
    ).select(*[f.name for f in CHANGE_EVENTS.fields])
    wm = ch.agg(F.max("lsn")).first()[0] // 2
    snap = _snapshot_asof(ch, wm)

    root = str(tmp_path / "t")
    LakeTable.create(root, physical_schema(TRANSCRIPTS), num_buckets=4)
    pipe = CdcPipeline(spark, root, str(tmp_path / "w"))
    r1 = pipe.bootstrap(snap, wm, epoch_id=0)
    # crash-replay: second call is a commit-log no-op, watermark re-persists
    r2 = pipe.bootstrap(snap, wm, epoch_id=0)
    assert not r1.skipped and r2.skipped
    state_after = _state(spark, pipe.table)

    # restart: a fresh pipeline instance restores the watermark from table
    # metadata and keeps fencing pre-watermark replays
    pipe2 = CdcPipeline(spark, root, str(tmp_path / "w"))
    assert pipe2.bootstrap_watermark == wm
    pipe2.apply_epoch(ch.filter(F.col("lsn") <= wm), epoch_id=7)
    assert _state(spark, pipe2.table) == state_after
