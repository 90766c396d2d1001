"""Offset-addressed synthetic change source: the epoch/offset contract is
not file-format-bound. The same epochs replayed from the parquet file
source and regenerated from offsets alone must produce identical final
table state AND identical per-epoch fingerprints (cross-source replay is
a commit-log no-op)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from etl_documentos_spark import datagen
from etl_documentos_spark.lake.table import LakeTable
from etl_documentos_spark.operators.merge import physical_schema, read_current
from etl_documentos_spark.schemas import CHANGE_EVENTS, TRANSCRIPTS
from etl_documentos_spark.streaming.apply import CdcPipeline
from etl_documentos_spark.streaming.stream import (
    SyntheticChangeSource,
    replay_epochs,
    replay_source,
)

N_EVENTS = 12_000
PER_EPOCH = 2_000


def _state_hash(spark, table) -> tuple[int, int]:
    cur = read_current(spark, table)
    row = cur.agg(
        F.count("*").alias("n"),
        F.sum(
            F.shiftrightunsigned(
                F.xxhash64("conv_id", "turn_idx", "role", "text", "ts"), 24
            )
        ).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


@pytest.fixture()
def file_events(spark, tmp_path):
    path = str(tmp_path / "events")
    df = datagen.change_stream(
        spark, n_events=N_EVENTS, events_per_epoch=PER_EPOCH
    )
    datagen.write_epochs(df, path, files_per_epoch=4)
    return path


def test_synthetic_source_matches_file_source(spark, tmp_path, file_events):
    roots = {}
    for kind in ("file", "synth"):
        root = str(tmp_path / f"t_{kind}")
        LakeTable.create(root, physical_schema(TRANSCRIPTS), num_buckets=4)
        pipe = CdcPipeline(spark, root, str(tmp_path / f"w_{kind}"))
        if kind == "file":
            results = replay_epochs(
                pipe, file_events, schema=CHANGE_EVENTS, concurrency=2
            )
        else:
            src = SyntheticChangeSource(
                spark, N_EVENTS, events_per_epoch=PER_EPOCH
            )
            results = replay_source(pipe, src, concurrency=2)
        assert sum(r.events for r in results) > 0
        roots[kind] = (root, pipe)

    fs = _state_hash(spark, roots["file"][1].table)
    ss = _state_hash(spark, roots["synth"][1].table)
    assert fs == ss, (fs, ss)


def test_cross_source_fingerprints_make_replay_a_noop(
    spark, tmp_path, file_events
):
    """Epochs applied from the FILE source replay as no-ops from the
    SYNTHETIC source: same offsets -> same batch -> same fingerprint, so
    the commit log recognizes them across sources."""
    root = str(tmp_path / "t")
    LakeTable.create(root, physical_schema(TRANSCRIPTS), num_buckets=4)
    pipe = CdcPipeline(spark, root, str(tmp_path / "w"))

    src = SyntheticChangeSource(spark, N_EVENTS, events_per_epoch=PER_EPOCH)
    all_epochs = src.epochs()
    half = all_epochs[: len(all_epochs) // 2]

    applied = replay_epochs(
        pipe, file_events, epochs=half, schema=CHANGE_EVENTS
    )
    assert all(not r.skipped for r in applied)
    before = _state_hash(spark, pipe.table)

    # same epochs from the synthetic source: every one a commit-log skip
    again = replay_source(pipe, src, epochs=half)
    assert all(r.skipped for r in again), [
        (r.epoch_id, r.skipped) for r in again
    ]
    assert _state_hash(spark, pipe.table) == before

    # the rest of the log streams in from the synthetic source
    rest = replay_source(pipe, src, epochs=all_epochs[len(half) :])
    assert all(not r.skipped for r in rest)
    n, _ = _state_hash(spark, pipe.table)
    assert n > before[0] // 2  # table advanced


def test_lsn_range_slice_equals_filtered_full_stream(spark):
    full = datagen.change_stream(
        spark, n_events=5_000, events_per_epoch=1_000
    )
    sliced = datagen.change_stream(
        spark, n_events=5_000, events_per_epoch=1_000,
        lsn_range=(2_000, 3_000),
    )
    want = full.filter((F.col("lsn") >= 2_000) & (F.col("lsn") < 3_000))
    key = lambda df: df.agg(  # noqa: E731
        F.count("*"),
        F.sum(F.shiftrightunsigned(F.xxhash64("op", "conv_id", "text"), 24)),
    ).first()
    assert key(sliced) == key(want)
