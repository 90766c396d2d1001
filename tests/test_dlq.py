"""Dead-letter queue: row-level-invalid change events divert, never poison.

Contract: with quarantine on, an epoch containing malformed rows (unknown
op, null key/version fields) applies its valid rows exactly as a clean
epoch would, diverts the bad rows to ``workdir/dlq/epoch=N`` with a typed
reason, and crash-replay of the epoch rewrites (not duplicates) the DLQ.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from etl_documentos_spark import oracle
from etl_documentos_spark.lake.table import LakeTable
from etl_documentos_spark.operators.merge import physical_schema, read_current
from etl_documentos_spark.schemas import TRANSCRIPTS
from etl_documentos_spark.streaming.apply import CdcPipeline

T0 = datetime.datetime(2024, 1, 1)
SCHEMA = (
    "op string, conv_id string, turn_idx int, role string, text string,"
    " tool string, ts timestamp, lsn long, source_partition int"
)


def _rows():
    good = [
        ("insert", f"conv_{i % 4}", i % 3, "user", f"v{i}", None,
         T0 + datetime.timedelta(seconds=i), i, 0)
        for i in range(30)
    ]
    bad = [
        ("frobnicate", "conv_0", 0, "user", "bad op", None, T0, 100, 0),
        ("insert", None, 0, "user", "bad key", None, T0, 101, 0),
        ("insert", "conv_1", None, "user", "bad turn", None, T0, 102, 0),
        ("insert", "conv_1", 1, "user", "bad lsn", None, T0, None, 0),
        ("insert", "conv_2", 1, "user", "bad ts", None, None, 104, 0),
    ]
    return good, bad


@pytest.fixture()
def dlq_pipeline(spark, tmp_path):
    LakeTable.create(
        str(tmp_path / "t"), physical_schema(TRANSCRIPTS), num_buckets=2
    )
    return CdcPipeline(
        spark, str(tmp_path / "t"), str(tmp_path / "w"), quarantine=True
    )


def test_bad_rows_divert_and_good_rows_apply(spark, dlq_pipeline):
    pipe = dlq_pipeline
    good, bad = _rows()
    df = spark.createDataFrame(good + bad, SCHEMA)
    res = pipe.apply_epoch(df, 0)
    assert res.quarantined == len(bad)
    assert res.events == len(good)

    got = [
        r.asDict()
        for r in read_current(spark, pipe.table)
        .orderBy("conv_id", "turn_idx")
        .collect()
    ]
    cols = [c.split()[0] for c in SCHEMA.split(", ")]
    want = oracle.reduce_events([dict(zip(cols, e)) for e in good])
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert all(g[c] == w[c] for c in g)

    dlq = pipe.read_dlq().collect()
    assert len(dlq) == len(bad)
    reasons = sorted(r["_dlq_reason"] for r in dlq)
    assert reasons == sorted(
        ["unknown_op", "null_conv_id", "null_turn_idx", "null_lsn", "null_ts"]
    )
    # every source column preserved for replay tooling
    assert {r["text"] for r in dlq} == {e[4] for e in bad}


def test_crash_replay_rewrites_dlq(spark, dlq_pipeline):
    pipe = dlq_pipeline
    good, bad = _rows()
    df = spark.createDataFrame(good + bad, SCHEMA)
    pipe.apply_epoch(df, 0)
    # simulate crash after DLQ write, before commit: wipe the commit record
    # and re-apply the same epoch — at-least-once delivery
    import shutil

    shutil.rmtree(pipe.commitlog.root)
    pipe2 = CdcPipeline(
        pipe.spark, pipe.table_root, pipe.workdir, quarantine=True
    )
    pipe2.apply_epoch(df, 0)
    assert pipe2.read_dlq().count() == len(bad)  # rewritten, not doubled
    # and the table state is unchanged (LWW absorbed the replay)
    assert read_current(spark, pipe2.table).count() == len(
        {(e[1], e[2]) for e in good}
    )


def test_clean_epoch_writes_no_dlq(spark, dlq_pipeline):
    pipe = dlq_pipeline
    good, _ = _rows()
    res = pipe.apply_epoch(spark.createDataFrame(good, SCHEMA), 0)
    assert res.quarantined == 0
    with pytest.raises(FileNotFoundError):
        pipe.read_dlq()
