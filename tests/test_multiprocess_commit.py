"""Cross-process commit concurrency: separate OS processes (the real
executor topology) appending to one table must not lose each other's
commits. Exercises the flock + reload-merge-write path in
``LakeTable.commit_append`` without Spark (commits are metadata-only)."""

from __future__ import annotations

import multiprocessing as mp

from pyspark.sql import types as T

from etl_documentos_spark.lake.table import LakeTable

SCHEMA = T.StructType([T.StructField("x", T.LongType(), True)])


def _appender(root: str, worker: int, n_commits: int) -> None:
    table = LakeTable.load(root)
    for i in range(n_commits):
        table.commit_append({str(worker % 4): [f"data/w{worker}-{i}.parquet"]})


def test_concurrent_process_commits_all_survive(tmp_path):
    root = str(tmp_path / "t")
    LakeTable.create(root, SCHEMA, num_buckets=4)
    workers, commits = 6, 15
    ctx = mp.get_context("fork")
    procs = [
        ctx.Process(target=_appender, args=(root, w, commits))
        for w in range(workers)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    assert all(p.exitcode == 0 for p in procs)

    final = LakeTable.load(root)
    all_files = [f for fs in final.current_snapshot.files.values() for f in fs]
    assert len(all_files) == workers * commits, "a racing commit was lost"
    assert len(set(all_files)) == workers * commits
    # every commit produced exactly one snapshot after the create snapshot
    assert final.current_snapshot.snapshot_id == 1 + workers * commits


def test_overwrite_with_expected_keeps_racing_append(tmp_path):
    """Compaction shape: a file appended to a bucket AFTER the compactor's
    scan (simulated by committing between scan-capture and overwrite) must
    survive the overwrite commit as a delta file."""
    root = str(tmp_path / "t3")
    t = LakeTable.create(root, SCHEMA, num_buckets=2)
    t.commit_append({"0": ["data/base-1.parquet", "data/base-2.parquet"]})

    compactor = LakeTable.load(root)
    expected = dict(compactor.current_snapshot.files)  # the scan's view

    # another writer lands an append before the compactor commits
    other = LakeTable.load(root)
    other.commit_append({"0": ["data/late.parquet"]})

    compactor.commit_overwrite(
        {"0": ["data/compacted.parquet"]}, buckets=[0], expected=expected
    )
    final = LakeTable.load(root)
    assert sorted(final.current_snapshot.files["0"]) == [
        "data/compacted.parquet",
        "data/late.parquet",
    ], "racing append was dropped by the overwrite"


def test_overwrite_without_expected_replaces_wholesale(tmp_path):
    root = str(tmp_path / "t4")
    t = LakeTable.create(root, SCHEMA, num_buckets=2)
    t.commit_append({"0": ["data/base.parquet"]})
    t.commit_overwrite({"0": ["data/new.parquet"]}, buckets=[0])
    final = LakeTable.load(root)
    assert final.current_snapshot.files["0"] == ["data/new.parquet"]


def test_refresh_sees_other_handles_commit(tmp_path):
    root = str(tmp_path / "t2")
    t1 = LakeTable.create(root, SCHEMA, num_buckets=2)
    t2 = LakeTable.load(root)
    t1.commit_append({"0": ["data/a.parquet"]})
    # the second (stale) handle must merge on top of t1's commit, not clobber
    t2.commit_append({"1": ["data/b.parquet"]})
    final = LakeTable.load(root)
    files = final.current_snapshot.files
    assert files.get("0") == ["data/a.parquet"]
    assert files.get("1") == ["data/b.parquet"]
