"""Persisted incremental MinHash-LSH index (`lake/dedup_index.py`).

Covers: build/load round-trip, add-vs-rebuild equivalence (the incremental
contract), brute-force correctness on crafted near-dups, threshold
semantics, key-prefix partition pruning, and the empty-batch edge.
"""

from __future__ import annotations

import os

import pytest

from etl_documentos_spark.lake.dedup_index import MinHashLshIndex

BASE = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "a completely different sentence about spark dataframes and shuffles",
    "partition pruning keeps the scan narrow and the join broadcastable",
    "exactly once semantics require an idempotent commit log per epoch",
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _corpus_rows():
    rows = []
    for i, t in enumerate(BASE):
        rows.append((i * 10, t))
        # near-dup: one word appended — most shingles shared
        rows.append((i * 10 + 1, t + " indeed"))
    # unrelated filler
    rows.append((900, "unrelated filler text with nothing in common here"))
    return rows


def test_build_load_query_roundtrip(spark, tmp_path):
    root = str(tmp_path / "idx")
    corpus = _docs(spark, _corpus_rows())
    MinHashLshIndex.build(spark, root, corpus, num_hashes=8, bands=8)
    idx = MinHashLshIndex.load(spark, root)
    assert idx.meta["num_hashes"] == 8 and idx.meta["bands"] == 8

    new = _docs(spark, [(5000, BASE[0] + " truly")])
    got = idx.query(new, threshold=0.5).collect()
    matched = {r.corpus_id for r in got}
    # both variants of BASE[0] are near-dups of the probe
    assert {0, 1} <= matched
    assert all(r.new_id == 5000 for r in got)
    assert all(0.0 <= r.est_jaccard <= 1.0 for r in got)
    # the unrelated filler never collides at this threshold
    assert 900 not in matched


def test_add_equals_rebuild(spark, tmp_path):
    rows = _corpus_rows()
    half_a = [r for r in rows if r[0] % 20 == 0]
    half_b = [r for r in rows if r[0] % 20 != 0]

    full_root = str(tmp_path / "full")
    MinHashLshIndex.build(spark, full_root, _docs(spark, rows))

    incr_root = str(tmp_path / "incr")
    idx = MinHashLshIndex.build(spark, incr_root, _docs(spark, half_a))
    idx.add(_docs(spark, half_b))

    new = _docs(spark, [(5000, BASE[0]), (5001, BASE[2] + " okay")])
    want = sorted(
        map(tuple, MinHashLshIndex.load(spark, full_root)
            .query(new, threshold=0.25).collect())
    )
    got = sorted(map(tuple, idx.query(new, threshold=0.25).collect()))
    assert got == want and len(got) > 0


def test_exact_duplicate_scores_one(spark, tmp_path):
    root = str(tmp_path / "idx")
    MinHashLshIndex.build(spark, root, _docs(spark, _corpus_rows()))
    idx = MinHashLshIndex.load(spark, root)
    got = idx.query(_docs(spark, [(7, BASE[1])]), threshold=0.99).collect()
    triples = {(r.new_id, r.corpus_id, r.est_jaccard) for r in got}
    # the exact duplicate always scores 1.0; its one-word-appended
    # near-dup MAY tie at 1.0 with only 8 hashes (few shingles differ)
    assert (7, 10, 1.0) in triples
    assert {(n, c) for n, c, _ in triples} <= {(7, 10), (7, 11)}


def test_threshold_monotone(spark, tmp_path):
    root = str(tmp_path / "idx")
    MinHashLshIndex.build(spark, root, _docs(spark, _corpus_rows()))
    idx = MinHashLshIndex.load(spark, root)
    new = _docs(spark, [(5000, BASE[3] + " per partition")])
    lo = idx.query(new, threshold=0.125).collect()
    hi = idx.query(new, threshold=0.75).collect()
    assert len(hi) <= len(lo)
    assert {(r.new_id, r.corpus_id) for r in hi} <= {
        (r.new_id, r.corpus_id) for r in lo
    }


def test_partition_pruning(spark, tmp_path):
    """A one-doc batch must read strictly fewer kp partitions than exist."""
    root = str(tmp_path / "idx")
    # enough docs that band keys spread over many kp prefixes
    rows = [(i, f"document number {i} talks about topic {i % 7} "
                f"and subject {i % 11} in varying words {i}") for i in range(60)]
    MinHashLshIndex.build(spark, root, _docs(spark, rows))
    idx = MinHashLshIndex.load(spark, root)

    all_parts = {
        d for d in os.listdir(os.path.join(root, "bands"))
        if d.startswith("kp=")
    }
    assert len(all_parts) > 8

    new = _docs(spark, [(5000, rows[0][1])])
    kps = [
        r.kp for r in idx._banded(new).select("kp").distinct().collect()
    ]
    pruned = idx.scan(kps)
    # inputFiles() reflects the unfiltered relation; prove pruning from
    # the files EXECUTION actually touches, plus the plan's partition
    # filter line
    from pyspark.sql import functions as F

    read_parts = {
        r.f.split("kp=")[1].split("/")[0]
        for r in pruned.select(
            F.input_file_name().alias("f")
        ).distinct().collect()
    }
    assert 0 < len(read_parts) <= 8 < len(all_parts)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "kp" in plan
    # and the pruned read still finds the exact dup
    got = idx.query(new, threshold=0.99).collect()
    assert {(r.new_id, r.corpus_id) for r in got} == {(5000, 0)}


def test_empty_batch(spark, tmp_path):
    root = str(tmp_path / "idx")
    MinHashLshIndex.build(spark, root, _docs(spark, _corpus_rows()))
    idx = MinHashLshIndex.load(spark, root)
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert idx.query(empty).count() == 0


def test_query_plan_broadcasts_new_side(spark, tmp_path):
    root = str(tmp_path / "idx")
    MinHashLshIndex.build(spark, root, _docs(spark, _corpus_rows()))
    idx = MinHashLshIndex.load(spark, root)
    plan = idx.query(
        _docs(spark, [(5000, BASE[0])])
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_remove_and_compact(spark, tmp_path):
    """MOR-style deletes: tombstones take effect immediately, compact
    folds them in, rewrites one file per key prefix, and publishes a new
    generation atomically."""
    import os as _os

    root = str(tmp_path / "idx")
    MinHashLshIndex.build(spark, root, _docs(spark, _corpus_rows()))
    idx = MinHashLshIndex.load(spark, root)
    # add a second installment so bands/ holds multiple files per kp
    idx.add(_docs(spark, [(2000, BASE[0] + " again"), (2001, BASE[2])]))

    probe = _docs(spark, [(5000, BASE[0])])
    before = {r.corpus_id for r in idx.query(probe, threshold=0.5).collect()}
    assert {0, 1, 2000} <= before

    idx.remove([0, 2000])
    after = {r.corpus_id for r in idx.query(probe, threshold=0.5).collect()}
    assert after == before - {0, 2000}, "tombstones must hide ids at once"

    n_live = idx._anti_tombstoned(idx.scan()).count()
    idx.compact()
    assert idx.meta["generation"] == 1
    assert idx.meta["bands_dir"] == "bands_v1"
    assert not _os.path.isdir(_os.path.join(root, "bands"))
    assert not _os.path.isdir(_os.path.join(root, "tombstones"))
    assert idx.scan().count() == n_live
    # one data file per kp dir after compaction
    bands = _os.path.join(root, "bands_v1")
    for d in _os.listdir(bands):
        if d.startswith("kp="):
            files = [f for f in _os.listdir(_os.path.join(bands, d))
                     if f.endswith(".parquet")]
            assert len(files) == 1, (d, files)
    # a fresh load sees the new generation and the same answers
    idx2 = MinHashLshIndex.load(spark, root)
    again = {r.corpus_id for r in idx2.query(probe, threshold=0.5).collect()}
    assert again == after
    # removed ids never resurrect after compaction either
    assert 0 not in again and 2000 not in again
