"""O(delta) commits: the sharded manifest keeps commit cost proportional
to the statement, not the table (VERDICT r4 "What's missing" #2).

A snapshot's per-bucket file lists live in immutable sidecar manifests;
``v{N}.json`` holds only refs. These tests commit against a manifest of
1.28x10^5 entries and measure the BYTES actually written per commit —
the direct evidence that a 10^6-10^8-file table does not rewrite hundreds
of MB of JSON per epoch.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import types as T

from etl_documentos_spark.lake.table import LakeTable

N_BUCKETS = 64
FILES_PER_BUCKET = 2000  # 128,000 manifest entries


def _schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("v", T.LongType()),
        ]
    )


def _meta_bytes(root: str) -> dict[str, int]:
    return {
        os.path.basename(p): os.path.getsize(p)
        for p in glob.glob(os.path.join(root, "metadata", "*"))
    }


def _seed(tmp_path) -> LakeTable:
    t = LakeTable.create(
        str(tmp_path / "t"), _schema(), num_buckets=N_BUCKETS,
        bucket_col="conv_id",
    )
    bulk = {
        str(b): [
            f"data/seed/b{b:05d}-{i:08x}.parquet"
            for i in range(FILES_PER_BUCKET)
        ]
        for b in range(N_BUCKETS)
    }
    t.commit_append(bulk)
    return t


def test_delta_commit_writes_o_delta_bytes(tmp_path):
    t = _seed(tmp_path)
    before = _meta_bytes(t.root)
    total_manifest_bytes = sum(
        sz for name, sz in before.items() if name.startswith("man-")
    )
    assert total_manifest_bytes > 4_000_000  # the 128k-entry baseline

    # ONE-bucket delta commit: 10 new files
    t.commit_append({"7": [f"data/d/e{i}.parquet" for i in range(10)]})
    after = _meta_bytes(t.root)
    new_names = set(after) - set(before)
    new_bytes = sum(after[n] for n in new_names)
    new_mans = [n for n in new_names if n.startswith("man-")]
    # exactly one bucket's manifest rewritten + one metadata version
    assert len(new_mans) == 1
    # O(delta): the commit wrote ~one bucket's manifest (~1/64 of the
    # total), never the whole manifest set
    assert new_bytes < total_manifest_bytes / 32
    # the snapshot entry reuses every untouched bucket's manifest ref
    with open(
        os.path.join(t.root, "metadata",
                     f"v{t._meta['metadata_version']:06d}.json")
    ) as f:
        disk = json.load(f)
    assert disk["format_version"] == 2
    snaps = {s["snapshot_id"]: s for s in disk["snapshots"]}
    cur = snaps[disk["current_snapshot_id"]]
    parent = snaps[cur["parent_id"]]
    shared = sum(
        1
        for b, rel in cur["manifests"].items()
        if parent["manifests"].get(b) == rel
    )
    assert shared == N_BUCKETS - 1


def test_reload_round_trips_sharded_manifest(tmp_path):
    t = _seed(tmp_path)
    t.commit_append({"3": ["data/d/x.parquet"]})
    fresh = LakeTable.load(t.root)
    assert fresh.current_snapshot.files == t.current_snapshot.files
    assert (
        sum(len(fs) for fs in fresh.current_snapshot.files.values())
        == N_BUCKETS * FILES_PER_BUCKET + 1
    )
    # snapshots sharing a bucket manifest share the parsed list object
    snaps = sorted(fresh.snapshots, key=lambda s: s.snapshot_id)
    assert snaps[-1].files["5"] is snaps[-2].files["5"]


def test_expire_collects_orphan_manifests(tmp_path):
    t = _seed(tmp_path)
    for i in range(4):
        t.commit_append({"1": [f"data/d/e{i}.parquet"]})
    n_before = len(glob.glob(os.path.join(t.root, "metadata", "man-*")))
    # grace 0: no concurrent readers in this test, collect instantly
    t.expire_snapshots(keep_last=1, manifest_grace_seconds=0)
    live = {
        rel
        for s in LakeTable.load(t.root)._meta["snapshots"]
        for rel in s["manifests"].values()
    }
    on_disk = {
        f"metadata/{os.path.basename(p)}"
        for p in glob.glob(os.path.join(t.root, "metadata", "man-*"))
    }
    assert on_disk == live  # every surviving sidecar is referenced
    assert len(on_disk) < n_before
    # and the state is intact
    assert (
        sum(len(fs) for fs in LakeTable.load(t.root).current_snapshot.files.values())
        == N_BUCKETS * FILES_PER_BUCKET + 4
    )
