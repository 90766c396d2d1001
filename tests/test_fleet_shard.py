"""File-level fleet sharding (``bench.py --file-shard``).

The executor-fleet bench shards the backfill at parquet-FILE granularity:
worker ``rem`` of ``K`` takes every K-th file (round-robin over the flat
(epoch, file) list) and applies its slice of epoch ``e`` as its own
exactly-once unit with synthetic id ``e*K + rem`` — the WAL re-partitioned
into more, smaller epochs. These tests pin the two properties that make
that a valid scaling harness: the shards tile the file set exactly, and K
shard replays into one shared table reproduce the byte-identical final
state of the oracle reducer (LWW is order-insensitive, so re-grouping
events into different epochs must not change the outcome).
"""

from __future__ import annotations

import bench
from etl_documentos_spark import datagen, oracle
from etl_documentos_spark.lake.table import LakeTable
from etl_documentos_spark.operators.merge import physical_schema, read_current
from etl_documentos_spark.schemas import TRANSCRIPTS


def test_shard_files_tile_exactly(spark, tmp_path):
    df = datagen.change_stream(
        spark, n_events=3000, n_convs=50, turns_per_conv=10,
        events_per_epoch=600,
    )
    events = str(tmp_path / "events")
    datagen.write_epochs(df, events)
    k = 3
    shards = [bench._shard_files(events, k, r) for r in range(k)]
    tiled = sorted(p for s in shards for _, p in s)
    everything = sorted(p for _, p in bench._shard_files(events, 1, 0))
    assert tiled == everything
    assert len(everything) > k  # file-level granularity, not whole epochs
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1  # within one file of each other


def test_file_shard_replay_matches_oracle(spark, tmp_path):
    df = datagen.change_stream(
        spark, n_events=4000, n_convs=80, turns_per_conv=15,
        events_per_epoch=800,
    ).persist()
    events = str(tmp_path / "events")
    datagen.write_epochs(df, events)

    table_root = str(tmp_path / "transcripts")
    LakeTable.create(table_root, physical_schema(TRANSCRIPTS), num_buckets=8)
    k = 3
    total = 0
    # sequential stand-ins for the K executor processes: same table, same
    # commit-log dir, disjoint file shards with synthetic epoch ids
    for rem in range(k):
        res = bench._replay(
            spark, events, str(tmp_path), bulk=True, epoch_mod=k,
            epoch_rem=rem, create_table=False, file_shard=True,
        )
        total += res["events"]
    assert total == df.count()

    got = [
        r.asDict()
        for r in read_current(spark, LakeTable.load(table_root))
        .orderBy("conv_id", "turn_idx")
        .collect()
    ]
    want = oracle.reduce_events([r.asDict() for r in df.collect()])
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g["conv_id"], g["turn_idx"]) == (w["conv_id"], w["turn_idx"])
        assert g["text"] == w["text"], (g, w)

    # re-applying a shard is a no-op (synthetic epochs are committed)
    res = bench._replay(
        spark, events, str(tmp_path), bulk=True, epoch_mod=k,
        epoch_rem=0, create_table=False, file_shard=True,
    )
    assert res["events"] == 0
    again = [
        r.asDict()
        for r in read_current(spark, LakeTable.load(table_root))
        .orderBy("conv_id", "turn_idx")
        .collect()
    ]
    assert again == got
