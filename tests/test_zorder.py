"""Z-order clustering compaction (operators/zorder.py).

The scale claim under test: key-sorted compaction makes point lookups
open ~1 file but leaves every file's ts range spanning the whole bucket
(a time-slice query prunes nothing); z-ordered compaction shrinks every
file's range on BOTH dimensions, so the same manifest-stats pruning skips
files for time slices while point lookups still skip most files — and the
table's logical content is identical either way."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_documentos_spark import datagen
from etl_documentos_spark.lake.table import LakeTable
from etl_documentos_spark.operators.merge import (
    compact,
    merge_into,
    physical_schema,
    read_current,
)
from etl_documentos_spark.operators.zorder import interleave_bits
from etl_documentos_spark.schemas import TRANSCRIPTS


def test_interleave_bits_morton(spark):
    df = spark.createDataFrame([(3, 1), (0, 0), (2, 3)], "a int, b int")
    got = [
        r[0]
        for r in df.select(
            interleave_bits([F.col("a"), F.col("b")], bits=2)
        ).collect()
    ]
    # a=0b11,b=0b01 -> z=0b0111; a=0b10,b=0b11 -> z=0b1110
    assert got == [0b0111, 0, 0b1110]


def _build(spark, root, zorder):
    table = LakeTable.create(
        root,
        physical_schema(TRANSCRIPTS),
        num_buckets=2,
        properties={
            "write.max-records-per-file": "150",
            "stats.cols": "conv_id,ts",
        },
    )
    ch = datagen.change_stream(
        spark, n_events=12_000, n_convs=40, turns_per_conv=80
    )
    merge_into(spark, table, ch)
    compact(spark, table, zorder=zorder)
    table._refresh()
    return table


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    key_sorted = _build(spark, str(base / "key"), zorder=None)
    z_ordered = _build(spark, str(base / "z"), zorder=("conv_id", "ts"))
    return key_sorted, z_ordered


def _file_count(snap):
    return sum(len(fs) for fs in snap.files.values())


def _ts_bounds(table):
    los, his = zip(
        *(
            st["ts"]
            for st in table.current_snapshot.file_stats.values()
            if "ts" in st
        )
    )
    return min(los), max(his)


def test_zorder_preserves_content(spark, tables):
    key_sorted, z_ordered = tables
    a = read_current(spark, key_sorted).orderBy("conv_id", "turn_idx")
    b = read_current(spark, z_ordered).orderBy("conv_id", "turn_idx")
    assert a.collect() == b.collect()


def test_zorder_files_carry_no_cluster_column(spark, tables):
    _, z_ordered = tables
    df = z_ordered.scan(spark)
    assert "_zcluster" not in df.columns
    # and the physical files agree (read one raw)
    one = next(iter(z_ordered.current_snapshot.files.values()))[0]
    import os

    raw = spark.read.parquet(os.path.join(z_ordered.root, one))
    assert "_zcluster" not in raw.columns


def test_time_slice_prunes_only_under_zorder(spark, tables):
    key_sorted, z_ordered = tables
    lo, hi = _ts_bounds(z_ordered)
    width = (hi - lo) // 10  # a 10% time slice
    prune = {"ts": (lo + 4 * width, lo + 5 * width)}

    kept_key = len(key_sorted.scan(spark, prune=prune).inputFiles())
    kept_z = len(z_ordered.scan(spark, prune=prune).inputFiles())
    total_key = _file_count(key_sorted.current_snapshot)
    total_z = _file_count(z_ordered.current_snapshot)

    # key-sorted layout: every file spans ~the whole time range -> the
    # slice prunes (almost) nothing
    assert kept_key >= 0.9 * total_key, (kept_key, total_key)
    # z-ordered layout: most files' ts ranges are provably disjoint
    assert kept_z <= 0.5 * total_z, (kept_z, total_z)
    # and the pruned scan is still CORRECT (pruning is proof-based)
    lo_ts, hi_ts = prune["ts"]
    want = (
        z_ordered.scan(spark)
        .filter(
            (F.unix_micros("ts") >= lo_ts) & (F.unix_micros("ts") <= hi_ts)
        )
        .count()
    )
    got = (
        z_ordered.scan(spark, prune=prune)
        .filter(
            (F.unix_micros("ts") >= lo_ts) & (F.unix_micros("ts") <= hi_ts)
        )
        .count()
    )
    assert got == want and want > 0


def test_point_lookup_still_prunes_under_zorder(spark, tables):
    """Through the REAL read path (bucket pruning + file stats): z-order
    trades the ~1-file point lookup for partial pruning on both
    dimensions — the stats must still skip files inside the key's bucket,
    and bucket+stats together must skip most of the table."""
    from etl_documentos_spark.operators.merge import bucket_of

    _, z_ordered = tables
    total = _file_count(z_ordered.current_snapshot)
    b = bucket_of(spark, z_ordered, "conv_7")
    bucket_files = len(z_ordered.current_snapshot.files.get(str(b), []))
    kept = len(
        z_ordered.scan(
            spark, buckets=[b], prune={"conv_id": ("conv_7", "conv_7")}
        ).inputFiles()
    )
    assert bucket_files >= 8, "fixture should emit several files per bucket"
    assert kept < bucket_files, (kept, bucket_files)
    assert kept <= 0.5 * total, (kept, total)
