"""Per-file bloom filters (manifest puffin-blob analogue) for point lookups.

The scale claim under test: min/max file skipping is blind on UNSORTED MOR
delta files (each file's [min, max] spans the whole key space), but a
per-file bloom on the bucket key proves per-key absence, so a point lookup
between compactions opens only the files that actually hold the key —
while returning exactly the same rows.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from etl_documentos_spark.lake.table import (
    LakeTable,
    bloom_build,
    bloom_might_contain,
)
from etl_documentos_spark.operators.merge import (
    merge_mor,
    physical_schema,
    read_current,
)
from etl_documentos_spark.schemas import TRANSCRIPTS


def test_bloom_unit_membership():
    vals = [f"conv_{i}" for i in range(500)]
    blob = bloom_build(vals)
    assert all(bloom_might_contain(blob, v) for v in vals)
    misses = sum(
        bloom_might_contain(blob, f"other_{i}") for i in range(2000)
    )
    assert misses < 2000 * 0.05, f"false-positive rate too high: {misses}/2000"
    # ints canonicalize like their string repr on both sides
    iblob = bloom_build([1, 2, 3])
    assert bloom_might_contain(iblob, 2) and not bloom_might_contain(iblob, 9)
    # floats have no portable exact representation -> never built/probed
    assert bloom_build([1.5, 2.5]) is None
    assert bloom_might_contain(blob, 1.5)  # not canonizable -> keep file


@pytest.fixture(scope="module")
def bloom_table(spark, tmp_path_factory):
    """10 MOR delta batches into ONE bucket, key names interleaved so every
    file's [min, max] covers ~the whole key space (min/max skipping is
    useless) while each key lives in exactly one batch."""
    root = str(tmp_path_factory.mktemp("bloom") / "t")
    table = LakeTable.create(
        root,
        physical_schema(TRANSCRIPTS),
        num_buckets=1,
        properties={"stats.bloom.cols": "conv_id"},
    )
    t0 = datetime.datetime(2024, 1, 1)
    for batch in range(10):
        rows = [
            (
                "insert",
                f"c{j}_{batch}",  # j-prefix => every batch spans c0..c9
                t,
                "user",
                f"text {batch}/{j}/{t}",
                None,
                t0 + datetime.timedelta(seconds=batch),
                batch * 100 + j * 10 + t,
                0,
            )
            for j in range(10)
            for t in range(3)
        ]
        df = spark.createDataFrame(
            rows,
            "op string, conv_id string, turn_idx int, role string,"
            " text string, tool string, ts timestamp, lsn long,"
            " source_partition int",
        )
        merge_mor(spark, table, df, target_tasks=1)
    table._refresh()
    return table


def test_manifest_carries_blooms(bloom_table):
    snap = bloom_table.current_snapshot
    with_bloom = [
        p for p, st in snap.file_stats.items() if "bloom:conv_id" in st
    ]
    assert len(with_bloom) >= 10, "every delta file should carry a bloom"


def test_point_prune_skips_unsorted_deltas(spark, bloom_table):
    key = "c4_6"  # lives only in batch 6's file(s)
    full = bloom_table.scan(spark)
    pruned = bloom_table.scan(spark, prune={"conv_id": (key, key)})
    n_full = len(full.inputFiles())
    n_pruned = len(pruned.inputFiles())
    # min/max alone keeps ~everything (interleaved names); bloom must cut it
    assert n_pruned <= max(2, n_full // 5), (n_pruned, n_full)
    # and the pruned scan loses no matching rows
    want = sorted(
        tuple(r)
        for r in full.filter(F.col("conv_id") == key).collect()
    )
    got = sorted(
        tuple(r)
        for r in pruned.filter(F.col("conv_id") == key).collect()
    )
    assert got == want and want


def test_absent_key_prunes_everything(spark, bloom_table):
    pruned = bloom_table.scan(
        spark, prune={"conv_id": ("never_written", "never_written")}
    )
    assert pruned.count() == 0
    assert len(pruned.inputFiles()) == 0


def test_range_prune_ignores_bloom(spark, bloom_table):
    """A range prune (lo != hi) must not consult the bloom — only point
    equality can; ranges fall back to min/max and keep unsorted files."""
    full = read_current(spark, bloom_table)
    pruned = bloom_table.scan(spark, prune={"conv_id": ("c0", "c9~")})
    assert pruned.count() == bloom_table.scan(spark).count()
    assert full.count() == 300  # 10 batches x 10 convs x 3 turns
