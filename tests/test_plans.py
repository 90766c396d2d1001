"""Plan-shape assertions: pushdown, pruning, broadcast — the scale contract."""

from __future__ import annotations

from etl_documentos_spark.plans import inspect
from etl_documentos_spark.plans.queries import (
    q_events_by_nation,
    q_tpch_q1,
    q_tpch_q6,
)

SF = "/root/testdata/sf0.001"


def test_q6_filters_pushed_to_scan(spark):
    df = q_tpch_q6(spark, SF)
    assert inspect.has_pushed_filters(df), inspect.physical_plan(df)


def test_q1_column_pruning(spark):
    df = q_tpch_q1(spark, SF)
    cols = set(inspect.read_schema_columns(df))
    # only the referenced columns are read — never the full 11-column row
    assert cols <= {
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate",
    }
    assert "l_orderkey" not in cols and "l_partkey" not in cols


def test_dim_joins_broadcast(spark):
    df = q_events_by_nation(spark, SF)
    assert inspect.uses_broadcast_join(df), inspect.physical_plan(df)


def test_merge_scan_prunes_buckets(spark, tmp_path):
    """The MERGE reads only touched buckets' files (partition pruning at the
    manifest level, not the planner level — assert the file count)."""
    import datetime

    from etl_documentos_spark.lake.table import LakeTable
    from etl_documentos_spark.operators.merge import merge_mor, physical_schema
    from etl_documentos_spark.schemas import CHANGE_EVENTS, TRANSCRIPTS

    root = str(tmp_path / "t")
    table = LakeTable.create(root, physical_schema(TRANSCRIPTS), num_buckets=16)

    def ev(conv, lsn):
        return ("insert", conv, 0, "user", "x", None,
                datetime.datetime(2024, 1, 1), lsn, 0)

    merge_mor(
        spark, table,
        spark.createDataFrame([ev(f"c{i}", i) for i in range(64)], CHANGE_EVENTS),
    )
    table = LakeTable.load(root)
    all_files = sum(len(fs) for fs in table.current_snapshot.files.values())
    one_bucket = int(next(iter(table.current_snapshot.files.keys())))
    pruned = table.scan(spark, buckets=[one_bucket])
    n_pruned_files = len(table.current_snapshot.files[str(one_bucket)])
    assert n_pruned_files < all_files
    assert pruned.count() > 0
