"""SQL surface: per-statement snapshot isolation + metadata tables."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from etl_documentos_spark.lake.sql import (
    current_view,
    files_df,
    refs_df,
    snapshots_df,
    sql,
)
from etl_documentos_spark.lake.table import LakeTable
from etl_documentos_spark.operators.merge import (
    merge_into,
    physical_schema,
    read_current,
)
from etl_documentos_spark.schemas import TRANSCRIPTS


def _events(spark, lo, hi, turn_base=0):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("insert", f"conv_{i % 6}", i % 4 + turn_base,
         "user" if i % 2 else "bot",
         f"text {i}", None, t0 + datetime.timedelta(seconds=i), i, 0)
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(
        rows,
        "op string, conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp, lsn long, source_partition int",
    )


@pytest.fixture()
def sql_table(spark, tmp_path):
    table = LakeTable.create(
        str(tmp_path / "t"), physical_schema(TRANSCRIPTS), num_buckets=2
    )
    merge_into(spark, table, _events(spark, 0, 40))
    return table


def test_sql_matches_dataframe(spark, sql_table):
    got = sql(
        spark,
        {"transcripts": sql_table},
        "SELECT role, count(*) AS n, max(ts) AS last_ts"
        " FROM transcripts GROUP BY role ORDER BY role",
    ).collect()
    want = (
        read_current(spark, sql_table)
        .groupBy("role")
        .agg(F.count("*").alias("n"), F.max("ts").alias("last_ts"))
        .orderBy("role")
        .collect()
    )
    assert got == want


def test_views_see_fresh_snapshot_per_call(spark, sql_table):
    n1 = sql(spark, {"t": sql_table}, "SELECT count(*) AS n FROM t").first().n
    merge_into(spark, sql_table, _events(spark, 100, 120, turn_base=50))
    n2 = sql(spark, {"t": sql_table}, "SELECT count(*) AS n FROM t").first().n
    assert n2 > n1
    # a view handed out earlier keeps its snapshot (plan frozen at call)
    old = current_view(spark, sql_table, "t_old")
    merge_into(spark, sql_table, _events(spark, 200, 210))
    assert old.count() == old.count()  # stable across re-evaluation


def test_metadata_tables(spark, sql_table):
    sql_table.tag("release")
    snaps = snapshots_df(spark, sql_table)
    ids = {r.snapshot_id for r in snaps.collect()}
    assert {s.snapshot_id for s in sql_table.snapshots} == ids
    assert snaps.filter("operation = 'append'").count() >= 0  # schema ok

    fdf = files_df(spark, sql_table).collect()
    manifest = {
        p for fs in sql_table.current_snapshot.files.values() for p in fs
    }
    assert {r.path for r in fdf} == manifest
    assert all(r.size_bytes and r.size_bytes > 0 for r in fdf)
    assert {r.bucket for r in fdf} <= set(sql_table.live_buckets())

    refs = {r.name: r.snapshot_id for r in refs_df(spark, sql_table).collect()}
    assert refs["release"] == sql_table.current_snapshot.snapshot_id
