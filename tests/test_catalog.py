"""Filesystem catalog: names -> LakeTables, catalog-wide SQL."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from etl_documentos_spark.lake.catalog import Catalog
from etl_documentos_spark.operators.merge import (
    merge_into,
    physical_schema,
    read_current,
)
from etl_documentos_spark.schemas import TRANSCRIPTS

SCHEMA = (
    "op string, conv_id string, turn_idx int, role string, text string,"
    " tool string, ts timestamp, lsn long, source_partition int"
)


def _events(spark, lo, hi):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("insert", f"conv_{i % 4}", i % 3, "user", f"v{i}", None,
         t0 + datetime.timedelta(seconds=i), i, 0)
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def catalog(spark, tmp_path):
    cat = Catalog(str(tmp_path / "warehouse"))
    phys = physical_schema(TRANSCRIPTS)
    merge_into(spark, cat.create_table("raw.transcripts", phys, num_buckets=2),
               _events(spark, 0, 24))
    merge_into(spark, cat.create_table("mirror.transcripts", phys, num_buckets=4),
               _events(spark, 0, 12))
    return cat


def test_create_list_load_roundtrip(spark, catalog):
    assert catalog.list_tables() == ["mirror.transcripts", "raw.transcripts"]
    t = catalog.load_table("raw.transcripts")
    assert read_current(spark, t).count() == 12  # 4 convs x 3 turns
    assert catalog.table_exists("raw.transcripts")
    assert not catalog.table_exists("raw.nope")
    with pytest.raises(KeyError):
        catalog.load_table("raw.nope")
    with pytest.raises(FileExistsError):
        catalog.create_table(
            "raw.transcripts", physical_schema(TRANSCRIPTS)
        )
    with pytest.raises(ValueError):
        catalog.load_table("../escape")


def test_catalog_sql_joins_tables(spark, catalog):
    got = catalog.sql(
        spark,
        "SELECT r.conv_id, count(*) AS n"
        " FROM raw_transcripts r JOIN mirror_transcripts m"
        " ON r.conv_id = m.conv_id AND r.turn_idx = m.turn_idx"
        " GROUP BY r.conv_id ORDER BY r.conv_id",
    ).collect()
    raw = read_current(spark, catalog.load_table("raw.transcripts"))
    mir = read_current(spark, catalog.load_table("mirror.transcripts"))
    want = (
        raw.join(mir, ["conv_id", "turn_idx"])
        .groupBy(raw.conv_id)
        .agg(F.count("*").alias("n"))
        .orderBy("conv_id")
        .collect()
    )
    assert got == want


def test_drop_semantics(spark, catalog):
    catalog.drop_table("mirror.transcripts")  # non-purge: name released
    assert catalog.list_tables() == ["raw.transcripts"]
    catalog.drop_table("raw.transcripts", purge=True)
    assert catalog.list_tables() == []
    with pytest.raises(KeyError):
        catalog.drop_table("raw.transcripts")
