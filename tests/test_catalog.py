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


def test_catalog_ddl_lifecycle(spark, tmp_path):
    """CREATE TABLE / SHOW TABLES / DESCRIBE / INSERT through the same
    door / DROP TABLE — the full name-based lifecycle in SQL."""
    from etl_documentos_spark.lake.catalog import Catalog

    cat = Catalog(str(tmp_path / "cat"))
    r = cat.sql(
        spark,
        "CREATE TABLE raw.notes ("
        " conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp)"
        " PARTITIONED BY (bucket(4, conv_id))"
        " TBLPROPERTIES ('stats.cols'='conv_id,ts')",
    ).collect()[0]
    assert r["created"] is True
    assert cat.sql(spark, "SHOW TABLES").collect()[0]["table"] == "raw.notes"

    # idempotent create via IF NOT EXISTS; plain re-create raises
    assert (
        cat.sql(
            spark,
            "CREATE TABLE IF NOT EXISTS raw.notes (conv_id string,"
            " turn_idx int, ts timestamp)",
        ).collect()[0]["created"]
        is False
    )
    import pytest as _pytest

    with _pytest.raises(FileExistsError):
        cat.sql(
            spark,
            "CREATE TABLE raw.notes (conv_id string, turn_idx int,"
            " ts timestamp)",
        )

    desc = {
        r["col_name"]: r["data_type"]
        for r in cat.sql(spark, "DESCRIBE raw.notes").collect()
    }
    assert desc["conv_id"] == "string" and desc["turn_idx"] == "int"
    assert "_lsn" not in desc and "_deleted" not in desc  # engine-managed
    assert desc["bucket"] == "bucket(4, conv_id)"
    # the created table honors TBLPROPERTIES, readable back via SHOW
    assert cat.load_table("raw.notes").stat_cols() == ["conv_id", "ts"]
    props = {
        r["key"]: r["value"]
        for r in cat.sql(spark, "SHOW TBLPROPERTIES raw.notes").collect()
    }
    assert props["stats.cols"] == "conv_id,ts"
    one = cat.sql(
        spark, "SHOW TBLPROPERTIES raw.notes ('stats.cols')"
    ).collect()
    assert [(r["key"], r["value"]) for r in one] == [
        ("stats.cols", "conv_id,ts")
    ]

    # the new table is writable/readable through the same SQL door
    cat.sql(
        spark,
        "INSERT INTO raw_notes (conv_id, turn_idx, role, text, ts) VALUES"
        " ('c1', 0, 'user', 'oi', TIMESTAMP '2024-01-01 00:00:00')",
    )
    got = cat.sql(
        spark, "SELECT conv_id, text FROM raw_notes"
    ).collect()
    assert [(r["conv_id"], r["text"]) for r in got] == [("c1", "oi")]

    assert (
        cat.sql(spark, "DROP TABLE raw.notes PURGE").collect()[0]["dropped"]
        is True
    )
    assert cat.sql(spark, "SHOW TABLES").count() == 0
    assert (
        cat.sql(spark, "DROP TABLE IF EXISTS raw.notes").collect()[0][
            "dropped"
        ]
        is False
    )


def test_catalog_ctas_and_show_create(spark, tmp_path):
    """CREATE TABLE ... AS SELECT materializes the query (schema from the
    SELECT, rows through the versioned insert) and SHOW CREATE TABLE
    round-trips a DDL that re-creates the same logical shape."""
    from etl_documentos_spark.lake.catalog import Catalog

    cat = Catalog(str(tmp_path / "cat"))
    cat.sql(
        spark,
        "CREATE TABLE raw.notes (conv_id string, turn_idx int,"
        " role string, text string, tool string, ts timestamp)"
        " PARTITIONED BY (bucket(4, conv_id))",
    )
    cat.sql(
        spark,
        "INSERT INTO raw_notes (conv_id, turn_idx, role, text, ts) VALUES"
        " ('c1', 0, 'user', 'oi', TIMESTAMP '2024-01-01'),"
        " ('c1', 1, 'bot', 'ola', TIMESTAMP '2024-01-01'),"
        " ('c2', 0, 'user', 'eai', TIMESTAMP '2024-01-02')",
    )

    r = cat.sql(
        spark,
        "CREATE TABLE derived.bots PARTITIONED BY (bucket(2, conv_id))"
        " TBLPROPERTIES ('stats.cols'='conv_id')"
        " AS SELECT conv_id, turn_idx, role, text, ts FROM raw_notes"
        " WHERE role = 'bot'",
    ).collect()[0]
    assert r["created"] is True and r["rows"] == 1
    got = cat.sql(
        spark, "SELECT conv_id, turn_idx, text FROM derived_bots"
    ).collect()
    assert [(x["conv_id"], x["turn_idx"], x["text"]) for x in got] == [
        ("c1", 1, "ola")
    ]
    assert cat.load_table("derived.bots").stat_cols() == ["conv_id"]

    ddl = cat.sql(spark, "SHOW CREATE TABLE derived.bots").collect()[0][
        "create_statement"
    ]
    assert "bucket(2, conv_id)" in ddl and "'stats.cols'='conv_id'" in ddl
    assert "_lsn" not in ddl  # system columns are engine-managed
    # the emitted DDL is itself runnable (under a fresh name)
    cat.sql(spark, ddl.replace("derived.bots", "derived.bots2", 1))
    assert "derived.bots2" in cat.list_tables()

    # CTAS without the key columns is rejected with a clear error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="key columns"):
        cat.sql(
            spark,
            "CREATE TABLE derived.bad AS SELECT role FROM raw_notes",
        )
