"""Multi-format readers + JSONL log sink round-trips."""

from __future__ import annotations

import datetime

from pyspark.sql import types as T

from etl_documentos_spark.sources import readers

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _sample(spark):
    return spark.createDataFrame(
        [(i, f"n{i}", datetime.datetime(2024, 1, 1 + i % 3)) for i in range(30)],
        SCHEMA,
    )


def test_csv_json_parquet_roundtrip(spark, tmp_path):
    df = _sample(spark)
    df.write.mode("overwrite").parquet(str(tmp_path / "p"))
    df.write.mode("overwrite").json(str(tmp_path / "j"))
    df.write.mode("overwrite").option("header", "true").csv(str(tmp_path / "c"))
    for fn, path in [
        (readers.read_parquet, "p"),
        (readers.read_json, "j"),
        (readers.read_csv, "c"),
    ]:
        back = fn(spark, str(tmp_path / path), SCHEMA)
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_jsonl_log_date_partitioned(spark, tmp_path):
    df = _sample(spark)
    path = str(tmp_path / "log")
    readers.write_jsonl_log(df, path)
    import os

    days = [d for d in os.listdir(path) if d.startswith("log_date=")]
    assert sorted(days) == ["log_date=20240101", "log_date=20240102",
                            "log_date=20240103"]
    back = readers.read_jsonl_log(spark, path, SCHEMA)
    assert back.count() == 30
