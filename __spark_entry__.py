"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship CDC LWW replay at sf0.001; ``queries`` /
``oracle_sql`` expose the operator inventory from SURVEY.md §2 (CDC core,
analytics, joins, windows, text analysis, dedup family, similarity search)
with DuckDB-checkable oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full CDC LWW replay —
    derive a transcript change stream and produce the final table state."""
    from etl_documentos_spark.plans.queries import q_cdc_lww_replay

    return q_cdc_lww_replay(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from etl_documentos_spark.plans.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from etl_documentos_spark.plans.queries import ORACLES

    return dict(ORACLES)
