"""SQL surface over lake tables: query the current state with Spark SQL,
inspect metadata as DataFrames (Iceberg metadata-tables analogue).

The reference's users query their documents through an ORM/SQL layer
(``/root/reference/app/database/repositories.py``); a user switching to this
engine gets the same ergonomics from ``sql()`` — name your tables, write
ANSI SQL, the engine resolves each name to the LWW-reduced current state.

Spark temp views freeze the PLAN at registration (a view made before an
append keeps reading the old snapshot's file list), so this module
deliberately re-registers views per call instead of handing out long-lived
views — snapshot isolation per query, never a stale half-updated mix.

Metadata tables mirror Iceberg's ``table.snapshots`` / ``table.files`` /
``table.refs``: driver-built DataFrames over the manifest — O(snapshots) /
O(files) metadata rows, never data rows, so they stay cheap at any data
scale (a 100 TB table's manifest is still only file-count entries; at
millions of files inspect per-bucket slices).
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import DataFrame, SparkSession

from etl_documentos_spark.lake.table import LakeTable
from etl_documentos_spark.operators.merge import read_current


def current_view(
    spark: SparkSession, table: LakeTable, name: str
) -> DataFrame:
    """(Re-)register ``name`` as a temp view of the table's CURRENT state
    (LWW winners, live rows, system columns hidden) and return it. Call
    again after commits for a fresh snapshot."""
    df = read_current(spark, table)
    df.createOrReplaceTempView(name)
    return df


def sql(
    spark: SparkSession, tables: dict[str, LakeTable], query: str
) -> DataFrame:
    """Run one SQL statement over named lake tables.

    Every name in ``tables`` is registered against the snapshot current AT
    THIS CALL, then the query runs — per-statement snapshot isolation, the
    same contract a catalog-backed engine gives a query. All of Catalyst
    applies (pushdown, pruning, join planning) because the views are plain
    DataFrame plans over parquet scans.
    """
    for name, t in tables.items():
        current_view(spark, t, name)
    return spark.sql(query)


def snapshots_df(spark: SparkSession, table: LakeTable) -> DataFrame:
    """The snapshot log as a DataFrame (Iceberg ``table.snapshots``)."""
    rows = [
        (
            s.snapshot_id,
            datetime.datetime.utcfromtimestamp(s.ts_ms / 1000.0),
            s.operation,
            sum(len(fs) for fs in s.files.values()),
            {str(k): str(v) for k, v in (s.summary or {}).items()},
        )
        for s in table.snapshots
    ]
    return spark.createDataFrame(
        rows,
        "snapshot_id long, committed_at timestamp, operation string,"
        " n_files int, summary map<string,string>",
    )


def files_df(spark: SparkSession, table: LakeTable) -> DataFrame:
    """The current snapshot's file manifest as a DataFrame (Iceberg
    ``table.files``): bucket, path, size, and recorded stat ranges."""
    snap = table.current_snapshot
    rows = []
    for b, fs in snap.files.items():
        for p in fs:
            try:
                size = os.path.getsize(os.path.join(table.root, p))
            except OSError:
                size = None
            st = snap.file_stats.get(p, {})
            rows.append(
                (
                    int(b),
                    p,
                    size,
                    {
                        c: f"{r[0]}..{r[1]}"
                        for c, r in st.items()
                        if not c.startswith("bloom:")
                    },
                    sorted(
                        c[len("bloom:"):]
                        for c in st
                        if c.startswith("bloom:")
                    ),
                )
            )
    return spark.createDataFrame(
        rows,
        "bucket int, path string, size_bytes long,"
        " stat_ranges map<string,string>, bloom_cols array<string>",
    )


def refs_df(spark: SparkSession, table: LakeTable) -> DataFrame:
    """Named refs/tags as a DataFrame (Iceberg ``table.refs``)."""
    rows = [(name, sid) for name, sid in sorted(table.refs.items())]
    return spark.createDataFrame(rows, "name string, snapshot_id long")
