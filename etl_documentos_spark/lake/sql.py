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
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


#: DML statements are dispatched onto `operators.dml` instead of Spark SQL
#: (temp views are not writable targets)
_DML_HEAD = re.compile(r"^\s*(delete|update)\b", re.IGNORECASE)

#: Iceberg-style time travel: ``FROM t VERSION AS OF 3`` (snapshot id) or
#: ``FROM t VERSION AS OF 'tag'`` (named ref). Rewritten onto pinned views.
_ASOF = re.compile(
    r"\b(\w+)\s+VERSION\s+AS\s+OF\s+(\d+|'[^']*')", re.IGNORECASE
)


def _split_top(text: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren depth 0 outside single-quoted literals."""
    parts, depth, quote, start = [], 0, False, 0
    for i, ch in enumerate(text):
        if quote:
            if ch == "'":
                quote = False
        elif ch == "'":
            quote = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append(text[start:i])
            start = i + 1
    parts.append(text[start:])
    return [p.strip() for p in parts if p.strip()]


def _find_where(text: str) -> int:
    """Index of the top-level WHERE keyword (-1 if none), quote/paren aware."""
    depth, quote, i, n = 0, False, 0, len(text)
    while i < n:
        ch = text[i]
        if quote:
            if ch == "'":
                quote = False
        elif ch == "'":
            quote = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and text[i : i + 5].upper() == "WHERE":
            before_ok = i == 0 or not (text[i - 1].isalnum() or text[i - 1] == "_")
            after = text[i + 5 : i + 6]
            after_ok = after == "" or not (after.isalnum() or after == "_")
            if before_ok and after_ok:
                return i
        i += 1
    return -1


def _run_dml(
    spark: SparkSession, tables: dict[str, LakeTable], query: str
) -> DataFrame:
    """Dispatch ``DELETE FROM t WHERE p`` / ``UPDATE t SET a=e,... WHERE p``
    onto the version-checked predicate DML (`operators.dml`) — same
    semantics a user of the reference's repository layer gets from its
    delete/update methods (``repositories.py:51-83``), restated
    set-oriented. Returns one row: (table, operation, affected_rows). The
    mutation is snapshot-atomic (one metadata commit via the merge path)."""
    from etl_documentos_spark.operators import dml

    q = query.strip().rstrip(";")
    m = re.match(r"^\s*DELETE\s+FROM\s+(\w+)\s*(.*)$", q, re.I | re.S)
    if m:
        name, rest = m.group(1), m.group(2).strip()
        op = "delete"
    else:
        m = re.match(r"^\s*UPDATE\s+(\w+)\s+SET\s+(.*)$", q, re.I | re.S)
        if not m:
            raise ValueError(f"unsupported DML statement: {query!r}")
        name, rest = m.group(1), m.group(2).strip()
        op = "update"
    if name not in tables:
        raise KeyError(f"no such table {name!r}")
    table = tables[name]

    if op == "delete":
        if rest:
            w = _find_where(rest)
            if w != 0:
                raise ValueError(f"expected WHERE after DELETE FROM: {query!r}")
            predicate = rest[5:].strip()
        else:
            predicate = "true"  # DELETE FROM t == delete every row
        n = dml.delete_where(spark, table, predicate)
    else:
        w = _find_where(rest)
        set_part = rest if w < 0 else rest[:w]
        predicate = "true" if w < 0 else rest[w + 5 :].strip()
        assignments = {}
        for item in _split_top(set_part):
            col, eq, expr = item.partition("=")
            if not eq or not col.strip() or not expr.strip():
                raise ValueError(f"bad SET assignment: {item!r}")
            assignments[col.strip().strip("`")] = F.expr(expr.strip())
        n = dml.update_where(spark, table, predicate, assignments)
    return spark.createDataFrame(
        [(name, op, n)], "table string, operation string, affected_rows long"
    )


def sql(
    spark: SparkSession, tables: dict[str, LakeTable], query: str
) -> DataFrame:
    """Run one SQL statement over named lake tables.

    Every name in ``tables`` is registered against the snapshot current AT
    THIS CALL, then the query runs — per-statement snapshot isolation, the
    same contract a catalog-backed engine gives a query. All of Catalyst
    applies (pushdown, pruning, join planning) because the views are plain
    DataFrame plans over parquet scans.

    Extras beyond SELECT:
    - **DML**: ``DELETE FROM t WHERE ...`` / ``UPDATE t SET ... WHERE ...``
      route to `operators.dml`'s version-checked merge (see `_run_dml`).
    - **Time travel**: ``FROM t VERSION AS OF <snapshot_id|'tag'>`` pins
      that name to the older snapshot for this statement (Iceberg SQL
      syntax); the same name can appear unpinned elsewhere in the query
      and reads the current state.
    """
    if _DML_HEAD.match(query):
        return _run_dml(spark, tables, query)

    def pin(m: re.Match) -> str:
        name, token = m.group(1), m.group(2)
        if name not in tables:
            return m.group(0)  # not ours — leave for Spark to reject
        if token.startswith("'"):
            kwargs = {"ref": token.strip("'")}
            view = f"{name}__asof_{re.sub(r'[^A-Za-z0-9_]', '_', token.strip(chr(39)))}"
        else:
            kwargs = {"snapshot_id": int(token)}
            view = f"{name}__asof_v{token}"
        read_current(spark, tables[name], **kwargs).createOrReplaceTempView(
            view
        )
        return view

    query = _ASOF.sub(pin, query)
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
