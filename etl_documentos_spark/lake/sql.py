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
from pyspark.sql import types as T

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
_DML_HEAD = re.compile(r"^\s*(delete|update|insert|merge)\b", re.IGNORECASE)
_MAINT_HEAD = re.compile(r"^\s*(optimize|vacuum|restore)\b", re.IGNORECASE)

#: Iceberg-style time travel: ``FROM t VERSION AS OF 3`` (snapshot id) or
#: ``FROM t VERSION AS OF 'tag'`` (named ref). Rewritten onto pinned views.
_ASOF = re.compile(
    r"\b(\w+)\s+VERSION\s+AS\s+OF\s+(\d+|'[^']*')", re.IGNORECASE
)

#: Incremental changelog read (CDC-out through the SQL door):
#: ``FROM t CHANGES BETWEEN <snapshot_id|'tag'> AND <snapshot_id|'tag'|CURRENT>``
#: — rewritten onto a `lake.changelog.read_changes` view (manifest-diff
#: planning, reads only the added files).
_CHANGES = re.compile(
    r"\b(\w+)\s+CHANGES\s+BETWEEN\s+(\d+|'[^']*')\s+AND\s+"
    r"(\d+|'[^']*'|CURRENT)(?!\w)",  # (?!\w): a plain \b cannot match
    re.IGNORECASE,                   # after a closing quote
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


def _find_kw(text: str, kw: str, start: int = 0) -> int:
    """Index of the first top-level occurrence of keyword ``kw`` (-1 if
    none), paren/quote aware, word-bounded, case-insensitive."""
    depth, quote, i, n, k = 0, False, start, len(text), len(kw)
    up = kw.upper()
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
        elif depth == 0 and text[i : i + k].upper() == up:
            before_ok = i == 0 or not (
                text[i - 1].isalnum() or text[i - 1] == "_"
            )
            after = text[i + k : i + k + 1]
            after_ok = after == "" or not (after.isalnum() or after == "_")
            if before_ok and after_ok:
                return i
        i += 1
    return -1


def _match_paren(text: str, i: int) -> int:
    """Index just past the ')' matching the '(' at ``text[i]``."""
    depth, quote = 0, False
    for j in range(i, len(text)):
        ch = text[j]
        if quote:
            if ch == "'":
                quote = False
        elif ch == "'":
            quote = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return j + 1
    raise ValueError(f"unbalanced parentheses in: {text!r}")


def _logical_cols(table: LakeTable) -> list[str]:
    from etl_documentos_spark.operators.merge import SYSTEM_COL_NAMES

    return [
        f.name
        for f in table.schema.fields
        if f.name not in SYSTEM_COL_NAMES
    ]


def _run_insert(
    spark: SparkSession, tables: dict[str, LakeTable], q: str
) -> DataFrame:
    """``INSERT INTO t [(cols)] VALUES (...), ... | SELECT ...`` onto
    `operators.dml.insert_into`. The SELECT sees every catalog table's
    state as of THIS statement (same snapshot isolation as queries)."""
    from etl_documentos_spark.operators import dml

    m = re.match(
        r"^\s*INSERT\s+INTO\s+(\w+)(?:\.branch_(\w+))?\s*", q, re.I
    )
    if not m:
        raise ValueError(f"unsupported INSERT statement: {q!r}")
    name, branch, rest = m.group(1), m.group(2), q[m.end() :].strip()
    if name not in tables:
        raise KeyError(f"no such table {name!r}")
    table = tables[name]
    if branch is not None and branch not in table.branches:
        raise KeyError(f"no branch {branch!r} on table {name!r}")
    cols: list[str] | None = None
    if rest.startswith("("):
        end = _match_paren(rest, 0)
        cols = [c.strip().strip("`") for c in _split_top(rest[1:end - 1])]
        rest = rest[end:].strip()
    for n, t in tables.items():
        current_view(spark, t, n)
    head = rest.split(None, 1)[0].upper() if rest else ""
    if head == "VALUES":
        names = cols or _logical_cols(table)
        rows = spark.sql(
            f"SELECT * FROM ({rest}) AS __ins({', '.join(names)})"
        )
    elif head in ("SELECT", "WITH", "TABLE"):
        rows = spark.sql(rest)
        if cols:
            rows = rows.toDF(*cols)
    else:
        raise ValueError(f"expected VALUES or SELECT after INSERT INTO: {q!r}")
    n_rows = dml.insert_into(spark, table, rows, branch=branch)
    return spark.createDataFrame(
        [(name, "insert", n_rows)],
        "table string, operation string, affected_rows long",
    )


def _parse_on_keys(
    cond: str, target_alias: str, source_alias: str
) -> None:
    """Validate the MERGE ON condition: a conjunction of the table's key
    equalities (either side order), nothing else — the restriction that
    keeps MERGE bucket-prunable (see `operators.dml.merge_when`)."""
    from etl_documentos_spark.schemas import KEY_COLS

    seen = set()
    for part in re.split(r"\bAND\b", cond, flags=re.I):
        m = re.match(
            r"^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$", part.strip()
        )
        if not m:
            raise ValueError(
                f"MERGE ON must be key equalities, got {part.strip()!r}"
            )
        a, ca, b, cb = m.groups()
        if ca != cb or {a, b} != {target_alias, source_alias}:
            raise ValueError(
                f"MERGE ON must equate {target_alias}.<key> with "
                f"{source_alias}.<key>, got {part.strip()!r}"
            )
        seen.add(ca)
    if seen != set(KEY_COLS):
        raise ValueError(
            f"MERGE ON must cover exactly the key columns {KEY_COLS}, "
            f"got {sorted(seen)} (row-level conditions go on the WHEN "
            "clauses)"
        )


def _run_merge(
    spark: SparkSession, tables: dict[str, LakeTable], q: str
) -> DataFrame:
    """ANSI ``MERGE INTO`` onto `operators.dml.merge_when` — one atomic
    snapshot commit for the whole statement.

    Grammar (Iceberg/Delta MERGE, ON restricted to the key equality)::

        MERGE INTO t [AS] [alias] USING (subquery)|name [AS] [alias]
        ON <key equalities>
        WHEN MATCHED [AND cond] THEN UPDATE SET a = expr, ... |
        WHEN MATCHED [AND cond] THEN DELETE |
        WHEN NOT MATCHED [AND cond] THEN INSERT * |
                                         INSERT (cols) VALUES (exprs)

    Clause conditions and expressions may reference both sides through the
    aliases; first matching WHEN clause wins per row, as in SQL.
    """
    from etl_documentos_spark.operators import dml

    m = re.match(
        r"^\s*MERGE\s+INTO\s+(\w+)(?:\s+AS)?(?:\s+(?!USING\b)(\w+))?"
        r"\s+USING\s+",
        q,
        re.I,
    )
    if not m:
        raise ValueError(f"unsupported MERGE statement: {q!r}")
    name, t_alias = m.group(1), m.group(2) or m.group(1)
    if name not in tables:
        raise KeyError(f"no such table {name!r}")
    table = tables[name]
    pos = m.end()

    for n, t in tables.items():
        current_view(spark, t, n)
    if q[pos] == "(":
        end = _match_paren(q, pos)
        source = spark.sql(q[pos + 1 : end - 1])
        src_name = None
        pos = end
    else:
        m2 = re.match(r"(\w+)", q[pos:])
        src_name = m2.group(1)
        source = spark.table(src_name)
        pos += m2.end()
    m3 = re.match(r"\s+(?:AS\s+)?(?!ON\b)(\w+)", q[pos:], re.I)
    if m3:
        s_alias = m3.group(1)
        pos += m3.end()
    else:
        s_alias = src_name or "s"

    on_at = _find_kw(q, "ON", pos)
    if on_at < 0:
        raise ValueError(f"MERGE without ON condition: {q!r}")
    first_when = _find_kw(q, "WHEN", on_at)
    if first_when < 0:
        raise ValueError(f"MERGE without WHEN clauses: {q!r}")
    _parse_on_keys(q[on_at + 2 : first_when], t_alias, s_alias)

    # split the WHEN clauses at top level
    starts = []
    at = first_when
    while at >= 0:
        starts.append(at)
        at = _find_kw(q, "WHEN", at + 4)
    matched: list = []
    not_matched = None
    for i, s0 in enumerate(starts):
        s1 = starts[i + 1] if i + 1 < len(starts) else len(q)
        clause = q[s0 + 4 : s1].strip().rstrip(";").strip()
        then_at = _find_kw(clause, "THEN")
        if then_at < 0:
            raise ValueError(f"WHEN clause without THEN: {clause!r}")
        head, action = clause[:then_at].strip(), clause[then_at + 4 :].strip()
        hm = re.match(r"^(NOT\s+)?MATCHED\s*(?:AND\s+(.*))?$", head, re.I | re.S)
        if not hm:
            raise ValueError(f"bad WHEN clause head: {head!r}")
        is_not, cond = bool(hm.group(1)), hm.group(2)
        if is_not:
            im = re.match(
                r"^INSERT\s*(\*|\(.*)$", action, re.I | re.S
            )
            if not im:
                raise ValueError(
                    f"WHEN NOT MATCHED supports only INSERT, got {action!r}"
                )
            if not_matched is not None:
                raise ValueError("at most one WHEN NOT MATCHED clause")
            if im.group(1) == "*":
                values = None
            else:
                rest = action[action.upper().index("INSERT") + 6 :].strip()
                cend = _match_paren(rest, 0)
                ins_cols = [
                    c.strip().strip("`")
                    for c in _split_top(rest[1:cend - 1])
                ]
                after = rest[cend:].strip()
                if not after.upper().startswith("VALUES"):
                    raise ValueError(f"INSERT (cols) needs VALUES: {action!r}")
                vpart = after[6:].strip()
                vend = _match_paren(vpart, 0)
                exprs = _split_top(vpart[1:vend - 1])
                if len(exprs) != len(ins_cols):
                    raise ValueError(
                        f"INSERT has {len(ins_cols)} columns but "
                        f"{len(exprs)} values"
                    )
                values = {
                    c: F.expr(e) for c, e in zip(ins_cols, exprs)
                }
            not_matched = (cond, values)
        elif re.match(r"^DELETE\s*;?\s*$", action, re.I):
            matched.append(("delete", cond, None))
        else:
            um = re.match(r"^UPDATE\s+SET\s+(.*)$", action, re.I | re.S)
            if not um:
                raise ValueError(
                    f"WHEN MATCHED supports UPDATE SET / DELETE, got "
                    f"{action!r}"
                )
            assignments = {}
            for item in _split_top(um.group(1)):
                col, eq, expr = item.partition("=")
                if not eq or not col.strip() or not expr.strip():
                    raise ValueError(f"bad SET assignment: {item!r}")
                key = col.strip().strip("`")
                # allow `t.col = ...`-style targets, normalized to col
                key = key.split(".")[-1]
                assignments[key] = F.expr(expr.strip())
            matched.append(("update", cond, assignments))

    counts = dml.merge_when(
        spark,
        table,
        source,
        matched=matched,
        not_matched=not_matched,
        target_alias=t_alias,
        source_alias=s_alias,
    )
    return spark.createDataFrame(
        [(name, counts["updated"], counts["deleted"], counts["inserted"])],
        "table string, updated long, deleted long, inserted long",
    )


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
    if re.match(r"^\s*INSERT\b", q, re.I):
        return _run_insert(spark, tables, q)
    if re.match(r"^\s*MERGE\b", q, re.I):
        return _run_merge(spark, tables, q)
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


def _run_maintenance(
    spark: SparkSession, tables: dict[str, LakeTable], query: str
) -> DataFrame:
    """``OPTIMIZE t [ZORDER BY (a, b, ...)]`` / ``VACUUM t [RETAIN n
    SNAPSHOTS]`` — the Delta/Iceberg maintenance statements routed onto
    this lake's own procedures: OPTIMIZE is the sorted (or Morton-
    clustered, `operators/zorder.py`) compaction rewrite; VACUUM expires
    old snapshots (tagged refs and current stay pinned) then sweeps
    orphaned files outside the staging grace window. Both are
    snapshot-atomic like every other commit; OPTIMIZE is stamped as
    maintenance so changelog readers skip it."""
    from etl_documentos_spark.operators.merge import compact as _compact

    q = query.strip().rstrip(";")
    m = re.match(
        r"^\s*OPTIMIZE\s+(\w+)\s*"
        r"(?:ZORDER\s+BY\s*\(([^)]*)\))?\s*$",
        q,
        re.I,
    )
    if m:
        name, zcols = m.group(1), m.group(2)
        if name not in tables:
            raise KeyError(f"no such table {name!r}")
        table = tables[name]
        zorder = None
        if zcols is not None:
            zorder = tuple(
                c.strip().strip("`") for c in zcols.split(",") if c.strip()
            )
            names = {f.name for f in table.schema.fields}
            bad = [c for c in zorder if c not in names]
            if bad or len(zorder) < 2:
                raise ValueError(
                    f"ZORDER BY needs >=2 existing columns, got {zorder}"
                )
        before = sum(
            len(fs) for fs in table.current_snapshot.files.values()
        )
        _compact(spark, table, zorder=zorder)
        table._refresh()
        after = sum(
            len(fs) for fs in table.current_snapshot.files.values()
        )
        detail = f"zorder({','.join(zorder)})" if zorder else "sort"
        return spark.createDataFrame(
            [(name, "optimize", detail, before, after)],
            "table string, operation string, strategy string, "
            "files_before long, files_after long",
        )
    m = re.match(
        r"^\s*RESTORE\s+TABLE\s+(\w+)\s+(?:TO\s+)?VERSION\s+AS\s+OF\s+"
        r"(\d+|'[^']+')\s*$",
        q,
        re.I,
    )
    if m:
        # RESTORE TABLE t [TO] VERSION AS OF <snapshot_id|'tag'> — the
        # bad-data recovery statement (Delta RESTORE / Iceberg
        # rollback_to_snapshot). Appends a NEW `rollback` snapshot whose
        # manifest copies the target's: metadata-only, nothing deleted,
        # history preserved, so the restore itself is time-travelable and
        # VACUUM still governs what old files actually expire.
        name, token = m.group(1), m.group(2)
        if name not in tables:
            raise KeyError(f"no such table {name!r}")
        table = tables[name]
        if token.startswith("'"):
            target = table.resolve_ref(token.strip("'"))
        else:
            target = int(token)
        table.rollback(target)
        table._refresh()
        return spark.createDataFrame(
            [(name, "restore", target, table.current_snapshot.snapshot_id)],
            "table string, operation string, restored_to long, "
            "snapshot_id long",
        )
    m = re.match(
        r"^\s*VACUUM\s+(\w+)\s*(?:RETAIN\s+(\d+)\s+SNAPSHOTS)?\s*$", q, re.I
    )
    if m:
        name, keep = m.group(1), m.group(2)
        if name not in tables:
            raise KeyError(f"no such table {name!r}")
        table = tables[name]
        expired = table.expire_snapshots(
            keep_last=int(keep) if keep else 2
        )
        orphans = table.remove_orphan_files()
        return spark.createDataFrame(
            [(name, "vacuum", expired, orphans)],
            "table string, operation string, expired_files long, "
            "orphan_files long",
        )
    raise ValueError(f"unsupported maintenance statement: {query!r}")


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
      / ``INSERT INTO t VALUES|SELECT ...`` / full ``MERGE INTO t USING ...
      WHEN [NOT] MATCHED ...`` route to `operators.dml`'s version-checked
      merge (see `_run_dml`, `_run_insert`, `_run_merge`); each statement
      is one atomic snapshot commit.
    - **Time travel**: ``FROM t VERSION AS OF <snapshot_id|'tag'>`` pins
      that name to the older snapshot for this statement (Iceberg SQL
      syntax); the same name can appear unpinned elsewhere in the query
      and reads the current state.
    - **Changelog (CDC-out)**: ``FROM t CHANGES BETWEEN <snapshot|'tag'>
      AND <snapshot|'tag'|CURRENT>`` reads the rows added in that snapshot
      range via `lake.changelog.read_changes` — manifest-diff planning,
      so the statement reads the delta files only, never the table; rows
      carry ``_change_op``/``_change_snapshot_id``/``_change_ts_ms``.
    - **Maintenance**: ``OPTIMIZE t [ZORDER BY (a, b)]`` (sorted or
      Morton-clustered compaction) and ``VACUUM t [RETAIN n SNAPSHOTS]``
      (snapshot expiry + orphan-file sweep) — see `_run_maintenance`.
    - **DDL on live tables**: ``ALTER TABLE t ADD COLUMNS (...)``
      (metadata-only additive evolution), ``RENAME COLUMN a TO b`` and
      ``DROP COLUMN(S)`` (also metadata-only — historical physical names
      fold back at scan, retired names cannot be reused), and ``ALTER
      TABLE t SET TBLPROPERTIES ('k'='v', ...)`` (per-table engine knobs,
      e.g. ``commit.mode='cas'``) — see `_run_alter`.
    - **Partition-spec evolution**: ``ALTER TABLE t SPLIT BUCKET b``
      (incremental: one bucket re-keyed to two at double hash
      granularity, other buckets' appends run lock-free) and ``ALTER
      TABLE t REBUCKET TO n`` (stop-the-world full re-key, one
      snapshot-atomic swap) — the SQL faces of `LakeTable.split_bucket`
      / `LakeTable.rebucket`.
    - **Partition inspection**: ``SHOW PARTITIONS t`` and the
      ``t.partitions`` metadata table — per-bucket file/byte/row rollup
      from parquet footers, for spotting bucket skew (`partitions_df`).
    - **Property inspection**: ``SHOW TBLPROPERTIES t [('key')]`` — the
      read half of ``SET TBLPROPERTIES`` — and ``ALTER TABLE t UNSET
      TBLPROPERTIES [IF EXISTS] ('k', ...)``, its inverse.
    - **Refs**: ``ALTER TABLE t CREATE [OR REPLACE] TAG name [AS OF
      VERSION n]`` / ``DROP TAG name`` — named snapshot pins that
      ``VERSION AS OF``, ``CHANGES BETWEEN``, ``RESTORE`` and ``VACUUM``
      (tags never expire) all honor.
    - **Branches (write-audit-publish)**: ``ALTER TABLE t CREATE [OR
      REPLACE] BRANCH b [AS OF VERSION n]`` / ``DROP BRANCH b`` create a
      MOVABLE ref; ``INSERT INTO t.branch_b ...`` lands commits on the
      branch head (merge-on-read delta appends — main's files are never
      rewritten by unpublished writes); ``SELECT ... FROM t.branch_b``
      audits the branch state; ``ALTER TABLE t FAST FORWARD TO b``
      publishes the whole chain with one metadata pointer swap iff main
      is still an ancestor (SpecConflictError otherwise — rebase).
      Branch heads and their ancestry stay pinned through ``VACUUM``.
    - **Recovery**: ``RESTORE TABLE t [TO] VERSION AS OF <id|'tag'>`` —
      appends a metadata-only ``rollback`` snapshot copying the target's
      manifest (Delta RESTORE / Iceberg rollback_to_snapshot): history is
      preserved, the restore itself is time-travelable, and subsequent
      commits build on the restored state.
    """
    if _DML_HEAD.match(query):
        return _run_dml(spark, tables, query)
    if _MAINT_HEAD.match(query):
        return _run_maintenance(spark, tables, query)
    if re.match(r"^\s*alter\b", query, re.IGNORECASE):
        return _run_alter(spark, tables, query)
    sp = _SHOW_PARTS_RE.match(query)
    if sp:
        name = sp.group(1)
        if name not in tables:
            raise KeyError(f"unknown table {name!r}")
        return partitions_df(spark, tables[name])
    pp = _SHOW_PROPS_RE.match(query)
    if pp:
        # SHOW TBLPROPERTIES t [('key')] — the read half of SET
        # TBLPROPERTIES, straight off current metadata (no data I/O).
        name, key = pp.group(1), pp.group(2)
        if name not in tables:
            raise KeyError(f"unknown table {name!r}")
        props = tables[name].properties
        if key is not None:
            if key not in props:
                raise KeyError(f"table {name!r} has no property {key!r}")
            props = {key: props[key]}
        return spark.createDataFrame(
            [(k, str(v)) for k, v in sorted(props.items())],
            "key string, value string",
        )

    def pin_meta(m: re.Match) -> str:
        name, meta = m.group(1), m.group(2).lower()
        if name not in tables:
            return m.group(0)  # an alias/column ref — leave to Spark
        view = f"{name}__meta_{meta}"
        _META_TABLES[meta](spark, tables[name]).createOrReplaceTempView(view)
        return view

    query = _META_RE.sub(pin_meta, query)

    def pin_changes(m: re.Match) -> str:
        from etl_documentos_spark.lake.changelog import read_changes

        name = m.group(1)
        if name not in tables:
            return m.group(0)  # not ours — leave for Spark to reject
        t = tables[name]

        def resolve(token: str) -> int:
            if token.upper() == "CURRENT":
                return t.current_snapshot.snapshot_id
            if token.startswith("'"):
                return t.resolve_ref(token.strip("'"))
            return int(token)

        lo, hi = resolve(m.group(2)), resolve(m.group(3))
        view = f"{name}__changes_{lo}_{hi}"
        read_changes(spark, t, lo, hi).createOrReplaceTempView(view)
        return view

    query = _CHANGES.sub(pin_changes, query)

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

    def pin_branch(m: re.Match) -> str:
        # FROM t.branch_b — Iceberg's branch-read identifier: the LWW
        # reader view over the branch HEAD (unpublished commits visible,
        # main untouched). The audit half of write-audit-publish.
        name, br = m.group(1), m.group(2)
        if name not in tables:
            return m.group(0)
        t = tables[name]
        if br not in t.branches:
            raise KeyError(f"no branch {br!r} on table {name!r}")
        view = f"{name}__branch_{br}"
        read_current(spark, t, ref=br).createOrReplaceTempView(view)
        return view

    query = _BRANCH_RE.sub(pin_branch, query)
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
    """Named refs as a DataFrame (Iceberg ``table.refs``): tags AND
    branches, distinguished by ``type`` exactly like Iceberg's table."""
    rows = [
        (name, "tag", sid) for name, sid in sorted(table.refs.items())
    ] + [
        (name, "branch", sid)
        for name, sid in sorted(table.branches.items())
    ]
    return spark.createDataFrame(
        rows, "name string, type string, snapshot_id long"
    )


def partitions_df(spark: SparkSession, table: LakeTable) -> DataFrame:
    """Per-partition rollup of the current snapshot (Iceberg
    ``table.partitions``): one row per hash bucket with its file count,
    byte total and PHYSICAL row total (parquet footer counts — includes
    not-yet-compacted older versions and tombstones, exactly what the
    files on disk hold). Footer reads only — O(files) metadata I/O, never
    data rows — the same cost class as `files_df`. The reference exposes
    per-collection document counts through its admin dashboard
    (``/root/reference/app/database/repositories.py``); this is the
    partition-grain analogue used to spot bucket skew before it hurts a
    MERGE."""
    import pyarrow.parquet as pq

    snap = table.current_snapshot
    rows = []
    for b in sorted(snap.files, key=int):
        n_files, n_bytes, n_rows = 0, 0, 0
        for p in snap.files[b]:
            full = os.path.join(table.root, p)
            try:
                n_bytes += os.path.getsize(full)
                n_rows += pq.ParquetFile(full).metadata.num_rows
                n_files += 1
            except OSError:
                continue  # raced with VACUUM; skip like files_df does
        rows.append((int(b), n_files, n_bytes, n_rows))
    return spark.createDataFrame(
        rows,
        "bucket int, n_files int, size_bytes long, n_rows long",
    )


def history_df(spark: SparkSession, table: LakeTable) -> DataFrame:
    """The table history as a DataFrame (Iceberg ``table.history``): when
    each snapshot was made current, its parent, and whether it is an
    ancestor of the CURRENT snapshot (false = an abandoned line, e.g. a
    rolled-back snapshot or an expired WAP staging commit)."""
    parents = {s.snapshot_id: s.parent_id for s in table.snapshots}
    ancestors: set[int] = set()
    sid: int | None = table.current_snapshot.snapshot_id
    while sid is not None:
        ancestors.add(sid)
        sid = parents.get(sid)
    rows = [
        (
            datetime.datetime.utcfromtimestamp(s.ts_ms / 1000.0),
            s.snapshot_id,
            s.parent_id,
            s.snapshot_id in ancestors,
        )
        for s in table.snapshots
    ]
    return spark.createDataFrame(
        rows,
        "made_current_at timestamp, snapshot_id long, parent_id long,"
        " is_current_ancestor boolean",
    )


#: metadata tables addressable as ``<table>.<name>`` in FROM clauses
_META_TABLES = {
    "snapshots": snapshots_df,
    "files": files_df,
    "refs": refs_df,
    "history": history_df,
    "partitions": partitions_df,
}
#: the ``branch_`` keyword is case-insensitive like every other SQL
#: token on this surface (INSERT INTO t.BRANCH_b already matched via
#: re.I); the table and branch NAMES stay case-sensitive identifiers
_BRANCH_RE = re.compile(r"\b(\w+)\.(?i:branch_)(\w+)\b")

_META_RE = re.compile(
    r"\b(\w+)\.(snapshots|files|refs|history|partitions)\b", re.IGNORECASE
)

_SHOW_PARTS_RE = re.compile(
    r"^\s*SHOW\s+PARTITIONS\s+(\w+)\s*;?\s*$", re.IGNORECASE
)

_SHOW_PROPS_RE = re.compile(
    r"^\s*SHOW\s+TBLPROPERTIES\s+(\w+)"
    r"(?:\s*\(\s*'([^']+)'\s*\))?\s*;?\s*$",
    re.IGNORECASE,
)


_ALTER_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(\w+)\s+ADD\s+COLUMNS?\s*\((.+)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_ALTER_DROP_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+COLUMNS?\s+\(?\s*([\w\s,]+?)\s*\)?\s*;?\s*$",
    re.IGNORECASE,
)

_ALTER_RENAME_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(\w+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*;?\s*$",
    re.IGNORECASE,
)

_ALTER_PROPS_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(\w+)\s+SET\s+TBLPROPERTIES\s*\((.+)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_ALTER_TAG_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(\w+)\s+CREATE\s+(OR\s+REPLACE\s+)?TAG\s+"
    r"(\w+)(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*;?\s*$",
    re.IGNORECASE,
)

_ALTER_DROP_TAG_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+TAG\s+(\w+)\s*;?\s*$",
    re.IGNORECASE,
)

_ALTER_BRANCH_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(\w+)\s+CREATE\s+(OR\s+REPLACE\s+)?BRANCH\s+"
    r"(\w+)(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*;?\s*$",
    re.IGNORECASE,
)

_ALTER_DROP_BRANCH_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+BRANCH\s+(\w+)\s*;?\s*$",
    re.IGNORECASE,
)

_ALTER_FF_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(\w+)\s+FAST\s+FORWARD\s+TO\s+(\w+)\s*;?\s*$",
    re.IGNORECASE,
)

_ALTER_SPLIT_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(\w+)\s+SPLIT\s+BUCKET\s+(\d+)\s*;?\s*$",
    re.IGNORECASE,
)

_ALTER_REBUCKET_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(\w+)\s+REBUCKET\s+TO\s+(\d+)\s*;?\s*$",
    re.IGNORECASE,
)

_ALTER_UNSET_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(\w+)\s+UNSET\s+TBLPROPERTIES\s*"
    r"(IF\s+EXISTS\s+)?\((.+)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_PROP_PAIR_RE = re.compile(r"^\s*'([^']+)'\s*=\s*'([^']*)'\s*$")


def _run_alter(
    spark: SparkSession, tables: dict[str, LakeTable], query: str
) -> DataFrame:
    """``ALTER TABLE t ADD COLUMNS (name type, ...)`` — Iceberg grammar —
    routed onto the additive-evolution primitive (`LakeTable.add_columns`):
    ONE metadata-only snapshot commit, zero data files rewritten; existing
    rows read the new columns back as null. Types parse with Spark's own
    DDL parser, so any Spark SQL type works. Returns the added columns as
    (col_name, data_type) rows."""
    bm = _ALTER_BRANCH_RE.match(query)
    if bm:
        # ALTER TABLE t CREATE [OR REPLACE] BRANCH b [AS OF VERSION n] —
        # Iceberg branch DDL. A branch is a MOVABLE ref: INSERT INTO
        # t.branch_b advances it while main is untouched (multi-commit
        # write-audit-publish); ALTER TABLE t FAST FORWARD TO b publishes.
        name, replace, br, ver = (
            bm.group(1), bool(bm.group(2)), bm.group(3), bm.group(4)
        )
        if name not in tables:
            raise KeyError(f"unknown table {name!r}")
        sid = tables[name].create_branch(
            br, int(ver) if ver is not None else None, replace=replace
        )
        return spark.createDataFrame(
            [(name, br, sid)],
            "table string, branch string, snapshot_id long",
        )
    dbm = _ALTER_DROP_BRANCH_RE.match(query)
    if dbm:
        name, br = dbm.group(1), dbm.group(2)
        if name not in tables:
            raise KeyError(f"unknown table {name!r}")
        tables[name].drop_branch(br)
        return spark.createDataFrame(
            [(name, br)], "table string, branch string"
        )
    ffm = _ALTER_FF_RE.match(query)
    if ffm:
        # ALTER TABLE t FAST FORWARD TO b — publish a branch: main
        # fast-forwards to the branch head iff it is an ancestor
        # (otherwise SpecConflictError — rebase the branch). Iceberg
        # exposes this as CALL system.fast_forward('t','main','b'); this
        # engine keeps every statement in ALTER grammar instead of
        # adding a CALL procedure namespace for one verb.
        name, br = ffm.group(1), ffm.group(2)
        if name not in tables:
            raise KeyError(f"unknown table {name!r}")
        t = tables[name]
        sid = t.fast_forward(br)
        t._refresh()
        return spark.createDataFrame(
            [(name, br, sid)],
            "table string, branch string, snapshot_id long",
        )
    tm = _ALTER_TAG_RE.match(query)
    if tm:
        # ALTER TABLE t CREATE [OR REPLACE] TAG name [AS OF VERSION n] —
        # Iceberg branch/tag DDL, routed onto the refs primitive: one
        # metadata-only commit pinning a snapshot under a name that
        # VERSION AS OF / CHANGES BETWEEN / VACUUM all honor. Plain
        # CREATE refuses to clobber an existing tag; OR REPLACE moves it.
        name, replace, tag_name, ver = (
            tm.group(1), bool(tm.group(2)), tm.group(3), tm.group(4)
        )
        if name not in tables:
            raise KeyError(f"unknown table {name!r}")
        t = tables[name]
        if not replace and tag_name in t.refs:
            raise ValueError(
                f"tag {tag_name!r} already exists on table {name!r} "
                "(use CREATE OR REPLACE TAG to move it)"
            )
        sid = t.tag(tag_name, int(ver) if ver is not None else None)
        return spark.createDataFrame(
            [(name, tag_name, sid)],
            "table string, tag string, snapshot_id long",
        )
    dtm = _ALTER_DROP_TAG_RE.match(query)
    if dtm:
        name, tag_name = dtm.group(1), dtm.group(2)
        if name not in tables:
            raise KeyError(f"unknown table {name!r}")
        tables[name].drop_tag(tag_name)
        return spark.createDataFrame(
            [(name, tag_name)], "table string, tag string"
        )
    sm = _ALTER_SPLIT_RE.match(query)
    if sm:
        # ALTER TABLE t SPLIT BUCKET b — partition-spec evolution, the
        # incremental form: ONE base bucket is re-keyed to two at double
        # hash granularity while appends to other buckets proceed
        # lock-free (`LakeTable.split_bucket`). Iceberg's analogue is
        # ADD PARTITION FIELD with a wider bucket() transform; this
        # lake's spec is a bucket count + split set, so the statement
        # names the bucket directly.
        name, b = sm.group(1), int(sm.group(2))
        if name not in tables:
            raise KeyError(f"unknown table {name!r}")
        t = tables[name]
        t.split_bucket(spark, b)
        return spark.createDataFrame(
            [(name, b, t.num_buckets, len(t.split_buckets))],
            "table string, bucket int, num_buckets int, n_split int",
        )
    rbm = _ALTER_REBUCKET_RE.match(query)
    if rbm:
        # ALTER TABLE t REBUCKET TO n — partition-spec evolution, the
        # stop-the-world form: every row re-keyed under pmod(xxhash64,
        # n) in one snapshot-atomic rewrite (`LakeTable.rebucket`);
        # readers see old or new spec, never a mix, and time travel to
        # pre-rebucket snapshots still works.
        name, n_new = rbm.group(1), int(rbm.group(2))
        if name not in tables:
            raise KeyError(f"unknown table {name!r}")
        t = tables[name]
        t.rebucket(spark, n_new)
        return spark.createDataFrame(
            [(name, n_new)], "table string, num_buckets int"
        )
    um = _ALTER_UNSET_RE.match(query)
    if um:
        # ALTER TABLE t UNSET TBLPROPERTIES [IF EXISTS] ('k', ...) — the
        # inverse of SET, one metadata-only commit; unknown keys raise
        # unless IF EXISTS (Spark/Iceberg grammar).
        name, if_exists, body = um.group(1), bool(um.group(2)), um.group(3)
        if name not in tables:
            raise KeyError(f"unknown table {name!r}")
        keys = [
            k.strip().strip("'") for k in body.split(",") if k.strip()
        ]
        removed = tables[name].remove_properties(keys, if_exists=if_exists)
        return spark.createDataFrame(
            [(k,) for k in removed], "key string"
        )
    pm = _ALTER_PROPS_RE.match(query)
    if pm:
        # ALTER TABLE t SET TBLPROPERTIES ('k'='v', ...) — Iceberg grammar.
        # How a user flips per-table engine knobs through the SQL door:
        # commit.mode='cas' (object-store commit protocol),
        # stats.bloom.cols, compaction thresholds. Each property lands as
        # one versioned metadata-only commit (crash-safe, time-travelable
        # like every other table mutation).
        name, body = pm.group(1), pm.group(2)
        if name not in tables:
            raise KeyError(f"unknown table {name!r}")
        pairs = []
        for item in _split_top(body):
            km = _PROP_PAIR_RE.match(item)
            if not km:
                raise ValueError(
                    f"malformed TBLPROPERTIES entry {item!r} "
                    "(expected 'key'='value')"
                )
            pairs.append((km.group(1), km.group(2)))
        for k, v in pairs:
            tables[name].set_property(k, v)
        return spark.createDataFrame(pairs, "key string, value string")
    rm = _ALTER_RENAME_RE.match(query)
    if rm:
        # ALTER TABLE t RENAME COLUMN a TO b — Iceberg grammar. One
        # metadata-only commit; pre-rename files keep the old physical
        # name and scan folds it back (see LakeTable.rename_column).
        name, old, new = rm.group(1), rm.group(2), rm.group(3)
        if name not in tables:
            raise KeyError(f"unknown table {name!r}")
        tables[name].rename_column(old, new)
        return spark.createDataFrame(
            [(old, new)], "from_name string, to_name string"
        )
    dm = _ALTER_DROP_RE.match(query)
    if dm:
        # ALTER TABLE t DROP COLUMN a / DROP COLUMNS (a, b) — one
        # metadata-only commit, zero rewrite; the orphaned bytes leave
        # old files at the next natural compaction.
        name = dm.group(1)
        if name not in tables:
            raise KeyError(f"unknown table {name!r}")
        cols = [c.strip() for c in dm.group(2).split(",") if c.strip()]
        tables[name].drop_columns(cols)
        return spark.createDataFrame([(c,) for c in cols], "col_name string")
    m = _ALTER_RE.match(query)
    if not m:
        raise ValueError(
            "unsupported ALTER statement (only ADD COLUMNS (name type, "
            "...), DROP COLUMN(S), RENAME COLUMN a TO b, SET "
            "TBLPROPERTIES ('k'='v', ...), UNSET TBLPROPERTIES "
            "[IF EXISTS] ('k', ...), CREATE [OR REPLACE] TAG name "
            "[AS OF VERSION n], DROP TAG name, SPLIT BUCKET n and "
            "REBUCKET TO n are implemented): "
            f"{query!r}"
        )
    name, cols = m.group(1), m.group(2)
    if name not in tables:
        raise KeyError(f"unknown table {name!r}")
    table = tables[name]
    # strip Iceberg's optional COMMENT '...' per column before type-parsing
    cleaned = [
        re.sub(r"\s+COMMENT\s+'[^']*'\s*$", "", c.strip(), flags=re.I)
        for c in _split_top(cols)
    ]
    fields = list(T.StructType.fromDDL(", ".join(cleaned)).fields)
    existing = {f.name for f in table.schema.fields}
    dup = [f.name for f in fields if f.name in existing]
    if dup:
        raise ValueError(f"columns already exist: {dup}")
    table.add_columns(fields)
    return spark.createDataFrame(
        [(f.name, f.dataType.simpleString()) for f in fields],
        "col_name string, data_type string",
    )
