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


def test_sql_delete_where(spark, sql_table):
    before = sql(
        spark, {"t": sql_table}, "SELECT count(*) AS n FROM t"
    ).first().n
    res = sql(
        spark, {"t": sql_table}, "DELETE FROM t WHERE role = 'bot'"
    ).first()
    assert res.operation == "delete" and res.affected_rows > 0
    after = sql(spark, {"t": sql_table}, "SELECT count(*) AS n FROM t").first().n
    assert after == before - res.affected_rows
    assert (
        sql(
            spark, {"t": sql_table},
            "SELECT count(*) AS n FROM t WHERE role = 'bot'",
        ).first().n
        == 0
    )


def test_sql_update_where_snapshot_atomic(spark, sql_table):
    snaps_before = len(sql_table.snapshots)
    res = sql(
        spark,
        {"t": sql_table},
        "UPDATE t SET text = concat(text, ' [edited]'),"
        " tool = upper(coalesce(tool, 'none'))"
        " WHERE role = 'user' AND turn_idx < 2",
    ).first()
    assert res.operation == "update" and res.affected_rows > 0
    fresh = LakeTable.load(sql_table.root)
    # the whole UPDATE landed as ONE snapshot commit (atomic)
    assert len(fresh.snapshots) == snaps_before + 1
    rows = sql(
        spark, {"t": fresh},
        "SELECT count(*) AS n FROM t WHERE text LIKE '%[edited]'",
    ).first()
    assert rows.n == res.affected_rows
    # non-matching rows untouched
    untouched = sql(
        spark, {"t": fresh},
        "SELECT count(*) AS n FROM t"
        " WHERE role = 'bot' AND text LIKE '%[edited]'",
    ).first()
    assert untouched.n == 0


def test_sql_time_travel_version_as_of(spark, sql_table):
    v1 = sql_table.current_snapshot.snapshot_id
    sql_table.tag("before_edit", v1)
    n1 = sql(spark, {"t": sql_table}, "SELECT count(*) AS n FROM t").first().n
    sql(spark, {"t": sql_table}, "DELETE FROM t WHERE role = 'bot'")
    fresh = LakeTable.load(sql_table.root)
    # current view sees the delete; the pinned reads do not
    cur = sql(spark, {"t": fresh}, "SELECT count(*) AS n FROM t").first().n
    by_id = sql(
        spark, {"t": fresh},
        f"SELECT count(*) AS n FROM t VERSION AS OF {v1}",
    ).first().n
    by_tag = sql(
        spark, {"t": fresh},
        "SELECT count(*) AS n FROM t VERSION AS OF 'before_edit'",
    ).first().n
    assert by_id == n1 and by_tag == n1 and cur < n1
    # pinned and current state can join in ONE statement
    drift = sql(
        spark, {"t": fresh},
        f"SELECT count(*) AS n FROM t VERSION AS OF {v1} old"
        " LEFT ANTI JOIN t ON old.conv_id = t.conv_id"
        " AND old.turn_idx = t.turn_idx",
    ).first().n
    assert drift == by_id - cur


def test_sql_optimize_and_vacuum(spark, tmp_path):
    """OPTIMIZE compacts (plain and ZORDER BY), VACUUM expires + sweeps —
    the Delta/Iceberg maintenance statements at the SQL door, content
    preserved throughout."""
    table = LakeTable.create(
        str(tmp_path / "t"),
        physical_schema(TRANSCRIPTS),
        num_buckets=2,
        properties={"stats.cols": "conv_id,ts"},
    )
    # several merges -> several delta files per bucket
    for lo in (0, 40, 80):
        merge_into(spark, table, _events(spark, lo, lo + 40))
    before = read_current(spark, table).orderBy("conv_id", "turn_idx").collect()

    r = sql(spark, {"t": table}, "OPTIMIZE t").collect()[0]
    assert r["operation"] == "optimize" and r["strategy"] == "sort"
    assert r["files_after"] <= r["files_before"]
    table._refresh()
    assert (
        read_current(spark, table).orderBy("conv_id", "turn_idx").collect()
        == before
    )

    r = sql(spark, {"t": table}, "OPTIMIZE t ZORDER BY (conv_id, ts)").collect()[0]
    assert r["strategy"] == "zorder(conv_id,ts)"
    table._refresh()
    assert (
        read_current(spark, table).orderBy("conv_id", "turn_idx").collect()
        == before
    )
    # the z-ordered files carry ts stats (the dimension OPTIMIZE clustered)
    assert any(
        "ts" in st for st in table.current_snapshot.file_stats.values()
    )

    r = sql(spark, {"t": table}, "VACUUM t RETAIN 2 SNAPSHOTS").collect()[0]
    assert r["operation"] == "vacuum" and r["expired_files"] >= 0
    table._refresh()
    assert len(table.snapshots) <= 3  # create + kept window
    assert (
        read_current(spark, table).orderBy("conv_id", "turn_idx").collect()
        == before
    )

    with pytest.raises(ValueError):
        sql(spark, {"t": table}, "OPTIMIZE t ZORDER BY (conv_id)")
    with pytest.raises(KeyError):
        sql(spark, {"t": table}, "VACUUM missing")


def test_alter_table_add_columns_sql(spark, sql_table):
    """ALTER TABLE ... ADD COLUMNS through the SQL door: metadata-only
    (zero files rewritten), old rows read null, new values land via SQL."""
    files_before = {
        p for fs in sql_table.current_snapshot.files.values() for p in fs
    }
    res = sql(
        spark,
        {"t": sql_table},
        "ALTER TABLE t ADD COLUMNS ("
        " tool_call_id string COMMENT 'trace id', tool_latency_ms double)",
    ).collect()
    assert [(r.col_name, r.data_type) for r in res] == [
        ("tool_call_id", "string"), ("tool_latency_ms", "double"),
    ]
    sql_table._refresh()
    files_after = {
        p for fs in sql_table.current_snapshot.files.values() for p in fs
    }
    assert files_after == files_before
    names = [f.name for f in sql_table.schema.fields]
    assert "tool_call_id" in names and "tool_latency_ms" in names
    # old rows surface the new column as null through SQL
    n = sql(
        spark, {"t": sql_table},
        "SELECT count(*) AS n FROM t WHERE tool_call_id IS NULL",
    ).first().n
    assert n == read_current(spark, sql_table).count()
    # duplicate add rejected
    with pytest.raises(ValueError, match="already exist"):
        sql(spark, {"t": sql_table}, "ALTER TABLE t ADD COLUMNS (role string)")
    # unknown table rejected
    with pytest.raises(KeyError):
        sql(spark, {"t": sql_table}, "ALTER TABLE nope ADD COLUMNS (x int)")


def test_history_metadata_table(spark, sql_table, tmp_path):
    """t.history through the SQL door: every snapshot with parent links;
    main-line snapshots (including a rollback, which appends — history is
    linear, never rewritten) are current-ancestors, an unpublished WAP
    staged snapshot is not."""
    from etl_documentos_spark.lake.sql import history_df
    from etl_documentos_spark.operators.merge import changes_to_physical

    merge_into(spark, sql_table, _events(spark, 500, 520, turn_base=90))
    sql_table._refresh()
    rolled_from = sql_table.current_snapshot.snapshot_id
    sql_table.rollback(sql_table.current_snapshot.parent_id)
    staged = sql_table.stage_append(
        changes_to_physical(
            _events(spark, 900, 905, turn_base=200), sql_table.schema
        )
    )
    sql_table._refresh()

    hist = {
        r.snapshot_id: r
        for r in sql(
            spark, {"t": sql_table},
            "SELECT * FROM t.history ORDER BY snapshot_id",
        ).collect()
    }
    assert len(hist) == len(sql_table.snapshots)
    # the rollback APPENDED a snapshot: the rolled-past one stays on the
    # (linear) main line, so it is still an ancestor of current
    assert hist[rolled_from].is_current_ancestor
    cur = sql_table.current_snapshot
    assert hist[cur.snapshot_id].is_current_ancestor
    assert cur.operation == "rollback"
    # the unpublished staged snapshot is recorded but NOT a current ancestor
    assert not hist[staged].is_current_ancestor
    # function-level accessor agrees with the SQL door
    direct = {r.snapshot_id: r for r in history_df(spark, sql_table).collect()}
    assert {k: v.is_current_ancestor for k, v in hist.items()} == {
        k: v.is_current_ancestor for k, v in direct.items()
    }


def test_alter_table_set_tblproperties_sql(spark, sql_table):
    """ALTER TABLE ... SET TBLPROPERTIES through the SQL door: properties
    land as versioned metadata commits and immediately steer the engine —
    commit.mode='cas' switches the table to the lock-free protocol."""
    res = sql(
        spark,
        {"t": sql_table},
        "ALTER TABLE t SET TBLPROPERTIES ("
        "'commit.mode'='cas', 'stats.bloom.cols'='conv_id')",
    ).collect()
    assert [(r.key, r.value) for r in res] == [
        ("commit.mode", "cas"), ("stats.bloom.cols", "conv_id"),
    ]
    sql_table._refresh()
    assert sql_table.get_property("commit.mode") == "cas"
    assert sql_table.commit_mode == "cas"
    # the next mutation goes through the CAS path and still lands
    v_before = sql_table._meta["metadata_version"]
    sql_table.set_property("x", "y")
    assert sql_table._meta["metadata_version"] > v_before
    with pytest.raises(ValueError, match="malformed TBLPROPERTIES"):
        sql(spark, {"t": sql_table},
            "ALTER TABLE t SET TBLPROPERTIES (commit.mode=cas)")
    with pytest.raises(KeyError):
        sql(spark, {"t": sql_table},
            "ALTER TABLE nope SET TBLPROPERTIES ('a'='b')")


def test_partitions_metadata_table(spark, sql_table):
    """t.partitions / SHOW PARTITIONS: per-bucket rollup agrees with the
    manifest (file counts) and with the physical rows on disk (footer
    totals == rows readable from the raw bucket scan)."""
    from etl_documentos_spark.lake.sql import partitions_df

    parts = {r.bucket: r for r in partitions_df(spark, sql_table).collect()}
    snap = sql_table.current_snapshot
    assert set(parts) == {int(b) for b in snap.files}
    for b, fs in snap.files.items():
        assert parts[int(b)].n_files == len(fs)
        assert parts[int(b)].size_bytes > 0
    # footer row totals == physical rows (raw scan, pre-LWW, per bucket)
    phys = {
        b: sql_table.scan(spark, buckets=[b]).count() for b in parts
    }
    assert {b: r.n_rows for b, r in parts.items()} == phys

    via_show = {
        r.bucket: (r.n_files, r.size_bytes, r.n_rows)
        for r in sql(spark, {"t": sql_table}, "SHOW PARTITIONS t").collect()
    }
    assert via_show == {
        b: (r.n_files, r.size_bytes, r.n_rows) for b, r in parts.items()
    }
    # addressable in a FROM clause like the other metadata tables
    tot = sql(
        spark,
        {"t": sql_table},
        "SELECT SUM(n_rows) AS n FROM t.partitions",
    ).first()
    assert tot.n == sum(phys.values())
    with pytest.raises(KeyError):
        sql(spark, {"t": sql_table}, "SHOW PARTITIONS nope")


def test_show_tblproperties_sql(spark, sql_table):
    """SHOW TBLPROPERTIES is the read half of SET TBLPROPERTIES."""
    sql(
        spark,
        {"t": sql_table},
        "ALTER TABLE t SET TBLPROPERTIES"
        " ('commit.mode'='cas', 'write.compression'='zstd')",
    )
    rows = {
        r.key: r.value
        for r in sql(
            spark, {"t": sql_table}, "SHOW TBLPROPERTIES t"
        ).collect()
    }
    assert rows["commit.mode"] == "cas"
    assert rows["write.compression"] == "zstd"
    one = sql(
        spark, {"t": sql_table}, "SHOW TBLPROPERTIES t ('commit.mode')"
    ).collect()
    assert [(r.key, r.value) for r in one] == [("commit.mode", "cas")]
    with pytest.raises(KeyError):
        sql(spark, {"t": sql_table}, "SHOW TBLPROPERTIES t ('nope')")
    with pytest.raises(KeyError):
        sql(spark, {"t": sql_table}, "SHOW TBLPROPERTIES nope")


def test_rename_and_drop_column_sql(spark, sql_table):
    """RENAME COLUMN / DROP COLUMN are metadata-only (zero files touched);
    pre-rename files keep the old physical name and scan folds it back."""
    from pyspark.sql import types as T

    def live_files(t):
        return {p for fs in t.current_snapshot.files.values() for p in fs}

    files0 = live_files(sql_table)
    orig = {
        (r.conv_id, r.turn_idx): r.text
        for r in read_current(spark, sql_table).collect()
    }
    out = sql(
        spark, {"t": sql_table}, "ALTER TABLE t RENAME COLUMN text TO body"
    ).collect()
    assert [(r.from_name, r.to_name) for r in out] == [("text", "body")]
    assert live_files(sql_table) == files0, "rename must rewrite nothing"
    got = {
        (r.conv_id, r.turn_idx): r.body
        for r in read_current(spark, sql_table).collect()
    }
    assert got == orig  # historical physical name folds back exactly

    # post-rename writes use the NEW physical name; scan mixes both
    sql(
        spark,
        {"t": sql_table},
        "INSERT INTO t (conv_id, turn_idx, role, body, ts) VALUES"
        " ('conv_new', 99, 'user', 'fresh row',"
        " TIMESTAMP '2024-02-01 00:00:00')",
    )
    rows = sql(
        spark,
        {"t": sql_table},
        "SELECT body FROM t WHERE conv_id = 'conv_new'",
    ).collect()
    assert [r.body for r in rows] == ["fresh row"]

    files1 = live_files(sql_table)
    dropped = sql(
        spark, {"t": sql_table}, "ALTER TABLE t DROP COLUMN tool"
    ).collect()
    assert [r.col_name for r in dropped] == ["tool"]
    assert live_files(sql_table) == files1, "drop must rewrite nothing"
    assert "tool" not in read_current(spark, sql_table).columns
    n = sql(spark, {"t": sql_table}, "SELECT count(*) AS n FROM t").first().n
    assert n == len(orig) + 1

    # retired names cannot be resurrected (name-based mapping, no field ids)
    with pytest.raises(ValueError):
        sql_table.add_columns([T.StructField("tool", T.StringType(), True)])
    with pytest.raises(ValueError):
        sql_table.add_columns([T.StructField("text", T.StringType(), True)])
    with pytest.raises(ValueError):
        sql_table.rename_column("role", "body")  # live name
    with pytest.raises(ValueError):
        sql_table.rename_column("conv_id", "cid")  # partition column
    with pytest.raises(ValueError):
        sql_table.drop_columns(["_lsn"])  # system column
    with pytest.raises(KeyError):
        sql_table.drop_columns(["nope"])
    # chained rename keeps the whole name history readable
    sql(spark, {"t": sql_table}, "ALTER TABLE t RENAME COLUMN body TO content")
    got2 = {
        (r.conv_id, r.turn_idx): r.content
        for r in read_current(spark, sql_table).collect()
        if r.conv_id != "conv_new"
    }
    assert got2 == orig


def test_restore_table_sql(spark, sql_table):
    """RESTORE TABLE appends a metadata-only rollback snapshot; the bad
    DML vanishes from the current view but stays in history."""
    before = {
        (r.conv_id, r.turn_idx)
        for r in read_current(spark, sql_table).collect()
    }
    v0 = sql_table.current_snapshot.snapshot_id
    sql_table.tag("good", v0)

    # the "incident": a destructive DELETE plus a bad insert
    sql(spark, {"t": sql_table}, "DELETE FROM t WHERE conv_id = 'conv_1'")
    sql(
        spark,
        {"t": sql_table},
        "INSERT INTO t (conv_id, turn_idx, role, text, ts) VALUES"
        " ('conv_bad', 1, 'bot', 'oops', TIMESTAMP '2024-03-01 00:00:00')",
    )
    mid = {
        (r.conv_id, r.turn_idx)
        for r in read_current(spark, sql_table).collect()
    }
    assert ("conv_bad", 1) in mid and not any(
        c == "conv_1" for c, _ in mid
    )

    out = sql(
        spark, {"t": sql_table},
        f"RESTORE TABLE t TO VERSION AS OF {v0}",
    ).collect()
    assert [(r.table, r.operation, r.restored_to) for r in out] == [
        ("t", "restore", v0)
    ]
    after = {
        (r.conv_id, r.turn_idx)
        for r in read_current(spark, sql_table).collect()
    }
    assert after == before
    # history preserved: the rollback is a NEW snapshot, nothing deleted
    ops = [s.operation for s in sql_table.snapshots]
    assert ops[-1] == "rollback"
    assert sql_table.current_snapshot.snapshot_id > v0
    # the incident state is still time-travelable (snapshot before restore)
    bad_id = sql_table.snapshots[-2].snapshot_id
    n_bad = sql(
        spark, {"t": sql_table},
        f"SELECT count(*) AS n FROM t VERSION AS OF {bad_id}"
        " WHERE conv_id = 'conv_bad'",
    ).first().n
    assert n_bad == 1

    # restore by tag, without the optional TO
    sql(spark, {"t": sql_table}, "RESTORE TABLE t VERSION AS OF 'good'")
    assert {
        (r.conv_id, r.turn_idx)
        for r in read_current(spark, sql_table).collect()
    } == before

    with pytest.raises(KeyError):
        sql(spark, {"t": sql_table}, "RESTORE TABLE t VERSION AS OF 'nope'")
    with pytest.raises(KeyError):
        sql(spark, {"t": sql_table}, "RESTORE TABLE t VERSION AS OF 999999")
    with pytest.raises(KeyError):
        sql(spark, {"t": sql_table}, "RESTORE TABLE nope VERSION AS OF 1")


def test_unset_tblproperties_sql(spark, sql_table):
    sql(
        spark,
        {"t": sql_table},
        "ALTER TABLE t SET TBLPROPERTIES ('a'='1', 'b'='2', 'c'='3')",
    )
    out = sql(
        spark, {"t": sql_table},
        "ALTER TABLE t UNSET TBLPROPERTIES ('a', 'b')",
    ).collect()
    assert sorted(r.key for r in out) == ["a", "b"]
    props = sql_table.properties
    assert "a" not in props and "b" not in props and props["c"] == "3"
    with pytest.raises(KeyError):
        sql(spark, {"t": sql_table}, "ALTER TABLE t UNSET TBLPROPERTIES ('a')")
    out = sql(
        spark, {"t": sql_table},
        "ALTER TABLE t UNSET TBLPROPERTIES IF EXISTS ('a', 'c')",
    ).collect()
    assert [r.key for r in out] == ["c"]
    assert "c" not in sql_table.properties


def test_tag_ddl_sql(spark, sql_table):
    """CREATE/DROP TAG through the SQL door; VERSION AS OF honors them."""
    v0 = sql_table.current_snapshot.snapshot_id
    out = sql(
        spark, {"t": sql_table}, "ALTER TABLE t CREATE TAG release_1"
    ).collect()
    assert [(r.table, r.tag, r.snapshot_id) for r in out] == [
        ("t", "release_1", v0)
    ]
    sql(
        spark,
        {"t": sql_table},
        "INSERT INTO t (conv_id, turn_idx, role, text, ts) VALUES"
        " ('conv_tag', 1, 'user', 'after tag',"
        " TIMESTAMP '2024-02-01 00:00:00')",
    )
    n_tag = sql(
        spark, {"t": sql_table},
        "SELECT count(*) AS n FROM t VERSION AS OF 'release_1'",
    ).first().n
    n_now = sql(
        spark, {"t": sql_table}, "SELECT count(*) AS n FROM t"
    ).first().n
    assert n_now == n_tag + 1

    # plain CREATE refuses to clobber; OR REPLACE moves the tag
    with pytest.raises(ValueError):
        sql(spark, {"t": sql_table}, "ALTER TABLE t CREATE TAG release_1")
    out = sql(
        spark, {"t": sql_table},
        "ALTER TABLE t CREATE OR REPLACE TAG release_1",
    ).collect()
    assert out[0].snapshot_id > v0
    assert sql(
        spark, {"t": sql_table},
        "SELECT count(*) AS n FROM t VERSION AS OF 'release_1'",
    ).first().n == n_now

    # pin an explicit older version
    sql(
        spark, {"t": sql_table},
        f"ALTER TABLE t CREATE TAG pre_insert AS OF VERSION {v0}",
    )
    assert sql_table.refs["pre_insert"] == v0

    sql(spark, {"t": sql_table}, "ALTER TABLE t DROP TAG release_1")
    assert "release_1" not in sql_table.refs
    with pytest.raises(KeyError):
        sql(spark, {"t": sql_table}, "ALTER TABLE t DROP TAG release_1")
    with pytest.raises(KeyError):
        sql(
            spark, {"t": sql_table},
            "ALTER TABLE t CREATE TAG bad AS OF VERSION 999999",
        )


def test_split_bucket_sql(spark, sql_table):
    """ALTER TABLE t SPLIT BUCKET b: spec records the split, content is
    byte-identical, and the re-keyed bucket's rows land under b and
    b + N."""
    before = sorted(
        map(tuple, read_current(spark, sql_table)
            .select("conv_id", "turn_idx", "text").collect())
    )
    res = sql(
        spark, {"t": sql_table}, "ALTER TABLE t SPLIT BUCKET 1"
    ).first()
    assert (res.bucket, res.num_buckets, res.n_split) == (1, 2, 1)
    assert sql_table.split_buckets == [1]
    keys = {int(b) for b in sql_table.current_snapshot.files}
    assert keys <= {0, 1, 3}, f"split of 1 at N=2 maps to 1 and 3: {keys}"
    after = sorted(
        map(tuple, read_current(spark, sql_table)
            .select("conv_id", "turn_idx", "text").collect())
    )
    assert after == before
    with pytest.raises(ValueError, match="already split"):
        sql(spark, {"t": sql_table}, "ALTER TABLE t SPLIT BUCKET 1")


def test_rebucket_sql(spark, sql_table):
    before = sorted(
        map(tuple, read_current(spark, sql_table)
            .select("conv_id", "turn_idx", "text").collect())
    )
    res = sql(spark, {"t": sql_table}, "ALTER TABLE t REBUCKET TO 8").first()
    assert res.num_buckets == 8
    assert sql_table.num_buckets == 8 and sql_table.split_buckets == []
    assert {int(b) for b in sql_table.current_snapshot.files} <= set(range(8))
    after = sorted(
        map(tuple, read_current(spark, sql_table)
            .select("conv_id", "turn_idx", "text").collect())
    )
    assert after == before


def test_alter_unknown_statement_names_spec_evolution(spark, sql_table):
    with pytest.raises(ValueError, match="SPLIT BUCKET"):
        sql(spark, {"t": sql_table}, "ALTER TABLE t FROBNICATE")
