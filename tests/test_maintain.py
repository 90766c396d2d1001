"""tools/maintain.py: the cron-able compact + expire + orphan sweep."""

from __future__ import annotations

import datetime
import sys

from etl_documentos_spark.lake.table import LakeTable
from etl_documentos_spark.operators.merge import (
    changes_to_physical,
    physical_schema,
    read_current,
)
from etl_documentos_spark.schemas import CHANGE_EVENTS, TRANSCRIPTS

T0 = datetime.datetime(2024, 1, 1)


def test_maintain_end_to_end(spark, tmp_path, monkeypatch, capsys):
    root = str(tmp_path / "t")
    table = LakeTable.create(root, physical_schema(TRANSCRIPTS), num_buckets=2)
    # many small appends -> delta-file buildup in both buckets
    for i in range(6):
        rows = [
            ("insert" if i == 0 else "update", f"c{j}", 0, "user",
             f"c{j} v{i}", None, T0 + datetime.timedelta(seconds=100 * i + j),
             100 * i + j, 0)
            for j in range(8)
        ]
        table.append(
            changes_to_physical(
                spark.createDataFrame(rows, CHANGE_EVENTS), table.schema
            ),
            salts=1,
        )
    # plus an orphan from a crashed writer
    table.write_data_files(
        changes_to_physical(
            spark.createDataFrame(
                [("insert", "zz", 0, "user", "orphan", None, T0, 999, 0)],
                CHANGE_EVENTS,
            ),
            table.schema,
        ),
        salts=1,
    )

    want = sorted(
        tuple(r) for r in read_current(spark, table).collect()
    )

    from tools.maintain import main

    monkeypatch.setattr(
        sys, "argv",
        ["maintain.py", "--table", root, "--keep-snapshots", "2",
         "--orphan-grace-hours", "0", "--compact-at-files", "2"],
    )
    main()
    out = capsys.readouterr().out
    assert "compact_buckets" in out and "orphans_removed" in out

    table = LakeTable.load(root)
    got = sorted(tuple(r) for r in read_current(spark, table).collect())
    assert got == want
    # compaction collapsed the delta files
    files = table.current_snapshot.files
    assert all(len(fs) <= 2 for fs in files.values()), files
    # snapshots trimmed to the window
    assert len(table.snapshots) <= 2
