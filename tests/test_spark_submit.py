"""spark-submit --py-files packaging, driven for real.

The north rule requires the engine to be "packaged for spark-submit
--py-files on multi-executor clusters". This test proves it end-to-end:
build the dist zip, copy the entrypoint OUTSIDE the repo, and spark-submit
it with --py-files from a foreign cwd — so every engine import (driver AND
executors) must resolve from the zip — then assert the replayed table
equals the oracle reducer.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

from etl_documentos_spark import datagen, oracle
from etl_documentos_spark.lake.table import LakeTable
from etl_documentos_spark.operators.merge import read_current

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_replay(spark, tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_pyfiles

    zip_path = make_pyfiles.main()
    assert os.path.getsize(zip_path) > 10_000

    stream = datagen.change_stream(
        spark, n_events=4000, n_convs=60, turns_per_conv=10,
        events_per_epoch=1000,
    ).persist()
    events_path = str(tmp_path / "events")
    datagen.write_epochs(stream, events_path, files_per_epoch=4)

    # run the entrypoint from OUTSIDE the repo: its own sys.path fallback
    # then points at tmp, so engine imports must come from --py-files
    entry = str(tmp_path / "submit_replay.py")
    shutil.copy(os.path.join(REPO, "tools", "submit_replay.py"), entry)
    table_root = str(tmp_path / "table")
    env = {
        k: v for k, v in os.environ.items() if not k.startswith("PYTHONPATH")
    }
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--py-files", zip_path,
            entry,
            "--events", events_path,
            "--table", table_root,
            "--workdir", str(tmp_path / "work"),
            "--mode", "mor",
            "--num-buckets", "8",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("{")
    ][-1]
    res = json.loads(line)
    assert res["events"] == stream.count()
    assert res["skipped"] == 0

    table = LakeTable.load(table_root)
    got = [
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in read_current(spark, table)
        .orderBy("conv_id", "turn_idx")
        .collect()
    ]
    want = [
        (w["conv_id"], w["turn_idx"], w["text"])
        for w in oracle.reduce_events([r.asDict() for r in stream.collect()])
    ]
    stream.unpersist()
    assert got == want
