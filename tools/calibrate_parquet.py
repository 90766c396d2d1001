"""Parquet-throughput hardware calibration (no Spark, no JVM).

N pinned single-core processes each stream parquet files through a full
pyarrow decode + snappy re-encode loop over a multi-gigabyte working set
(files shuffled per process so nothing stays LLC-resident). This is the
pure-C++ upper bound for any engine whose inner loop is "decode parquet,
transform, encode parquet" at this data volume on this host — the scaling
ladder in BENCH/BASELINE.md grades the engine's N->4N pairs against it.

Usage: python tools/calibrate_parquet.py <parquet_glob> [levels] [secs]
Prints one JSON line {"levels": {...}, "pairs": {...}}.
"""

from __future__ import annotations

import glob
import json
import subprocess
import sys

CODE = """
import pyarrow.parquet as pq, time, io, random, sys
files = {files!r}
random.seed({seed})
random.shuffle(files)
t = time.time() + {secs}; n = 0
for f in files:
    tbl = pq.read_table(f)
    buf = io.BytesIO()
    pq.write_table(tbl, buf, compression="snappy")
    n += tbl.num_rows
    if time.time() > t:
        break
print(n)
"""


def run_level(files: list[str], nproc: int, secs: int) -> int:
    ps = [
        subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, "-c",
             CODE.format(files=files, seed=i, secs=secs)],
            stdout=subprocess.PIPE,
        )
        for i in range(nproc)
    ]
    return sum(int(p.communicate()[0]) for p in ps)


def main() -> None:
    files = sorted(glob.glob(sys.argv[1]))
    if not files:
        raise SystemExit(f"no files match {sys.argv[1]}")
    levels = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [1, 4, 16]
    )
    secs = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    res = {n: run_level(files, n, secs) for n in levels}
    pairs = {
        f"{a}->{a * 4}": round(res[a * 4] / res[a] / 4, 3)
        for a in levels
        if a * 4 in res
    }
    print(json.dumps({"levels": res, "pairs": pairs}))


if __name__ == "__main__":
    main()
