"""Host CPU-scaling calibration for the bench ladder.

Runs N independent busy-loop processes (pure user-space arithmetic, no I/O,
no shared state) and reports aggregate iteration throughput plus /proc/stat
deltas. This measures the *hardware* scaling ceiling of the sandbox —
SMT sibling contention and co-tenant steal — independent of Spark. The
scaling bench cites this: a parallelism pair whose raw-arithmetic efficiency
is below the target cannot evidence engine scaling at that pair.

Usage: python tools/calibrate_cpu.py [levels] [secs]
Prints one JSON line: {"levels": {...}, "pairs": {...}}
"""

from __future__ import annotations

import json
import subprocess
import sys
import time


def _stat() -> list[int]:
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:9]))


def busy_test(nproc: int, secs: int, ncpu: int) -> dict:
    code = (
        f"import time;t=time.time()+{secs};n=0\n"
        "while time.time()<t: n+=1\n"
        "print(n)"
    )
    s0, t0 = _stat(), time.time()
    ps = [
        subprocess.Popen(
            [sys.executable, "-c", code], stdout=subprocess.PIPE
        )
        for _ in range(nproc)
    ]
    outs = [int(p.communicate()[0]) for p in ps]
    s1, dt = _stat(), time.time() - t0
    d = [b - a for a, b in zip(s0, s1)]
    total = ncpu * dt * 100
    return {
        "n": nproc,
        "aggregate_iters": sum(outs),
        "min_proc_iters": min(outs),
        "user_frac": round(d[0] / total, 3),
        "idle_frac": round(d[3] / total, 3),
        "steal_frac": round(d[7] / total, 3),
    }


def main() -> None:
    levels = (
        [int(x) for x in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [1, 2, 4, 8, 16, 32]
    )
    secs = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    ncpu = int(subprocess.check_output(["nproc"]).strip())
    res = {n: busy_test(n, secs, ncpu) for n in levels}
    pairs = {}
    for a in levels:
        b = a * 4
        if b in res:
            ratio = res[b]["aggregate_iters"] / res[a]["aggregate_iters"]
            pairs[f"{a}->{b}"] = round(ratio / 4, 3)
    print(json.dumps({"ncpu": ncpu, "levels": res, "pairs": pairs}))


if __name__ == "__main__":
    main()
