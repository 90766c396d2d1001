"""Idempotent epoch commit log — the exactly-once guard.

Structured Streaming checkpoints give at-least-once delivery into an
arbitrary sink; this commit log upgrades the lake-table sink to exactly-once:
``foreachBatch`` consults it *before* applying and records the epoch *after*
the table snapshot commits. A replayed epoch (checkpoint restart, retried
batch) is detected and skipped, so re-application is a no-op at the log layer
and — belt and braces — also a no-op at the MERGE layer (version-checked LWW).

One JSON file per epoch, written via tmp+rename (atomic on POSIX). The epoch
record carries an order-insensitive input fingerprint (sum of per-row
xxhash64 + count — commutative, so it is stable under any partitioning /
parallelism) and the per-source-partition max offsets, mirroring FIXTURES.md
§4. Reference analogue: status-transition audit rows that make reprocessing
detectable (``/root/reference/app/core/document_tracking.py:307-317``).
"""

from __future__ import annotations

import datetime
import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_documentos_spark.schemas import EPOCH_COMMITS


@dataclass
class CommitRecord:
    epoch_id: int
    input_fingerprint: str
    source_partition_offsets: dict[int, int]
    committed_at: float


def fingerprint(changes: DataFrame) -> tuple[str, dict[int, int], int]:
    """(order-insensitive content hash, per-partition max lsn, event count).

    One aggregation job; fully partial-aggregatable, no sort, no collect of
    row data — scales to arbitrary epoch sizes.
    """
    cols = [F.col(c) for c in changes.columns]
    # decimal(38,0) sum: order-insensitive and overflow-free under ANSI mode
    row = changes.agg(
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
        F.count("*").alias("n"),
    ).first()
    offsets_rows = (
        changes.groupBy("source_partition").agg(F.max("lsn").alias("o")).collect()
    )
    offsets = {int(r["source_partition"]): int(r["o"]) for r in offsets_rows}
    fp = f"{row['h']}:{row['n']}"
    return fp, offsets, int(row["n"])


class CommitLog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, epoch_id: int) -> str:
        return os.path.join(self.root, f"commit-{epoch_id:012d}.json")

    def is_committed(self, epoch_id: int) -> bool:
        return os.path.exists(self._path(epoch_id))

    def get(self, epoch_id: int) -> CommitRecord | None:
        if not self.is_committed(epoch_id):
            return None
        with open(self._path(epoch_id)) as f:
            d = json.load(f)
        return CommitRecord(
            d["epoch_id"],
            d["input_fingerprint"],
            {int(k): v for k, v in d["source_partition_offsets"].items()},
            d["committed_at"],
        )

    def commit(
        self,
        epoch_id: int,
        input_fingerprint: str,
        offsets: dict[int, int],
    ) -> None:
        rec = {
            "epoch_id": epoch_id,
            "input_fingerprint": input_fingerprint,
            "source_partition_offsets": offsets,
            "committed_at": time.time(),
        }
        tmp = self._path(epoch_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, self._path(epoch_id))

    def max_offsets(self) -> dict[int, int]:
        """High-water mark per source partition across all committed epochs."""
        out: dict[int, int] = {}
        for fn in os.listdir(self.root):
            if not (fn.startswith("commit-") and fn.endswith(".json")):
                continue
            with open(os.path.join(self.root, fn)) as f:
                d = json.load(f)
            for k, v in d["source_partition_offsets"].items():
                k = int(k)
                out[k] = max(out.get(k, -1), v)
        return out

    def as_dataframe(self, spark: SparkSession) -> DataFrame:
        """The commit log as a queryable DataFrame (FIXTURES.md §4 shape)."""
        rows = []
        for fn in sorted(os.listdir(self.root)):
            if fn.startswith("commit-") and fn.endswith(".json"):
                with open(os.path.join(self.root, fn)) as f:
                    d = json.load(f)
                rows.append(
                    (
                        d["epoch_id"],
                        d["input_fingerprint"],
                        {int(k): v for k, v in d["source_partition_offsets"].items()},
                        datetime.datetime.utcfromtimestamp(d["committed_at"]),
                    )
                )
        return spark.createDataFrame(rows, EPOCH_COMMITS)
