"""SparkSession factory tuned for the CDC replay workload.

Local-mode defaults follow the public Spark tuning guidance: shuffle
partitions ~ cores (not 200), AQE on (runtime coalesce + skew-join),
Arrow on for the few pandas UDFs, UTC session timezone so results are
comparable with the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl_documentos_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (32 in the sandbox).
    On a real cluster the same config block applies unchanged — AQE and the
    shuffle-partition setting are the knobs that matter at 100 TB too, except
    ``shuffle.partitions`` which should scale with executor count (AQE
    coalesces the excess at runtime, so we set a generous ceiling).
    """
    # python workers resolve module-level UDFs by importing the package;
    # exporting the package parent on PYTHONPATH (before the JVM spawns
    # workers) makes that work from any driver cwd. On a cluster,
    # ``spark-submit --py-files dist/etl_documentos_spark.zip`` is the
    # equivalent (tools/make_pyfiles.py).
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_parent + (os.pathsep + pp if pp else "")
        )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # parse local[N] to size the shuffle; on a cluster pass explicitly
        try:
            n = master.split("[", 1)[1].rstrip("]")
            shuffle_partitions = cpus if n == "*" else int(n)
        except (IndexError, ValueError):
            shuffle_partitions = 2 * cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # split scans finer than the 128 MB default: a binlog tail arrives
        # as many small shard files, and the default packing collapses a
        # multi-GB replay input into fewer splits than cores (observed: 9
        # partitions for a 12.6M-event input = a one-straggler-wave scan at
        # any parallelism). 16 MB targets + 1 MB open cost keep scan task
        # count >= cores at bench scale; on a 100 TB cluster the default
        # would already yield thousands of splits, so this only matters for
        # many-small-files inputs there too (same knob, same reason).
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # larger Arrow batches for mapInArrow: the direct writer pays a
        # fixed per-batch cost (IPC framing + 1 filter per bucket present);
        # 10k-row default batches make that cost ~6x the necessary rate
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # INT64 micros, not the legacy INT96: INT96 timestamps carry NO
        # parquet column statistics, which silently disables manifest
        # min/max collection (stats.cols) and file skipping on ts — and
        # z-order clustering on a time dimension prunes nothing without
        # them. INT64 is also what Iceberg/Delta require.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
