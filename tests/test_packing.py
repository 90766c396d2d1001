"""Sequence packing and quota sampling invariants."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_documentos_spark.operators.packing import (
    pack_loader_batches,
    pack_sequences,
    quota_sample,
)

CAP = 20


def _docs(spark, sizes):
    rows = [
        (f"d{i:04d}", " ".join(["w"] * n)) for i, n in enumerate(sizes)
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_pack_invariants(spark):
    rng = random.Random(3)
    sizes = [rng.randrange(1, 15) for _ in range(120)] + [35, 0, 35]
    out = pack_sequences(
        _docs(spark, sizes), capacity=CAP, group_prefix_len=1
    ).collect()
    assert len(out) == len(sizes)
    by_group: dict[str, list] = {}
    for r in out:
        by_group.setdefault(r["pack_group"], []).append(r)
    for rows in by_group.values():
        rows.sort(key=lambda r: r["doc_id"])
        bin_idx, fill = -1, CAP
        for r in rows:
            n = r["n_tokens"]
            if fill + n > CAP:
                bin_idx, fill = bin_idx + 1, 0
            # greedy recurrence reproduced exactly
            assert (r["bin_idx"], r["offset"]) == (bin_idx, fill), r
            fill += n
        # no bin except oversize singletons exceeds capacity
        per_bin: dict[int, int] = {}
        for r in rows:
            per_bin[r["bin_idx"]] = per_bin.get(r["bin_idx"], 0) + r["n_tokens"]
        for b, used in per_bin.items():
            members = [r for r in rows if r["bin_idx"] == b]
            assert used <= CAP or len(members) == 1, (b, used, members)


def test_pack_loader_rollup(spark):
    packed = pack_sequences(
        _docs(spark, [5, 5, 5, 5, 18]), capacity=CAP, group_prefix_len=1
    )
    roll = pack_loader_batches(packed, capacity=CAP)
    rows = roll.collect()
    assert sum(r["n_docs"] for r in rows) == 5
    assert all(
        r["pad_tokens"] == max(0, CAP - r["used_tokens"]) for r in rows
    )


def test_quota_sample_matches_single_window(spark):
    rows = [(f"d{i}", f"s{i % 3}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    got = {
        (r["doc_id"], r["sample_rank"])
        for r in quota_sample(
            df, key_col="source", quota=7, salts=4
        ).select("doc_id", "sample_rank").collect()
    }
    rk = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(rk, "doc_id")
    want = {
        (r["doc_id"], r["sample_rank"])
        for r in df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= 7)
        .collect()
    }
    assert got == want
    assert len(got) == 21


def test_quota_sample_hot_key(spark):
    # one source holds 90% of rows; result is still exactly quota per key
    rows = [(f"d{i}", "hot" if i % 10 else "cold") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    out = quota_sample(df, key_col="source", quota=5, salts=8)
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"hot": 5, "cold": 5}
