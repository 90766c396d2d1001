"""End-to-end training-data pipeline demo: the composition a user runs.

One script exercising the library exactly as a training-data team would,
through the public API only — no registry, no test harness:

  CDC side (transcripts)
    1. generate a binlog-style change stream (deletes, dups, late events,
       hot-conversation skew) and bulk-replay it into a fresh lake table
       with per-epoch exactly-once commits;
    2. read the replayed state and mine (prompt, response) SFT pairs plus
       the context-budget truncation a chat exporter applies.

  Corpus side (documents)
    3. gate the corpus on the Gopher quality rules;
    4. find near-dup clusters (MinHash-LSH pairs -> connected
       components) and keep one canonical doc per cluster;
    5. split train/val/test by CLUSTER (near-dups can never straddle);
    6. mix sources to target shares with the deterministic interleave;
    7. pack the train split into fixed token bins for the loader.

Every stage is the same operator the driver rows value-check; this file
just composes them. Prints ONE JSON summary line.

Usage: python tools/pipeline_demo.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from etl_documentos_spark import datagen
    from etl_documentos_spark.functions.quality import gopher_flags
    from etl_documentos_spark.functions.text import token_count
    from etl_documentos_spark.lake.table import LakeTable
    from etl_documentos_spark.operators.components import dedup_components
    from etl_documentos_spark.operators.dedup import minhash_lsh_pairs
    from etl_documentos_spark.operators.merge import (
        physical_schema,
        read_current,
    )
    from etl_documentos_spark.operators.mixing import (
        share_weights,
        weighted_interleave,
    )
    from etl_documentos_spark.operators.packing import pack_sequences
    from etl_documentos_spark.operators.pairs import (
        fit_context_window,
        turn_pairs,
    )
    from etl_documentos_spark.operators.split import assign_split
    from etl_documentos_spark.schemas import TRANSCRIPTS
    from etl_documentos_spark.session import get_spark
    from etl_documentos_spark.streaming.apply import CdcPipeline

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("pipeline-demo", master="local[8]", shuffle_partitions=8)
    base = tempfile.mkdtemp(prefix="pipeline_demo_")
    summary: dict = {}

    try:
        # -- 1. CDC bulk replay into a fresh lake table ------------------
        changes = datagen.change_stream(
            spark, n_events=20_000, events_per_epoch=2000
        )
        root = os.path.join(base, "table")
        LakeTable.create(root, physical_schema(TRANSCRIPTS), num_buckets=8)
        pipe = CdcPipeline(spark, root, os.path.join(base, "cdc"))
        epochs = sorted(
            r["epoch"] for r in changes.select("epoch").distinct().collect()
        )
        results = pipe.apply_epochs_bulk(changes, epochs)
        summary["epochs_applied"] = len([r for r in results if not r.skipped])
        summary["events_applied"] = sum(r.events for r in results)

        # -- 2. SFT pairs + context truncation off the replayed state ----
        state = read_current(spark, pipe.table)
        pairs = turn_pairs(
            state, prompt_role="user", response_role="assistant"
        )
        summary["sft_pairs"] = pairs.count()
        fitted = fit_context_window(state, 512, token_count("text"))
        summary["turns_in_context_budget"] = fitted.count()

        # -- 3. Gopher quality gate --------------------------------------
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        flags = gopher_flags("text")
        gated = docs.select("*", flags[-1].alias("gopher_pass"))
        clean = gated.filter("gopher_pass").drop("gopher_pass")
        summary["docs_total"] = docs.count()
        summary["docs_after_quality"] = clean.count()

        # -- 4. near-dup clusters, keep one canonical per cluster --------
        lsh_pairs = minhash_lsh_pairs(
            clean, num_hashes=8, bands=4, shingle_k=3
        )
        comp = dedup_components(clean, lsh_pairs)
        canonical = clean.join(
            comp.filter("is_canonical").select("doc_id"), "doc_id"
        )
        summary["near_dup_clusters_gt1"] = comp.filter(
            "n_members > 1"
        ).select("component_id").distinct().count()
        summary["docs_after_dedup"] = canonical.count()

        # -- 5. leakage-safe split by CLUSTER ----------------------------
        with_comp = canonical.join(
            comp.select("doc_id", "component_id"), "doc_id"
        )
        split = assign_split(with_comp, "component_id", salt="demo")
        summary["split_counts"] = {
            r["split"]: r["n"]
            for r in split.groupBy("split")
            .agg(F.count("*").alias("n"))
            .collect()
        }

        # -- 6. deterministic source mixing to target shares -------------
        train = split.filter("split = 'train'")
        srcs = [r["source"] for r in train.select("source").distinct().collect()]
        if not srcs:
            # tiny/skewed inputs can gate+dedup+split down to an empty
            # train slice — report it instead of dividing by zero
            summary.update(mixed_rows=0, pack_bins=0, ok=True)
            print(json.dumps(summary))
            return
        shares = {s: 1.0 / len(srcs) for s in srcs}  # equal-share demo
        rates = share_weights(train, "source", shares)
        k = max(1, int(train.count() * 0.8))
        mixed = weighted_interleave(
            train, "source", rates, id_col="doc_id", k=k, salt="demo"
        )
        summary["mixed_rows"] = mixed.count()

        # -- 7. pack into fixed token bins for the loader ----------------
        packed = pack_sequences(mixed, capacity=512, id_col="doc_id")
        summary["pack_bins"] = (
            packed.select("pack_group", "bin_idx").distinct().count()
        )
        out = os.path.join(base, "out")
        packed.write.mode("overwrite").parquet(out)
        summary["ok"] = True
    finally:
        shutil.rmtree(base, ignore_errors=True)

    print(json.dumps(summary))


if __name__ == "__main__":
    main()
