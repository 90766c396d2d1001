"""Training-batch assembly operators: sequence packing and quota sampling.

The last mile of a pretraining data pipeline, after dedup/quality/
decontamination: documents become fixed-capacity context windows
(sequence packing — wasted pad tokens are wasted FLOPs) and hot sources
are capped so no domain dominates the mixture (RefinedWeb/C4-style
per-domain quotas).

Reference behavior analogue: the reference batches documents for its
LLM calls one-by-one (`/root/reference/app/services/document_service.py`,
one doc == one request); these operators generalize that to corpus-scale
batch assembly.

Both operators are deterministic end-to-end — same input, same packing —
so results are reproducible and ORACLE-CHECKABLE (the greedy recurrence
re-derives in SQL with a recursive CTE; the quota rank with a window).

Scale shape:
- `pack_sequences`: packing is an inherently sequential recurrence (bin
  fill depends on every earlier doc), so the corpus is first split into
  independent PACK GROUPS by a stable hash of the doc id (16^k groups);
  each group packs in parallel with one Arrow-batched `applyInPandas`
  scan. Group count bounds the sequential span — at 10^10 docs pick
  prefix_len=4 (65,536 groups) and every group packs ~150k docs in one
  task-local numpy pass. One shuffle total.
- `quota_sample`: per-key top-Q with a SKEWED key (one hot domain can be
  half the corpus). A single window over the key would funnel the hot
  domain into one task; instead rank twice — locally within
  (key, salt) shards, keep the per-shard top-Q, then globally over the
  surviving <= salts x Q rows per key. Identical result, and the heavy
  first pass is salt-parallel.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_documentos_spark.functions.text import words


def pack_sequences(
    df: DataFrame,
    capacity: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_prefix_len: int = 1,
) -> DataFrame:
    """Greedy first-fit-in-order sequence packing into token bins.

    Within each pack group (md5(id) hex prefix — 16^prefix_len groups),
    docs are taken in id order and appended to the current bin; a doc
    that would overflow ``capacity`` starts a new bin (a doc larger than
    capacity gets a bin of its own). Returns one row per doc:
    (id, n_tokens, pack_group, bin_idx, offset) where ``offset`` is the
    doc's start position inside its bin — exactly the (sequence, start)
    coordinates a training loader needs.

    Token count is the whitespace-word count of `functions.text.words`
    (swap in a BPE count upstream if needed — the packing only reads the
    integer).
    """
    rk = F.md5(F.col(id_col).cast("string"))
    sized = df.select(
        F.col(id_col).alias("_id"),
        F.size(words(text_col)).alias("n_tokens"),
        F.substring(rk, 1, group_prefix_len).alias("pack_group"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id", kind="mergesort").reset_index(drop=True)
        bins, offs = [], []
        bin_idx, fill = -1, capacity
        for n in pdf["n_tokens"]:
            n = int(n)
            # bin_idx < 0 forces bin 0 open for the FIRST doc even when
            # n == 0 (an empty/whitespace-only doc): the overflow test
            # alone would leave it at bin -1 / offset == capacity —
            # invalid loader coordinates
            if bin_idx < 0 or fill + n > capacity:
                bin_idx += 1
                fill = 0
            offs.append(fill)
            bins.append(bin_idx)
            fill += n
        pdf["bin_idx"] = pd.Series(bins, dtype="int64")
        pdf["offset"] = pd.Series(offs, dtype="int64")
        return pdf

    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(sized.schema.fields)
        + [
            T.StructField("bin_idx", T.LongType()),
            T.StructField("offset", T.LongType()),
        ]
    )
    return (
        sized.groupBy("pack_group")
        .applyInPandas(pack, out_schema)
        .withColumnRenamed("_id", id_col)
    )


def quota_sample(
    df: DataFrame,
    key_col: str = "source",
    quota: int = 10,
    id_col: str = "doc_id",
    salts: int = 8,
) -> DataFrame:
    """Deterministic per-key cap: keep at most ``quota`` rows per key.

    Rows are ranked by (md5(id), id) — a reproducible shuffle, so the
    kept set is a stable pseudo-random sample, not "first by insertion
    order". Two-phase ranking defuses key skew: phase 1 ranks within
    (key, salt = md5-derived shard) and keeps each shard's top-``quota``
    (map-side prune — the hot key's rows spread over ``salts`` tasks);
    phase 2 ranks the <= salts x quota survivors per key globally.
    Result is identical to a single global window, cheaper on skew.

    Returns the kept rows with ``sample_rank`` (1-based within key).
    """
    from pyspark.sql import Window

    rk = F.md5(F.col(id_col).cast("string"))
    salt = F.pmod(
        F.conv(F.substring(rk, 1, 4), 16, 10).cast("long"), F.lit(salts)
    )
    local = Window.partitionBy(key_col, "_salt").orderBy(rk, id_col)
    glob = Window.partitionBy(key_col).orderBy(rk, id_col)
    return (
        df.withColumn("_salt", salt)
        .withColumn("_lrk", F.row_number().over(local))
        .filter(F.col("_lrk") <= quota)
        .withColumn("sample_rank", F.row_number().over(glob))
        .filter(F.col("sample_rank") <= quota)
        .drop("_salt", "_lrk")
    )


def pack_loader_batches(
    packed: DataFrame, capacity: int = 512
) -> DataFrame:
    """Bin-level rollup of `pack_sequences` output: one row per
    (pack_group, bin_idx) with doc count, used tokens and pad waste —
    the packing-efficiency report a pipeline owner actually reads."""
    return (
        packed.groupBy("pack_group", "bin_idx")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("used_tokens"),
        )
        .withColumn(
            "pad_tokens",
            F.greatest(
                F.lit(0), F.lit(capacity) - F.col("used_tokens")
            ).cast("long"),
        )
    )
