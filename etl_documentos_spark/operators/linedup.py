"""Corpus-level line deduplication (C4/CCNet-style boilerplate removal).

A line that appears in many DISTINCT documents is template, not content
(nav bars, cookie banners, license footers). This lifts the reference's
per-document template stripping (quality-gate normalization,
/root/reference/app/services/document_service.py) to corpus-level
statistics, which only a distributed engine can afford.

Kept separate from `operators.dedup` (document-level dedup family) on
purpose: that module's operators are line-agnostic; these are the
line-granularity corpus pass a training-data pipeline runs first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_chars: int = 1,
) -> DataFrame:
    """One row per (doc, position, line): the shared first stage of
    corpus-level line analysis. Lines are trimmed; lines shorter than
    ``min_chars`` after trimming are dropped (they are separators, not
    content). Narrow transform — no shuffle."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.col(text_col), sep)).alias(
                "pos", "line_raw"
            ),
        )
        .withColumn("line", F.trim("line_raw"))
        .where(F.length("line") >= min_chars)
        .select("doc_id", "pos", "line")
    )


def boilerplate_lines(
    lines: DataFrame, min_docs: int = 3
) -> DataFrame:
    """Lines appearing in >= ``min_docs`` DISTINCT documents — the
    C4/CCNet-style corpus-level boilerplate set (nav bars, cookie
    banners, license footers: content that repeats across documents is
    template, not text). One shuffle: groupBy(line) with map-side
    partial aggregation; count(DISTINCT doc) stays scalable because the
    grouping key is the line itself, so the distinct is per-group.

    At 10^10+ docs the returned set is corpus-diversity-bounded (only
    lines crossing the threshold survive), which is what makes the
    strip stage's broadcast join viable."""
    return (
        lines.groupBy("line")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def strip_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_docs: int = 3,
    min_chars: int = 1,
) -> DataFrame:
    """C4-style boilerplate removal: drop every line that appears in
    >= ``min_docs`` distinct documents, reassemble the survivors in
    original order. Returns one row per input doc:
    ``(doc_id, n_lines, n_dropped, text_clean)``.

    Plan shape for 100 TB: stage 1 is the one-shuffle boilerplate
    aggregation above; stage 2 re-explodes the corpus, LEFT ANTI joins
    against the (small, diversity-bounded) boilerplate set — Catalyst
    broadcasts it under AQE — and regroups by doc id to reassemble.
    Text bytes shuffle once (the regroup); the join side that grows
    with the corpus never materializes a pairwise product.

    Reference analogue: the reference strips repeated template blocks
    during extraction (quality-gate normalization,
    ``/root/reference/app/services/document_service.py``) per document;
    this lifts the idea to corpus-level statistics, which only a
    distributed engine can afford."""
    lines = explode_lines(df, text_col, id_col, sep, min_chars)
    boiler = boilerplate_lines(lines, min_docs).select("line")
    kept = lines.join(F.broadcast(boiler), "line", "left_anti")
    # anchor the doc universe on the INPUT, not the exploded lines: a
    # doc whose text yields zero qualifying lines (empty, whitespace,
    # all under min_chars) must still surface as (n_lines=0, ''), not
    # silently vanish from the output
    per_doc_total = (
        df.select(F.col(id_col).alias("doc_id"))
        .distinct()
        .join(
            lines.groupBy("doc_id").agg(F.count("*").alias("n_lines")),
            "doc_id",
            "left",
        )
        .select(
            "doc_id", F.coalesce("n_lines", F.lit(0)).alias("n_lines")
        )
    )
    reassembled = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(
            sep, F.transform(F.array_sort(
                F.collect_list(F.struct("pos", "line"))
            ), lambda s: s["line"])
        ).alias("text_clean"),
    )
    return (
        per_doc_total.join(reassembled, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .alias("n_dropped"),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        )
    )
