"""Benchmark decontamination: n-gram overlap against an evaluation set.

Before a corpus trains anything, every document sharing a long-enough
word n-gram with a benchmark/eval document must be found (and usually
dropped): eval contamination silently inflates downstream scores. This
is the standard n-gram-overlap decontamination pass (GPT-3 appendix C /
PaLM-style, public methodology): exact overlap on fixed-length lowercase
word n-grams.

Scale shape: the EVAL side is small by nature (benchmarks are thousands
of docs, the corpus is billions), so its distinct n-gram set broadcasts;
the corpus side explodes n-grams map-locally and hits the broadcast hash
join without shuffling text bytes — the only shuffle is the doc-keyed
hit-count aggregation, and clean docs rejoin via the id-only frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_documentos_spark.functions.text import words


def _ngrams(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(doc_id, gram) — one row per position; map-only (no shuffle)."""
    ws = words(F.col(text_col))
    grams = F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - (n - 1)),
            lambda i: F.array_join(F.slice(ws, i, n), " "),
        ),
    ).otherwise(F.array())
    return df.select(
        F.col(id_col).alias("doc_id"), F.explode(grams).alias("gram")
    )


def ngram_contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    threshold: int = 1,
) -> DataFrame:
    """Flag every corpus document sharing >= ``threshold`` distinct word
    ``n``-grams with ANY eval document. Returns one row per corpus doc:
    ``(doc_id, n_eval_hits, contaminated)`` — clean docs included with a
    zero count, so the result is a drop-in filter/join source.

    ``n=8`` is the conservative public default for natural text; small
    synthetic or low-vocabulary corpora need a smaller ``n`` to be
    meaningful (the driver row uses 4 on the test corpus and says why).
    """
    ev = F.broadcast(
        _ngrams(eval_df, text_col, id_col, n).select("gram").distinct()
    )
    hits = (
        _ngrams(corpus, text_col, id_col, n)
        .join(ev, "gram")  # broadcast hash join: corpus text never shuffles
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_eval_hits"))
    )
    ids = corpus.select(F.col(id_col).alias("doc_id"))
    return ids.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_eval_hits"), F.lit(0)).alias("n_eval_hits"),
        (F.coalesce(F.col("n_eval_hits"), F.lit(0)) >= threshold).alias(
            "contaminated"
        ),
    )
