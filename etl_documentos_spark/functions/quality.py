"""Document-quality rule filters for training-data pipelines.

Pure column expressions (whole-stage codegen, zero UDF) implementing the
published Gopher quality-filtering defaults (Rae et al. 2021,
arXiv:2112.11446 — public paper). Kept separate from `functions.text`
(the reference-parity text toolkit) so the rule set can grow without
touching the tokenizer layer.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from etl_documentos_spark.functions.text import STOPWORDS_EN, words


def gopher_flags(col: Column | str) -> list[Column]:
    """Gopher-style quality-rule flags (Rae et al. 2021, §A1.1 "quality
    filtering" — public paper, arXiv:2112.11446), each as a boolean
    column plus the conjunction, all pure column arithmetic (whole-stage
    codegen, no UDF):

    - ``ok_n_words``      50 <= word count <= 100,000
    - ``ok_mean_wlen``    3 <= mean word length <= 10
    - ``ok_symbol``       (# + ellipsis) to word ratio <= 0.1
    - ``ok_stopwords``    >= 2 distinct common-stopword hits
    - ``gopher_pass``     all of the above

    Thresholds are the paper's published defaults; callers tune them by
    composing their own conjunction from the individual flags. Returned
    ratios are rounded to 6 decimals so a SQL oracle reproduces the
    boundary decisions bit-for-bit."""
    c = F.col(col) if isinstance(col, str) else col
    ws = words(c)
    n_words = F.size(ws).cast("double")
    sum_wlen = F.aggregate(
        ws, F.lit(0.0), lambda acc, w: acc + F.length(w).cast("double")
    )
    mean_wlen = F.round(
        F.when(n_words > 0, sum_wlen / n_words).otherwise(0.0), 6
    )
    n_symbols = (
        F.length(c) - F.length(F.regexp_replace(c, "#", ""))
        + (
            F.length(c) - F.length(F.regexp_replace(c, r"\.\.\.", ""))
        ) / F.lit(3)
    ).cast("double")
    symbol_ratio = F.round(
        F.when(n_words > 0, n_symbols / n_words).otherwise(0.0), 6
    )
    n_stop_distinct = F.size(
        F.array_distinct(F.filter(ws, lambda w: w.isin(STOPWORDS_EN)))
    )
    ok_n_words = (n_words >= 50) & (n_words <= 100_000)
    ok_mean_wlen = (mean_wlen >= 3.0) & (mean_wlen <= 10.0)
    ok_symbol = symbol_ratio <= 0.1
    ok_stopwords = n_stop_distinct >= 2
    return [
        n_words.cast("long").alias("n_words"),
        mean_wlen.alias("mean_wlen"),
        symbol_ratio.alias("symbol_ratio"),
        n_stop_distinct.alias("n_stop_distinct"),
        ok_n_words.alias("ok_n_words"),
        ok_mean_wlen.alias("ok_mean_wlen"),
        ok_symbol.alias("ok_symbol"),
        ok_stopwords.alias("ok_stopwords"),
        (ok_n_words & ok_mean_wlen & ok_symbol & ok_stopwords).alias(
            "gopher_pass"
        ),
    ]

def repetition_stats(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
):
    """Gopher-style intra-document repetition filters (arXiv:2112.11446
    §A1.1): a document that keeps repeating itself is low-quality even
    when every individual line looks fine.

    Per document:

    - ``dup_line_frac``   fraction of line occurrences that are repeats
      of an earlier identical line in the SAME document (paper gate:
      <= 0.30)
    - ``top_bigram``, ``top_bigram_frac``   the most frequent word
      2-gram and the fraction of all bigram occurrences it claims
      (paper gate: <= 0.18); ties break on the lexicographically
      smallest bigram so the result is deterministic cross-engine
    - the two boolean gates plus their conjunction ``repetition_pass``

    Plan shape: both statistics aggregate keyed by the document id (one
    explode + two groupBys, map-side combine on each) — per-doc state
    never leaves its partition chain, no pairwise product, scales with
    corpus size not vocabulary. Fractions round to 6 decimals for exact
    oracle comparison."""
    ws = words(F.col(text_col))
    lines_arr = F.filter(
        F.transform(
            F.split(F.col(text_col), sep), lambda x: F.trim(x)
        ),
        lambda x: F.length(x) >= 1,
    )
    n_lines = F.size(lines_arr)
    dup_line_frac = F.round(
        F.when(
            n_lines > 0,
            (n_lines - F.size(F.array_distinct(lines_arr)))
            .cast("double") / n_lines,
        ).otherwise(0.0),
        6,
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        n_lines.alias("n_lines"),
        dup_line_frac.alias("dup_line_frac"),
        ws.alias("_ws"),
    )
    bigrams = base.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("_ws") >= 2,
                F.zip_with(
                    F.slice("_ws", 1, F.size("_ws") - 1),
                    F.slice("_ws", 2, F.size("_ws") - 1),
                    lambda a, b: F.concat_ws(" ", a, b),
                ),
            ).otherwise(F.array())
        ).alias("bigram"),
    )
    per_bigram = bigrams.groupBy("doc_id", "bigram").agg(
        F.count("*").alias("n")
    )
    top = per_bigram.groupBy("doc_id").agg(
        F.sum("n").alias("n_bigrams"),
        F.min_by(
            "bigram", F.struct((-F.col("n")).alias("neg"), F.col("bigram"))
        ).alias("top_bigram"),
        F.max("n").alias("top_n"),
    )
    out = base.drop("_ws").join(top, "doc_id", "left")
    top_frac = F.round(
        F.when(
            F.col("n_bigrams") > 0,
            F.col("top_n").cast("double") / F.col("n_bigrams"),
        ).otherwise(0.0),
        6,
    )
    ok_dup = F.col("dup_line_frac") <= 0.30
    ok_big = top_frac <= 0.18
    return out.select(
        "doc_id",
        "n_lines",
        "dup_line_frac",
        F.coalesce(F.col("top_bigram"), F.lit("")).alias("top_bigram"),
        top_frac.alias("top_bigram_frac"),
        ok_dup.alias("ok_dup_lines"),
        ok_big.alias("ok_top_bigram"),
        (ok_dup & ok_big).alias("repetition_pass"),
    )


def unigram_lm_score(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_vocab: int = 500,
    alpha: float = 0.5,
):
    """Corpus-trained unigram-LM quality score per document — the shape of
    CCNet's LM-perplexity filter (Wenzek et al. 2019, arXiv:1911.00359 —
    public paper), with the KenLM stage replaced by a unigram model the
    engine trains on the corpus itself in one aggregation.

    Two passes, both scale-correct:

    1. **Train**: token counts over the corpus (explode -> groupBy token,
       map-side combine), keep the TOP ``k_vocab`` tokens (count DESC,
       token ASC tie-break — deterministic cutoff); everything else is
       out-of-vocabulary. The vocab is k-bounded, so at 100 TB it is a
       BROADCAST table no matter the corpus size.
    2. **Score**: explode each doc's tokens, broadcast-join the vocab,
       per-token log10 p(tok) = log10(count / total) for hits and the
       smoothed floor log10(alpha / total) for OOV, then mean per doc.

    Returns (id, n_tokens, mean_logp): higher mean_logp = more typical
    of the corpus (boilerplate scores high, lorem-ipsum noise low) — the
    filter is two-sided in CCNet, cut-offs are the caller's.
    """
    from pyspark.sql import DataFrame  # local: keep module import surface

    assert isinstance(df, DataFrame)
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(words(text_col)).alias("tok"),
    )
    # the train aggregation runs ONCE: counts is persisted across the
    # two driver actions (total, top-k), and the k-bounded vocab is
    # materialized driver-side so the returned plan carries no lazy
    # dependency on counts — without this, the total action, the vocab
    # subplan, and the scoring join would each re-run the full corpus
    # explode+groupBy (three scans for an advertised two-pass operator)
    counts = toks.groupBy("tok").agg(F.count("*").alias("cnt")).persist()
    try:
        total = counts.agg(F.sum("cnt")).first()[0] or 1
        top = (
            counts.orderBy(F.col("cnt").desc(), F.col("tok").asc())
            .limit(int(k_vocab))
            .collect()
        )
    finally:
        counts.unpersist()
    vocab = df.sparkSession.createDataFrame(
        [(r["tok"], math.log10(r["cnt"] / float(total))) for r in top],
        "tok string, logp double",
    )
    floor = F.lit(math.log10(alpha / float(total)))
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .withColumn("logp", F.coalesce(F.col("logp"), floor))
        .groupBy("_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg("logp").alias("mean_logp"),
        )
        .withColumnRenamed("_id", id_col)
    )
