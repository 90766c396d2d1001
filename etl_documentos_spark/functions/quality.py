"""Document-quality rule filters for training-data pipelines.

Pure column expressions (whole-stage codegen, zero UDF) implementing the
published Gopher quality-filtering defaults (Rae et al. 2021,
arXiv:2112.11446 — public paper). Kept separate from `functions.text`
(the reference-parity text toolkit) so the rule set can grow without
touching the tokenizer layer.
"""

from __future__ import annotations

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
