"""Distributed BPE tokenizer training: pair statistics + iterative merges.

A training-data pipeline that tokenizes 100 TB of text needs the tokenizer
itself trained on (a sample of) that corpus.  Byte-pair encoding's inner
loop is "count adjacent symbol pairs, merge the most frequent" — the count
is a textbook map-side-combinable aggregation, and the merge is a pure
per-row array rewrite, so the whole algorithm distributes without any
driver-side text.

Two entry points:

- ``pair_counts``: one pass — corpus word frequencies (the Zipf-bounded
  distinct-word table, NOT the raw token stream), then adjacent character
  pairs per word weighted by word frequency.  Everything stays in
  whole-stage codegen (``split`` / ``transform`` / ``explode`` /
  hash-aggregate); no Python, no sort.
- ``bpe_train``: the full iterative loop.  Each round aggregates pair
  counts over the current symbolization (map-side partial agg), collects
  exactly ONE row (the argmax pair — the only driver traffic), and applies
  the merge with a left-to-right ``aggregate`` fold over each word's symbol
  array.  The fold reproduces greedy BPE scan order: ``aaa`` under merge
  (a,a) becomes ``[aa, a]``, ``abab`` under (a,b) becomes ``[ab, ab]``.

Scale notes: the working set after the first ``groupBy(word)`` is the
distinct-word table — bounded by vocabulary (10^7-ish), not corpus size, so
the per-iteration shuffle is tiny relative to the 100 TB scan that produced
it.  The word table is cached once; each iteration adds one narrow
projection, and lineage is truncated with ``localCheckpoint`` every few
rounds so the plan doesn't grow linearly with merges.

Reference semantics analogue: the reference counts token frequencies for
its keyword classifier (``/root/reference/app/utils/text_utils.py:216-275``);
BPE extends the same weighted-count reduction to subword units.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_documentos_spark.functions.text import words

#: truncate the iterative plan's lineage every this many merges
_CHECKPOINT_EVERY = 4


def _word_freq(df: DataFrame, text_col: str, min_len: int) -> DataFrame:
    """Corpus -> (word, freq) over the canonical tokenizer (text.words)."""
    return (
        df.select(F.explode(words(F.col(text_col))).alias("word"))
        .filter(F.length("word") >= min_len)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def pair_counts(
    df: DataFrame, text_col: str = "text", min_len: int = 2, k: int = 20
) -> DataFrame:
    """Top-k adjacent character pairs, weighted by word frequency.

    This is BPE merge-step 0 as a standalone statistic: the pair the first
    merge would pick is row 1.  Deterministic under count ties (pair
    lexicographic ascending breaks them), so top-k is a stable set.
    Output: ``(pair string, cnt long)``.
    """
    wf = _word_freq(df, text_col, min_len)
    # guard: sequence(1, 0) is descending [1, 0] in Spark, not empty
    pairs = wf.select(
        F.explode(
            F.expr(
                "CASE WHEN length(word) >= 2 THEN "
                "transform(sequence(1, length(word) - 1), "
                "i -> substring(word, i, 2)) ELSE array() END"
            )
        ).alias("pair"),
        F.col("freq"),
    )
    counts = pairs.groupBy("pair").agg(F.sum("freq").alias("cnt"))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cnt").desc(), F.col("pair").asc())
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def _merge_once(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right application of merge rule (a, b) to a symbol
    array, as a codegen'd fold: append each symbol unless the accumulator
    tail is ``a`` and the symbol is ``b``, in which case replace the tail
    with the merged token."""
    a_lit, b_lit = F.lit(a), F.lit(b)
    merged = F.lit(a + b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == a_lit)
            & (s == b_lit),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    min_len: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merge rules over the corpus.

    Returns the ordered merge table ``[(left, right, weighted_count), ...]``
    — the only data that ever reaches the driver (one row per merge).
    """
    spark = df.sparkSession
    wf = _word_freq(df, text_col, min_len)
    symbolized = wf.select(
        F.expr(
            "transform(sequence(1, length(word)), "
            "i -> substring(word, i, 1))"
        ).alias("syms"),
        "freq",
    ).cache()
    symbolized.count()  # materialize once; iterations rewrite this table

    merges: list[tuple[str, str, int]] = []
    current = symbolized
    try:
        for step in range(n_merges):
            # sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty —
            # fully-merged one-symbol words need the explicit guard
            pairs = current.select(
                F.posexplode(
                    F.expr(
                        "CASE WHEN size(syms) >= 2 THEN "
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(element_at(syms, i) AS l, "
                        "element_at(syms, i + 1) AS r)) "
                        "ELSE array() END"
                    )
                ).alias("_pos", "p"),
                "freq",
            )
            top = (
                pairs.groupBy("p.l", "p.r")
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.col("cnt").desc(), F.col("l"), F.col("r"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            a, b, cnt = top[0]["l"], top[0]["r"], top[0]["cnt"]
            merges.append((a, b, int(cnt)))
            current = current.select(
                _merge_once(F.col("syms"), a, b).alias("syms"), "freq"
            )
            if (step + 1) % _CHECKPOINT_EVERY == 0:
                current = current.localCheckpoint(eager=True)
    finally:
        symbolized.unpersist()
    return merges


def bpe_train_df(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    min_len: int = 2,
) -> DataFrame:
    """``bpe_train`` as a DataFrame: ``(step, left, right, cnt)``."""
    merges = bpe_train(df, text_col, n_merges, min_len)
    return df.sparkSession.createDataFrame(
        [(i + 1, a, b, c) for i, (a, b, c) in enumerate(merges)],
        "step int, left string, right string, cnt long",
    )


def bpe_encode_column(
    text: Column, merges: list[tuple[str, str]] | list[tuple[str, str, int]]
) -> Column:
    """Tokenize a text column with learned merge rules — pure codegen.

    Chains one ``_merge_once`` fold per rule in rank order over each
    word's symbol array, then flattens words back to one token array per
    row.  Plan depth grows with the rule count, so this form is for SMALL
    rule sets (pipeline feature hashing, test fixtures); real vocabularies
    go through ``bpe_encode`` below, which applies the same rules in one
    Arrow-batched pass.
    """
    def apply_rule(a: str, b: str):
        # closure factory, NOT default-arg lambdas: pyspark reads the
        # lambda's arity to bind higher-order-function variables
        return lambda ws: _merge_once(ws, a, b)

    syms = F.transform(words(text), _chars)
    for rule in merges:
        syms = F.transform(syms, apply_rule(rule[0], rule[1]))
    return F.flatten(syms)


def _chars(w: Column) -> Column:
    """Split a word into its character array (codegen; split('') leaves a
    trailing empty element under Java limit=-1 semantics — filter it)."""
    return F.filter(F.split(w, ""), lambda c: F.length(c) > 0)


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]] | list[tuple[str, str, int]],
    text_col: str = "text",
    out_col: str = "tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with learned merges — the scale path.

    In-order-pass BPE inside an Arrow-batched ``mapInPandas``: the merge
    table rides the closure (shipped once per executor, like any real
    tokenizer's vocab file); each batch loops words in plain-dict Python.
    Per-task cost is O(tokens * rules) with zero shuffle; output schema =
    input + ``out_col array<string>``.  Semantics are pinned equal to the
    codegen ``bpe_encode_column`` fold chain by
    ``tests/test_r5_closing_ops.py`` (two independent implementations).
    """
    import pandas as pd  # noqa: F401  (mapInPandas contract)

    from pyspark.sql import types as T

    rules = [(r[0], r[1]) for r in merges]

    def _encode_word(w: str) -> list[str]:
        # one greedy left-to-right pass per rule, in learned order — the
        # exact semantics of bpe_train's _merge_once fold (one pass always
        # suffices: merging (x, y) can't create a new (x, y) adjacency)
        syms = list(w)
        for a, b in rules:
            if len(syms) < 2:
                break
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    tokenized = df.withColumn("_words", words(F.col(text_col)))
    schema = T.StructType(
        tokenized.schema.fields
        + [T.StructField(out_col, T.ArrayType(T.StringType()))]
    )

    def run(batches):
        for pdf in batches:
            pdf[out_col] = pdf["_words"].map(
                lambda ws: [
                    t for w in (ws if ws is not None else []) for t in _encode_word(w)
                ]
            )
            yield pdf

    return tokenized.mapInPandas(run, schema).drop("_words")
