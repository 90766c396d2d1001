"""Dashboard / reporting aggregations (SURVEY.md §2.4-§2.6, §3.2-§3.3).

Set-oriented restatements of the reference's analytics endpoints — each
function is a reusable DataFrame transform parameterized by column names, so
the same operator serves the engine's metrics/lineage tables and any fact
table. All are single groupBy passes (partial-agg friendly) or window +
filter (top-N per key) — the shapes Catalyst compiles to hash aggregates and
TakeOrdered, no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conditional_counts(
    df: DataFrame, flag_col: str, success_val: str, error_val: str
) -> DataFrame:
    """total / success / error counts in one pass — the dashboard's three
    filtered count(*) queries (analytics_service.py:38-53) fused into one
    conditional aggregation."""
    return df.agg(
        F.count("*").alias("total"),
        F.sum(F.when(F.col(flag_col) == success_val, 1).otherwise(0)).alias("n_success"),
        F.sum(F.when(F.col(flag_col) == error_val, 1).otherwise(0)).alias("n_error"),
    )


def group_report(
    df: DataFrame, key: str, value_col: str
) -> DataFrame:
    """count/sum/avg/min/max per key — the usage-report multi-agg
    (client_management_service.py:249-273, repositories.py:297-301)."""
    return df.groupBy(key).agg(
        F.count("*").alias("n"),
        F.round(F.sum(value_col), 4).alias("total_value"),
        F.round(F.avg(value_col), 4).alias("avg_value"),
        F.round(F.min(value_col), 4).alias("min_value"),
        F.round(F.max(value_col), 4).alias("max_value"),
    )


def top_k(df: DataFrame, key: str, k: int = 10) -> DataFrame:
    """top-k categories by count, deterministic tie-break on the key
    (analytics_service.py:69-75)."""
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col(key))
        .limit(k)
    )


def daily_series(df: DataFrame, ts_col: str, value_col: str) -> DataFrame:
    """per-day count + sum — tumbling daily window
    (analytics_service.py:264-267, 339-344, 449-451)."""
    return (
        df.groupBy(F.to_date(ts_col).alias("day"))
        .agg(F.count("*").alias("n"), F.round(F.sum(value_col), 4).alias("total_value"))
        .orderBy("day")
    )


def monthly_rollup(df: DataFrame, key: str, ts_col: str, value_col: str) -> DataFrame:
    """per-(key, YYYY-MM) usage — the monthly quota counters
    (client_management_service.py:140-175, database.py:39-40)."""
    return df.groupBy(
        F.col(key), F.date_format(ts_col, "yyyy-MM").alias("month")
    ).agg(F.count("*").alias("n"), F.round(F.sum(value_col), 4).alias("total_value"))


def value_stats(df: DataFrame, key: str, value_col: str) -> DataFrame:
    """min/max/avg/median per key (calc_stats, analytics_service.py:394-403).
    Exact median — at extreme scale swap for percentile_approx."""
    return df.groupBy(key).agg(
        F.round(F.min(value_col), 4).alias("min_v"),
        F.round(F.max(value_col), 4).alias("max_v"),
        F.round(F.avg(value_col), 4).alias("avg_v"),
        F.round(F.expr(f"median({value_col})"), 4).alias("median_v"),
    )


def top_n_per_key(
    df: DataFrame, key: str, order_col: str, tiebreak: str, n: int = 3
) -> DataFrame:
    """N most-recent rows per entity — W1 (repositories.py:128-132,
    191-201)."""
    w = Window.partitionBy(key).orderBy(
        F.col(order_col).desc(), F.col(tiebreak).desc()
    )
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .drop("rn")
    )


def weighted_argmax(
    df: DataFrame, entity: str, candidate: str, weight_col: str
) -> DataFrame:
    """Per entity: candidate with the max total weight + its share — the
    adaptive-classification weighted vote
    (classification_service.py:240-272). Two hash aggregations + max_by; no
    window, so partial aggregation applies end-to-end."""
    per_cand = df.groupBy(entity, candidate).agg(
        F.sum(weight_col).alias("w")
    )
    best = F.max(F.struct(F.col("w").alias("w"), F.col(candidate).alias("c")))
    return per_cand.groupBy(entity).agg(
        best.getField("c").alias("winner"),
        F.round(best.getField("w"), 4).alias("winner_weight"),
        F.round(best.getField("w") / F.sum("w"), 4).alias("confidence"),
    )


def sessionize(
    df: DataFrame, key: str, ts_col: str, gap_minutes: int = 30
) -> DataFrame:
    """Gap-based session assignment: lag + cumulative-sum-of-new-session
    flags per key (the batch restatement of the reference's open/close
    session windows, database.py:111-130, repositories.py:230-234).
    Returns per-session (key, session_id, n_events, start, end)."""
    w = Window.partitionBy(key).orderBy(ts_col)
    gap = F.lit(gap_minutes * 60)
    flagged = df.withColumn(
        "_new",
        F.when(
            F.unix_timestamp(F.col(ts_col))
            - F.unix_timestamp(F.lag(ts_col).over(w))
            > gap,
            1,
        )
        .otherwise(0),
    ).withColumn("session_id", F.sum("_new").over(w))
    return flagged.groupBy(key, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )


def rate_limit_violations(
    df: DataFrame, key: str, ts_col: str, limit_per_minute: int
) -> DataFrame:
    """Per-key tumbling-minute counts above a limit — the middleware
    rate-limit window (middleware.py:69-97) as a set-oriented query."""
    return (
        df.groupBy(
            F.col(key), F.date_trunc("minute", F.col(ts_col)).alias("minute")
        )
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > limit_per_minute)
    )


def paginate(
    df: DataFrame, order_col: str, tiebreak: str, offset: int, limit: int
) -> DataFrame:
    """offset/limit pagination via row_number (repositories.py:47-49)."""
    w = Window.orderBy(F.col(order_col).desc(), F.col(tiebreak))
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > offset) & (F.col("rn") <= offset + limit))
        .drop("rn")
    )


def word_frequencies(
    df: DataFrame, text_col: str, min_len: int = 4, k: int = 50
) -> DataFrame:
    """Keyword extraction: explode tokens, filter short/stop, count, top-k
    (text_utils.py:216-275)."""
    from etl_documentos_spark.functions.text import words

    return (
        df.select(F.explode(words(text_col)).alias("word"))
        .filter(F.length("word") >= min_len)
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(k)
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_len: int = 4,
) -> DataFrame:
    """Per-document top-k terms by tf-idf — the classic relevance ranking a
    training-data pipeline uses for keyword tagging and topical filtering
    (reference keyword surface: text_utils.py:216-275).

    score = tf * ln(N / df) with df computed from the per-(doc, term)
    aggregate (already distinct, so no second distinct pass). Plan shape
    at scale: one narrow explode, a (doc, term) hash aggregate, a
    vocabulary-keyed aggregate + join (AQE broadcasts it when the
    vocabulary is small; shuffles on the term key otherwise — both sides
    are post-aggregation, far smaller than the corpus), and a per-doc
    window for the top-k. Ties break on the term string, so output is
    deterministic."""
    from etl_documentos_spark.functions.text import words

    n_docs = df.count()  # single scalar; the scan is column-pruned to ids
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(words(text_col)).alias("term")
    ).filter(F.length("term") >= min_len)
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(dfreq, "term").select(
        "doc_id",
        "term",
        "tf",
        (
            F.col("tf").cast("double")
            * F.log(F.lit(float(n_docs)) / F.col("df"))
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "term", "tf", "score")
    )
