"""Adjacent-turn pair mining: (prompt, response) extraction for SFT.

Fine-tuning data is mined from transcripts as role-alternating turn
pairs — each prompt-role turn joined to the NEXT response-role turn of
the same conversation. Expressed as one ``lead()`` window over
(conversation, turn order): no self-join (which would shuffle the
transcript twice and need a de-overlap pass), no Python.

Scale: the window shuffles once on the conversation key; per-key state is
a single row of lookahead, and per-conversation turn counts are bounded
(transcripts are short relative to the corpus), so the hot-conversation
skew that plagues per-key AGGREGATION doesn't bite a bounded-partition
sort. At 10^10 rows this is the same exchange the LWW replay already
performs — pair mining composes downstream of `read_current` /
``lww_dedup`` without adding a new shuffle shape.

Reference semantics analogue: the reference renders conversations as
ordered turn lists for its chat view (``/root/reference/app/pages/
3_Chat.py``); this emits the consecutive-pair form training needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def turn_pairs(
    df: DataFrame,
    prompt_role: str,
    response_role: str,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    adjacent_only: bool = False,
) -> DataFrame:
    """(prompt, response) turn pairs per conversation.

    A pair is a ``prompt_role`` turn whose NEXT surviving turn (by
    ``turn_col`` order) carries ``response_role``. With
    ``adjacent_only=True`` the response must additionally sit at
    ``turn_idx + 1`` — strict adjacency, which distinguishes "the reply"
    from "the next thing said after deletions carved a gap".
    Output: (conv, prompt_turn, prompt_text, response_turn,
    response_text).
    """
    w = Window.partitionBy(conv_col).orderBy(turn_col)
    nxt = df.select(
        F.col(conv_col),
        F.col(turn_col).alias("prompt_turn"),
        F.col(role_col).alias("_role"),
        F.col(text_col).alias("prompt_text"),
        F.lead(role_col).over(w).alias("_next_role"),
        F.lead(turn_col).over(w).alias("response_turn"),
        F.lead(text_col).over(w).alias("response_text"),
    )
    cond = (F.col("_role") == prompt_role) & (
        F.col("_next_role") == response_role
    )
    if adjacent_only:
        cond = cond & (
            F.col("response_turn") == F.col("prompt_turn") + 1
        )
    return nxt.filter(cond).drop("_role", "_next_role")


def fit_context_window(
    df: DataFrame,
    budget: int,
    tokens: "F.Column",
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
) -> DataFrame:
    """Keep each conversation's NEWEST turns that fit a token budget.

    Chat-history packing truncates oldest-first: running the cumulative
    token sum over turns in DESCENDING order and keeping rows while the
    sum stays within ``budget`` retains exactly the maximal suffix of the
    conversation that fits. One window (same conversation-key exchange as
    everything else in this module); per-row state is a running long.
    A single newest turn larger than the whole budget drops the entire
    conversation — the standard rule (there is no partial turn).
    Output: input columns + ``n_tokens`` + ``cum_tokens``.
    """
    w = (
        Window.partitionBy(conv_col)
        .orderBy(F.col(turn_col).desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.withColumn("n_tokens", tokens)
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget)
    )
