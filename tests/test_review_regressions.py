"""Regression pins for the round-5 closing review findings: each test
fails on the pre-fix behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_pack_sequences_zero_token_doc_at_group_head(spark):
    """A zero-token doc first in its pack group must land in bin 0 at
    offset 0 — not bin -1 / offset == capacity (invalid loader
    coordinates)."""
    from etl_documentos_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(i, "" if i % 2 == 0 else "a b c") for i in range(40)],
        "doc_id long, text string",
    )
    rows = pack_sequences(df, capacity=8, id_col="doc_id").collect()
    assert rows
    for r in rows:
        assert r["bin_idx"] >= 0, r
        assert 0 <= r["offset"] < 8 or (
            r["n_tokens"] == 0 and r["offset"] <= 8
        ), r


def test_strip_boilerplate_keeps_lineless_docs(spark):
    """Docs whose text yields zero qualifying lines must still appear
    as (n_lines=0, n_dropped=0, text_clean='') — one row per INPUT doc,
    not one row per doc-with-lines."""
    from etl_documentos_spark.operators.linedup import strip_boilerplate

    df = spark.createDataFrame(
        [
            (1, "keep me\nshared line"),
            (2, "shared line\nunique two"),
            (3, "shared line\nunique three"),
            (4, ""),  # no lines at all
            (5, "\n  \n"),  # whitespace-only lines
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in strip_boilerplate(df, min_docs=3).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    for d in (4, 5):
        assert out[d]["n_lines"] == 0
        assert out[d]["n_dropped"] == 0
        assert out[d]["text_clean"] == ""


def test_dedup_index_rebuild_clears_tombstones(spark, tmp_path):
    """build() over an existing root resets tombstones: a doc removed
    from the OLD index must be queryable after a from-scratch rebuild."""
    from etl_documentos_spark.lake.dedup_index import MinHashLshIndex

    root = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(5)],
        "doc_id long, text string",
    )
    idx = MinHashLshIndex.build(spark, root, docs)
    idx.remove([3])
    probe = spark.createDataFrame(
        [(99, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    before = {
        r["corpus_id"] for r in idx.query(probe, threshold=0.9).collect()
    }
    assert 3 not in before  # tombstone works pre-rebuild
    idx2 = MinHashLshIndex.build(spark, root, docs)
    after = {
        r["corpus_id"] for r in idx2.query(probe, threshold=0.9).collect()
    }
    assert 3 in after, "stale tombstone survived a from-scratch rebuild"


def test_sql_branch_read_is_case_insensitive(spark, tmp_path):
    """FROM t.BRANCH_x must resolve like INSERT INTO t.BRANCH_x does —
    the keyword is case-insensitive, names stay case-sensitive."""
    import etl_documentos_spark.lake.sql as lsql
    from etl_documentos_spark.lake.table import LakeTable
    from etl_documentos_spark.operators.merge import physical_schema
    from etl_documentos_spark.schemas import TRANSCRIPTS
    from etl_documentos_spark.streaming.apply import CdcPipeline

    root = str(tmp_path / "t")
    LakeTable.create(root, physical_schema(TRANSCRIPTS), num_buckets=2)
    pipe = CdcPipeline(spark, root, str(tmp_path / "w"))
    ch = spark.createDataFrame(
        [("insert", "c1", 0, "user", "hello", None,
          __import__("datetime").datetime(2024, 1, 1), 1, 0, 0)],
        "op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp, lsn long, "
        "source_partition int, epoch int",
    )
    pipe.apply_epochs_bulk(ch, [0])
    t = pipe.table
    t.create_branch("audit")
    got = lsql.sql(
        spark, {"t": t}, "SELECT count(*) AS n FROM t.BRANCH_audit"
    ).collect()
    assert got[0]["n"] == 1
    # unknown branch still raises clearly, regardless of keyword case
    with pytest.raises(KeyError):
        lsql.sql(spark, {"t": t}, "SELECT * FROM t.Branch_nope")


def test_unigram_lm_single_train_aggregation(spark):
    """The vocab is materialized driver-side: the returned plan must not
    re-run the corpus groupBy (no second Aggregate over the token
    explode on the vocab side — only the scoring aggregation remains)."""
    from etl_documentos_spark.functions.quality import unigram_lm_score

    df = spark.createDataFrame(
        [(i, "the quick brown fox " * 3) for i in range(10)],
        "doc_id long, text string",
    )
    out = unigram_lm_score(df, k_vocab=4)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # scoring needs exactly one Aggregate (per-doc mean); a lazy vocab
    # dependency would add the token-count Aggregate back into the plan
    assert plan.count("Aggregate") == 1, plan
    rows = out.collect()
    assert len(rows) == 10
