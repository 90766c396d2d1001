"""Plan-shape assertions: pushdown, pruning, broadcast — the scale contract."""

from __future__ import annotations

from etl_documentos_spark.plans import inspect
from etl_documentos_spark.plans.queries import (
    q_events_by_nation,
    q_tpch_q1,
    q_tpch_q6,
)

SF = "/root/testdata/sf0.001"


def test_q6_filters_pushed_to_scan(spark):
    df = q_tpch_q6(spark, SF)
    assert inspect.has_pushed_filters(df), inspect.physical_plan(df)


def test_q1_column_pruning(spark):
    df = q_tpch_q1(spark, SF)
    cols = set(inspect.read_schema_columns(df))
    # only the referenced columns are read — never the full 11-column row
    assert cols <= {
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate",
    }
    assert "l_orderkey" not in cols and "l_partkey" not in cols


def test_dim_joins_broadcast(spark):
    df = q_events_by_nation(spark, SF)
    assert inspect.uses_broadcast_join(df), inspect.physical_plan(df)


def test_near_dup_embedding_has_no_nested_loop_join(spark):
    """The exact all-pairs operator must be the blocked shuffle+BLAS shape,
    never a BroadcastNestedLoopJoin cartesian (the round-1 scale-killer)."""
    from etl_documentos_spark.plans.queries import q_near_dup_embedding

    df = q_near_dup_embedding(spark, SF)
    plan = inspect.physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_allpairs_blocked_equals_naive(spark):
    """Blocked all-pairs == brute-force pairs on a small corpus, any
    n_blocks (including n_blocks > distinct ids and 1)."""
    from pyspark.sql import functions as F

    from etl_documentos_spark.operators import similarity

    emb = spark.read.parquet(SF + "/embeddings.parquet")
    naive_a = emb.select(F.col("vec_id").alias("id_a"),
                         similarity._to_double("embedding").alias("va"))
    naive_b = emb.select(F.col("vec_id").alias("id_b"),
                         similarity._to_double("embedding").alias("vb"))
    sim = similarity.cosine(F.col("va"), F.col("vb"))
    naive = (
        naive_a.join(naive_b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(sim, 4).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= 0.3)
    )
    expected = sorted(map(tuple, naive.collect()))
    for nb in (1, 3, 8, 64):
        got = sorted(map(tuple, similarity.allpairs_cosine_pairs(
            emb, threshold=0.3, n_blocks=nb
        ).collect()))
        assert got == expected, f"n_blocks={nb}"


def test_near_dup_lsh_pairs_subset_of_exact(spark):
    """LSH candidate pairs are a subset of the exact pairs (in-bucket exact
    verify -> no false positives; recall loss only)."""
    from etl_documentos_spark.operators import similarity

    emb = spark.read.parquet(SF + "/embeddings.parquet")
    planes = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter("vec_id IN (1,2,3)").orderBy("vec_id").collect()
    ]
    exact = set(
        (r["id_a"], r["id_b"])
        for r in similarity.allpairs_cosine_pairs(
            emb, threshold=0.3, n_blocks=4
        ).collect()
    )
    lsh = similarity.near_dup_pairs_lsh(emb, 0.3, planes).collect()
    assert len(lsh) > 0
    assert set((r["id_a"], r["id_b"]) for r in lsh) <= exact


def test_merge_scan_prunes_buckets(spark, tmp_path):
    """The MERGE reads only touched buckets' files (partition pruning at the
    manifest level, not the planner level — assert the file count)."""
    import datetime

    from etl_documentos_spark.lake.table import LakeTable
    from etl_documentos_spark.operators.merge import merge_mor, physical_schema
    from etl_documentos_spark.schemas import CHANGE_EVENTS, TRANSCRIPTS

    root = str(tmp_path / "t")
    table = LakeTable.create(root, physical_schema(TRANSCRIPTS), num_buckets=16)

    def ev(conv, lsn):
        return ("insert", conv, 0, "user", "x", None,
                datetime.datetime(2024, 1, 1), lsn, 0)

    merge_mor(
        spark, table,
        spark.createDataFrame([ev(f"c{i}", i) for i in range(64)], CHANGE_EVENTS),
    )
    table = LakeTable.load(root)
    all_files = sum(len(fs) for fs in table.current_snapshot.files.values())
    one_bucket = int(next(iter(table.current_snapshot.files.keys())))
    pruned = table.scan(spark, buckets=[one_bucket])
    n_pruned_files = len(table.current_snapshot.files[str(one_bucket)])
    assert n_pruned_files < all_files
    assert pruned.count() > 0


def test_boilerplate_strip_plan_shape(spark):
    """The corpus-level line-dedup plan must broadcast the (diversity-
    bounded) boilerplate set into the anti-join — never a cartesian, and
    never a sort-merge join whose build side is the full corpus."""
    from etl_documentos_spark.plans.queries import q_boilerplate_strip

    df = q_boilerplate_strip(spark, SF)
    plan = inspect.physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "LeftAnti, BuildRight" in plan or "BroadcastHashJoin" in plan, plan


def test_decontamination_plan_shape(spark):
    """The eval n-gram set must broadcast — corpus text never shuffles
    into a sort-merge join, and nothing degenerates to a cartesian."""
    from etl_documentos_spark.plans.queries import q_decontamination

    df = q_decontamination(spark, SF)
    plan = inspect.physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_rekey_and_split_plan_shape(spark):
    """The round-5 closers stay JVM-side: rekey is one generate (explode)
    + the LWW exchange; the corpus split is projection-only before its
    count agg — no Python anywhere, no extra shuffle."""
    from etl_documentos_spark.plans.queries import (
        q_cdc_envelope_rekey,
        q_cdc_key_migration,
        q_corpus_split,
    )

    import re

    def n_exchanges(plan: str) -> int:
        # formatted plans print each node twice (tree + detail section):
        # count distinct numbered Exchange nodes, falling back to tree
        # arrows for unnumbered (AQE-collapsed) renderings
        nodes = set(re.findall(r"Exchange \((\d+)\)", plan))
        return len(nodes) if nodes else plan.count("+- Exchange")

    for q in (q_cdc_key_migration, q_cdc_envelope_rekey):
        plan = inspect.physical_plan(q(spark, SF))
        assert "Python" not in plan and "ArrowEval" not in plan, plan
        assert n_exchanges(plan) == 1, plan  # only the LWW agg

    plan = inspect.physical_plan(q_corpus_split(spark, SF))
    assert "Python" not in plan, plan
    assert n_exchanges(plan) == 1, plan  # only the count agg
    assert "partial_count" in plan or "partial" in plan.lower(), plan


def test_bpe_pair_counts_plan_shape(spark):
    """Both aggregations hash + map-side combine; the only window is the
    final top-k over the alphabet^2-bounded pair table; no Python."""
    from etl_documentos_spark.plans.queries import q_bpe_pair_counts

    import re

    plan = inspect.physical_plan(q_bpe_pair_counts(spark, SF))
    assert "Python" not in plan, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    nodes = set(re.findall(r"Exchange \((\d+)\)", plan))
    n = len(nodes) if nodes else plan.count("+- Exchange")
    assert n <= 3, plan  # wordfreq agg, pairs agg, top-k single-partition
