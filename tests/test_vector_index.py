"""Persisted IVF vector index: build/load/search, pruning, incremental add.

SURVEY §2.1 S11 (vector-store sink) — the FAISS save_local/load_local/
add_document lifecycle (/root/reference/app/services/vector_service.py:75-228)
as a list-partitioned parquet layout whose probes are partition-pruned scans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_documentos_spark.lake.vector_index import IvfVectorIndex
from etl_documentos_spark.operators import similarity
from etl_documentos_spark.plans import inspect

SF = "/root/testdata/sf0.001"


def _corpus(spark):
    return spark.read.parquet(SF + "/embeddings.parquet")


def _centroids(emb, ids=(1, 2, 3, 4)):
    return [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin(list(ids))).orderBy("vec_id").collect()
    ]


def _query_vec(emb):
    return [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]


def test_build_load_search_matches_inmemory_ivf(spark, tmp_path):
    """Persisted search == the in-memory ann_ivf_topk on the same centroids."""
    emb = _corpus(spark)
    cents = _centroids(emb)
    qv = _query_vec(emb)
    corpus = emb.filter("vec_id <> 0")

    idx = IvfVectorIndex.build(spark, corpus, str(tmp_path / "ivf"), centroids=cents)
    reloaded = IvfVectorIndex.load(spark, str(tmp_path / "ivf"))
    assert reloaded.centroids == cents

    got = [tuple(r) for r in reloaded.search(spark, qv, k=10, n_probe=1).collect()]
    want = [
        tuple(r)
        for r in similarity.ann_ivf_topk(corpus, qv, cents, k=10, n_probe=1).collect()
    ]
    assert got == want and len(got) == 10
    assert idx.meta["n_lists"] == 4


def test_probe_scan_is_partition_pruned(spark, tmp_path):
    """The probe reads only the probed list partitions — PartitionFilters on
    _list in the scan, and fewer files read than the full index."""
    emb = _corpus(spark)
    idx = IvfVectorIndex.build(
        spark, emb.filter("vec_id <> 0"), str(tmp_path / "ivf"),
        centroids=_centroids(emb),
    )
    qv = _query_vec(emb)
    scan = idx.probe_scan(spark, qv, n_probe=1)
    plan = inspect.physical_plan(scan)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters:" in ln]
    assert pf and "_list" in pf[0], plan
    # pruned row count strictly below the corpus (one of 4 lists probed)
    assert 0 < scan.count() < emb.filter("vec_id <> 0").count()


def test_full_probe_equals_brute_force(spark, tmp_path):
    """Probing every list is exact: identical to brute-force cosine top-k."""
    emb = _corpus(spark)
    corpus = emb.filter("vec_id <> 0")
    idx = IvfVectorIndex.build(
        spark, corpus, str(tmp_path / "ivf"), centroids=_centroids(emb)
    )
    qv = _query_vec(emb)
    got = [tuple(r) for r in idx.search(spark, qv, k=10, n_probe=4).collect()]
    want = [tuple(r) for r in similarity.cosine_topk(corpus, qv, k=10).collect()]
    assert got == want


def test_incremental_add_lands_in_probed_lists(spark, tmp_path):
    """add() appends against frozen centroids; a vector equal to a centroid
    must surface as the top hit when that centroid's list is probed."""
    emb = _corpus(spark)
    cents = _centroids(emb)
    corpus = emb.filter("vec_id <> 0 AND vec_id < 500")
    idx = IvfVectorIndex.build(spark, corpus, str(tmp_path / "ivf"), centroids=cents)

    new_vec = cents[2]
    add_df = spark.createDataFrame(
        [(99999, [float(x) for x in new_vec])], "vec_id long, embedding array<double>"
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    # align column types with the stored corpus (parquet float arrays)
    idx.add(add_df.select("vec_id", "embedding"))

    # vec_id 3 (the centroid's source row) ties at cosine 1.0 and wins the
    # deterministic id tiebreak; the added vector must be right behind it
    hits = idx.search(spark, new_vec, k=2, n_probe=1).collect()
    assert [h["vec_id"] for h in hits] == [3, 99999]
    assert all(abs(h["cosine_sim"] - 1.0) < 1e-6 for h in hits)


def test_derived_centroids_are_deterministic(spark, tmp_path):
    emb = _corpus(spark).filter("vec_id <> 0")
    a = IvfVectorIndex.derive_centroids(emb, n_lists=4)
    b = IvfVectorIndex.derive_centroids(emb, n_lists=4)
    assert a == b and len(a) == 4


def test_search_many_matches_per_query_search(spark, tmp_path):
    """Batch search == per-query search, from ONE pruned scan; the union of
    probed lists is still partition-pruned in the plan."""
    emb = _corpus(spark)
    corpus = emb.filter("vec_id >= 5")
    idx = IvfVectorIndex.build(
        spark, corpus, str(tmp_path / "ivf"), centroids=_centroids(emb)
    )
    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter("vec_id < 3").orderBy("vec_id").collect()
    ]
    batch = idx.search_many(spark, queries, k=5, n_probe=2)
    got = {
        (r["query_id"], r["vec_id"], r["cosine_sim"]) for r in batch.collect()
    }
    want = set()
    for qid, vec in queries:
        for r in idx.search(spark, vec, k=5, n_probe=2).collect():
            want.add((qid, r["vec_id"], r["cosine_sim"]))
    assert got == want and len(got) == 15

    plan = inspect.physical_plan(batch)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters:" in ln]
    assert pf and "_list" in pf[0], plan
