"""Persisted IVF vector index in the lake (SURVEY §2.1 S11 vector-store sink).

The write side is one narrow assignment pass (`similarity.ivf_assign` — the
nearest-centroid argmax as a single array expression, no Python) plus a
repartition on the list id and a list-partitioned parquet write. The layout
IS the index: probing ``n_probe`` of ``n_lists`` lists reads n/C of the data
through parquet partition pruning (``PartitionFilters`` in the scan — no
row-level filtering work, no files from unprobed lists opened at all).
Centroids live beside the data as a tiny parquet plus a meta.json, so a
search session never touches the big table until the pruned probe scan.

At 10^9 vectors this is the FAISS-IVF shape on a data lake: assignment is
the partition key, each list is an independent shard, adding vectors is an
append to the probed partitions only, and search cost is
O(n_probe / n_lists) of the corpus per query.

Reference parity: FAISS stores persisted per document type and reloaded
from disk (/root/reference/app/services/vector_service.py:75-228 —
``save_local`` / ``load_local`` / ``add_document``), re-expressed as
partitioned parquet + metadata instead of a serialized native index.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_documentos_spark.operators import similarity

_META = "meta.json"
_CENTROIDS = "centroids.parquet"
_LISTS = "lists"


class IvfVectorIndex:
    """A loaded (or freshly built) persisted IVF index."""

    def __init__(self, root: str, meta: dict, centroids: list[list[float]]):
        self.root = root
        self.meta = meta
        self.centroids = centroids

    # ------------------------------------------------------------------ build
    @staticmethod
    def derive_centroids(
        df: DataFrame,
        n_lists: int,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> list[list[float]]:
        """Deterministic strided seeding: every (n // n_lists)-th vector in
        id order. One tiny job (n_lists rows collected); no RNG, so an
        external checker can reproduce the centroid set exactly."""
        n = df.count()
        if n == 0 or n_lists < 1:
            raise ValueError("need a non-empty corpus and n_lists >= 1")
        stride = max(1, n // n_lists)
        ranked = df.select(id_col, vec_col).orderBy(id_col).limit(stride * n_lists)
        picked = (
            ranked.withColumn(
                "_rn", F.row_number().over(Window.orderBy(id_col))
            )
            .filter((F.col("_rn") - 1) % stride == 0)
            .limit(n_lists)
            .collect()
        )
        return [[float(x) for x in r[vec_col]] for r in picked]

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        df: DataFrame,
        root: str,
        centroids: list[list[float]] | None = None,
        n_lists: int = 16,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> "IvfVectorIndex":
        """Assign every vector to its nearest centroid and persist the
        corpus partitioned by list id.

        The repartition on ``_list`` is the index build's single shuffle —
        it co-locates each list into its own task so every partition
        directory is written by one writer (no small-file explosion at
        scale; at 10^9 vectors repartition(n_lists, "_list") bounds file
        count by n_lists, and skewed lists can be salted the same way the
        merge path salts hot conversations)."""
        if os.path.exists(os.path.join(root, _META)):
            raise FileExistsError(f"index already exists at {root}")
        if centroids is None:
            centroids = cls.derive_centroids(df, n_lists, vec_col, id_col)
        assigned = df.withColumn(
            "_list", similarity.ivf_assign(df, centroids, vec_col)
        )
        (
            assigned.repartition(len(centroids), "_list")
            .write.partitionBy("_list")
            .parquet(os.path.join(root, _LISTS))
        )
        cdf = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            "list_id int, centroid array<double>",
        )
        cdf.coalesce(1).write.parquet(os.path.join(root, _CENTROIDS))
        meta = {
            "format_version": 1,
            "n_lists": len(centroids),
            "vec_col": vec_col,
            "id_col": id_col,
            "dim": len(centroids[0]),
        }
        with open(os.path.join(root, _META), "w") as f:
            json.dump(meta, f)
        return cls(root, meta, centroids)

    # ------------------------------------------------------------------- load
    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "IvfVectorIndex":
        with open(os.path.join(root, _META)) as f:
            meta = json.load(f)
        rows = (
            spark.read.parquet(os.path.join(root, _CENTROIDS))
            .orderBy("list_id")
            .collect()
        )
        centroids = [[float(x) for x in r["centroid"]] for r in rows]
        if len(centroids) != meta["n_lists"]:
            raise ValueError(
                f"centroid count {len(centroids)} != meta n_lists {meta['n_lists']}"
            )
        return cls(root, meta, centroids)

    # ------------------------------------------------------------ incremental
    def add(self, df: DataFrame) -> None:
        """Append new vectors: assign against the FROZEN centroid set and
        append into the existing list partitions (new files only in the
        touched lists — the FAISS ``add_document`` analogue; periodic
        rebuilds re-balance lists the way compaction re-balances buckets)."""
        assigned = df.withColumn(
            "_list",
            similarity.ivf_assign(df, self.centroids, self.meta["vec_col"]),
        )
        (
            assigned.repartition(self.meta["n_lists"], "_list")
            .write.mode("append")
            .partitionBy("_list")
            .parquet(os.path.join(self.root, _LISTS))
        )

    # ----------------------------------------------------------------- search
    def probe_order(self, query_vec: list[float]) -> list[int]:
        """List ids by descending cosine(query, centroid); ties on id."""
        nq = math.sqrt(sum(float(x) ** 2 for x in query_vec))

        def cos(c: list[float]) -> float:
            d = sum(float(x) * float(y) for x, y in zip(query_vec, c))
            nc = math.sqrt(sum(float(x) ** 2 for x in c))
            return d / (nq * nc)

        return sorted(
            range(len(self.centroids)), key=lambda i: (-cos(self.centroids[i]), i)
        )

    def probe_scan(
        self, spark: SparkSession, query_vec: list[float], n_probe: int = 1
    ) -> DataFrame:
        """The pruned candidate scan: only the probed list partitions are
        read (partition pruning — assert ``PartitionFilters`` in the plan)."""
        probed = self.probe_order(query_vec)[: max(1, n_probe)]
        lists = spark.read.parquet(os.path.join(self.root, _LISTS))
        return lists.filter(F.col("_list").isin(probed))

    def search(
        self,
        spark: SparkSession,
        query_vec: list[float],
        k: int = 10,
        n_probe: int = 1,
    ) -> DataFrame:
        """Exact cosine top-k inside the probed lists."""
        cand = self.probe_scan(spark, query_vec, n_probe)
        return similarity.cosine_topk(
            cand, query_vec, k, self.meta["vec_col"], self.meta["id_col"]
        )

    def search_many(
        self,
        spark: SparkSession,
        queries: list[tuple[int, list[float]]],
        k: int = 10,
        n_probe: int = 1,
    ) -> DataFrame:
        """Batch search: ONE partition-pruned scan over the union of every
        query's probed lists; each row is scored only against the queries
        that probed its list (explode over a literal query array + an
        array_contains guard — a narrow flatMap, never a join). The
        per-query top-k is a window over the shrunken candidate set.

        At 10^9 vectors and Q queries this reads
        |union of probed lists| / n_lists of the corpus once, instead of Q
        pruned scans — the batched lookup-service shape.

        Output: (query_id, vec_id, cosine_sim) — k rows per query, ties on
        id, similarity rounded to 4 decimals like ``cosine_topk``.
        """
        from pyspark.sql import Window

        vec_col = self.meta["vec_col"]
        id_col = self.meta["id_col"]
        probes = {
            int(qid): self.probe_order(vec)[: max(1, n_probe)]
            for qid, vec in queries
        }
        union_lists = sorted({li for ls in probes.values() for li in ls})
        qarr = F.array(
            *[
                F.struct(
                    F.lit(int(qid)).alias("query_id"),
                    F.array(*[F.lit(float(x)) for x in vec]).alias("qv"),
                    F.array(
                        *[F.lit(int(li)) for li in probes[int(qid)]]
                    ).alias("lists"),
                )
                for qid, vec in queries
            ]
        )
        lists = spark.read.parquet(os.path.join(self.root, _LISTS)).filter(
            F.col("_list").isin(union_lists)
        )
        v = similarity._to_double(vec_col)
        exploded = lists.select(
            F.col(id_col), F.col("_list"), v.alias("_v"),
            F.explode(qarr).alias("_q"),
        ).filter(F.array_contains(F.col("_q.lists"), F.col("_list")))
        sim = similarity.cosine(F.col("_v"), F.col("_q.qv"))
        scored = exploded.select(
            F.col("_q.query_id").alias("query_id"),
            F.col(id_col),
            sim.alias("_sim"),
        )
        win = Window.partitionBy("query_id").orderBy(
            F.col("_sim").desc(), F.col(id_col)
        )
        return (
            scored.withColumn("_rn", F.row_number().over(win))
            .filter(F.col("_rn") <= k)
            .select(
                "query_id", id_col, F.round("_sim", 4).alias("cosine_sim")
            )
        )
