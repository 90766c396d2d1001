"""Persisted incremental MinHash-LSH near-dup index.

The batch dedup family (`operators/dedup.py`) answers "which pairs in THIS
DataFrame are near-duplicates" — an O(corpus) self-join every time. A CDC
ingest pipeline asks a different question every epoch: "which of these NEW
documents near-duplicate something already in the corpus?" Rescanning the
corpus per epoch is O(corpus x epochs); this index makes it O(batch).

Layout (all parquet + one JSON, same recipe as `lake/vector_index.py`):

    root/meta.json                    params + corpus row count
    root/bands/kp=XX/*.parquet       (band, key, id, sig[num_hashes])

Band rows are hive-partitioned by ``kp`` = first two hex chars of the band
key (<=256 directories, uniform by construction — md5 output). A query
batch touches only the partitions its own band keys land in, so the scan
is pruned to ~min(256, batch_size x bands)/256 of the corpus index and the
candidate join is a broadcast of the (small) new batch against that pruned
scan — no shuffle of corpus data, no driver transit. ``add`` appends new
band rows into the same partition scheme: incremental cost is O(batch),
the Iceberg-append analogue for dedup state.

The full signature is denormalized onto every band row (bands x copies) so
similarity verification needs no second join against a signature table:
one pruned scan, one broadcast equi-join on (band, key), then
estimated-Jaccard = fraction of equal signature components via
``zip_with``/``aggregate`` — all JVM-side codegen.

Reference parity: the reference detects exact re-uploads by SHA-256
content hash (/root/reference/app/services/extraction_service.py:295-296)
and keeps its similarity state in FAISS stores that are persisted per
document type and incrementally extended
(/root/reference/app/services/vector_service.py:75-228). This index
generalizes the former (near-dup, not just exact) with the latter's
persist/reload/add lifecycle, re-expressed as partitioned parquet +
DataFrame joins.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_documentos_spark.operators.dedup import banded_signatures

_META = "meta.json"
_BANDS = "bands"
_TOMBS = "tombstones"


class MinHashLshIndex:
    """Persisted MinHash-LSH band index with incremental add.

    Deletes follow the lake's merge-on-read recipe: ``remove`` appends id
    tombstones (O(batch), no index rewrite), ``query`` anti-joins them
    out, and ``compact`` folds them into a rewritten band set — publishing
    the new generation with one atomic metadata swap (temp +
    ``os.replace``), so a crashed compaction leaves the old generation
    intact. Maintenance (``compact``) is single-writer, like ``rebucket``
    on the lake table; ``add``/``remove`` between compactions are
    append-only.
    """

    def __init__(self, spark: SparkSession, root: str, meta: dict):
        self.spark = spark
        self.root = root
        self.meta = meta

    # -- lifecycle -----------------------------------------------------

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        root: str,
        df: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        num_hashes: int = 8,
        bands: int = 8,
        shingle_k: int = 3,
    ) -> "MinHashLshIndex":
        """Index a corpus from scratch; one narrow pass + partitioned write.

        Rebuild-in-place resets the WHOLE index state: stale tombstones
        from the previous index would silently hide just-re-indexed docs
        from ``query`` (the anti-join doesn't know the ids were rebuilt),
        and an old compacted ``bands_vN`` generation would be orphaned on
        disk with nothing left pointing at it — both are cleared first.
        """
        meta = {
            "num_hashes": num_hashes,
            "bands": bands,
            "shingle_k": shingle_k,
            "text_col": text_col,
            "id_col": id_col,
            "bands_dir": _BANDS,
            "generation": 0,
            "id_type": df.schema[id_col].dataType.simpleString(),
        }
        if os.path.isdir(root):
            shutil.rmtree(os.path.join(root, _TOMBS), ignore_errors=True)
            for entry in os.listdir(root):
                if entry.startswith(f"{_BANDS}_v"):
                    shutil.rmtree(
                        os.path.join(root, entry), ignore_errors=True
                    )
        idx = cls(spark, root, meta)
        idx._write_rows(df, mode="overwrite")
        os.makedirs(root, exist_ok=True)
        idx._write_meta()
        return idx

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "MinHashLshIndex":
        with open(os.path.join(root, _META)) as f:
            return cls(spark, root, json.load(f))

    def add(self, df: DataFrame) -> None:
        """Append a new batch's band rows — O(batch), corpus untouched."""
        self._write_rows(df, mode="append")

    def remove(self, ids: list) -> None:
        """Tombstone documents by id — O(batch), no band-row rewrite.
        Removed ids stop matching immediately (``query`` anti-joins the
        tombstone set); their band rows are physically dropped at the
        next ``compact``."""
        self.spark.createDataFrame(
            [(i,) for i in ids], f"{self.meta['id_col']} {self._id_type()}"
        ).withColumnRenamed(self.meta["id_col"], "id").write.mode(
            "append"
        ).parquet(os.path.join(self.root, _TOMBS))

    def compact(self) -> None:
        """Fold tombstones into a rewritten band generation and coalesce
        the small files ``add`` accumulates (one output file per key
        prefix). Single-writer maintenance: the new generation is written
        beside the old and published with one atomic metadata swap, so a
        crash mid-compaction leaves the current generation untouched;
        already-loaded readers keep the old (still-complete) directory.
        """
        import shutil

        old_dir = self.meta.get("bands_dir", _BANDS)
        gen = int(self.meta.get("generation", 0)) + 1
        new_dir = f"{_BANDS}_v{gen}"
        live = self._anti_tombstoned(self.scan())
        (
            live.repartition(F.col("kp"))
            .write.partitionBy("kp")
            .mode("overwrite")
            .parquet(os.path.join(self.root, new_dir))
        )
        self.meta["bands_dir"] = new_dir
        self.meta["generation"] = gen
        self._write_meta()
        shutil.rmtree(os.path.join(self.root, old_dir), ignore_errors=True)
        shutil.rmtree(os.path.join(self.root, _TOMBS), ignore_errors=True)

    # -- internals -----------------------------------------------------

    def _banded(self, df: DataFrame) -> DataFrame:
        m = self.meta
        return banded_signatures(
            df,
            text_col=m["text_col"],
            id_col=m["id_col"],
            num_hashes=m["num_hashes"],
            bands=m["bands"],
            shingle_k=m["shingle_k"],
        ).withColumn("kp", F.substring("key", 1, 2))

    def _write_rows(self, df: DataFrame, mode: str) -> None:
        (
            self._banded(df)
            .withColumnRenamed("_id", "id")
            .write.partitionBy("kp")
            .mode(mode)
            .parquet(os.path.join(self.root, self.meta.get("bands_dir", _BANDS)))
        )

    def _write_meta(self) -> None:
        tmp = os.path.join(self.root, _META + ".tmp")
        with open(tmp, "w") as f:
            json.dump(self.meta, f)
        os.replace(tmp, os.path.join(self.root, _META))

    def _id_type(self) -> str:
        return self.meta.get("id_type", "long")

    def _tombstones(self) -> DataFrame | None:
        path = os.path.join(self.root, _TOMBS)
        if not os.path.isdir(path):
            return None
        return self.spark.read.parquet(path)

    def _anti_tombstoned(self, df: DataFrame) -> DataFrame:
        """Drop band rows of removed ids. Tombstone sets are small between
        compactions (each compact clears them), so the anti-join
        broadcasts."""
        tombs = self._tombstones()
        if tombs is None:
            return df
        return df.join(F.broadcast(tombs), "id", "left_anti")

    def scan(self, key_prefixes: list[str] | None = None) -> DataFrame:
        """Index band rows; ``key_prefixes`` prunes to those partitions."""
        df = self.spark.read.parquet(
            os.path.join(self.root, self.meta.get("bands_dir", _BANDS))
        )
        if key_prefixes is not None:
            df = df.filter(F.col("kp").isin(key_prefixes))
        return df

    # -- query ---------------------------------------------------------

    def query(self, df_new: DataFrame, threshold: float = 0.5) -> DataFrame:
        """Near-dup matches of a new batch against the indexed corpus.

        Returns (new_id, corpus_id, est_jaccard) for every corpus doc that
        shares >=1 LSH band with a new doc and whose estimated Jaccard
        (fraction of equal minhash components) reaches ``threshold``.

        Plan shape at scale: the new batch's band rows are computed
        narrowly, their distinct key prefixes are collected (bounded by
        min(256, batch x bands) strings — partition pruning needs the list
        driver-side), the index scan is pruned to those partitions, and the
        new side is broadcast into the equi-join. Corpus rows never
        shuffle; batch rows never exceed a broadcast. For a batch too big
        to broadcast, split it — per-epoch CDC batches are the target.
        """
        nh = self.meta["num_hashes"]
        # localCheckpoint: the kp collect below EXECUTES the banded-
        # signature computation (shingles + minhash mins — the expensive
        # stage); without materializing, the broadcast join in the
        # returned plan would recompute it from scratch, doubling the
        # per-batch cost. Per-epoch batches are small by contract.
        new_rows = (
            self._banded(df_new)
            .withColumnRenamed("_id", "new_id")
            .localCheckpoint(eager=True)
        )
        kps = [r.kp for r in new_rows.select("kp").distinct().collect()]
        corpus = self._anti_tombstoned(self.scan(kps)).select(
            F.col("id").alias("corpus_id"),
            F.col("sig").alias("corpus_sig"),
            "band",
            "key",
        )
        est = (
            F.aggregate(
                F.zip_with(
                    "sig",
                    "corpus_sig",
                    lambda a, b: (a == b).cast("int"),
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            ).cast("double")
            / F.lit(float(nh))
        )
        return (
            corpus.join(
                F.broadcast(new_rows.select("new_id", "sig", "band", "key")),
                ["band", "key"],
            )
            .select("new_id", "corpus_id", est.alias("est_jaccard"))
            .filter(F.col("est_jaccard") >= F.lit(threshold))
            .distinct()
        )
