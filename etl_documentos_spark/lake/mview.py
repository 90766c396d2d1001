"""Incrementally maintained materialized aggregate views over the lake.

The reference keeps a derived per-endpoint daily metrics table it UPDATES
incrementally as facts arrive (``metricas_desempenho``,
/root/reference/app/models/database.py:212-229, incremental upsert at
/root/reference/app/services/analytics_service.py:280-292) — a hand-rolled
materialized view over the fact stream. At lake scale the same contract is:
a derived LakeTable whose rows equal ``AGG(source @ synced snapshot)``,
refreshed by reading only the source's CHANGE DELTA since the last sync.

Maintenance strategy: **touched-key partial recompute**, the pattern that
survives 10^10 rows:

1. plan the changelog range ``(synced, hi]`` — metadata-only manifest diff
   (`lake/changelog.read_changes`), execution reads only delta files;
2. the distinct changed keys name the buckets to touch; every other bucket
   of both tables is untouched (no full scan, no full shuffle);
3. recompute aggregates for ONLY the touched keys from the source AT
   snapshot ``hi`` (bucket- and stat-pruned scan + broadcast semi-join),
   so the view lands exactly consistent with ``source @ hi``;
4. copy-on-write replace of the view buckets holding touched keys: keep
   rows for untouched keys (broadcast anti-join), union the fresh rows —
   keys whose turns were all deleted simply produce no fresh row and
   vanish;
5. persist ``mview.synced_snapshot_id = hi`` as a table-property commit.

Crash-safety is by idempotence, not atomicity: a crash between (4) and (5)
leaves the watermark stale, so the next refresh re-plans a range that
covers the same keys and recomputes identical rows from the same source
snapshot state — re-applying is a no-op, the same argument as the ingest
path's exactly-once epochs. Aggregates are recomputed from source truth,
never incremented from the feed, so double-application cannot drift.

Upsert feeds cannot maintain SUM/COUNT by pure increments anyway (an
update REPLACES a prior image the feed no longer carries); touched-key
recompute sidesteps pre-image tracking entirely and is the standard
incremental-view design for upsert sources (cf. delta-oriented view
maintenance in Materialize/Delta Live Tables; Spark-native here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_documentos_spark.lake.changelog import read_changes
from etl_documentos_spark.lake.table import LakeTable
from etl_documentos_spark.operators.lww import lww_dedup
from etl_documentos_spark.schemas import KEY_COLS

_SYNC_PROP = "mview.synced_snapshot_id"


def conv_stats_aggs() -> list[Column]:
    """The showcase aggregate spec: per-conversation turn stats (the
    reference's dashboard counters, analytics_service.py:84-143, computed
    per conversation instead of per client)."""
    return [
        F.count("*").alias("n_turns"),
        F.max("ts").alias("last_ts"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
        F.count_distinct("role").alias("n_roles"),
    ]


class MaterializedView:
    """A derived LakeTable equal to ``source.groupBy(key).agg(*aggs)``,
    maintained incrementally from the source's changelog.

    ``aggs``: aggregate Columns over the source's LIVE rows (LWW winners,
    tombstones dropped), grouped by the source's bucket key. The caller
    supplies the same list on every refresh; the view table stores only
    data + the sync watermark.
    """

    def __init__(self, table: LakeTable, aggs: list[Column]):
        self.table = table
        self.aggs = aggs

    # ------------------------------------------------------------ lifecycle
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        source: LakeTable,
        root: str,
        aggs: list[Column],
        num_buckets: int | None = None,
    ) -> "MaterializedView":
        """Create the view table (empty) synced to the source's FIRST
        snapshot — the first refresh replays everything after it."""
        first = min(s.snapshot_id for s in source.snapshots)
        schema = cls._agg_schema(spark, source, aggs)
        table = LakeTable.create(
            root,
            schema,
            num_buckets=num_buckets or source.num_buckets,
            bucket_col=source.bucket_col,
            properties={_SYNC_PROP: first},
        )
        return cls(table, aggs)

    @classmethod
    def load(cls, root: str, aggs: list[Column]) -> "MaterializedView":
        return cls(LakeTable.load(root), aggs)

    @staticmethod
    def _agg_schema(spark, source: LakeTable, aggs: list[Column]):
        """Derive the view schema from an empty-plan dry run (schema-only,
        no job)."""
        empty = spark.createDataFrame([], source.schema)
        return MaterializedView._aggregate(empty, source.bucket_col, aggs).schema

    @staticmethod
    def _aggregate(physical: DataFrame, key: str, aggs: list[Column]) -> DataFrame:
        live = lww_dedup(
            physical, key_cols=KEY_COLS, order_cols=("ts", "_lsn")
        ).filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
        return live.groupBy(key).agg(*aggs)

    # -------------------------------------------------------------- refresh
    @property
    def synced_snapshot_id(self) -> int:
        return int(self.table._meta["properties"][_SYNC_PROP])

    def refresh(self, spark: SparkSession, source: LakeTable) -> dict:
        """Advance the view to the source's current snapshot.

        Returns a summary dict (``keys_touched``, ``from``/``to`` snapshot
        ids); no-op when already synced. Raises on a logical-overwrite
        source commit (run the source in MOR mode; see module docstring) —
        call ``full_refresh`` to resync after one.
        """
        source._refresh()
        self.table._refresh()
        lo = self.synced_snapshot_id
        hi = source.current_snapshot.snapshot_id
        if hi == lo:
            return {"from": lo, "to": hi, "keys_touched": 0}

        key = source.bucket_col
        feed = read_changes(spark, source, lo, to_snapshot_id=hi)
        touched = feed.select(F.col(key)).distinct()
        # bucket ids are the only thing collected: bounded by num_buckets
        src_buckets = sorted(
            r[0]
            for r in touched.select(
                source.bucket_expr(F.col(key)).alias("b")
            )
            .distinct()
            .collect()
        )
        if not src_buckets:
            self.table.set_property(_SYNC_PROP, hi)
            return {"from": lo, "to": hi, "keys_touched": 0}

        # recompute touched keys from the source AT snapshot hi — the view
        # lands exactly consistent with source@hi even under concurrent
        # source commits
        cur = source.scan(spark, buckets=src_buckets, snapshot_id=hi)
        cur = cur.join(F.broadcast(touched), key, "left_semi")
        fresh = self._aggregate(cur, key, self.aggs)

        mv_buckets = sorted(
            r[0]
            for r in touched.select(
                self.table.bucket_expr(F.col(key)).alias("b")
            )
            .distinct()
            .collect()
        )
        kept = (
            self.table.scan(spark, buckets=mv_buckets)
            .join(F.broadcast(touched), key, "left_anti")
        )
        new = kept.unionByName(fresh)
        n_touched = touched.count()
        self.table.overwrite_buckets(new, mv_buckets, salts=1)
        self.table.set_property(_SYNC_PROP, hi)
        return {"from": lo, "to": hi, "keys_touched": n_touched}

    def full_refresh(self, spark: SparkSession, source: LakeTable) -> dict:
        """Recompute the whole view from ``source @ current`` — the resync
        escape hatch after a logical-overwrite source commit broke the
        incremental feed. One full source scan + one full view rewrite."""
        source._refresh()
        self.table._refresh()
        hi = source.current_snapshot.snapshot_id
        key = source.bucket_col
        fresh = self._aggregate(
            source.scan(spark, snapshot_id=hi), key, self.aggs
        )
        self.table.overwrite_buckets(
            fresh, self.table.live_buckets(), salts=1
        )
        self.table.set_property(_SYNC_PROP, hi)
        return {"to": hi}

    def read(self, spark: SparkSession) -> DataFrame:
        return self.table.scan(spark)
