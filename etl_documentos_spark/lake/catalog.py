"""Filesystem catalog: named namespaces of lake tables + one SQL door.

The reference's users address tables by name through one database handle
(``/root/reference/app/database/connection.py`` + the repositories layer);
this is the lake-native equivalent — an Iceberg *HadoopCatalog* analogue:
a catalog IS a directory, a namespace IS a subdirectory, a table IS a
`LakeTable` root inside it (detected by its version-hint file). No service,
no registry database — listing is a directory walk, creation/commits are
the table's own atomic metadata protocol, so everything the engine
guarantees per table (flock'd commits, snapshots, time travel) is already
catalog-safe.

``Catalog.sql`` resolves every table name under the catalog into a fresh
snapshot-isolated view (see `lake/sql.py`) and runs the statement — the
"switch your SQL over" on-ramp.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from etl_documentos_spark.lake import sql as lake_sql
from etl_documentos_spark.lake.table import _HINT, LakeTable


class Catalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, name: str) -> str:
        ns, _, tbl = name.rpartition(".")
        parts = [p for p in (*ns.split("."), tbl) if p]
        if not parts or any(
            p in ("", ".", "..") or "/" in p for p in parts
        ):
            raise ValueError(f"invalid table name {name!r}")
        return os.path.join(self.root, *parts)

    def create_table(
        self,
        name: str,
        schema: T.StructType,
        num_buckets: int = 16,
        **kwargs,
    ) -> LakeTable:
        """Create ``ns.table`` (namespace dirs made on demand)."""
        path = self._path(name)
        if LakeTable.exists(path):
            raise FileExistsError(f"table {name!r} already exists")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        return LakeTable.create(path, schema, num_buckets=num_buckets, **kwargs)

    def load_table(self, name: str) -> LakeTable:
        path = self._path(name)
        if not LakeTable.exists(path):
            raise KeyError(f"no such table {name!r}")
        return LakeTable.load(path)

    def table_exists(self, name: str) -> bool:
        return LakeTable.exists(self._path(name))

    def list_tables(self) -> list[str]:
        """All table names (dotted), found by walking for version hints."""
        out = []
        for dirpath, dirnames, filenames in os.walk(self.root):
            if _HINT in filenames:
                if ".dropped" not in os.path.basename(dirpath):
                    rel = os.path.relpath(dirpath, self.root)
                    out.append(rel.replace(os.sep, "."))
                dirnames.clear()  # tables do not nest
        return sorted(out)

    def drop_table(self, name: str, purge: bool = False) -> None:
        """Forget a table; ``purge=True`` also deletes its files (the
        Iceberg DROP TABLE ... PURGE distinction). Without purge the data
        stays on disk and the name simply stops resolving here — this
        catalog has no state besides the directory tree, so non-purge drop
        moves the table aside rather than deleting bytes."""
        path = self._path(name)
        if not LakeTable.exists(path):
            raise KeyError(f"no such table {name!r}")
        if purge:
            shutil.rmtree(path)
        else:
            # unique aside name: drop/recreate/drop must not collide with
            # the remains of an earlier non-purge drop of the same name
            import uuid

            os.rename(path, f"{path}.dropped-{uuid.uuid4().hex[:8]}")

    def sql(self, spark: SparkSession, query: str) -> DataFrame:
        """Run SQL over every table in the catalog (names with dots are
        registered with underscores: ``raw.transcripts`` ->
        ``raw_transcripts`` — Spark temp views cannot hold dots).

        DML statements (``DELETE FROM t WHERE ...`` / ``UPDATE t SET ...``
        / ``INSERT INTO t ...`` / ``MERGE INTO t USING ...``) are
        dispatched onto the version-checked DML (`operators.dml`) against
        the named table — see `lake.sql.sql`."""
        tables: dict[str, LakeTable] = {}
        for name in self.list_tables():
            view = name.replace(".", "_")
            if view in tables:
                raise ValueError(
                    f"view name collision: two catalog tables map to "
                    f"{view!r} after dot->underscore folding (rename one)"
                )
            tables[view] = self.load_table(name)
        return lake_sql.sql(spark, tables, query)
