"""etl_documentos_spark — a from-scratch PySpark-native CDC / incremental-ingest
engine over lake tables of multi-turn conversation/agent transcripts.

Re-expresses, set-at-a-time, the insert -> enrich -> update -> audit-log ingest
semantics of the reference system ``tiagopereiraramos/etl-documentos`` (surveyed
in SURVEY.md with file:line citations) as idiomatic Spark DataFrame operators:

- change-stream tail -> LWW dedup -> key-partitioned MERGE  (reference:
  ``app/database/repositories.py:51-68`` update-by-PK;
  ``app/services/document_processor.py:126-143, 205-218`` insert-then-update)
- epoch-based exactly-once commit log                        (reference: status
  transitions + append-only audit trail, ``app/core/document_tracking.py``)
- additive schema evolution without rewrite                  (reference: Alembic
  autogenerate migrations, ``app/database/migrations.py:49-107``)
- per-partition lineage + throughput metrics                 (reference: JSONL
  processing log ``app/core/document_tracking.py:255-274``)

Everything is pyspark.sql DataFrames + vectorized pandas/Arrow UDFs; no
per-row Python in any hot path.
"""

__version__ = "0.1.0"
