"""Primary-key-changing updates: split into delete(before) + insert(after).

Real CDC feeds carry updates whose *key* changed — a turn renumbered after a
moderation edit, a conversation re-threaded under a new conv_id.  On the wire
(Debezium semantics) such an update arrives with ``before.key != after.key``
and connectors are expected to apply it as a pair: retract the row at the old
key, upsert it at the new key, both carrying the source event's (ts, lsn) so
downstream last-writer-wins ordering stays causal.  The reference's update
path is a blind overwrite-by-PK (``/root/reference/app/database/
repositories.py:51-68``), so a key change there silently *duplicates* the
document; this operator encodes the correct retract+upsert contract instead.

Shape: rows whose ``prev_<key>`` columns are all NULL pass through untouched;
rows with a populated before-image key expand into exactly two canonical
events sharing the source (ts, lsn):

- ``op='delete'`` at the before-key (payload kept — deletes are filtered by
  visibility, never read), and
- ``op='insert'`` at the after-key with the update's payload.

Scale: a single projection — the expansion is ``explode`` over a per-row
1-or-2 element struct array built in whole-stage codegen.  No join, no
shuffle, no Python; the downstream LWW aggregation is the only exchange, and
the pair lands on two different hash keys so the retract and the upsert
never compete with each other.  At the old key the retract competes with
ordinary events by (ts, lsn) exactly like any other delete, so a later
real update to the old key still revives it — the semantics a replayed
binlog requires for idempotence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_documentos_spark.schemas import KEY_COLS


def split_key_migrations(
    df: DataFrame,
    key_cols: list[str] | None = None,
    prev_prefix: str = "prev_",
) -> DataFrame:
    """Canonicalize a change stream that may contain key-changing updates.

    ``df`` must carry one ``prev_<key>`` column per key column; they are
    NULL on ordinary events.  Output drops the ``prev_*`` columns and is a
    plain change stream (every surviving column in the input order), safe
    to feed to ``lww_dedup`` / the merge engines.
    """
    keys = key_cols or KEY_COLS
    prev = [prev_prefix + k for k in keys]
    missing = [c for c in prev if c not in df.columns]
    if missing:
        raise ValueError(f"missing before-image key columns: {missing}")
    if "op" not in df.columns:
        raise ValueError("change stream must carry an 'op' column")
    out_cols = [c for c in df.columns if c not in prev]

    has_before = F.lit(True)
    for c in prev:
        has_before = has_before & F.col(c).isNotNull()
    # the before-image key must actually DIFFER: connectors configured to
    # ship a before image on EVERY update would otherwise expand same-key
    # updates into a delete+insert pair tied on (ts, lsn) at one key — a
    # self-retraction whose LWW outcome is a tie-break, not a semantics
    # (hypothesis-found; test_rekey_same_key_before_image_passthrough)
    differs = F.lit(False)
    for k, p in zip(keys, prev):
        differs = differs | ~F.col(p).eqNullSafe(F.col(k))
    is_migration = has_before & differs

    def row(**overrides) -> F.Column:
        fields = []
        for c in out_cols:
            col = overrides.get(c, F.col(c))
            fields.append(col.alias(c))
        return F.struct(*fields)

    passthrough = row()
    retract = row(
        op=F.lit("delete"),
        **{k: F.col(p).cast(dict(df.dtypes)[k]) for k, p in zip(keys, prev)},
    )
    upsert = row(op=F.lit("insert"))

    expanded = F.when(
        is_migration, F.array(retract, upsert)
    ).otherwise(F.array(passthrough))
    return df.select(F.explode(expanded).alias("_e")).select("_e.*")
