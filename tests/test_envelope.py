"""Debezium-envelope adapter: op mapping, before/after images, round trip.

The wire contract under test: ``c``/``r`` -> insert, ``u`` -> update,
``d`` -> delete (image under ``before``); unknown ops and unparseable
documents surface as NULL-op rows that the DLQ split quarantines; and
``parse_envelope(to_envelope(x)) == x`` for every canonical change row.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_documentos_spark import datagen
from etl_documentos_spark.schemas import CHANGE_EVENTS
from etl_documentos_spark.sources.envelope import parse_envelope, to_envelope


def _raw(spark, docs: list[str]):
    return spark.createDataFrame([(d,) for d in docs], "value string")


def test_op_mapping_and_images(spark):
    docs = [
        # create: after image only
        '{"op":"c","after":{"conv_id":"a","turn_idx":1,"role":"user",'
        '"text":"hi","tool":null,"ts_us":1000000},'
        '"source":{"lsn":1,"partition":0}}',
        # snapshot read: also an insert
        '{"op":"r","after":{"conv_id":"a","turn_idx":2,"role":"agent",'
        '"text":"yo","tool":"search","ts_us":2000000},'
        '"source":{"lsn":2,"partition":0}}',
        # update
        '{"op":"u","after":{"conv_id":"a","turn_idx":1,"role":"user",'
        '"text":"hi!","tool":null,"ts_us":3000000},'
        '"source":{"lsn":3,"partition":1}}',
        # delete: BEFORE image carries the key
        '{"op":"d","before":{"conv_id":"a","turn_idx":2,"role":"agent",'
        '"text":"yo","tool":"search","ts_us":2000000},'
        '"source":{"lsn":4,"partition":1}}',
    ]
    rows = {
        (r["lsn"]): r
        for r in parse_envelope(_raw(spark, docs)).collect()
    }
    assert rows[1]["op"] == "insert" and rows[1]["text"] == "hi"
    assert rows[2]["op"] == "insert" and rows[2]["tool"] == "search"
    assert rows[3]["op"] == "update" and rows[3]["text"] == "hi!"
    # delete reconstructs key and payload from the before image
    assert rows[4]["op"] == "delete"
    assert rows[4]["conv_id"] == "a" and rows[4]["turn_idx"] == 2
    assert rows[1]["ts"].microsecond == 0 and rows[1]["ts"].second == 1


def test_bad_rows_surface_as_null_op_for_dlq(spark):
    docs = [
        "this is not json",
        '{"op":"x","after":{"conv_id":"z","turn_idx":0},"source":{"lsn":9}}',
        '{"op":"c","after":{"conv_id":"ok","turn_idx":0,"role":"u",'
        '"text":"t","tool":null,"ts_us":1},"source":{"lsn":10,"partition":0}}',
    ]
    out = parse_envelope(_raw(spark, docs))
    assert out.filter(F.col("op").isNull()).count() == 2
    good = out.filter(F.col("op").isNotNull()).collect()
    assert len(good) == 1 and good[0]["conv_id"] == "ok"


def test_round_trip_is_lossless(spark):
    ch = datagen.change_stream(spark, n_events=4_000, events_per_epoch=1_000)
    ch = ch.select(*[f.name for f in CHANGE_EVENTS.fields])
    back = parse_envelope(to_envelope(ch))
    # exact multiset equality both directions (exceptAll is order-free)
    assert back.exceptAll(ch).count() == 0
    assert ch.exceptAll(back).count() == 0
    # parse output is nullable everywhere (wire data proves nothing about
    # nullability); names and types must match exactly
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in ch.schema.fields
    ]


def test_export_changes_replicates_over_the_wire(spark, tmp_path):
    """CDC back OUT: exporting a snapshot range as envelope strings and
    re-ingesting it onto a replica holding the range's base state
    converges to the source table — LWW ordering (ts, lsn) survives the
    wire, tombstones ship as ``d`` with before images."""
    from etl_documentos_spark.lake.table import LakeTable
    from etl_documentos_spark.operators.merge import (
        merge_mor,
        physical_schema,
        read_current,
    )
    from etl_documentos_spark.schemas import TRANSCRIPTS
    from etl_documentos_spark.sources.envelope import export_changes

    ch = datagen.change_stream(
        spark, n_events=2_000, n_convs=25, turns_per_conv=20
    ).persist()
    cut = 1_200
    first = ch.filter(F.col("lsn") < cut)
    rest = ch.filter(F.col("lsn") >= cut)

    src = LakeTable.create(
        str(tmp_path / "src"), physical_schema(TRANSCRIPTS), num_buckets=4
    )
    merge_mor(spark, src, first)
    base_snap = src.current_snapshot.snapshot_id
    merge_mor(spark, src, rest)

    # replica already holds the base state; the exported range brings it
    # to the source's head THROUGH THE WIRE FORMAT
    dst = LakeTable.create(
        str(tmp_path / "dst"), physical_schema(TRANSCRIPTS), num_buckets=2
    )
    merge_mor(spark, dst, first)
    wire = export_changes(spark, src, base_snap)
    parsed = parse_envelope(wire)
    assert parsed.filter(F.col("op").isNull()).count() == 0
    merge_mor(spark, dst, parsed)

    a = read_current(spark, src).orderBy("conv_id", "turn_idx").collect()
    b = read_current(spark, dst).orderBy("conv_id", "turn_idx").collect()
    assert a == b and len(a) > 0
    # deletes in the exported range really travel as tombstones
    n_del = rest.filter(F.col("op") == "delete").count()
    if n_del:
        assert parsed.filter(F.col("op") == "delete").count() > 0


def test_rekeyed_parse_expands_key_changing_update(spark):
    from etl_documentos_spark.sources.envelope import parse_envelope_rekeyed

    docs = [
        # ordinary insert: passes through untouched
        '{"op":"c","after":{"conv_id":"a","turn_idx":1,"role":"user",'
        '"text":"hi","tool":null,"ts_us":1000000},'
        '"source":{"lsn":1,"partition":0}}',
        # PK-changing update: (a,1) -> (a,9)
        '{"op":"u","before":{"conv_id":"a","turn_idx":1,"role":"user",'
        '"text":"hi","tool":null,"ts_us":1000000},'
        '"after":{"conv_id":"a","turn_idx":9,"role":"user",'
        '"text":"hi moved","tool":null,"ts_us":2000000},'
        '"source":{"lsn":2,"partition":0}}',
        # same-key update: must NOT expand
        '{"op":"u","before":{"conv_id":"b","turn_idx":3,"role":"user",'
        '"text":"old","tool":null,"ts_us":3000000},'
        '"after":{"conv_id":"b","turn_idx":3,"role":"user",'
        '"text":"new","tool":null,"ts_us":4000000},'
        '"source":{"lsn":3,"partition":0}}',
        # delete (before image only): must NOT expand
        '{"op":"d","before":{"conv_id":"c","turn_idx":5,"role":"user",'
        '"text":"bye","tool":null,"ts_us":5000000},'
        '"source":{"lsn":4,"partition":0}}',
    ]
    out = parse_envelope_rekeyed(_raw(spark, docs))
    assert "prev_conv_id" not in out.columns
    rows = {
        (r["op"], r["conv_id"], r["turn_idx"], r["text"], r["lsn"])
        for r in out.collect()
    }
    assert rows == {
        ("insert", "a", 1, "hi", 1),
        ("delete", "a", 1, "hi moved", 2),   # retract at the old key
        ("insert", "a", 9, "hi moved", 2),   # upsert at the new key
        ("update", "b", 3, "new", 3),        # same-key update untouched
        ("delete", "c", 5, "bye", 4),
    }


def test_rekeyed_parse_equals_plain_parse_without_migrations(spark):
    """On a stream with no key-changing updates the two parsers agree
    row-for-row (to_envelope never emits before+after pairs)."""
    from etl_documentos_spark.sources.envelope import parse_envelope_rekeyed

    ch = datagen.change_stream(spark, n_events=2000, events_per_epoch=500)
    wire = to_envelope(ch.drop("epoch"))
    a = sorted(
        map(tuple, parse_envelope(wire).collect()), key=lambda r: r[-2]
    )
    b = sorted(
        map(tuple, parse_envelope_rekeyed(wire).collect()),
        key=lambda r: r[-2],
    )
    assert a == b
