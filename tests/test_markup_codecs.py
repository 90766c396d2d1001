"""HTML / RTF / XML / Markdown (sources/markup.py) and PPTX / ODT
(sources/documents.py) decoders: each synth payload is container-valid,
decode reproduces the closed-form generation rule exactly, and each
format's deliberate trap (script leak, destination leak, zip-order slide
walk, dropped ODF whitespace, emphasis-inside-code) is asserted to
actually catch the naive implementation."""

import io
import zipfile

import pytest

from etl_documentos_spark.sources import documents as D
from etl_documentos_spark.sources import markup as M

IDS = [0, 1, 2, 3, 4, 7, 31, 996, 997]


def _df(spark):
    return spark.createDataFrame([(i,) for i in IDS], "doc_id long")


def test_html_roundtrip(spark):
    decoded = {
        r["doc_id"]: r
        for r in M.decode_html(M.synth_html_payload(_df(spark))).collect()
    }
    for i in IDS:
        want = M._html_lines(i)
        r = decoded[i]
        assert r["text"] == "\n".join(want), i
        assert r["n_blocks"] == len(want)
        assert r["n_links"] == 1
        # the traps: script body, style body and the comment never leak,
        # and the entities decoded (&amp; -> '&', &#101; -> 'e')
        assert "var x" not in r["text"] and "color" not in r["text"]
        assert "hidden" not in r["text"]
        assert "&amp;" not in r["text"] and "&#101;" not in r["text"]
        assert " & " in r["text"] and "texto" in r["text"]


def test_rtf_roundtrip(spark):
    payloads = {
        r["doc_id"]: bytes(r["payload"])
        for r in M.synth_rtf_payload(_df(spark)).collect()
    }
    for i, data in payloads.items():
        assert data.startswith(b"{\\rtf1")  # container-valid leader
    decoded = {
        r["doc_id"]: r
        for r in M.decode_rtf(M.synth_rtf_payload(_df(spark))).collect()
    }
    for i in IDS:
        want = M._rtf_lines(i)
        r = decoded[i]
        assert r["text"] == "\n".join(want), i
        assert r["n_paragraphs"] == len(want)
        # traps: fonttbl + {\*\generator} content never leaks, the hex
        # escape decodes to the accent
        assert "Times" not in r["text"] and "generator" not in r["text"]
        assert "á" in r["text"]


def test_rtf_reader_unicode_and_escapes():
    paras = M._rtf_text(
        b"{\\rtf1\\ansi \\uc1\\u8364? euro \\{x\\} \\~fim\\par done}"
    )
    # \u8364 is the euro sign and its uc fallback '?' must be skipped;
    # \{ \} are literal braces; \~ is a non-breaking space
    assert paras == ["€ euro {x}  fim", "done"]


def test_xml_roundtrip_and_count_check(spark):
    decoded = {
        r["doc_id"]: r
        for r in M.decode_xml(M.synth_xml_payload(_df(spark))).collect()
    }
    for i in IDS:
        n = 1 + i % 4
        r = decoded[i]
        assert r["n_records"] == n
        assert r["sum_qty"] == sum(M._xml_qty(i, k) for k in range(n))
        assert r["text"] == "\n".join(f"item {k} of {i}" for k in range(n))
    # the count cross-check is real: a lying count attribute raises
    bad = (
        f'<export xmlns="{M._XML_NS}" count="9">'
        f'<rec id="0"><name>x</name><qty>1</qty></rec></export>'
    ).encode()
    df = spark.createDataFrame([(1, bytearray(bad))], "doc_id long, payload binary")
    with pytest.raises(Exception, match="count attribute"):
        M.decode_xml(df).collect()


def test_md_roundtrip(spark):
    decoded = {
        r["doc_id"]: r
        for r in M.decode_md(M.synth_md_payload(_df(spark))).collect()
    }
    for i in IDS:
        r = decoded[i]
        assert r["text"] == "\n".join(M._md_lines(i)), i
        assert r["n_headings"] == 1
        assert r["n_links"] == r["n_code_spans"] == 1 + i % 3
        # trap: the '*' INSIDE the code span survives literally while the
        # emphasis asterisks dissolved
        assert "code*0" in r["text"] and "*enfase" not in r["text"]


def test_md_inline_order():
    lines, nh, nl, nc = M._md_to_text("## T\n\na `b*c` *d* [e](/f) `*`\n")
    assert lines == ["T", "a b*c d e *"]
    assert (nh, nl, nc) == (1, 1, 2)


def test_pptx_roundtrip_and_slide_order(spark):
    with_pptx = D.synth_pptx_payload(_df(spark))
    payloads = {
        r["doc_id"]: bytes(r["payload"]) for r in with_pptx.collect()
    }
    decoded = {r["doc_id"]: r for r in D.decode_pptx(with_pptx).collect()}
    for i in IDS:
        counts = D._pptx_shape_counts(i)
        want = "\n".join(
            f"Slide {s} shape {k} of deck {i}"
            for s, c in enumerate(counts)
            for k in range(c)
        )
        r = decoded[i]
        assert r["text"] == want, i
        assert r["n_slides"] == len(counts)
        assert r["n_shapes"] == sum(counts)
    # the trap is real: for a multi-slide deck, walking slide parts in
    # zip-name order reads the deck BACKWARDS (part names are reversed)
    i = next(x for x in IDS if x % 3 != 0)
    with zipfile.ZipFile(io.BytesIO(payloads[i])) as z:
        slide_names = sorted(
            n for n in z.namelist() if n.startswith("ppt/slides/")
        )
        naive_first = z.read(slide_names[0]).decode()
    assert "Slide 0" not in naive_first  # slide1.xml holds the LAST slide


def test_odt_roundtrip_and_mimetype_rule(spark):
    with_odt = D.synth_odt_payload(_df(spark))
    payloads = {
        r["doc_id"]: bytes(r["payload"]) for r in with_odt.collect()
    }
    for i, data in payloads.items():
        with zipfile.ZipFile(io.BytesIO(data)) as z:
            first = z.infolist()[0]
            assert first.filename == "mimetype"
            assert first.compress_type == zipfile.ZIP_STORED
    decoded = {r["doc_id"]: r for r in D.decode_odt(with_odt).collect()}
    for i in IDS:
        want = "\n".join(
            f"Item {j}  valor\t{D._odt_value(i, j)}"
            for j in range(1 + i % 3)
        )
        r = decoded[i]
        assert r["text"] == want, i  # double space + tab expanded
        assert r["n_paragraphs"] == 1 + i % 3
    # a container whose first entry is not the stored mimetype raises
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("content.xml", "<x/>")
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="mimetype"):
        D.decode_odt(df).collect()


def test_txt_encoding_sniff(spark):
    decoded = {
        r["doc_id"]: r
        for r in M.decode_txt(M.synth_txt_payload(_df(spark))).collect()
    }
    for i in IDS:
        r = decoded[i]
        assert r["text"] == "\n".join(M._txt_lines(i)), i
        assert r["encoding"] == M._txt_encoding(i), i
        assert r["n_lines"] == 1 + i % 3
    # the sniff is load-bearing: the Latin-1 payload is NOT valid UTF-8,
    # and the UTF-16 payloads contain NULs a naive reader would keep
    payloads = {
        r["doc_id"]: bytes(r["payload"])
        for r in M.synth_txt_payload(_df(spark)).collect()
    }
    lat = next(i for i in IDS if i % 4 == 3)
    with pytest.raises(UnicodeDecodeError):
        payloads[lat].decode("utf-8")
    u16 = next(i for i in IDS if i % 4 == 1)
    assert b"\x00" in payloads[u16]


def test_adoc_roundtrip(spark):
    decoded = {
        r["doc_id"]: r
        for r in M.decode_adoc(M.synth_adoc_payload(_df(spark))).collect()
    }
    for i in IDS:
        r = decoded[i]
        want = [
            f"Documento {i}",
            f"Secao {i % 7}",
            f"Texto forte{i} e mono{i} aqui.",
        ] + M._adoc_items(i)
        assert r["text"] == "\n".join(want), i
        assert r["title"] == f"Documento {i}"
        assert r["n_sections"] == 1
        assert r["n_list_items"] == 1 + i % 3
        # traps: the attribute entry and the comment never leak, and the
        # inline span markers dissolved
        assert "autor" not in r["text"] and "comentario" not in r["text"]
        assert "*forte" not in r["text"] and "`mono" not in r["text"]


def test_ods_repeat_expansion(spark):
    with_ods = D.synth_ods_payload(_df(spark))
    decoded = {r["doc_id"]: r for r in D.decode_ods(with_ods).collect()}
    for i in IDS:
        nr, nc = D._ods_shape(i)
        want = sum(
            D._ods_value(i, r, c) for r in range(nr) for c in range(nc)
        ) + 2 * sum(D._ods_rep_value(i, r) for r in range(nr))
        got = decoded[i]
        assert got["n_rows"] == nr
        # the repeated cell expands to 2: without expansion this is
        # nr * (nc + 1), which must NOT equal the decoded count
        assert got["n_numeric_cells"] == nr * (nc + 2)
        assert got["sum_values"] == want, i
    # container rule holds for the spreadsheet mime too
    import io as _io
    import zipfile as _zip

    data = bytes(
        {r["doc_id"]: r["payload"] for r in with_ods.collect()}[IDS[0]]
    )
    with _zip.ZipFile(_io.BytesIO(data)) as z:
        assert z.read("mimetype") == D._ODS_MIME.encode()


def test_odp_roundtrip(spark):
    decoded = {
        r["doc_id"]: r
        for r in D.decode_odp(D.synth_odp_payload(_df(spark))).collect()
    }
    for i in IDS:
        counts = D._odp_frame_counts(i)
        want = "\n".join(
            f"Quadro {k} pagina {p} deck {i}"
            for p, c in enumerate(counts)
            for k in range(c)
        )
        r = decoded[i]
        assert r["text"] == want, i
        assert r["n_pages"] == len(counts)
        assert r["n_frames"] == sum(counts)


def test_detect_format_sniffs_bytes(spark):
    """Magic numbers + real container inspection + text ladder; junk and
    wrong containers degrade to 'unknown', never raise."""
    from etl_documentos_spark.sources.dispatch import detect_format

    one = spark.createDataFrame([(2,)], "doc_id long")

    def payload(fn):
        return bytes(fn(one).collect()[0]["payload"])

    assert detect_format(payload(D.synth_docx_payload)) == "docx"
    assert detect_format(payload(D.synth_xlsx_payload)) == "xlsx"
    assert detect_format(payload(D.synth_pptx_payload)) == "pptx"
    assert detect_format(payload(D.synth_odt_payload)) == "odt"
    assert detect_format(payload(D.synth_ods_payload)) == "ods"
    assert detect_format(payload(D.synth_odp_payload)) == "odp"
    assert detect_format(payload(D.synth_pdf_payload)) == "pdf"
    assert detect_format(payload(D.synth_csv_payload)) == "csv"
    assert detect_format(payload(M.synth_html_payload)) == "html"
    assert detect_format(payload(M.synth_rtf_payload)) == "rtf"
    assert detect_format(payload(M.synth_xml_payload)) == "xml"
    assert detect_format(payload(M.synth_md_payload)) == "md"
    assert detect_format(payload(M.synth_adoc_payload)) == "adoc"
    # txt rotates encodings; UTF-16 sniffs via BOM
    lone = spark.createDataFrame([(1,)], "doc_id long")
    assert detect_format(
        bytes(M.synth_txt_payload(lone).collect()[0]["payload"])
    ) == "txt"
    # degradation, not exceptions
    assert detect_format(b"\x00\x01\x02\xff\xfe\x00garbage") == "unknown"
    assert detect_format(b"PK\x03\x04notazip") == "unknown"
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("random.bin", "x")
    assert detect_format(buf.getvalue()) == "unknown"
    assert detect_format(b"plain words, nothing else") == "txt"


def test_decode_any_routes_every_format(spark):
    """Mixed drop-box: decode_any sniffs + routes each payload to its real
    decoder; formats, counts and text all match the per-format rules, and
    an unknown payload surfaces as a NULL row instead of failing."""
    from etl_documentos_spark.sources import dispatch as X
    from pyspark.sql import functions as F

    n = 2 * len(X._ORDER)  # two full format rotations
    ids = spark.createDataFrame(
        [(i,) for i in range(n)], "doc_id long"
    )
    res = {
        r["doc_id"]: r
        for r in X.decode_any(X.synth_mixed_payload(ids)).collect()
    }
    assert len(res) == n
    for i, r in res.items():
        assert r["format"] == X._ORDER[i % len(X._ORDER)], (i, r["format"])
        assert r["n_units"] is not None and r["n_units"] >= 1
    # spot-check one routed text per family
    assert res[14]["text"].startswith("Paragraph 0 of document 14.")
    assert res[7]["text"].startswith("Parágrafo 0 de 7")
    assert res[2]["text"] is None  # csv is metric-only
    assert res[12]["format"] == "xlsx" and res[12]["text"] is None
    assert res[13]["format"] == "ods" and res[13]["text"] is None

    junk = spark.createDataFrame(
        [(99, bytearray(b"\x00\xff\x01garbage"))],
        "doc_id long, payload binary",
    )
    out = X.decode_any(junk).collect()
    assert len(out) == 1 and out[0]["format"] == "unknown"
    assert out[0]["n_units"] is None and out[0]["text"] is None
