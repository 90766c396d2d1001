"""DOCX / XLSX / PDF decoders (sources/documents.py): each synth payload is
container-valid (readable by stdlib zipfile / a compliant PDF reader — the
xref offsets resolve), and decode reproduces the closed-form generation rule
exactly. Malformed bytes must raise, not pass."""

import io
import zipfile
import zlib

import pytest

from etl_documentos_spark.sources import documents as D

IDS = [0, 1, 2, 3, 4, 7, 31, 996, 997]


def _df(spark):
    return spark.createDataFrame([(i,) for i in IDS], "doc_id long")


def test_docx_roundtrip(spark):
    with_docx = D.synth_docx_payload(_df(spark))
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in with_docx.collect()}
    # container-valid: stdlib zipfile opens it and the parts are present
    for i, data in payloads.items():
        with zipfile.ZipFile(io.BytesIO(data)) as z:
            names = set(z.namelist())
        assert {"[Content_Types].xml", "word/document.xml"} <= names
    decoded = {r["doc_id"]: r for r in D.decode_docx(with_docx).collect()}
    for i in IDS:
        paras = [f"Paragraph {j} of document {i}." for j in range(1 + i % 5)]
        want = "\n".join(paras)
        r = decoded[i]
        assert r["n_paragraphs"] == len(paras)
        assert r["text"] == want, i  # run-merge across split <w:r> elements
        assert r["n_chars"] == len(want)


def test_xlsx_roundtrip(spark):
    with_xlsx = D.synth_xlsx_payload(_df(spark))
    decoded = {r["doc_id"]: r for r in D.decode_xlsx(with_xlsx).collect()}
    for i in IDS:
        n_rows, n_cols = 2 + i % 4, 1 + i % 3
        want = sum(
            (i + 7 * r + 3 * c) % 100
            for r in range(n_rows)
            for c in range(n_cols)
        )
        r = decoded[i]
        assert r["n_rows"] == n_rows
        assert r["n_numeric_cells"] == n_rows * n_cols
        assert r["n_string_cells"] == n_rows  # one label cell per row
        assert r["sum_values"] == want, i


def test_pdf_roundtrip_and_xref_validity(spark):
    with_pdf = D.synth_pdf_payload(_df(spark))
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in with_pdf.collect()}
    # xref offsets resolve: every entry points at "<n> 0 obj"
    for i, data in payloads.items():
        sx = data.rfind(b"startxref")
        xref_at = int(data[sx:].split()[1])
        assert data[xref_at:].startswith(b"xref")
        lines = data[xref_at:].split(b"\n")[2:8]
        for n, line in enumerate(lines[1:], start=1):  # skip free entry 0
            off = int(line.split()[0])
            assert data[off:].startswith(f"{n} 0 obj".encode()), (i, n)
        # content stream is genuinely Flate-compressed
        s = data.find(b"stream")
        e = data.find(b"endstream")
        body = data[s + 6 : e].strip(b"\r\n")
        assert zlib.decompress(body).startswith(b"BT /F1 12 Tf")
    decoded = {r["doc_id"]: r for r in D.decode_pdf(with_pdf).collect()}
    for i in IDS:
        lines = [f"Line {j} of PDF {i}" for j in range(1 + i % 4)]
        r = decoded[i]
        assert r["n_objects"] == 5
        assert r["n_lines"] == len(lines)
        assert r["text"] == "\n".join(lines), i


def test_pdf_escape_handling():
    """The Tj extractor honors PDF string escapes (spec 7.3.4.2)."""
    raw = rb"(a\(b\)c\\d\nend) Tj"
    (m,) = D._TJ_RE.findall(raw)
    assert D._pdf_unescape(m) == "a(b)c\\d\nend"


@pytest.mark.parametrize(
    "decode", [D.decode_docx, D.decode_xlsx, D.decode_pdf]
)
def test_malformed_payload_raises(spark, decode):
    bad = spark.createDataFrame(
        [(1, bytearray(b"not a document at all"))],
        "doc_id long, payload binary",
    )
    with pytest.raises(Exception, match="not a (ZIP container|PDF payload)"):
        decode(bad).collect()


def test_csv_roundtrip_quoting(spark):
    with_csv = D.synth_csv_payload(_df(spark))
    # the quoted notes genuinely contain commas + doubled quotes on the wire
    sample = bytes(with_csv.filter("doc_id = 3").collect()[0]["payload"])
    assert b'"says ""hi"", 1"' in sample
    decoded = {r["doc_id"]: r for r in D.decode_csv(with_csv).collect()}
    for i in IDS:
        n_rows = 2 + i % 4
        want_sum = sum((i + 3 * r) % 50 for r in range(n_rows))
        r = decoded[i]
        assert r["n_rows"] == n_rows
        assert r["n_quoted_notes"] == n_rows // 2
        assert r["sum_values"] == want_sum, i


def test_csv_naive_split_would_fail(spark):
    """Sanity that the oracle is sensitive: a naive comma-split of the
    quoted rows yields the wrong field count (i.e. a parser without RFC
    4180 quoting cannot pass the round-trip)."""
    with_csv = D.synth_csv_payload(_df(spark))
    text = bytes(
        with_csv.filter("doc_id = 3").collect()[0]["payload"]
    ).decode()
    quoted_lines = [ln for ln in text.splitlines()[1:] if '"' in ln]
    assert quoted_lines and all(
        len(ln.split(",")) != 3 for ln in quoted_lines
    )
