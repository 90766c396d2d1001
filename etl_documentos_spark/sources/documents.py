"""Office/PDF document decoders — REAL parsers, stdlib-only.

The reference ingests documents through Docling, whose top formats are PDF
and the OOXML family (/root/reference/app/providers/docling_provider.py:64-74
lists them first). This module implements genuine end-to-end decode for the
three that stdlib can honestly parse:

- **DOCX**: a real ZIP (``zipfile``) containing WordprocessingML; text
  extraction walks ``w:p``/``w:r``/``w:t`` with ``xml.etree`` and merges
  runs per paragraph (the thing naive regex extraction gets wrong).
- **XLSX**: SpreadsheetML worksheet parse — rows/cells, inline strings vs
  numeric ``<v>`` values, A1 references.
- **PDF**: minimal but spec-valid files (xref table with correct byte
  offsets, FlateDecode content streams); extraction inflates the streams
  with ``zlib`` and evaluates ``Tj`` show-text operators with PDF
  string-escape handling.

Same discipline as the image codecs in ``multimodal.py``: the synth side
emits bit-valid payloads derived from ``doc_id`` by closed-form arithmetic
(so a DuckDB oracle predicts the decoded values exactly), the decode side
is an Arrow-batched ``mapInPandas`` over an opaque binary column — the 100
TB shape: payload bytes never leave the executors, no Python row-at-a-time
UDFs, and a malformed payload raises instead of passing silently.
"""

from __future__ import annotations

import io
import re
import zipfile
import zlib
from collections.abc import Iterator
from xml.etree import ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "synth_docx_payload",
    "decode_docx",
    "synth_xlsx_payload",
    "decode_xlsx",
    "synth_pdf_payload",
    "decode_pdf",
    "synth_csv_payload",
    "decode_csv",
    "synth_pptx_payload",
    "decode_pptx",
    "synth_odt_payload",
    "decode_odt",
    "synth_ods_payload",
    "decode_ods",
    "synth_odp_payload",
    "decode_odp",
]

_W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_S_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"

_CONTENT_TYPES_DOCX = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>"
)
_RELS_DOCX = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
    "</Relationships>"
)
_CONTENT_TYPES_XLSX = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)
_RELS_XLSX = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)
_WORKBOOK_XML = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<workbook xmlns="{_S_NS}" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
    '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
)
_WORKBOOK_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def _zip_bytes(parts: list[tuple[str, str]]) -> bytes:
    """Deterministic ZIP: fixed timestamps, DEFLATE (the real OOXML shape)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for name, content in parts:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(zi, content)
    return buf.getvalue()


# --------------------------------------------------------------------------
# DOCX
# --------------------------------------------------------------------------
def _docx_paragraphs(i: int) -> list[str]:
    """Generation rule mirrored by the DuckDB oracle (_DOCX_SQL)."""
    return [
        f"Paragraph {j} of document {i}." for j in range(1 + i % 5)
    ]


def synth_docx_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL DOCX per row: a deflated ZIP with content types, the
    package rels and a WordprocessingML body. Each paragraph's text is
    SPLIT across one ``<w:r>`` per word (with a run-properties child on
    alternating runs), so extraction must merge runs and skip non-text
    children — the failure mode of naive markup stripping."""

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            paras = []
            for text in _docx_paragraphs(i):
                runs = []
                words = text.split(" ")
                for k, wd in enumerate(words):
                    token = wd if k == len(words) - 1 else wd + " "
                    rpr = "<w:rPr><w:b/></w:rPr>" if k % 2 else ""
                    runs.append(
                        f'<w:r>{rpr}<w:t xml:space="preserve">{token}</w:t></w:r>'
                    )
                paras.append(f"<w:p>{''.join(runs)}</w:p>")
            doc = (
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                f'<w:document xmlns:w="{_W_NS}"><w:body>'
                + "".join(paras)
                + "</w:body></w:document>"
            )
            out.append(
                _zip_bytes(
                    [
                        ("[Content_Types].xml", _CONTENT_TYPES_DOCX),
                        ("_rels/.rels", _RELS_DOCX),
                        ("word/document.xml", doc),
                    ]
                )
            )
        return pd.Series(out)

    return df.withColumn("payload", make(F.col(id_col)))


DOCX_META_SCHEMA = (
    "doc_id long, n_paragraphs int, n_chars int, text string"
)


def decode_docx(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL DOCX text extraction over ``mapInPandas``: open the ZIP, parse
    ``word/document.xml`` with ElementTree, merge ``w:t`` runs per ``w:p``,
    join paragraphs with newlines. Wrong bytes raise."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t_tag, p_tag = f"{{{_W_NS}}}t", f"{{{_W_NS}}}p"
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf["payload"]):
                data = bytes(data)
                if data[:2] != b"PK":
                    raise ValueError(f"not a ZIP container for id {doc_id}")
                with zipfile.ZipFile(io.BytesIO(data)) as z:
                    root = ET.fromstring(z.read("word/document.xml"))
                paras = [
                    "".join(t.text or "" for t in p.iter(t_tag))
                    for p in root.iter(p_tag)
                ]
                text = "\n".join(paras)
                rows.append((int(doc_id), len(paras), len(text), text))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_paragraphs", "n_chars", "text"]
            )

    return df.select(id_col, "payload").mapInPandas(decode, DOCX_META_SCHEMA)


# --------------------------------------------------------------------------
# XLSX
# --------------------------------------------------------------------------
def _xlsx_shape(i: int) -> tuple[int, int]:
    return 2 + i % 4, 1 + i % 3  # (n data rows, n numeric cols)


def _xlsx_value(i: int, r: int, c: int) -> int:
    """Numeric cell rule mirrored by _XLSX_SQL."""
    return (i + 7 * r + 3 * c) % 100


def _col_ref(c: int) -> str:
    # 0 -> A, 25 -> Z, 26 -> AA (enough for any c this module emits)
    name = ""
    c += 1
    while c:
        c, rem = divmod(c - 1, 26)
        name = chr(ord("A") + rem) + name
    return name


def synth_xlsx_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL XLSX per row: deflated ZIP with workbook + worksheet.
    Each data row carries one inline-string label cell (column A) followed
    by numeric cells with proper A1 references, so the decoder must
    distinguish cell types rather than sum every ``<v>``."""

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            n_rows, n_cols = _xlsx_shape(i)
            rows_xml = []
            for r in range(n_rows):
                cells = [
                    f'<c r="A{r + 1}" t="inlineStr"><is><t>row{r}</t></is></c>'
                ]
                for c in range(n_cols):
                    ref = f"{_col_ref(c + 1)}{r + 1}"
                    cells.append(f'<c r="{ref}"><v>{_xlsx_value(i, r, c)}</v></c>')
                rows_xml.append(f'<row r="{r + 1}">{"".join(cells)}</row>')
            sheet = (
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                f'<worksheet xmlns="{_S_NS}"><sheetData>'
                + "".join(rows_xml)
                + "</sheetData></worksheet>"
            )
            out.append(
                _zip_bytes(
                    [
                        ("[Content_Types].xml", _CONTENT_TYPES_XLSX),
                        ("_rels/.rels", _RELS_XLSX),
                        ("xl/workbook.xml", _WORKBOOK_XML),
                        ("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS),
                        ("xl/worksheets/sheet1.xml", sheet),
                    ]
                )
            )
        return pd.Series(out)

    return df.withColumn("payload", make(F.col(id_col)))


XLSX_META_SCHEMA = (
    "doc_id long, n_rows int, n_numeric_cells int, n_string_cells int, "
    "sum_values bigint"
)


def decode_xlsx(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL XLSX worksheet parse over ``mapInPandas``: rows, cell-type
    dispatch (inline string vs numeric ``<v>``), integer-exact value sum."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        row_tag, c_tag, v_tag = (
            f"{{{_S_NS}}}row",
            f"{{{_S_NS}}}c",
            f"{{{_S_NS}}}v",
        )
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf["payload"]):
                data = bytes(data)
                if data[:2] != b"PK":
                    raise ValueError(f"not a ZIP container for id {doc_id}")
                with zipfile.ZipFile(io.BytesIO(data)) as z:
                    root = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
                n_rows = n_num = n_str = 0
                total = 0
                for row in root.iter(row_tag):
                    n_rows += 1
                    for cell in row.iter(c_tag):
                        if cell.get("t") in ("inlineStr", "s", "str"):
                            n_str += 1
                            continue
                        v = cell.find(v_tag)
                        if v is None or v.text is None:
                            raise ValueError(
                                f"numeric cell without value in id {doc_id}"
                            )
                        n_num += 1
                        total += int(float(v.text))
                rows.append((int(doc_id), n_rows, n_num, n_str, total))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_rows",
                    "n_numeric_cells",
                    "n_string_cells",
                    "sum_values",
                ],
            )

    return df.select(id_col, "payload").mapInPandas(decode, XLSX_META_SCHEMA)


# --------------------------------------------------------------------------
# PDF
# --------------------------------------------------------------------------
def _pdf_lines(i: int) -> list[str]:
    """Generation rule mirrored by _PDF_SQL."""
    return [f"Line {j} of PDF {i}" for j in range(1 + i % 4)]


def synth_pdf_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL single-page PDF per row: catalog/pages/page/font
    objects, a zlib FlateDecode content stream of ``Tj`` show-text
    operators, and an xref table whose byte offsets are computed, not
    faked — ``startxref`` and object offsets all resolve."""

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            ops = ["BT /F1 12 Tf 72 720 Td"]
            for j, line in enumerate(_pdf_lines(i)):
                if j:
                    ops.append("0 -14 Td")
                ops.append(f"({line}) Tj")
            ops.append("ET")
            content = zlib.compress(" ".join(ops).encode("latin-1"))
            objs = [
                b"<< /Type /Catalog /Pages 2 0 R >>",
                b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
                b"<< /Length "
                + str(len(content)).encode()
                + b" /Filter /FlateDecode >>\nstream\n"
                + content
                + b"\nendstream",
                b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
            ]
            buf = io.BytesIO()
            buf.write(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
            offsets = []
            for n, body in enumerate(objs, start=1):
                offsets.append(buf.tell())
                buf.write(f"{n} 0 obj\n".encode() + body + b"\nendobj\n")
            xref_at = buf.tell()
            buf.write(f"xref\n0 {len(objs) + 1}\n".encode())
            buf.write(b"0000000000 65535 f \n")
            for off in offsets:
                buf.write(f"{off:010d} 00000 n \n".encode())
            buf.write(
                f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
                f"startxref\n{xref_at}\n%%EOF\n".encode()
            )
            out.append(buf.getvalue())
        return pd.Series(out)

    return df.withColumn("payload", make(F.col(id_col)))


PDF_META_SCHEMA = "doc_id long, n_objects int, n_lines int, text string"

_TJ_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*Tj")
_PDF_ESCAPES = {
    b"\\n": b"\n", b"\\r": b"\r", b"\\t": b"\t", b"\\b": b"\b",
    b"\\f": b"\f", b"\\(": b"(", b"\\)": b")", b"\\\\": b"\\",
}


def _pdf_unescape(raw: bytes) -> str:
    for k, v in _PDF_ESCAPES.items():
        raw = raw.replace(k, v)
    return raw.decode("latin-1")


def decode_pdf(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL PDF text extraction over ``mapInPandas``: walk the xref table
    to count objects, locate stream objects, inflate /FlateDecode bodies
    with zlib, and evaluate ``Tj`` show-text operators (escape-aware).
    One text line per ``Tj``, joined with newlines. Wrong bytes raise."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf["payload"]):
                data = bytes(data)
                if not data.startswith(b"%PDF-"):
                    raise ValueError(f"not a PDF payload for id {doc_id}")
                # object count from the xref table the synth side computed
                sx = data.rfind(b"startxref")
                xref_at = int(data[sx:].split()[1])
                if not data[xref_at:].startswith(b"xref"):
                    raise ValueError(f"bad xref offset in id {doc_id}")
                n_objects = int(data[xref_at:].split()[2]) - 1  # minus free 0
                texts = []
                pos = 0
                while True:
                    s = data.find(b"stream", pos)
                    if s < 0:
                        break
                    e = data.find(b"endstream", s)
                    head = data[data.rfind(b"<<", 0, s) : s]
                    # spec 7.3.8: data begins after one EOL following the
                    # `stream` keyword and spans exactly /Length bytes —
                    # never strip trailing EOL bytes, compressed data may
                    # legitimately end in 0x0a/0x0d
                    start = s + len(b"stream")
                    if data[start : start + 2] == b"\r\n":
                        start += 2
                    elif data[start : start + 1] in (b"\n", b"\r"):
                        start += 1
                    m = re.search(rb"/Length\s+(\d+)", head)
                    if not m:
                        raise ValueError(
                            f"stream without /Length in id {doc_id}"
                        )
                    body = data[start : start + int(m.group(1))]
                    if b"/FlateDecode" in head:
                        body = zlib.decompress(body)
                    texts += [_pdf_unescape(m) for m in _TJ_RE.findall(body)]
                    pos = e + len(b"endstream")
                rows.append(
                    (int(doc_id), n_objects, len(texts), "\n".join(texts))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_objects", "n_lines", "text"]
            )

    return df.select(id_col, "payload").mapInPandas(decode, PDF_META_SCHEMA)


# --------------------------------------------------------------------------
# CSV (RFC 4180 quoting)
# --------------------------------------------------------------------------
def _csv_rows(i: int) -> list[tuple[str, str, int]]:
    """Generation rule mirrored by the oracle: odd rows carry a quoted
    note containing a comma AND an escaped (doubled) quote, so a naive
    split-on-comma parser shifts the value column and breaks the sum."""
    out = []
    for r in range(2 + i % 4):
        note = f'says "hi", {r}' if r % 2 else f"plain {r}"
        out.append((f"n{r}", note, (i + 3 * r) % 50))
    return out


def synth_csv_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL RFC-4180 CSV per row (header + data rows; fields
    containing commas/quotes are quoted with doubled inner quotes)."""
    import csv as _csv

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            buf = io.StringIO()
            w = _csv.writer(buf, lineterminator="\r\n")
            w.writerow(["name", "note", "value"])
            w.writerows(_csv_rows(int(i)))
            out.append(buf.getvalue().encode("utf-8"))
        return pd.Series(out)

    return df.withColumn("payload", make(F.col(id_col)))


CSV_META_SCHEMA = (
    "doc_id long, n_rows int, n_quoted_notes int, sum_values bigint"
)


def decode_csv(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL CSV parse over ``mapInPandas`` via the stdlib ``csv`` reader —
    RFC 4180 quoting honored (a comma inside a quoted note must not shift
    the value column; doubled quotes must unescape). Wrong column count
    raises."""
    import csv as _csv

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf["payload"]):
                text = bytes(data).decode("utf-8")
                rd = _csv.reader(io.StringIO(text))
                header = next(rd)
                if header != ["name", "note", "value"]:
                    raise ValueError(f"bad CSV header for id {doc_id}")
                n = quoted = 0
                total = 0
                for rec in rd:
                    if len(rec) != 3:
                        raise ValueError(
                            f"ragged CSV row for id {doc_id}: {rec!r}"
                        )
                    n += 1
                    if "," in rec[1]:
                        quoted += 1
                    total += int(rec[2])
                rows.append((int(doc_id), n, quoted, total))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_rows", "n_quoted_notes", "sum_values"],
            )

    return df.select(id_col, "payload").mapInPandas(decode, CSV_META_SCHEMA)


# --------------------------------------------------------------------------
# PPTX
# --------------------------------------------------------------------------
_P_NS = "http://schemas.openxmlformats.org/presentationml/2006/main"
_A_NS = "http://schemas.openxmlformats.org/drawingml/2006/main"
_R_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_PKG_REL_NS = "http://schemas.openxmlformats.org/package/2006/relationships"


def _pptx_shape_counts(i: int) -> list[int]:
    """Shapes per logical slide — rule mirrored by _PPTX_SQL."""
    return [1 + (i + s) % 2 for s in range(1 + i % 3)]


def synth_pptx_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL PPTX per row: PresentationML deck whose slide ORDER is
    carried by ``p:sldIdLst`` + the presentation relationships, with slide
    part NAMES deliberately reversed (logical slide ``s`` lives in
    ``slide{n-s}.xml``) — so a decoder that walks zip names in order reads
    the deck backwards; only following the relationship graph is correct.
    Shape text is split one DrawingML run per word, like the DOCX synth."""

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            counts = _pptx_shape_counts(i)
            n = len(counts)
            parts: list[tuple[str, str]] = []
            overrides, rels, sld_ids = [], [], []
            for s, n_shapes in enumerate(counts):
                fname = f"slide{n - s}.xml"  # reversed on purpose
                rid = f"rId{s + 1}"
                shapes = []
                for k in range(n_shapes):
                    words = f"Slide {s} shape {k} of deck {i}".split(" ")
                    runs = "".join(
                        f'<a:r><a:t>{w if j == len(words) - 1 else w + " "}'
                        "</a:t></a:r>"
                        for j, w in enumerate(words)
                    )
                    shapes.append(
                        "<p:sp><p:txBody><a:bodyPr/>"
                        f"<a:p>{runs}</a:p></p:txBody></p:sp>"
                    )
                parts.append(
                    (
                        f"ppt/slides/{fname}",
                        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                        f'<p:sld xmlns:p="{_P_NS}" xmlns:a="{_A_NS}">'
                        "<p:cSld><p:spTree>"
                        + "".join(shapes)
                        + "</p:spTree></p:cSld></p:sld>",
                    )
                )
                overrides.append(
                    f'<Override PartName="/ppt/slides/{fname}" ContentType='
                    '"application/vnd.openxmlformats-officedocument'
                    '.presentationml.slide+xml"/>'
                )
                rels.append(
                    f'<Relationship Id="{rid}" Type="{_R_NS}/slide" '
                    f'Target="slides/{fname}"/>'
                )
                sld_ids.append(
                    f'<p:sldId id="{256 + s}" r:id="{rid}"/>'
                )
            parts = [
                (
                    "[Content_Types].xml",
                    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
                    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
                    '<Default Extension="xml" ContentType="application/xml"/>'
                    '<Override PartName="/ppt/presentation.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>'
                    + "".join(overrides)
                    + "</Types>",
                ),
                (
                    "_rels/.rels",
                    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                    f'<Relationships xmlns="{_PKG_REL_NS}">'
                    f'<Relationship Id="rId1" Type="{_R_NS}/officeDocument" '
                    'Target="ppt/presentation.xml"/></Relationships>',
                ),
                (
                    "ppt/presentation.xml",
                    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                    f'<p:presentation xmlns:p="{_P_NS}" xmlns:r="{_R_NS}">'
                    "<p:sldIdLst>"
                    + "".join(sld_ids)
                    + "</p:sldIdLst></p:presentation>",
                ),
                (
                    "ppt/_rels/presentation.xml.rels",
                    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                    f'<Relationships xmlns="{_PKG_REL_NS}">'
                    + "".join(rels)
                    + "</Relationships>",
                ),
            ] + parts
            out.append(_zip_bytes(parts))
        return pd.Series(out)

    return df.withColumn("payload", make(F.col(id_col)))


PPTX_META_SCHEMA = "doc_id long, n_slides int, n_shapes int, text string"


def decode_pptx(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL PPTX text extraction over ``mapInPandas``: resolve slide ORDER
    through ``p:sldIdLst`` -> presentation rels -> slide parts (zip-name
    order is wrong by construction), then merge ``a:t`` runs per shape."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sldid_t = f"{{{_P_NS}}}sldId"
        rel_t = f"{{{_PKG_REL_NS}}}Relationship"
        sp_t, t_t = f"{{{_P_NS}}}sp", f"{{{_A_NS}}}t"
        rid_attr = f"{{{_R_NS}}}id"
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf["payload"]):
                data = bytes(data)
                if data[:2] != b"PK":
                    raise ValueError(f"not a ZIP container for id {doc_id}")
                with zipfile.ZipFile(io.BytesIO(data)) as z:
                    pres = ET.fromstring(z.read("ppt/presentation.xml"))
                    rels = ET.fromstring(
                        z.read("ppt/_rels/presentation.xml.rels")
                    )
                    target = {
                        r.get("Id"): r.get("Target")
                        for r in rels.iter(rel_t)
                    }
                    lines: list[str] = []
                    n_slides = n_shapes = 0
                    for sld in pres.iter(sldid_t):
                        part = "ppt/" + target[sld.get(rid_attr)]
                        slide = ET.fromstring(z.read(part))
                        n_slides += 1
                        for sp in slide.iter(sp_t):
                            n_shapes += 1
                            lines.append(
                                "".join(
                                    t.text or "" for t in sp.iter(t_t)
                                )
                            )
                rows.append(
                    (int(doc_id), n_slides, n_shapes, "\n".join(lines))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_slides", "n_shapes", "text"]
            )

    return df.select(id_col, "payload").mapInPandas(decode, PPTX_META_SCHEMA)


# --------------------------------------------------------------------------
# ODT (OpenDocument text)
# --------------------------------------------------------------------------
_ODF_OFFICE = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
_ODF_TEXT = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
_ODT_MIME = "application/vnd.oasis.opendocument.text"


def _odt_value(i: int, j: int) -> int:
    return (i + j) % 50


def synth_odt_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL ODT per row: the ``mimetype`` entry STORED
    uncompressed as the FIRST zip member (the ODF container rule), a
    manifest, and ``content.xml`` whose paragraphs use ``text:span`` runs,
    run-length-encoded spaces (``<text:s text:c="2"/>``) and
    ``<text:tab/>`` — whitespace a naive text() walk silently drops."""

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            paras = "".join(
                f'<text:p><text:span>Item {j}</text:span>'
                '<text:s text:c="2"/>valor<text:tab/>'
                f"{_odt_value(i, j)}</text:p>"
                for j in range(1 + i % 3)
            )
            content = (
                '<?xml version="1.0" encoding="UTF-8"?>'
                f'<office:document-content xmlns:office="{_ODF_OFFICE}" '
                f'xmlns:text="{_ODF_TEXT}">'
                f"<office:body><office:text>{paras}</office:text>"
                "</office:body></office:document-content>"
            )
            manifest = (
                '<?xml version="1.0" encoding="UTF-8"?>'
                '<manifest:manifest xmlns:manifest='
                '"urn:oasis:names:tc:opendocument:xmlns:manifest:1.0">'
                f'<manifest:file-entry manifest:full-path="/" '
                f'manifest:media-type="{_ODT_MIME}"/>'
                '<manifest:file-entry manifest:full-path="content.xml" '
                'manifest:media-type="text/xml"/></manifest:manifest>'
            )
            buf = io.BytesIO()
            with zipfile.ZipFile(buf, "w") as z:
                zi = zipfile.ZipInfo(
                    "mimetype", date_time=(1980, 1, 1, 0, 0, 0)
                )
                zi.compress_type = zipfile.ZIP_STORED  # ODF: first + stored
                z.writestr(zi, _ODT_MIME)
                for name, body in (
                    ("META-INF/manifest.xml", manifest),
                    ("content.xml", content),
                ):
                    zi = zipfile.ZipInfo(
                        name, date_time=(1980, 1, 1, 0, 0, 0)
                    )
                    zi.compress_type = zipfile.ZIP_DEFLATED
                    z.writestr(zi, body)
            out.append(buf.getvalue())
        return pd.Series(out)

    return df.withColumn("payload", make(F.col(id_col)))


ODT_META_SCHEMA = "doc_id long, n_paragraphs int, text string"


def decode_odt(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL ODT text extraction over ``mapInPandas``: verify the stored
    ``mimetype`` leader, then walk ``text:p`` expanding ``text:span`` runs,
    ``text:s`` run-length spaces and ``text:tab`` in document order."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p_t = f"{{{_ODF_TEXT}}}p"
        s_t, tab_t = f"{{{_ODF_TEXT}}}s", f"{{{_ODF_TEXT}}}tab"
        c_attr = f"{{{_ODF_TEXT}}}c"

        def node_text(el) -> str:
            parts = [el.text or ""]
            for child in el:
                if child.tag == s_t:
                    parts.append(" " * int(child.get(c_attr, "1")))
                elif child.tag == tab_t:
                    parts.append("\t")
                else:
                    parts.append(node_text(child))
                parts.append(child.tail or "")
            return "".join(parts)

        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf["payload"]):
                data = bytes(data)
                with zipfile.ZipFile(io.BytesIO(data)) as z:
                    first = z.infolist()[0]
                    if (
                        first.filename != "mimetype"
                        or first.compress_type != zipfile.ZIP_STORED
                        or z.read(first) != _ODT_MIME.encode()
                    ):
                        raise ValueError(
                            f"invalid ODF mimetype leader for id {doc_id}"
                        )
                    root = ET.fromstring(z.read("content.xml"))
                paras = [node_text(p) for p in root.iter(p_t)]
                rows.append((int(doc_id), len(paras), "\n".join(paras)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_paragraphs", "text"]
            )

    return df.select(id_col, "payload").mapInPandas(decode, ODT_META_SCHEMA)


# --------------------------------------------------------------------------
# ODS / ODP (OpenDocument spreadsheet / presentation)
# --------------------------------------------------------------------------
_ODF_TABLE = "urn:oasis:names:tc:opendocument:xmlns:table:1.0"
_ODF_DRAW = "urn:oasis:names:tc:opendocument:xmlns:drawing:1.0"
_ODF_OFFICE_V = _ODF_OFFICE  # office ns shared with ODT
_ODS_MIME = "application/vnd.oasis.opendocument.spreadsheet"
_ODP_MIME = "application/vnd.oasis.opendocument.presentation"


def _odf_zip(content: str, mime: str) -> bytes:
    """ODF container: ``mimetype`` STORED first, manifest, content.xml."""
    manifest = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<manifest:manifest xmlns:manifest='
        '"urn:oasis:names:tc:opendocument:xmlns:manifest:1.0">'
        f'<manifest:file-entry manifest:full-path="/" '
        f'manifest:media-type="{mime}"/>'
        '<manifest:file-entry manifest:full-path="content.xml" '
        'manifest:media-type="text/xml"/></manifest:manifest>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        zi = zipfile.ZipInfo("mimetype", date_time=(1980, 1, 1, 0, 0, 0))
        zi.compress_type = zipfile.ZIP_STORED
        z.writestr(zi, mime)
        for name, body in (
            ("META-INF/manifest.xml", manifest),
            ("content.xml", content),
        ):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(zi, body)
    return buf.getvalue()


def _odf_mimetype_check(z: zipfile.ZipFile, mime: str, doc_id) -> None:
    first = z.infolist()[0]
    if (
        first.filename != "mimetype"
        or first.compress_type != zipfile.ZIP_STORED
        or z.read(first) != mime.encode()
    ):
        raise ValueError(f"invalid ODF mimetype leader for id {doc_id}")


def _ods_shape(i: int) -> tuple[int, int]:
    return 1 + i % 3, 1 + i % 2  # (n rows, n plain numeric cols)


def _ods_value(i: int, r: int, c: int) -> int:
    return (i + 7 * r + 3 * c) % 40


def _ods_rep_value(i: int, r: int) -> int:
    return (i + r) % 9  # the repeated cell's value (counted twice)


def synth_ods_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL ODS per row: stored-mimetype container and a
    spreadsheet whose rows mix a string cell, typed float cells
    (``office:value``), and a cell with ``table:number-columns-repeated=
    "2"`` — ODF's run-length column encoding. A decoder that does not
    expand the repeat undercounts cells AND undersums values."""

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            n_rows, n_cols = _ods_shape(i)
            rows_xml = []
            for r in range(n_rows):
                cells = [
                    '<table:table-cell office:value-type="string">'
                    f"<text:p>r{r}</text:p></table:table-cell>"
                ]
                for c in range(n_cols):
                    cells.append(
                        '<table:table-cell office:value-type="float" '
                        f'office:value="{_ods_value(i, r, c)}"/>'
                    )
                cells.append(
                    '<table:table-cell table:number-columns-repeated="2" '
                    'office:value-type="float" '
                    f'office:value="{_ods_rep_value(i, r)}"/>'
                )
                rows_xml.append(
                    f"<table:table-row>{''.join(cells)}</table:table-row>"
                )
            content = (
                '<?xml version="1.0" encoding="UTF-8"?>'
                "<office:document-content "
                f'xmlns:office="{_ODF_OFFICE}" '
                f'xmlns:table="{_ODF_TABLE}" '
                f'xmlns:text="{_ODF_TEXT}">'
                "<office:body><office:spreadsheet>"
                '<table:table table:name="Planilha1">'
                + "".join(rows_xml)
                + "</table:table></office:spreadsheet></office:body>"
                "</office:document-content>"
            )
            out.append(_odf_zip(content, _ODS_MIME))
        return pd.Series(out)

    return df.withColumn("payload", make(F.col(id_col)))


ODS_META_SCHEMA = (
    "doc_id long, n_rows int, n_numeric_cells int, sum_values bigint"
)


def decode_ods(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL ODS parse over ``mapInPandas``: mimetype leader verified,
    cell-type dispatch on ``office:value-type``, and
    ``table:number-columns-repeated`` EXPANDED (each repeat counts and
    sums) — the ODF quirk naive walks miss."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        row_t = f"{{{_ODF_TABLE}}}table-row"
        cell_t = f"{{{_ODF_TABLE}}}table-cell"
        rep_a = f"{{{_ODF_TABLE}}}number-columns-repeated"
        vt_a = f"{{{_ODF_OFFICE}}}value-type"
        v_a = f"{{{_ODF_OFFICE}}}value"
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf["payload"]):
                with zipfile.ZipFile(io.BytesIO(bytes(data))) as z:
                    _odf_mimetype_check(z, _ODS_MIME, doc_id)
                    root = ET.fromstring(z.read("content.xml"))
                n_rows = n_num = 0
                total = 0
                for row in root.iter(row_t):
                    n_rows += 1
                    for cell in row.iter(cell_t):
                        rep = int(cell.get(rep_a, "1"))
                        if cell.get(vt_a) == "float":
                            v = int(float(cell.get(v_a)))
                            n_num += rep
                            total += v * rep
                rows.append((int(doc_id), n_rows, n_num, total))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_rows", "n_numeric_cells", "sum_values"],
            )

    return df.select(id_col, "payload").mapInPandas(decode, ODS_META_SCHEMA)


def _odp_frame_counts(i: int) -> list[int]:
    return [1 + (i + p) % 2 for p in range(1 + i % 2)]


def synth_odp_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL ODP per row: stored-mimetype container, presentation
    body with ``draw:page`` / ``draw:frame`` / ``draw:text-box`` nesting
    and ``text:p`` content inside each frame."""

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            pages = []
            for p, n_frames in enumerate(_odp_frame_counts(i)):
                frames = "".join(
                    "<draw:frame><draw:text-box>"
                    f"<text:p>Quadro {k} pagina {p} deck {i}</text:p>"
                    "</draw:text-box></draw:frame>"
                    for k in range(n_frames)
                )
                pages.append(
                    f'<draw:page draw:name="page{p + 1}">{frames}'
                    "</draw:page>"
                )
            content = (
                '<?xml version="1.0" encoding="UTF-8"?>'
                "<office:document-content "
                f'xmlns:office="{_ODF_OFFICE}" '
                f'xmlns:draw="{_ODF_DRAW}" '
                f'xmlns:text="{_ODF_TEXT}">'
                "<office:body><office:presentation>"
                + "".join(pages)
                + "</office:presentation></office:body>"
                "</office:document-content>"
            )
            out.append(_odf_zip(content, _ODP_MIME))
        return pd.Series(out)

    return df.withColumn("payload", make(F.col(id_col)))


ODP_META_SCHEMA = "doc_id long, n_pages int, n_frames int, text string"


def decode_odp(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL ODP text extraction over ``mapInPandas``: mimetype leader
    verified, pages and frames walked in document order, paragraph text
    assembled per frame."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        page_t = f"{{{_ODF_DRAW}}}page"
        frame_t = f"{{{_ODF_DRAW}}}frame"
        p_t = f"{{{_ODF_TEXT}}}p"
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf["payload"]):
                with zipfile.ZipFile(io.BytesIO(bytes(data))) as z:
                    _odf_mimetype_check(z, _ODP_MIME, doc_id)
                    root = ET.fromstring(z.read("content.xml"))
                n_pages = n_frames = 0
                lines: list[str] = []
                for page in root.iter(page_t):
                    n_pages += 1
                    for frame in page.iter(frame_t):
                        n_frames += 1
                        lines.append(
                            "".join(
                                "".join(t.itertext())
                                for t in frame.iter(p_t)
                            )
                        )
                rows.append(
                    (int(doc_id), n_pages, n_frames, "\n".join(lines))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_pages", "n_frames", "text"]
            )

    return df.select(id_col, "payload").mapInPandas(decode, ODP_META_SCHEMA)
