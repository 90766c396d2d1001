"""Text-markup document decoders — REAL parsers, stdlib-only.

Extends the decode family in ``documents.py`` (DOCX/XLSX/PDF/CSV) with the
markup formats on Docling's accepted-format list
(/root/reference/app/providers/docling_provider.py:64-74): **HTML**,
**RTF**, **XML** and **Markdown**. Each is a genuine parse, not a regex
strip:

- **HTML**: a real tokenizer (``html.parser.HTMLParser`` subclass) with a
  skip-stack for ``<script>``/``<style>``, comment suppression, entity
  decoding (named and numeric charrefs), and block-level text assembly —
  the things naive ``<[^>]*>`` stripping gets wrong (script bodies leak,
  entities stay encoded).
- **RTF**: a from-scratch state machine over RTF control words — group
  nesting, ignorable destinations (``{\\*\\...}``, ``fonttbl``,
  ``colortbl``, ``stylesheet``, ``info``), cp1252 hex escapes
  (``\\'e9``), ``\\uN`` unicode escapes with ``\\ucN`` skip counts, and
  escaped literals ``\\{`` ``\\}`` ``\\\\``.
- **XML**: namespaced ``ElementTree`` parse of a record export —
  attribute reads, typed child values, document-order text assembly.
- **Markdown**: a from-scratch block + inline pass — ATX headings,
  emphasis, inline code (protected FIRST, so ``*`` inside backticks is
  literal), and ``[text](url)`` links reduced to their text.
- **TXT**: encoding-sniffed plain text — BOM dispatch (UTF-8 /
  UTF-16 LE / UTF-16 BE), strict UTF-8 attempt, Latin-1 fallback.
- **AsciiDoc**: line-oriented block pass (title, sections, attribute
  entries, comments, lists) + inline span reduction.

Same discipline as the rest of the family: the synth side emits payloads
derived from ``doc_id`` by closed-form arithmetic (so a DuckDB oracle
predicts the decoded values exactly), the decode side is an Arrow-batched
``mapInPandas`` over an opaque binary column — payload bytes never leave
the executors, no per-row Python UDFs — and malformed bytes raise instead
of passing silently.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from html.parser import HTMLParser
from xml.etree import ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "synth_html_payload",
    "decode_html",
    "synth_rtf_payload",
    "decode_rtf",
    "synth_xml_payload",
    "decode_xml",
    "synth_md_payload",
    "decode_md",
    "synth_txt_payload",
    "decode_txt",
    "synth_adoc_payload",
    "decode_adoc",
]


# --------------------------------------------------------------------------
# HTML
# --------------------------------------------------------------------------
def _html_lines(i: int) -> list[str]:
    """Visible-text generation rule mirrored by _HTML_SQL: the h1, one line
    per paragraph (entities decoded), then the trailing link text."""
    out = [f"Doc {i}"]
    out += [f"Linha {j} & texto {i}." for j in range(1 + i % 4)]
    out.append(f"mais {i}")
    return out


def synth_html_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL HTML page per row: head with ``<title>``, a ``<style>``
    block and a ``<script>`` body (both MUST NOT leak into the text), an
    HTML comment, named (``&amp;``) and numeric (``&#101;``) character
    references inside paragraph text, and an anchor. The visible text is
    predicted exactly by ``_html_lines``."""

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            paras = "".join(
                # &amp; -> '&', t&#101;xto -> 'texto' after entity decode
                f"<p class='l{j}'>Linha {j} &amp; t&#101;xto {i}.</p>"
                for j in range(1 + i % 4)
            )
            page = (
                "<!DOCTYPE html><html><head>"
                f"<title>Doc {i}</title>"
                "<style>p { color: #333; }</style>"
                f"<script>var x = {i}; if (x > 0) {{ x--; }}</script>"
                "</head><body>"
                f"<!-- hidden {i} -->"
                f"<h1>Doc {i}</h1>{paras}"
                f"<a href=\"/next/{i}\">mais {i}</a>"
                "</body></html>"
            )
            out.append(page.encode("utf-8"))
        return pd.Series(out)

    return df.withColumn("payload", make(F.col(id_col)))


HTML_META_SCHEMA = "doc_id long, n_blocks int, n_links int, text string"

#: elements whose closing tag flushes the current buffer as one text line
_HTML_BLOCKS = {"h1", "h2", "h3", "p", "li", "a", "td", "title"}
#: raw-text elements whose character data is never visible
_HTML_RAW = {"script", "style"}


class _TextExtractor(HTMLParser):
    """Visible-text extraction: skip-stack for script/style, block buffer
    flushed per block element, comments dropped (``convert_charrefs=True``
    decodes entities in the data stream). Head content other than title is
    invisible because only block-element buffers are emitted."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.lines: list[str] = []
        self.n_links = 0
        self._skip = 0
        self._buf: list[str] = []
        self._in_block = 0
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        if tag in _HTML_RAW:
            self._skip += 1
        elif tag in _HTML_BLOCKS:
            if tag == "a":
                self.n_links += 1
            if tag == "title":
                self._in_title = True
            self._in_block += 1
            self._buf = []

    def handle_endtag(self, tag):
        if tag in _HTML_RAW:
            self._skip = max(0, self._skip - 1)
        elif tag in _HTML_BLOCKS and self._in_block:
            self._in_block -= 1
            text = "".join(self._buf).strip()
            if tag == "title":
                self._in_title = False  # title is metadata, not body text
            elif text:
                self.lines.append(text)
            self._buf = []

    def handle_data(self, data):
        if self._skip == 0 and self._in_block and not self._in_title:
            self._buf.append(data)


def decode_html(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL HTML visible-text extraction over ``mapInPandas``."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf["payload"]):
                raw = bytes(data).decode("utf-8")
                if "<html" not in raw[:256].lower():
                    raise ValueError(f"not an HTML document for id {doc_id}")
                p = _TextExtractor()
                p.feed(raw)
                p.close()
                rows.append(
                    (
                        int(doc_id),
                        len(p.lines),
                        p.n_links,
                        "\n".join(p.lines),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_blocks", "n_links", "text"]
            )

    return df.select(id_col, "payload").mapInPandas(decode, HTML_META_SCHEMA)


# --------------------------------------------------------------------------
# RTF
# --------------------------------------------------------------------------
def _rtf_lines(i: int) -> list[str]:
    """Paragraph rule mirrored by _RTF_SQL (á = \\'e1 in cp1252)."""
    return [f"Parágrafo {j} de {i}" for j in range(1 + i % 4)]


def synth_rtf_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL RTF per row: font table and an ignorable
    ``{\\*\\generator}`` destination (both skipped by the reader), bold
    toggles splitting words, cp1252 hex escapes for the accents, a ``\\u``
    unicode escape with its ``\\uc1`` fallback byte, and escaped braces."""

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            paras = []
            for j, line in enumerate(_rtf_lines(i)):
                # "Parágrafo {j} de {i}" with the accent as a hex escape
                # and "de" wrapped in a bold toggle
                body = (
                    f"Par\\'e1grafo {j} "
                    + "{\\b de} "
                    + str(i)
                )
                paras.append(body)
            doc = (
                "{\\rtf1\\ansi\\ansicpg1252\\deff0"
                "{\\fonttbl{\\f0\\froman Times New Roman;}}"
                "{\\*\\generator graft " + str(i) + ";}"
                "\\f0 "
                + "\\par ".join(paras)
                + "}"
            )
            out.append(doc.encode("cp1252"))
        return pd.Series(out)

    return df.withColumn("payload", make(F.col(id_col)))


RTF_META_SCHEMA = "doc_id long, n_paragraphs int, text string"

#: destination control words whose whole group is invisible
_RTF_DESTINATIONS = {
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "header", "footer",
}
_RTF_CW = re.compile(rb"\\([a-zA-Z]+)(-?\d+)? ?|\\'([0-9a-fA-F]{2})|\\(.)")


def _rtf_text(data: bytes) -> list[str]:
    """From-scratch RTF reader: returns the paragraph list.

    State machine over the token stream: group depth tracking with a
    skip-until-depth for destinations, ``\\'xx`` cp1252 escapes, ``\\uN``
    with ``\\ucN`` replacement-skip handling, ``\\par`` breaks, and the
    escaped literals ``\\{`` ``\\}`` ``\\\\`` ``\\~``(nbsp)."""
    if not data.startswith(b"{\\rtf"):
        raise ValueError("not an RTF document")
    paras: list[str] = []
    buf: list[str] = []
    depth = 0
    skip_until: int | None = None
    uc_skip = 1
    pending_skip = 0
    pos = 0
    n = len(data)

    def flush():
        text = "".join(buf).strip()
        if text:
            paras.append(text)
        buf.clear()

    while pos < n:
        ch = data[pos:pos + 1]
        if ch == b"{":
            depth += 1
            pos += 1
            # an ignorable destination: {\* ...}
            if skip_until is None and data[pos:pos + 2] == b"\\*":
                skip_until = depth
            continue
        if ch == b"}":
            depth -= 1
            if skip_until is not None and depth < skip_until:
                skip_until = None
            pos += 1
            continue
        if ch == b"\\":
            m = _RTF_CW.match(data, pos)
            if not m:
                pos += 1
                continue
            pos = m.end()
            word, param, hexbyte, esc = (
                m.group(1), m.group(2), m.group(3), m.group(4)
            )
            if skip_until is not None:
                continue
            if hexbyte is not None:
                if pending_skip:
                    pending_skip -= 1
                else:
                    buf.append(bytes([int(hexbyte, 16)]).decode("cp1252"))
                continue
            if esc is not None:
                if esc in (b"{", b"}", b"\\"):
                    buf.append(esc.decode("ascii"))
                elif esc == b"~":
                    buf.append("\u00a0")
                continue
            w = word.decode("ascii")
            if w in _RTF_DESTINATIONS:
                skip_until = depth
            elif w == "par":
                flush()
            elif w == "uc":
                uc_skip = int(param or 1)
            elif w == "u":
                buf.append(chr(int(param) % 0x10000))
                pending_skip = uc_skip
            elif w == "tab":
                buf.append("\t")
            # formatting words (\b, \i, \f0, ...) carry no text
            continue
        # plain character data
        if skip_until is None:
            c = ch.decode("cp1252")
            if c not in ("\r", "\n"):
                if pending_skip:
                    pending_skip -= 1
                else:
                    buf.append(c)
        pos += 1
    flush()
    return paras


def decode_rtf(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL RTF text extraction over ``mapInPandas``."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf["payload"]):
                paras = _rtf_text(bytes(data))
                rows.append(
                    (int(doc_id), len(paras), "\n".join(paras))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_paragraphs", "text"]
            )

    return df.select(id_col, "payload").mapInPandas(decode, RTF_META_SCHEMA)


# --------------------------------------------------------------------------
# XML
# --------------------------------------------------------------------------
_XML_NS = "urn:spark-graft:export"


def _xml_shape(i: int) -> int:
    return 1 + i % 4  # records per export


def _xml_qty(i: int, k: int) -> int:
    return (i + 5 * k) % 30


def synth_xml_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL namespaced XML record export per row: a ``count``
    attribute the decoder must cross-check, per-record ``id`` attributes,
    and typed child elements (string name, integer qty)."""

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            nrec = _xml_shape(i)
            recs = "".join(
                f'<rec id="{k}"><name>item {k} of {i}</name>'
                f"<qty>{_xml_qty(i, k)}</qty></rec>"
                for k in range(nrec)
            )
            doc = (
                "<?xml version='1.0' encoding='UTF-8'?>"
                f'<export xmlns="{_XML_NS}" count="{nrec}">{recs}</export>'
            )
            out.append(doc.encode("utf-8"))
        return pd.Series(out)

    return df.withColumn("payload", make(F.col(id_col)))


XML_META_SCHEMA = "doc_id long, n_records int, sum_qty bigint, text string"


def decode_xml(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL namespaced XML parse over ``mapInPandas``: ElementTree walk with
    qualified names, count-attribute validation (a mismatch raises), typed
    ``qty`` accumulation and document-order name assembly."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rec_t, name_t, qty_t = (
            f"{{{_XML_NS}}}rec", f"{{{_XML_NS}}}name", f"{{{_XML_NS}}}qty"
        )
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf["payload"]):
                root = ET.fromstring(bytes(data))
                recs = list(root.iter(rec_t))
                declared = int(root.get("count", "-1"))
                if declared != len(recs):
                    raise ValueError(
                        f"count attribute {declared} != {len(recs)} records"
                        f" for id {doc_id}"
                    )
                qty = sum(int(r.find(qty_t).text) for r in recs)
                names = "\n".join(r.find(name_t).text for r in recs)
                rows.append((int(doc_id), len(recs), qty, names))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_records", "sum_qty", "text"]
            )

    return df.select(id_col, "payload").mapInPandas(decode, XML_META_SCHEMA)


# --------------------------------------------------------------------------
# Markdown
# --------------------------------------------------------------------------
def _md_lines(i: int) -> list[str]:
    """Plain-text rule mirrored by _MD_SQL."""
    out = [f"Doc {i}"]
    out += [
        f"Texto enfase{j} e code*{j} de link{j} aqui."
        for j in range(1 + i % 3)
    ]
    return out


def synth_md_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL Markdown document per row: an ATX heading, emphasis
    spans, inline code containing a ``*`` (which must NOT be treated as
    emphasis — the classic ordering bug), and ``[text](url)`` links."""

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            lines = [f"# Doc {i}", ""]
            for j in range(1 + i % 3):
                lines.append(
                    f"Texto *enfase{j}* e `code*{j}` de"
                    f" [link{j}](/u/{i}) aqui."
                )
                lines.append("")
            out.append("\n".join(lines).encode("utf-8"))
        return pd.Series(out)

    return df.withColumn("payload", make(F.col(id_col)))


MD_META_SCHEMA = (
    "doc_id long, n_headings int, n_links int, n_code_spans int, text string"
)

_MD_CODE = re.compile(r"`([^`]*)`")
_MD_LINK = re.compile(r"\[([^\]]*)\]\(([^)]*)\)")
_MD_EMPH = re.compile(r"(\*\*|\*|__|_)(?=\S)(.+?)(?<=\S)\1")


def _md_to_text(src: str) -> tuple[list[str], int, int, int]:
    """Block + inline Markdown pass: returns (lines, n_headings, n_links,
    n_code_spans). Inline code is lifted out FIRST so its content is
    protected from emphasis/link rules, then restored verbatim."""
    lines: list[str] = []
    n_head = n_link = n_code = 0
    for raw in src.split("\n"):
        line = raw.rstrip()
        if not line.strip():
            continue
        m = re.match(r"(#{1,6})\s+(.*)", line)
        if m:
            n_head += 1
            line = m.group(2)
        # protect code spans
        codes: list[str] = []

        def stash(mm):
            codes.append(mm.group(1))
            return f"\x00{len(codes) - 1}\x00"

        line = _MD_CODE.sub(stash, line)
        n_code += len(codes)
        n_link += len(_MD_LINK.findall(line))
        line = _MD_LINK.sub(r"\1", line)
        line = _MD_EMPH.sub(r"\2", line)
        for k, c in enumerate(codes):
            line = line.replace(f"\x00{k}\x00", c)
        lines.append(line)
    return lines, n_head, n_link, n_code


def decode_md(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL Markdown-to-text over ``mapInPandas``."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf["payload"]):
                lines, nh, nl, nc = _md_to_text(bytes(data).decode("utf-8"))
                rows.append((int(doc_id), nh, nl, nc, "\n".join(lines)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_headings", "n_links", "n_code_spans", "text",
                ],
            )

    return df.select(id_col, "payload").mapInPandas(decode, MD_META_SCHEMA)


# --------------------------------------------------------------------------
# Plain text (encoding-sniffed)
# --------------------------------------------------------------------------
def _txt_lines(i: int) -> list[str]:
    """Line rule mirrored by _TXT_SQL (ç forces a non-ASCII byte in every
    encoding branch)."""
    return [f"linha {j} çedilha {i}" for j in range(1 + i % 3)]


def _txt_encoding(i: int) -> str:
    return ("utf-8-sig", "utf-16-le", "utf-16-be", "latin-1")[i % 4]


def synth_txt_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a plain-text payload per row, rotating through the encodings
    a real drop-box actually contains: UTF-8 with BOM, UTF-16 LE/BE (with
    BOMs), and bare Latin-1. The ``ç`` in every line means a decoder that
    assumes UTF-8 either crashes (Latin-1 bytes) or keeps the BOM/NULs
    (UTF-16) — sniffing is load-bearing, not decorative."""
    import codecs

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            text = "\n".join(_txt_lines(i))
            enc = _txt_encoding(i)
            if enc == "utf-16-le":
                data = codecs.BOM_UTF16_LE + text.encode(enc)
            elif enc == "utf-16-be":
                data = codecs.BOM_UTF16_BE + text.encode(enc)
            else:  # utf-8-sig writes its own BOM; latin-1 has none
                data = text.encode(enc)
            out.append(data)
        return pd.Series(out)

    return df.withColumn("payload", make(F.col(id_col)))


TXT_META_SCHEMA = "doc_id long, encoding string, n_lines int, text string"


def decode_txt(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL encoding-sniffed text read over ``mapInPandas``: BOM dispatch
    (UTF-8 / UTF-16 LE / UTF-16 BE), then strict UTF-8 attempt, then
    Latin-1 fallback — the classic mail-room text loader, made explicit.
    Returns the encoding it chose so tests can pin the sniff itself."""
    import codecs

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf["payload"]):
                data = bytes(data)
                if data.startswith(codecs.BOM_UTF8):
                    enc, text = "utf-8-sig", data.decode("utf-8-sig")
                elif data.startswith(codecs.BOM_UTF16_LE):
                    enc, text = "utf-16-le", data[2:].decode("utf-16-le")
                elif data.startswith(codecs.BOM_UTF16_BE):
                    enc, text = "utf-16-be", data[2:].decode("utf-16-be")
                else:
                    try:
                        enc, text = "utf-8", data.decode("utf-8", "strict")
                    except UnicodeDecodeError:
                        enc, text = "latin-1", data.decode("latin-1")
                lines = text.split("\n")
                rows.append((int(doc_id), enc, len(lines), text))
            yield pd.DataFrame(
                rows, columns=["doc_id", "encoding", "n_lines", "text"]
            )

    return df.select(id_col, "payload").mapInPandas(decode, TXT_META_SCHEMA)


# --------------------------------------------------------------------------
# AsciiDoc
# --------------------------------------------------------------------------
def _adoc_items(i: int) -> list[str]:
    return [f"item {k} de {i}" for k in range(1 + i % 3)]


def synth_adoc_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL AsciiDoc document per row: a document title, an
    attribute entry (``:autor: ...`` — metadata, not body text), a section
    heading, a comment line (must not leak), bold/monospace inline spans,
    and a ``*`` unordered list."""

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            lines = [
                f"= Documento {i}",
                f":autor: graft{i}",
                "",
                f"== Secao {i % 7}",
                "",
                f"// comentario {i}",
                f"Texto *forte{i}* e `mono{i}` aqui.",
                "",
            ]
            lines += [f"* {it}" for it in _adoc_items(i)]
            out.append("\n".join(lines).encode("utf-8"))
        return pd.Series(out)

    return df.withColumn("payload", make(F.col(id_col)))


ADOC_META_SCHEMA = (
    "doc_id long, title string, n_sections int, n_list_items int, "
    "text string"
)


def decode_adoc(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL AsciiDoc-to-text over ``mapInPandas``: a line-oriented block
    pass (title ``= ``, sections ``== ``, attribute entries ``:name:``,
    ``//`` comments, ``* `` list items) plus the inline span reduction
    (``*bold*``, ``_italic_``, `` `mono` ``). Attribute entries and
    comments are metadata: they must NOT appear in the text."""
    attr_re = re.compile(r"^:[\w-]+:.*$")
    strong_re = re.compile(r"\*(?=\S)([^*]+?)(?<=\S)\*")
    em_re = re.compile(r"_(?=\S)([^_]+?)(?<=\S)_")
    mono_re = re.compile(r"`([^`]+)`")

    def inline(s: str) -> str:
        s = mono_re.sub(r"\1", s)
        s = strong_re.sub(r"\1", s)
        return em_re.sub(r"\1", s)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf["payload"]):
                title = ""
                n_sec = n_item = 0
                body: list[str] = []
                for raw in bytes(data).decode("utf-8").split("\n"):
                    line = raw.rstrip()
                    if not line.strip() or line.startswith("//"):
                        continue
                    if line.startswith("= ") and not title:
                        title = line[2:]
                        body.append(title)
                    elif line.startswith("== "):
                        n_sec += 1
                        body.append(line[3:])
                    elif attr_re.match(line):
                        continue  # attribute entry: metadata only
                    elif line.startswith("* "):
                        n_item += 1
                        body.append(inline(line[2:]))
                    else:
                        body.append(inline(line))
                rows.append(
                    (int(doc_id), title, n_sec, n_item, "\n".join(body))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "title", "n_sections", "n_list_items", "text",
                ],
            )

    return df.select(id_col, "payload").mapInPandas(decode, ADOC_META_SCHEMA)
