"""PDF → text extraction, pure stdlib — completes the crawl-ingest trio
(`sources/warc.py` WARC demux, `operators/html_text.py` HTML strip): real
crawl corpora are full of PDFs, and a Common-Crawl-scale pipeline needs the
same map-only Arrow pass for them.

Decoder scope (a WET-class text extractor, not a renderer):
* Classic cross-reference TABLES (``startxref`` → ``xref`` sections →
  ``trailer``); a tolerant fallback scans ``N 0 obj`` markers when the
  xref is damaged (common in truncated crawl payloads).
* Object model: dictionaries, arrays, names, numbers, literal ``(...)``
  strings (all escapes: ``\\n \\r \\t \\b \\f \\( \\) \\\\``, 1–3 digit
  octal, line continuations, balanced nested parens), hex ``<...>``
  strings, indirect references.
* Page tree walk: ``/Root → /Pages → /Kids`` recursion, per-page
  ``/Contents`` (single ref or array).
* Streams: ``/Length``-authoritative slicing (indirect Lengths resolve),
  ``endstream`` delimiter fallback, ``/FlateDecode`` via zlib; other
  filters raise :class:`PdfError` (honest deployment boundary — DCT/JBIG2
  image filters need native codecs).
* Content-stream text operators: ``BT..ET`` blocks, ``Tj`` / ``'`` /
  ``"`` shows, ``TJ`` arrays (kern numbers skipped), ``Td/TD/T*`` line
  moves, with string bytes decoded per WinAnsi ≈ Latin-1.

Extraction contract (deterministic, SQL-mirrorable like the HTML stage):
within one page, every line-move operator between shows starts a new
line; lines and pages join with ``\\n``; the document text is the
concatenation.

No counterpart in the reference (training-data scale extension, same
class as the WARC/HTML/JPEG/AVI containers).
"""

from __future__ import annotations

import hashlib
import re
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)


class PdfError(ValueError):
    """Raised for structurally invalid or unsupported PDF payloads."""


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


def _skip_ws(data: bytes, i: int) -> int:
    n = len(data)
    while i < n:
        c = data[i : i + 1]
        if c in (b"\x00", b"\t", b"\n", b"\x0c", b"\r", b" "):
            i += 1
        elif c == b"%":  # comment to end of line
            while i < n and data[i] not in (10, 13):
                i += 1
        else:
            break
    return i


def _parse_literal_string(data: bytes, i: int) -> tuple[bytes, int]:
    """``data[i]`` is ``(``; returns (raw bytes, index past the ``)``)."""
    assert data[i] == 0x28
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x5C:  # backslash escape
            i += 1
            if i >= n:
                break
            e = data[i]
            if e == 0x6E:
                out.append(0x0A)
            elif e == 0x72:
                out.append(0x0D)
            elif e == 0x74:
                out.append(0x09)
            elif e == 0x62:
                out.append(0x08)
            elif e == 0x66:
                out.append(0x0C)
            elif e in (0x28, 0x29, 0x5C):
                out.append(e)
            elif 0x30 <= e <= 0x37:  # 1-3 octal digits
                val = e - 0x30
                for _ in range(2):
                    if i + 1 < n and 0x30 <= data[i + 1] <= 0x37:
                        i += 1
                        val = val * 8 + (data[i] - 0x30)
                    else:
                        break
                out.append(val & 0xFF)
            elif e == 0x0A:  # line continuation
                pass
            elif e == 0x0D:  # \CR or \CRLF continuation
                if i + 1 < n and data[i + 1] == 0x0A:
                    i += 1
            else:  # unknown escape: the char stands for itself
                out.append(e)
        elif c == 0x28:
            depth += 1
            out.append(c)
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
        else:
            out.append(c)
        i += 1
    raise PdfError("unterminated literal string")


def _parse_hex_string(data: bytes, i: int) -> tuple[bytes, int]:
    """``data[i]`` is ``<`` (not ``<<``); returns (bytes, index past ``>``)."""
    j = data.index(b">", i)
    hexdigits = re.sub(rb"[^0-9A-Fa-f]", b"", data[i + 1 : j])
    if len(hexdigits) % 2:
        hexdigits += b"0"
    return bytes.fromhex(hexdigits.decode("ascii")), j + 1


_NAME_END = re.compile(rb"[\x00\t\n\x0c\r ()<>\[\]{}/%]")
_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int) -> None:
        self.num = num


def _parse_object(data: bytes, i: int):
    """Recursive-descent parse of one PDF object starting at ``i``
    (whitespace/comments already skipped). Returns (value, next index).
    Indirect references parse as :class:`_Ref`."""
    c = data[i : i + 1]
    if c == b"<":
        if data[i : i + 2] == b"<<":
            d: dict = {}
            i += 2
            while True:
                i = _skip_ws(data, i)
                if data[i : i + 2] == b">>":
                    return d, i + 2
                if data[i : i + 1] != b"/":
                    raise PdfError("dictionary key is not a name")
                key, i = _parse_object(data, i)
                i = _skip_ws(data, i)
                val, i = _parse_object(data, i)
                d[key] = val
        s, i = _parse_hex_string(data, i)
        return s, i
    if c == b"(":
        return _parse_literal_string(data, i)
    if c == b"/":
        m = _NAME_END.search(data, i + 1)
        j = m.start() if m else len(data)
        return data[i:j].decode("latin-1"), j
    if c == b"[":
        arr = []
        i += 1
        while True:
            i = _skip_ws(data, i)
            if data[i : i + 1] == b"]":
                return arr, i + 1
            v, i = _parse_object(data, i)
            arr.append(v)
    if data[i : i + 4] == b"true":
        return True, i + 4
    if data[i : i + 5] == b"false":
        return False, i + 5
    if data[i : i + 4] == b"null":
        return None, i + 4
    m = _NUM_RE.match(data, i)
    if m:
        # lookahead for "G R" → indirect reference
        tail = _skip_ws(data, m.end())
        m2 = re.match(rb"(\d+)", data[tail:])
        if m2:
            after = _skip_ws(data, tail + m2.end())
            if data[after : after + 1] == b"R" and (
                after + 1 == len(data)
                or data[after + 1] in _WS
                or data[after + 1 : after + 2] in (b"/", b">", b"]", b"[")
            ):
                return _Ref(int(m.group())), after + 1
        txt = m.group().decode("ascii")
        return (float(txt) if b"." in m.group() else int(txt)), m.end()
    raise PdfError(f"unparseable object at offset {i}")


def _xref_offsets(data: bytes) -> dict[int, int]:
    """Object-number → byte-offset map from the classic xref table; falls
    back to a full ``N G obj`` scan when the table is absent/damaged."""
    try:
        tail = data[-256:]
        sx = tail.rindex(b"startxref")
        off = int(tail[sx + 9 :].split()[0])
        i = _skip_ws(data, off)
        if data[i : i + 4] != b"xref":
            raise PdfError("xref keyword missing (xref-stream PDFs scan-fallback)")
        i = _skip_ws(data, i + 4)
        offsets: dict[int, int] = {}
        while not data.startswith(b"trailer", i):
            m = re.match(rb"(\d+)\s+(\d+)", data[i:])
            if not m:
                raise PdfError("malformed xref subsection header")
            start, count = int(m.group(1)), int(m.group(2))
            i = _skip_ws(data, i + m.end())
            for k in range(count):
                ent = data[i : i + 20]
                em = re.match(rb"(\d{10})\s+(\d{5})\s+([nf])", ent)
                if not em:
                    raise PdfError("malformed xref entry")
                if em.group(3) == b"n":
                    offsets[start + k] = int(em.group(1))
                i += 20 if ent[18:20] in (b"\r\n", b" \r", b" \n") else len(
                    em.group(0)
                )
                i = _skip_ws(data, i) if k == count - 1 else i
            i = _skip_ws(data, i)
        return offsets
    except (PdfError, ValueError, IndexError):
        # tolerant fallback: scan object markers (truncated crawl payloads)
        offsets = {}
        for m in re.finditer(rb"(?m)^(\d+)\s+\d+\s+obj\b", data):
            offsets[int(m.group(1))] = m.start()
        if not offsets:
            raise PdfError("no xref table and no object markers")
        return offsets


class _PdfDoc:
    def __init__(self, data: bytes) -> None:
        if not data.startswith(b"%PDF-"):
            raise PdfError("missing %PDF header")
        self.data = data
        self.offsets = _xref_offsets(data)
        self._cache: dict[int, object] = {}
        self._streams: dict[int, bytes] = {}

    def obj(self, num: int):
        if num in self._cache:
            return self._cache[num]
        off = self.offsets.get(num)
        if off is None:
            raise PdfError(f"object {num} not in xref")
        i = _skip_ws(self.data, off)
        m = re.match(rb"(\d+)\s+(\d+)\s+obj", self.data[i:])
        if not m or int(m.group(1)) != num:
            raise PdfError(f"object header mismatch for {num}")
        i = _skip_ws(self.data, i + m.end())
        val, i = _parse_object(self.data, i)
        i = _skip_ws(self.data, i)
        if self.data.startswith(b"stream", i):
            i += 6
            if self.data[i : i + 2] == b"\r\n":
                i += 2
            elif self.data[i : i + 1] == b"\n":
                i += 1
            length = self.resolve(val.get("/Length")) if isinstance(val, dict) else None
            if isinstance(length, int) and self.data.startswith(
                b"endstream", _skip_ws(self.data, i + length)
            ):
                raw = self.data[i : i + length]
            else:  # Length wrong/missing: delimiter fallback
                end = self.data.index(b"endstream", i)
                raw = self.data[i:end].rstrip(b"\r\n")
            self._streams[num] = raw
        self._cache[num] = val
        return val

    def resolve(self, v):
        while isinstance(v, _Ref):
            v = self.obj(v.num)
        return v

    def stream_data(self, num: int) -> bytes:
        d = self.obj(num)
        if num not in self._streams:
            raise PdfError(f"object {num} is not a stream")
        raw = self._streams[num]
        filt = self.resolve(d.get("/Filter")) if isinstance(d, dict) else None
        filters = filt if isinstance(filt, list) else ([filt] if filt else [])
        for fname in filters:
            fname = self.resolve(fname)
            if fname == "/FlateDecode":
                try:
                    raw = zlib.decompress(raw)
                except zlib.error as exc:
                    raise PdfError(f"corrupt FlateDecode stream: {exc}") from exc
            else:
                raise PdfError(f"unsupported stream filter {fname}")
        return raw


def _walk_pages(doc: _PdfDoc, node_ref) -> list[dict]:
    node = doc.resolve(node_ref)
    if not isinstance(node, dict):
        raise PdfError("page-tree node is not a dictionary")
    t = node.get("/Type")
    if t == "/Pages":
        out: list[dict] = []
        for kid in doc.resolve(node.get("/Kids")) or []:
            out.extend(_walk_pages(doc, kid))
        return out
    if t == "/Page":
        return [node]
    raise PdfError(f"unexpected page-tree node type {t}")


#: text-showing / line-moving operators the extractor interprets
_LINE_OPS = {"Td", "TD", "T*"}


def _page_text(content: bytes) -> str:
    """Interpret one page's content stream per the module contract."""
    lines: list[str] = []
    buf: list[str] = []
    operands: list = []
    in_text = False
    i = 0
    n = len(content)

    def flush() -> None:
        if buf:
            lines.append("".join(buf))
            buf.clear()

    while i < n:
        i = _skip_ws(content, i)
        if i >= n:
            break
        c = content[i : i + 1]
        if c == b"(":
            s, i = _parse_literal_string(content, i)
            operands.append(s)
        elif c == b"<" and content[i : i + 2] != b"<<":
            s, i = _parse_hex_string(content, i)
            operands.append(s)
        elif c == b"<":  # inline dict (e.g. BDC property lists)
            _, i = _parse_object(content, i)
            operands.append(None)
        elif c == b"[":
            arr, i = _parse_object(content, i)
            operands.append(arr)
        elif c == b"/":
            name, i = _parse_object(content, i)
            operands.append(name)
        elif _NUM_RE.match(content, i):
            m = _NUM_RE.match(content, i)
            operands.append(float(m.group()))
            i = m.end()
        else:  # operator keyword
            m = _NAME_END.search(content, i + 1)
            j = m.start() if m else n
            op = content[i:j].decode("latin-1")
            i = j
            if op == "BT":
                in_text = True
            elif op == "ET":
                in_text = False
                flush()
            elif in_text and op in _LINE_OPS:
                flush()
            elif in_text and op == "Tj" and operands:
                if isinstance(operands[-1], bytes):
                    buf.append(operands[-1].decode("latin-1"))
            elif in_text and op in ("'", '"') and operands:
                flush()
                if isinstance(operands[-1], bytes):
                    buf.append(operands[-1].decode("latin-1"))
            elif in_text and op == "TJ" and operands:
                arr = operands[-1]
                if isinstance(arr, list):
                    for el in arr:
                        if isinstance(el, bytes):
                            buf.append(el.decode("latin-1"))
            operands = []
    flush()
    return "\n".join(lines)


def pdf_extract_text(data: bytes) -> tuple[str, int]:
    """Extract readable text and the page count from a PDF payload.

    Returns ``(text, n_pages)`` — pages join with ``\\n``. Raises
    :class:`PdfError` for structurally invalid payloads or unsupported
    stream filters.
    """
    doc = _PdfDoc(data)
    # root: via trailer when the classic table parsed, else find /Catalog
    root = None
    m = re.search(rb"trailer", data)
    if m:
        try:
            i = _skip_ws(data, m.end())
            trailer, _ = _parse_object(data, i)
            root = doc.resolve(trailer.get("/Root"))
        except (PdfError, AttributeError, ValueError):
            root = None
    if root is None:
        for num in doc.offsets:
            cand = doc.obj(num)
            if isinstance(cand, dict) and cand.get("/Type") == "/Catalog":
                root = cand
                break
    if not isinstance(root, dict):
        raise PdfError("no document catalog")
    pages = _walk_pages(doc, root.get("/Pages"))
    page_texts: list[str] = []
    for pg in pages:
        contents = doc.resolve(pg.get("/Contents"))
        refs = contents if isinstance(contents, list) else [pg.get("/Contents")]
        chunks: list[bytes] = []
        for ref in refs:
            ref = ref if isinstance(ref, _Ref) else ref
            if isinstance(ref, _Ref):
                chunks.append(doc.stream_data(ref.num))
            elif ref is not None:
                raise PdfError("page /Contents is not a stream reference")
        page_texts.append(_page_text(b"\n".join(chunks)))
    return "\n".join(t for t in page_texts if t != ""), len(pages)


# ---------------------------------------------------------------------------
# Deterministic writer (fixture side).
# ---------------------------------------------------------------------------

_STR_ESC = {0x5C: b"\\\\", 0x28: b"\\(", 0x29: b"\\)"}


def _pdf_string(s: str) -> bytes:
    # Fixture contract: the writer emits WinAnsi (latin-1-coded) literal
    # strings, so text is limited to U+0000–U+00FF. Surface anything wider
    # as the documented PdfError, not a raw UnicodeEncodeError escaping an
    # Arrow kernel as an executor task failure (ADVICE r11).
    try:
        raw = s.encode("latin-1")
    except UnicodeEncodeError as exc:
        raise PdfError(
            "fixture writer encodes latin-1 only; "
            f"text contains U+{ord(s[exc.start]):04X}"
        ) from exc
    out = bytearray(b"(")
    for b in raw:
        out += _STR_ESC.get(b, bytes([b]))
    out += b")"
    return bytes(out)


def pdf_write(pages: list[list[str]], flate: bool = True) -> bytes:
    """Serialize pages of text lines into a spec-correct PDF: catalog →
    page tree → per-page FlateDecode (or raw) content streams with one
    ``Td``+``Tj`` per line, Helvetica/WinAnsi font, an /Info noise object
    (the extractor must ignore non-page strings), and a classic xref
    table with exact byte offsets."""
    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    info_num = font_num + 1
    objs: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: (
            b"<< /Type /Pages /Kids ["
            + b" ".join(b"%d 0 R" % (3 + 2 * k) for k in range(n_pages))
            + b"] /Count %d >>" % n_pages
        ),
        font_num: (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
            b" /Encoding /WinAnsiEncoding >>"
        ),
        info_num: b"<< /Title (Fixture \\(noise\\) title) /Producer (amde) >>",
    }
    streams: dict[int, bytes] = {}
    for k, lines in enumerate(pages):
        page_num, cont_num = 3 + 2 * k, 4 + 2 * k
        objs[page_num] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Resources << /Font << /F1 %d 0 R >> >>"
            b" /Contents %d 0 R >>" % (font_num, cont_num)
        )
        body = bytearray(b"BT /F1 12 Tf 72 720 Td\n")
        for j, line in enumerate(lines):
            if j:
                body += b"0 -14 Td\n"
            body += _pdf_string(line) + b" Tj\n"
        body += b"ET"
        raw = zlib.compress(bytes(body), 9) if flate else bytes(body)
        filt = b"/Filter /FlateDecode " if flate else b""
        objs[cont_num] = b"<< %s/Length %d >>" % (filt, len(raw))
        streams[cont_num] = raw
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num]
        if num in streams:
            out += b"\nstream\n" + streams[num] + b"\nendstream"
        out += b"\nendobj\n"
    xref_at = len(out)
    maxnum = max(objs)
    out += b"xref\n0 %d\n" % (maxnum + 1)
    out += b"0000000000 65535 f \n"
    for num in range(1, maxnum + 1):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R /Info %d 0 R >>\n"
        b"startxref\n%d\n%%%%EOF\n" % (maxnum + 1, info_num, xref_at)
    )
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark plumbing (Arrow map-only passes, mirroring the HTML stage).
# ---------------------------------------------------------------------------


def doc_pdf_pages(
    text: str, doc_id: int, chars_per_line: int = 80, lines_per_page: int = 8
) -> list[list[str]]:
    """The SQL-mirrorable fixture contract: line 1 is the ``Doc <id>``
    heading, then the text in fixed-width ``chars_per_line`` chunks
    (substr grid — no word wrap, so DuckDB recomputes lines exactly),
    ``lines_per_page`` lines per page."""
    lines = [f"Doc {doc_id}"]
    for i in range(0, len(text), chars_per_line):
        lines.append(text[i : i + chars_per_line])
    return [
        lines[p : p + lines_per_page] for p in range(0, len(lines), lines_per_page)
    ]


def attach_pdf_payload(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chars_per_line: int = 80,
    lines_per_page: int = 8,
) -> DataFrame:
    """Deterministic PDF fixture per document (Arrow mapInPandas, no
    shuffle): page layout from :func:`doc_pdf_pages`; even doc ids get
    FlateDecode content streams, odd ids raw streams, so both decode
    paths stay covered by one oracled query."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                did = int(i)
                pages = doc_pdf_pages(
                    str(t), did, chars_per_line, lines_per_page
                )
                ids.append(did)
                payloads.append(pdf_write(pages, flate=(did % 2 == 0)))
            yield pd.DataFrame(
                {"media_id": ids, "media_type": "pdf", "payload": payloads}
            )

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("media_type", StringType()),
            StructField("payload", BinaryType()),
        ]
    )
    made = df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(text_col)
    ).mapInPandas(run, out_schema)
    return made.withColumn("byte_len", F.length("payload").cast("int"))


PDF_EXTRACT_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_pages", LongType()),
        StructField("n_lines", LongType()),
        StructField("n_chars", LongType()),
        StructField("text_md5", StringType()),
    ]
)


def pdf_extract_stats(df: DataFrame) -> DataFrame:
    """Extract text + page count from PDF payloads and emit per-document
    stats ``(media_id, n_pages, n_lines, n_chars, text_md5)`` in one
    Arrow mapInPandas pass (map-only; a production variant also emits the
    text column and feeds the C4/Gopher stages directly)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                text, n_pages = pdf_extract_text(bytes(p))
                rows.append(
                    (
                        mid,
                        n_pages,
                        text.count("\n") + 1 if text else 0,
                        len(text),
                        hashlib.md5(text.encode("utf-8")).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_pages", "n_lines", "n_chars", "text_md5"],
            )

    return df.mapInPandas(run, PDF_EXTRACT_SCHEMA)


PDF_E2E_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_pages", LongType()),
        StructField("n_lines", LongType()),
        StructField("n_words", LongType()),
        StructField("n_chars", LongType()),
        StructField("text_md5", StringType()),
    ]
)


def pdf_extract_e2e(df: DataFrame, with_text: bool = False) -> DataFrame:
    """FUSED PDF-ingest stage: decode each PDF payload, extract text, and
    compute the downstream quality counters (lines, whitespace words,
    chars, text md5) in ONE Arrow pass — the (potentially large) raw PDF
    bytes never cross a stage boundary, mirroring the WARC+HTML fused
    stage (`html_text.warc_html_extract`). Map-only. ``with_text=True``
    appends the ``extracted`` text column for direct C4/Gopher
    consumption (round 12 — the crawl-funnel composition)."""
    import re as _re

    ws = _re.compile(r"\s+")

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                text, n_pages = pdf_extract_text(bytes(p))
                words = [t for t in ws.split(text) if t]
                row = (
                    mid,
                    n_pages,
                    text.count("\n") + 1 if text else 0,
                    len(words),
                    len(text),
                    hashlib.md5(text.encode("utf-8")).hexdigest(),
                )
                rows.append(row + (text,) if with_text else row)
            cols = [
                "media_id", "n_pages", "n_lines", "n_words",
                "n_chars", "text_md5",
            ]
            if with_text:
                cols.append("extracted")
            yield pd.DataFrame(rows, columns=cols)

    schema = PDF_E2E_SCHEMA
    if with_text:
        schema = StructType(
            PDF_E2E_SCHEMA.fields + [StructField("extracted", StringType())]
        )
    return df.mapInPandas(run, schema)
