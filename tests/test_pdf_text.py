"""PDF text-extraction unit tests (`operators/pdf_text.py`).

The wire pin builds a single-page PDF BY HAND as a raw byte literal —
independent of ``pdf_write`` — per the repo's codec discipline (a shared
writer/reader bug cannot fake this one green)."""

from __future__ import annotations

import zlib

import pytest

from azure_medicine_data_engineering_spark.operators.pdf_text import (
    PdfError,
    doc_pdf_pages,
    pdf_extract_text,
    pdf_write,
)


def _handmade_pdf() -> bytes:
    """Single-page, uncompressed, spec-correct PDF with exact xref
    offsets — authored token by token, not via pdf_write."""
    content = (
        b"BT\n/F1 12 Tf\n72 720 Td\n(Hand-built line one) Tj\n"
        b"0 -14 Td\n[(Hand) ( ) (built)] TJ\n"
        b"0 -14 Td\n(with \\(escapes\\) \\\\ and \\101 octal) Tj\nET"
    )
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_at = len(out)
    out += b"xref\n0 5\n0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % xref_at
    )
    return bytes(out)


def test_handmade_wire_pin():
    text, n_pages = pdf_extract_text(_handmade_pdf())
    assert n_pages == 1
    assert text == (
        "Hand-built line one\nHand built\nwith (escapes) \\ and A octal"
    )


def test_roundtrip_flate_and_raw():
    pages = doc_pdf_pages("alpha beta " * 40, 12, 80, 4)
    expect = "\n".join("\n".join(p) for p in pages)
    for flate in (True, False):
        text, n = pdf_extract_text(pdf_write(pages, flate=flate))
        assert text == expect
        assert n == len(pages) == 2


def test_roundtrip_escapes_and_empty():
    t, n = pdf_extract_text(pdf_write([["a (b) c \\ d", "e\tf"]], flate=True))
    assert t == "a (b) c \\ d\ne\tf" and n == 1
    t, n = pdf_extract_text(pdf_write(doc_pdf_pages("", 3), flate=False))
    assert t == "Doc 3" and n == 1


def test_xref_fallback_scan():
    data = pdf_write(doc_pdf_pages("gamma delta " * 30, 9), flate=True)
    chopped = data[: data.rindex(b"xref")]  # damaged trailer/xref
    text, n_pages = pdf_extract_text(chopped)
    assert text.startswith("Doc 9\n") and n_pages == 1


def test_hex_strings_and_quote_operator():
    # hex-string show via the ' (move-and-show) operator
    from azure_medicine_data_engineering_spark.operators.pdf_text import (
        _page_text,
    )

    assert _page_text(b"BT (line1) Tj <6C696E6532> ' ET") == "line1\nline2"
    # odd-length hex pads a trailing zero nibble: <6C6> -> 'l', chr(0x60)
    assert _page_text(b"BT <6C60> Tj ET") == "l`"


def test_error_surface():
    with pytest.raises(PdfError):
        pdf_extract_text(b"GIF89a not a pdf")
    # fixture writer is latin-1 coded: wider chars surface as PdfError,
    # not a raw UnicodeEncodeError from inside an Arrow kernel (ADVICE r11)
    with pytest.raises(PdfError, match="latin-1"):
        pdf_write([["日本語"]])
    # full latin-1 range still round-trips
    blob = pdf_write([["héllo £5 ±2"]])
    assert pdf_extract_text(blob)[0] == "héllo £5 ±2"
    # unsupported filter
    bad = pdf_write([["x"]], flate=True).replace(
        b"/Filter /FlateDecode", b"/Filter /DCTDecode  "
    )
    with pytest.raises(PdfError):
        pdf_extract_text(bad)
    # corrupt flate payload: flip bytes inside the stream
    good = pdf_write([["hello world"]], flate=True)
    at = good.index(b"stream\n") + 10
    corrupt = good[:at] + bytes([good[at] ^ 0xFF, good[at + 1] ^ 0xFF]) + good[at + 2 :]
    with pytest.raises(PdfError):
        pdf_extract_text(corrupt)


def test_info_noise_not_extracted():
    # the /Info title contains parens text that must never leak into output
    text, _ = pdf_extract_text(pdf_write([["only line"]], flate=False))
    assert text == "only line"
    assert "Fixture" not in text


def test_doc_pdf_pages_grid():
    pages = doc_pdf_pages("a" * 161, 5, 80, 4)
    flat = [ln for p in pages for ln in p]
    assert flat == ["Doc 5", "a" * 80, "a" * 80, "a"]
    assert [len(p) for p in pages] == [4]
    pages = doc_pdf_pages("a" * 400, 5, 80, 4)
    assert [len(p) for p in pages] == [4, 2]
