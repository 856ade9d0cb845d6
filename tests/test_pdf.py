"""PDF text extraction (operators/pdf.py): the documented subset, its
guards, and the batch-robustness contract."""

from __future__ import annotations

import zlib

import pytest

from etl_cli_spark.operators.pdf import (
    _content_text,
    _pdf_pages,
    encode_pdf,
    make_fake_pdfs,
    pdf_text,
)


def test_roundtrip_compressed_and_raw():
    pages = [["hello (world) \\ x", "second line"], ["page two only"]]
    for compress in (True, False):
        assert _pdf_pages(encode_pdf(pages, compress=compress)) == [
            "hello (world) \\ x\nsecond line",
            "page two only",
        ]


def test_content_stream_operators():
    # TJ array concatenates strings and ignores kerning numbers
    assert _content_text(b"BT [(ab) -120 (cd)] TJ ET") == "abcd"
    # ' (move-and-show) starts a new line
    assert _content_text(b"BT (one) Tj (two) ' ET") == "one\ntwo"
    # Td/TD/T* between runs -> newline; runs on one line concatenate
    assert _content_text(b"BT (a) Tj (b) Tj 0 -14 Td (c) Tj ET") == "ab\nc"
    assert _content_text(b"BT (a) Tj T* (b) Tj ET") == "a\nb"
    # ET..BT block break -> newline
    assert _content_text(b"BT (a) Tj ET BT (b) Tj ET") == "a\nb"


def test_literal_string_escapes():
    # standard escapes, octal, and balanced unescaped parens
    assert _content_text(rb"BT (l1\nl2 \(x\) \\ \101) Tj ET") == "l1\nl2 (x) \\ A"
    assert _content_text(b"BT (outer (inner) tail) Tj ET") == "outer (inner) tail"


def test_out_of_subset_guards():
    pages = [["x"]]
    good = encode_pdf(pages)
    with pytest.raises(ValueError):
        _pdf_pages(b"not a pdf")
    with pytest.raises(NotImplementedError, match="encrypted"):
        _pdf_pages(good.replace(b"/Type /Catalog", b"/Encrypt 9 0 R"))
    with pytest.raises(NotImplementedError, match="hex"):
        _content_text(b"BT <48656C6C6F Tj ET")  # unterminated
    with pytest.raises(NotImplementedError, match="hex"):
        _content_text(b"BT <48zz> Tj ET")  # non-hex digits
    # only FlateDecode: another filter name refuses
    bad = good.replace(b"/Filter /FlateDecode", b"/Filter /LZWDecode")
    with pytest.raises(NotImplementedError, match="FlateDecode"):
        _pdf_pages(bad)


def test_page_order_follows_kids_array():
    # swap the Kids order: extraction must follow the tree, not the
    # object numbering
    data = encode_pdf([["first"], ["second"]])
    import re

    m = re.search(rb"/Kids \[(\d+) 0 R (\d+) 0 R\]", data)
    assert m
    swapped = data.replace(
        m.group(0),
        b"/Kids [" + m.group(2) + b" 0 R " + m.group(1) + b" 0 R]",
    )
    assert _pdf_pages(swapped) == ["second", "first"]


def _corrupt_stream(data: bytes) -> bytes:
    i = data.index(b"stream\n") + len(b"stream\n")
    return data[:i] + bytes(b ^ 0xFF for b in data[i : i + 8]) + data[i + 8 :]


def test_pdf_text_operator_skips_bad_rows(spark):
    from etl_cli_spark.operators.multimodal import MEDIA_SCHEMA

    rows = [
        (0, "document", bytearray(encode_pdf([["ok line here"]])),
         (None, None, None, None, "pdf")),
        (1, "document", bytearray(b"%PDF-1.4 garbage with no objects"),
         (None, None, None, None, "pdf")),
        (2, "document", None, (None, None, None, None, "pdf")),
        # corrupted flate bytes -> zlib.error path (note: a missing
        # TRAILER alone is tolerated — the walker reads obj bodies,
        # not the xref)
        (3, "document", bytearray(_corrupt_stream(encode_pdf([["x" * 50]]))),
         (None, None, None, None, "pdf")),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = pdf_text(df).collect()
    assert [(r.media_id, r.text) for r in out] == [(0, "ok line here")]


def test_fixture_matches_spec(spark):
    got = {
        (r.media_id, r.page_idx): (r.n_pages, r.text)
        for r in pdf_text(make_fake_pdfs(spark, n_docs=6)).collect()
    }
    for i in range(6):
        np = 1 + i % 3
        for p in range(np):
            want = "\n".join(
                f"doc {i} page {p} line {j} (escaped) \\ end"
                for j in range(2 + (i + p) % 2)
            )
            assert got[(i, p)] == (np, want)


# --------------------------------------------------------------------------
# property-based: encoder -> decoder roundtrip over the subset charset
# --------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

# latin-1 printable text incl. the chars the escape path must handle
_line = st.text(
    alphabet=st.characters(
        codec="latin-1", categories=("L", "N", "P", "S", "Zs")
    ),
    min_size=0,
    max_size=60,
)


@settings(max_examples=60, deadline=None)
@given(
    pages=st.lists(
        st.lists(_line, min_size=1, max_size=4), min_size=1, max_size=3
    ),
    compress=st.booleans(),
    hex_strings=st.booleans(),
)
def test_encode_decode_roundtrip_property(pages, compress, hex_strings):
    """Any latin-1 page text (parens, backslashes, every printable)
    survives encode -> extract verbatim, both stream forms and both
    string forms."""
    got = _pdf_pages(encode_pdf(pages, compress=compress, hex_strings=hex_strings))
    assert got == ["\n".join(lines) for lines in pages]


def test_backslash_before_non_escape_digit_is_ignored():
    """Octal digits are 0-7 only: '\\8' is a backslash before a
    non-escape char (spec: ignore the backslash), not a crash that
    drops the document."""
    assert _content_text(rb"BT (price \80 and \9 and \0777) Tj ET") == (
        "price 80 and 9 and " + chr(0o77) + "7"
    )


def test_hex_strings():
    """Hex <...> strings: whitespace between digits, odd-count trailing
    pad, TJ arrays, and << dict delimiters skipped."""
    assert _content_text(b"BT <48656C6C6F> Tj ET") == "Hello"
    assert _content_text(b"BT <48 65\r\n6C 6C 6F> Tj ET") == "Hello"
    assert _content_text(b"BT <48656C6C6F7> Tj ET") == "Hellop"  # odd pads 0
    assert _content_text(b"BT [(a) <62> -50 (c)] TJ ET") == "abc"
    # a stray dict (e.g. inline-image params) must not parse as hex
    assert _content_text(b"BT << /W 1 >> (x) Tj ET") == "x"
    # full roundtrip through the encoder's hex mode
    pages = [["hex (line) \\ one", "two"], ["three"]]
    assert _pdf_pages(encode_pdf(pages, hex_strings=True)) == [
        "hex (line) \\ one\ntwo",
        "three",
    ]
