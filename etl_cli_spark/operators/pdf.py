r"""PDF text extraction over binary payload columns.

The document-side member of the multimodal decode family (the same
pattern as ``jpeg.py`` / ``h264.py``: a real decoder for a documented
subset, an in-repo encoder for deterministic fixtures, and a pure
oracle replay from the fixture spec). PDF is THE training-data
document format — a crawl pipeline that can route images and audio but
not PDFs drops the densest text source it has.

Supported subset (documented, guarded — NOT a general PDF renderer):

- classic ``N 0 obj``/``endobj`` bodies with ``/Type /Page`` objects
  whose ``/Contents`` is a single indirect stream reference
- content streams raw or ``/Filter /FlateDecode`` (zlib)
- text via ``Tj`` (string show), ``'`` (move-and-show), and ``TJ``
  (array of strings with kerning numbers, which are ignored)
- literal ``(...)`` strings with the standard escapes: ``\\``,
  ``\(``, ``\)``, ``\n``, ``\r``, ``\t``, ``\b``, ``\f``, and octal
  ``\ddd`` (digits 0-7); hex ``<...>`` strings incl. whitespace and
  odd-count padding; WinAnsi/Latin-1 byte semantics (the fixture
  encoder's charset)
- a newline is emitted between text runs separated by a ``Td``/``TD``/
  ``T*`` line move or an ``ET``..``BT`` block break; runs inside one
  line concatenate

Everything else (xref streams, object streams, CID/Type0 fonts,
encryption) raises ``NotImplementedError`` inside the per-row
decode, which the batch operator converts to a NULL row — one exotic
PDF in a crawl batch must not kill the job (the module-wide
batch-robustness contract).

Scale posture: payloads decode INSIDE the Arrow task (``mapInPandas``);
only (id, page_idx, text) rows leave the executor — the same
"pixels never shuffle" property as the image decoders.

Reference parity note: vahana/etl_cli has no media or document
operators (base.py/etl.py are HTTP client surface); this family is
part of the training-data extension the brief specifies.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..fanout import fan_out_for_compute
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# encoder (fixtures)
# --------------------------------------------------------------------------


def _pdf_escape(s: str) -> bytes:
    out = []
    for ch in s:
        if ch in ("\\", "(", ")"):
            out.append("\\" + ch)
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\t":
            out.append("\\t")
        else:
            out.append(ch)
    return "".join(out).encode("latin-1")


def encode_pdf(
    pages: list[list[str]], compress: bool = True, hex_strings: bool = False
) -> bytes:
    """Minimal deterministic PDF: one content stream per page, each
    inner list entry one text LINE (``Tj`` + ``Td`` line moves). Line
    text is latin-1 (the subset's charset). ``compress`` wraps content
    streams in FlateDecode — the wild default — with zlib level pinned
    for byte determinism; ``hex_strings`` emits ``<hex>`` strings
    instead of literals (both forms occur in the wild)."""
    objects: list[bytes] = []

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)  # 1-based object number

    page_ids = []
    content_ids = []
    for lines in pages:
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        for i, line in enumerate(lines):
            if i:
                ops.append(b"0 -14 Td")
            if hex_strings:
                ops.append(
                    b"<" + line.encode("latin-1").hex().encode() + b"> Tj"
                )
            else:
                ops.append(b"(" + _pdf_escape(line) + b") Tj")
        ops.append(b"ET")
        data = b" ".join(ops)
        if compress:
            data = zlib.compress(data, 6)
            stream = (
                b"<< /Length " + str(len(data)).encode()
                + b" /Filter /FlateDecode >>\nstream\n" + data + b"\nendstream"
            )
        else:
            stream = (
                b"<< /Length " + str(len(data)).encode()
                + b" >>\nstream\n" + data + b"\nendstream"
            )
        content_ids.append(add(stream))

    font_id = add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    # reserve numbers: pages tree goes after page objects
    first_page_obj = len(objects) + 1
    n = len(pages)
    pages_id = first_page_obj + n
    for k, cid in enumerate(content_ids):
        page_ids.append(
            add(
                b"<< /Type /Page /Parent " + str(pages_id).encode()
                + b" 0 R /MediaBox [0 0 612 792] /Contents "
                + str(cid).encode() + b" 0 R /Resources << /Font << /F1 "
                + str(font_id).encode() + b" 0 R >> >> >>"
            )
        )
    kids = b" ".join(str(p).encode() + b" 0 R" for p in page_ids)
    assert add(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count "
        + str(n).encode() + b" >>"
    ) == pages_id
    catalog_id = add(
        b"<< /Type /Catalog /Pages " + str(pages_id).encode() + b" 0 R >>"
    )

    out = [b"%PDF-1.4\n"]
    offsets = []
    pos = len(out[0])
    for i, body in enumerate(objects, start=1):
        obj = str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
        offsets.append(pos)
        out.append(obj)
        pos += len(obj)
    xref_pos = pos
    xref = [b"xref\n0 " + str(len(objects) + 1).encode() + b"\n",
            b"0000000000 65535 f \n"]
    for off in offsets:
        xref.append(("%010d 00000 n \n" % off).encode())
    out.append(b"".join(xref))
    out.append(
        b"trailer\n<< /Size " + str(len(objects) + 1).encode()
        + b" /Root " + str(catalog_id).encode() + b" 0 R >>\n"
        b"startxref\n" + str(xref_pos).encode() + b"\n%%EOF\n"
    )
    return b"".join(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

# NOTE: lazy body scan — compressed bytes that happen to contain the
# 6-byte sequence "endobj" truncate that object and the affected row
# is skipped (documented subset limitation; stream extraction itself
# slices by /Length, so the common 1-byte collisions are immune)
_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj\b(.*?)endobj", re.DOTALL)
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+0\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:[^\[\]])*)\]")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\x08", b"f": b"\x0c",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _parse_literal(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a ``(...)`` literal starting at the '(' — returns (bytes,
    index past the ')'). Handles escapes, octal, and balanced nesting
    (the spec allows unescaped balanced parens)."""
    assert data[i : i + 1] == b"("
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n:
        ch = data[i : i + 1]
        if ch == b"\\":
            nxt = data[i + 1 : i + 2]
            # octal digits are 0-7 ONLY: '\8' is a backslash before a
            # non-escape char, which the spec says to ignore — treating
            # 8/9 as octal made int(_, 8) raise and silently dropped
            # the whole document (round-14 review finding)
            if nxt in (b"0", b"1", b"2", b"3", b"4", b"5", b"6", b"7"):
                j = i + 1
                oct_digits = b""
                while (
                    j < n
                    and len(oct_digits) < 3
                    and data[j] in b"01234567"
                ):
                    oct_digits += data[j : j + 1]
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
                continue
            out += _ESCAPES.get(nxt, nxt)
            i += 2
            continue
        if ch == b"(":
            depth += 1
        elif ch == b")":
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
        out += ch
        i += 1
    raise NotImplementedError("pdf: unterminated literal string")


def _parse_hex(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a ``<...>`` hex string starting at the '<' — returns
    (bytes, index past the '>'). Whitespace between digits is legal;
    an odd digit count pads a trailing 0 (both per spec)."""
    assert data[i : i + 1] == b"<"
    j = data.find(b">", i)
    if j < 0:
        raise NotImplementedError("pdf: unterminated hex string")
    digits = re.sub(rb"[ \t\r\n]", b"", data[i + 1 : j])
    if not re.fullmatch(rb"[0-9A-Fa-f]*", digits):
        raise NotImplementedError("pdf: malformed hex string")
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii")), j + 1


_TOKEN_RE = re.compile(
    rb"\(|<|\[|\]|\bTj\b|\bTJ\b|\bTd\b|\bTD\b|\bT\*|\bBT\b|\bET\b|'"
)


def _content_text(data: bytes) -> str:
    """Text of one content stream under the subset semantics: runs
    shown by Tj / ' / TJ, newline on line moves (Td/TD/T*) and block
    breaks (ET..BT) between runs. Strings may be literal ``(...)`` or
    hex ``<...>``; ``<<`` dictionary delimiters are skipped."""
    parts: list[str] = []
    pending: bytes | None = None  # last parsed literal, awaiting operator
    stack: list[bytes] = []  # literals inside a TJ array
    in_array = False
    break_before_next = False

    def emit(raw: bytes) -> None:
        nonlocal break_before_next
        text = raw.decode("latin-1")
        if parts and break_before_next:
            parts.append("\n")
        break_before_next = False
        parts.append(text)

    i = 0
    n = len(data)
    while i < n:
        m = _TOKEN_RE.search(data, i)
        if not m:
            break
        tok = m.group(0)
        if tok == b"(":
            lit, j = _parse_literal(data, m.start())
            if in_array:
                stack.append(lit)
            else:
                pending = lit
            i = j
            continue
        if tok == b"<":
            if data[m.start() : m.start() + 2] == b"<<":
                i = m.start() + 2  # dict delimiter, not a string
                continue
            lit, j = _parse_hex(data, m.start())
            if in_array:
                stack.append(lit)
            else:
                pending = lit
            i = j
            continue
        i = m.end()
        if tok == b"[":
            in_array = True
            stack = []
        elif tok == b"]":
            in_array = False
        elif tok == b"TJ":
            emit(b"".join(stack))
            stack = []
        elif tok in (b"Tj", b"'"):
            if tok == b"'":
                break_before_next = True  # ' moves to next line first
            if pending is not None:
                emit(pending)
                pending = None
        elif tok in (b"Td", b"TD", b"T*", b"ET", b"BT"):
            break_before_next = True
    return "".join(parts)


def _pdf_pages(data: bytes) -> list[str]:
    """Per-page text of a PDF payload under the documented subset.
    Raises ValueError for non-PDF payloads, NotImplementedError for
    out-of-subset features — callers null the row either way."""
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a pdf payload")
    if b"/Encrypt" in data:
        raise NotImplementedError("pdf: encrypted files not in subset")
    objs: dict[int, bytes] = {
        int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(data)
    }
    if not objs:
        raise NotImplementedError("pdf: no classic obj bodies (xref streams?)")

    def stream_of(body: bytes) -> bytes:
        head = body.split(b"stream", 1)[0]
        m = re.search(rb"stream\r?\n", body)
        if not m:
            raise NotImplementedError("pdf: /Contents object has no stream")
        start = m.end()
        # slice by /Length when it's a direct value — the spec's own
        # mechanism. The old `(.*?)\r?\nendstream` regex consumed a
        # trailing data byte whenever the COMPRESSED bytes happened to
        # end in \r (1/256 of streams; found by the hypothesis
        # roundtrip property) — binary data and delimiter scanning
        # don't mix.
        lm = re.search(rb"/Length\s+(\d+)(?!\s+0\s+R)", head)
        if lm:
            raw = body[start : start + int(lm.group(1))]
        else:
            m2 = re.compile(rb"(?:\r?\n)?endstream").search(body, start)
            if not m2:
                raise NotImplementedError("pdf: unterminated stream")
            raw = body[start : m2.start()]
        if b"/FlateDecode" in head:
            raw = zlib.decompress(raw)
        elif b"/Filter" in head:
            raise NotImplementedError("pdf: only FlateDecode in subset")
        return raw

    # page order from the pages tree when present (the /Kids array),
    # falling back to object-number order of /Type /Page objects
    page_nums: list[int] = []
    for body in objs.values():
        if b"/Type" in body and b"/Pages" in body and b"/Kids" in body:
            m = _KIDS_RE.search(body)
            if m:
                page_nums = [
                    int(k) for k in re.findall(rb"(\d+)\s+0\s+R", m.group(1))
                ]
            break
    if not page_nums:
        page_nums = sorted(
            num for num, body in objs.items()
            if b"/Type" in body and b"/Page" in body and b"/Pages" not in body
        )
    pages = []
    for num in page_nums:
        body = objs.get(num)
        if body is None:
            raise NotImplementedError(f"pdf: missing page object {num}")
        m = _CONTENTS_RE.search(body)
        if not m:
            raise NotImplementedError("pdf: page without single /Contents ref")
        cbody = objs.get(int(m.group(1)))
        if cbody is None:
            raise NotImplementedError("pdf: dangling /Contents reference")
        pages.append(_content_text(stream_of(cbody)))
    return pages


# --------------------------------------------------------------------------
# operator
# --------------------------------------------------------------------------


def pdf_text(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-page text rows ``(id, page_idx, n_pages, text)`` from PDF
    payloads — the crawl pipeline's PDF->documents step: route by the
    ``%PDF-`` magic upstream, extract here, and the page rows feed the
    SAME text operators (quality, dedup, chunking) as web documents.

    Undecodable or out-of-subset payloads produce NO rows instead of
    failing the batch (the multimodal skip contract — a native
    pdfium/poppler decoder drops into the same per-batch loop at
    production scale). Decode runs inside the Arrow task; only text
    rows shuffle."""
    df = fan_out_for_compute(df)  # parallelize the in-task decode (round-14)
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("page_idx", T.IntegerType(), False),
            T.StructField("n_pages", T.IntegerType(), False),
            T.StructField("text", T.StringType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                p = r[payload_col]
                if p is None:
                    continue
                try:
                    pages = _pdf_pages(bytes(p))
                except (ValueError, NotImplementedError, zlib.error):
                    continue
                rows.extend(
                    (int(r[id_col]), i, len(pages), t)
                    for i, t in enumerate(pages)
                )
            yield pd.DataFrame(
                rows, columns=["id", "page_idx", "n_pages", "text"]
            )

    return df.mapInPandas(batches, out_schema).withColumnsRenamed(
        {"id": id_col}
    )


def make_fake_pdfs(spark, n_docs: int = 24):
    """Deterministic PDF fixture: doc ``i`` has ``1 + i % 3`` pages,
    page ``p`` carrying lines from the spec
    ``line j = f"doc {i} page {p} line {j} (escaped) \\ end"`` for
    ``j < 2 + (i + p) % 2`` — parens and backslashes included so the
    escape path is always exercised. Odd ids compress (FlateDecode),
    even ids don't, and every third id encodes its strings as hex
    ``<...>``, so both stream forms AND both string forms are always
    decoded."""
    from .multimodal import MEDIA_SCHEMA

    rows = []
    for i in range(n_docs):
        pages = [
            [
                f"doc {i} page {p} line {j} (escaped) \\ end"
                for j in range(2 + (i + p) % 2)
            ]
            for p in range(1 + i % 3)
        ]
        payload = encode_pdf(
            pages, compress=bool(i % 2), hex_strings=(i % 3 == 0)
        )
        rows.append((i, "document", bytearray(payload), (None, None, None, None, "pdf")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
