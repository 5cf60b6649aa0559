"""Minimal deterministic PDF support: a writer (for the synthetic pages table)
and a pdfminer-style content-stream text extractor.

The reference extracts PDF text with pdfplumber, concatenating per-page text
with a trailing newline (reference: src/document_parser.py:148-159). That
library is not available in this environment, so the engine ships its own
deterministic layout parser for the class of PDFs the synthetic generator
emits: single-font, uncompressed content streams using ``BT/ET`` text objects
with ``Tj``/``TJ``/``'`` show operators and ``Td``/``TD``/``T*`` line moves.

When pdfplumber IS installed, ``extract_pdf_text`` dispatches to it
(mirroring the reference's page loop exactly, reference:
src/document_parser.py:148-159) — so real-world Flate-compressed PDFs
extract instead of degrading. Without it, payloads outside the built-in
subset (compressed streams, CID fonts) return "" and the pipeline marks the
row ``success=false`` — the same degrade-to-empty behavior as the
reference's exception path (reference: src/document_parser.py:157-159).
The dispatch reads module globals at call time so the seam is testable with
a monkeypatched fake module (tests/test_real_library_gates.py).
"""

from __future__ import annotations

import re

try:  # pragma: no cover - not installed in this environment
    import pdfplumber  # type: ignore

    HAS_PDFPLUMBER = True
except Exception:  # pragma: no cover
    pdfplumber = None
    HAS_PDFPLUMBER = False


# --------------------------------------------------------------------------
# Writer
# --------------------------------------------------------------------------

def _escape_pdf_string(s: str) -> bytes:
    out = s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    # keep the content stream single-line per show op; newlines become line moves
    return out.encode("latin-1", errors="replace")


def write_pdf(pages: list[str]) -> bytes:
    """Serialize text pages into a minimal valid PDF (uncompressed streams).

    Each page's text lines become ``(line) Tj`` show ops separated by ``T*``
    line moves, so ``extract_pdf_text`` round-trips them with '\\n' joins.
    """
    objects: list[bytes] = []

    def add(obj: bytes) -> int:
        objects.append(obj)
        return len(objects)  # 1-based object number

    font_num = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    page_nums: list[int] = []
    kids_placeholder = add(b"")  # pages node, patched later

    for page_text in pages:
        lines = page_text.split("\n")
        ops = [b"BT /F1 12 Tf 14 TL 72 720 Td"]
        for i, line in enumerate(lines):
            if i > 0:
                ops.append(b"T*")
            ops.append(b"(" + _escape_pdf_string(line) + b") Tj")
        ops.append(b"ET")
        stream = b"\n".join(ops)
        content_num = add(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )
        page_num = add(
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
            % (kids_placeholder, font_num, content_num)
        )
        page_nums.append(page_num)

    kids = b" ".join(b"%d 0 R" % n for n in page_nums)
    objects[kids_placeholder - 1] = (
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(page_nums))
    )
    catalog_num = add(b"<< /Type /Catalog /Pages %d 0 R >>" % kids_placeholder)

    buf = bytearray(b"%PDF-1.4\n")
    offsets = [0] * (len(objects) + 1)
    for i, obj in enumerate(objects, start=1):
        offsets[i] = len(buf)
        buf += b"%d 0 obj\n" % i + obj + b"\nendobj\n"
    xref_off = len(buf)
    buf += b"xref\n0 %d\n" % (len(objects) + 1)
    buf += b"0000000000 65535 f \n"
    for i in range(1, len(objects) + 1):
        buf += b"%010d 00000 n \n" % offsets[i]
    buf += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, catalog_num, xref_off)
    )
    return bytes(buf)


# --------------------------------------------------------------------------
# Extractor
# --------------------------------------------------------------------------

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
# tokens inside a text object we care about: string show ops and line moves
_TOKEN_RE = re.compile(
    rb"\((?P<str>(?:\\.|[^\\()])*)\)\s*(?P<op>Tj|')"  # (..) Tj  or  (..) '
    rb"|\[(?P<arr>(?:\\.|[^\]])*)\]\s*TJ"  # [ .. ] TJ
    rb"|(?P<move>T\*|Td|TD)"  # line moves
)
_ARR_STR_RE = re.compile(rb"\((?:\\.|[^\\()])*\)")
_OCTAL_RE = re.compile(rb"\\([0-7]{1,3})")

_SIMPLE_ESCAPES = {
    b"n": b"\n",
    b"r": b"\r",
    b"t": b"\t",
    b"b": b"\b",
    b"f": b"\f",
    b"(": b"(",
    b")": b")",
    b"\\": b"\\",
}


def _unescape_pdf_string(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            m = _OCTAL_RE.match(raw, i)
            if m:
                out.append(int(m.group(1), 8) & 0xFF)
                i = m.end()
                continue
            out += _SIMPLE_ESCAPES.get(nxt, nxt)
            i += 2
        else:
            out += c
            i += 1
    return out.decode("latin-1")


def _extract_stream_text(stream: bytes) -> str:
    """Decode one content stream's text: show ops joined, line moves = '\\n'."""
    parts: list[str] = []
    pending_newline = False
    saw_text = False
    for m in _TOKEN_RE.finditer(stream):
        if m.group("move") is not None:
            if saw_text:
                pending_newline = True
            continue
        if pending_newline:
            parts.append("\n")
            pending_newline = False
        if m.group("op") == b"'":  # ' implies a line move before showing
            if saw_text:
                parts.append("\n")
        if m.group("str") is not None:
            parts.append(_unescape_pdf_string(m.group("str")))
            saw_text = True
        elif m.group("arr") is not None:
            for sm in _ARR_STR_RE.finditer(m.group("arr")):
                parts.append(_unescape_pdf_string(sm.group(0)[1:-1]))
            saw_text = True
    return "".join(parts)


def _extract_pdf_text_pdfplumber(payload: bytes) -> str:
    """Real-library path (reference: src/document_parser.py:148-159): open
    the document, concatenate every page's non-empty text with a trailing
    newline; any library error degrades to "" like the reference's except
    branch (:157-159)."""
    import io

    try:
        with pdfplumber.open(io.BytesIO(payload)) as pdf:
            text = ""
            for page in pdf.pages:
                page_text = page.extract_text()
                if page_text:
                    text += page_text + "\n"
            return text
    except Exception:
        return ""


def extract_pdf_text(payload: bytes) -> str:
    """Extract text from a PDF payload.

    Mirrors the reference's page loop (reference: src/document_parser.py:150-156):
    every page with text contributes ``page_text + '\\n'``. Dispatches to
    pdfplumber when installed (checked at call time so executors and tests
    resolve the gate themselves); otherwise uses the built-in deterministic
    subset extractor.
    """
    if not payload or not payload.startswith(b"%PDF-"):
        return ""
    if HAS_PDFPLUMBER:
        return _extract_pdf_text_pdfplumber(payload)
    text = ""
    for m in _STREAM_RE.finditer(payload):
        page_text = _extract_stream_text(m.group(1))
        if page_text:
            text += page_text + "\n"
    return text
