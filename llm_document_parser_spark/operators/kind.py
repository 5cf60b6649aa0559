"""Doc-kind classification from magic bytes / MIME heuristics — native.

Generalizes the reference's extension dispatch (reference:
src/api_server.py:1936-1941, src/document_parser.py:756-759) into
content-based detection per BASELINE.json north_star: ``%PDF-`` prefix →
pdf; HTML markers in the first 1 KiB → html; otherwise text. Pure column
expressions — the predicate can be evaluated (and pushed ahead of the
expensive extraction UDFs) without any Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_HTML_MARKER = r"(?i)<!doctype\s+html|<html[\s>]|<head[\s>]|<body[\s>]"

# image magic bytes (the reference dispatches on file EXTENSION,
# src/document_parser.py:756-759; content sniffing is the crawl-scale
# equivalent — extensions don't exist in a pages table). Every entry must
# be strong: either contain a non-ASCII/control byte or be ≥6 bytes, so no
# plausible text/HTML prefix can collide ("BMW…", "GIF8 is a format…").
IMAGE_MAGICS: tuple[bytes, ...] = (
    b"\x89PNG",      # PNG
    b"\xff\xd8\xff",  # JPEG
    b"GIF87a",        # GIF87a (full 6-byte signature)
    b"GIF89a",        # GIF89a
    b"II*\x00",       # TIFF little-endian
    b"MM\x00*",       # TIFF big-endian
)

# BMP's magic is just ASCII "BM" — too weak alone. Require the
# BITMAPFILEHEADER reserved fields (bytes 6-9) to be zero as well, which no
# text starting with "BM" satisfies (those offsets would hold printable
# ASCII).
_BMP_RESERVED_ZERO = b"\x00\x00\x00\x00"


def is_image_payload(payload: bytes) -> bool:
    """Pure-Python image sniff — single source of truth shared with the
    column expression below and html_extract.sniff_doc_kind (the oracle)."""
    if any(payload.startswith(m) for m in IMAGE_MAGICS):
        return True
    return (
        payload.startswith(b"BM")
        and len(payload) >= 10
        and payload[6:10] == _BMP_RESERVED_ZERO
    )


def doc_kind_col(payload: Column) -> Column:
    # cast(binary as string) reinterprets bytes without UTF-8 validation —
    # decode() would throw MALFORMED_CHARACTER_CODING on real-web garbage
    head = F.substring(payload, 1, 1024).cast("string")
    # UTF-16/32 BOM'd HTML NUL-interleaves the ASCII marker bytes; strip
    # NULs before marker matching, gated on the BOM so binary junk can't
    # accidentally assemble a marker (parity: html_extract.sniff_doc_kind)
    has_wide_bom = (
        F.substring(payload, 1, 2).isin(F.lit(b"\xff\xfe"), F.lit(b"\xfe\xff"))
        | (F.substring(payload, 1, 4) == F.lit(b"\x00\x00\xfe\xff"))
    )
    head = F.when(
        has_wide_bom, F.regexp_replace(head, "\\x00", "")
    ).otherwise(head)
    is_image = F.lit(False)
    for magic in IMAGE_MAGICS:
        is_image = is_image | (F.substring(payload, 1, len(magic)) == F.lit(magic))
    is_image = is_image | (
        (F.substring(payload, 1, 2) == F.lit(b"BM"))
        & (F.substring(payload, 7, 4) == F.lit(_BMP_RESERVED_ZERO))
    )
    return (
        F.when(payload.isNull() | (F.length(payload) == 0), F.lit("empty"))
        .when(F.substring(payload, 1, 5) == F.lit(b"%PDF-"), F.lit("pdf"))
        .when(is_image, F.lit("image"))
        .when(head.rlike(_HTML_MARKER), F.lit("html"))
        .otherwise(F.lit("text"))
    )


def document_type_col(text: Column) -> Column:
    """Heuristic document-type classifier (keyword rules over cleaned text).

    Stands in for the reference's optional ML classification step
    (reference: src/document_parser.py:771-775) when no trained model is
    supplied; the Spark ML pipeline in ml/classify.py is the trained
    equivalent. Rule order is part of the spec.
    """
    lower = F.lower(text)
    return (
        F.when(lower.contains("invoice"), F.lit("invoice"))
        .when(lower.contains("receipt"), F.lit("receipt"))
        .when(lower.contains("contract"), F.lit("contract"))
        .when(lower.contains("contact:"), F.lit("contact"))
        .otherwise(F.lit("general"))
    )
