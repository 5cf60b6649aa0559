"""Arrow-batched payload→text extraction UDFs — the only Python in the hot path.

Covers S1 (PDF text scan, reference: src/document_parser.py:148-159) and the
north_star's HTML boilerplate strip. Both are vectorized ``pandas_udf``s over
``BinaryType`` batches; batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (session.py) so worst-case
16 MB payloads (reference cap: src/api_server.py:74) can't blow executor
memory.

S2 (OCR) is feature-gated exactly like the reference gates it (reference:
src/document_parser.py:22-28,128-146): without pytesseract, image payloads
yield "" and the row degrades to ``success=false``.

HTML/text payloads are decoded charset-aware (operators/charset.py: BOM →
in-document declaration → strict-UTF-8 probe → windows-1252 fallback) —
valid-UTF-8 payloads decode byte-identically to the plain UTF-8 path, so
the byte-parity oracles are unchanged; legacy-encoded pages stop being
mojibake.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..html_extract import extract_main_text
from ..minipdf import extract_pdf_text
from .charset import decode_payload

try:  # pragma: no cover - optional, not installed here
    import pytesseract  # type: ignore
    from PIL import Image  # type: ignore

    HAS_OCR = True
except Exception:  # pragma: no cover
    pytesseract = None
    Image = None
    HAS_OCR = False


def _ocr_image_text(payload: bytes) -> str:
    """S2 — OCR path (reference: extract_text_from_image,
    src/document_parser.py:128-146): pytesseract over the decoded image;
    missing library or any decode/OCR error degrades to "" (→
    success=false downstream), exactly the reference's warning paths.
    Gate is read at call time so the seam is testable with fakes."""
    if not HAS_OCR:
        return ""
    try:
        import io

        return pytesseract.image_to_string(Image.open(io.BytesIO(payload)))
    except Exception:
        return ""


def _payload_to_text(payload: bytes | None, kind: str) -> str:
    if payload is None:
        return ""
    if kind == "pdf":
        return extract_pdf_text(payload)
    if kind == "html":
        return extract_main_text(decode_payload(payload)[0])
    if kind == "image":
        return _ocr_image_text(payload)
    if kind == "text":
        return decode_payload(payload)[0]
    return ""


@F.pandas_udf(StringType())
def payload_text_udf(payload: pd.Series, kind: pd.Series) -> pd.Series:
    """Raw text per payload, dispatched on doc_kind. The per-element loop is
    inside the Arrow batch (executor-side), never on the driver."""
    return pd.Series(
        [_payload_to_text(p, k) for p, k in zip(payload, kind)], dtype="object"
    )


# explicit StructType (not a DDL string): DDL parsing needs a live
# SparkContext, which would make this module un-importable driver-side
_DECODE_SCHEMA = StructType(
    [StructField("text", StringType()), StructField("charset", StringType())]
)


@F.pandas_udf(_DECODE_SCHEMA)
def decode_page_udf(payload: pd.Series) -> pd.DataFrame:
    """Charset-diagnostic decode: (decoded_text, detected_charset) per
    payload. A separate UDF so the MAIN pipeline plan keeps its single
    Python stage and fixed result schema; curation uses this to profile
    the encoding mix of a crawl slice."""
    pairs = [decode_payload(p) for p in payload]
    return pd.DataFrame(
        {"text": [t for t, _ in pairs], "charset": [c for _, c in pairs]}
    )
