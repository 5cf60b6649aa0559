"""Unicode NFC normalization — canonical-composition pass for web text.

Crawled pages mix precomposed (U+00E9 ``é``) and decomposed (``e`` +
U+0301) spellings of the same text; every byte-keyed stage downstream —
exact dedup digests (``dedup.normalized_digest``), shingle MinHash,
paragraph dedup, inverted-index terms — treats them as DIFFERENT
documents unless the corpus is canonicalized first. Reference analog:
the reference never normalizes (src/document_parser.py:380-400 cleans
whitespace/quotes only) because its fixtures are ASCII; a Common-Crawl
corpus is not, so this is a required curation stage at 10^12 rows.

Spark has no native NFC expression (collation support in Spark 4 does
not expose normalization as a function), so this is one Arrow-batched
``pandas_udf`` over ``unicodedata.normalize`` — the sanctioned slow-path
shape (north_star: "vectorized pandas/Arrow UDFs (no per-row Python)").
``unicodedata`` is stdlib: no gate needed, unlike the tokenizer seam.

Cross-engine oracle: DuckDB ships ``nfc_normalize`` (utf8proc) — the
``doc_nfc_stats`` catalog query checks Python's unicodedata against it
value-for-value (md5 of the normalized UTF-8 bytes), a true
two-independent-implementations check, not a self-oracle.

At 10^12 rows: one ArrowEvalPython stage, no shuffle, no state;
NFC(NFC(x)) == NFC(x) so re-running a resumed partition is idempotent.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


@pandas_udf(StringType())
def nfc_normalize_udf(s: pd.Series) -> pd.Series:
    # str.decode-free: Arrow hands us Python strs; normalize is C-speed
    # per string and the only Python in the stage.
    return s.map(
        lambda t: unicodedata.normalize("NFC", t) if t is not None else None
    )


def nfc_normalize_text(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Replace (or add) a column with its NFC normalization."""
    return df.withColumn(out_col or text_col, nfc_normalize_udf(F.col(text_col)))


def nfc_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc normalization accounting: code-point counts before/after,
    how many composition pairs collapsed, and a digest of the normalized
    bytes (the value the dedup tier would key on)."""
    raw = F.col(text_col)
    norm = nfc_normalize_udf(raw)
    return df.select(
        F.col(id_col),
        F.length(raw).cast("long").alias("raw_chars"),
        F.length(norm).cast("long").alias("nfc_chars"),
        (F.length(raw) - F.length(norm)).cast("long").alias("composed"),
        F.md5(F.encode(norm, "UTF-8")).alias("nfc_digest"),
    )


# ===========================================================================
# mojibake repair -- double-encoded UTF-8, natively
# ===========================================================================
#
# The single most common encoding damage in web corpora: UTF-8 bytes were
# decoded as Latin-1 or Windows-1252 somewhere upstream ("e-acute" becomes
# "A-tilde + copyright-ish pair", em-dash becomes "a-circumflex + EUR + quote")
# and the damage is baked into the stored STRING column. ftfy's core fix,
# re-expressed as native Spark columns (zero Python, full codegen):
#
#   1. translate() the 27 Windows-1252-specific codepoints back to the C1
#      control chars they were decoded from ("sloppy cp1252" inverse),
#   2. structurally validate that the char sequence, read as Latin-1 bytes,
#      IS valid UTF-8 (anchored full-match regex over the exact RFC 3629
#      byte classes -- overlongs and surrogates rejected),
#   3. only then encode(ISO-8859-1) -> decode(UTF-8).
#
# The structural gate makes false repairs vanishingly rare (legit text
# almost never full-matches UTF-8 byte structure after step 1) and makes
# the encode/decode pair provably safe under Spark 4 ANSI mode: every
# admitted char is <= U+00FF (encodable) and the byte string is valid
# UTF-8 by construction (decodable). Reference analog: the service
# normalizes uploads to UTF-8 before parsing (src/document_parser.py
# decode step); at corpus scale the damage is already IN the data and
# must be repaired, not avoided. Composes before nfc_normalize_text:
# repair bytes first, canonicalize codepoints second.

# Windows-1252 high squares (0x80-0x9F, defined slots only) and the C1
# control chars they shadow -- F.translate is positional 1:1.
_WIN1252_CODEPOINTS = [
    0x20AC, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021, 0x02C6,
    0x2030, 0x0160, 0x2039, 0x0152, 0x017D, 0x2018, 0x2019, 0x201C,
    0x201D, 0x2022, 0x2013, 0x2014, 0x02DC, 0x2122, 0x0161, 0x203A,
    0x0153, 0x017E, 0x0178,
]
_WIN1252_AS_C1_BYTES = [
    0x80, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88,
    0x89, 0x8A, 0x8B, 0x8C, 0x8E, 0x91, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0x9B,
    0x9C, 0x9E, 0x9F,
]
WIN1252_HIGH = "".join(chr(c) for c in _WIN1252_CODEPOINTS)
WIN1252_AS_C1 = "".join(chr(c) for c in _WIN1252_AS_C1_BYTES)

def _cc(lo: int, hi: int) -> str:
    """Regex char class over a codepoint range (chars-as-bytes view)."""
    return f"[\\u{lo:04X}-\\u{hi:04X}]"

_CONT = _cc(0x80, 0xBF)  # UTF-8 continuation byte
# chars-as-bytes structural UTF-8 validity (RFC 3629: no overlongs, no
# surrogates, max U+10FFFF); anchored full match over the whole string
UTF8_AS_LATIN1_RE = (
    "^(?:" + _cc(0x00, 0x7F)
    + "|" + _cc(0xC2, 0xDF) + _CONT
    + "|\\u00E0" + _cc(0xA0, 0xBF) + _CONT
    + "|" + _cc(0xE1, 0xEC) + _CONT + "{2}"
    + "|\\u00ED" + _cc(0x80, 0x9F) + _CONT
    + "|" + _cc(0xEE, 0xEF) + _CONT + "{2}"
    + "|\\u00F0" + _cc(0x90, 0xBF) + _CONT + "{2}"
    + "|" + _cc(0xF1, 0xF3) + _CONT + "{3}"
    + "|\\u00F4" + _cc(0x80, 0x8F) + _CONT + "{2}"
    + ")*$"
)
# at least one multibyte lead+continuation -- pure ASCII never "repairs"
MOJIBAKE_LEAD_RE = _cc(0xC2, 0xF4) + _CONT


def _sloppy_cp1252_inverse(text: Column) -> Column:
    return F.translate(text, WIN1252_HIGH, WIN1252_AS_C1)


def mojibake_detected(text: Column) -> Column:
    """True when ``text`` is structurally repairable double-encoded UTF-8
    (after the cp1252 inverse): full UTF-8 byte shape AND at least one
    multibyte sequence. Native boolean column."""
    t = _sloppy_cp1252_inverse(text)
    return t.rlike(MOJIBAKE_LEAD_RE) & t.rlike(UTF8_AS_LATIN1_RE)


def repair_mojibake(text: Column) -> Column:
    """``text`` with one layer of UTF-8-as-Latin-1/cp1252 damage undone
    when (and only when) structurally detected; unchanged otherwise.
    Entirely native: translate + two rlike gates + encode/decode. Nulls
    pass through as null (when/otherwise semantics)."""
    t = _sloppy_cp1252_inverse(text)
    fire = t.rlike(MOJIBAKE_LEAD_RE) & t.rlike(UTF8_AS_LATIN1_RE)
    return F.when(fire, F.decode(F.encode(t, "ISO-8859-1"), "UTF-8")).otherwise(text)
