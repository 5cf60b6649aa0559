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
