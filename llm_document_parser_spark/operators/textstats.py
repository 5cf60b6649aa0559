"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, fingerprinting.

All native column expressions (JVM-side). Hash-based primitives use md5 hex
strings so an ANSI-SQL oracle (DuckDB) can reproduce them exactly —
engine-specific hashes (xxhash64) are reserved for partitioning where
cross-engine equality doesn't matter.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# deliberately tiny, deterministic stopword lexicons for the n-gram/stopword
# language heuristic; order = tie-break priority
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "con"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "les", "des", "est", "une", "dans", "pour", "que"],
}


def tokens_col(text: Column) -> Column:
    """Whitespace tokens of lowercased text (portable: single-space split)."""
    return F.split(F.lower(text), " ")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens_col(text)).cast("long")


# A BPE-ish pre-tokenizer: letter runs, digit runs, single non-alnum marks.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(text: Column) -> Column:
    return F.size(
        F.coalesce(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), 0), F.array())
    ).cast("long")


def _stopword_hits(text: Column, lang: str) -> Column:
    pat = r"\b(?:" + "|".join(LANG_STOPWORDS[lang]) + r")\b"
    return F.size(
        F.coalesce(F.regexp_extract_all(F.lower(text), F.lit(pat), 0), F.array())
    ).cast("long")


def lang_id(text: Column) -> Column:
    """Argmax of per-language stopword hits; ties break in LANG_STOPWORDS
    order; zero hits everywhere → 'und' (undetermined)."""
    hits = {lang: _stopword_hits(text, lang) for lang in LANG_STOPWORDS}
    best = F.greatest(*hits.values())
    # earlier langs win ties: build the WHEN chain in priority order
    result = F.lit("und")
    for lang in reversed(list(LANG_STOPWORDS)):
        result = F.when((best > 0) & (hits[lang] == best), F.lit(lang)).otherwise(result)
    return result


def quality_score(text: Column) -> Column:
    """Deterministic quality heuristic in [0,1]: length signal, alpha ratio,
    punctuation ratio, mean word length band. Integer counts + fixed-order
    double arithmetic → bit-stable across engines; round(6) for comparison."""
    n = F.length(text).cast("double")
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", "")).cast("double")
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", "")).cast("double")
    words = F.size(tokens_col(text)).cast("double")
    mean_word = F.when(words > 0, (n - (words - 1)) / words).otherwise(F.lit(0.0))
    length_sig = F.least(n / F.lit(500.0), F.lit(1.0))
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    punct_ok = F.when(
        F.when(n > 0, punct / n).otherwise(F.lit(0.0)) <= 0.1, F.lit(1.0)
    ).otherwise(F.lit(0.0))
    word_ok = F.when((mean_word >= 3.0) & (mean_word <= 10.0), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    return F.round(
        length_sig * 0.3 + alpha_ratio * 0.4 + punct_ok * 0.15 + word_ok * 0.15, 6
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercased text
    (portable rolling-hash stand-in; see dedup.simhash_bits for the
    locality-sensitive variant)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))
