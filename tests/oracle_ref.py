"""Pure-Python oracle replicating the reference's extraction semantics.

Used ONLY by tests to generate expected fixtures — never imported by engine
code. Each function mirrors a reference pure function by citation, using
Python ``re`` (the reference's regex engine), so the Spark engine's
Java-regex/native-expression translation is validated against genuinely
independent execution.

Deliberate shared deviations (documented in the engine modules too, so the
comparison is apples-to-apples):
  * ``parties`` extracts capture group 1 only (ARRAY<STRING> can't hold the
    reference's tuple matches) — operators/patterns.py.
  * dedup is first-occurrence-ordered, not ``list(set(...))`` (the
    reference's order is PYTHONHASHSEED-dependent, SURVEY.md §5.4); tests
    compare arrays order-insensitively anyway.
  * NER/phone canonicalization follow the deterministic rule specs in
    operators/ner.py and operators/contacts.py (spaCy/phonenumbers are not
    available in this environment).
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# clean_text — reference: src/document_parser.py:380-400, exact chain
# ---------------------------------------------------------------------------


def clean_text(text: str) -> str:
    if not text:
        return ""
    text = re.sub(r"Page\s+\d+\s+of\s+\d+", "", text)
    text = re.sub(r"Confidential|Proprietary", "", text)
    text = re.sub(r"\s+", " ", text)
    text = re.sub(r"�", "", text)
    text = text.replace('"', '"').replace('""', '"').replace('""', '"')
    text = text.replace("'", "'").replace("''", "'").replace("''", "'")
    text = text.replace("–", "-").replace("—", "-")
    return text.strip()


# ---------------------------------------------------------------------------
# pattern extraction — reference: src/document_parser.py:58-105,402-414
# ---------------------------------------------------------------------------

PATTERNS: dict[str, list[tuple[str, str, int]]] = {
    "invoice": [
        ("invoice_number", r"(?:invoice|inv)\.?\s*#?\s*([A-Z0-9-]+)", 1),
        ("date", r"(?:date|invoice date):?\s*(\d{1,2}[/-]\d{1,2}[/-]\d{2,4})", 1),
        ("due_date", r"(?:due date|due):?\s*(\d{1,2}[/-]\d{1,2}[/-]\d{2,4})", 1),
        ("total_amount", r"(?:total|amount due|balance):?\s*(\$\d+(?:\.\d{2})?)", 1),
        ("tax", r"(?:tax|vat):?\s*(\$\d+(?:\.\d{2})?)", 1),
        ("first_name", r"(?:first name|given name):?\s*([A-Z][a-z]+)", 1),
        ("last_name", r"(?:last name|surname|family name):?\s*([A-Z][a-z]+)", 1),
        ("email", r"((?<![a-zA-Z0-9._%+-])[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,})", 1),
        ("product_id", r"(?:product id|product code|item #):?\s*([A-Z0-9-]+)", 1),
        ("qty", r"(?:quantity|qty):?\s*(\d+)", 1),
        ("amount", r"(?:amount|price):?\s*(\$\d+(?:\.\d{2})?)", 1),
        ("invoice_date", r"(?:invoice date|date issued):?\s*(\d{1,2}[/-]\d{1,2}[/-]\d{2,4})", 1),
        ("address", r"((?<!\d)\d{1,6}\s+[\w\s]{1,100},?\s*[A-Za-z\s]{1,60},?\s*[A-Z]{2}\s*\d{5})", 1),
        ("city", r"(?:city):?\s*([A-Za-z\s]+)(?=\s*[,]|\s*[A-Z]{2})", 1),
        ("stock_code", r"(?:stock code|sku):?\s*([A-Z0-9-]+)", 1),
        ("job", r"(?:job|project|work order):?\s*([A-Z0-9-]+)", 1),
    ],
    "receipt": [
        ("date", r"(?:date):?\s*(\d{1,2}[/-]\d{1,2}[/-]\d{2,4})", 1),
        ("total", r"(?:total|amount):?\s*(\$\d+(?:\.\d{2})?)", 1),
        ("payment_method", r"(?:payment method|paid with):?\s*([A-Za-z\s]+)", 1),
    ],
    "contract": [
        ("contract_id", r"(?:contract|agreement)\s*#?\s*([A-Z0-9-]+)", 1),
        ("date", r"(?:date|effective date):?\s*(\d{1,2}[/-]\d{1,2}[/-]\d{2,4})", 1),
        ("parties", r"(?:between|parties):?\s*([A-Za-z0-9\s,&]+)(?:\s+and\s+)(?:[A-Za-z0-9\s,&]+)", 1),
        ("amount", r"(?:amount|value):?\s*(\$\d+(?:\.\d{2})?)", 1),
        ("term", r"(?:term|duration):?\s*(\d+\s+(?:years?|months?|days?))", 1),
        ("buyer", r"(?:buyer|client):?\s*([A-Za-z0-9\s,&]+)", 1),
        ("supplier", r"(?:supplier|vendor):?\s*([A-Za-z0-9\s,&]+)", 1),
    ],
    "contact": [
        ("email", r"((?<![a-zA-Z0-9._%+-])[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,})", 1),
        ("phone", r"(\+?\d{1,3}[-.\s]?\(?\d{3}\)?[-.\s]?\d{3}[-.\s]?\d{4})", 1),
        ("website", r"(https?://[^\s]+)", 1),
        ("name", r"(?:name|contact):?\s*([A-Z][a-z]+\s+[A-Z][a-z]+)", 1),
        ("company", r"(?:company|firm|organization):?\s*([A-Za-z0-9\s&.,]+)", 1),
        ("address", r"((?<!\d)\d{1,6}\s+[\w\s]{1,100},?\s*[A-Za-z\s]{1,60},?\s*[A-Z]{2}\s*\d{5})", 1),
        ("zip_code", r"\b\d{5}(?:-\d{4})?\b", 0),
    ],
    "general": [
        ("currency", r"(\$\d+(?:,\d{3})*(?:\.\d{2})?)", 1),
        ("percentage", r"((?<!\d)\d+(?:\.\d+)?%)", 1),
        ("date", r"(\d{1,2}[/-]\d{1,2}[/-]\d{2,4})", 1),
    ],
}


def _dedup(seq: list[str]) -> list[str]:
    seen: set[str] = set()
    out = []
    for s in seq:
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def _findall(pattern: str, text: str, group: int, flags: int) -> list[str]:
    return [
        m.group(group) if group else m.group(0)
        for m in re.finditer(pattern, text, flags)
    ]


def extract_with_patterns(text: str, doc_type: str = "general") -> dict[str, list[str]]:
    if doc_type not in PATTERNS:
        doc_type = "general"
    results = {}
    for field, pattern, group in PATTERNS[doc_type]:
        matches = _findall(pattern, text, group, re.IGNORECASE)
        if matches:
            results[field] = _dedup(matches)
    return results


# ---------------------------------------------------------------------------
# rule NER — spec of operators/ner.py (stand-in for reference:
# src/document_parser.py:443-460)
# ---------------------------------------------------------------------------

_FIRST = "John|Jane|Robert|Emily|Michael|Sarah|Ethan|Olivia"
_CITY = "New York|Los Angeles|Chicago|Houston|Phoenix|Seattle"
NER_PATTERNS = {
    "PERSON": rf"\b(?:{_FIRST})\s+[A-Z][a-z]+\b",
    # bounded run — mirrors operators/ner.py (Java StackOverflow / Python O(n²) guard)
    "ORG": r"\b[A-Z][A-Za-z]*(?:\s+[A-Z][A-Za-z]*){0,8}\s+(?:Inc|LLC|Corp|Ltd|Industries|Company)\b",
    "GPE": rf"\b(?:{_CITY})\b",
    "DATE": r"\b\d{1,2}[/-]\d{1,2}[/-]\d{2,4}\b",
    "MONEY": r"\$\d+(?:,\d{3})*(?:\.\d{2})?",
    "PRODUCT": r"\b(?:PROD|STK|INV|CTR|JOB)-\d+\b",
}

# context-cued fallback tier — spec of operators/ner.py CUE_PATTERNS
# (lexicon matches first, then each cue pattern in order; comma-list
# captures split on ",\s*")
_NAME = r"[A-Z][a-z]+(?:\s+[A-Z][a-z]+){1,5}"
_PLACE = r"[A-Z][a-z]+(?:\s+[A-Z][a-z]+)?"
CUE_PATTERNS = {
    "PERSON": [
        (
            rf"\b(?:TO|FROM|CC|ATTN|ATTENTION|To|From|Attn|Attention|Staff|Attorney)"
            rf"\s*:\s*((?:{_NAME})(?:,\s*(?:{_NAME})){{0,24}})\b",
            True,
        ),
        (rf"\b(?:Mr|Mrs|Ms|Dr|Prof|Sir)\.?\s+({_NAME})\b", False),
        (
            rf"\b(?:[Ss]igned|[Pp]repared|[Aa]pproved|[Aa]uthorized|[Rr]eviewed|[Ss]ubmitted)"
            rf"\s+[Bb]y\s*:?\s*({_NAME})\b",
            False,
        ),
    ],
    "GPE": [
        (rf"\b({_PLACE}),\s*[A-Z]{{2}}\s+\d{{5}}\b", False),
        (rf"\b(?:City|Location)\s*:\s*({_PLACE})\b", False),
        (
            rf"\b(?:[Ll]ocated in|[Bb]ased in|[Hh]eadquartered in|[Cc]ity of)\s+({_PLACE})\b",
            False,
        ),
    ],
}


def entity_matches_all(text: str, label: str) -> list[str]:
    """Non-deduped match list: lexicon tier then cue tiers, in order."""
    out = list(re.findall(NER_PATTERNS[label], text))
    for cue_pat, is_list in CUE_PATTERNS.get(label, []):
        for m in re.findall(cue_pat, text):
            out.extend(re.split(r",\s*", m) if is_list else [m])
    return out


def extract_entities(text: str) -> dict[str, list[str]]:
    return {label: _dedup(entity_matches_all(text, label)) for label in NER_PATTERNS}


# ---------------------------------------------------------------------------
# contacts — reference: src/document_parser.py:462-505 with the deterministic
# NANP phone spec of operators/contacts.py
# ---------------------------------------------------------------------------

_CONTACT_BLOCKS = [
    r"contact.*?information:?(.*?)(?=\n\n|\n[A-Z]|\Z)",
    r"details:?(.*?)(?=\n\n|\n[A-Z]|\Z)",
    r"for more.*?information:?(.*?)(?=\n\n|\n[A-Z]|\Z)",
]


_INTL_CCS = ("44", "49", "91", "33", "34", "39", "81", "86", "61", "52", "55", "7")


def canonical_phone(p: str) -> str:
    digits = re.sub(r"[^0-9]", "", p)
    nanp = digits[1:] if len(digits) == 11 and digits.startswith("1") else digits
    if len(nanp) == 10 and re.match(r"^[2-9][0-9]{2}[2-9][0-9]{6}$", nanp):
        return f"+1 {nanp[0:3]}-{nanp[3:6]}-{nanp[6:10]}"
    m = re.match(r"^\+(" + "|".join(_INTL_CCS) + ")", p.strip())
    if m:
        national = digits[len(m.group(1)):]
        if 8 <= len(national) <= 12:
            return f"+{m.group(1)} {national}"
    return p


def extract_contact_info(text: str) -> dict[str, list[str]]:
    contacts = extract_with_patterns(text, "contact")
    if "phone" in contacts:
        contacts["phone"] = [canonical_phone(p) for p in contacts["phone"]]
    blocks: list[str] = []
    for pattern in _CONTACT_BLOCKS:
        blocks.extend(re.findall(pattern, text, re.IGNORECASE | re.DOTALL))
    cleaned = [re.sub(r"\s+", " ", b).strip() for b in blocks]
    cleaned = [b for b in cleaned if len(b) > 10]
    if cleaned:
        contacts["contact_blocks"] = cleaned
    return contacts


# ---------------------------------------------------------------------------
# holder name — reference: src/document_parser.py:507-548
# ---------------------------------------------------------------------------

_HOLDER_PATTERNS = [
    r"(?:name|holder|account holder|contact):\s*([A-Z][a-z]+(?:\s+[A-Z][a-z]+)+)",
    r"(?:mr\.|mrs\.|ms\.|dr\.)\s+([A-Z][a-z]+(?:\s+[A-Z][a-z]+)+)",
    r"prepared by:\s*([A-Z][a-z]+(?:\s+[A-Z][a-z]+)+)",
    r"issued to:\s*([A-Z][a-z]+(?:\s+[A-Z][a-z]+)+)",
    r"attention:\s*([A-Z][a-z]+(?:\s+[A-Z][a-z]+)+)",
    r"attn:\s*([A-Z][a-z]+(?:\s+[A-Z][a-z]+)+)",
]


def extract_document_holder_name(text: str) -> dict:
    names: list[str] = []
    for pattern in _HOLDER_PATTERNS:
        names.extend(re.findall(pattern, text, re.IGNORECASE))
    ner_names = _dedup(entity_matches_all(text, "PERSON"))
    all_names = _dedup(names + ner_names)
    filtered = [n for n in all_names if len(n.split()) >= 2 and len(n) > 4]
    scored = []
    for name in filtered:
        position = text.find(name)
        score = max(0.0, 1 - (position / len(text))) if position >= 0 else 0.0
        scored.append((name, score))
    scored.sort(key=lambda x: x[1], reverse=True)
    return {
        "candidate_names": [n for n, _ in scored],
        "primary_name": scored[0][0] if scored else None,
    }


# ---------------------------------------------------------------------------
# features — reference: src/document_parser.py:729-750 (case-sensitive)
# ---------------------------------------------------------------------------


def extract_features(text: str) -> dict[str, int]:
    return {
        "email_count": len(re.findall(r"(?<![a-zA-Z0-9._%+-])[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", text)),
        "phone_count": len(re.findall(r"(\+?\d{1,3}[-.\s]?\(?\d{3}\)?[-.\s]?\d{3}[-.\s]?\d{4})", text)),
        "currency_count": len(re.findall(r"(\$\d+(?:,\d{3})*(?:\.\d{2})?)", text)),
        "date_count": len(re.findall(r"(\d{1,2}[/-]\d{1,2}[/-]\d{2,4})", text)),
        "person_count": len(entity_matches_all(text, "PERSON")),
        "org_count": len(entity_matches_all(text, "ORG")),
        "text_length": len(text),
    }


# ---------------------------------------------------------------------------
# full per-document parse (composition mirrors reference:
# src/document_parser.py:752-805)
# ---------------------------------------------------------------------------


def extract_invoice_details(text: str) -> dict[str, list[str]]:
    """X3 — reference: src/document_parser.py:416-441 with the rule-NER
    stand-in: first PERSON with >=2 parts fills missing first/last name;
    GPE list fills missing city."""
    results = extract_with_patterns(text, "invoice")
    persons = entity_matches_all(text, "PERSON")
    for person in persons:
        parts = person.split()
        if len(parts) >= 2:
            if "first_name" not in results:
                results["first_name"] = [parts[0]]
            if "last_name" not in results:
                results["last_name"] = [parts[-1]]
    gpes = entity_matches_all(text, "GPE")
    if gpes and "city" not in results:
        results["city"] = gpes
    return results


def parse_text(cleaned_text: str, doc_type: str) -> dict:
    if doc_type == "invoice":
        pattern_results = extract_invoice_details(cleaned_text)
    else:
        pattern_results = extract_with_patterns(cleaned_text, doc_type)
    return {
        "document_type": doc_type,
        "patterns": pattern_results,
        "contacts": extract_contact_info(cleaned_text),
        "names": extract_document_holder_name(cleaned_text),
        "entities": extract_entities(cleaned_text),
        "features": extract_features(cleaned_text),
    }


def heuristic_document_type(text: str) -> str:
    lower = text.lower()
    if "invoice" in lower:
        return "invoice"
    if "receipt" in lower:
        return "receipt"
    if "contract" in lower:
        return "contract"
    if "contact:" in lower:
        return "contact"
    return "general"
