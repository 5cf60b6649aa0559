"""Parity against the reference's COMMITTED golden exports.

The reference repo commits real extraction outputs produced by its own
pipeline (reference: data/exports/export_20251007_172126.json and
export_20251031_112144.json — full_text, patterns, contacts, names,
features).  These are the only reference-*produced* ground truth available:
unlike the synthetic datagen fixtures (which are generated to match the
pattern dictionary), a regex-translation bug shared with the generator
would be invisible there but visible here.

Two layers per document:

1. **Spark == pure-Python oracle** on the golden text — catches
   Java-regex vs Python-re divergence on real (non-synthetic) text.
2. **Engine output == golden values** for every field that is
   rule-derived (patterns / contacts / features counts).  spaCy-derived
   fields (entities, and the person/org feature counts) are excluded —
   the engine ships a rule-NER stand-in (operators/ner.py docstring).

Text availability: the export stores ``full_text = cleaned_text[:1000] +
"..."`` (reference: src/api_server.py truncation).  For the invoice doc
the missing 42-char tail is recoverable by splicing the golden
``contact_blocks`` capture (which runs to end-of-document); the splice is
validated against the golden ``features.text_length`` (1042).  For the
contract doc 1573 chars are unrecoverable, so assertions there are
subset/spot checks on the 1000-char prefix.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

import oracle_ref
from llm_document_parser_spark.operators.contacts import contacts_map
from llm_document_parser_spark.operators.features import features_struct
from llm_document_parser_spark.operators.names import holder_names_struct
from llm_document_parser_spark.operators.patterns import patterns_map
from llm_document_parser_spark.operators.textclean import clean_text_col

EXPORTS_DIR = "/root/reference/data/exports"
INVOICE_EXPORT = os.path.join(EXPORTS_DIR, "export_20251007_172126.json")
CONTRACT_EXPORT = os.path.join(EXPORTS_DIR, "export_20251031_112144.json")

pytestmark = pytest.mark.skipif(
    not os.path.exists(INVOICE_EXPORT), reason="reference goldens not present"
)


def _load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)["documents"][0]


def _reconstruct_invoice_text(doc: dict) -> str:
    """Splice cleaned_text[:1000] with the golden contact_blocks tail."""
    full = doc["full_text"]
    assert full.endswith("...")
    prefix = full[:-3]
    block = doc["extraction_data"]["contacts"]["contact_blocks"][0]
    start = prefix.find(block[:50])
    assert start >= 0
    text = prefix + block[len(prefix) - start :]
    # the splice must reproduce the reference's own measured text_length
    assert len(text) == doc["extraction_data"]["features"]["text_length"]
    return text


@pytest.fixture(scope="module")
def golden_invoice():
    doc = _load(INVOICE_EXPORT)
    return doc, _reconstruct_invoice_text(doc)


@pytest.fixture(scope="module")
def golden_contract():
    doc = _load(CONTRACT_EXPORT)
    return doc, doc["full_text"][:-3]  # 1000-char prefix of a 2573-char doc


def _run_spark(spark, text: str, doc_type: str) -> dict:
    df = spark.createDataFrame([(text, doc_type)], "text string, document_type string")
    row = df.select(
        patterns_map(F.col("text"), F.col("document_type")).alias("patterns"),
        contacts_map(F.col("text")).alias("contacts"),
        holder_names_struct(F.col("text")).alias("names"),
        features_struct(F.col("text")).alias("features"),
        clean_text_col(F.col("text")).alias("cleaned"),
    ).collect()[0]
    return row.asDict(recursive=True)


# ---------------------------------------------------------------- invoice

def test_invoice_spark_matches_python_oracle(spark, golden_invoice):
    _doc, text = golden_invoice
    got = _run_spark(spark, text, "receipt")
    assert got["patterns"] == oracle_ref.extract_with_patterns(text, "receipt")
    assert got["contacts"] == oracle_ref.extract_contact_info(text)
    oracle_feats = oracle_ref.extract_features(text)
    assert got["features"] == oracle_feats
    assert got["cleaned"] == oracle_ref.clean_text(text)


def test_invoice_patterns_match_golden(spark, golden_invoice):
    doc, text = golden_invoice
    golden = doc["extraction_data"]["patterns"]
    got = _run_spark(spark, text, "receipt")["patterns"]
    # reference dedups via list(set(...)) — order is hash-seed dependent,
    # so compare per-key as sets; key sets must be identical.
    assert set(got) == set(golden)
    for k in golden:
        assert set(got[k]) == set(golden[k]), k


def test_invoice_contacts_match_golden(spark, golden_invoice):
    doc, text = golden_invoice
    golden = doc["extraction_data"]["contacts"]
    got = _run_spark(spark, text, "receipt")["contacts"]
    assert set(got) == set(golden)
    for k in golden:
        assert set(got[k]) == set(golden[k]), k
    # the block capture is ordered (single regex scan), assert exactly
    assert got["contact_blocks"] == golden["contact_blocks"]


def test_invoice_features_match_golden(spark, golden_invoice):
    doc, text = golden_invoice
    golden = doc["extraction_data"]["features"]
    got = _run_spark(spark, text, "receipt")["features"]
    for k in ("email_count", "phone_count", "currency_count", "date_count", "text_length"):
        assert got[k] == golden[k], k
    # person_count / org_count are spaCy-derived in the reference — excluded.


def test_invoice_primary_name_matches_golden(spark, golden_invoice):
    doc, text = golden_invoice
    golden = doc["extraction_data"]["names"]
    got = _run_spark(spark, text, "receipt")["names"]
    # golden candidates mix pattern-derived and spaCy-derived names; the
    # rule-NER engine must produce a subset, and the same primary.
    assert set(got["candidate_names"]) <= set(golden["candidate_names"])
    assert got["primary_name"] == golden["primary_name"] == "Ethan Williams"


def test_invoice_text_is_clean_fixpoint(spark, golden_invoice):
    """The stored full_text IS the reference's cleaned_text, so our
    clean chain must be a no-op on it (idempotence on real output)."""
    _doc, text = golden_invoice
    got = _run_spark(spark, text, "receipt")
    assert got["cleaned"] == text


# ---------------------------------------------------------------- contract

def test_contract_spark_matches_python_oracle(spark, golden_contract):
    _doc, text = golden_contract
    got = _run_spark(spark, text, "contract")
    assert got["patterns"] == oracle_ref.extract_with_patterns(text, "contract")
    assert got["contacts"] == oracle_ref.extract_contact_info(text)
    assert got["features"] == oracle_ref.extract_features(text)


def test_contract_subset_of_golden(spark, golden_contract):
    """Only the first 1000 of 2573 chars survive in the export, so matches
    found on the prefix must appear in the reference's full-text results
    (except spaCy-derived keys).  Spot-pin the values known to lie inside
    the prefix."""
    doc, text = golden_contract
    golden = doc["extraction_data"]
    got = _run_spark(spark, text, "contract")

    assert set(got["patterns"]) <= set(golden["patterns"])
    assert {"Recipient", "with", "COVER"} <= set(got["patterns"]["contract_id"])
    assert set(got["patterns"]["contract_id"]) <= set(golden["patterns"]["contract_id"])
    assert got["patterns"]["supplier"] == ["Name"]

    contact_keys = set(golden["contacts"])
    assert set(got["contacts"]) <= contact_keys
    # "Af-firm-ative" — the reference's (?i)firm alternation mid-word, with
    # its trailing space; an exacting translation check.
    assert got["contacts"]["company"] == ["ative Action Plan Complete "]
    assert got["contacts"]["name"] == ["Duke Energy"]
    assert "53520" in got["contacts"]["zip_code"]
    assert set(got["contacts"]["zip_code"]) <= set(golden["contacts"]["zip_code"])

    assert "Duke Energy Department Head Initials of Approval" in got["names"]["candidate_names"]
    # the cue-NER fallback must RECOVER every spaCy person in the prefix...
    assert {"Christopher Wheeler", "Mike Rouker", "Christina Smith"} <= set(
        got["names"]["candidate_names"]
    )
    # ...and the only extra beyond the golden list is "Heather Lacy" — a
    # real person in the TO: line that the reference's own spaCy run MISSED
    # (deliberate recall improvement, not a regression)
    assert set(got["names"]["candidate_names"]) - set(
        golden["names"]["candidate_names"]
    ) <= {"Heather Lacy"}


# ----------------------------------------------- cue-NER fallback recall

def test_rule_ner_recall_on_real_text_without_spacy(spark, golden_contract):
    """Round-2 gap: the lexicon-only fallback had ~0 PERSON/GPE recall on
    any non-datagen text. The context-cued tier must recover entities from
    the reference's own golden document — no spaCy, no gazetteer."""
    from llm_document_parser_spark.operators.ner import entities_map

    _doc, text = golden_contract
    row = (
        spark.createDataFrame([(text,)], "t string")
        .select(entities_map(F.col("t")).alias("e"))
        .collect()[0]["e"]
    )
    # none of these names are in the datagen lexicon
    assert {"Christopher Wheeler", "Mike Rouker", "Heather Lacy", "Christina Smith"} <= set(
        row["PERSON"]
    )
    assert row == oracle_ref.extract_entities(text)  # Java/Python parity


def test_cue_ner_gpe_heuristics(spark):
    from llm_document_parser_spark.operators.ner import entities_map

    text = (
        "Acme Corp is headquartered in Portland and ships from 12 Dock Rd, "
        "Boise, ID 83702. Location: Springfield. Contact Dr. Maria Vasquez, "
        "signed by Omar Haddad."
    )
    row = (
        spark.createDataFrame([(text,)], "t string")
        .select(entities_map(F.col("t")).alias("e"))
        .collect()[0]["e"]
    )
    assert {"Portland", "Boise", "Springfield"} <= set(row["GPE"])
    assert {"Maria Vasquez", "Omar Haddad"} <= set(row["PERSON"])
    assert row == oracle_ref.extract_entities(text)
