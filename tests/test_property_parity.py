"""Property-based parity: hypothesis-generated text through the Spark
expression layer must match the pure-Python oracle.

Strengthens the byte-identical guarantee beyond datagen's distribution:
random/adversarial strings (quotes, dashes, replacement chars, regex
metacharacters, boundary whitespace) are pushed through both
implementations in ONE Spark job per property (per-example Spark round
trips would be prohibitively slow).

Alphabet note: ASCII + the specific unicode chars the cleaner handles.
Full-unicode parity is bounded by Java-vs-Python regex class semantics
(\\w, \\s, \\b unicode-awareness) — the fixture contract is ASCII content
(datagen), matching the reference's own corpus.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

import oracle_ref
from llm_document_parser_spark.operators.contacts import canonical_phone
from llm_document_parser_spark.operators.names import holder_names_struct
from llm_document_parser_spark.operators.patterns import patterns_map_for
from llm_document_parser_spark.operators.textclean import clean_text_col

ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    " \t\n.,:;!?$%#@-_()[]{}/\\'\"+*^~|<>="
    "–—�"  # dashes + replacement char the cleaner handles
)

FRAGMENTS = st.sampled_from(
    [
        "Page 3 of 12", "Confidential", "Proprietary", "''", '""',
        "Invoice #INV-42", "Total: $19.99", "total:$5", "Due: 01/02/2023",
        "Email: a.b@c.de", "Contact: John Smith", "Quantity: 7",
        "prepared by: Jane Davis", "attn: Robert Jones", "mr. Ethan Brown",
        "+1-555-234-5678", "(555) 234-5678", "555.234.5678", "0 of 0",
        "city: Phoenix AZ 85001", "https://x.example/path?q=1",
    ]
)

TEXTS = st.lists(
    st.one_of(st.text(alphabet=ALPHABET, max_size=120), FRAGMENTS),
    min_size=1,
    max_size=8,
).map(" ".join)

BATCH = st.lists(TEXTS, min_size=1, max_size=40)

SCHEMA = StructType([StructField("t", StringType())])


def _run(spark, texts, col):
    df = spark.createDataFrame([(t,) for t in texts], SCHEMA)
    return [r["out"] for r in df.select(col.alias("out")).collect()]


@settings(max_examples=8, deadline=None)
@given(BATCH)
def test_clean_text_parity(spark, texts):
    got = _run(spark, texts, clean_text_col(F.col("t")))
    want = [oracle_ref.clean_text(t) for t in texts]
    assert got == want


@pytest.mark.parametrize("doc_type", ["invoice", "receipt", "contract", "contact", "general"])
@settings(max_examples=4, deadline=None)
@given(BATCH)
def test_pattern_extraction_parity(spark, doc_type, texts):
    got = _run(spark, texts, patterns_map_for(F.col("t"), doc_type))
    for g, t in zip(got, texts):
        want = oracle_ref.extract_with_patterns(t, doc_type)
        got_map = {k: sorted(v) for k, v in (g or {}).items()}
        want_map = {k: sorted(v) for k, v in want.items()}
        assert got_map == want_map, repr(t)


PHONE_INPUTS = st.one_of(
    st.text(alphabet="0123456789-.() +x", max_size=20),
    # international shapes: +CC then 6-13 national digits with separators
    st.tuples(
        st.sampled_from(["+44", "+49", "+91", "+7", "+1", "+86", "+999"]),
        st.text(alphabet="0123456789 -", min_size=6, max_size=15),
    ).map(lambda t: t[0] + " " + t[1]),
)


@settings(max_examples=12, deadline=None)
@given(st.lists(PHONE_INPUTS, min_size=1, max_size=40))
def test_phone_canonicalization_parity(spark, phones):
    got = _run(spark, phones, canonical_phone(F.col("t")))
    want = [oracle_ref.canonical_phone(p) for p in phones]
    assert got == want


def test_phone_international_spec(spark):
    """Pin the +CC deterministic spec on known shapes."""
    cases = {
        "+44 20 7946 0958": "+44 2079460958",
        "+49 (30) 901820": "+49 30901820",
        "+91-98765-43210": "+91 9876543210",
        "+1-555-234-5678": "+1 555-234-5678",   # NANP wins
        "+44 12": "+44 12",                      # national too short -> passthrough
        "+999 123456789": "+999 123456789",      # unknown CC -> passthrough
        "5552345678": "+1 555-234-5678",
        "0 11 22 33": "0 11 22 33",
    }
    got = _run(spark, list(cases), canonical_phone(F.col("t")))
    for (raw, want), g in zip(cases.items(), got):
        assert g == want == oracle_ref.canonical_phone(raw), raw


@settings(max_examples=6, deadline=None)
@given(BATCH)
def test_holder_names_parity(spark, texts):
    got = _run(spark, texts, holder_names_struct(F.col("t")))
    for g, t in zip(got, texts):
        want = oracle_ref.extract_document_holder_name(t)
        assert sorted(g["candidate_names"]) == sorted(want["candidate_names"]), repr(t)
