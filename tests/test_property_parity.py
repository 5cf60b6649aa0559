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


@settings(max_examples=8, deadline=None)
@given(st.lists(st.text(alphabet="0123456789-.() +x", max_size=20), min_size=1, max_size=40))
def test_phone_canonicalization_parity(spark, phones):
    got = _run(spark, phones, canonical_phone(F.col("t")))
    want = [oracle_ref.canonical_phone(p) for p in phones]
    assert got == want


@settings(max_examples=6, deadline=None)
@given(BATCH)
def test_holder_names_parity(spark, texts):
    got = _run(spark, texts, holder_names_struct(F.col("t")))
    for g, t in zip(got, texts):
        want = oracle_ref.extract_document_holder_name(t)
        assert sorted(g["candidate_names"]) == sorted(want["candidate_names"]), repr(t)
