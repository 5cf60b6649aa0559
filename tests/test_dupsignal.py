"""Exact-substring duplication signal (dedup.duplicate_ngram_fraction)."""

from __future__ import annotations

from llm_document_parser_spark.operators.dedup import duplicate_ngram_fraction


def test_clone_scores_one_unique_scores_zero(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),   # exact clone
        (3, "one two three four five six seven"),     # unique
        (4, "tiny doc"),                              # < 3 tokens: no grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in duplicate_ngram_fraction(df).collect()}
    assert out[1]["dup_frac"] == 1.0 and out[2]["dup_frac"] == 1.0
    assert out[3]["dup_frac"] == 0.0 and out[3]["n_grams"] == 5
    assert out[4]["n_grams"] == 0 and out[4]["dup_frac"] == 0.0
    assert len(out) == 4  # every input row present


def test_partial_overlap_fraction(spark):
    # doc 2 shares exactly its first 3-gram with doc 1
    rows = [
        (1, "a b c x y z"),
        (2, "a b c p q r"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in duplicate_ngram_fraction(df).collect()}
    # each doc has 4 grams; only 'a b c' is shared
    assert out[1]["n_grams"] == 4 and out[1]["dup_grams"] == 1
    assert out[1]["dup_frac"] == 0.25
    assert out[2]["dup_frac"] == 0.25


def test_repeated_gram_within_one_doc_not_duplicated(spark):
    # the same gram twice WITHIN one doc is not corpus duplication
    df = spark.createDataFrame(
        [(1, "x y z x y z"), (2, "totally different words here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in duplicate_ngram_fraction(df).collect()}
    assert out[1]["dup_grams"] == 0
