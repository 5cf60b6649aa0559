"""Mergeable corpus stats: monoid laws (associativity/commutativity/
split-invariance), missing-source merge, derived-at-read values."""

from __future__ import annotations

import pyspark.sql.functions as F

from llm_document_parser_spark.operators.stats import (
    merge_stats,
    source_stats,
    with_derived,
)


def _docs(spark):
    rows = [
        (0, "web", "a b c"),
        (1, "web", "dd ee"),
        (2, "web", "f"),
        (3, "books", "gg hh ii jj"),
        (4, "books", "k"),
        (5, "wiki", "l m"),
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _rows(df):
    return {r["source"]: tuple(r)[1:] for r in df.collect()}


def test_source_stats_hand_values(spark):
    got = _rows(source_stats(_docs(spark)))
    # (n_docs, n_tokens, sum_chars, min_chars, max_chars)
    assert got["web"] == (3, 6, 11, 1, 5)
    assert got["books"] == (2, 5, 12, 1, 11)
    assert got["wiki"] == (1, 2, 3, 3, 3)


def test_merge_equals_full_any_split(spark):
    d = _docs(spark)
    full = _rows(source_stats(d))
    # split 1: by parity
    a = source_stats(d.filter(F.col("doc_id") % 2 == 0))
    b = source_stats(d.filter(F.col("doc_id") % 2 == 1))
    assert _rows(merge_stats(a, b)) == full
    # split 2: lopsided, wiki entirely in one batch
    c = source_stats(d.filter(F.col("doc_id") < 5))
    e = source_stats(d.filter(F.col("doc_id") >= 5))
    assert _rows(merge_stats(c, e)) == full
    # commutativity + re-merge idempotence on the source key
    assert _rows(merge_stats(b, a)) == full
    assert _rows(merge_stats(merge_stats(a, b))) == full


def test_with_derived_reads_not_stores(spark):
    d = _docs(spark)
    r = {x["source"]: x for x in with_derived(source_stats(d)).collect()}
    assert r["web"]["avg_chars"] == round(11 / 3, 6)
    assert r["web"]["avg_tokens"] == 2.0
    assert r["books"]["avg_chars"] == 6.0
