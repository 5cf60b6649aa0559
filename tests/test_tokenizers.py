"""Exact-BPE tokenizer seam (operators/tokenizers.py). tiktoken is absent
in this sandbox; the stand-in encoder reproduces BPE_TOKEN_PATTERN, so the
exact path can be pinned value-for-value against the portable column
expression — proving the Arrow plumbing computes the injected encoder's
counts, not something else."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from llm_document_parser_spark.operators import textstats
from llm_document_parser_spark.operators import tokenizers as tk


def _docs(spark):
    rows = [
        ("d1", "Hello, world! This is document #1 with 42 tokens?"),
        ("d2", "punctuation... everywhere;; and CamelCase words123 mixed"),
        ("d3", ""),
        ("d4", None),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_exact_path_matches_portable_with_regex_standin(spark):
    out = tk.exact_token_counts(
        _docs(spark), encoder_factory=tk.RegexStandInEncoder
    ).withColumn("portable", textstats.bpe_token_count(F.coalesce("text", F.lit(""))))
    for r in out.collect():
        assert r["bpe_tokens"] == r["portable"], r["doc_id"]


def test_encoder_built_lazily_not_per_row(spark):
    """The factory must run once per worker, not per row/batch — a real
    tokenizer loads vocab files. Counted via an accumulator."""
    builds = spark.sparkContext.accumulator(0)

    def counting_factory():
        builds.add(1)
        return tk.RegexStandInEncoder()

    docs = _docs(spark).repartition(1)
    out = tk.exact_token_counts(docs, encoder_factory=counting_factory)
    # evaluate the UDF column itself — a bare count() would let column
    # pruning elide the UDF entirely (and run the factory zero times)
    vals = [r["bpe_tokens"] for r in out.select("bpe_tokens").collect()]
    assert len(vals) == 4
    assert builds.value == 1


def test_single_arrow_stage(spark):
    out = tk.exact_token_counts(
        _docs(spark), encoder_factory=tk.RegexStandInEncoder
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan


def test_default_factory_gated_loudly():
    """Without tiktoken the exact path must refuse, never silently
    substitute the approximation (budgets would mix definitions)."""
    assert tk.tiktoken_available() is False
    with pytest.raises(RuntimeError, match="tiktoken"):
        tk.exact_token_counts(None)
