"""Source-level quality tiering (operators/tiers.py)."""

import pytest

from llm_document_parser_spark.operators.tiers import (
    doc_quality_stats,
    docs_with_source_tier,
    source_quality_tiers,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # distinct-word source scores ttr=1.0; one-word-repeated scores ~0.
    rows = [
        (1, "alpha beta gamma delta epsilon", "good.example"),
        (2, "zeta eta theta iota kappa", "good.example"),
        (3, "spam spam spam spam spam", "spam.example"),
        (4, "ham ham ham ham ham", "spam.example"),
        (5, "one two two three three", "mid.example"),
        (6, "", "empty.example"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_doc_stats_ttr_and_empty(corpus):
    stats = {r["id"]: r for r in doc_quality_stats(corpus).collect()}
    assert stats[1]["ttr"] == 1.0 and stats[1]["toks"] == 5
    assert stats[3]["ttr"] == pytest.approx(0.2)
    assert stats[6]["ttr"] == 0.0 and stats[6]["toks"] == 0


def test_tier_order_and_determinism(corpus):
    tiers = {
        r["grp"]: r for r in source_quality_tiers(corpus, n_tiers=4).collect()
    }
    assert tiers["good.example"]["source_tier"] == 1
    assert tiers["mid.example"]["source_tier"] == 2
    assert tiers["spam.example"]["source_tier"] == 3
    assert tiers["empty.example"]["source_tier"] == 4
    assert tiers["good.example"]["source_score"] == 1.0


def test_join_back_covers_every_doc_and_broadcasts(corpus):
    out = docs_with_source_tier(corpus)
    assert out.count() == corpus.count()
    by_id = {r["id"]: r["source_tier"] for r in out.collect()}
    assert by_id[1] == 1 and by_id[3] == 3
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
