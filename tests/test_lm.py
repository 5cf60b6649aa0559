"""Unigram LM scoring: hand-computed values, OOV floor semantics,
vocab cap determinism, and the broadcast (map-side scoring) plan shape.
Cross-engine value parity on the corpus lives in the ``doc_unigram_logprob``
catalog oracle."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from llm_document_parser_spark.operators.lm import (
    cap_vocab,
    score_unigram_logprob,
    train_unigram_lm,
)


def _corpus(spark):
    rows = [("d1", "a a b"), ("d2", "a c")]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_train_and_score_hand_values(spark):
    # counts: a=3, b=1, c=1, total=5
    df = _corpus(spark)
    lm = train_unigram_lm(df, "text")
    got = {r["token"]: r["logp"] for r in lm.collect()}
    assert got["a"] == math.log(3 / 5)
    assert got["b"] == math.log(1 / 5)
    scored = {
        r["doc_id"]: r
        for r in score_unigram_logprob(df, lm, "doc_id", "text").collect()
    }
    assert scored["d1"]["n_tokens"] == 3
    want_d1 = round(-(2 * math.log(3 / 5) + math.log(1 / 5)) / 3, 6)
    assert scored["d1"]["avg_neg_logp"] == want_d1
    want_d2 = round(-(math.log(3 / 5) + math.log(1 / 5)) / 2, 6)
    assert scored["d2"]["avg_neg_logp"] == want_d2


def test_oov_floor(spark):
    df = _corpus(spark)
    lm = train_unigram_lm(df.filter(F.col("doc_id") == "d1"), "text")  # no 'c'
    floor = math.log(1e-9)
    scored = {
        r["doc_id"]: r
        for r in score_unigram_logprob(
            df, lm, "doc_id", "text", floor_logp=floor
        ).collect()
    }
    # d2 = [a, c]; c is OOV → floor
    want = round(-(math.log(2 / 3) + floor) / 2, 6)
    assert scored["d2"]["avg_neg_logp"] == want
    assert scored["d2"]["n_tokens"] == 2
    # without a floor, OOV tokens silently drop via the inner join
    no_floor = {
        r["doc_id"]: r
        for r in score_unigram_logprob(df, lm, "doc_id", "text").collect()
    }
    assert no_floor["d2"]["n_tokens"] == 1


def test_cap_vocab_deterministic_topk(spark):
    df = _corpus(spark)
    lm = train_unigram_lm(df, "text")
    top2 = cap_vocab(lm, 2).collect()
    # a (3/5) first; b and c tie at 1/5 → 'b' wins lexicographically
    assert sorted(r["token"] for r in top2) == ["a", "b"]
    plan = cap_vocab(lm, 2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_scoring_is_broadcast(spark):
    df = _corpus(spark)
    lm = train_unigram_lm(df, "text")
    plan = (
        score_unigram_logprob(df, lm, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
