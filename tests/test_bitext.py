"""Sentence-level bitext alignment: splitter normalization, positional
truncation, integer ratio gate, short-segment exemption, narrow plan."""

from __future__ import annotations

import pyspark.sql.functions as F

from llm_document_parser_spark.operators.bitext import (
    align_sentences,
    sentences,
)


def test_sentences_split_and_normalize(spark):
    df = spark.createDataFrame(
        [
            ("First sentence here. Second one!  Third?? Trailing.",),
            ("No terminal punctuation at all",),
            ("",),
        ],
        "t string",
    )
    got = [r["s"] for r in df.select(sentences(F.col("t")).alias("s")).collect()]
    assert got[0] == ["First sentence here", "Second one", "Third", "Trailing"]
    assert got[1] == ["No terminal punctuation at all"]
    assert got[2] == []


def test_align_sentences_gate_and_truncation(spark):
    pairs = spark.createDataFrame(
        [
            (
                "p1",
                "The quick brown fox jumps over things. Second part here. Extra A-only tail.",
                "LE RENARD BRUN RAPIDE SAUTE! UN MOT!",
            ),
            ("p2", "ok. go.", "da! net!"),  # all short → exemption
        ],
        "pair_id string, text_a string, text_b string",
    )
    rows = sorted(
        align_sentences(pairs).collect(), key=lambda r: (r["pair_id"], r["idx"])
    )
    p1 = [r for r in rows if r["pair_id"] == "p1"]
    # A has 3 sentences, B has 2 → idx 0,1 only (truncation)
    assert [r["idx"] for r in p1] == [0, 1]
    assert p1[0]["aligned"] == 1  # 38 vs 27 chars within 2x
    # "Second part here"(16) vs "UN MOT"(6): 16 > 2*6 and 16 > 15 → reject
    assert (p1[1]["len_a"], p1[1]["len_b"], p1[1]["aligned"]) == (16, 6, 0)
    p2 = [r for r in rows if r["pair_id"] == "p2"]
    assert all(r["aligned"] == 1 for r in p2)  # short-segment exemption


def test_align_sentences_zero_shuffle(spark):
    pairs = spark.createDataFrame(
        [("p", "a b. c d.", "x y! z w!")],
        "pair_id string, text_a string, text_b string",
    )
    plan = (
        align_sentences(pairs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # narrow: split/zip/explode/filter only
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
