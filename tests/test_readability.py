"""Readability tests (operators/textstats.readability_scores): pinned
hand-counted goldens, a pure-Python replay over varied text, and the
monotone property the signal exists for (simple prose scores easier
than dense polysyllabic prose)."""

from __future__ import annotations

import math
import re

import pytest

from llm_document_parser_spark.operators.textstats import readability_scores


def py_syllables(word: str) -> int:
    groups = len(re.findall(r"[aeiouy]+", word))
    silent = 1 if re.search(r"[aeiouy][a-z]*[bcdfghjkmnpqrstvwxz]e$", word) else 0
    return max(groups - silent, 1)


def py_scores(text: str):
    words = [w for w in text.lower().split(" ") if w]
    sents = max(len(re.findall(r"[.!?]+", text)), 1)
    syl = sum(py_syllables(w) for w in words)
    wps = len(words) / sents
    spw = syl / len(words)
    return (
        len(words),
        sents,
        syl,
        round(206.835 - 1.015 * wps - 84.6 * spw, 4),
        round(0.39 * wps + 11.8 * spw - 15.59, 4),
    )


DOCS = [
    (0, "The cat sat. The dog ran."),
    (1, "Incomprehensibilities materialized; nevertheless, extraordinary "
        "circumstances necessitated immediate reconsideration."),
    (2, "time like mute there"),  # silent-e corrections
    (3, "xyz 123 &&"),  # zero vowel groups: 1-per-word floor
    (4, ""),  # dropped (no words)
]


def test_python_replay_parity(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in readability_scores(df).collect()}
    assert 4 not in got  # empty doc dropped
    for did, text in DOCS[:4]:
        w, s, syl, ease, grade = py_scores(text)
        r = got[did]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (w, s, syl), did
        assert r["flesch_ease_r"] == pytest.approx(ease, abs=1e-4)
        assert r["fk_grade_r"] == pytest.approx(grade, abs=1e-4)


def test_hand_counts_and_floor(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in readability_scores(df).collect()}
    # "The cat sat. The dog ran." = 6 one-syllable words, 2 sentences
    assert got[0]["n_words"] == 6 and got[0]["n_sentences"] == 2
    assert got[0]["n_syllables"] == 6
    # all-consonant/digit words floor at 1 syllable each
    assert got[3]["n_syllables"] == 3
    # "time like mute there": silent-e drops one group each -> 1 each
    assert got[2]["n_syllables"] == 4


def test_monotone_difficulty(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in readability_scores(df).collect()}
    assert got[0]["flesch_ease_r"] > got[1]["flesch_ease_r"]
    assert got[0]["fk_grade_r"] < got[1]["fk_grade_r"]
