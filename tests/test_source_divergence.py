"""Source-divergence tests (operators/lm.source_unigram_divergence).

The Spark implementation uses the closed-form absent-token collapse; the
reference here is an independent NumPy computation of the NAIVE
full-vocabulary KL — a match proves the decomposition identity. Plus
Gibbs' inequality (KL >= 0) and the zero case.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest

from llm_document_parser_spark.operators.lm import source_unigram_divergence

DOCS = [
    ("news", "the market rose today and the outlook is bright"),
    ("news", "shares of the company fell after the report"),
    ("forum", "lol that is so funny omg lol"),
    ("forum", "anyone know how to fix this lol"),
    ("mirror", "the market rose today and the outlook is bright"),
]
ALPHA = 0.5


def naive_kl():
    per_src: dict[str, Counter] = {}
    for src, text in DOCS:
        per_src.setdefault(src, Counter()).update(
            t for t in text.lower().split(" ") if t
        )
    corpus = Counter()
    for c in per_src.values():
        corpus.update(c)
    vocab = sorted(corpus)
    v = len(vocab)
    n = sum(corpus.values())
    out = {}
    for src, cnt in per_src.items():
        n_s = sum(cnt.values())
        d_s = n_s + ALPHA * v
        kl = 0.0
        for t in vocab:  # the full-vocabulary sum, absent tokens included
            p = (cnt.get(t, 0) + ALPHA) / d_s
            q = (corpus[t] + ALPHA) / (n + ALPHA * v)
            kl += p * math.log(p / q)
        out[src] = (n_s, len(cnt), kl)
    return out


def test_closed_form_matches_naive(spark):
    df = spark.createDataFrame(DOCS, "source string, text string")
    got = {
        r["source"]: (r["n_tokens"], r["vocab_seen"], r["kl_r"])
        for r in source_unigram_divergence(df, alpha=ALPHA).collect()
    }
    want = naive_kl()
    assert set(got) == set(want)
    for src, (n_s, v_s, kl) in want.items():
        assert got[src][0] == n_s and got[src][1] == v_s, src
        assert got[src][2] == pytest.approx(kl, abs=2e-6), src
        assert got[src][2] >= 0.0  # Gibbs


def test_on_distribution_source_scores_lowest(spark):
    # 'mirror' repeats a news sentence verbatim: closest to the corpus
    # blend among the three; 'forum' (disjoint vocabulary) diverges most
    df = spark.createDataFrame(DOCS, "source string, text string")
    got = {
        r["source"]: r["kl_r"]
        for r in source_unigram_divergence(df, alpha=ALPHA).collect()
    }
    assert got["forum"] == max(got.values())
    assert got["news"] < got["forum"]
