"""UniMax allocation tests (operators/sampling.unimax_allocation).

The closed-form window implementation is checked against an independent
ITERATIVE waterfilling reference (repeatedly cap the smallest language
and re-split, the paper's procedural description) — if the prefix-cap
closed form is wrong anywhere, the two must diverge. Plus conservation
and boundary invariants.
"""

from __future__ import annotations

import pytest

from llm_document_parser_spark.operators.sampling import unimax_allocation

LANG_TOKENS = {"en": 9000, "fr": 2500, "de": 2400, "zh": 400, "yo": 50}


def iterative_unimax(tokens: dict[str, int], budget: float, max_epochs: float):
    remaining = dict(tokens)
    alloc: dict[str, float] = {}
    b = budget
    while remaining:
        share = b / len(remaining)
        capped = {
            lang: n for lang, n in remaining.items() if n * max_epochs <= share
        }
        if not capped:
            for lang in remaining:
                alloc[lang] = share
            return alloc
        for lang, n in capped.items():
            alloc[lang] = n * max_epochs
            b -= n * max_epochs
            del remaining[lang]
    return alloc


def _docs(spark, tokens: dict[str, int]):
    # one doc per language whose single-space token count is exact
    rows = [(lang, " ".join(["w"] * n)) for lang, n in tokens.items()]
    return spark.createDataFrame(rows, "lang string, text string")


@pytest.mark.parametrize(
    "budget,max_epochs",
    [(10000, 2.0), (3000, 2.0), (13000, 1.0), (200, 2.0), (12000, 0.5)],
)
def test_matches_iterative_waterfilling(spark, budget, max_epochs):
    got = {
        r["lang"]: (r["capped"], r["alloc_tokens"])
        for r in unimax_allocation(
            _docs(spark, LANG_TOKENS), budget, max_epochs
        ).collect()
    }
    want = iterative_unimax(LANG_TOKENS, budget, max_epochs)
    assert set(got) == set(want)
    for lang, a in want.items():
        assert got[lang][1] == pytest.approx(a, abs=1e-3), lang
        assert got[lang][0] == (
            abs(a - LANG_TOKENS[lang] * max_epochs) < 1e-9
        ), lang
    # allocations conserve the budget unless every language capped out
    total = sum(a for _, a in got.values())
    cap_total = sum(n * max_epochs for n in LANG_TOKENS.values())
    assert total == pytest.approx(min(budget, cap_total), abs=1e-2)


def test_budget_exceeds_capacity_all_capped(spark):
    got = unimax_allocation(_docs(spark, LANG_TOKENS), 10**9, 2.0).collect()
    assert all(r["capped"] for r in got)
    for r in got:
        assert r["alloc_tokens"] == pytest.approx(
            LANG_TOKENS[r["lang"]] * 2.0, abs=1e-6
        )
        assert r["epochs"] == pytest.approx(2.0, abs=1e-6)


def test_uniform_when_nothing_caps(spark):
    even = {"a": 1000, "b": 1000, "c": 1000}
    got = unimax_allocation(_docs(spark, even), 900, 2.0).collect()
    assert all(not r["capped"] for r in got)
    assert all(r["alloc_tokens"] == pytest.approx(300.0) for r in got)
