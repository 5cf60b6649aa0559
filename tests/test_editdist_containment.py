"""Edit-distance near-dup tier and directed containment
(operators/dedup.py edit_distance_near_dups / containment_pairs)."""

from __future__ import annotations

import pytest

from llm_document_parser_spark.operators.dedup import (
    containment_pairs,
    edit_distance_near_dups,
)


def _py_lev(a: str, b: str) -> int:
    """Classic DP Levenshtein — the independent reference."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),   # dist 3 to 1
    (3, "the quick brown fox jumps over the lazy dog"),   # dist 0 to 1
    (4, "a completely different document body entirely"),
    (5, "the quick brown fox jumps over the lazy dog and then some more"),
]


def test_matches_bruteforce_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["edit_dist"]
        for r in edit_distance_near_dups(df, max_dist=6, band=8).collect()
    }
    want = {}
    for i, (ia, ta) in enumerate(DOCS):
        for ib, tb in DOCS[i + 1 :]:
            d = _py_lev(ta, tb)
            if d <= 6:
                want[(ia, ib)] = d
    assert got == want
    assert got[(1, 2)] == 3 and got[(1, 3)] == 0
    assert (1, 5) not in got  # length gap 20 > max_dist


def test_adjacent_bucket_pairs_found_once(spark):
    # lengths 15 and 17 straddle a band-16 bucket boundary (buckets 0, 1);
    # adjacency probing must find the pair exactly once, either id order.
    rows = [(10, "x" * 15), (2, "x" * 17)]  # smaller id in the HIGHER bucket
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = edit_distance_near_dups(df, max_dist=6, band=16).collect()
    assert [(r["id_a"], r["id_b"], r["edit_dist"]) for r in out] == [(2, 10, 2)]


def test_band_must_cover_max_dist(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        edit_distance_near_dups(df, max_dist=8, band=4)


def test_over_threshold_excluded(spark):
    rows = [(1, "aaaa bbbb cccc"), (2, "aaaa bbbb cccc" + " z" * 10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert edit_distance_near_dups(df, max_dist=6, band=8).count() == 0


def test_containment_quote_vs_jaccard(spark):
    source = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    quote = "alpha beta gamma delta"  # first 4 words: 2 shingles, both in src
    rows = [(1, source), (2, quote), (3, "unrelated words entirely here now")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(df, threshold=0.0).collect()
    }
    assert got[(2, 1)] == 1.0           # quote fully contained in source
    assert got[(1, 2)] == pytest.approx(2 / 8)  # source barely in quote
    assert got[(3, 1)] == 0.0           # disjoint
    # the signal Jaccard misses: J(1,2) = 2/8 while c(2->1) = 1.0
    from llm_document_parser_spark.operators.dedup import jaccard_pairs

    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(df).collect()
    }
    assert jac[(1, 2)] == pytest.approx(2 / 8)


def test_containment_threshold_filters(spark):
    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = containment_pairs(df, threshold=0.9).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [(2, 1)]


def test_no_python_stages(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    for frame in (
        edit_distance_near_dups(df, max_dist=6, band=8),
        containment_pairs(df, threshold=0.5),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
