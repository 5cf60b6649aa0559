"""Winnowing fingerprints (operators/winnow.py) — the Schleimer et al.
SIGMOD 2003 guarantees, replayed in pure Python, plus plan shape."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from llm_document_parser_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_overlap_pairs,
)

K, W = 5, 4


def _py_winnow(text: str, k: int = K, w: int = W) -> set[str]:
    """Independent pure-Python replay of the operator's definition."""
    clean = " ".join(text.lower().split())
    hs = [
        hashlib.md5(clean[i : i + k].encode()).hexdigest()
        for i in range(len(clean) - k + 1)
    ]
    if not hs:
        return set()
    upper = max(len(hs) - w + 1, 1)
    return {min(hs[i : i + w]) for i in range(upper)}


def test_matches_python_replay(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "The  Quick   BROWN fox"),  # normalization collapses to one form
        (3, "tiny"),                    # < k chars: no grams at all
        (4, "sixchr"),                  # exactly one gram < w: degenerate window
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: set(r["fingerprints"])
        for r in winnow_fingerprints(df, k=K, w=W).collect()
    }
    for i, t in rows:
        assert got[i] == _py_winnow(t), f"doc {i}"
    assert got[3] == set()
    assert len(got[4]) == 1  # single global min selected


def test_shared_substring_guarantee(spark):
    # Any shared substring of length >= w + k - 1 (= 8 chars here) must
    # contribute at least one common fingerprint — winnowing's theorem.
    shared = "zqxjkwvb"  # 8 chars, appears in both, else disjoint alphabets
    rows = [
        (1, f"aaaa{shared}aaaaaaa"),
        (2, f"tttttttt{shared}tt"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {
        r["id"]: set(r["fingerprints"])
        for r in winnow_fingerprints(df, k=K, w=W).collect()
    }
    assert fps[1] & fps[2], "guaranteed shared fingerprint missing"
    pairs = winnow_overlap_pairs(df, k=K, w=W, min_shared=1).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]


def test_density_bound(spark):
    # Expected selected density is 2/(w+1); assert a loose upper envelope
    # on a long random-ish text (distinct grams, so ties don't inflate).
    text = " ".join(f"w{i}x{i * 7}" for i in range(400))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    n_grams = len(" ".join(text.split())) - K + 1
    n_fps = len(winnow_fingerprints(df, k=K, w=W).collect()[0]["fingerprints"])
    assert n_fps <= n_grams  # trivial sanity
    assert n_fps / n_grams < 2.5 * 2 / (W + 1)  # within 2.5x of expectation


def test_max_df_drops_boilerplate(spark):
    # A fingerprint present in every doc (shared chrome) is dropped by
    # max_df before pairing; the planted true overlap pair survives.
    # Construction makes the expectation exact: doc 3 extends doc 1, so
    # selected(doc1) ⊆ selected(doc3) (identical window contents over the
    # shared prefix) — hence ANY fingerprint docs 1 and 2 share sits in
    # the chrome region, is selected in doc 3 too, reaches df=3, and is
    # dropped at max_df=2. Only the 1-3 content overlap can survive.
    chrome = "commonfooterchrome"
    rows = [
        (1, f"{chrome} abc abd abe acd ace"),
        (2, f"{chrome} tuv tuw tux tyz tzz"),
        (3, f"{chrome} abc abd abe acd ace extra aeed"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    all_pairs = {
        (r["id_a"], r["id_b"])
        for r in winnow_overlap_pairs(df, k=K, w=W, min_shared=1).collect()
    }
    assert all_pairs == {(1, 2), (1, 3), (2, 3)}  # chrome links everyone
    capped = {
        (r["id_a"], r["id_b"])
        for r in winnow_overlap_pairs(
            df, k=K, w=W, min_shared=1, max_df=2
        ).collect()
    }
    assert capped == {(1, 3)}  # chrome-only pairs gone, true overlap kept


def test_no_python_stages(spark):
    df = spark.createDataFrame([(1, "abcdefghij")], "doc_id long, text string")
    plan = winnow_overlap_pairs(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_null_text_yields_empty(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "long enough text here")], "doc_id long, text string"
    )
    fps = {r["id"]: r["fingerprints"] for r in winnow_fingerprints(df).collect()}
    assert fps[1] is None or fps[1] == []
    assert winnow_overlap_pairs(df, min_shared=1).count() == 0


def test_fast_mode_guarantee_and_types(spark):
    # xxhash64 production mode: different hash => different selected
    # POSITIONS than md5 mode, but the w+k-1 shared-substring guarantee
    # is hash-agnostic — the planted pair must still surface, with
    # BIGINT fingerprints (8-byte longs, not 32-char hex).
    shared = "zqxjkwvb"
    rows = [(1, f"aaaa{shared}aaaaaaa"), (2, f"tttttttt{shared}tt")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(df, k=K, w=W, hash_fn="fast")
    assert dict(fps.dtypes)["fingerprints"] == "array<bigint>"
    pairs = winnow_overlap_pairs(
        df, k=K, w=W, min_shared=1, hash_fn="fast"
    ).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]


def test_window_sizes_replay_including_w1(spark):
    """Focused regression for the round-6 one-pass window minima: parity
    with the pure-Python replay across window sizes, including the w=1
    degenerate (every gram selected — exercises the non-`least` branch)
    and a w larger than a power of two (uneven final window)."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "abcabcabcabcabc"),
        (3, "xy"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for w in (1, 2, 3, 5, 7, 9):
        got = {
            r["id"]: set(r["fingerprints"])
            for r in winnow_fingerprints(df, k=3, w=w).collect()
        }
        for i, t in rows:
            assert got[i] == _py_winnow(t, k=3, w=w), f"doc {i} w={w}"
