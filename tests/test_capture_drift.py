"""Cross-snapshot content drift (operators/dedup.py capture_drift)."""

import pytest

from llm_document_parser_spark.operators.dedup import capture_drift, simhash16


@pytest.fixture()
def caps(spark):
    # u1: identical re-captures (drift 0); u2: a full rewrite between
    # capture 1 and 2; u3: single capture (no pair).
    rows = [
        ("u1", 0, "spark shuffles keys across the cluster"),
        ("u1", 1, "spark shuffles keys across the cluster"),
        ("u2", 0, "alpha beta gamma delta epsilon zeta"),
        ("u2", 1, "alpha beta gamma delta epsilon zeta"),
        ("u2", 2, "совершенно different rewritten page body now"),
        ("u3", 0, "lonely single snapshot"),
    ]
    return spark.createDataFrame(rows, "url string, ts long, text string")


def test_drift_pairs_and_verdicts(caps):
    out = {
        (r["url"], r["ts"]): r
        for r in capture_drift(caps, "url", "ts", "text").collect()
    }
    assert set(out) == {("u1", 1), ("u2", 1), ("u2", 2)}
    assert out[("u1", 1)]["hamming"] == 0 and out[("u1", 1)]["changed"] == 0
    assert out[("u2", 1)]["hamming"] == 0
    assert out[("u2", 2)]["hamming"] > 0
    assert out[("u2", 2)]["prev_ts"] == 1


def test_hamming_matches_simhash_xor(caps, spark):
    sims = {
        (r["url"], r["ts"]): r["simhash"]
        for r in simhash16(caps, ["url", "ts"], "text").collect()
    }
    drift = {
        (r["url"], r["ts"]): r["hamming"]
        for r in capture_drift(caps, "url", "ts", "text").collect()
    }
    expected = bin(sims[("u2", 1)] ^ sims[("u2", 2)]).count("1")
    assert drift[("u2", 2)] == expected


def test_changed_threshold(caps):
    strict = capture_drift(caps, "url", "ts", "text", changed_bits=1)
    loose = capture_drift(caps, "url", "ts", "text", changed_bits=17)
    assert [r["changed"] for r in strict.filter("url='u2' AND ts=2").collect()] == [1]
    # a 16-bit hash can never differ by 17 bits
    assert sum(r["changed"] for r in loose.collect()) == 0


def test_single_exchange_plan(caps):
    plan = (
        capture_drift(caps, "url", "ts", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
