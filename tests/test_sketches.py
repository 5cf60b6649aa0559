"""KMV sketches: estimator accuracy on known sets, exact-path parity,
small-union exact degrade, determinism, and the no-full-sort plan."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from llm_document_parser_spark.operators.sketches import (
    kmv_hash,
    kmv_overlap,
    kmv_sketch,
)


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def test_kmv_hash_matches_python(spark):
    vals = ["alpha", "beta", "", "with space"]
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    got = {
        r["t"]: r["h"]
        for r in df.select("t", kmv_hash(F.col("t")).alias("h")).collect()
    }
    assert got == {v: _h48(v) for v in vals}


def test_kmv_sketch_is_k_smallest_distinct(spark):
    vals = [f"doc{i}" for i in range(50)] + ["doc0", "doc1"]  # dups
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    got = [r["h"] for r in kmv_sketch(df, "t", k=10).collect()]
    expect = sorted({_h48(v) for v in vals})[:10]
    assert sorted(got) == expect


def test_kmv_overlap_small_sets_exact_degrade(spark):
    """Union smaller than k → the sketch IS the set: estimate exact,
    jaccard exact."""
    a = spark.createDataFrame([(f"a{i}",) for i in range(6)], "t string")
    b = spark.createDataFrame(
        [("a0",), ("a1",), ("a2",), ("b0",)], "t string"
    )
    r = kmv_overlap(a, b, "t", k=64, include_exact=True).first()
    assert r["n_sketch"] == 7  # |union| = 6 + 1
    assert r["kmv_union_est"] == 7.0
    assert r["kmv_jaccard"] == round(3 / 7, 6)
    assert (r["exact_a"], r["exact_b"], r["exact_inter"]) == (6, 4, 3)
    assert r["exact_jaccard"] == round(3 / 7, 6)
    # exact degrade: sketch == truth when the union fits
    assert r["kmv_jaccard"] == r["exact_jaccard"]


def test_kmv_overlap_estimates_within_bounds(spark):
    """600-vs-600 with 50% true overlap, k=128: the estimator's relative
    error concentrates around 1/sqrt(k) ≈ 0.09 — assert a loose 3-sigma
    envelope (deterministic: this never flakes, it's a fixed dataset)."""
    a = spark.createDataFrame([(f"d{i}",) for i in range(600)], "t string")
    b = spark.createDataFrame(
        [(f"d{i + 300}",) for i in range(600)], "t string"
    )
    r = kmv_overlap(a, b, "t", k=128, include_exact=True).first()
    assert (r["exact_a"], r["exact_b"], r["exact_inter"]) == (600, 600, 300)
    true_union, true_j = 900, 300 / 900
    assert abs(r["kmv_union_est"] - true_union) / true_union < 0.27
    assert abs(r["kmv_jaccard"] - true_j) < 0.15
    assert r["n_sketch"] == 128


def test_kmv_overlap_no_full_sort(spark):
    a = spark.createDataFrame([("x",)], "t string")
    b = spark.createDataFrame([("y",)], "t string")
    plan = (
        kmv_overlap(a, b, "t", k=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan  # heap top-k, not a global Sort
