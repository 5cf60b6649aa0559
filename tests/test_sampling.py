"""Token-budget sampling (operators/sampling.py): deterministic hash
order, per-group budgets, the first-straddler guarantee, and
partitioning-invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_document_parser_spark.operators.sampling import sample_to_token_budget


def _docs(spark, n=60):
    rows = [
        (i, "web" if i % 3 else "code", "tok " * (5 + i % 7))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_budget_respected_per_group(spark):
    out = sample_to_token_budget(
        _docs(spark), budget_tokens=50, group_col="source"
    ).collect()
    by_group: dict[str, list] = {}
    for r in out:
        by_group.setdefault(r["source"], []).append(r)
    assert set(by_group) == {"web", "code"}
    for rows in by_group.values():
        # every kept row started within budget; at most one straddler
        over = [r for r in rows if r["cum_tokens"] > 50]
        assert len(over) <= 1
        for r in rows:
            assert r["cum_tokens"] - r["ws_tokens"] < 50


def test_first_straddler_kept_tiny_budget(spark):
    """A budget smaller than any single document still yields exactly the
    hash-first document per group — never an empty group."""
    out = sample_to_token_budget(
        _docs(spark), budget_tokens=1, group_col="source"
    ).collect()
    per_group = {}
    for r in out:
        per_group.setdefault(r["source"], []).append(r["doc_id"])
    assert all(len(ids) == 1 for ids in per_group.values())
    assert set(per_group) == {"web", "code"}


def test_deterministic_and_partitioning_invariant(spark):
    docs = _docs(spark)
    a = {r["doc_id"] for r in sample_to_token_budget(docs, 80, "source").collect()}
    b = {
        r["doc_id"]
        for r in sample_to_token_budget(docs.repartition(13), 80, "source").collect()
    }
    assert a == b and a


def test_global_budget_without_group(spark):
    out = sample_to_token_budget(_docs(spark), budget_tokens=100).collect()
    total = sum(r["ws_tokens"] for r in out)
    max_doc = max(r["ws_tokens"] for r in out)
    assert total >= 100  # budget filled (straddler included)
    assert total - max_doc < 100  # minus the straddler it was under budget


def test_global_shards_parallel_budget(spark):
    """global_shards=K splits the ungrouped budget across K md5 shards —
    total stays within budget + K straddlers, deterministic, and every
    shard's cumulative accounting is self-consistent."""
    docs = _docs(spark, n=200)
    out = sample_to_token_budget(docs, budget_tokens=400, global_shards=4).collect()
    assert out
    total = sum(r["ws_tokens"] for r in out)
    # ≤1 straddler per shard: subtracting the 4 largest kept docs must
    # land under the budget; the budget itself must be (nearly) filled
    biggest = sorted((r["ws_tokens"] for r in out), reverse=True)[:4]
    assert total - sum(biggest) < 400
    assert total >= 400 - sum(biggest)
    # deterministic + partitioning invariant
    again = {
        r["doc_id"]
        for r in sample_to_token_budget(
            docs.repartition(7), budget_tokens=400, global_shards=4
        ).collect()
    }
    assert {r["doc_id"] for r in out} == again
    # the helper shard column must not leak into the output
    assert "_budget_shard" not in sample_to_token_budget(
        docs, budget_tokens=400, global_shards=4
    ).columns


def test_custom_tokens_col(spark):
    """A precomputed (e.g. exact-BPE) count column overrides the default
    whitespace definition."""
    docs = _docs(spark).withColumn("bpe", F.lit(10))
    out = sample_to_token_budget(
        docs, budget_tokens=25, group_col="source", tokens_col=F.col("bpe")
    ).collect()
    for r in out:
        assert r["ws_tokens"] == 10  # the injected definition
    per_group: dict[str, int] = {}
    for r in out:
        per_group[r["source"]] = per_group.get(r["source"], 0) + 1
    assert all(n == 3 for n in per_group.values())  # 2 full + 1 straddler
