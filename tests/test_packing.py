"""Sequence packing: GPT-style concat-split plan and greedy no-split bins.

The concat-split plan is checked against an independent pure-Python
replay of the same order/cumsum rule; the greedy walk against a
pure-Python greedy packer. Invariants beyond value equality: every token
is placed exactly once, sequences never exceed seq_len except via a
single oversized document, and results are partitioning-invariant.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from llm_document_parser_spark.operators.packing import (
    greedy_bin_stats,
    pack_concat_split,
    pack_greedy,
    packing_stats,
)


def _docs(spark, n=120, seed=7):
    rows = []
    for i in range(n):
        # deterministic lengths 1..60 tokens, a few oversized
        ln = (i * 37 + seed) % 60 + 1
        if i % 29 == 0:
            ln = 90  # oversized vs seq_len=64
        rows.append((i, " ".join(f"w{i}x{j}" for j in range(ln))))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_shard(doc_id: int, n_shards: int) -> int:
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    return int(h[:4], 16) % n_shards


def _py_order(doc_id: int) -> tuple[str, str]:
    return (hashlib.md5(str(doc_id).encode()).hexdigest(), str(doc_id))


def test_concat_split_matches_python_replay(spark):
    docs = _docs(spark)
    plan = {
        r["doc_id"]: r
        for r in pack_concat_split(docs, seq_len=64, n_shards=4).collect()
    }
    rows = docs.collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(_py_shard(r["doc_id"], 4), []).append(r)
    seen = 0
    for shard, members in by_shard.items():
        members.sort(key=lambda r: _py_order(r["doc_id"]))
        cum = 0
        for r in members:
            n = len(r["text"].lower().split(" "))
            got = plan[r["doc_id"]]
            assert got["shard"] == shard
            assert got["n_tokens"] == n
            assert got["start_tok"] == cum
            assert got["seq_first"] == cum // 64
            assert got["seq_last"] == (cum + n - 1) // 64
            assert got["crosses_boundary"] == int(
                (cum + n - 1) // 64 > cum // 64
            )
            cum += n
            seen += 1
    assert seen == len(plan) == 120


def test_packing_stats_cover_all_tokens(spark):
    docs = _docs(spark)
    plan = pack_concat_split(docs, seq_len=64, n_shards=4)
    stats = packing_stats(plan, seq_len=64).collect()
    total_tokens = docs.select(
        F.sum(F.size(F.split(F.lower("text"), " ")))
    ).first()[0]
    assert sum(r["shard_tokens"] for r in stats) == total_tokens
    assert sum(r["n_docs"] for r in stats) == 120
    for r in stats:
        assert r["n_sequences"] == -(-r["shard_tokens"] // 64)
        assert 0.0 <= r["boundary_cross_frac"] <= 1.0


def _py_greedy(members, seq_len):
    bins = {}
    bin_id, fill, first = -1, 0, True
    for r in members:
        n = len(r["text"].lower().split(" "))
        if first or fill + n > seq_len:
            bin_id += 1
            fill = n
            first = False
        else:
            fill += n
        bins[r["doc_id"]] = bin_id
    return bins


def test_greedy_matches_python_replay_and_never_splits(spark):
    docs = _docs(spark)
    packed = pack_greedy(docs, seq_len=64, n_shards=4)
    got = {r["doc_id"]: r for r in packed.collect()}
    rows = docs.collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(_py_shard(r["doc_id"], 4), []).append(r)
    for shard, members in by_shard.items():
        members.sort(key=lambda r: _py_order(r["doc_id"]))
        expect = _py_greedy(members, 64)
        for doc_id, bin_id in expect.items():
            assert got[doc_id]["shard"] == shard
            assert got[doc_id]["bin_id"] == bin_id
    # bins never exceed seq_len unless they hold exactly one oversized doc
    for b in greedy_bin_stats(packed, seq_len=64).collect():
        assert b["bin_tokens"] <= 64 or b["n_docs"] == 1
        assert b["n_docs"] >= 1


def test_greedy_partitioning_invariant(spark):
    docs = _docs(spark)
    one = {
        (r["doc_id"], r["bin_id"])
        for r in pack_greedy(docs.coalesce(1), seq_len=64, n_shards=4).collect()
    }
    many = {
        (r["doc_id"], r["bin_id"])
        for r in pack_greedy(docs.repartition(7), seq_len=64, n_shards=4).collect()
    }
    assert one == many


def test_concat_split_single_shuffle_plan(spark):
    """The packing plan is one window over the shard partitioning —
    exactly one Exchange in the physical plan (scan → project → window)."""
    docs = _docs(spark)
    plan = pack_concat_split(docs, seq_len=64, n_shards=4)
    physical = plan._jdf.queryExecution().executedPlan().toString()
    assert physical.count("Exchange") == 1, physical
