"""Sliding-window token chunking: coverage, overlap and digest checks
against a pure-Python replay, plus plan shape (zero shuffles).
"""

from __future__ import annotations

import hashlib

import pytest

from llm_document_parser_spark.operators.chunking import chunk_tokens


def _docs(spark):
    rows = [
        (1, "a b c d e"),                      # shorter than one chunk
        (2, " ".join(f"t{i}" for i in range(8))),   # exactly chunk_len
        (3, " ".join(f"t{i}" for i in range(9))),   # one token over
        (4, " ".join(f"u{i}" for i in range(25))),  # many chunks
        (5, "solo"),
        (6, "x  y   z"),                       # runs of spaces drop empties
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_chunks(text, chunk_len, overlap):
    toks = [t for t in text.split(" ") if t != ""]
    stride = chunk_len - overlap
    n = len(toks)
    n_chunks = 1 if n <= chunk_len else -(-(n - chunk_len) // stride) + 1
    out = []
    for i in range(n_chunks):
        piece = toks[i * stride : i * stride + chunk_len]
        out.append(
            (
                i,
                i * stride,
                len(piece),
                hashlib.md5(" ".join(piece).encode()).hexdigest(),
            )
        )
    return out


@pytest.mark.parametrize("chunk_len,overlap", [(8, 0), (8, 3), (4, 1)])
def test_chunks_match_python_replay(spark, chunk_len, overlap):
    docs = _docs(spark)
    got = {}
    for r in chunk_tokens(docs, chunk_len, overlap).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["start_tok"], r["chunk_tokens"], r["chunk_digest"])
        )
    for row in docs.collect():
        expect = _py_chunks(row["text"], chunk_len, overlap)
        assert sorted(got[row["doc_id"]]) == expect, row["text"]


def test_every_token_covered_once_without_overlap(spark):
    docs = _docs(spark)
    chunks = chunk_tokens(docs, chunk_len=8, overlap=0).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], 0)
        by_doc[r["doc_id"]] += r["chunk_tokens"]
    for row in docs.collect():
        n = len([t for t in row["text"].split(" ") if t])
        assert by_doc[row["doc_id"]] == n


def test_overlap_must_be_smaller_than_chunk(spark):
    with pytest.raises(ValueError):
        chunk_tokens(_docs(spark), chunk_len=4, overlap=4)


def test_chunking_plan_has_no_exchange(spark):
    plan = chunk_tokens(_docs(spark), chunk_len=8, overlap=3)
    physical = plan._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in physical, physical
