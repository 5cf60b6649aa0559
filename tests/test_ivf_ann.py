"""IVF ANN: KMeans coarse quantizer + within-cell exact ranking."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from llm_document_parser_spark.operators.similarity import (
    cosine_topk,
    ivf_centroids,
    ivf_topk,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_ivf_finds_planted_duplicates(spark, corpus):
    # planted copies: identical vectors must share a cell and rank first
    copies = corpus.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 9000).alias("vec_id"), "embedding", "label"
    )
    full = corpus.unionByName(copies)
    cents = ivf_centroids(full, n_cells=8)
    assert len(cents) == 8 and len(cents[0]) == 64
    out = ivf_topk(copies, full, cents, k=1, n_probe=1)
    rows = {r["query_id"]: r for r in out.collect()}
    for qid in range(9000, 9005):
        assert rows[qid]["neighbor_id"] == qid - 9000
        assert rows[qid]["score"] == 1.0


def test_ivf_full_probe_degrades_to_exact(spark, corpus):
    small = corpus.filter(F.col("vec_id") < 60)
    cents = ivf_centroids(small, n_cells=4)
    queries = small.filter(F.col("vec_id") < 3)
    ivf = ivf_topk(queries, small, cents, k=3, n_probe=4)  # probe ALL cells
    exact = cosine_topk(queries, small, k=3)
    got = sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in ivf.collect())
    want = sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in exact.collect())
    assert got == want
