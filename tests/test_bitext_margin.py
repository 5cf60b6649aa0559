"""Margin-based mining tests (operators/bitext.margin_mined_pairs).

Parity against an independent NumPy implementation of the ratio margin,
plus the property the criterion exists for: a HUB vector (high cosine to
everything on the other side) must lose its raw-cosine wins once the
margin denominator absorbs its inflated neighborhood.
"""

from __future__ import annotations

import numpy as np
import pytest

from llm_document_parser_spark.operators.bitext import margin_mined_pairs


def np_margin_pairs(A, B, k, threshold):
    cos = np.round(
        (A / np.linalg.norm(A, axis=1, keepdims=True))
        @ (B / np.linalg.norm(B, axis=1, keepdims=True)).T,
        6,
    )
    fwd = np.array([np.mean(np.sort(row)[::-1][:k]) for row in cos])
    bwd = np.array([np.mean(np.sort(col)[::-1][:k]) for col in cos.T])
    margin = np.round(cos / ((fwd[:, None] + bwd[None, :]) / 2), 6)
    out = []
    for i in range(len(A)):
        j = min(
            range(len(B)), key=lambda j: (-margin[i, j], j)
        )  # argmax, tie on id
        if margin[i, j] >= threshold:
            i_best = min(range(len(A)), key=lambda t: (-margin[t, j], t))
            out.append((i, j, margin[i, j], i_best == i))
    return out


@pytest.fixture(scope="module")
def pools():
    rng = np.random.RandomState(7)
    A = rng.randn(12, 8)
    B = np.vstack(
        [
            A[:10] + 0.15 * rng.randn(10, 8),  # true translations of a0..a9
            rng.randn(2, 8),  # unpaired b10, b11
        ]
    )
    return A, B


def _spark_pairs(spark, A, B, k, threshold):
    a = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(A)],
        "vec_id long, embedding array<double>",
    )
    b = spark.createDataFrame(
        [(j, [float(x) for x in v]) for j, v in enumerate(B)],
        "vec_id long, embedding array<double>",
    )
    return sorted(
        (r["a_id"], r["b_id"], r["margin"], r["mutual"])
        for r in margin_mined_pairs(a, b, k=k, threshold=threshold).collect()
    )


@pytest.mark.parametrize("k,threshold", [(4, 1.0), (2, 1.05), (4, 0.0)])
def test_numpy_parity(spark, pools, k, threshold):
    A, B = pools
    got = _spark_pairs(spark, A, B, k, threshold)
    want = sorted(np_margin_pairs(A, B, k, threshold))
    assert len(got) == len(want)
    for (gi, gj, gm, gmu), (wi, wj, wm, wmu) in zip(got, want):
        assert (gi, gj, gmu) == (wi, wj, wmu)
        assert gm == pytest.approx(wm, abs=2e-6)


def test_recovers_planted_translations(spark, pools):
    A, B = pools
    got = {(i, j) for i, j, _, mu in _spark_pairs(spark, A, B, 4, 1.0) if mu}
    planted = {(i, i) for i in range(10)}
    # mutual margin pairs at threshold 1.0 recover nearly all plants and
    # admit no wrong mutual pair among the planted rows
    assert len(got & planted) >= 8
    assert all(i == j for (i, j) in got if i < 10)


def test_hub_suppression(spark):
    # a1..a4 pair cleanly with b1..b4; b0 is a HUB: a centroid-ish vector
    # with decent cosine to every a. Raw-cosine argmax for some a rows is
    # the hub; the margin denominator must strip its advantage so every
    # paired row still finds its true partner.
    rng = np.random.RandomState(3)
    A = rng.randn(5, 6) * 0.3 + np.eye(5, 6) * 2.0
    B = A + 0.05 * rng.randn(5, 6)
    B[0] = A.mean(axis=0) * 1.2  # hub replaces b0
    pairs = {i: j for i, j, _, _ in _spark_pairs(spark, A, B, 3, 0.0)}
    assert all(pairs[i] == i for i in range(1, 5))
