"""Trust propagation tests (operators/labelprop.py).

Parity is checked against an independent dense NumPy implementation of
the documented semantics (biased seed restart, weighted out-edge split,
trust absorbed at dangling hosts) — not against the Spark code's own
algebra. Invariants: seeds-only fixpoint with no edges, zero seeds →
all-zero scores, trust bounded by the seed mass, and spam islands
unreachable from seeds stay at exactly 0.
"""

from __future__ import annotations

import numpy as np
import pytest

from llm_document_parser_spark.operators.labelprop import propagate_trust

EDGES = [
    # a trusted cluster (a -> b -> c) and a spam island (x <-> y) with a
    # link INTO the trusted cluster (spam linking out must gain nothing)
    ("a", "b", 3),
    ("a", "c", 1),
    ("b", "c", 2),
    ("c", "a", 1),
    ("x", "y", 5),
    ("y", "x", 5),
    ("x", "b", 1),
]
SEEDS = [("a", 1.0), ("z", 0.5)]  # z: seed host absent from the graph


def numpy_trust(edges, seeds, iters, alpha):
    hosts = sorted(
        {e[0] for e in edges} | {e[1] for e in edges} | {h for h, _ in seeds}
    )
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    w = np.zeros((n, n))
    for s, d, k in edges:
        w[idx[s], idx[d]] += k
    outw = w.sum(axis=1)
    p = np.divide(w, outw[:, None], out=np.zeros_like(w), where=outw[:, None] > 0)
    seed = np.zeros(n)
    for h, v in seeds:
        seed[idx[h]] = v
    score = seed.copy()
    for _ in range(iters):
        score = (1 - alpha) * seed + alpha * (score @ p)
    return dict(zip(hosts, score))


@pytest.mark.parametrize("iters,alpha", [(0, 0.85), (1, 0.85), (4, 0.85), (3, 0.5)])
def test_numpy_parity(spark, iters, alpha):
    edges = spark.createDataFrame(
        EDGES, "src_host string, dst_host string, n_links long"
    )
    seeds = spark.createDataFrame(SEEDS, "host string, seed double")
    got = {
        r["host"]: r["trust"]
        for r in propagate_trust(edges, seeds, iterations=iters, alpha=alpha).collect()
    }
    want = numpy_trust(EDGES, SEEDS, iters, alpha)
    assert set(got) == set(want)
    for h in want:
        assert got[h] == pytest.approx(want[h], abs=1e-12), h


def test_invariants(spark):
    edges = spark.createDataFrame(
        EDGES, "src_host string, dst_host string, n_links long"
    )
    seeds = spark.createDataFrame(SEEDS, "host string, seed double")
    got = {
        r["host"]: r["trust"]
        for r in propagate_trust(edges, seeds, iterations=3, alpha=0.85).collect()
    }
    # spam island unreachable from any seed: exactly zero, not epsilon
    assert got["x"] == 0.0 and got["y"] == 0.0
    # the seed grows the trusted cluster; everything stays in [0, seed mass]
    assert got["b"] > 0 and got["c"] > 0
    assert all(0.0 <= v <= 1.5 for v in got.values())
    # isolated seed host keeps exactly (1-alpha)*seed + ... no in-mass:
    # score_i(z) = (1-0.85)*0.5 after any i >= 1 iterations
    assert got["z"] == pytest.approx(0.15 * 0.5, abs=1e-15)


def test_zero_seeds_and_empty_edges(spark):
    edges = spark.createDataFrame(
        EDGES, "src_host string, dst_host string, n_links long"
    )
    no_seeds = spark.createDataFrame([], "host string, seed double")
    got = propagate_trust(edges, no_seeds, iterations=2).collect()
    assert got and all(r["trust"] == 0.0 for r in got)

    no_edges = spark.createDataFrame(
        [], "src_host string, dst_host string, n_links long"
    )
    seeds = spark.createDataFrame(SEEDS, "host string, seed double")
    got2 = {
        r["host"]: r["trust"]
        for r in propagate_trust(no_edges, seeds, iterations=3).collect()
    }
    # with no edges every seed sits at its (1-alpha)-damped restart value
    assert got2 == {
        "a": pytest.approx(0.15, abs=1e-15),
        "z": pytest.approx(0.075, abs=1e-15),
    }
