"""SemDeDup (similarity.semdedup / semantic_dup_pairs, arXiv:2303.09540):
pure-Python replay parity, the keep-least-typical survivor rule, cell
blindness (cross-cell dups are by-design unseen), transitive chains, and
the no-cartesian plan invariant."""

from __future__ import annotations

import math

from llm_document_parser_spark.operators import similarity

# 2-D centroids: cell 0 points east, cell 1 north — cosine-distinct
CENTROIDS = [[1.0, 0.0], [0.0, 1.0]]


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return round(d / (na * nb), 6)


def _cell(v):
    dists = [
        sum((x - w) ** 2 for x, w in zip(v, c)) for c in CENTROIDS
    ]
    return min(range(len(dists)), key=lambda i: (dists[i], i))


def _replay(vecs: dict[int, list[float]], threshold: float):
    cells = {i: _cell(v) for i, v in vecs.items()}
    pairs = [
        (a, b)
        for a in vecs
        for b in vecs
        if a < b
        and cells[a] == cells[b]
        and _cos(vecs[a], vecs[b]) >= threshold
    ]
    # transitive closure -> min-id component
    comp = {i: i for i in vecs}

    def find(x):
        while comp[x] != x:
            comp[x] = comp[comp[x]]
            x = comp[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            comp[max(ra, rb)] = min(ra, rb)
    clusters: dict[int, list[int]] = {}
    for i in vecs:
        clusters.setdefault(find(i), []).append(i)
    out = {}
    for members in clusters.values():
        cluster = min(members)
        keep = min(
            members,
            key=lambda i: (_cos(vecs[i], CENTROIDS[cells[i]]), i),
        )
        for i in members:
            out[i] = (cells[i], cluster, keep, i == keep)
    return out


def _run(spark, vecs: dict[int, list[float]], threshold: float = 0.99):
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    rows = similarity.semdedup(df, CENTROIDS, threshold=threshold).collect()
    return {
        r["id"]: (r["cell"], r["cluster"], r["keep_id"], r["keep"])
        for r in rows
    }


VECS = {
    1: [10.0, 1.0],     # east cell
    2: [10.0, 1.001],   # ~identical to 1 -> dup
    3: [10.0, 1.002],   # ~identical to 1,2 -> 3-member group
    4: [8.0, 6.0],      # east cell but pointing away: unique
    5: [1.0, 10.0],     # north cell, unique
    6: [1.5, 10.0],     # north cell, cos(5,6) ~ 0.9988 -> dup with 5
}


def test_replay_parity(spark):
    assert _run(spark, VECS, 0.995) == _replay(VECS, 0.995)


def test_keeps_least_typical_member(spark):
    got = _run(spark, VECS, 0.995)
    # group {5, 6}: 6 is farther from the north centroid (lower cosine)
    # so SemDeDup keeps 6, drops 5
    assert _cos(VECS[6], CENTROIDS[1]) < _cos(VECS[5], CENTROIDS[1])
    assert got[6][3] is True and got[5][3] is False
    assert got[5][2] == 6  # keep_id points at the survivor


def test_singletons_keep_themselves(spark):
    got = _run(spark, VECS, 0.995)
    assert got[4] == (0, 4, 4, True)


def test_cross_cell_near_dups_are_invisible_by_design(spark):
    # two near-identical diagonal vectors straddling the cell boundary:
    # SemDeDup only scores within-cell pairs, so both survive
    vecs = {1: [1.0, 0.999], 2: [0.999, 1.0]}
    got = _run(spark, vecs, 0.9)
    if got[1][0] != got[2][0]:  # landed in different cells
        assert got[1][3] and got[2][3]


def test_transitive_chain_collapses_to_one_group(spark):
    # a-b and b-c above threshold, a-c below: one component regardless
    vecs = {
        1: [10.0, 0.0],
        2: [10.0, 1.0],
        3: [10.0, 2.0],
    }
    t = 0.994  # cos(1,2)=cos(2,3)~0.995 >= t, cos(1,3)~0.981 < t
    got = _run(spark, vecs, t)
    assert got == _replay(vecs, t)
    assert len({v[1] for v in got.values()}) == 1  # one cluster
    assert sum(1 for v in got.values() if v[3]) == 1  # one survivor


def test_pairs_plan_is_cell_equijoin_no_cartesian(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    plan = (
        similarity.semantic_dup_pairs(df, CENTROIDS, 0.9)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# contrastive pair mining
# ---------------------------------------------------------------------------


def test_contrastive_pairs_structure(spark):
    import pyspark.sql.functions as F

    from llm_document_parser_spark.operators.similarity import (
        mine_contrastive_pairs,
    )

    # two clusters of 5 and 2, plus a singleton (no positives from it)
    rows = [(i, 1) for i in range(5)] + [(10, 2), (11, 2), (20, 3)]
    members = spark.createDataFrame(rows, "doc_id long, cluster_id long")
    got = mine_contrastive_pairs(members, max_members=3).collect()
    # cluster 1 capped at 3 reps → C(3,2)=3 pairs; cluster 2 → 1 pair
    assert len(got) == 4
    by_cluster = {}
    for r in got:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
        # triplet sanity: anchor ≠ positive, negative (when drawn) is
        # from a different cluster
        assert r["anchor_id"] != r["positive_id"]
        if r["negative_id"] is not None:
            neg_cluster = 1 if r["negative_id"] < 5 else (
                2 if r["negative_id"] in (10, 11) else 3
            )
            assert neg_cluster != r["cluster_id"]
    assert len(by_cluster[1]) == 3 and len(by_cluster[2]) == 1
    # determinism: same salt → identical triplets
    again = mine_contrastive_pairs(members, max_members=3).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
    # different salt → same pair structure is allowed to differ; just
    # assert it still yields 4 valid rows (re-draw semantics)
    redraw = mine_contrastive_pairs(members, max_members=3, salt="ep2")
    assert redraw.count() == 4


def test_contrastive_pairs_megacluster_capped(spark):
    from llm_document_parser_spark.operators.similarity import (
        mine_contrastive_pairs,
    )

    members = spark.createDataFrame(
        [(i, 1) for i in range(500)], "doc_id long, cluster_id long"
    )
    got = mine_contrastive_pairs(members, max_members=4)
    assert got.count() == 6  # C(4,2), not C(500,2)
