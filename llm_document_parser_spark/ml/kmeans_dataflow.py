"""Lloyd's k-means as pure dataflow — deterministic, oracle-checkable,
with the model on the driver and the data never moving.

similarity.ivf_centroids trains its coarse quantizer with Spark ML's
KMeans — fast, but its k-means|| init is seeded-random and its iteration
internals are unobservable, so nothing external can verify the algebra.
This module is the verifiable counterpart (and a drop-in centroid source
for ivf_topk): INIT IS EXPLICIT (the caller names the vectors that seed
each cell — deterministic by construction, the same move as
dedup's fixed LSH geometry), and each Lloyd iteration is

    assign(v) = argmin over cells of round(||v - c||^2, 9)
                (ties -> lowest cell id)
    c'        = per-cell mean of assigned vectors
                (an EMPTY cell keeps its previous centroid)

The distance is rounded to 9 decimals BEFORE the argmin on both engines —
assignment is a discrete decision and must never depend on sub-round
float noise (the catalog's round-before-rank policy, applied to a
clustering step). queries._kmeans_oracle unrolls the identical algebra
as chained DuckDB CTEs over the unnested (vec_id, dim, val) relation —
the third iterative algorithm in the catalog verified end-to-end against
SQL, after PageRank and the GD logistic regression.

Scale shape: assignment compiles to one codegen expression over
broadcast centroid LITERALS (zero shuffle, zero Python); the update is
one groupBy(cell) whose partial aggregation emits at most k rows per
task, and only k x dim doubles ever reach the driver per iteration —
O(model), not O(data). At 10^9 vectors this is exactly MLlib's plan
minus the black box.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dist2(vec: Column, center: list[float]) -> Column:
    return F.round(
        F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(w)) for w in center]),
                lambda x, w: (x.cast("double") - w) * (x.cast("double") - w),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        9,
    )


def assign_cells(
    df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Append ``cell``: the argmin-distance centroid id (ties -> lowest
    id), as a pure column expression over centroid literals."""
    scored = F.array(
        *[
            F.struct(
                _dist2(F.col(vec_col), c).alias("dist"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return df.withColumn("cell", F.array_min(scored)["cell"])


def kmeans_lloyd(
    corpus: DataFrame,
    init_ids: list[int],
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Centroids after ``iterations`` Lloyd steps from the explicitly
    seeded init (centroid i starts at the vector whose ``id_col`` equals
    ``init_ids[i]``). Returns k lists of doubles, ready for
    similarity.ivf_topk / _nearest_cells."""
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    seed_rows = (
        corpus.filter(F.col(id_col).isin([int(i) for i in init_ids]))
        .select(id_col, vec_col)
        .collect()  # k seed vectors — O(model), not a data collection
    )
    by_id = {r[id_col]: [float(x) for x in r[vec_col]] for r in seed_rows}
    missing = [i for i in init_ids if i not in by_id]
    if missing:
        raise ValueError(f"init ids not found in corpus: {missing}")
    centroids = [by_id[i] for i in init_ids]
    dim = len(centroids[0])
    corpus = corpus.persist()
    try:
        for _ in range(iterations):
            assigned = assign_cells(corpus, centroids, vec_col=vec_col)
            rows = (
                assigned.groupBy("cell")
                .agg(
                    *[
                        F.avg(F.col(vec_col)[d].cast("double")).alias(f"m{d}")
                        for d in range(dim)
                    ]
                )
                .collect()  # <= k rows of dim doubles
            )
            means = {r["cell"]: [float(r[f"m{d}"]) for d in range(dim)] for r in rows}
            centroids = [
                means.get(i, centroids[i]) for i in range(len(centroids))
            ]
    finally:
        corpus.unpersist()
    return centroids
