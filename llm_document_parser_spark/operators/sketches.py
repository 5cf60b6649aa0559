"""KMV (k-minimum-values) sketches — cross-corpus overlap without a
cross-corpus join.

"How much of snapshot B is already in corpus A?" is the first question
every incremental crawl ingest asks. Answering it exactly means joining
two 10^12-row digest sets; the KMV sketch (Bar-Yossef et al. 2002 /
Beyer et al. SIGMOD 2007) answers it from two k-row summaries: keep the
k smallest hash values per corpus, estimate distinct cardinality from
the k-th smallest, and estimate Jaccard as the fraction of the combined
sketch's k smallest that BOTH sides contain.

The hash here is an md5-derived 48-bit integer — a HASH, not an RNG —
so the whole estimator is DETERMINISTIC and the DuckDB oracle replays
it bit-for-bit (`corpus_overlap_kmv`): the sketch estimate is testable
the same way exact operators are, no tolerance bands.

Scale shape: per corpus, one distinct-combine shuffle over 48-bit ints
(map-side partial aggregation collapses duplicates before the wire)
followed by TakeOrderedAndProject(k) — a per-partition heap + tree
reduction, never a full sort. Everything after that operates on ≤2k
rows. The exact path (``include_exact``) is the verification tier: it
joins the full distinct digest sets and is priced accordingly — compose
it on samples, use the sketch at corpus width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_SPACE = float(1 << 48)


def kmv_hash(text: Column) -> Column:
    """Deterministic 48-bit uniform hash of a string column (first 12 hex
    chars of md5) — exact integer, replayable in any SQL engine."""
    return F.conv(F.substring(F.md5(text), 1, 12), 16, 10).cast("long")


def kmv_sketch(df: DataFrame, text_col: str, k: int = 256) -> DataFrame:
    """The k smallest DISTINCT 48-bit hashes of ``text_col`` — one
    ``(h)`` row each. distinct's map-side combine + TakeOrdered heap:
    no full sort, shuffle volume bounded by per-partition distincts."""
    return (
        df.select(kmv_hash(F.col(text_col)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    k: int = 256,
    include_exact: bool = False,
) -> DataFrame:
    """One summary row comparing two corpora.

    Sketch columns: ``n_sketch`` (combined-sketch size, = k unless the
    union is smaller), ``kth_hash``, ``kmv_union_est`` (distinct-union
    estimate: (n-1)·2^48/h_(n) when the sketch is full, else the exact
    sketch size), ``kmv_jaccard`` (shared fraction of the combined
    sketch). With ``include_exact``: exact distinct counts, intersection
    and Jaccard from a full digest join — the verification tier."""
    sa = kmv_sketch(df_a, text_col, k).select("h", F.lit(1).alias("in_a"))
    sb = kmv_sketch(df_b, text_col, k).select("h", F.lit(1).alias("in_b"))
    union_sketch = (
        sa.join(sb, "h", "full")
        .select(
            "h",
            F.coalesce("in_a", F.lit(0)).alias("in_a"),
            F.coalesce("in_b", F.lit(0)).alias("in_b"),
        )
        .orderBy("h")
        .limit(k)
    )
    agg = union_sketch.agg(
        F.count(F.lit(1)).cast("long").alias("n_sketch"),
        F.max("h").cast("long").alias("kth_hash"),
        F.sum((F.col("in_a") * F.col("in_b")).cast("long"))
        .cast("long")
        .alias("n_shared"),
    )
    est = F.when(
        F.col("n_sketch") < k, F.col("n_sketch").cast("double")
    ).otherwise(
        (F.col("n_sketch") - 1).cast("double")
        * F.lit(_HASH_SPACE)
        / F.col("kth_hash").cast("double")
    )
    out = agg.select(
        "n_sketch",
        "kth_hash",
        F.round(est, 2).alias("kmv_union_est"),
        F.round(
            F.col("n_shared").cast("double") / F.col("n_sketch").cast("double"),
            6,
        ).alias("kmv_jaccard"),
    )
    if not include_exact:
        return out
    da = df_a.select(F.md5(F.col(text_col)).alias("d")).distinct()
    db = df_b.select(F.md5(F.col(text_col)).alias("d")).distinct()
    inter = da.join(db, "d").agg(
        F.count(F.lit(1)).cast("long").alias("exact_inter")
    )
    counts = da.agg(F.count(F.lit(1)).cast("long").alias("exact_a")).crossJoin(
        db.agg(F.count(F.lit(1)).cast("long").alias("exact_b"))
    )
    exact = counts.crossJoin(inter).select(
        "exact_a",
        "exact_b",
        "exact_inter",
        F.round(
            F.col("exact_inter").cast("double")
            / (F.col("exact_a") + F.col("exact_b") - F.col("exact_inter")).cast(
                "double"
            ),
            6,
        ).alias("exact_jaccard"),
    )
    return out.crossJoin(exact)
