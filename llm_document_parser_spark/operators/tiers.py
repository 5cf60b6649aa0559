"""Source/host-level quality tiering — the corpus-curation "domain
prior" (CCNet aggregates LM quality per domain; FineWeb filters whole
hosts on aggregate signals; reference parity: the engine's per-source
rollups, ``src/app.py`` summary endpoints, generalized to a quality
prior).

Per-document signals are noisy; a host serving mostly boilerplate or
spam is a stable signal. The operator aggregates a cheap per-document
quality statistic (type-token ratio — repetitive/templated text scores
low) to one score per source, cuts sources into ``n_tiers`` quality
tiers, and joins each document's source tier back as a prior column.

Scale shape: the per-doc stats are a narrow map (split + distinct, no
shuffle); the rollup is one groupBy on the source key; the tier cut is
a window over the SOURCE table — |sources| ≪ |docs| (10^8 hosts vs
10^12 pages), and at host counts where a single-partition ntile window
stalls, swap in the two-pass bucket-cumsum used by
``operators/sampling.py token_shards(global_shards=...)`` — quantile
thresholds distribute trivially. The join-back broadcasts the tiny
tier table, so document text never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _words(text_col: str):
    return F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda x: x != ""
    )


def doc_quality_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """(id, group, toks, ttr) — whitespace token count and type-token
    ratio (distinct/total, 0.0 for empty text) per document. Narrow
    per-row plan, zero shuffles."""
    w = _words(text_col)
    toks = F.size(w)
    return df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        toks.cast("long").alias("toks"),
        F.when(
            toks > 0, F.size(F.array_distinct(w)) / toks.cast("double")
        )
        .otherwise(F.lit(0.0))
        .alias("ttr"),
    )


def source_quality_tiers(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    n_tiers: int = 4,
) -> DataFrame:
    """(grp, n_docs, avg_toks, source_score, source_tier) — one row per
    source. ``source_score`` is the mean type-token ratio (6 dp);
    tier 1 holds the highest-scoring sources. Ties break on the source
    name so the cut is deterministic."""
    stats = doc_quality_stats(df, id_col, text_col, group_col)
    per_src = stats.groupBy("grp").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.avg("toks"), 4).alias("avg_toks"),
        F.round(F.avg("ttr"), 6).alias("source_score"),
    )
    # Single-partition window over the small source table only — see the
    # module docstring for the parallel replacement at extreme host counts.
    w = Window.orderBy(F.desc("source_score"), F.col("grp"))
    return per_src.withColumn(
        "source_tier", F.ntile(n_tiers).over(w).cast("long")
    )


def docs_with_source_tier(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    n_tiers: int = 4,
) -> DataFrame:
    """(id, grp, source_score, source_tier) per document — the source
    prior joined back via a broadcast of the tier table, so the corpus
    side never shuffles."""
    tiers = source_quality_tiers(df, id_col, text_col, group_col, n_tiers)
    return (
        df.select(F.col(id_col).alias("id"), F.col(group_col).alias("grp"))
        .join(
            F.broadcast(tiers.select("grp", "source_score", "source_tier")),
            "grp",
        )
        .select("id", "grp", "source_score", "source_tier")
    )
