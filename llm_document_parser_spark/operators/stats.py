"""Mergeable per-source corpus statistics — the incremental-ingest
bookkeeping tier.

A daily-crawl pipeline must answer "how big is each source now?" after
every batch WITHOUT re-scanning the 10^12-row corpus. The fix is the
standard sketch-algebra discipline: keep only statistics that form a
commutative monoid (counts, sums, mins, maxs), so
``stats(A ∪ B) == merge(stats(A), stats(B))`` exactly, for any split,
in any order. Derived values (means) are computed at READ time from the
monoid fields, never stored — storing a mean breaks mergeability.

``incremental_stats_merge`` (queries.py) proves the algebra end-to-end:
the engine computes stats on two disjoint halves and merges; the oracle
recomputes from the full table in one pass; the rows must be identical.

Scale shape: ``source_stats`` is one map-side-combining agg over the
batch (batch-sized, not corpus-sized); ``merge_stats`` is a union + agg
over |sources| rows — driver-trivial state, executor-free in practice.
Reference analog: the service recounts its Mongo collection per status
request (src/api.py summary endpoint); at crawl scale the count must be
maintained, not recomputed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the monoid fields, in canonical column order
STAT_FIELDS = ("n_docs", "n_tokens", "sum_chars", "min_chars", "max_chars")


def source_stats(
    docs: DataFrame, source_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-source mergeable stats for one batch: doc count, whitespace
    token count, char sum/min/max. One aggregation, partial map-side."""
    n_chars = F.length(F.col(text_col)).cast("long")
    n_toks = F.size(F.split(F.col(text_col), " ")).cast("long")
    return docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(n_toks).cast("long").alias("n_tokens"),
        F.sum(n_chars).cast("long").alias("sum_chars"),
        F.min(n_chars).cast("long").alias("min_chars"),
        F.max(n_chars).cast("long").alias("max_chars"),
    )


def merge_stats(*stats: DataFrame) -> DataFrame:
    """Exact merge of any number of ``source_stats`` outputs — the monoid
    reduce: sums add, mins min, maxs max. Associative and commutative by
    construction, so batches can merge in any grouping (tree-reduce
    across days, re-merge after replays)."""
    if not stats:
        raise ValueError("merge_stats needs at least one stats frame")
    u = stats[0]
    for s in stats[1:]:
        u = u.unionByName(s)
    return u.groupBy("source").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum("sum_chars").cast("long").alias("sum_chars"),
        F.min("min_chars").cast("long").alias("min_chars"),
        F.max("max_chars").cast("long").alias("max_chars"),
    )


def with_derived(stats: DataFrame) -> DataFrame:
    """Read-time derived columns: mean chars/tokens per doc (6dp).
    Computed from monoid fields — never stored in the running stats."""
    return stats.select(
        "source",
        *STAT_FIELDS,
        F.round(
            F.col("sum_chars").cast("double") / F.col("n_docs").cast("double"),
            6,
        ).alias("avg_chars"),
        F.round(
            F.col("n_tokens").cast("double") / F.col("n_docs").cast("double"),
            6,
        ).alias("avg_tokens"),
    )
