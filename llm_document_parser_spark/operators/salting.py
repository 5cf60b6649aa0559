"""Explicit skew salting — the north_rule's "salted-key handling for skewed
hosts" as reusable plan shapes.

AQE's skew-join splitting only fixes JOINS; skewed GROUPING keys (one hot
host owning a large fraction of a zipfian crawl) still funnel one reducer
unless the aggregation decomposes. Three tools:

* ``with_salt``             — append ``salt = pmod(xxhash64(src), S)``
* ``salted_group_count``    — two-phase count: partial per (key, salt),
                              final per key. The salt MUST derive from a
                              column that varies WITHIN a key (a row id,
                              url, timestamp) — salting on the key itself
                              is a constant per key and never splits the
                              hot key across reducers. For plain counts
                              Spark's own partial aggregation already does
                              this; the explicit form matters when composed
                              with aggregates that DON'T combine partially —
                              ``collect_set``/``collect_list`` per key.
* ``salted_distinct_count`` — COUNT(DISTINCT x) per skewed key: distinct
                              within (key, salt) shards first (small local
                              sets), then merge exact distinct per key.
                              Avoids a single reducer holding the hot
                              key's full value set.

All shapes are oracle-checked (queries.py: host_url_stats_salted).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_source: str | Column, buckets: int) -> DataFrame:
    src = F.col(salt_source) if isinstance(salt_source, str) else salt_source
    return df.withColumn("salt", F.pmod(F.xxhash64(src), F.lit(buckets)))


def salted_group_count(
    df: DataFrame,
    key: str,
    salt_source: str | Column,
    count_col: str = "n",
    buckets: int = 16,
) -> DataFrame:
    """Two-phase count per key: (key, salt) partials → key totals.

    ``salt_source`` must vary within a key (row id / url / timestamp) so a
    hot key's rows spread across ``buckets`` reducers in phase one; any
    assignment is *correct* (partials always sum to the total), only the
    spread depends on it.
    """
    salted = with_salt(df, salt_source, buckets)
    partial = salted.groupBy(key, "salt").agg(F.count("*").alias("_pn"))
    return partial.groupBy(key).agg(F.sum("_pn").cast("long").alias(count_col))


def salted_distinct_count(
    df: DataFrame,
    key: str,
    value: str,
    out_col: str = "n_distinct",
    buckets: int = 16,
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key without a hot-key reducer.

    Salt on the VALUE so equal values land in the same shard (distinctness
    within a shard is globally correct) and the hot key's value set splits
    across ``buckets`` reducers; the final per-key sum is exact.
    """
    salted = with_salt(df, value, buckets)
    shard = (
        salted.groupBy(key, "salt")
        .agg(F.countDistinct(value).alias("_pd"))
    )
    return shard.groupBy(key).agg(F.sum("_pd").cast("long").alias(out_col))


def key_skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """One-row skew diagnostic for a prospective shuffle key — the
    measurement that DECIDES whether the salted shapes above (or AQE
    skew-join) are needed, instead of guessing:

    ``n_rows``/``n_keys``/``avg_rows_per_key``, the hot key itself
    (``max_key``, lexicographic-min tie-break) with ``max_key_rows`` and
    ``top1_share``, the exact ``p99_key_rows`` percentile, ``skew_ratio``
    (max/avg), and ``suggested_salt`` = ceil(max/p99) — how many ways the
    hot key must split so its shards look like ordinary reducers (1 = no
    salting needed).

    Scale shape: one key-keyed count (map-side combine) and one single-row
    aggregate over the per-key counts. The key-count table is |keys| rows,
    not |corpus|; exact percentile over it is the same cost class the
    doc_length_quantiles report already prices (swap approx_percentile at
    10^12 distinct keys, documented there)."""
    counts = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    hot = (
        counts.orderBy(F.desc("c"), "k")
        .limit(1)
        .select(F.col("k").alias("max_key"))
    )
    agg = counts.agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("c").cast("long").alias("max_key_rows"),
        F.percentile(F.col("c"), F.lit(0.99)).alias("_p99"),
    ).crossJoin(hot)
    avg = F.col("n_rows").cast("double") / F.col("n_keys").cast("double")
    return agg.select(
        "n_rows",
        "n_keys",
        F.round(avg, 4).alias("avg_rows_per_key"),
        "max_key",
        "max_key_rows",
        F.round(
            F.col("max_key_rows").cast("double") / F.col("n_rows").cast("double"),
            6,
        ).alias("top1_share"),
        F.round(F.col("_p99"), 4).alias("p99_key_rows"),
        F.round(F.col("max_key_rows").cast("double") / avg, 4).alias(
            "skew_ratio"
        ),
        F.greatest(
            F.lit(1).cast("long"),
            F.ceil(
                F.col("max_key_rows").cast("double")
                / F.greatest(F.col("_p99"), F.lit(1.0))
            ).cast("long"),
        ).alias("suggested_salt"),
    )
