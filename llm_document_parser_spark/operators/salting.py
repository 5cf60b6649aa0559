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
