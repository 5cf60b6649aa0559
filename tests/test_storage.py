"""Bucketed-table layout (storage.py): the co-located join must not
shuffle — asserted on the executed plan, not assumed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from llm_document_parser_spark.storage import bucketed_join, write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _mk(spark, n, extra):
    return spark.range(n).select(
        F.concat(F.lit("https://h.example/p"), F.col("id")).alias("url"),
        (F.col("id") * extra).alias(f"v{extra}"),
    )


def test_cobucketed_join_has_zero_exchanges(spark, no_broadcast):
    write_bucketed(_mk(spark, 1000, 2), "t_pages", "url", 8)
    write_bucketed(_mk(spark, 800, 3), "t_meta", "url", 8)
    joined = bucketed_join(spark, "t_pages", "t_meta", "url")
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan     # co-located: bucket layout reused
    assert joined.count() == 800


def test_sorted_buckets_elide_sort_under_legacy_ordering(spark, no_broadcast):
    # SPARK-28583: the scan reports sortBy ordering only under this conf
    # and with one file per bucket (write_bucketed guarantees the latter)
    write_bucketed(_mk(spark, 1000, 2), "t_s1", "url", 8)
    write_bucketed(_mk(spark, 800, 3), "t_s2", "url", 8)
    conf = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    spark.conf.set(conf, "true")
    try:
        plan = _plan(bucketed_join(spark, "t_s1", "t_s2", "url"))
    finally:
        spark.conf.set(conf, "false")
    assert "Exchange" not in plan and "Sort [" not in plan


def test_groupby_on_bucket_key_reuses_layout(spark):
    write_bucketed(_mk(spark, 500, 2), "t_grp", "url", 8)
    agg = spark.table("t_grp").groupBy("url").agg(F.sum("v2").alias("s"))
    assert "Exchange" not in _plan(agg)


def test_mismatched_bucket_counts_fall_back_to_shuffle(spark, no_broadcast):
    # the silent-degradation case the module docstring warns about
    write_bucketed(_mk(spark, 300, 2), "t_a8", "url", 8)
    write_bucketed(_mk(spark, 300, 3), "t_b4", "url", 4)
    plan = _plan(bucketed_join(spark, "t_a8", "t_b4", "url"))
    assert "Exchange" in plan


def test_join_values_match_unbucketed(spark, no_broadcast):
    left, right = _mk(spark, 200, 2), _mk(spark, 150, 3)
    write_bucketed(left, "t_v1", "url", 8)
    write_bucketed(right, "t_v2", "url", 8)
    got = sorted(
        tuple(r) for r in bucketed_join(spark, "t_v1", "t_v2", "url").collect()
    )
    want = sorted(tuple(r) for r in left.join(right, "url").collect())
    assert got == want
