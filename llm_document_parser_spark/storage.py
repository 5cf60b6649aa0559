"""Bucketed-table storage — the co-located-join layout for 10^12 rows.

Several operator docstrings promise "materialize this table
partitioned/bucketed by its join key and the repeated joins stop
shuffling" (``operators/search.py:63`` posting lists,
``operators/dedup.py:240`` the incremental LSH band index,
``similarity.py:266`` IVF cells). This module is that promise made
concrete: ``bucketBy`` writes with the key's hash partitioning baked
into the table metadata, so every later equi-join or groupBy on the
key reads co-located buckets and Catalyst plans NO Exchange — the
difference between re-shuffling 100 TB per query and never shuffling
it again after ingest.

Notes that matter in production (tests pin the plan shapes):

* both sides of a join must agree on bucket COUNT and KEY; a mismatch
  silently falls back to a shuffled plan — assert the plan, don't
  assume (tests/test_storage.py does exactly that);
* ``sortBy`` within buckets can additionally remove the per-task Sort
  under sort-merge join, but since Spark 3.0 (SPARK-28583) the scan
  reports its ordering only under
  ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` AND with
  exactly one file per bucket — both are arranged here (the write
  repartitions to one file per bucket; enabling the conf is the
  caller's choice, plan-asserted in the tests);
* bucket metadata lives in the session catalog (``saveAsTable``); on a
  real cluster that is the Hive metastore / Iceberg catalog (iceberg.py
  owns that seam — Iceberg's hidden ``bucket(N, key)`` partition
  transform is the same layout with engine-portable metadata);
* the sandbox uses the in-memory catalog: within-session semantics are
  identical, persistence across sessions is the metastore's job.
"""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _purge_orphan_location(spark: SparkSession, table: str) -> None:
    """An in-memory catalog forgets tables across sessions but leaves the
    managed location on disk; ``saveAsTable`` then fails with
    LOCATION_ALREADY_EXISTS. Purge the orphan — bounded strictly to
    ``<warehouse.dir>/<table>`` for simple LOCAL table names (a real
    metastore never hits this path)."""
    if "." in table:
        return
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", ""))
    if wh.scheme not in ("", "file") or not wh.path:
        return
    shutil.rmtree(f"{wh.path.rstrip('/')}/{table.lower()}", ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int,
    sort: bool = True,
) -> None:
    """Materialize ``df`` as a parquet table bucketed (and by default
    sorted) by ``key`` — one shuffle now, none on any later key-join.

    The write repartitions to exactly one file per bucket (repartition
    hashing == bucket hashing, both Murmur3): Spark only trusts a
    bucket's sortBy order — and elides the per-task Sort under
    sort-merge join — when the bucket is a SINGLE file, and one-file
    buckets are the small-files discipline a 10^12-row table needs
    anyway."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    _purge_orphan_location(spark, table)
    w = (
        df.repartition(num_buckets, F.col(key))
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Equi-join two co-bucketed tables on ``key``. With matching bucket
    specs the executed plan contains zero Exchange operators (asserted
    in tests/test_storage.py); with ``sortBy`` layouts, zero Sorts too."""
    return spark.table(left_table).join(spark.table(right_table), key)
