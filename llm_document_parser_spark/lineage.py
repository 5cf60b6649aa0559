"""Per-partition lineage/checkpoint tables + idempotent resume.

Replaces the reference's Celery progress states (reference:
src/celery_app.py:51-72) and batch summary (reference:
src/batch_processor.py:58-66) with durable tables:

* work is split into ``num_buckets`` deterministic url-hash buckets
  (``pmod(xxhash64(url), B)``) — the unit of commit;
* results are written parquet partitioned by ``bucket`` (dynamic partition
  overwrite → re-running a bucket replaces, never duplicates);
* after each bucket group commits, a lineage row
  (job_id, bucket, status, rows, started_at, finished_at, attempt) appends;
* resume = anti-join the bucket list against completed lineage rows — only
  unfinished buckets are recomputed. Exactly-once appearance comes from the
  deterministic bucket→output-partition mapping, not from coordination.

At 10^12 documents: buckets are sized so one group is a few executor-waves
of work (e.g. B=4096); a failed/killed run loses at most one uncommitted
group. The same mechanism gives the reference's progress polling (T4):
``fraction_done = completed_buckets / B`` from the lineage table.
"""

from __future__ import annotations

import datetime as _dt
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import LINEAGE_SCHEMA


def with_bucket(df: DataFrame, num_buckets: int, key: str = "url") -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(key), F.lit(num_buckets)).cast("long")
    )


def completed_buckets(spark: SparkSession, lineage_path: str, job_id: str) -> set[int]:
    try:
        rows = (
            spark.read.parquet(lineage_path)
            .filter((F.col("job_id") == job_id) & (F.col("status") == "completed"))
            .select("bucket")
            .distinct()
            .collect()
        )
        return {r["bucket"] for r in rows}
    except Exception:  # path does not exist yet → fresh job
        return set()


def _append_lineage(
    spark: SparkSession,
    lineage_path: str,
    job_id: str,
    buckets: list[int],
    rows_written: int,
    started_at: _dt.datetime,
    attempt: int,
) -> None:
    now = _dt.datetime.now()
    recs = [
        (job_id, int(b), "completed", int(rows_written), started_at, now, attempt)
        for b in buckets
    ]
    spark.createDataFrame(recs, LINEAGE_SCHEMA).write.mode("append").parquet(
        lineage_path
    )


def run_with_lineage(
    spark: SparkSession,
    pages: DataFrame,
    transform,
    results_path: str,
    lineage_path: str,
    job_id: str | None = None,
    num_buckets: int = 16,
    buckets_per_commit: int = 4,
    fail_after_groups: int | None = None,
) -> str:
    """Run ``transform(pages_subset)`` bucket-group by bucket-group with
    commit-after-group semantics; re-invocation with the same job_id resumes
    from the last committed group.

    ``fail_after_groups`` is a test hook simulating a mid-job kill.
    Returns the job_id.
    """
    job_id = job_id or uuid.uuid4().hex
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    done = completed_buckets(spark, lineage_path, job_id)
    todo = [b for b in range(num_buckets) if b not in done]
    bucketed = with_bucket(pages, num_buckets)

    groups = [
        todo[i : i + buckets_per_commit]
        for i in range(0, len(todo), buckets_per_commit)
    ]
    for gi, group in enumerate(groups):
        if fail_after_groups is not None and gi >= fail_after_groups:
            raise RuntimeError(f"simulated failure before group {gi}")
        started = _dt.datetime.now()
        subset = bucketed.filter(F.col("bucket").isin([int(b) for b in group]))
        out = transform(subset.drop("bucket"))
        out = with_bucket(out, num_buckets)
        n = out.count()
        (
            out.write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(results_path)
        )
        _append_lineage(spark, lineage_path, job_id, group, n, started, attempt=1)
    return job_id


def job_progress(spark: SparkSession, lineage_path: str, job_id: str, num_buckets: int) -> dict:
    """T4 analog — progress polling from the lineage table."""
    done = completed_buckets(spark, lineage_path, job_id)
    return {
        "job_id": job_id,
        "completed_buckets": len(done),
        "total_buckets": num_buckets,
        "progress": len(done) / num_buckets if num_buckets else 0.0,
    }
