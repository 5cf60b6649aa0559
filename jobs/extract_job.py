"""spark-submit entry point for the resumable extraction job.

Cluster usage (the 10¹²-document shape):

    zip -r engine.zip llm_document_parser_spark
    spark-submit --py-files engine.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        jobs/extract_job.py \\
        --input  s3://bucket/pages/          \\
        --output s3://bucket/results/        \\
        --lineage s3://bucket/lineage/       \\
        --job-id crawl-2024-03 --buckets 4096

Local smoke:

    python jobs/extract_job.py --generate 1000 --input /tmp/pages \\
        --output /tmp/results --lineage /tmp/lineage --buckets 8

Re-invoking with the same --job-id resumes from the last committed bucket
group (lineage anti-join; see llm_document_parser_spark/lineage.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from llm_document_parser_spark.iceberg import load_pages
from llm_document_parser_spark.lineage import (
    committed_row_total,
    job_progress,
    run_with_lineage,
)
from llm_document_parser_spark.pipeline import extract_pipeline
from llm_document_parser_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--input", required=True,
        help="pages table: parquet path or Iceberg identifier catalog.db.pages",
    )
    ap.add_argument("--output", required=True, help="results table path")
    ap.add_argument("--lineage", required=True, help="lineage table path")
    ap.add_argument("--job-id", default=None, help="stable id for resume")
    ap.add_argument("--buckets", type=int, default=256, help="url-hash commit buckets")
    ap.add_argument("--buckets-per-commit", type=int, default=8)
    ap.add_argument(
        "--repartition", type=int, default=None,
        help="pre-UDF repartition width for skewed inputs (default: none)",
    )
    ap.add_argument(
        "--generate", type=int, default=None,
        help="generate N synthetic pages at --input first (local smoke only)",
    )
    args = ap.parse_args(argv)

    spark = get_spark(app_name="ldp-extract-job")
    if args.generate:
        from llm_document_parser_spark.datagen import write_pages

        write_pages(spark, args.input, args.generate, seed=42)

    # parquet path or Iceberg table identifier (catalog.db.pages) — the
    # north-rule input format, dispatched by llm_document_parser_spark.iceberg
    pages = load_pages(spark, args.input)

    def transform(df):
        return extract_pipeline(df, repartition_to=args.repartition)

    job_id = run_with_lineage(
        spark,
        pages,
        transform,
        results_path=args.output,
        lineage_path=args.lineage,
        job_id=args.job_id,
        num_buckets=args.buckets,
        buckets_per_commit=args.buckets_per_commit,
    )
    progress = job_progress(spark, args.lineage, job_id, args.buckets)
    # row total from the (tiny) lineage table — per-bucket counts were
    # recorded at commit time, so no re-scan of the result table is needed
    n = committed_row_total(spark, args.lineage, job_id)
    print(json.dumps({**progress, "result_rows": n}))
    spark.stop()
    return 0 if progress["progress"] == 1.0 else 1


if __name__ == "__main__":
    sys.exit(main())
