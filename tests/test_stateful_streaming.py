"""Stateful streaming: built-in cross-batch dedup + custom per-host
crawl-budget operator (applyInPandasWithState)."""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_document_parser_spark.datagen import generate_pages
from llm_document_parser_spark.streaming.ingest import stream_pages
from llm_document_parser_spark.streaming.stateful import (
    first_seen_pages,
    host_crawl_budget,
)


def test_cross_batch_first_seen_dedup(spark, tmp_path):
    pages_path = str(tmp_path / "pages")
    base = generate_pages(spark, 30, seed=8, partitions=1)
    base.coalesce(1).write.parquet(pages_path)
    # second file: 20 exact duplicates + 10 genuinely new urls
    dupes = base.limit(20)
    extra = generate_pages(spark, 40, seed=8, partitions=1).filter(
        ~F.col("url").isin([r["url"] for r in base.select("url").collect()])
    )
    dupes.unionByName(extra).coalesce(1).write.mode("append").parquet(pages_path)

    stream = stream_pages(spark, pages_path, max_files_per_trigger=1)
    q = (
        first_seen_pages(stream)
        .writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)

    rows = spark.sql("SELECT url, html FROM first_seen").collect()
    urls = [r["url"] for r in rows]
    assert len(urls) == len(set(urls)) == 40  # 30 originals + 10 new
    assert all(r["html"] is not None for r in rows)  # full row preserved


def test_host_crawl_budget_accumulates_across_batches(spark, tmp_path):
    pages_path = str(tmp_path / "pages")
    base = generate_pages(spark, 40, seed=19, partitions=1)
    base.coalesce(1).write.parquet(pages_path)
    base.coalesce(1).write.mode("append").parquet(pages_path)  # same again

    stream = stream_pages(spark, pages_path, max_files_per_trigger=1)
    q = (
        host_crawl_budget(stream, budget=30)
        .writeStream.format("memory")
        .queryName("budget")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)

    rows = spark.sql("SELECT * FROM budget").collect()
    by_host: dict[str, list] = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    # totals accumulate monotonically per host and equal the sum of deltas
    for host, hrows in by_host.items():
        hrows.sort(key=lambda r: r["batches_seen"])
        running = 0
        for r in hrows:
            running += r["batch_pages"]
            assert r["total_pages"] == running, host
    # grand total across final rows = 80 pages
    finals = {h: max(rs, key=lambda r: r["batches_seen"]) for h, rs in by_host.items()}
    assert sum(r["total_pages"] for r in finals.values()) == 80
    # the zipfian hot host must blow the budget
    assert any(r["over_budget"] for r in finals.values())
