"""applyInPandasWithState cross-batch dedup: duplicates spanning micro-batches
are emitted exactly once."""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_document_parser_spark.datagen import generate_pages
from llm_document_parser_spark.streaming.ingest import stream_pages
from llm_document_parser_spark.streaming.stateful import first_seen_urls


def test_cross_batch_first_seen_dedup(spark, tmp_path):
    pages_path = str(tmp_path / "pages")
    base = generate_pages(spark, 30, seed=8, partitions=1).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    # file 1: originals; file 2: exact duplicates + 10 new urls — forces the
    # dup detection to span micro-batches (maxFilesPerTrigger=1)
    base.coalesce(1).write.parquet(pages_path)
    dupes = base.limit(20)
    extra = generate_pages(spark, 40, seed=8, partitions=1).filter(
        ~F.col("url").isin([r["url"] for r in base.select("url").collect()])
    )
    dupes.unionByName(extra).coalesce(1).write.mode("append").parquet(pages_path)

    stream = stream_pages(spark, pages_path, max_files_per_trigger=1)
    deduped = first_seen_urls(stream, num_groups=4)
    q = (
        deduped.writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    rows = spark.sql("SELECT url FROM first_seen").collect()
    urls = [r["url"] for r in rows]
    assert len(urls) == len(set(urls)), "stateful dedup emitted a duplicate"
    assert len(urls) == 40  # 30 originals + 10 genuinely new
