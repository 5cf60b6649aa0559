"""spark-submit entry point for the corpus curation pass over extraction
output — the dedup/gate cascade a training-data pipeline runs after
`jobs/extract_job.py` (reference analog: the reference stops at per-doc
extraction; this tier is the engine's training-pipeline extension).

Cascade (same composition as the oracle-verified `curation_funnel`
catalog query, run over real extracted text):

1. MinHash near-dup candidates at the production r=8 geometry (xxhash64
   fast signatures), Jaccard-verified at --threshold;
2. connected components → per-document canonical keep-id;
3. language gate (--lang), quality gate (--min-quality), repetition gate
   (--max-dup-frac);
4. kept documents written to --output; a per-verdict funnel report is
   printed as one JSON line and written next to the output.

Cluster usage:

    zip -r engine.zip llm_document_parser_spark
    spark-submit --py-files engine.zip jobs/curate_job.py \\
        --input  s3://bucket/results/  \\
        --output s3://bucket/curated/

Local smoke:

    python jobs/curate_job.py --input /tmp/results --output /tmp/curated
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from llm_document_parser_spark.operators import dedup, textstats
from llm_document_parser_spark.session import get_spark


def curate(
    results,
    id_col: str = "url",
    text_col: str = "extracted_text",
    threshold: float = 0.8,
    lang: str = "en",
    min_quality: float = 0.8,
    max_dup_frac: float = 0.6,
):
    """(kept DataFrame, verdict-per-doc DataFrame) for the cascade above."""
    docs = results.filter(
        F.col(text_col).isNotNull() & (F.length(text_col) > 0)
    )
    pairs = dedup.verified_near_dup_pairs(
        docs, id_col=id_col, text_col=text_col,
        num_hashes=64, bands=8, threshold=threshold, hash_fn="fast",
    ).select("id_a", "id_b")
    comp = dedup.connected_components(pairs).withColumnRenamed("id", id_col)
    rep = textstats.repetition_stats(
        docs, id_col=id_col, text_col=text_col, unit_sep=" "
    ).select(id_col, "dup_unit_frac")
    text = F.col(text_col)
    scored = (
        docs.withColumn("lang_pred", textstats.lang_id(text))
        .withColumn("quality", textstats.quality_score(text))
        .join(comp, id_col, "left")
        .withColumn("component", F.coalesce("component", F.col(id_col)))
        .join(rep, id_col, "left")
        .withColumn("dup_unit_frac", F.coalesce("dup_unit_frac", F.lit(0.0)))
    )
    verdict = (
        F.when(F.col("component") != F.col(id_col), F.lit("near_dup"))
        .when(F.col("lang_pred") != lang, F.lit("lang"))
        .when(F.col("quality") < min_quality, F.lit("quality"))
        .when(F.col("dup_unit_frac") > max_dup_frac, F.lit("repetition"))
        .otherwise(F.lit("kept"))
    )
    labeled = scored.withColumn("verdict", verdict)
    kept = labeled.filter(F.col("verdict") == "kept").drop(
        "lang_pred", "quality", "component", "dup_unit_frac", "verdict"
    )
    return kept, labeled


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="extraction results parquet")
    ap.add_argument("--output", required=True, help="curated corpus parquet")
    ap.add_argument("--id-col", default="url")
    ap.add_argument("--text-col", default="extracted_text")
    ap.add_argument("--threshold", type=float, default=0.8,
                    help="verified near-dup Jaccard threshold")
    ap.add_argument("--lang", default="en")
    ap.add_argument("--min-quality", type=float, default=0.8)
    ap.add_argument("--max-dup-frac", type=float, default=0.6)
    args = ap.parse_args(argv)

    spark = get_spark(app_name="ldp-curate-job")
    results = spark.read.parquet(args.input)
    kept, labeled = curate(
        results, id_col=args.id_col, text_col=args.text_col,
        threshold=args.threshold, lang=args.lang,
        min_quality=args.min_quality, max_dup_frac=args.max_dup_frac,
    )
    kept.write.mode("overwrite").parquet(args.output)
    funnel = {
        r["verdict"]: r["n"]
        for r in labeled.groupBy("verdict").agg(F.count("*").alias("n")).collect()
    }
    report = {
        "n_input": int(sum(funnel.values())),
        "funnel": funnel,
        "output": args.output,
    }
    print(json.dumps(report))
    with open(os.path.join(os.path.dirname(args.output) or ".",
                           "curation_report.json"), "w") as f:
        json.dump(report, f)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
