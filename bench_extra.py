"""Stage-level profiling probes for the heavy bench legs (guide §1.4).

NOT part of the frozen driver bench (bench.py). Each probe isolates one
stage of a heavy leg with the noop sink so the computation is timed, not
the sink. Run:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py funnel

Probe groups: funnel, repetition, redirects, winnow, decontaminate.
Prints one JSON line per probe: {"probe": name, "secs": [run1, run2]}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

from pyspark.sql import functions as F  # noqa: E402

from llm_document_parser_spark.operators import dedup, textstats  # noqa: E402
from llm_document_parser_spark.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, fn, runs=2):
    secs = []
    for _ in range(runs):
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        fn()
        secs.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"probe": name, "secs": secs}), flush=True)
    return min(secs)


def funnel_inputs(spark):
    from llm_document_parser_spark.queries import _t

    d = _t(spark, SF_DIR, "documents")
    all_docs = d.select("doc_id", "text", "source").unionByName(
        d.filter(F.col("doc_id") < 50).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text", "source"
        )
    )
    return all_docs


def probe_funnel(spark):
    all_docs = funnel_inputs(spark)
    shingle_k, num_hashes, bands, hash_fn = 3, 16, 2, "md5"

    # stage 1: shingle arrays (the localCheckpoint input of
    # verified_near_dup_pairs) — HOF cost + materialization. Mirrors the
    # production shape: cheap token-count filter BEFORE the projection
    # (a post-projection size(_sh)>0 filter gets pushed below the
    # repartition exchange and single-threads the whole HOF).
    def sh_df():
        from llm_document_parser_spark.operators.textstats import tokens_col

        return all_docs.filter(
            F.size(tokens_col(F.col("text"))) >= shingle_k
        ).select(
            F.col("doc_id").alias("_vid"),
            dedup.shingles_col(F.col("text"), shingle_k).alias("_sh"),
        )

    timed(spark, "funnel/sh_noop", lambda: noop(sh_df()))

    sh = sh_df().localCheckpoint()

    # stage 2: band table (16 md5 mins) from materialized shingles
    ex = sh.select(F.col("_vid").alias("id"), F.explode("_sh").alias("s"))
    timed(
        spark,
        "funnel/band_table",
        lambda: noop(dedup._band_table(ex, num_hashes, bands, hash_fn)),
    )

    # stage 3: candidate pairs (band self-join + distinct)
    cands = dedup._pairs_from_exploded_shingles(ex, num_hashes, bands, hash_fn)
    timed(spark, "funnel/candidates", lambda: noop(cands))
    n_cands = cands.count()
    print(json.dumps({"probe": "funnel/n_candidates", "rows": n_cands}), flush=True)

    # stage 4: full verified pairs (as the funnel calls it) — built INSIDE
    # the timed fn: verified_near_dup_pairs localCheckpoints eagerly at
    # construction, so building outside would hide the dominant cost
    def vp():
        return dedup.verified_near_dup_pairs(
            all_docs, num_hashes=16, bands=2, threshold=0.8
        ).select("id_a", "id_b")

    timed(spark, "funnel/verified_pairs", lambda: noop(vp()))

    # stage 5: connected components over the verified pairs
    pairs = vp()

    def cc():
        comp = dedup.connected_components(pairs)
        noop(comp)

    timed(spark, "funnel/connected_components", lambda: cc())

    # stage 6: repetition stats
    timed(
        spark,
        "funnel/repetition_stats",
        lambda: noop(
            textstats.repetition_stats(all_docs, unit_sep=" ").select(
                "doc_id", "dup_unit_frac"
            )
        ),
    )

    # stage 7: the scored projection (token/lang/quality gates, no joins)
    text = F.col("text")
    timed(
        spark,
        "funnel/gates_projection",
        lambda: noop(
            all_docs.select(
                "source",
                "doc_id",
                textstats.token_count(text).alias("ws_tokens"),
                textstats.lang_id(text).alias("lang_pred"),
                textstats.quality_score(text).alias("quality"),
            )
        ),
    )

    # stage 8: whole funnel for reference
    from llm_document_parser_spark.queries import REGISTRY

    timed(spark, "funnel/full", lambda: noop(REGISTRY["curation_funnel"](spark, SF_DIR)))


def probe_repetition(spark):
    all_docs = funnel_inputs(spark)
    base = all_docs.select(F.col("doc_id").alias("_rid"), F.col("text").alias("_text"))

    units = base.select(
        "_rid",
        F.explode(
            F.filter(
                F.transform(F.split("_text", " "), lambda x: F.trim(x)),
                lambda x: x != "",
            )
        ).alias("unit"),
    )
    timed(spark, "rep/units_explode", lambda: noop(units))
    unit_counts = units.groupBy("_rid", "unit").agg(F.count("*").alias("c"))
    timed(spark, "rep/unit_counts", lambda: noop(unit_counts))

    toks = F.filter(F.split(F.lower(F.col("_text")), r"\s+"), lambda x: x != "")
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, F.lit(1), n - 1),
            F.slice(toks, F.lit(2), n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = base.select("_rid", F.explode(bigrams).alias("bigram"))
    timed(spark, "rep/bigrams_explode", lambda: noop(bg))
    bgc = bg.groupBy("_rid", "bigram").agg(F.count("*").alias("c"))
    timed(spark, "rep/bigram_counts", lambda: noop(bgc))
    from pyspark.sql import Window

    top = (
        bgc.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("_rid").orderBy(F.col("c").desc(), F.col("bigram"))
            ),
        )
        .filter(F.col("rn") == 1)
    )
    timed(spark, "rep/top_bigram_window", lambda: noop(top))
    timed(
        spark,
        "rep/full",
        lambda: noop(textstats.repetition_stats(all_docs, unit_sep=" ")),
    )


def probe_graph(spark):
    """redirects_1m and trust_prop_1m_edges, exactly as bench.py builds
    them, plus their synthetic-input generation cost in isolation."""
    from llm_document_parser_spark.operators import links as lk
    from llm_document_parser_spark.operators.labelprop import propagate_trust

    FF = F

    def edges_redirect():
        return (
            spark.range(1_000_000)
            .filter(FF.pmod("id", 16) != 15)
            .select(
                FF.concat(FF.lit("n"), FF.col("id").cast("string")).alias("src"),
                FF.concat(FF.lit("n"), (FF.col("id") + 1).cast("string")).alias("dst"),
            )
        )

    timed(spark, "graph/redirect_edges_gen", lambda: noop(edges_redirect()))
    timed(
        spark,
        "graph/redirects_1m",
        lambda: noop(lk.resolve_redirects(edges_redirect(), max_hops=32)),
    )

    def edges_trust():
        return (
            spark.range(1_000_000)
            .select(
                FF.concat(FF.lit("h"), FF.pmod("id", 125_000).cast("string")).alias(
                    "src_host"
                ),
                FF.concat(
                    FF.lit("h"), FF.pmod(FF.col("id") * 31 + 7, 125_000).cast("string")
                ).alias("dst_host"),
                (FF.pmod("id", 5) + 1).alias("n_links"),
            )
            .filter(FF.col("src_host") != FF.col("dst_host"))
        )

    def seeds_trust():
        return spark.range(64).select(
            FF.concat(FF.lit("h"), (FF.col("id") * 1951).cast("string")).alias("host"),
            FF.lit(1.0).alias("seed"),
        )

    timed(spark, "graph/trust_edges_gen", lambda: noop(edges_trust()))
    timed(
        spark,
        "graph/trust_prop_1m",
        lambda: noop(propagate_trust(edges_trust(), seeds_trust(), iterations=3)),
    )


def _docs50k(spark):
    base = os.path.dirname(os.path.abspath(__file__))
    return spark.read.parquet(os.path.join(base, ".data", "bench_dedup_docs_50000"))


def probe_winnow(spark):
    from llm_document_parser_spark.operators import winnow as wn

    docs = _docs50k(spark)
    cleaned = docs.select(
        F.col("url").alias("id"), wn._clean(F.col("extracted_text")).alias("_ct")
    )
    timed(spark, "winnow/clean_only", lambda: noop(cleaned))
    grams = cleaned.select(
        "id", wn._gram_hashes_of_clean(F.col("_ct"), 10, "fast").alias("_hs")
    )
    timed(spark, "winnow/grams", lambda: noop(grams))
    fps = grams.select(
        "id", wn.winnow_from_grams(F.col("_hs"), 9).alias("fingerprints")
    )
    timed(spark, "winnow/fingerprints", lambda: noop(fps))
    timed(
        spark,
        "winnow/full_pairs",
        lambda: noop(
            wn.winnow_overlap_pairs(
                docs, id_col="url", text_col="extracted_text",
                k=10, w=9, min_shared=4, max_df=50, hash_fn="fast",
            )
        ),
    )


def probe_extract(spark):
    from llm_document_parser_spark.pipeline import extract_pipeline
    from llm_document_parser_spark.operators.extract_udfs import payload_text_udf
    from llm_document_parser_spark.operators.kind import doc_kind_col
    from llm_document_parser_spark.operators.textclean import clean_text_col

    base = os.path.dirname(os.path.abspath(__file__))
    pages = spark.read.parquet(os.path.join(base, ".data", "bench_pages_50000"))
    kind = pages.withColumn("doc_kind", doc_kind_col(F.col("html")))
    timed(spark, "extract/kind_only", lambda: noop(kind.select("url", "doc_kind")))
    raw = kind.withColumn(
        "raw_text", payload_text_udf(F.col("html"), F.col("doc_kind"))
    ).select("url", "doc_kind", "raw_text")
    timed(spark, "extract/through_udf", lambda: noop(raw))
    cleanonly = raw.select("url", clean_text_col(F.col("raw_text")).alias("t"))
    timed(spark, "extract/through_clean", lambda: noop(cleanonly))
    timed(spark, "extract/full", lambda: noop(extract_pipeline(pages)))


def main():
    group = sys.argv[1] if len(sys.argv) > 1 else "funnel"
    extra = {}
    if os.environ.get("PROBE_SHJ") == "1":
        extra = {
            "spark.sql.join.preferSortMergeJoin": "false",
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "67108864",
        }
    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name=f"ldp-probe-{group}",
        extra_conf=extra or None,
    )
    if group == "funnel":
        probe_funnel(spark)
    elif group == "repetition":
        probe_repetition(spark)
    elif group == "graph":
        probe_graph(spark)
    elif group == "winnow":
        probe_winnow(spark)
    elif group == "extract":
        probe_extract(spark)
    else:
        raise SystemExit(f"unknown probe group {group}")
    spark.stop()


if __name__ == "__main__":
    main()
