"""Benchmark: headline queries + extraction throughput at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "extract_docs_per_sec", "value": N, "unit": "docs/sec",
   "queries": {...per-query seconds...}, "sf": ..., "cpus": ...,
   "extract": {...}}

The headline metric is extraction throughput (BASELINE.json `metric`):
documents/sec through the full classify→extract pipeline over the
deterministic synthetic pages table (HTML/PDF/plaintext payload mix). Page
generation is excluded from timing (pages are materialized to parquet
first); the timed job is scan → pipeline → noop sink, i.e. pure engine
compute. Relational/dedup/similarity queries are timed individually over
the sf tables.

Scaling-efficiency evidence (N vs 4N cores) is produced by
tools/scaling_bench.py and recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Heap sizing (measured, round 5 — see BENCH/BASELINE.md "heap strategy"):
# this host supplies first-touch pages at ~40-70 MB/s (hypervisor
# throttled), so BOTH big-heap strategies lose: pre-touching 64 GB is a
# 15-25 MINUTE startup tax, and a 64 GB *lazy* Xmx is worse in a subtler
# way — G1 prefers heap EXPANSION over collection while far below Xmx, so
# allocation-heavy legs keep growing into throttled first-touch pages and
# get SLOWER run over run (measured: minhash_candidates_50k 22 s → 60 s
# → 49 s at Xmx=64g vs 10.7 s cold → 3.6 s steady at Xmx=16g). The heap
# must be sized so G1 RECYCLES committed pages instead of expanding:
# 16 GB covers every sf0.1 leg with zero spill and matches a realistic
# 4-8-core executor's heap. Override via SPARK_GRAFT_DRIVER_MEM.
_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
# measured batch sweep at 1M pages (BENCH/BASELINE.md): 8192-row Arrow
# batches cut extract wall-clock ~15% vs the 2048 default on this
# small-payload corpus (~1-2 KB/page → ~16 MB/batch). The library default
# stays 2048 because a 100 KB-median real-web corpus would put ~800 MB per
# in-flight batch per worker at 8192.
os.environ.setdefault("SPARK_GRAFT_ARROW_BATCH", "8192")

from llm_document_parser_spark.datagen import write_pages  # noqa: E402
from llm_document_parser_spark.operators import dedup  # noqa: E402
from llm_document_parser_spark.pipeline import extract_pipeline  # noqa: E402
from llm_document_parser_spark.queries import REGISTRY  # noqa: E402
from llm_document_parser_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "pricing_summary",
    "regional_revenue",
    "segment_order_stats",
    "latest_events_per_user",
    "hourly_event_counts",
    "order_status_cube",
    "doc_lang_id",
    "doc_quality",
    "doc_token_counts",
    "doc_repetition_stats",
    "exact_dup_groups",
    "minhash_near_dup_pairs",
    "simhash_fingerprints",
    "ann_cosine_topk",
    "synth_invoice_roundtrip",
    "quick_search_top10",
    "embedding_near_dups_banded",
    "curation_funnel",
]

N_EXTRACT_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "50000"))


def _loadavg() -> list[float]:
    """Host 1/5/15-min load averages — co-tenant noise on this host has
    produced 2× headline swings on identical code; emitting load in the
    JSON lets a reader adjudicate a slow run without re-running."""
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except OSError:
        return []


def _cached_parquet_ok(path: str) -> bool:
    """A cached bench dataset is valid only with its _SUCCESS marker — a
    bench run killed mid-write leaves a partial directory that would be
    silently reused (skewing timings) or fail the read."""
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _ensure_dataset(path: str, write_fn) -> None:
    if _cached_parquet_ok(path):
        return
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    write_fn()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = _CPUS
    load_start = _loadavg()
    spark = get_spark(master=f"local[{cpus}]", app_name="ldp-bench")

    # --- materialize the pages table once (untimed) ---
    pages_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".data", f"bench_pages_{N_EXTRACT_DOCS}"
    )
    _ensure_dataset(
        pages_path,
        lambda: write_pages(spark, pages_path, N_EXTRACT_DOCS, seed=42, partitions=cpus * 2),
    )

    # full untimed warm-up (JIT, python worker pool, page cache) — the
    # timed runs below measure steady-state throughput, same methodology as
    # tools/scaling_bench.py
    extract_pipeline(
        spark.read.parquet(pages_path)
    ).write.format("noop").mode("overwrite").save()

    # --- timed: full extraction (scan -> pipeline -> noop sink) ---
    # two timed runs, min reported: co-tenant noise only ever inflates a
    # leg, so min is the best estimator of the engine's true cost here
    extract_runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        extract_pipeline(
            spark.read.parquet(pages_path)
        ).write.format("noop").mode("overwrite").save()
        extract_runs.append(round(time.perf_counter() - t0, 3))
    extract_secs = min(extract_runs)
    docs_per_sec = N_EXTRACT_DOCS / extract_secs

    # --- timed legs: registered here, executed in TWO full passes below,
    # min-of-two reported (same estimator as the extract runs: co-tenant
    # noise and lazy-heap growth only ever INFLATE a leg, so min is the
    # best estimator of the engine's true cost; the first pass doubles as
    # the heap/JIT warm-up for the second).
    legs: list[tuple[str, object]] = []

    def add_leg(name, fn) -> None:
        legs.append((name, fn))

    for name in BENCH_QUERIES:
        add_leg(
            name,
            lambda fn=REGISTRY[name]: fn(spark, sf_dir)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )

    # --- timed: near-dup dedup at extraction scale (50k extracted docs) ---
    # The catalog dedup queries run on ≤100-doc slices (oracle-sized); this
    # measures the banded LSH path's constants at realistic corpus width,
    # over REAL pipeline output (url-keyed string ids). Parameters are the
    # production operating point (r=8 → S-curve threshold ≈0.77, xxhash64
    # signatures): shallow bands admit a near-cross-product of boilerplate
    # pairs — measured 47M candidates at r=2 vs 275k at r=8 on this corpus
    # (see minhash_candidate_pairs docstring).
    dedup_docs = 50_000
    base = os.path.dirname(os.path.abspath(__file__))
    dedup_pages = os.path.join(base, ".data", f"bench_pages_{dedup_docs}")
    _ensure_dataset(
        dedup_pages,
        lambda: write_pages(spark, dedup_pages, dedup_docs, seed=42, partitions=cpus * 2),
    )
    dedup_input = os.path.join(base, ".data", f"bench_dedup_docs_{dedup_docs}")
    _ensure_dataset(
        dedup_input,
        lambda: extract_pipeline(spark.read.parquet(dedup_pages)).select(
            "url", "extracted_text"
        ).write.parquet(dedup_input),
    )
    docs50k = spark.read.parquet(dedup_input)
    add_leg(
        "minhash_candidates_50k",
        lambda: dedup.minhash_candidate_pairs(
            docs50k, id_col="url", text_col="extracted_text",
            num_hashes=64, bands=8, hash_fn="fast",
        ).write.format("noop").mode("overwrite").save(),
    )
    add_leg(
        "verified_near_dups_50k",
        lambda: dedup.verified_near_dup_pairs(
            docs50k, id_col="url", text_col="extracted_text",
            num_hashes=64, bands=8, threshold=0.7, hash_fn="fast",
        ).write.format("noop").mode("overwrite").save(),
    )

    # --- timed: winnowing partial-overlap pairs at extraction scale ---
    # The sub-document tier (quote/plagiarism detection) over the same 50k
    # real pages: char-10-gram xxhash64, window-9 minima (expected density
    # 2/(w+1) = 0.2 of gram positions), max_df=50 drops boilerplate
    # fingerprints before the fingerprint-keyed pair join can fan out.
    from llm_document_parser_spark.operators import winnow as wn

    add_leg(
        "winnow_pairs_50k",
        lambda: wn.winnow_overlap_pairs(
            docs50k, id_col="url", text_col="extracted_text",
            k=10, w=9, min_shared=4, max_df=50, hash_fn="fast",
        ).write.format("noop").mode("overwrite").save(),
    )

    # --- timed: redirect resolution over a 1M-edge graph ---
    # Pointer doubling at scale: 1M redirect edges in 15-hop chains
    # resolve in ceil(log2(32)) = 5 composing joins (a sequential walk
    # needs 15). Edges synthesize in-plan (spark.range, no dataset).
    from llm_document_parser_spark.operators import links as lk

    def _redirects_1m():
        from pyspark.sql import functions as FF

        edges = (
            spark.range(1_000_000)
            .filter(FF.pmod("id", 16) != 15)
            .select(
                FF.concat(FF.lit("n"), FF.col("id").cast("string")).alias("src"),
                FF.concat(FF.lit("n"), (FF.col("id") + 1).cast("string")).alias(
                    "dst"
                ),
            )
        )
        lk.resolve_redirects(edges, max_hops=32).write.format("noop").mode(
            "overwrite"
        ).save()

    add_leg("redirects_1m", _redirects_1m)

    # --- timed: benchmark decontamination at extraction scale ---
    # 500 eval items (12-word prefixes of the sf documents) against the
    # same 50k real extracted pages: corpus 8-grams explode map-side and
    # hash-join the broadcast benchmark grams — the corpus never shuffles.
    from pyspark.sql import functions as F

    from llm_document_parser_spark.operators import decontaminate as dc

    bench_items = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        F.col("doc_id").alias("bench_id"),
        F.array_join(F.slice(F.split(F.lower("text"), " "), 1, 12), " ").alias("text"),
    )
    add_leg(
        "decontaminate_50k",
        lambda: dc.contamination_report(
            docs50k, bench_items, id_col="url", text_col="extracted_text", n=8
        ).write.format("noop").mode("overwrite").save(),
    )
    # same report through the Bloom pre-filter (result identical by
    # construction — no false negatives; see operators/decontaminate.py).
    # At this 500-item benchmark the broadcast gram table is already tiny,
    # so this leg measures the pre-filter's OVERHEAD floor; its win
    # appears at 10^5-10^6-item benchmarks where the gram table stops
    # being broadcastable and only the bitmap ships.
    add_leg(
        "decontaminate_bloom_50k",
        lambda: dc.contamination_report(
            docs50k, bench_items, id_col="url", text_col="extracted_text",
            n=8, bloom_fpp=0.001,
        ).write.format("noop").mode("overwrite").save(),
    )

    # --- timed: DSIR importance sampling at width ---
    # two token groupBys (raw + target LMs), broadcast ratio join, one
    # per-doc agg, Gumbel-top-k — the corpus text never shuffles
    from llm_document_parser_spark.operators import dsir

    target50k = docs50k.filter(F.pmod(F.xxhash64("url"), F.lit(7)) < 2)
    add_leg(
        "dsir_sample_50k",
        lambda: dsir.importance_resample(
            dsir.importance_weights(
                docs50k, target50k, id_col="url", text_col="extracted_text"
            ),
            1000, id_col="url",
        ).write.format("noop").mode("overwrite").save(),
    )

    # --- timed: exact-substring span removal at width ---
    # the heaviest new round-5 operator: posexplode of every 10-gram digest
    # (xxhash64 longs — the production hash mode, ~4x less shuffle than the
    # oracle's md5 strings), corpus count, island merge, HOF rebuild
    add_leg(
        "dup_span_removal_50k",
        lambda: dedup.remove_duplicate_spans(
            docs50k, id_col="url", text_col="extracted_text",
            n=10, min_count=2, hash_fn="fast",
        ).write.format("noop").mode("overwrite").save(),
    )

    # --- timed: BM25 ranked retrieval at width ---
    # index build dominates (explode + groupBy over all tokens); scoring
    # itself touches only the query terms' postings
    from llm_document_parser_spark.operators.search import bm25_scores

    add_leg(
        "bm25_retrieval_50k",
        lambda: bm25_scores(
            docs50k, "invoice payment contract total", k=100,
        ).write.format("noop").mode("overwrite").save(),
    )

    # --- timed: quality/normalization tier at extraction scale ---
    # gopher: all-native array/HOF metrics, zero Python — measures the
    # codegen rule set's per-doc cost. unigram LM: train (explode+groupBy)
    # + broadcast-scored pass — the two-shuffle LM shape. nfc: the one
    # Arrow stage — measures Python-boundary cost on real text.
    from llm_document_parser_spark.operators.lm import (
        score_unigram_logprob,
        train_unigram_lm,
    )
    from llm_document_parser_spark.operators.normalize import nfc_normalize_text
    from llm_document_parser_spark.operators.textstats import gopher_quality

    add_leg(
        "gopher_quality_50k",
        lambda: gopher_quality(
            docs50k, id_col="url", text_col="extracted_text", min_words=5
        ).write.format("noop").mode("overwrite").save(),
    )
    add_leg(
        "unigram_lm_50k",
        lambda: score_unigram_logprob(
            docs50k, train_unigram_lm(docs50k, "extracted_text"),
            id_col="url", text_col="extracted_text",
        ).write.format("noop").mode("overwrite").save(),
    )
    add_leg(
        "nfc_normalize_50k",
        lambda: nfc_normalize_text(docs50k, "extracted_text")
        .write.format("noop").mode("overwrite").save(),
    )

    # --- timed: sequence packing + chunking at extraction scale ---
    # concat-split: one per-shard window (single Exchange). greedy: one
    # shuffle to shards, then a per-shard Arrow walk over (id, count)
    # metadata. chunking: narrow split→sequence→slice, zero shuffles.
    from llm_document_parser_spark.operators.chunking import chunk_tokens
    from llm_document_parser_spark.operators.packing import (
        pack_concat_split,
        pack_greedy,
    )

    add_leg(
        "pack_concat_split_50k",
        lambda: pack_concat_split(
            docs50k, seq_len=2048, n_shards=64, id_col="url",
            text_col="extracted_text",
        ).write.format("noop").mode("overwrite").save(),
    )
    add_leg(
        "pack_greedy_50k",
        lambda: pack_greedy(
            docs50k, seq_len=2048, n_shards=64, id_col="url",
            text_col="extracted_text",
        ).write.format("noop").mode("overwrite").save(),
    )
    add_leg(
        "chunk_tokens_50k",
        lambda: chunk_tokens(
            docs50k, chunk_len=256, overlap=32, id_col="url",
            text_col="extracted_text",
        ).write.format("noop").mode("overwrite").save(),
    )

    # --- timed: link graph + PageRank over the same 50k raw pages ---
    # outlinks come from RAW html (boilerplate stripping removes <a> tags),
    # cast(binary as string) — datagen payloads are UTF-8. Host graph is the
    # production shape: one explode + one groupBy; PageRank 3 iterations on
    # the resulting host graph (one equi-join + agg per iteration).
    from llm_document_parser_spark.operators import links

    pages_raw = spark.read.parquet(dedup_pages).select(
        "url", F.col("html").cast("string").alias("html_text")
    )
    host_edges = links.host_link_graph(links.extract_outlinks(pages_raw))
    add_leg(
        "outlinks_hostgraph_50k",
        lambda: host_edges.write.format("noop").mode("overwrite").save(),
    )
    add_leg(
        "host_pagerank_50k",
        lambda: links.pagerank(host_edges, iterations=3)
        .write.format("noop").mode("overwrite").save(),
    )

    # --- timed: WARC record parse at width (Arrow-batched Python parser) ---
    from llm_document_parser_spark.warc import parse_warc_record_udf

    # Content-Length is an OCTET count: measure the UTF-8 encoding, not the
    # character count, or any non-ASCII char in extracted text mis-frames
    # the record and iter_warc_records silently skips it (we'd then be
    # timing the skip path, not the parse path).
    body_len = F.length(F.encode(F.col("html_text"), "UTF-8")).cast("string")
    http_pre = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: "),
        body_len,
        F.lit("\r\n\r\n"),
    )
    warc_bytes = F.encode(
        F.concat(
            F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
            F.col("url"),
            F.lit(
                "\r\nWARC-Date: 2024-03-01T00:00:00Z\r\nWARC-Record-ID: <u:0>"
                "\r\nContent-Type: application/http; msgtype=response\r\n"
                "Content-Length: "
            ),
            (
                F.length(F.encode(http_pre, "UTF-8"))
                + F.length(F.encode(F.col("html_text"), "UTF-8"))
            ).cast("string"),
            F.lit("\r\n\r\n"),
            http_pre,
            F.col("html_text"),
            F.lit("\r\n\r\n"),
        ),
        "UTF-8",
    )
    add_leg(
        "warc_parse_50k",
        lambda: pages_raw.select(parse_warc_record_udf(warc_bytes).alias("p"))
        .select("p.url", "p.warc_ts")
        .write.format("noop").mode("overwrite").save(),
    )

    # --- timed: distributed BPE training over the 50k corpus ---
    # the only corpus-scale pass is the word-count shuffle; the 8 merge
    # iterations (pair argmax + native fold re-segmentation) run on the
    # Zipf-bounded vocab table. learn_bpe drives its own actions, so the
    # leg is the call itself.
    from llm_document_parser_spark.operators import bpe_train

    add_leg(
        "bpe_train8_50k",
        lambda: bpe_train.learn_bpe(
            bpe_train.word_counts(docs50k, text_col="extracted_text"), 8
        ),
    )

    # --- timed: CDX index parse + fetch planning over 1M lines ---
    # 20 synthetic captures per page → 1M CDXJ lines built natively, then
    # the real parser (limit-3 split + from_json) and the single-shuffle
    # per-file range coalescer. Measures JSON-parse throughput at index
    # width plus the window shape a 10^12-row index would run per file.
    from llm_document_parser_spark.operators import cdx as cdxops

    def _cdx_lines():
        e = docs50k.select(
            "url", F.explode(F.sequence(F.lit(0), F.lit(19))).alias("i")
        )
        seq = F.abs(F.xxhash64("url", "i"))
        filename = F.concat(
            F.lit("crawl-"), F.pmod(seq, F.lit(256)).cast("string"),
            F.lit(".warc.gz"),
        )
        js = F.to_json(
            F.struct(
                F.col("url").alias("url"),
                F.lit("text/html").alias("mime"),
                F.lit("200").alias("status"),
                F.md5("url").alias("digest"),
                F.lit("900").alias("length"),
                (F.pmod(seq, F.lit(10_000_000)) * 37).cast("string").alias(
                    "offset"
                ),
                filename.alias("filename"),
            )
        )
        return e.select(
            F.concat_ws(" ", F.lit("k"), F.lit("20240301120000"), js).alias(
                "line"
            )
        )

    add_leg(
        "cdx_plan_1m",
        lambda: cdxops.plan_warc_fetches(
            cdxops.parse_cdxj(_cdx_lines()), max_gap=1024
        ).write.format("noop").mode("overwrite").save(),
    )

    # --- timed: HTML→Markdown + table extraction over the 50k raw pages ---
    # both are pure-codegen regexp chains (zero Python, zero shuffle);
    # these legs price the chains at corpus width on REAL page markup
    from llm_document_parser_spark.operators.markdown import html_to_markdown
    from llm_document_parser_spark.operators.tables import extract_html_tables

    add_leg(
        "html_markdown_50k",
        lambda: pages_raw.select(
            "url", html_to_markdown(F.col("html_text")).alias("md")
        ).write.format("noop").mode("overwrite").save(),
    )
    add_leg(
        "html_tables_50k",
        lambda: extract_html_tables(pages_raw)
        .write.format("noop").mode("overwrite").save(),
    )

    # --- timed: heading outline + mojibake repair over the 50k raw pages ---
    # heading_outline prices the 10-expr shared window (one shuffle on url);
    # mojibake repair prices the production fast path — translate + two
    # rlike gates over text that is almost entirely CLEAN, which is exactly
    # the per-row cost a 10^12-doc corpus pays for the damaged minority
    from llm_document_parser_spark.operators.content import heading_outline
    from llm_document_parser_spark.operators.normalize import repair_mojibake

    # generate_pages markup carries no h1-h6, so the leg injects a 5-heading
    # skeleton per page (narrow concat, negligible vs the window) — 250k
    # outline rows through the shared-window ancestor chain, not a no-op scan
    outline_pages = pages_raw.select(
        "url",
        F.concat(
            F.lit("<h1>Doc "), F.col("url"),
            F.lit("</h1><h2>Intro</h2>"), F.col("html_text"),
            F.lit("<h2>Tail</h2><h1>End</h1><h3>Deep</h3>"),
        ).alias("html_text"),
    )
    add_leg(
        "heading_outline_50k",
        lambda: heading_outline(outline_pages, html_col="html_text")
        .write.format("noop").mode("overwrite").save(),
    )
    add_leg(
        "mojibake_repair_50k",
        lambda: pages_raw.select(
            "url", repair_mojibake(F.col("html_text")).alias("fixed")
        ).write.format("noop").mode("overwrite").save(),
    )

    # --- timed: trust propagation over a 1M-edge host graph ---
    # TrustRank iterations price the per-iteration join+agg pair at real
    # graph width: 1M weighted edges over 125k hosts (8 out-links each,
    # deterministic wrap-around targets), 64 seed hosts, 3 iterations.
    # Edges synthesize in-plan (spark.range, no dataset).
    from llm_document_parser_spark.operators.labelprop import propagate_trust

    def _trust_1m():
        from pyspark.sql import functions as FF

        edges = (
            spark.range(1_000_000)
            .select(
                FF.concat(
                    FF.lit("h"), FF.pmod("id", 125_000).cast("string")
                ).alias("src_host"),
                FF.concat(
                    FF.lit("h"),
                    FF.pmod(FF.col("id") * 31 + 7, 125_000).cast("string"),
                ).alias("dst_host"),
                (FF.pmod("id", 5) + 1).alias("n_links"),
            )
            .filter(FF.col("src_host") != FF.col("dst_host"))
        )
        seeds = spark.range(64).select(
            FF.concat(FF.lit("h"), (FF.col("id") * 1951).cast("string")).alias(
                "host"
            ),
            FF.lit(1.0).alias("seed"),
        )
        propagate_trust(edges, seeds, iterations=3).write.format(
            "noop"
        ).mode("overwrite").save()

    add_leg("trust_prop_1m_edges", _trust_1m)

    # --- timed: distributed-GD logistic regression over the 50k corpus ---
    # prices the production training loop: zero-shuffle HOF featurization
    # (16 hashed-unigram rates) + 3 full-batch gradient passes, each one
    # ungrouped tree-aggregate; the label is a deterministic text property
    # (even extracted length) — the timing is label-independent
    from llm_document_parser_spark.ml.lr_dataflow import (
        hashed_token_features,
        lr_fit_dataflow,
    )

    def _lr_50k():
        feats = hashed_token_features(
            docs50k,
            id_col="url",
            text_col="extracted_text",
            label_col=(F.length("extracted_text") % 2 == 0),
            n_buckets=16,
        )
        lr_fit_dataflow(feats, n_buckets=16, iterations=3, lr=1.0)

    add_leg("lr_fit_50k_docs", _lr_50k)

    # --- timed: Lloyd k-means + int8 quantization over 200k vectors ---
    # vectors synthesize in-plan (16 dims of integer-arithmetic pseudo
    # noise); kmeans prices assignment codegen (8 cells x 16 dims of
    # literal arithmetic) + the k-row mean agg x2 iterations; the int8
    # leg prices the full fidelity report (codes + MSE + cosine)
    from llm_document_parser_spark.ml.kmeans_dataflow import kmeans_lloyd
    from llm_document_parser_spark.operators.quantize import quantization_report

    def _vecs_200k():
        from pyspark.sql import functions as FF

        return spark.range(200_000).select(
            FF.col("id").alias("vec_id"),
            F.array(
                *[
                    (
                        FF.pmod(FF.col("id") * (17 + d) + d * d, 997).cast(
                            "double"
                        )
                        / 997.0
                        - 0.5
                    )
                    for d in range(16)
                ]
            ).alias("embedding"),
        )

    add_leg(
        "kmeans_200k_vecs",
        lambda: kmeans_lloyd(
            _vecs_200k(), init_ids=list(range(8)), iterations=2
        ),
    )
    add_leg(
        "int8_quantize_200k",
        lambda: quantization_report(_vecs_200k())
        .write.format("noop").mode("overwrite").save(),
    )

    # --- timed: per-source KL divergence over the 50k corpus ---
    # prices the closed-form decomposition at width: (source, token)
    # aggregation, vocab derivation, the token-keyed join of aggregated
    # counts, 20 synthetic sources from a url hash
    from llm_document_parser_spark.operators.lm import source_unigram_divergence

    add_leg(
        "source_divergence_50k",
        lambda: source_unigram_divergence(
            docs50k.select(
                F.pmod(F.xxhash64("url"), 20).cast("string").alias("source"),
                F.col("extracted_text").alias("text"),
            )
        ).write.format("noop").mode("overwrite").save(),
    )

    # --- execute: two full passes over every leg, min reported ---
    query_runs: dict[str, list[float]] = {name: [] for name, _ in legs}
    for _trial in range(2):
        for name, fn in legs:
            t0 = time.perf_counter()
            fn()
            query_runs[name].append(round(time.perf_counter() - t0, 3))
    per_query = {name: min(r) for name, r in query_runs.items()}

    # untimed sanity: every synthesized record must actually parse (a
    # framing bug makes iter_warc_records skip records silently, and the
    # timing above would then measure the skip path)
    parsed = (
        pages_raw.select(parse_warc_record_udf(warc_bytes).alias("p"))
        .where(F.col("p.url").isNotNull())
        .count()
    )
    assert parsed == dedup_docs, f"warc frame bug: {parsed}/{dedup_docs}"

    total = round(
        extract_secs + sum(sum(r) for r in query_runs.values()), 3
    )
    print(
        json.dumps(
            {
                "metric": "extract_docs_per_sec",
                "value": round(docs_per_sec, 1),
                "unit": "docs/sec",
                "queries": per_query,
                "query_runs": query_runs,
                "sf": sf_dir.rstrip("/").split("sf")[-1],
                "cpus": cpus,
                "extract": {
                    "docs": N_EXTRACT_DOCS,
                    "seconds": round(extract_secs, 3),
                    "runs": extract_runs,
                },
                "loadavg": {"start": load_start, "end": _loadavg()},
                "total_seconds": total,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
