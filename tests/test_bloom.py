"""Bloom seen-set invariants (operators/bloom.py): no false negatives,
bounded false positives, superset-of-anti-join, map-side plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_document_parser_spark.operators.bloom import (
    build_seen_bloom,
    filter_unseen,
)


def _urls(spark, lo, hi, name="url"):
    return spark.range(lo, hi).select(
        F.concat(F.lit("https://h"), (F.col("id") % 97).cast("string"),
                 F.lit(".example/p"), F.col("id").cast("string")).alias(name)
    )


def test_no_false_negatives(spark):
    seen = _urls(spark, 0, 5000)
    bf = build_seen_bloom(seen, fpp=0.01)
    # every seen url must be dropped — zero survivors from the seen set
    assert filter_unseen(seen, bf).count() == 0


def test_false_positive_rate_within_budget(spark):
    seen = _urls(spark, 0, 5000)
    bf = build_seen_bloom(seen, fpp=0.01)
    fresh = _urls(spark, 10_000, 15_000)  # disjoint ids -> disjoint urls
    survivors = filter_unseen(fresh, bf).count()
    wrongly_skipped = 5000 - survivors
    assert wrongly_skipped / 5000 <= 0.05  # 5x headroom over fpp=1%


def test_prefilter_superset_of_exact_antijoin(spark):
    seen = _urls(spark, 0, 3000)
    candidates = _urls(spark, 2000, 6000)
    bf = build_seen_bloom(seen, fpp=0.01)
    pre = {r["url"] for r in filter_unseen(candidates, bf).collect()}
    exact = {
        r["url"]
        for r in candidates.join(seen, "url", "left_anti").collect()
    }
    # bloom survivors are a subset of the exact-unseen set (FPs only
    # remove rows), and every bloom survivor is genuinely unseen
    assert pre <= exact


def test_probe_is_map_side(spark):
    seen = _urls(spark, 0, 1000)
    bf = build_seen_bloom(seen)
    plan = (
        filter_unseen(_urls(spark, 0, 100), bf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # zero SHUFFLE on the probe side; the small-bitmap path adds a
    # BroadcastExchange for the one-row bitmap relation, which moves the
    # bitmap once per executor, never the candidates
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert "Exchange RoundRobin" not in plan


def test_large_bitmap_arrow_path_no_false_negatives(spark):
    # oversizing expected_items pushes the bitmap past the inline
    # threshold, exercising the Arrow+broadcast probe path (the
    # crawl-scale configuration); membership semantics must be identical
    seen = _urls(spark, 0, 500)
    bf = build_seen_bloom(seen, expected_items=5_000_000, fpp=0.01)
    from llm_document_parser_spark.operators.bloom import (
        _INLINE_BITMAP_MAX_BYTES,
    )

    assert bf.nbytes() > _INLINE_BITMAP_MAX_BYTES
    survivors = filter_unseen(_urls(spark, 0, 500), bf).count()
    assert survivors == 0  # every seen url probes true -> none survive


def test_inline_and_arrow_probes_agree(spark):
    # the codegen inline probe and the vectorized Arrow probe are two
    # implementations of one bit layout: forcing each over the same
    # filter geometry must keep every member (false negatives are
    # impossible in both)
    from llm_document_parser_spark.operators import bloom as bl

    seen = _urls(spark, 0, 800)
    cands = _urls(spark, 0, 2000)
    bf = build_seen_bloom(seen, fpp=0.01)
    assert bf.nbytes() <= bl._INLINE_BITMAP_MAX_BYTES
    inline_kept = {
        r["url"] for r in bl.filter_might_contain(cands, bf).collect()
    }
    orig = bl._INLINE_BITMAP_MAX_BYTES
    bl._INLINE_BITMAP_MAX_BYTES = 0  # force the Arrow path
    try:
        arrow_kept = {
            r["url"] for r in bl.filter_might_contain(cands, bf).collect()
        }
    finally:
        bl._INLINE_BITMAP_MAX_BYTES = orig
    assert inline_kept == arrow_kept
