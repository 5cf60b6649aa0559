"""jobs/curate_job.curate — the post-extraction curation cascade over
real pipeline output (CLI smoke-tested separately; this pins library
semantics: near-dup keep-id wins, gates produce disjoint verdicts)."""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from jobs.curate_job import curate  # noqa: E402


def test_curate_cascade(spark):
    base = (
        "the quick brown fox jumps over one lazy dog and it runs through "
        "green fields toward distant hills while evening light settles "
        "quietly upon old farm buildings near a winding river bend"
    )
    rows = [
        ("u1", base),
        ("u2", base + " extra tail words"),     # near-dup of u1 → dropped
        ("u3", "el la de que los una por con " * 12),  # not English → lang
        # English stopwords present (passes lang) but massively repeated
        ("u4", "the cat sat on the mat " * 20),
        ("u5", base.replace("fox", "wolf").replace("dog", "goat")),
        ("u6", None),                           # null text → filtered out
    ]
    docs = spark.createDataFrame(rows, "url string, extracted_text string")
    kept, labeled = curate(docs, min_quality=0.0, threshold=0.5)
    verdicts = {r["url"]: r["verdict"] for r in labeled.collect()}
    assert verdicts["u1"] == "kept"          # canonical keep-id of its pair
    assert verdicts["u2"] == "near_dup"
    assert verdicts["u3"] == "lang"
    assert verdicts["u4"] == "repetition"
    assert "u6" not in verdicts              # null text filtered before gates
    kept_urls = {r["url"] for r in kept.collect()}
    assert "u1" in kept_urls and "u2" not in kept_urls
    # kept keeps the original result schema (gate columns dropped)
    assert set(kept.columns) == {"url", "extracted_text"}
