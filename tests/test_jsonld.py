"""JSON-LD structured-data extraction (operators/metadata.py):
first-block selection, get_json_object null contract, nested paths."""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_document_parser_spark.operators.metadata import (
    jsonld_block,
    jsonld_field,
    page_jsonld,
)

_ARTICLE = (
    '<html><head><script type="application/ld+json">'
    '{"@type": "NewsArticle", "headline": "Big News", '
    '"datePublished": "2024-03-01", "author": {"name": "A. Writer"}}'
    "</script>"
    '<script type="application/ld+json">{"@type": "Second"}</script>'
    "</head><body>x</body></html>"
)
_INVALID = (
    '<html><SCRIPT TYPE="application/ld+json">{not json</script></html>'
)
_NONE = "<html><script>var x = 1;</script></html>"


def _df(spark):
    return spark.createDataFrame(
        [("a", _ARTICLE), ("b", _INVALID), ("c", _NONE)],
        "url string, html_text string",
    )


def test_first_block_wins(spark):
    got = {
        r["url"]: r["blk"]
        for r in _df(spark)
        .select("url", jsonld_block(F.col("html_text")).alias("blk"))
        .collect()
    }
    assert got["a"].startswith('{"@type": "NewsArticle"')
    assert "Second" not in got["a"]
    assert got["b"] == "{not json"  # raw text; validity judged at field step
    assert got["c"] == ""


def test_fields_and_null_contract(spark):
    rows = {r["url"]: r for r in page_jsonld(_df(spark)).collect()}
    a = rows["a"]
    assert (
        a["jsonld_type"],
        a["headline"],
        a["date_published"],
        a["author_name"],
    ) == ("NewsArticle", "Big News", "2024-03-01", "A. Writer")
    # invalid JSON and absent block both yield NULL for every field
    for u in ("b", "c"):
        r = rows[u]
        assert r["jsonld_type"] is None and r["headline"] is None
        assert r["date_published"] is None and r["author_name"] is None


def test_missing_key_is_null(spark):
    df = _df(spark).select(
        "url", jsonld_field(F.col("html_text"), "$.nonexistent").alias("v")
    )
    assert all(r["v"] is None for r in df.collect())


def test_plan_is_native(spark):
    plan = (
        page_jsonld(_df(spark))._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
