"""HTML metadata extraction edge cases the synthetic-corpus oracle can't
reach: first-match-wins, reversed-attribute documented miss, absent tags,
multiline titles, self-closing variants. Cross-engine value parity over
the corpus lives in the ``page_metadata`` catalog oracle."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from llm_document_parser_spark.operators.metadata import page_metadata

CASES = {
    "plain": (
        '<html lang="en"><head><title>Hello</title>'
        '<meta name="description" content="World">'
        '<link rel="canonical" href="https://ex.com/a">'
        '<meta property="og:title" content="OG"></head></html>'
    ),
    "single_quotes": (
        "<html lang='EN-us'><head><title>T</title>"
        "<meta name='description' content='D'>"
        "<link rel='canonical' href='https://ex.com/b'></head>"
    ),
    "multiline_title": "<title>\n  Line one\n  line&nbsp;two \n</title>",
    "first_wins": "<title>first</title><title>second</title>",
    "case_mix": '<TiTlE>MiXeD</tItLe><META NAME="description" CONTENT="hi">',
    "extra_attrs": '<meta name="description" data-x="1" content="kept">',
    "reversed_attrs": '<meta content="missed" name="description">',
    "absent": "<html><head></head><body>no metadata</body></html>",
    "empty": "",
    "entity_title": "<title>A &amp;&quot;B&quot; &lt;C&gt;</title>",
}


def _extract(spark):
    schema = StructType(
        [StructField("k", StringType()), StructField("html_text", StringType())]
    )
    df = spark.createDataFrame(list(CASES.items()), schema)
    return {r["k"]: r.asDict() for r in page_metadata(df).collect()}


def test_metadata_edges(spark):
    got = _extract(spark)
    assert got["plain"]["title"] == "Hello"
    assert got["plain"]["meta_description"] == "World"
    assert got["plain"]["canonical"] == "https://ex.com/a"
    assert got["plain"]["og_title"] == "OG"
    assert got["plain"]["declared_lang"] == "en"
    assert got["single_quotes"]["meta_description"] == "D"
    assert got["single_quotes"]["canonical"] == "https://ex.com/b"
    assert got["single_quotes"]["declared_lang"] == "en-us"
    assert got["multiline_title"]["title"] == "Line one line two"
    assert got["first_wins"]["title"] == "first"
    assert got["case_mix"]["title"] == "MiXeD"
    assert got["case_mix"]["meta_description"] == "hi"
    assert got["extra_attrs"]["meta_description"] == "kept"
    # documented spec-v1 miss: content before name
    assert got["reversed_attrs"]["meta_description"] == ""
    for col in ("title", "meta_description", "canonical", "og_title",
                "declared_lang"):
        assert got["absent"][col] == ""
        assert got["empty"][col] == ""
    assert got["entity_title"]["title"] == 'A &"B" <C>'


def test_all_native_no_python_stage(spark):
    schema = StructType([StructField("html_text", StringType())])
    df = spark.createDataFrame([("<title>x</title>",)], schema)
    plan = page_metadata(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan


# --- meta robots directives ---

from llm_document_parser_spark.operators.metadata import (
    meta_robots,
    robots_nofollow,
    robots_noindex,
)


def test_meta_robots_directives(spark):
    cases = [
        ('<meta name="robots" content="noindex, nofollow">', True, True),
        ('<meta name="robots" content="index,follow">', False, False),
        ("<meta name='robots' content='none'>", True, True),
        ('<META NAME="robots" CONTENT="NOFOLLOW">', False, True),
        ("<p>no meta at all</p>", False, False),
        ('<meta name="robots" content="noindexing">', False, False),
        ('<meta name="robots" content="max-snippet:-1, noindex">', True, False),
    ]
    df = spark.createDataFrame([(h,) for h, _, _ in cases], "h string")
    out = df.select(
        robots_noindex(F.col("h")).alias("ni"),
        robots_nofollow(F.col("h")).alias("nf"),
        meta_robots(F.col("h")).alias("c"),
    ).collect()
    for (html, ni, nf), r in zip(cases, out):
        assert (r["ni"], r["nf"]) == (ni, nf), html
