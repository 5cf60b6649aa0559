"""CDX index source: CDXJ parsing, SURT urlkeys, fetch planning
(operators/cdx.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_document_parser_spark.operators.cdx import (
    parse_cdxj,
    plan_warc_fetches,
    surt_key,
)

_LINE = (
    "com,example)/p 20240301120000 "
    '{"url": "https://example.com/p", "mime": "text/html", '
    '"status": "200", "digest": "ABCD", "length": "1234", '
    '"offset": "5678", "filename": "crawl.warc.gz"}'
)


def _parse_one(spark, line):
    return parse_cdxj(spark.createDataFrame([(line,)], "line string")).first()


def test_parse_cdxj_typed_fields(spark):
    r = _parse_one(spark, _LINE)
    assert r["urlkey"] == "com,example)/p"
    assert str(r["capture_ts"]) == "2024-03-01 12:00:00"
    assert r["url"] == "https://example.com/p"
    assert r["mime"] == "text/html"
    assert r["status"] == 200
    assert r["digest"] == "ABCD"
    assert (r["offset"], r["length"]) == (5678, 1234)
    assert r["filename"] == "crawl.warc.gz"


def test_parse_cdxj_url_with_space_survives_limit_split(spark):
    line = (
        "com,example)/a%20b 20240301120000 "
        '{"url": "https://example.com/a b", "offset": "1", "length": "2", '
        '"filename": "f.warc.gz"}'
    )
    r = _parse_one(spark, line)
    assert r["url"] == "https://example.com/a b"
    assert r["offset"] == 1


def test_parse_cdxj_malformed_json_yields_nulls_not_errors(spark):
    r = _parse_one(spark, "key 20240301120000 {not json")
    assert r["urlkey"] == "key"
    assert str(r["capture_ts"]) == "2024-03-01 12:00:00"
    assert r["url"] is None and r["offset"] is None


def _key(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(surt_key(F.col("url")).alias("k")).first()["k"]


def test_surt_basic_and_www_strip(spark):
    assert _key(spark, "https://WWW.Example.COM/Page") == "com,example)/page"
    assert _key(spark, "https://www2.example.com/") == "com,example)/"


def test_surt_query_sorted_and_lowercased(spark):
    assert (
        _key(spark, "http://example.com/x?b=2&A=1&utm_source=t")
        == "com,example)/x?a=1&b=2"
    )


def test_surt_ports(spark):
    assert _key(spark, "http://example.com:80/a") == "com,example)/a"
    assert _key(spark, "https://cdn.example.net:8080/a//b/#f") == (
        "net,example,cdn:8080)/a/b"
    )


def test_surt_unparseable_is_null(spark):
    assert _key(spark, "not a url") is None


def _plan(spark, rows, max_gap=0):
    cdx = spark.createDataFrame(
        rows, "filename string, offset long, length long"
    )
    return {
        (r["filename"], r["fetch_start"]): (
            r["fetch_end"],
            r["fetch_bytes"],
            r["n_records"],
        )
        for r in plan_warc_fetches(cdx, max_gap=max_gap).collect()
    }


def test_plan_adjacent_coalesce_and_gap_break(spark):
    rows = [
        ("a", 0, 100),       # [0,100)
        ("a", 100, 50),      # adjacent -> same range
        ("a", 200, 10),      # gap 50 -> new range
        ("b", 0, 10),        # other file, own range
    ]
    assert _plan(spark, rows) == {
        ("a", 0): (150, 150, 2),
        ("a", 200): (210, 10, 1),
        ("b", 0): (10, 10, 1),
    }


def test_plan_max_gap_bridges_small_gaps(spark):
    rows = [("a", 0, 100), ("a", 103, 10)]  # gap 3
    assert _plan(spark, rows, max_gap=2) == {
        ("a", 0): (100, 100, 1),
        ("a", 103): (113, 10, 1),
    }
    assert _plan(spark, rows, max_gap=3) == {("a", 0): (113, 113, 2)}


def test_plan_single_shuffle(spark):
    cdx = spark.createDataFrame(
        [("a", 0, 10)], "filename string, offset long, length long"
    )
    plan = plan_warc_fetches(cdx)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


# --- hostile-input fuzz: the CDX surface must never throw ---

from hypothesis import given, settings, strategies as st

URL_CHARS = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60
)


@settings(max_examples=6, deadline=None)
@given(st.lists(URL_CHARS, min_size=1, max_size=30))
def test_surt_key_never_throws(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select(surt_key(F.col("url")).alias("k")).collect()
    # every result is NULL (unparseable) or contains the SURT delimiter
    for r in out:
        assert r["k"] is None or ")" in r["k"]


@settings(max_examples=6, deadline=None)
@given(st.lists(st.text(max_size=80), min_size=1, max_size=30))
def test_parse_cdxj_never_throws(spark, lines):
    df = spark.createDataFrame([(ln,) for ln in lines], "line string")
    rows = parse_cdxj(df).collect()
    assert len(rows) == len(lines)  # malformed lines degrade, never drop
