"""Syndication/discovery XML (operators/feeds.py): feed link discovery,
RSS item parsing, sitemap urlset + sitemapindex parsing."""

from __future__ import annotations

from llm_document_parser_spark.operators.feeds import (
    feed_links,
    rss_items,
    sitemap_entries,
)

_PAGE = """<html><head>
<link rel="alternate" type="application/rss+xml" title="RSS"
      href="https://ex.example/feed.xml">
<LINK type="application/atom+xml" href='https://ex.example/atom.xml'>
<link rel="stylesheet" href="/style.css">
</head><body><a href="/x">x</a></body></html>"""

_RSS = """<?xml version="1.0"?><rss version="2.0"><channel>
<title>Chan</title><link>https://ex.example/</link>
<item><title> First post </title><link>https://ex.example/1</link>
<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>
<item><TITLE>Second</TITLE><link>https://ex.example/2</link></item>
<item><link>https://ex.example/3</link></item>
</channel></rss>"""

_URLSET = """<?xml version="1.0"?><urlset xmlns="s">
<url><loc>https://ex.example/a</loc><lastmod>2024-01-02</lastmod></url>
<url><loc>
  https://ex.example/b </loc></url>
</urlset>"""

_SMINDEX = """<sitemapindex>
<sitemap><loc>https://ex.example/sm1.xml</loc></sitemap>
<sitemap><loc>https://ex.example/sm2.xml</loc>
<lastmod>2024-02-01</lastmod></sitemap>
</sitemapindex>"""


def test_feed_links_discovery(spark):
    df = spark.createDataFrame(
        [("p1", _PAGE), ("p2", "<html>no feeds</html>")],
        "url string, html_text string",
    )
    got = {
        (r["id"], r["feed_kind"], r["feed_url"])
        for r in feed_links(df).collect()
    }
    assert got == {
        ("p1", "rss", "https://ex.example/feed.xml"),
        ("p1", "atom", "https://ex.example/atom.xml"),
    }


def test_rss_items_order_and_missing_fields(spark):
    df = spark.createDataFrame([("f1", _RSS)], "url string, xml_text string")
    rows = sorted(rss_items(df).collect(), key=lambda r: r["item_idx"])
    assert [(r["item_idx"], r["title"], r["link"], r["pub_date"]) for r in rows] == [
        (1, "First post", "https://ex.example/1",
         "Mon, 01 Jan 2024 00:00:00 GMT"),
        (2, "Second", "https://ex.example/2", ""),
        (3, "", "https://ex.example/3", ""),
    ]
    # channel-level <title>/<link> outside <item> blocks must not leak in
    assert all(r["title"] != "Chan" for r in rows)


def test_sitemap_urlset_and_index(spark):
    df = spark.createDataFrame(
        [("s1", _URLSET), ("s2", _SMINDEX)], "url string, xml_text string"
    )
    rows = {
        (r["id"], r["kind"], r["entry_idx"]): (r["loc"], r["lastmod"])
        for r in sitemap_entries(df).collect()
    }
    assert rows[("s1", "url", 1)] == ("https://ex.example/a", "2024-01-02")
    assert rows[("s1", "url", 2)] == ("https://ex.example/b", "")
    assert rows[("s2", "sitemap", 1)] == ("https://ex.example/sm1.xml", "")
    assert rows[("s2", "sitemap", 2)] == (
        "https://ex.example/sm2.xml", "2024-02-01",
    )
    assert len(rows) == 4  # urlset page contributes no 'sitemap' rows


def test_plan_is_native_no_python(spark):
    df = spark.createDataFrame([("f1", _RSS)], "url string, xml_text string")
    plan = rss_items(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
