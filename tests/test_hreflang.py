"""hreflang alternate extraction / clustering tests (operators/metadata.py)."""

from __future__ import annotations

from llm_document_parser_spark.operators.metadata import (
    hreflang_alternates,
    hreflang_clusters,
)


def test_extraction_cases(spark):
    pages = [
        # mixed case lang code, single + double quotes, extra attributes
        (
            "https://a.example/en",
            '<LINK data-x="1" rel="alternate" hreflang="EN-us" '
            "href='https://a.example/en'>"
            '<link rel="alternate" hreflang="fr" href="https://a.example/fr">',
        ),
        # no annotations at all
        ("https://b.example/", "<html><body>plain</body></html>"),
        # rel!=alternate must not match
        (
            "https://c.example/",
            '<link rel="canonical" hreflang="de" href="https://c.example/">',
        ),
    ]
    df = spark.createDataFrame(pages, "url string, html string")
    got = sorted(
        (r["url"], r["hreflang"], r["target"])
        for r in hreflang_alternates(df, html_col="html").collect()
    )
    assert got == [
        ("https://a.example/en", "en-us", "https://a.example/en"),
        ("https://a.example/en", "fr", "https://a.example/fr"),
    ]


def test_cluster_grouping_and_set_dedup(spark):
    def page(url, targets, extra=()):
        links = "".join(
            f'<link rel="alternate" hreflang="{lg}" href="{h}">'
            for lg, h in list(targets) + list(extra)
        )
        return (url, links)

    trio = [("en", "https://s.example/en"), ("fr", "https://s.example/fr")]
    pages = [
        # same target set, one page repeats a target under x-default:
        # identical group_key, extra language surfaces in langs_csv
        page("https://s.example/en", trio, [("x-default", "https://s.example/en")]),
        page("https://s.example/fr", trio),
        # a different site clusters separately
        page("https://t.example/en", [("en", "https://t.example/en")]),
    ]
    df = spark.createDataFrame(pages, "url string, html string")
    clusters = {
        r["first_url"]: r
        for r in hreflang_clusters(
            hreflang_alternates(df, html_col="html")
        ).collect()
    }
    s = clusters["https://s.example/en"]
    assert s["n_pages"] == 2 and s["n_targets"] == 2
    assert s["langs_csv"] == "en,fr,x-default"
    t = clusters["https://t.example/en"]
    assert t["n_pages"] == 1 and t["n_targets"] == 1 and t["langs_csv"] == "en"
    assert s["group_key"] != t["group_key"]
