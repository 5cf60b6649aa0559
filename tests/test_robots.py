"""robots.txt relational parser + admission verdicts: group binding,
comment/empty-directive handling, longest-match/allow-wins semantics,
agent selection, sitemap <loc> extraction. Cross-engine parity over the
corpus construction is the ``robots_admission`` catalog oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_document_parser_spark.operators.robots import (
    parse_robots,
    robots_allowed,
    sitemap_locs,
)

BODY = """# crawler policy
User-agent: *
Disallow: /private
Allow: /private/ok

Disallow: /late-binds-to-star
User-agent: FancyBot
User-agent: OtherBot
Disallow: /fancy
Disallow:
Allow:

Disallow: /orphan-stays-with-fancy
"""

ORPHANED = "Disallow: /before-any-agent\nUser-agent: *\nDisallow: /x"


def _rules(spark, body, host="h.example"):
    df = spark.createDataFrame([(host, body)], "host string, body string")
    return parse_robots(df)


def test_parse_group_binding(spark):
    got = {
        (r["agent"], r["rule"], r["prefix"])
        for r in _rules(spark, BODY).collect()
    }
    assert got == {
        ("*", "disallow", "/private"),
        ("*", "allow", "/private/ok"),
        # a directive after a blank line still binds to the open group
        ("*", "disallow", "/late-binds-to-star"),
        # multi-agent run: both agents get the group's rules
        ("fancybot", "disallow", "/fancy"),
        ("otherbot", "disallow", "/fancy"),
        ("fancybot", "disallow", "/orphan-stays-with-fancy"),
        ("otherbot", "disallow", "/orphan-stays-with-fancy"),
        # empty-value Allow/Disallow dropped
    }


def test_parse_drops_preamble_directives(spark):
    got = {
        (r["agent"], r["rule"], r["prefix"])
        for r in _rules(spark, ORPHANED).collect()
    }
    assert got == {("*", "disallow", "/x")}


def _verdicts(spark, rules, urls, agent="*"):
    u = spark.createDataFrame([(x,) for x in urls], "url string")
    return {
        r["url"]: r["allowed"]
        for r in robots_allowed(u, rules, agent=agent).collect()
    }


def test_admission_semantics(spark):
    rules = _rules(spark, BODY, host="h.example")
    got = _verdicts(
        spark,
        rules,
        [
            "https://h.example/private/secret",  # disallowed
            "https://h.example/private/ok/fine",  # allow overrides (longer)
            "https://h.example/public/x",  # no matching rule
            "https://h.example/",  # bare path '/'
            "https://other.example/private/x",  # host without rules
        ],
    )
    assert got == {
        "https://h.example/private/secret": False,
        "https://h.example/private/ok/fine": True,
        "https://h.example/public/x": True,
        "https://h.example/": True,
        "https://other.example/private/x": True,
    }


def test_allow_wins_equal_length_tie(spark):
    rules = _rules(spark, "User-agent: *\nDisallow: /a\nAllow: /a")
    got = _verdicts(spark, rules, ["https://h.example/a/x"])
    assert got["https://h.example/a/x"] is True


def test_agent_specific_group(spark):
    rules = _rules(spark, BODY)
    got = _verdicts(spark, rules, ["https://h.example/fancy/x"], agent="FancyBot")
    assert got["https://h.example/fancy/x"] is False
    star = _verdicts(spark, rules, ["https://h.example/fancy/x"])
    assert star["https://h.example/fancy/x"] is True


def test_preserves_input_columns(spark):
    rules = _rules(spark, BODY)
    u = spark.createDataFrame(
        [("https://h.example/private/a", "keep-me")], "url string, extra string"
    )
    (row,) = robots_allowed(u, rules).collect()
    assert row["extra"] == "keep-me"
    assert row["allowed"] is False
    assert row["host"] == "h.example"


def test_no_duplicate_host_column(spark):
    # a frame that ALREADY has a host column (common after other operators
    # in this module) must keep exactly its own — a second verdict-side
    # host made downstream F.col("host") ambiguous (round-4 ADVICE)
    import pyspark.sql.functions as F

    rules = _rules(spark, BODY)
    u = spark.createDataFrame(
        [("https://h.example/private/a", "caller-host")],
        "url string, host string",
    )
    out = robots_allowed(u, rules)
    assert out.columns.count("host") == 1
    (row,) = out.select(F.col("host"), F.col("allowed")).collect()
    assert row["host"] == "caller-host"
    assert row["allowed"] is False


def test_sitemap_locs(spark):
    xml = (
        '<?xml version="1.0"?><urlset><url><loc> https://a/1 </loc>'
        "<lastmod>2024-01-01</lastmod></url>"
        "<url><LOC>https://a/2</LOC></url>"
        "<url><loc himg='x'>https://a/3</loc></url></urlset>"
    )
    df = spark.createDataFrame([("h", xml), ("empty", "<urlset/>")],
                               "host string, xml string")
    got = [(r["host"], r["loc"]) for r in sitemap_locs(df).collect()]
    assert sorted(got) == [
        ("h", "https://a/1"), ("h", "https://a/2"), ("h", "https://a/3")
    ]


# ------------------------------------------------------- crawl-delay waves


def test_crawl_delays_parse(spark):
    from llm_document_parser_spark.operators.robots import crawl_delays

    rows = [
        ("a.com", "User-agent: *\nCrawl-delay: 5\nCrawl-delay: 9"),
        ("b.com", "User-agent: *\nDisallow: /x"),          # absent -> default
        ("c.com", "User-agent: *\ncrawl-DELAY:  12 "),     # case/space
        ("d.com", "Crawl-delay: soon"),                    # non-numeric
    ]
    df = spark.createDataFrame(rows, "host string, body string")
    out = {r["host"]: r["delay_secs"] for r in crawl_delays(df).collect()}
    assert out == {"a.com": 5, "b.com": 1, "c.com": 12, "d.com": 1}


def test_fetch_waves_per_host(spark):
    from llm_document_parser_spark.operators.robots import schedule_fetch_waves

    frontier = spark.createDataFrame(
        [(f"https://h{i % 2}.com/p{i}", f"h{i % 2}.com") for i in range(10)],
        "url string, host string",
    )
    delays = spark.createDataFrame(
        [("h0.com", 10), ("h1.com", 2)], "host string, delay_secs long"
    )
    out = schedule_fetch_waves(frontier, delays).collect()
    by_host: dict[str, list] = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    for host, rows in by_host.items():
        waves = sorted(r["wave"] for r in rows)
        assert waves == list(range(5))  # dense 0..4 within each host
        for r in rows:
            assert r["eta_secs"] == r["wave"] * r["delay_secs"]
    assert {r["delay_secs"] for r in by_host["h0.com"]} == {10}


def test_fetch_waves_unknown_host_defaults(spark):
    from llm_document_parser_spark.operators.robots import schedule_fetch_waves

    frontier = spark.createDataFrame(
        [("https://x.com/1", "x.com")], "url string, host string"
    )
    empty = spark.createDataFrame([], "host string, delay_secs long")
    r = schedule_fetch_waves(frontier, empty).collect()[0]
    assert r["delay_secs"] == 1 and r["wave"] == 0 and r["eta_secs"] == 0


# --- RFC 9309 wildcard matching (robots_allowed(wildcards=True)) ---

from llm_document_parser_spark.operators.robots import wildcard_regex


def test_wildcard_regex_compilation(spark):
    df = spark.createDataFrame(
        [("/*.pdf$",), ("/a*b*c",), ("/x.y+z(q)",), ("/plain",), ("/end$",)],
        "prefix string",
    )
    got = [
        r["rx"]
        for r in df.select(wildcard_regex(F.col("prefix")).alias("rx")).collect()
    ]
    assert got == [
        r"^/.*\.pdf$",
        "^/a.*b.*c",
        r"^/x\.y\+z\(q\)",
        "^/plain",
        "^/end$",
    ]


def _wild_verdicts(spark, rules_rows, urls):
    rules = spark.createDataFrame(
        [("h.example", "*", r, p) for r, p in rules_rows],
        "host string, agent string, rule string, prefix string",
    )
    df = spark.createDataFrame(
        [(f"https://h.example{p}",) for p in urls], "url string"
    )
    out = robots_allowed(df, rules, wildcards=True).collect()
    return {r["url"].split(".example")[1]: r["allowed"] for r in out}


def test_wildcard_dollar_anchor_and_star(spark):
    v = _wild_verdicts(
        spark,
        [("disallow", "/*.doc$")],
        ["/a/b.doc", "/a/b.docx", "/x.doc", "/x.doc/y"],
    )
    assert v == {
        "/a/b.doc": False,
        "/a/b.docx": True,
        "/x.doc": False,
        "/x.doc/y": True,
    }


def test_wildcard_allow_wins_equal_length_tie(spark):
    v = _wild_verdicts(
        spark,
        [("disallow", "/p/*"), ("allow", "/p/a*")],  # lens 4 and 5
        ["/p/a1", "/p/b1"],
    )
    assert v == {"/p/a1": True, "/p/b1": False}


def test_wildcard_metachars_are_literal(spark):
    # '.' must not act as regex any-char: /xay must NOT match /x.y
    v = _wild_verdicts(spark, [("disallow", "/x.y")], ["/x.y/z", "/xay/z"])
    assert v == {"/x.y/z": False, "/xay/z": True}
