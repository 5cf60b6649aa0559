"""HTML metadata extraction — title / meta description / canonical / og / lang.

A Common-Crawl extraction pipeline needs page metadata alongside main
content: <title> and meta-description feed search indexing and quality
signals, rel=canonical feeds URL canonicalization (operators/urls.py
handles the syntactic tier; the page's own declared canonical is the
semantic tier), og:* powers dedup of syndicated articles, and the <html
lang> attribute cross-checks the statistical language-ID
(textstats.lang_id). Reference analog: the reference stores a
``text_preview`` + filename per document (src/api_server.py:2162-2182);
for web pages the in-document metadata IS that preview layer.

Everything here is a native column expression (``regexp_extract`` inside
whole-stage codegen — zero Python, no shuffle). Patterns are
RE2-portable: inline ``(?is)`` flags, non-greedy dots, no backreferences
or lookaround — the DuckDB oracle runs character-identical regexes.

Extraction spec v1 (deterministic, documented limits):
  * first match wins, '' when absent (both engines' regexp_extract);
  * attributes must appear in source order ``name/property/rel`` before
    ``content/href`` within the tag — the overwhelmingly dominant order
    in real markup; reversed-attribute tags are a documented miss;
  * values read from single- OR double-quoted attributes;
  * title text is whitespace-collapsed, entity-decoded (the html_extract
    entity subset), and trimmed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TITLE_RE = r"(?is)<title[^>]*>(.*?)</title"
_LANG_RE = r"""(?is)<html\s[^>]*lang\s*=\s*["']([^"']*)"""


def _meta_named_re(attr: str, key: str) -> str:
    # <meta name="description" ... content="..."> / single quotes / any case
    return (
        r"(?is)<meta\s[^>]*" + attr + r"\s*=\s*[\"']" + key
        + r"[\"'][^>]*content\s*=\s*[\"']([^\"']*)"
    )


def _link_rel_re(rel: str) -> str:
    return (
        r"(?is)<link\s[^>]*rel\s*=\s*[\"']" + rel
        + r"[\"'][^>]*href\s*=\s*[\"']([^\"']*)"
    )


def _clean_inline_text(c: Column) -> Column:
    c = F.regexp_replace(c, r"\s+", " ")
    for ent, ch in (
        ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "),
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(c)


def page_title(html: Column) -> Column:
    return _clean_inline_text(F.regexp_extract(html, TITLE_RE, 1))


def meta_description(html: Column) -> Column:
    return _clean_inline_text(
        F.regexp_extract(html, _meta_named_re("name", "description"), 1)
    )


def canonical_href(html: Column) -> Column:
    return F.trim(F.regexp_extract(html, _link_rel_re("canonical"), 1))


def og_content(html: Column, prop: str) -> Column:
    return _clean_inline_text(
        F.regexp_extract(html, _meta_named_re("property", prop), 1)
    )


def declared_lang(html: Column) -> Column:
    return F.lower(F.trim(F.regexp_extract(html, _LANG_RE, 1)))


def page_metadata(df: DataFrame, html_col: str = "html_text") -> DataFrame:
    """Append the five metadata columns to ``df``. ``html_col`` is the
    DECODED html string (use charset.decode_payload / the pipeline's
    decode stage for binary payloads first)."""
    h = F.col(html_col)
    return df.withColumns(
        {
            "title": page_title(h),
            "meta_description": meta_description(h),
            "canonical": canonical_href(h),
            "og_title": og_content(h, "og:title"),
            "declared_lang": declared_lang(h),
        }
    )


def meta_robots(html: Column) -> Column:
    """Lowercased content of ``<meta name="robots" …>`` ('' when absent).
    Same extraction spec as the other meta fields (first match wins,
    source-order attributes)."""
    return F.lower(F.regexp_extract(html, _meta_named_re("name", "robots"), 1))


def robots_noindex(html: Column) -> Column:
    """True when the page's meta robots forbids indexing — ``noindex``
    or the ``none`` shorthand (== noindex,nofollow). Curation pipelines
    drop these pages: the publisher asked not to be indexed, and the
    same courtesy extends to corpus inclusion."""
    d = meta_robots(html)
    return d.rlike(r"(^|[,\s])(noindex|none)([,\s]|$)")


def robots_nofollow(html: Column) -> Column:
    """True when meta robots forbids following links (``nofollow`` /
    ``none``) — the outlink-extraction stage excludes these pages from
    the crawl frontier."""
    d = meta_robots(html)
    return d.rlike(r"(^|[,\s])(nofollow|none)([,\s]|$)")


# ---------------------------------------------------------------------------
# JSON-LD structured data (schema.org embedded metadata)
# ---------------------------------------------------------------------------

_JSONLD_RE = (
    r"""(?is)<script\s[^>]*type\s*=\s*["']application/ld\+json["']"""
    r"""[^>]*>(.*?)</script"""
)


def jsonld_block(html: Column) -> Column:
    """Raw text of the FIRST ``<script type="application/ld+json">`` block
    ('' when absent) — same first-match spec as the meta fields. News
    articles carry headline/datePublished/author here far more reliably
    than in visible markup; dedup of syndicated articles keys on it."""
    return F.trim(F.regexp_extract(html, _JSONLD_RE, 1))


def jsonld_field(html: Column, path: str) -> Column:
    """A JSON-path field from the first JSON-LD block. NULL when the block
    is absent, invalid JSON, or lacks the key — Spark's ``get_json_object``
    null-on-anything contract (the oracle mirrors it by guarding DuckDB's
    stricter json functions behind ``json_valid``). Use bracket syntax for
    @-keys: ``$['@type']``."""
    return F.get_json_object(jsonld_block(html), path)


def page_jsonld(df: DataFrame, html_col: str = "html_text") -> DataFrame:
    """Append the four headline JSON-LD columns (the schema.org Article
    core): jsonld_type, headline, date_published, author_name."""
    h = F.col(html_col)
    return df.withColumns(
        {
            "jsonld_type": jsonld_field(h, "$['@type']"),
            "headline": jsonld_field(h, "$.headline"),
            "date_published": jsonld_field(h, "$.datePublished"),
            "author_name": jsonld_field(h, "$.author.name"),
        }
    )


# ---------------------------------------------------------------------------
# hreflang alternates — the site-declared translation graph
# ---------------------------------------------------------------------------
# <link rel="alternate" hreflang="xx" href="..."> enumerates a page's own
# translations — the SITE-declared parallel-document signal (Google's
# multilingual annotation; ParaCrawl seeds candidate pairs from exactly
# this before any content alignment). Pages listing the same alternate
# set form a translation cluster: bitext mining's highest-precision,
# zero-inference candidate source, complementing the path-pattern miner
# (urls.bitext_url_pairs) and the embedding miner
# (bitext.margin_mined_pairs). Same single-attribute-order discipline as
# feeds._FEED_LINK_RE: one (?is) RE2-safe pattern, rel before hreflang
# before href; reversed-attribute markup is out of scope by design.

_HREFLANG_RE = (
    r"""(?is)<link\s[^>]*rel\s*=\s*["']alternate["']"""
    r"""[^>]*hreflang\s*=\s*["']([a-zA-Z0-9-]+)["']"""
    r"""[^>]*href\s*=\s*["']([^"']+)["']"""
)


def hreflang_alternates(
    df: DataFrame, url_col: str = "url", html_col: str = "html_text"
) -> DataFrame:
    """(url, hreflang, target) per declared alternate: language codes
    lowercased (BCP 47 is case-insensitive), pages with no annotations
    contribute no rows. Narrow per-row regex work then one explode —
    no shuffle until the caller aggregates."""
    langs = F.regexp_extract_all(F.col(html_col), F.lit(_HREFLANG_RE), 1)
    hrefs = F.regexp_extract_all(F.col(html_col), F.lit(_HREFLANG_RE), 2)
    pairs = F.arrays_zip(
        F.transform(langs, F.lower).alias("hreflang"), hrefs.alias("target")
    )
    return (
        df.select(F.col(url_col).alias("url"), F.explode(pairs).alias("p"))
        .select("url", F.col("p.hreflang").alias("hreflang"), F.col("p.target").alias("target"))
    )


def hreflang_clusters(alternates: DataFrame) -> DataFrame:
    """Translation clusters from hreflang annotations: pages sharing an
    identical alternate-target SET get one cluster key (md5 of the
    sorted, deduplicated target list — portable across engines), with
    page / target / language counts per cluster. One groupBy(url) to
    build each page's set signature, one groupBy(key) to cluster — both
    key-partitioned; at crawl scale the cluster key is also the natural
    shard key for downstream pair generation."""
    sig = (
        alternates.groupBy("url")
        .agg(
            F.md5(
                F.concat_ws("\n", F.array_sort(F.collect_set("target")))
            ).alias("group_key"),
            F.collect_set("hreflang").alias("langs"),
            F.collect_set("target").alias("targets"),
        )
    )
    return sig.groupBy("group_key").agg(
        F.count(F.lit(1)).cast("long").alias("n_pages"),
        F.min("url").alias("first_url"),
        F.array_join(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("langs")))), ","
        ).alias("langs_csv"),
        F.size(F.array_distinct(F.flatten(F.collect_list("targets"))))
        .cast("long")
        .alias("n_targets"),
    )
