"""Syndication & discovery XML: RSS/Atom feed links, RSS item parsing,
sitemap.xml URL sets — the non-robots half of crawl URL discovery.

A crawl frontier discovers new URLs four ways: outlinks (links.py),
robots.txt Sitemap lines (robots.py sitemap_locs), the sitemap.xml
documents those point at (``sitemap_entries`` here), and the RSS/Atom
feeds pages advertise (``feed_links`` + ``rss_items`` here — the
freshness channel: feeds surface new articles hours before recrawl
schedules would).

Everything is native column expressions: block-level
``regexp_extract_all`` then per-block ``regexp_extract`` inside a
``transform`` — zero Python, zero shuffles until the caller explodes.
Patterns are RE2-portable (inline ``(?is)``, non-greedy dots, no
lookaround) so the DuckDB oracle runs character-identical regexes. Same
extraction spec as operators/metadata.py: first match wins, ''/NULL when
absent, attribute source order ``rel/type`` before ``href`` (the
dominant real-markup order; reversed attributes are a documented miss).

Reference scope note: the reference parses uploaded documents only — no
crawl discovery surface exists there (src/document_parser.py); this
module is part of the web-crawl tier the brief adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# <link ... type="application/rss+xml" ... href="..."> — kind group 1
_FEED_LINK_RE = (
    r"""(?is)<link\s[^>]*type\s*=\s*["']application/(rss|atom)\+xml["']"""
    r"""[^>]*href\s*=\s*["']([^"']*)"""
)

# child-field regexes strip surrounding whitespace IN the pattern
# (\s* anchors): F.trim handles only the space character, and real
# sitemaps/feeds pad values with newlines (same as robots.sitemap_locs)
_ITEM_BLOCK_RE = r"(?is)<item[\s>].*?</item>"
_TITLE_RE = r"(?is)<title[^>]*>\s*(.*?)\s*</title"
_LINK_RE = r"(?is)<link[^>]*>\s*(.*?)\s*</link"
_PUBDATE_RE = r"(?is)<pubdate[^>]*>\s*(.*?)\s*</pubdate"

_URL_BLOCK_RE = r"(?is)<url[\s>].*?</url>"
_SITEMAP_BLOCK_RE = r"(?is)<sitemap[\s>].*?</sitemap>"
_LOC_RE = r"(?is)<loc[^>]*>\s*(.*?)\s*</loc"
_LASTMOD_RE = r"(?is)<lastmod[^>]*>\s*(.*?)\s*</lastmod"


def feed_links_col(html: Column) -> Column:
    """ARRAY<STRUCT<feed_kind, feed_url>> of advertised RSS/Atom feeds,
    in document order."""
    kinds = F.regexp_extract_all(html, F.lit(_FEED_LINK_RE), 1)
    urls = F.regexp_extract_all(html, F.lit(_FEED_LINK_RE), 2)
    return F.zip_with(
        kinds,
        urls,
        lambda k, u: F.struct(
            F.lower(k).alias("feed_kind"), F.trim(u).alias("feed_url")
        ),
    )


def feed_links(
    df: DataFrame, id_col: str = "url", html_col: str = "html_text"
) -> DataFrame:
    """(id, feed_kind, feed_url) — one row per advertised feed; pages
    without feeds contribute nothing."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(feed_links_col(F.col(html_col))).alias("f"),
        )
        .select("id", "f.feed_kind", "f.feed_url")
    )


def _block_field(block: Column, pat: str) -> Column:
    return F.trim(F.regexp_extract(block, pat, 1))


def rss_items(
    df: DataFrame, id_col: str = "url", xml_col: str = "xml_text"
) -> DataFrame:
    """Parse RSS 2.0 channel documents: (id, item_idx, title, link,
    pub_date) per <item>, 1-based document order. Missing child tags
    yield '' (the metadata.py absent-field convention). Atom <entry>
    parsing is intentionally out of v1 scope (href-attribute links need
    a second spec) — feed_links still discovers Atom feeds."""
    blocks = F.regexp_extract_all(F.col(xml_col), F.lit(_ITEM_BLOCK_RE), 0)
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(blocks).alias("idx0", "block"),
        )
        .select(
            "id",
            (F.col("idx0") + 1).cast("long").alias("item_idx"),
            _block_field(F.col("block"), _TITLE_RE).alias("title"),
            _block_field(F.col("block"), _LINK_RE).alias("link"),
            _block_field(F.col("block"), _PUBDATE_RE).alias("pub_date"),
        )
    )


def sitemap_entries(
    df: DataFrame, id_col: str = "url", xml_col: str = "xml_text"
) -> DataFrame:
    """Parse sitemap.xml documents — BOTH shapes in one pass:

    * urlset ``<url><loc>…</loc><lastmod>…</lastmod></url>`` →
      kind='url' page entries (lastmod '' when absent);
    * sitemapindex ``<sitemap><loc>…</loc></sitemap>`` →
      kind='sitemap' child-sitemap entries the frontier must fetch next.

    Returns (id, kind, entry_idx, loc, lastmod); entry_idx is 1-based per
    (document, kind). The recursive fetch loop (sitemapindex → child →
    urlset) is driver logic over this operator, exactly like the robots →
    sitemap_locs → here chain."""
    xml = F.col(xml_col)
    out = []
    for kind, block_re in (("url", _URL_BLOCK_RE), ("sitemap", _SITEMAP_BLOCK_RE)):
        blocks = F.regexp_extract_all(xml, F.lit(block_re), 0)
        out.append(
            df.select(
                F.col(id_col).alias("id"),
                F.posexplode(blocks).alias("idx0", "block"),
            ).select(
                "id",
                F.lit(kind).alias("kind"),
                (F.col("idx0") + 1).cast("long").alias("entry_idx"),
                _block_field(F.col("block"), _LOC_RE).alias("loc"),
                _block_field(F.col("block"), _LASTMOD_RE).alias("lastmod"),
            )
        )
    return out[0].unionByName(out[1])
