"""Main-content extraction by link density — the jusText/Readability
family's core signal, relationally.

Boilerplate in web pages (navigation, footers, tag clouds, "related
links") is short and link-dense; article text is long and link-sparse.
This module splits the page into blocks at block-level tag boundaries,
scores each block by visible-text length and anchor-text share, and keeps
the content blocks. It complements ``operators/dedup.strip_boilerplate_
lines`` (cross-document frequent-line removal): link density works on a
SINGLE page with no corpus pass, frequent-line removal catches site
chrome that survives it.

Shape: one regex split + one explode; every score is a native column
expression over the block (``regexp_extract_all`` + higher-order
``aggregate``) — zero Python, zero shuffles until the caller's
re-assembly groupBy.

All three regexes are RE2-portable (no lookarounds), so the DuckDB
oracle (queries.py ``content_block_extract``) runs the SAME patterns over
the SAME synthesized markup and the two engines must agree per block.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# block-level boundaries: opening OR closing forms of structural tags
BLOCK_SPLIT_RE = (
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|table|thead|tbody|tr|td|th|section"
    r"|article|aside|header|footer|nav|blockquote|pre|form|br|hr)\b[^>]*>"
)
# anchor text (group 1), non-greedy across newlines
ANCHOR_RE = r"(?is)<a\b[^>]*>(.*?)</a>"
# any remaining (inline) tag
TAG_RE = r"(?s)<[^>]*>"


def _visible_len(raw: Column) -> Column:
    """Characters of visible text: strip tags, collapse whitespace, trim."""
    return F.length(
        F.trim(
            F.regexp_replace(F.regexp_replace(raw, TAG_RE, " "), r"\s+", " ")
        )
    ).cast("long")


def score_blocks(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Per block: ``(url, block_idx, n_chars, link_chars, link_density)``.
    ``n_chars`` counts visible text (anchors' own text included — it IS
    visible); ``link_chars`` counts just the anchor text; density is their
    ratio (0 for empty blocks)."""
    blocks = pages.select(
        F.col(url_col),
        F.posexplode(F.split(F.col(html_col), BLOCK_SPLIT_RE)).alias(
            "block_idx", "raw"
        ),
    )
    anchors = F.regexp_extract_all(F.col("raw"), F.lit(ANCHOR_RE), 1)
    link_chars = F.aggregate(
        F.transform(anchors, lambda a: _visible_len(a)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_chars = _visible_len(F.col("raw"))
    return blocks.select(
        url_col,
        F.col("block_idx").cast("long").alias("block_idx"),
        n_chars.alias("n_chars"),
        link_chars.alias("link_chars"),
        F.when(n_chars > 0, F.round(link_chars / n_chars, 6))
        .otherwise(F.lit(0.0))
        .alias("link_density"),
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.col("raw"), TAG_RE, " "), r"\s+", " "
            )
        ).alias("block_text"),
    )


def content_blocks(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    min_chars: int = 30,
    max_link_density: float = 0.4,
) -> DataFrame:
    """``score_blocks`` plus the keep verdict: a block is content when it
    has at least ``min_chars`` visible characters and at most
    ``max_link_density`` of them inside anchors. Thresholds are the
    jusText defaults' order of magnitude; tune per corpus."""
    scored = score_blocks(pages, url_col, html_col)
    return scored.withColumn(
        "kept",
        (
            (F.col("n_chars") >= min_chars)
            & (F.col("link_chars") <= max_link_density * F.col("n_chars"))
        ).cast("int"),
    )


def extract_content(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    min_chars: int = 30,
    max_link_density: float = 0.4,
) -> DataFrame:
    """Re-assembled main content per page: kept blocks joined in document
    order — ``(url, content)``. One groupBy on the page key (the explode's
    inverse); block order is restored with ``array_sort`` over
    (block_idx, text) structs, not a window, so the plan stays a single
    aggregation."""
    kept = content_blocks(
        pages, url_col, html_col, min_chars, max_link_density
    ).where(F.col("kept") == 1)
    return (
        kept.groupBy(url_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("block_idx", "block_text"))
            ).alias("bs")
        )
        .select(
            url_col,
            F.array_join(
                F.transform(F.col("bs"), lambda b: b["block_text"]), " "
            ).alias("content"),
        )
    )
