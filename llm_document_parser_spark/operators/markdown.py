"""HTML → Markdown conversion — the text format modern LLM-training
pipelines keep (structure-preserving, boilerplate-free, cheaply
tokenizable).

The reference extracts plain text from uploaded documents
(``src/document_parser.py:752`` ``parse_document`` → raw text); recent
web-corpus pipelines instead preserve document STRUCTURE as markdown so
headings/lists/emphasis survive into training data. This implements the
standard heuristic conversion as one chain of native ``regexp_replace``
calls — zero Python, whole-stage codegen end-to-end, and every pattern
is RE2-compatible (no lookaround, no pattern backreferences) so the
DuckDB oracle applies the IDENTICAL chain (only group-reference syntax
differs: ``$1`` vs ``\\1``).

Tag-name discipline: every tag pattern ends ``(?:\\s[^>]*)?>`` — the
name must be followed by ``>`` or whitespace-then-attributes — so
``<b>`` rules can never eat ``<body>``, ``<li>`` never eats ``<link>``,
``<p>`` never eats ``<pre>`` (RE2 has no lookahead to do this the usual
way).

Conversion rules, applied in order (a heuristic converter, documented —
not an HTML parser; ``content.py`` / ``html_extract.py`` own main-text
selection, this owns formatting):

1. ``<script>``/``<style>`` blocks dropped (separate patterns — RE2 has
   no pattern backreferences to share one);
2. ``<br>`` → newline;
3. ``<h1>``-``<h6>`` → ``#``…``######`` heading lines;
4. ``<li>`` → ``- `` bullet; list containers drop to line breaks;
5. ``<a href="…">text</a>`` → ``[text](href)``;
6. ``<b>``/``<strong>`` → ``**``, ``<i>``/``<em>`` → ``*``;
7. block boundaries (``<p>``/``<div>``/``<tr>``/…) → blank line; all
   remaining tags stripped to a space;
8. the five standard entities + ``&nbsp;`` decoded;
9. whitespace normalized: spaces/tabs collapsed, spaces hugging a
   newline dropped, ≥3 newlines → 2, outer newlines stripped by
   explicit anchored rules (trim is space-only in both engines), then
   outer space trim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_A = r"(?:\s[^>]*)?>"  # end of any tag: '>' now, or attributes then '>'

#: (pattern, spark_replacement, duckdb_replacement) — patterns shared
#: verbatim between engines.
RULES: list[tuple[str, str, str]] = [
    (r"(?is)<script" + _A + r".*?</script\s*>", "", ""),
    (r"(?is)<style" + _A + r".*?</style\s*>", "", ""),
    (r"(?i)<br\s*/?>", "\n", "\n"),
    (r"(?is)<h1" + _A + r"\s*(.*?)\s*</h1\s*>", "\n\n# $1\n\n", "\n\n# \\1\n\n"),
    (r"(?is)<h2" + _A + r"\s*(.*?)\s*</h2\s*>", "\n\n## $1\n\n", "\n\n## \\1\n\n"),
    (r"(?is)<h3" + _A + r"\s*(.*?)\s*</h3\s*>", "\n\n### $1\n\n", "\n\n### \\1\n\n"),
    (r"(?is)<h4" + _A + r"\s*(.*?)\s*</h4\s*>", "\n\n#### $1\n\n", "\n\n#### \\1\n\n"),
    (r"(?is)<h5" + _A + r"\s*(.*?)\s*</h5\s*>", "\n\n##### $1\n\n", "\n\n##### \\1\n\n"),
    (r"(?is)<h6" + _A + r"\s*(.*?)\s*</h6\s*>", "\n\n###### $1\n\n", "\n\n###### \\1\n\n"),
    (r"(?i)<li" + _A, "\n- ", "\n- "),
    (r"(?i)</li\s*>", "", ""),
    (r"(?i)</?(?:ul|ol)" + _A, "\n", "\n"),
    (
        r'(?is)<a\s[^>]*href="([^"]*)"[^>]*>\s*(.*?)\s*</a\s*>',
        "[$2]($1)",
        "[\\2](\\1)",
    ),
    (r"(?i)</?(?:b|strong)" + _A, "**", "**"),
    (r"(?i)</?(?:i|em)" + _A, "*", "*"),
    (r"(?i)</?(?:p|div|tr|table|section|article)" + _A, "\n\n", "\n\n"),
    (r"(?s)<[^>]*>", " ", " "),
    (r"&nbsp;", " ", " "),
    (r"&amp;", "&", "&"),
    (r"&lt;", "<", "<"),
    (r"&gt;", ">", ">"),
    (r"&quot;", '"', '"'),
    (r"&#39;", "'", "'"),
    (r"[ \t]+", " ", " "),
    (r" ?\n ?", "\n", "\n"),
    (r"\n{3,}", "\n\n", "\n\n"),
    # after the collapses above, outer whitespace is newlines only;
    # trim() is space-only in BOTH engines, so strip these explicitly
    (r"^\n+", "", ""),
    (r"\n+$", "", ""),
]


def html_to_markdown(html: Column) -> Column:
    """Apply the RULES chain; NULL in → NULL out."""
    out = html
    for pat, spark_rep, _ in RULES:
        out = F.regexp_replace(out, pat, spark_rep)
    return F.trim(out)


def markdown_sql(expr: str) -> str:
    """The identical chain as a DuckDB SQL expression over ``expr`` —
    the cross-engine oracle builder used by the catalog query. DuckDB
    string literals are backslash-literal, so only quotes are escaped;
    newlines in replacements ride as real newlines in the literal."""
    out = expr
    for pat, _, duck_rep in RULES:
        p = pat.replace("'", "''")
        r = duck_rep.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    return f"trim({out})"
