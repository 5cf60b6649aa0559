"""HTML table extraction — ``<table>`` markup → relational rows.

The reference's invoice parser pulls line items out of tabular PDF text
with regexes (``src/document_parser.py:366-420`` item/amount patterns);
on the web the same information lives in ``<table>`` markup, and table
corpora are a first-class training-data asset. This module explodes
each document's tables into ``(id, table_idx, row_idx, cells)`` rows with
zero Python — three nested ``regexp_extract_all`` + ``posexplode``
stages and one ``transform`` for cell cleanup, all inside codegen, all
RE2-portable (the DuckDB oracle runs the identical chain).

Shape: narrow generators only — no shuffle at all; downstream groupBys
decide their own partitioning. Known heuristic limits (documented, the
standard trade of regex table scrapers): NESTED tables truncate the
outer table at the inner ``</table>`` (lazy match), and
colspan/rowspan attributes are not expanded — cells arrive in source
order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TABLE_RE = r"(?is)<table[^>]*>(.*?)</table\s*>"
_TR_RE = r"(?is)<tr[^>]*>(.*?)</tr\s*>"
_CELL_RE = r"(?is)<t[dh][^>]*>\s*(.*?)\s*</t[dh]\s*>"

#: (pattern, replacement) cleanup applied per cell — tags to spaces,
#: the five standard entities + nbsp, whitespace collapse. Identical
#: strings run under Java regex and RE2.
CELL_CLEANUP: list[tuple[str, str]] = [
    (r"(?s)<[^>]*>", " "),
    (r"&nbsp;", " "),
    (r"&amp;", "&"),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", '"'),
    (r"&#39;", "'"),
    (r"\s+", " "),
]


def clean_cell(cell: Column) -> Column:
    out = cell
    for pat, rep in CELL_CLEANUP:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


def extract_html_tables(
    df: DataFrame, id_col: str = "url", html_col: str = "html_text"
) -> DataFrame:
    """(id, table_idx, row_idx, cells array<string>) per table row.

    Documents without tables, tables without rows, and rows without
    cells simply produce no output rows (inner explode of an empty
    array) — never errors. Indexes are 0-based source order."""
    tables = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.coalesce(
                F.regexp_extract_all(F.col(html_col), F.lit(_TABLE_RE), 1),
                F.array(),
            )
        ).alias("table_idx", "_tbody"),
    )
    rows = tables.select(
        "id",
        "table_idx",
        F.posexplode(
            F.coalesce(
                F.regexp_extract_all(F.col("_tbody"), F.lit(_TR_RE), 1),
                F.array(),
            )
        ).alias("row_idx", "_row"),
    )
    return rows.select(
        "id",
        F.col("table_idx").cast("long").alias("table_idx"),
        F.col("row_idx").cast("long").alias("row_idx"),
        F.transform(
            F.regexp_extract_all(F.col("_row"), F.lit(_CELL_RE), 1),
            clean_cell,
        ).alias("cells"),
    )


def cell_cleanup_sql(expr: str) -> str:
    """The identical cleanup chain as DuckDB SQL (oracle builder)."""
    out = expr
    for pat, rep in CELL_CLEANUP:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    return f"trim({out})"
