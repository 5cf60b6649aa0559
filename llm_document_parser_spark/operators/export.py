"""Export sinks — S10-S13: the reference's CSV/Excel/JSON export flatteners
re-expressed as DataFrame derivations (reference: src/export_manager.py).

The reference iterates documents in Python and builds rows by hand
(reference: src/export_manager.py:43-77); here each export is a projection:

* wide CSV (S10)  — ``pattern_*``/``contact_*`` prefixed columns with
  comma-joined lists (reference golden:
  data/exports/export_20251007_172111.csv)
* long format (S11 sheets 2-3) — ``explode(map)`` into
  (url, key, joined_values)
* JSON envelope (S12) — ``to_json(struct(...))`` documents plus an
  export_info header (reference: src/export_manager.py:204-216)
* flattener (S13) — first element of each list field

Selection semantics mirror the reference's keyed export (J1): a broadcast
left-semi join against the requested url set.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - optional, not installed in this environment
    import openpyxl  # type: ignore  # noqa: F401

    HAS_OPENPYXL = True
except Exception:  # pragma: no cover
    HAS_OPENPYXL = False

# stable flattened field set, from the reference's CSV writer field order
# (reference: src/export_manager.py:38-41 uses pattern/contact key iteration;
# we pin a deterministic superset so the schema is fixed)
PATTERN_FIELDS = [
    "invoice_number", "date", "due_date", "total_amount", "tax", "email",
    "qty", "amount", "product_id", "stock_code", "job", "total",
    "payment_method", "contract_id", "parties", "buyer", "supplier", "term",
    "currency", "percentage",
]
CONTACT_FIELDS = ["email", "phone", "website", "name", "company", "zip_code"]


def select_for_export(results: DataFrame, urls: DataFrame) -> DataFrame:
    """J1 — keyed selection via broadcast left-semi join."""
    return results.join(F.broadcast(urls), "url", "left_semi")


def export_wide(results: DataFrame) -> DataFrame:
    """S10 — one wide row per document; list values comma-joined (X11)."""
    cols = [
        F.col("url"),
        F.col("document_type"),
        F.col("doc_kind"),
        F.coalesce(F.col("names.primary_name"), F.lit("")).alias("primary_name"),
    ]
    for field in PATTERN_FIELDS:
        cols.append(
            F.array_join(
                F.coalesce(F.col("patterns").getItem(field), F.array()), ", "
            ).alias(f"pattern_{field}")
        )
    for field in CONTACT_FIELDS:
        cols.append(
            F.array_join(
                F.coalesce(F.col("contacts").getItem(field), F.array()), ", "
            ).alias(f"contact_{field}")
        )
    return results.select(*cols)


def export_long(results: DataFrame, map_col: str = "patterns") -> DataFrame:
    """S11 long sheets — (url, key, joined values) via explode(map)."""
    return results.select(
        "url", F.explode_outer(map_col).alias("key", "vals")
    ).select(
        "url",
        "key",
        F.array_join(F.coalesce(F.col("vals"), F.array()), ", ").alias("values"),
    )


def export_json_docs(results: DataFrame, version: str = "1.0") -> DataFrame:
    """S12 — JSON document envelope rows; ISO timestamps (X12)."""
    doc = F.to_json(
        F.struct(
            F.col("url"),
            F.col("document_type"),
            F.col("patterns"),
            F.col("contacts"),
            F.col("entities"),
            F.col("features"),
            F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss").alias("warc_ts"),
            F.lit(version).alias("version"),
        )
    )
    return results.select("url", doc.alias("document_json"))


EXCEL_CELL_LIMIT = 32767  # reference: src/export_manager.py:173
EXCEL_SHEETS = ["Document Info", "Extraction Patterns", "Contact Info", "Text Preview"]


def excel_sheet_frames(results: DataFrame) -> dict[str, DataFrame]:
    """S11 — the four sheets of the reference's Excel export (reference:
    src/export_manager.py:88-184) as DataFrames, keyed by sheet name.
    Rows are sorted for a deterministic artifact."""
    info = results.select(
        F.col("url"),
        F.col("document_type"),
        F.col("doc_kind"),
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss").alias("crawled_at"),
        F.col("features.text_length").alias("text_length"),
    ).orderBy("url")
    patterns = (
        export_long(results, "patterns").filter(F.col("key").isNotNull())
        .withColumnsRenamed({"key": "pattern_type", "values": "values_joined"})
        .orderBy("url", "pattern_type")
    )
    contacts = (
        export_long(results, "contacts").filter(F.col("key").isNotNull())
        .withColumnsRenamed({"key": "contact_type", "values": "values_joined"})
        .orderBy("url", "contact_type")
    )
    preview = results.select(
        "url",
        F.substring("extracted_text", 1, EXCEL_CELL_LIMIT).alias("text_preview"),
    ).orderBy("url")
    return dict(zip(EXCEL_SHEETS, [info, patterns, contacts, preview]))


def _write_xlsx(frames: dict[str, "object"], out_path: str) -> None:
    """xlsx writer (requires openpyxl); frames are pandas DataFrames."""
    import pandas as pd

    with pd.ExcelWriter(out_path, engine="openpyxl") as writer:
        for sheet, pdf in frames.items():
            pdf.to_excel(writer, sheet_name=sheet, index=False)


def write_excel_export(results: DataFrame, out_dir: str, basename: str = "export") -> dict:
    """S11 sink — multi-sheet Excel when openpyxl is installed, otherwise
    one CSV per sheet (same frames, same rows). Collecting to the driver is
    the correct shape here: exports are keyed small selections (the
    reference buffers the whole workbook in one BytesIO,
    src/export_manager.py:111), not corpus-scale scans — corpus-scale output
    goes through the parquet/JSON sinks.

    Returns {"format", "files": {sheet: path}}.
    """
    os.makedirs(out_dir, exist_ok=True)
    frames = {s: df.toPandas() for s, df in excel_sheet_frames(results).items()}
    if HAS_OPENPYXL:
        out_path = os.path.join(out_dir, f"{basename}.xlsx")
        _write_xlsx(frames, out_path)
        return {"format": "xlsx", "files": {s: out_path for s in frames}}
    files = {}
    for sheet, pdf in frames.items():
        path = os.path.join(out_dir, f"{basename}_{sheet.lower().replace(' ', '_')}.csv")
        pdf.to_csv(path, index=False)
        files[sheet] = path
    return {"format": "csv-fallback", "files": files}


def flatten_first_values(results: DataFrame) -> DataFrame:
    """S13 — first element of each pattern list (X17), '' when absent."""
    cols = [F.col("url")]
    for field in PATTERN_FIELDS:
        cols.append(
            F.coalesce(
                F.try_element_at(F.col("patterns").getItem(field), F.lit(1)),
                F.lit(""),
            ).alias(field)
        )
    return results.select(*cols)
