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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
