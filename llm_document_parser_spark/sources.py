"""Training-data sources — S3/S4/S5 + the X13 text-synthesis templates and
X16 schema auto-detect (reference: src/document_parser.py:161-378).

The reference builds pseudo-document text from CSV rows with per-row
``iterrows`` loops (reference: src/document_parser.py:184-327); here each
template is a single ``concat_ws`` column expression — the three loops
become zero Python.

Directory sources use Spark's ``binaryFile`` format (S4/S5): the
reference's sequential ``Path.glob`` walk (reference:
src/training_pipeline.py:10-43) becomes a partitioned scan whose payloads
feed the same extraction UDFs as the pages pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.extract_udfs import payload_text_udf
from .operators.kind import doc_kind_col

# X16 — marker-column sets for schema sniffing (reference:
# src/document_parser.py:329-344)
_TYPE_MARKERS = {
    "invoice": {"first_name", "last_name", "email", "product_id", "qty", "amount"},
    "contract": {"tender_title", "buyer_name", "tender_value_amount", "tender_contracttype"},
    "receipt": {"store", "total", "payment_method"},
}


def detect_csv_document_type(columns: list[str]) -> str:
    cols = {c.lower() for c in columns}
    for doc_type, markers in _TYPE_MARKERS.items():
        if cols & markers:
            return doc_type
    return "general"


def _opt(df: DataFrame, name: str) -> Column:
    """Column value as string, '' when the column is absent or null —
    matching the reference templates' ``row.get(col, '')``."""
    if name in df.columns:
        return F.coalesce(F.col(name).cast("string"), F.lit(""))
    return F.lit("")


def invoice_text_col(df: DataFrame) -> Column:
    """X13 invoice template (reference: src/document_parser.py:218-240,
    whitespace-normalized: the engine cleans text afterwards anyway)."""
    return F.concat_ws(
        "\n",
        F.lit("INVOICE"),
        F.lit("Bill To:"),
        F.concat_ws(" ", _opt(df, "first_name"), _opt(df, "last_name")),
        _opt(df, "address"),
        _opt(df, "city"),
        F.concat(F.lit("Contact: "), _opt(df, "email")),
        F.concat(F.lit("Invoice Date: "), _opt(df, "invoice_date")),
        F.lit("Product Details:"),
        F.concat(F.lit("Product ID: "), _opt(df, "product_id")),
        F.concat(F.lit("Quantity: "), _opt(df, "qty")),
        F.concat(F.lit("Amount: "), _opt(df, "amount")),
        F.concat(F.lit("Stock Code: "), _opt(df, "stock_code")),
        F.concat(F.lit("Job: "), _opt(df, "job")),
    )


def contract_text_col(df: DataFrame) -> Column:
    """X13 contract template (reference: src/document_parser.py:277-298)."""
    return F.concat_ws(
        "\n",
        F.lit("CONTRACT AGREEMENT"),
        _opt(df, "tender_title"),
        F.lit("Parties:"),
        F.concat(F.lit("Buyer: "), _opt(df, "buyer_name")),
        F.concat(F.lit("Contract Type: "), _opt(df, "tender_contractType")),
        F.concat(F.lit("Contract Value: "), _opt(df, "tender_value_amount")),
        F.concat(F.lit("Date Published: "), _opt(df, "tender_datePublished")),
        F.concat(F.lit("Description: "), _opt(df, "tender_description")),
    )


def generic_text_col(df: DataFrame, doc_type: str) -> Column:
    """X13 generic 'col: val | ...' template (reference:
    src/document_parser.py:307-318) via concat_ws — no iterrows."""
    parts = [
        F.when(
            F.col(c).isNotNull(), F.concat(F.lit(f"{c}: "), F.col(c).cast("string"))
        )
        for c in df.columns
    ]
    return F.concat_ws(
        "\n",
        F.lit("DOCUMENT"),
        F.lit(doc_type.upper()),
        F.lit("Details:"),
        F.concat_ws(" | ", *parts),
    )


def load_training_csv(
    spark: SparkSession, path: str, document_type: str | None = None
) -> DataFrame:
    """S3 — CSV → (text, document_type) training rows.

    Pass-through when the CSV already has text/document_type columns
    (reference: src/document_parser.py:167-171, including the non-empty-text
    filter F1); otherwise synthesize text via the doc-type template, with
    X16 auto-detect when no type is given.
    """
    df = spark.read.csv(path, header=True, inferSchema=True)
    if "text" in df.columns and "document_type" in df.columns:
        return df.filter(
            F.col("text").isNotNull() & (F.length("text") > 0)
        ).select("text", "document_type")
    if document_type is None:
        document_type = detect_csv_document_type(df.columns)
    if document_type == "invoice":
        text = invoice_text_col(df)
    elif document_type == "contract":
        text = contract_text_col(df)
    else:
        text = generic_text_col(df, document_type)
    return df.select(
        text.alias("text"), F.lit(document_type).alias("document_type")
    )


def load_document_dir(
    spark: SparkSession, path: str, glob: str = "*.pdf", document_type: str | None = None,
    min_text_len: int = 50,
) -> DataFrame:
    """S4/S5 — binaryFile directory scan → extracted (text, document_type,
    source_file), keeping text longer than ``min_text_len`` (reference F2:
    src/training_pipeline.py:36)."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(F.col("path").alias("source_file"), F.col("content"))
    )
    kind = doc_kind_col(F.col("content"))
    text = payload_text_udf(F.col("content"), kind)
    out = raw.select(
        text.alias("text"),
        F.lit(document_type).alias("document_type"),
        "source_file",
    )
    return out.filter(F.length("text") > min_text_len)
