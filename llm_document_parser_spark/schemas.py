"""Explicit StructType schemas — schema-on-write everywhere.

The reference is schema-less (dynamic BSON docs accumulated in Mongo,
reference: src/api_server.py:2150-2193). This engine fixes the schemas up
front; the result-row shape is derived from the reference's persisted parse
result (reference: src/api_server.py:2162-2182, src/document_parser.py:795-805)
re-keyed by ``url`` per BASELINE.json input_hint.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Common-Crawl-style input table (BASELINE.json input_hint).
PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), nullable=False),
        StructField("warc_ts", TimestampType(), nullable=False),
        StructField("html", BinaryType(), nullable=True),
        StructField("text", StringType(), nullable=True),
        StructField("lang", StringType(), nullable=True),
    ]
)

# Fixed 7-key feature struct (reference: src/document_parser.py:742-750).
FEATURES_SCHEMA = StructType(
    [
        StructField("email_count", LongType()),
        StructField("phone_count", LongType()),
        StructField("currency_count", LongType()),
        StructField("date_count", LongType()),
        StructField("person_count", LongType()),
        StructField("org_count", LongType()),
        StructField("text_length", LongType()),
    ]
)

NAMES_SCHEMA = StructType(
    [
        StructField("candidate_names", ArrayType(StringType())),
        StructField("primary_name", StringType()),
    ]
)

# Canonical result row (SURVEY.md §1.3). patterns/contacts/entities carry
# doc-type-dependent keys, hence Map over Struct.
RESULTS_SCHEMA = StructType(
    [
        StructField("url", StringType(), nullable=False),
        StructField("warc_ts", TimestampType()),
        StructField("doc_kind", StringType()),
        StructField("document_type", StringType()),
        StructField("extracted_text", StringType()),
        StructField(
            "text_spans",
            ArrayType(
                StructType(
                    [
                        StructField("field", StringType()),
                        StructField("start", LongType()),
                        StructField("end", LongType()),
                    ]
                )
            ),
        ),
        StructField("patterns", MapType(StringType(), ArrayType(StringType()))),
        StructField("contacts", MapType(StringType(), ArrayType(StringType()))),
        StructField("names", NAMES_SCHEMA),
        StructField("entities", MapType(StringType(), ArrayType(StringType()))),
        StructField("features", FEATURES_SCHEMA),
        StructField("success", BooleanType()),
        StructField("error", StringType()),
        StructField("processing_time", TimestampType()),
    ]
)

# Per-partition lineage rows for idempotent resume (replaces the reference's
# Celery progress states, reference: src/celery_app.py:51-72, and the batch
# summary, reference: src/batch_processor.py:58-66).
LINEAGE_SCHEMA = StructType(
    [
        StructField("job_id", StringType(), nullable=False),
        StructField("bucket", LongType(), nullable=False),
        StructField("status", StringType()),  # completed | failed
        StructField("rows", LongType()),
        StructField("started_at", TimestampType()),
        StructField("finished_at", TimestampType()),
        StructField("attempt", LongType()),
    ]
)
