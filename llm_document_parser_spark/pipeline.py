"""End-to-end extraction pipeline: pages DataFrame → results DataFrame.

The Spark restatement of the reference's ``parse_document`` (reference:
src/document_parser.py:752-813) — one declarative plan instead of a per-file
driver loop (reference: src/batch_processor.py:13-69):

  pages
    → doc_kind (native magic-bytes)                       [kind.py]
    → repartition by xxhash64(url) (+optional salt)       [skew balance]
    → payload_text_udf (Arrow pandas UDF: PDF/HTML/text)  [extract_udfs.py]
    → clean_text (native chain, X2)                       [textclean.py]
    → document_type (heuristic rules or broadcast model)  [kind.py / ml/]
    → patterns/contacts/names/entities/features (native)  [operators/*]
    → text_spans (native, from patterns)
    → results schema

Everything after the single pandas UDF is whole-stage-codegen'd JVM work; the
reference's 4× spaCy re-parse per document (reference:
src/document_parser.py:422,444,525,738) collapses into shared native
subexpressions here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .operators.contacts import contacts_map
from .operators.extract_udfs import payload_text_udf
from .operators.features import features_struct
from .operators.kind import doc_kind_col, document_type_col
from .operators.names import holder_names_struct
from .operators import ner
from .operators.ner import entities_map, spacy_entities_stage
from .operators.patterns import patterns_map
from .operators.textclean import clean_text_col

RESULT_COLUMNS = [
    "url",
    "warc_ts",
    "doc_kind",
    "document_type",
    "extracted_text",
    "text_spans",
    "patterns",
    "contacts",
    "names",
    "entities",
    "features",
    "success",
    "error",
    "processing_time",
]


def text_spans_col(text: Column, patterns: Column) -> Column:
    """ARRAY<STRUCT<field,start,end>> — first-occurrence character span of
    each extracted pattern field's first value in the extracted text
    (0-based, end exclusive). Fields whose value doesn't occur verbatim are
    dropped."""
    # two-level transform so the O(text) instr scan runs ONCE per field:
    # HOF lambdas get no subexpression elimination, so a single-level
    # struct(start, end) would re-scan the text for the end position
    located = F.transform(
        F.map_entries(patterns),
        lambda e: F.struct(
            e["key"].alias("field"),
            (F.instr(text, F.try_element_at(e["value"], F.lit(1))) - 1)
            .cast("long")
            .alias("start"),
            F.length(F.try_element_at(e["value"], F.lit(1)))
            .cast("long")
            .alias("vlen"),
        ),
    )
    spans = F.transform(
        located,
        lambda s: F.struct(
            s["field"].alias("field"),
            s["start"].alias("start"),
            (s["start"] + s["vlen"]).alias("end"),
        ),
    )
    return F.filter(spans, lambda s: s["start"] >= 0)


def extract_pipeline(
    pages: DataFrame,
    repartition_to: int | None = None,
    doc_type_col_fn=document_type_col,
    use_spacy_ner: bool | None = None,
    nlp_factory=None,
) -> DataFrame:
    """Build the full extraction plan over a pages DataFrame.

    ``repartition_to``: explicit pre-UDF repartition width. At cluster scale
    this is set to ~2-3× total cores; pass None to keep scan partitioning
    (AQE still balances downstream shuffles). The repartition key is
    ``xxhash64(url)`` so hot hosts (zipfian skew) spread uniformly — the
    moral equivalent of salting the host key (SURVEY.md §4.2 item 2).

    ``use_spacy_ner``: None = auto (real spaCy NER when the library AND its
    model package are both installed — ``ner.spacy_model_available`` — rule-
    NER otherwise; a bare ``import spacy`` success without the model would
    otherwise OSError on every executor). The spaCy path adds a second Python
    stage AFTER the final projection — it sees only result columns, never
    the binary payload. Pattern backfill and feature person/org counts stay
    rule-based either way (they're part of the native codegen span).
    ``nlp_factory`` (executor-side model loader) implies the spaCy path and
    is how tests drive the seam without the library.
    """
    if use_spacy_ner is None:
        use_spacy_ner = nlp_factory is not None or ner.spacy_model_available()
    df = pages.withColumn("doc_kind", doc_kind_col(F.col("html")))
    if repartition_to:
        df = df.repartition(repartition_to, F.xxhash64("url"))

    df = df.withColumn("raw_text", payload_text_udf(F.col("html"), F.col("doc_kind")))
    df = df.withColumn("extracted_text", clean_text_col(F.col("raw_text")))

    text = F.col("extracted_text")
    df = df.withColumn("document_type", doc_type_col_fn(text))
    df = df.withColumn("patterns", patterns_map(text, F.col("document_type")))
    df = (
        df.withColumn("contacts", contacts_map(text))
        .withColumn("names", holder_names_struct(text))
        .withColumn("features", features_struct(text))
        .withColumn("text_spans", text_spans_col(text, F.col("patterns")))
        .withColumn("success", F.length(text) > 0)
        .withColumn(
            "error",
            F.when(
                F.length(text) == 0,
                F.lit("No text could be extracted from the document"),
            ),
        )
        .withColumn("processing_time", F.current_timestamp())
    )
    if use_spacy_ner:
        df = df.select([c for c in RESULT_COLUMNS if c != "entities"])
        df = spacy_entities_stage(
            df, text_col="extracted_text", out_col="entities", nlp_factory=nlp_factory
        )
    else:
        df = df.withColumn("entities", entities_map(text))
    return df.select(*RESULT_COLUMNS)
