"""Spark ML classifier (M1-M7): train on synthetic bodies, eval accuracy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from llm_document_parser_spark.datagen import generate_pages
from llm_document_parser_spark.ml.classify import (
    evaluate,
    stratified_split,
    train_classifier,
    with_predicted_type,
)
from llm_document_parser_spark.operators.kind import document_type_col
from llm_document_parser_spark.operators.textclean import clean_text_col
from llm_document_parser_spark.operators.extract_udfs import payload_text_udf
from llm_document_parser_spark.operators.kind import doc_kind_col


@pytest.fixture(scope="module")
def training_df(spark):
    # labeled corpus from the deterministic generator: text + document_type
    pages = generate_pages(spark, 300, seed=21, partitions=4)
    df = pages.withColumn("doc_kind", doc_kind_col(F.col("html")))
    df = df.withColumn(
        "text", clean_text_col(payload_text_udf(F.col("html"), F.col("doc_kind")))
    )
    df = df.withColumn("document_type", document_type_col(F.col("text")))
    return df.select("text", "document_type").cache()


def test_train_eval_predict(training_df):
    train, test = stratified_split(training_df)
    assert train.count() + test.count() == 300
    model = train_classifier(train, num_trees=20)
    metrics = evaluate(model, test)
    # synthetic classes are keyword-separable; RF should be near-perfect
    assert metrics["accuracy"] >= 90.0, metrics
    scored = with_predicted_type(model, test)
    assert "predicted_type" in scored.columns
    types = {r["predicted_type"] for r in scored.select("predicted_type").collect()}
    assert types <= {"invoice", "receipt", "contract", "contact", "general"}


def test_model_roundtrip(training_df, tmp_path):
    train, _ = stratified_split(training_df)
    model = train_classifier(train, num_trees=5)
    path = str(tmp_path / "model")
    model.write().overwrite().save(path)
    from pyspark.ml import PipelineModel

    loaded = PipelineModel.load(path)
    a = with_predicted_type(model, train.limit(20)).select("predicted_type").collect()
    b = with_predicted_type(loaded, train.limit(20)).select("predicted_type").collect()
    assert a == b
