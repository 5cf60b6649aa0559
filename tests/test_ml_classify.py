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


def test_classification_report_math(spark):
    """Pin the P/R/F1 math on a hand-computable confusion."""
    from llm_document_parser_spark.ml.classify import classification_report

    # truth:  a a a a b b c
    # pred:   a a b a b a c
    rows = [("a", "a"), ("a", "a"), ("a", "b"), ("a", "a"), ("b", "b"), ("b", "a"), ("c", "c")]
    df = spark.createDataFrame(rows, "document_type string, predicted_type string")
    rep = classification_report(df)
    # a: tp=3, pred a=4, true a=4 -> p=0.75 r=0.75 f1=0.75
    assert rep["a"] == {"precision": 0.75, "recall": 0.75, "f1": 0.75, "support": 4}
    # b: tp=1, pred b=2, true b=2 -> p=0.5 r=0.5 f1=0.5
    assert rep["b"] == {"precision": 0.5, "recall": 0.5, "f1": 0.5, "support": 2}
    assert rep["c"] == {"precision": 1.0, "recall": 1.0, "f1": 1.0, "support": 1}
    assert rep["accuracy"] == round(5 / 7, 4)
    assert rep["macro avg"]["precision"] == 0.75
    assert rep["macro avg"]["support"] == 7
    # weighted: (0.75*4 + 0.5*2 + 1*1)/7
    assert rep["weighted avg"]["f1"] == round((0.75 * 4 + 0.5 * 2 + 1.0) / 7, 4)


def test_golden_label_eval(spark, training_df):
    """The reference's golden-set harness shape: ~80 docs with deliberate
    cross-labels cap accuracy strictly below 100 (the reference measures 85%
    on its own set); per-class metrics must reflect the planted confusion."""
    from llm_document_parser_spark.ml.classify import (
        CROSS_EVERY,
        golden_eval,
        golden_label_set,
        train_classifier,
    )

    golden = golden_label_set(spark, n=80, seed=7)
    n_cross = golden.filter("cross_labeled").count()
    assert n_cross == 80 // CROSS_EVERY

    train, _ = stratified_split(training_df)
    model = train_classifier(train, num_trees=20)
    metrics = golden_eval(model, golden)
    assert metrics["total_documents"] == 80
    # a good classifier gets everything except (at most) the cross-labels;
    # the cross-labels are unreachable by construction
    assert metrics["accuracy"] <= 100.0 * (80 - n_cross) / 80
    assert metrics["accuracy"] >= 80.0, metrics
    rep = metrics["report"]
    for cls in ("invoice", "receipt", "contract", "contact"):
        assert cls in rep and rep[cls]["support"] > 0
    assert 0 < rep["accuracy"] <= (80 - n_cross) / 80


def test_training_history_table(spark, training_df, tmp_path):
    """M8 — train runs append durable history rows, readable latest-first."""
    from llm_document_parser_spark.ml.classify import (
        record_training_run,
        training_history,
    )

    train, test = stratified_split(training_df)
    model = train_classifier(train, num_trees=5)
    metrics = evaluate(model, test)
    hist = str(tmp_path / "training_history")
    record_training_run(spark, hist, "m1", train.count(), metrics)
    record_training_run(spark, hist, "m2", train.count(), metrics, model_path="/models/m2")

    rows = training_history(spark, hist).collect()
    assert [r["model_id"] for r in rows] == ["m2", "m1"]
    assert rows[0]["model_path"] == "/models/m2"
    assert rows[0]["accuracy"] == metrics["accuracy"]
    assert rows[0]["n_samples"] > 0
    assert isinstance(rows[0]["confusion"], dict) and rows[0]["confusion"]
