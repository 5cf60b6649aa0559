"""Broadcast-sklearn parity seam (ml/sklearn_parity.py) — the gated
exact-parity scoring path (reference: src/document_parser.py:669-707).
sklearn is absent in this sandbox, so the seam is driven with the
module's deterministic stand-in artifact: identical broadcast + Arrow
batching + transform→predict→inverse_transform plumbing, duck-typed
components."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from llm_document_parser_spark.ml import sklearn_parity as sp


def _docs(spark):
    rows = [
        ("d1", "INVOICE number 42 due upon receipt of goods"),
        ("d2", "Thank you for shopping, receipt total $5.99"),
        ("d3", "This agreement is entered into by both parties"),
        ("d4", "Call our phone line or email us anytime"),
        ("d5", "Nothing classifiable in this sentence at all"),
        ("d6", None),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_stub_artifact_scores_end_to_end(spark):
    """Correct end-to-end labels prove the seam ran all three stages in
    order: the encoder can only decode indices the classifier produced
    from the vectorizer's token output."""
    out = sp.with_sklearn_predicted_type(spark, _docs(spark), sp.make_stub_artifact())
    got = {r["doc_id"]: r["predicted_type"] for r in out.collect()}
    assert got == {
        "d1": "invoice",
        "d2": "receipt",
        "d3": "contract",
        "d4": "contact",
        "d5": "general",
        "d6": "general",  # null text → fillna('') → no keywords
    }


def test_single_arrow_stage_no_shuffle(spark):
    """The parity path must stay one ArrowEvalPython, zero exchanges —
    the same plan shape asserted for the extraction pipeline."""
    out = sp.with_sklearn_predicted_type(spark, _docs(spark), sp.make_stub_artifact())
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan


def test_artifact_roundtrip(spark, tmp_path):
    """save/load (pickle fallback here; joblib when installed) feeds the
    same scoring path — the load-at-driver, broadcast-once pattern."""
    path = str(tmp_path / "model.joblib")
    sp.save_artifact(sp.make_stub_artifact(), path)
    artifact = sp.load_artifact(path)
    out = sp.with_sklearn_predicted_type(
        spark, _docs(spark), artifact, out_col="ptype"
    )
    assert out.filter(F.col("ptype") == "invoice").count() == 1


def test_artifact_validation():
    with pytest.raises(ValueError, match="missing components"):
        sp.validate_artifact({"vectorizer": sp.StubVectorizer()})
    with pytest.raises(TypeError, match="must be a dict"):
        sp.validate_artifact(["not", "a", "dict"])
    bad = sp.make_stub_artifact()
    bad["classifier"] = object()  # no .predict
    with pytest.raises(ValueError, match="callable .predict"):
        sp.validate_artifact(bad)


def test_gate_reports_sandbox_truthfully():
    # this sandbox has no sklearn; the gate must not lie about it
    assert sp.sklearn_available() is False
