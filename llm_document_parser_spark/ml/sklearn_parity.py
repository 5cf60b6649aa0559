"""Exact-parity document-type scoring with a broadcast sklearn artifact.

The Spark ML pipeline in ``ml/classify.py`` re-expresses the reference's
TF-IDF + RandomForest stack, but its scores are not bit-identical to a
reference-trained model. When exact parity with a reference artifact is
required (reference saves {vectorizer, classifier, label_encoder} with
joblib — src/document_parser.py:683-707 — and scores via
``vectorizer.transform → classifier.predict →
label_encoder.inverse_transform``, src/document_parser.py:669-681), the
right Spark shape is: broadcast the unpickled artifact ONCE, then run the
reference's own objects inside a single Arrow-batched pandas UDF — the
model computes identical outputs because it IS the reference model.

Gating follows the repo's seam pattern (spaCy/pdfplumber/Pillow/
pytesseract/openpyxl): sklearn is not installable in this sandbox, so
``sklearn_available()`` gates the real path and a deterministic stand-in
artifact (importable from this module, so executors can unpickle it)
drives the plumbing in tests. The artifact contract is duck-typed —
anything with the three methods above works — which is exactly what makes
the fake-driven seam test meaningful: the broadcast, batching, and
call-pattern plumbing is identical for the real artifact.

At 10^12 rows: one broadcast (artifact is MBs), one ArrowEvalPython stage,
no shuffle — the same plan shape as the extraction pipeline's UDF stage.
"""

from __future__ import annotations

import pickle

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

REQUIRED_KEYS = ("vectorizer", "classifier", "label_encoder")


def sklearn_available() -> bool:
    try:
        import sklearn  # noqa: F401

        return True
    except ImportError:
        return False


def validate_artifact(artifact: dict) -> dict:
    """Duck-typed contract check (fail fast on the driver, not per-batch
    on executors): the three components and their scoring methods."""
    if not isinstance(artifact, dict):
        raise TypeError(f"artifact must be a dict, got {type(artifact).__name__}")
    missing = [k for k in REQUIRED_KEYS if k not in artifact]
    if missing:
        raise ValueError(f"artifact missing components: {missing}")
    for key, method in (
        ("vectorizer", "transform"),
        ("classifier", "predict"),
        ("label_encoder", "inverse_transform"),
    ):
        if not callable(getattr(artifact[key], method, None)):
            raise ValueError(f"artifact['{key}'] has no callable .{method}()")
    return artifact


def save_artifact(artifact: dict, path: str) -> None:
    """Persist with joblib when present (the reference's format —
    src/document_parser.py:700), else plain pickle."""
    validate_artifact(artifact)
    try:
        import joblib

        joblib.dump(artifact, path)
    except ImportError:
        with open(path, "wb") as f:
            pickle.dump(artifact, f)


def load_artifact(path: str) -> dict:
    """Load a reference model artifact. joblib first (its format is a
    superset of pickle streams), pickle fallback for joblib-less hosts."""
    try:
        import joblib

        return validate_artifact(joblib.load(path))
    except ImportError:
        with open(path, "rb") as f:
            return validate_artifact(pickle.load(f))


def with_sklearn_predicted_type(
    spark: SparkSession,
    df: DataFrame,
    artifact: dict,
    text_col: str = "text",
    out_col: str = "predicted_type",
) -> DataFrame:
    """Score ``df[text_col]`` with the broadcast artifact, bit-identical to
    the reference's ``predict_document_type`` (src/document_parser.py:
    669-681) because the reference's own fitted objects do the scoring.
    One broadcast + one Arrow-batched UDF; no shuffle."""
    validate_artifact(artifact)
    bc = spark.sparkContext.broadcast(artifact)

    @pandas_udf("string")
    def _score(texts: pd.Series) -> pd.Series:
        a = bc.value
        features = a["vectorizer"].transform(texts.fillna("").tolist())
        pred = a["classifier"].predict(features)
        return pd.Series(list(a["label_encoder"].inverse_transform(pred)))

    return df.withColumn(out_col, _score(F.col(text_col)))


# ---------------------------------------------------------------------------
# deterministic stand-in artifact (seam tests / sklearn-less hosts)
# ---------------------------------------------------------------------------

_STUB_LABELS = ("contact", "contract", "general", "invoice", "receipt")
_STUB_KEYWORDS = {
    "invoice": 3,
    "receipt": 4,
    "agreement": 1,
    "contract": 1,
    "phone": 0,
    "email": 0,
}


class StubVectorizer:
    """Stands in for TfidfVectorizer.transform: lowercased token lists.
    Deterministic, dependency-free, picklable from this module."""

    def transform(self, texts):
        return [str(t).lower().split() for t in texts]


class StubClassifier:
    """Stands in for RandomForest.predict: first matching keyword wins,
    'general' otherwise — label INDICES, as a real classifier emits."""

    def predict(self, features):
        out = []
        for tokens in features:
            idx = _STUB_LABELS.index("general")
            for tok in tokens:
                hit = _STUB_KEYWORDS.get(tok.strip(".,:;"))
                if hit is not None:
                    idx = hit
                    break
            out.append(idx)
        return out


class StubLabelEncoder:
    """Stands in for LabelEncoder.inverse_transform: index → label."""

    def inverse_transform(self, indices):
        return [_STUB_LABELS[i] for i in indices]


def make_stub_artifact() -> dict:
    """A deterministic artifact exercising the exact transform → predict →
    inverse_transform call pattern; the correct end-to-end labels prove
    all three stages ran in order (the encoder only maps indices the
    classifier produced from the vectorizer's output)."""
    return {
        "vectorizer": StubVectorizer(),
        "classifier": StubClassifier(),
        "label_encoder": StubLabelEncoder(),
    }
