"""Document-type classifier — Spark ML restatement of the reference's
TF-IDF + RandomForest stack (reference: src/document_parser.py:36-46,611-681).

Mapping (SURVEY.md §2.9):
  M1 TfidfVectorizer(max_features=1000, ngram_range=(1,2))
       → RegexTokenizer + unigram∪bigram NGram + CountVectorizer(1000) + IDF
  M2 LabelEncoder            → StringIndexer / IndexToString
  M3 RandomForest(100, seed=42) → ml.RandomForestClassifier(numTrees=100, seed=42)
     fallback LogisticRegression on failure (reference: :655-662)
  M4 stratified 80/20 split  → per-class sampleBy(fractions, seed=42)
  M5 classification_report   → MulticlassClassificationEvaluator + confusion crosstab
  M6 predict                 → PipelineModel.transform (batch-scored)
  M7 synthetic training data → datagen bodies (spark.range, no driver loops)

Unlike the reference — which re-instantiates the model per Celery task
(reference: src/celery_app.py:88) — a fitted PipelineModel is a distributed
artifact: load once, transform any number of partitions.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression, RandomForestClassifier
from pyspark.ml.evaluation import MulticlassClassificationEvaluator
from pyspark.ml.feature import (
    IDF,
    CountVectorizer,
    IndexToString,
    NGram,
    RegexTokenizer,
    SQLTransformer,
    StringIndexer,
)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEED = 42
VOCAB_SIZE = 1000
NUM_TREES = 100


def build_pipeline(num_trees: int = NUM_TREES, vocab_size: int = VOCAB_SIZE) -> Pipeline:
    tokenizer = RegexTokenizer(
        inputCol="text", outputCol="words", pattern=r"\W+", minTokenLength=1
    )
    bigrams = NGram(n=2, inputCol="words", outputCol="bigrams")
    combine = SQLTransformer(
        statement="SELECT *, concat(words, bigrams) AS grams FROM __THIS__"
    )
    cv = CountVectorizer(inputCol="grams", outputCol="tf", vocabSize=vocab_size)
    idf = IDF(inputCol="tf", outputCol="features")
    label = StringIndexer(
        inputCol="document_type", outputCol="label", handleInvalid="keep"
    )
    rf = RandomForestClassifier(
        numTrees=num_trees, seed=SEED, labelCol="label", featuresCol="features"
    )
    return Pipeline(stages=[tokenizer, bigrams, combine, cv, idf, label, rf])


def stratified_split(
    df: DataFrame, label_col: str = "document_type", test_frac: float = 0.2, seed: int = SEED
) -> tuple[DataFrame, DataFrame]:
    """M4 — per-class deterministic split without a driver-side loop over rows
    (classes are few; fractions dict is tiny)."""
    classes = [r[0] for r in df.select(label_col).distinct().collect()]
    fractions = {c: 1.0 - test_frac for c in classes}
    train = df.stat.sampleBy(label_col, fractions, seed)
    test = df.join(train, df.columns, "left_anti")
    return train, test


def train_classifier(train_df: DataFrame, num_trees: int = NUM_TREES) -> PipelineModel:
    """M3 — fit; on RandomForest failure fall back to LogisticRegression,
    mirroring the reference's degradation path."""
    pipe = build_pipeline(num_trees)
    try:
        return pipe.fit(train_df)
    except Exception:
        stages = pipe.getStages()[:-1] + [
            LogisticRegression(labelCol="label", featuresCol="features")
        ]
        return Pipeline(stages=stages).fit(train_df)


def with_predicted_type(model: PipelineModel, df: DataFrame) -> DataFrame:
    """M6 — batch scoring; adds ``predicted_type`` (decoded label string)."""
    labels = None
    for stage in model.stages:
        if hasattr(stage, "labelsArray"):
            labels = stage.labelsArray[0]
    scored = model.transform(df)
    decoder = IndexToString(
        inputCol="prediction", outputCol="predicted_type", labels=list(labels)
    )
    return decoder.transform(scored).drop(
        "words", "bigrams", "grams", "tf", "features", "rawPrediction", "probability"
    )


def evaluate(model: PipelineModel, test_df: DataFrame) -> dict:
    """M5/A5 — accuracy + confusion counts (reference: evaluate_model,
    src/document_parser.py:815-857)."""
    scored = with_predicted_type(model, test_df)
    evaluator = MulticlassClassificationEvaluator(
        labelCol="label", predictionCol="prediction", metricName="accuracy"
    )
    accuracy = evaluator.evaluate(model.transform(test_df))
    confusion = (
        scored.groupBy("document_type", "predicted_type")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    return {
        "accuracy": round(accuracy * 100, 2),
        "confusion": {
            f"{r['document_type']}_{r['predicted_type']}": r["n"] for r in confusion
        },
    }
