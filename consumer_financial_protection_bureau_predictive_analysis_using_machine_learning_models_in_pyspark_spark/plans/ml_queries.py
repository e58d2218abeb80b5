"""ML pipeline queries (SURVEY §2.9) — registered rows-only.

Model outputs are not ANSI-SQL-expressible (MLlib internals: L-BFGS, tree
split search, Gibbs/online LDA), so these entries have no DuckDB oracle; the
driver records row-count/schema stability instead, and value-level checks
live in tests/test_ml.py (metric ranges, schema invariants, seed fixing —
SURVEY §5's "ML pipeline smoke + invariant tests").

Each query's OUTPUT SHAPE is deterministic: metrics tables have a fixed row
set; confusion counts are bounded by |classes|²; topic tables are k×terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ml import nlp, pipelines as ML
from ..operators import encode, metrics as M, sampling
from .catalog import _cleaned, _t, register


# NOTE on training-frame partitioning: both tasks train on POST-SAMPLING
# frames (oversample to parity / rebalance to 8×target), which are small by
# construction at any corpus scale — so no repartition-to-cluster-width here.
# Interleaved A/B at sf0.1 confirms widening 2→{4,8,32} partitions changes
# end-to-end task time by < noise; the iterative-fit cost is MLlib driver
# rounds, not per-partition compute.


def _timely_training_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clean → date_parts → oversample minority (reference timely_LR.py
    prologue), cached post-sampling (the reference caches pre-balance)."""
    df = _cleaned(spark, sf_dir)
    df = encode.date_parts(df, "date_received")
    df = df.select("product", "issue", "state", "submitted_via", "timely",
                   "year", "month", "day")
    return sampling.oversample_binary(df, "timely", minority_value="No", seed=42)


def _response_training_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clean → frequency encode company+issue → rebalance to target
    (reference decision_tree_final_class_8.py prologue, single-pass)."""
    df = _cleaned(spark, sf_dir)
    df = encode.frequency_encode(df, "company")
    df = encode.frequency_encode(df, "issue")
    df = df.select("product", "company_response", "frequency_company",
                   "frequency_issue")
    return sampling.rebalance_to_target(df, "company_response", target=500, seed=42)


def _binary_task(spark: SparkSession, sf_dir: str, model: str) -> DataFrame:
    data = _timely_training_frame(spark, sf_dir).cache()
    train, test = sampling.train_test_split(data, seed=42)
    fitted = ML.timely_pipeline(model).fit(train)
    preds = fitted.transform(test)
    out = M.binary_metrics(preds).withColumn("model", F.lit(model))
    out = out.select("model", "metric", F.round("value", 6).alias("value"))
    data.unpersist()
    return out


@register("ml_timely_lr", None, "ml", "binary", "lr")
def ml_timely_lr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timely-response binary classification, LogisticRegression (reference
    timely_LR.py end-to-end, minus the 11 redundant count() jobs)."""
    return _binary_task(spark, sf_dir, "lr")


@register("ml_timely_svm", None, "ml", "binary", "svm")
def ml_timely_svm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timely-response binary classification, LinearSVC (reference
    timely_SVM.py — which cannot run as committed, SURVEY §2.12 syntax
    error; this is the working re-expression)."""
    return _binary_task(spark, sf_dir, "svm")


@register("ml_timely_gbt", None, "ml", "binary", "gbt")
def ml_timely_gbt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timely-response binary classification, GBTClassifier — the model the
    reference's README claims best (reference README.md:38) but ships no
    script for; same parameterized pipeline as LR/SVM."""
    return _binary_task(spark, sf_dir, "gbt")


@register("ml_response_dt", None, "ml", "multiclass", "dt")
def ml_response_dt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-class company-response task, DecisionTree (reference
    decision_tree_final_class_8.py): rebalance → fit → DataFrame-native
    confusion counts (no RDD MulticlassMetrics hop)."""
    data = _response_training_frame(spark, sf_dir).cache()
    train, test = sampling.train_test_split(data, seed=42)
    fitted = ML.response_pipeline("dt").fit(train)
    preds = fitted.transform(test)
    out = M.confusion_counts(preds).orderBy("label", "prediction")
    data.unpersist()
    return out


@register("ml_response_rf", None, "ml", "multiclass", "rf")
def ml_response_rf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-class task, RandomForest (reference random_forest_final_class_8.py)
    with per-class precision/recall computed distributed."""
    data = _response_training_frame(spark, sf_dir).cache()
    train, test = sampling.train_test_split(data, seed=42)
    fitted = ML.response_pipeline("rf").fit(train)
    preds = fitted.transform(test)
    out = M.per_class_metrics(preds)
    data.unpersist()
    return out


@register("ml_feature_importances", None, "ml", "introspection")
def ml_feature_importances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """featureImportances as a tidy DataFrame (reference
    decision_tree_final_class_8.py:291-307 does this via pandas)."""
    data = _response_training_frame(spark, sf_dir)
    fitted = ML.response_pipeline("dt").fit(data)
    return ML.feature_importances(
        fitted, ["product_index", "frequency_company", "frequency_issue"]
    )


@register("ml_lda_topics", None, "ml", "nlp", "lda")
def ml_lda_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic modeling on documents (reference complaints_narrative_LDA.py,
    k scaled to the corpus): native clean-text → CV/IDF → online LDA →
    (topic, term, weight) via join, no UDF/broadcast variable."""
    docs = _t(spark, sf_dir, "documents")
    featurized, vocab = nlp.nlp_features(docs, "text", vocab_size=200, min_df=1.0)
    topics, _doc_topics = nlp.lda_topics(
        spark, featurized, vocab, k=5, seed=123, optimizer="online",
        max_iter=10, terms_per_topic=8,
    )
    return topics.select("topic", "term", F.round("weight", 6).alias("weight"))
