"""Model-based corpus quality filtering (fastText/DSIR-style).

The curation stack's heuristic gates (``operators.pipeline.filter_chain``,
the C4/Gopher rule family) are cheap but brittle; production pipelines
(CCNet, GPT-3's WebText filter, DSIR) train a lightweight linear
classifier on weak labels and score the WHOLE corpus with it, filtering
on the model score.  This module composes the two halves the repo already
has — hashed term featurization and MLlib LogisticRegression (the same
featurize→LR→evaluate shape as the reference's timely_LR.py:71-106,
applied to corpus docs instead of complaint rows) — into that pipeline.

Scale posture (100 TB):

- **Weak labels and features come out of ONE corpus scan.**
  ``filter_chain_cols`` attaches the heuristic verdict as a column
  alongside the token array in the same projection — no verdict-frame
  self-join back against the text.
- **The training set is BOUNDED, the scoring set is not.**  A global
  deterministic md5 top-k (TakeOrdered — never a full sort) draws
  ``train_n`` docs; at any corpus size the fit sees a fixed-size frame
  (the fastText-classifier regime: ~10⁵ labeled docs train a filter for
  10¹⁰).  Scoring is ``model.transform`` over the full corpus — HashingTF
  and the LR dot product are narrow, shuffle-free, one pass.
- **Reproducible fit.** The bounded training frame is canonicalized
  (coalesce(1) + sortWithinPartitions) before the fit so L-BFGS sees a
  stable aggregation order; the md5 draw is engine-stable.  Golden pins:
  tests/test_round10.py.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import HashingTF
from pyspark.ml.functions import vector_to_array
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import textfns as TF
from ..operators.pipeline import filter_chain_cols

#: model_keep threshold in 1e-6 micro-units of P(keep): 0.5.
DEFAULT_THRESHOLD_U = 500_000


def weak_label_frame(
    docs: DataFrame,
    rules: list[tuple[str, Column]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, terms, label) in one projection over the corpus scan: the
    token array feeds HashingTF, the heuristic chain verdict (fail-closed
    null semantics, identical to ``filter_chain``) is the weak label."""
    keep, _reason = filter_chain_cols(rules)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        TF.tokens(text_col).alias("terms"),
        keep.cast("double").alias("label"),
    )


def fit_quality_model(
    base: DataFrame,
    num_features: int = 1024,
    train_n: int = 400,
    max_iter: int = 25,
    reg_param: float = 0.01,
) -> PipelineModel:
    """Fit HashingTF(num_features) → LogisticRegression on a bounded
    deterministic sample of the weak-label frame.

    The draw is the md5 top-``train_n`` by id — engine-stable, order-free
    (TakeOrdered: no global sort materializes), and independent of the
    heuristic verdict, so the training class mix matches the corpus keep
    rate.  The bounded frame is canonicalized before the fit (shuffle
    fetch order is nondeterministic; L-BFGS partial sums are not
    permutation-invariant in floats)."""
    train = (
        base.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .limit(int(train_n))
        .coalesce(1)
        .sortWithinPartitions("doc_id")
        .cache()
    )
    htf = HashingTF(
        inputCol="terms", outputCol="features", numFeatures=int(num_features)
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        maxIter=int(max_iter),
        regParam=float(reg_param),
    )
    model = Pipeline(stages=[htf, lr]).fit(train)
    train.unpersist()
    return model


def score_corpus(
    base: DataFrame,
    model: PipelineModel,
    threshold_u: int = DEFAULT_THRESHOLD_U,
) -> DataFrame:
    """Score EVERY doc with the trained filter: (doc_id, heuristic_keep,
    model_score_u, model_keep, agree).  ``model_score_u`` is P(keep) in
    half-up 1e-6 micro-units (the repo's exact-integer score surface);
    ``model_keep`` thresholds it.  transform() is narrow — the corpus is
    read once and never shuffled."""
    scored = model.transform(base)
    p_keep = F.element_at(vector_to_array(F.col("probability")), 2)
    score_u = F.floor(p_keep * F.lit(1_000_000.0) + F.lit(0.5)).cast("bigint")
    out = scored.select(
        "doc_id",
        (F.col("label") > 0.5).alias("heuristic_keep"),
        score_u.alias("model_score_u"),
        (score_u >= F.lit(int(threshold_u))).alias("model_keep"),
    )
    return out.withColumn(
        "agree", F.col("heuristic_keep") == F.col("model_keep")
    )


def agreement_summary(scores: DataFrame) -> DataFrame:
    """2×2 confusion of model vs heuristic verdicts with mean model score
    per cell — the evaluation table a curation run publishes before
    swapping the heuristic gate for the model gate.  Bounded output
    (≤4 rows); one partial-agg shuffle."""
    return (
        scores.groupBy("heuristic_keep", "model_keep")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.floor(F.avg("model_score_u") + F.lit(0.5))
            .cast("bigint")
            .alias("avg_score_u"),
        )
        .orderBy("heuristic_keep", "model_keep")
    )
