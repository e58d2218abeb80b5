"""Fixture-scale golden quality metrics for the ML parity pipelines
(VERDICT r2 item 3).

The reference's published numbers are model-quality metrics on the 4.9 GB
CFPB corpus (reference README.md:59-61; hard-coded confusion matrices in
desicion_tree_confusion_matrix.py:16-31).  That corpus is not in the
sandbox, so exact reproduction is impossible — these pins are the
executable stand-in: fixed-seed fits of the same pipelines on the sf0.001
driver fixture, with the resulting AUC/accuracy/per-class-recall committed
and asserted.  A silent ML-pipeline behavior change (an indexer-order
slip, a stage reorder, a default-param drift) now fails loudly instead of
passing row-count checks.

Values were computed with the tests' own session config (shuffle
partitions 8, seeds 42 throughout) and are deterministic: MLlib's LR
(L-BFGS), GBT, DT and RF are deterministic for a fixed seed and fixed
input partitioning, and the sampling/split operators are seeded.  The
perturbation tests prove the pins have teeth: flipping the label-indexer
order or the feature-indexer order moves the metrics far outside
tolerance.
"""

from __future__ import annotations

import pytest
from pyspark.ml import Pipeline
from pyspark.ml.feature import StringIndexer

from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.ml import (  # noqa: E501
    pipelines as ML,
)
from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators import (  # noqa: E501
    metrics as M,
    sampling,
)
TOL = 1e-3  # metrics are deterministic; tolerance only absorbs float noise

# Golden values: sf0.001 fixture, seed 42 sampling/split, session with
# shuffle.partitions=8 (tests/conftest.py).  Counts are exact.
GOLDEN_BINARY = {
    "lr": {
        "accuracy": 0.561983,
        "precision": 0.589041,
        "recall": 0.361345,
        "f1": 0.447917,
        "tp": 43.0,
        "fp": 30.0,
        "tn": 93.0,
        "fn": 76.0,
    },
    "gbt": {
        "accuracy": 0.541322,
        "precision": 0.541667,
        "recall": 0.436975,
        "f1": 0.483721,
        "tp": 52.0,
        "fp": 44.0,
        "tn": 79.0,
        "fn": 67.0,
    },
}

# label -> (recall, precision, support); support exact
GOLDEN_MULTICLASS = {
    "dt": {
        0.0: (0.161972, 0.182540, 142),
        1.0: (0.093023, 0.279070, 129),
        2.0: (0.288732, 0.344538, 142),
        3.0: (0.609375, 0.349776, 128),
        4.0: (0.222222, 0.183784, 153),
        5.0: (0.027972, 0.153846, 143),
        6.0: (0.750000, 0.240602, 128),
        7.0: (0.006329, 0.500000, 158),
    },
    "rf": {
        0.0: (0.077465, 0.144737, 142),
        1.0: (0.147287, 0.220930, 129),
        2.0: (0.345070, 0.388889, 142),
        3.0: (0.726562, 0.402597, 128),
        4.0: (0.359477, 0.257009, 153),
        5.0: (0.174825, 0.396825, 143),
        6.0: (0.734375, 0.400000, 128),
        7.0: (0.234177, 0.402174, 158),
    },
}
GOLDEN_MULTICLASS_ACC = {"dt": 0.257346, "rf": 0.341051}


def _canonical(df):
    """One sorted partition = fully canonical layout.  Shuffle-block fetch
    order is nondeterministic, so both rows-within-partition order AND the
    outcome of every order-sensitive seeded op downstream (sample /
    sampleBy / RF bootstrap) vary run-to-run on raw shuffle output;
    randomSplit is the only one that sorts internally.  Collapsing to one
    partition and sorting by all columns before ANY sampling makes the
    whole fit chain reproducible.  Test-only: fixture frames are a few
    thousand rows (the engine's operators stay distributed)."""
    return df.coalesce(1).sortWithinPartitions(*df.columns)


def _binary_metrics(spark, sf_dir, pipeline: Pipeline) -> dict[str, float]:
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators import (  # noqa: E501
        encode,
    )
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.plans.catalog import (  # noqa: E501
        _cleaned,
    )

    df = encode.date_parts(_cleaned(spark, sf_dir), "date_received")
    df = df.select(
        "product", "issue", "state", "submitted_via", "timely",
        "year", "month", "day",
    )
    data = sampling.oversample_binary(
        _canonical(df), "timely", minority_value="No", seed=42
    ).cache()
    train, test = sampling.train_test_split(_canonical(data), seed=42)
    preds = pipeline.fit(_canonical(train)).transform(test)
    vals = {r["metric"]: r["value"] for r in M.binary_metrics(preds).collect()}
    data.unpersist()
    return vals


def _multiclass_rows(spark, sf_dir, pipeline: Pipeline):
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators import (  # noqa: E501
        encode,
    )
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.plans.catalog import (  # noqa: E501
        _cleaned,
    )

    df = _cleaned(spark, sf_dir)
    df = encode.frequency_encode(df, "company")
    df = encode.frequency_encode(df, "issue")
    df = df.select(
        "product", "company_response", "frequency_company", "frequency_issue"
    )
    data = sampling.rebalance_to_target(
        _canonical(df), "company_response", target=500, seed=42
    ).cache()
    train, test = sampling.train_test_split(_canonical(data), seed=42)
    preds = pipeline.fit(_canonical(train)).transform(test)
    rows = {
        r["label"]: (r["recall"], r["precision"], int(r["n_label"]))
        for r in M.per_class_metrics(preds).collect()
    }
    acc = preds.filter("label = prediction").count() / preds.count()
    data.unpersist()
    return rows, acc


@pytest.mark.parametrize("model", ["lr", "gbt"])
def test_golden_binary_metrics(spark, sf_dir, model):
    got = _binary_metrics(spark, sf_dir, ML.timely_pipeline(model))
    want = GOLDEN_BINARY[model]
    for k, v in want.items():
        if k in ("tp", "fp", "tn", "fn"):
            assert got[k] == v, (model, k, got[k], v)
        else:
            assert abs(got[k] - v) <= TOL, (model, k, got[k], v)


@pytest.mark.parametrize("model", ["dt", "rf"])
def test_golden_multiclass_per_class_recall(spark, sf_dir, model):
    rows, acc = _multiclass_rows(spark, sf_dir, ML.response_pipeline(model))
    want = GOLDEN_MULTICLASS[model]
    assert set(rows) == set(want), (model, sorted(rows), sorted(want))
    for label, (g_rec, g_prec, g_sup) in want.items():
        rec, prec, sup = rows[label]
        assert sup == g_sup, (model, label, sup, g_sup)
        assert abs(rec - g_rec) <= TOL, (model, label, rec, g_rec)
        assert abs(prec - g_prec) <= TOL, (model, label, prec, g_prec)
    assert abs(acc - GOLDEN_MULTICLASS_ACC[model]) <= TOL


def test_golden_pins_catch_label_indexer_slip(spark, sf_dir):
    """A deliberate indexer-order perturbation (label indexer flipped to
    frequencyAsc) must move the binary metrics far outside tolerance —
    the slip class these pins exist to catch."""
    pipe = ML.timely_pipeline("lr")
    stages = pipe.getStages()
    stages[1] = StringIndexer(
        inputCol="timely",
        outputCol="label",
        handleInvalid="skip",
        stringOrderType="frequencyAsc",  # the slip
    )
    got = _binary_metrics(spark, sf_dir, Pipeline(stages=stages))
    diffs = [
        abs(got[k] - GOLDEN_BINARY["lr"][k])
        for k in ("accuracy", "precision", "recall", "f1")
    ]
    assert max(diffs) > 0.05, diffs


def test_golden_pins_catch_multiclass_label_slip(spark, sf_dir):
    """The reference's actual defect class: decision_tree_final_class_8.py
    :360-369 maps class index i to narrative-order class i+1, but
    StringIndexer orders by descending frequency — a label-order slip that
    silently permutes which class each index means.  Perturbing the label
    indexer to alphabetAsc reproduces that slip; the per-class recall pins
    must move far outside tolerance."""
    pipe = ML.response_pipeline("dt")
    stages = pipe.getStages()
    stages[1] = StringIndexer(
        inputCol="company_response",
        outputCol="label",
        handleInvalid="skip",
        stringOrderType="alphabetAsc",  # the slip
    )
    rows, _acc = _multiclass_rows(spark, sf_dir, Pipeline(stages=stages))
    diffs = [
        abs(rows[label][0] - want[0])
        for label, want in GOLDEN_MULTICLASS["dt"].items()
    ]
    assert max(diffs) > 0.05, diffs


# --- round-4 pins: SVM + LDA (VERDICT r3 item 6) -------------------------

GOLDEN_BINARY["svm"] = {
    "accuracy": 0.545455,
    "precision": 0.714286,
    "recall": 0.126050,
    "f1": 0.214286,
    "tp": 15.0,
    "fp": 6.0,
    "tn": 117.0,
    "fn": 104.0,
}

# topic -> top-3 terms by (weight desc, term) under seed 123, optimizer=em,
# k=25, max_iter=10, vocab_size=200 — the reference LDA configuration
# (complaints_narrative_LDA.py:86) at fixture scale.  MLlib's EM LDA is
# deterministic for a fixed seed and input (verified: two in-session runs
# agree bit-for-bit including weights).
GOLDEN_LDA_TOP3 = {
    0: ["line", "column", "order"],
    1: ["small", "order", "join"],
    2: ["line", "order", "small"],
    3: ["line", "order", "column"],
    4: ["line", "join", "group"],
    5: ["line", "order", "group"],
    6: ["order", "line", "group"],
    7: ["group", "line", "join"],
    8: ["line", "group", "data"],
    9: ["line", "order", "group"],
    10: ["line", "hash", "order"],
    11: ["line", "group", "join"],
    12: ["line", "order", "group"],
    13: ["order", "line", "data"],
    14: ["line", "order", "small"],
    15: ["group", "line", "join"],
    16: ["line", "order", "small"],
    17: ["order", "line", "group"],
    18: ["order", "line", "join"],
    19: ["order", "line", "small"],
    20: ["line", "hash", "column"],
    21: ["group", "line", "join"],
    22: ["group", "hash", "join"],
    23: ["line", "order", "join"],
    24: ["small", "join", "column"],
}


def test_golden_svm_metrics(spark, sf_dir):
    """LinearSVC pin — closes the last unpinned binary pipeline from
    reference timely_SVM.py (which cannot run as committed, SURVEY §2.12;
    this pins the working re-expression)."""
    got = _binary_metrics(spark, sf_dir, ML.timely_pipeline("svm"))
    want = GOLDEN_BINARY["svm"]
    for k, v in want.items():
        if k in ("tp", "fp", "tn", "fn"):
            assert got[k] == v, (k, got[k], v)
        else:
            assert abs(got[k] - v) <= TOL, (k, got[k], v)


def test_golden_svm_pin_has_teeth(spark, sf_dir):
    """The frequencyAsc label-indexer slip moves SVM recall 0.13 -> 0.95
    (measured) — far outside tolerance."""
    pipe = ML.timely_pipeline("svm")
    stages = pipe.getStages()
    stages[1] = StringIndexer(
        inputCol="timely",
        outputCol="label",
        handleInvalid="skip",
        stringOrderType="frequencyAsc",  # the slip
    )
    got = _binary_metrics(spark, sf_dir, Pipeline(stages=stages))
    diffs = [
        abs(got[k] - GOLDEN_BINARY["svm"][k])
        for k in ("accuracy", "precision", "recall", "f1")
    ]
    assert max(diffs) > 0.05, diffs


def _lda_top3(spark, sf_dir, seed: int):
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.ml import (  # noqa: E501
        nlp,
    )
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.plans.catalog import (  # noqa: E501
        _t,
    )

    docs = _t(spark, sf_dir, "documents")
    feats, vocab = nlp.nlp_features(docs, "text", vocab_size=200, min_df=1.0)
    topics, _ = nlp.lda_topics(
        spark, feats, vocab, k=25, seed=seed, optimizer="em",
        max_iter=10, terms_per_topic=8,
    )
    by_topic: dict[int, list[tuple[str, float]]] = {}
    for r in topics.collect():
        by_topic.setdefault(r.topic, []).append((r.term, r.weight))
    return {
        t: [x[0] for x in sorted(v, key=lambda x: (-x[1], x[0]))][:3]
        for t, v in by_topic.items()
    }


def test_golden_lda_topic_terms(spark, sf_dir):
    """Reference-shape LDA pin: per-topic top-3 term lists under the fixed
    seed must match the committed table exactly."""
    got = _lda_top3(spark, sf_dir, seed=123)
    assert got == GOLDEN_LDA_TOP3


def test_golden_lda_pin_has_teeth(spark, sf_dir):
    """Seed 124 changes the top-3 list of 24/25 topics (measured) — the
    pin is sensitive to the exact fitted model, not just table shape."""
    got = _lda_top3(spark, sf_dir, seed=124)
    changed = sum(1 for t in GOLDEN_LDA_TOP3 if got[t] != GOLDEN_LDA_TOP3[t])
    assert changed >= 10, changed
