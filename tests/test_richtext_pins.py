"""Separation pins on the Zipfian rich-text fixture (VERDICT r10 item 6).

The standard driver fixture's ~31-type shared vocabulary makes every
separation-dependent effect milli-nat scale (SURVEY §7 observation (b));
these pins re-anchor the DSIR-bias, classifier-enrichment, and
perplexity-separation claims on ``tools/gen_richtext.py``'s per-domain
Zipfian corpus, where the margins are 3-6 orders of magnitude wider:

* DSIR per-token importance gap: > 1.5e6 micro-nats measured (the
  standard fixture pin demands > 1e3);
* classifier enrichment: heuristics keep 100% of the spam-vocabulary
  long probes while the terms-aware model scores them ~0.002 vs ~0.99
  for clean docs;
* reference-LM holdout: 99/100 ``newz`` docs land in the worst
  perplexity tercile (proportional share would be ~33/200).
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import gen_richtext as GR  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


@pytest.fixture(scope="module")
def rich_docs(spark):
    df = GR.richtext_df(spark).localCheckpoint()
    return df


def test_generator_deterministic_and_rich():
    a = GR.richtext_rows()
    b = GR.richtext_rows()
    assert a == b, "generator must be a pure function of the seed"
    assert GR.richtext_rows(seed=8) != a, "seed must matter"
    types = {t for _, _, _, txt in a for t in txt.split()}
    assert len(types) >= 5000, len(types)
    for doc_id, _, src, txt in a:
        if src == "spam":
            assert len(txt.split()) < 20  # fails the min_tokens gate
        if src == "newz":
            assert doc_id % 7 != 0  # reference-LM holdout contract


def test_dsir_separation_on_richtext(rich_docs, spark):
    """Seed-domain separation with real margins: per-token importance
    gap > 1e6 micro-nats (1000× the standard-fixture pin) and the
    Gumbel top-k concentrates almost entirely on the target domain."""
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators import (  # noqa: E501
        text as TX,
    )

    sc = TX.dsir_importance(rich_docs, F.col("source") == "srca")
    per_tok = (
        sc.join(rich_docs.select("doc_id", "source"), "doc_id")
        .groupBy((F.col("source") == "srca").alias("t"))
        .agg((F.sum("sum_logratio_u") / F.sum("n_tokens")).alias("pt"))
        .collect()
    )
    got = {r.t: float(r.pt) for r in per_tok}
    assert got[True] - got[False] > 1_000_000, got  # > 1 nat/token apart
    top = (
        TX.dsir_gumbel_topk(sc, k=100)
        .join(rich_docs.select("doc_id", "source"), "doc_id")
        .collect()
    )
    n_target = sum(1 for r in top if r.source == "srca")
    assert n_target >= 95, n_target  # measured: 100/100


def test_classifier_enrichment_on_richtext(rich_docs, spark):
    """The model catches what the heuristics cannot: spam-vocabulary
    docs padded to passing length keep heuristic_keep == 1 but score
    near zero under the terms-aware model, while clean-domain docs
    score near one — vocabulary-level enrichment, not a length echo."""
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.ml import (  # noqa: E501
        quality as Q,
    )
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.plans.pipeline_queries import (  # noqa: E501
        quality_rule_set,
    )

    base = Q.weak_label_frame(rich_docs, quality_rule_set()).cache()
    model = Q.fit_quality_model(base)
    good = (
        Q.score_corpus(base, model)
        .join(rich_docs.select("doc_id", "source"), "doc_id")
        .filter(F.col("source") != "spam")
        .agg(F.avg("model_score_u"))
        .collect()[0][0]
    )
    probe = spark.createDataFrame(
        GR.spam_long_probe_rows(),
        "doc_id bigint, lang string, source string, text string",
    )
    pb = Q.score_corpus(
        Q.weak_label_frame(probe, quality_rule_set()), model
    ).collect()
    base.unpersist()
    assert all(r.heuristic_keep == 1 for r in pb), (
        "probes must pass the heuristic gates — otherwise this pin "
        "re-tests length, not vocabulary"
    )
    probe_mean = sum(r.model_score_u for r in pb) / len(pb)
    assert good > 800_000, good              # measured ~0.994
    assert probe_mean < 100_000, probe_mean  # measured ~0.002


def test_perplexity_holdout_separation(rich_docs, spark):
    """A domain the reference LM never saw (newz ids avoid the %7 ref
    slice) separates hard: higher OOV rate, higher cross-entropy, and
    near-total concentration in the worst tercile."""
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.plans.breadth10b import (  # noqa: E501
        _ppl_dims,
        _ppl_score,
    )

    ref, stats = _ppl_dims(rich_docs)
    rows = (
        _ppl_score(rich_docs, ref, stats)
        .join(rich_docs.select("doc_id", "source"), "doc_id")
        .collect()
    )
    newz = [r for r in rows if r.source == "newz"]
    rest = [r for r in rows if r.source != "newz"]
    ce = lambda rs: sum(r.ce_u for r in rs) / len(rs)  # noqa: E731
    oov = lambda rs: sum(r.n_oov / r.n_tokens for r in rs) / len(rs)  # noqa: E731
    assert ce(newz) - ce(rest) > 200_000, (ce(newz), ce(rest))
    assert oov(newz) - oov(rest) > 0.15, (oov(newz), oov(rest))
    rows.sort(key=lambda r: -r.ce_u)
    top_tercile = rows[: len(rows) // 3]
    n_newz_top = sum(1 for r in top_tercile if r.source == "newz")
    assert n_newz_top >= 90, n_newz_top  # measured: 99/100
