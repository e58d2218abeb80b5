"""Round-5 additions: MAD-outlier approx twin, incremental semantic
dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators import (  # noqa: E501
    pipeline as PL,
    similarity as SIM,
)
from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.plans import (  # noqa: E501
    catalog,
)

from .conftest import SF_SMOKE


def test_mad_outlier_approx_twin_agrees_with_exact(spark):
    """The percentile_approx(0.5) twin must flag (nearly) the same events
    as the exact median/MAD query.  Perfect equality is NOT expected:
    exact median interpolates even-count groups, the sketch returns an
    element, so borderline events can flip — measured Jaccard ~0.97 on
    the fixtures; pinned at >= 0.9 with a non-trivial flag count."""
    exact = {
        r.event_id
        for r in catalog.CATALOG["events_value_outliers_mad"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    approx = {
        r.event_id
        for r in catalog.CATALOG["events_value_outliers_mad_approx"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    assert len(exact) > 50, "fixture should produce a real outlier set"
    jaccard = len(exact & approx) / len(exact | approx)
    assert jaccard >= 0.9, f"approx twin diverged: jaccard={jaccard:.3f}"
    # and the schemas line up so the twin is a drop-in replacement
    exact_df = catalog.CATALOG["events_value_outliers_mad"].fn(spark, SF_SMOKE)
    approx_df = catalog.CATALOG["events_value_outliers_mad_approx"].fn(
        spark, SF_SMOKE
    )
    assert exact_df.columns == approx_df.columns


def test_semantic_dedup_fast_string_ids(spark):
    """ADVICE r4: the BLAS fast path must inherit the index's id type
    instead of hard-coding int64 — string ids flow through the pandas
    worker and the pair ordering follows the string's natural order,
    matching the expression path's Column `<`."""
    emb = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .limit(200)
        .select(
            F.concat(F.lit("doc-"), F.format_string("%04d", "vec_id")).alias(
                "vec_id"
            ),
            "embedding",
        )
    )
    idx = SIM.ivf_build(emb, n_cells=4, n_assign=2)
    pairs = SIM.semantic_dedup_pairs_fast(idx, threshold=0.15)
    assert dict(pairs.dtypes)["id1"] == "string"
    rows = pairs.collect()
    assert rows, "fixture should produce near-duplicate pairs"
    assert all(r.id1 < r.id2 for r in rows)
    # and it agrees with the exact expression path on the same index
    exact = {
        (r.id1, r.id2)
        for r in SIM.semantic_dedup_pairs(idx, threshold=0.15).collect()
    }
    assert {(r.id1, r.id2) for r in rows} == exact


def test_boilerplate_grams_caller_owned_cache(spark):
    """ADVICE r4: the persisted gram frame's handle rides on the result
    (caller-controlled lifetime); auto-evict is per-session and can be
    opted out so an earlier result keeps its cache."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50)
    a = PL.boilerplate_spans(docs)
    ga = a.boilerplate_grams
    assert ga.storageLevel.useMemory or ga.storageLevel.useDisk
    b = PL.boilerplate_spans(docs, evict_previous=False)
    assert ga.storageLevel.useMemory or ga.storageLevel.useDisk, (
        "evict_previous=False must keep the earlier result's cache"
    )
    c = PL.boilerplate_spans(docs)  # default evicts b's frame, not a's ref
    assert not (
        b.boilerplate_grams.storageLevel.useMemory
        or b.boilerplate_grams.storageLevel.useDisk
    ), "default eviction should release the previous invocation's frame"
    c.boilerplate_grams.unpersist()
    ga.unpersist()
