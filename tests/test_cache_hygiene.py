"""Pin the per-batch cache release contract (VERDICT r13 #5, ADVICE r13).

r13 added internal ``persist()`` calls to operators that streaming jobs
invoke ONCE PER MICRO-BATCH (``semantic_dedup_incremental``'s
corpus_hits, ``fuzzy_flagged``'s batch-side hash frame).  Each batch
builds a distinct plan, so the CacheManager cannot dedupe the entries
and a long-lived stream accumulates one dead cached frame per batch —
bounded in a 3-batch fixture, unbounded under continuous ingest.  r14
threads a ``scratch`` list through those operators; the foreachBatch
runners unpersist after each batch's write.

These tests run a streaming entry twice COLD (memo purge between runs,
bench methodology) and assert the second run adds zero persistent RDDs:
the first run is allowed to warm the documented session caches (frozen
benchmark index etc.), after which a steady state must hold — per-batch
frames may not survive their batch.
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.plans import (  # noqa: E501
    CATALOG,
)

import bench  # noqa: E402


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


@pytest.mark.parametrize(
    "name",
    [
        "stream_decontaminate_fuzzy",
        "stream_semantic_dedup",
        "stream_curation_e2e",
        "docs_curation_e2e",
        "ann_ivf_rebuild_policy",
    ],
)
def test_streaming_entry_does_not_leak_cache(spark, sf_dir, name):
    fn = CATALOG[name].fn
    # run 1 (cold): builds the documented session caches + all batches
    bench._cold_reset(name)
    fn(spark, sf_dir).count()
    before = _n_persistent(spark)
    # run 2 (cold again): steady state — per-batch/per-run persists and
    # localCheckpoints must have been released (or swapped), so the
    # cache count cannot grow
    bench._cold_reset(name)
    fn(spark, sf_dir).count()
    after = _n_persistent(spark)
    assert after <= before, (
        f"{name}: persistent RDDs grew {before} -> {after} on a repeat "
        "cold run — a per-batch/per-run frame is leaking cache entries"
    )


def test_minhash_hashes_supersedes_guard(spark, sf_dir):
    """ADVICE r13: an explicit ``hashes`` frame silently ignored
    df/text_col/hash_fn; non-default combinations now raise."""
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators import (  # noqa: E501
        dedup as DD,
    )

    docs = spark.createDataFrame([(1, "a b c d"), (2, "a b c d")], "doc_id long, text string")
    hashes = DD.shingle_hashes(docs)
    with pytest.raises(ValueError, match="supersedes"):
        DD.minhash_dedup_pairs(spark, docs, hash_fn="xxhash", hashes=hashes)
    with pytest.raises(ValueError, match="supersedes"):
        DD.minhash_dedup_pairs(spark, docs, text_col="body", hashes=hashes)
    # the supported form still works
    n = DD.minhash_dedup_pairs(spark, docs, hashes=hashes).count()
    assert n == 1
