"""Round-9 pins.

Hot-shingle df cap (VERDICT r8 "What's wrong" #1): the shingle
inverted-index candidate path shared by dedup_containment and
dedup_jaccard_blocked must NOT go quadratic on a shingle shared by many
documents — candidates are generated only from df-capped shingles, with
hot overlaps added back exactly for surviving candidates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators import (  # noqa: E501
    dedup as DD,
)


def _sh(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, lang string, h bigint")


def test_hot_shingle_candidates_df_capped(spark):
    """One shingle × 1,000 docs: uncapped, that bucket alone yields
    g·(g-1)/2 = 499,500 candidate pairs; with the df cap it yields ZERO,
    and only the pair sharing a cold shingle survives — with an EXACT
    intersection count that still includes the hot shingle."""
    rows = [(i, "en", 999) for i in range(1000)]  # hot: df=1000 > 128
    rows += [(7, "en", 1), (8, "en", 1)]          # cold: df=2
    sh = _sh(spark, rows)

    capped = DD.shingle_overlap_pairs(sh).collect()
    assert len(capped) == 1
    (row,) = capped
    # exact: cold h=1 plus the hot h=999 added back for the survivor
    assert (row.id_a, row.id_b, row.n_inter) == (7, 8, 2)

    # uncapped control: the same bucket really is quadratic
    uncapped = DD.shingle_overlap_pairs(sh, max_df=10**9)
    assert uncapped.count() == 1000 * 999 // 2


def test_hot_shingle_directional_and_probe_filter(spark):
    rows = [(i, "en", 999) for i in range(300)]   # hot at max_df=128
    rows += [(3, "en", 5), (4, "en", 5), (10, "en", 6), (11, "en", 6)]
    sh = _sh(spark, rows)

    directional = DD.shingle_overlap_pairs(sh, directional=True)
    got = {(r.id_a, r.id_b): r.n_inter for r in directional.collect()}
    # both directions, exact counts (cold + hot for docs < 300)
    assert got == {(3, 4): 2, (4, 3): 2, (10, 11): 2, (11, 10): 2}

    probed = DD.shingle_overlap_pairs(
        sh, probe_filter=F.col("doc_id") % 10 == 0
    )
    got = {(r.id_a, r.id_b): r.n_inter for r in probed.collect()}
    assert got == {(10, 11): 2}


def test_blocked_by_lang(spark):
    # same h in different langs never pairs
    sh = _sh(spark, [(1, "en", 5), (2, "de", 5), (3, "en", 5)])
    got = {(r.id_a, r.id_b) for r in DD.shingle_overlap_pairs(sh).collect()}
    assert got == {(1, 3)}


def test_pair_sharing_only_hot_shingles_is_missed(spark):
    """The stated recall contract: docs 500/501 share ONLY the hot
    shingle, so they are not generated as a candidate."""
    rows = [(i, "en", 999) for i in range(200)]
    rows += [(500, "en", 999), (501, "en", 999)]
    rows += [(500, "en", 42), (501, "en", 43)]  # cold but not shared
    sh = _sh(spark, rows)
    assert DD.shingle_overlap_pairs(sh).count() == 0
