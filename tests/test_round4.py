"""Round-4 additions: temperature mixture sampling, quality-decile
curriculum buckets, pack manifests."""

from __future__ import annotations

from pyspark.sql import functions as F

from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators import (  # noqa: E501
    pipeline as PL,
    sampling,
)
from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.plans import (  # noqa: E501
    catalog,
)

from .conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_temperature_sample_deterministic_and_flattening(spark):
    """Membership is a pure function of the data (identical on a different
    partitioning), and alpha<1 flattens: a source's kept share sits
    between its corpus share and the uniform share."""
    docs = _docs(spark)
    a = {r.doc_id for r in
         sampling.temperature_sample(docs, "source", "doc_id").select("doc_id").collect()}
    b = {r.doc_id for r in
         sampling.temperature_sample(docs.repartition(13), "source", "doc_id")
         .select("doc_id").collect()}
    assert a == b and a

    out = catalog.CATALOG["docs_temperature_mix"].fn(spark, SF_SMOKE).collect()
    n_tot = sum(r.n_total for r in out)
    n_kept = sum(r.n_kept for r in out)
    # target_frac=0.5 with a Bernoulli draw: within a loose binomial band
    assert 0.35 * n_tot <= n_kept <= 0.65 * n_tot, (n_kept, n_tot)
    # keep_frac must decrease with source size (bigger share -> stronger
    # down-weight under alpha<1); the fixture is uniform so all fracs equal
    fracs = {r.keep_frac for r in out}
    assert len(fracs) == 1 or max(fracs) <= 1.0


def test_temperature_sample_downweights_large_sources(spark):
    """On a skewed corpus (one source duplicated 4x), the big source's
    keep fraction must be strictly below the small sources'."""
    docs = _docs(spark)
    big = docs.filter(F.col("source") == "src0")
    skewed = docs.unionAll(big).unionAll(big).unionAll(big)
    kept = sampling.temperature_sample(skewed, "source", "doc_id")
    fr = {
        r.source: r.keep_frac
        for r in kept.select("source", "keep_frac").distinct().collect()
    }
    others = [v for s, v in fr.items() if s != "src0"]
    assert fr["src0"] < min(others), fr


def test_quality_deciles_partition_sizes_and_ordering(spark):
    rows = catalog.CATALOG["docs_quality_deciles"].fn(spark, SF_SMOKE).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    sizes = [r.n_docs for r in rows]
    assert max(sizes) - min(sizes) <= 1  # NTILE contract
    # deciles are quality-ordered and non-overlapping
    for lo, hi in zip(rows, rows[1:]):
        assert lo.max_quality_u <= hi.min_quality_u


def test_pack_manifest_consistent_with_pack_bins(spark):
    """The manifest's counts must equal pack_bins' stats bin for bin, and
    each id list must be ordered with the right length."""
    docs = _docs(spark)
    bins = {
        (r.lang, r.bin_id): (r.n_docs, r.bin_tokens)
        for r in PL.pack_bins(docs, budget=512, part_col="lang").collect()
    }
    man = PL.pack_manifest(docs, budget=512, part_col="lang").collect()
    assert {(r.lang, r.bin_id) for r in man} == set(bins)
    for r in man:
        n_docs, bin_tokens = bins[(r.lang, r.bin_id)]
        ids = [int(x) for x in r.doc_ids.split(",")]
        assert len(ids) == n_docs == r.n_docs
        assert ids == sorted(ids)
        assert r.bin_tokens == bin_tokens


def test_bm25_hand_computed_single_doc(spark):
    """BM25 sanity on a 3-doc corpus against a hand-derived expectation:
    the doc containing the rarer term twice must outrank the others."""
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators import (  # noqa: E501
        text as TX,
    )

    rows = [
        (1, "apple banana apple cherry"),
        (2, "banana banana banana banana"),
        (3, "cherry date elderberry fig"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: (r.bm25, r.rank) for r in
           TX.bm25_rank(df, ["apple", "banana"], k=3).collect()}
    # doc 1 matches the rare 'apple' twice plus 'banana'; doc 2 only the
    # common 'banana' (df=2 -> lower idf).  doc 3 matches nothing.
    assert set(out) == {1, 2}
    assert out[1][1] == 1 and out[2][1] == 2
    assert out[1][0] > out[2][0] > 0


def test_semantic_dedup_recall_and_precision(spark):
    """SemDeDup pairs: every emitted pair is truly >= threshold (exact
    precision by construction) and recall vs the exact all-pairs baseline
    clears the measured floor (0.92 on the fixture with n_assign=3)."""
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators import (  # noqa: E501
        similarity as SIM,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    sem = {
        (r.id1, r.id2)
        for r in catalog.CATALOG["ann_semantic_dedup"].fn(spark, SF_SMOKE).collect()
    }
    a = emb.select(F.col("vec_id").alias("id1"), F.col("embedding").alias("v1"))
    b = emb.select(F.col("vec_id").alias("id2"), F.col("embedding").alias("v2"))
    exact = {
        (r.id1, r.id2)
        for r in a.join(b, F.col("id1") < F.col("id2"))
        .select("id1", "id2", SIM.dot_decimal(F.col("v1"), F.col("v2")).alias("d"))
        .filter(F.col("d") >= 0.15)
        .collect()
    }
    assert sem <= exact  # no false positives, ever
    assert len(sem & exact) / len(exact) >= 0.85, len(sem & exact) / len(exact)


def test_hybrid_rrf_fuses_both_rankings(spark):
    rows = catalog.CATALOG["docs_hybrid_rrf"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 20
    # fused list must contain docs from both sides (a bm25-only doc has
    # cosine_rank 0 and vice versa) and be sorted by rrf desc
    assert any(r.bm25_rank > 0 for r in rows)
    assert any(r.cosine_rank > 0 for r in rows)
    rrfs = [r.rrf for r in rows]
    assert rrfs == sorted(rrfs, reverse=True)
    # a doc ranked in BOTH lists must outrank one ranked in a single list
    both = [r for r in rows if r.bm25_rank > 0 and r.cosine_rank > 0]
    single = [r for r in rows if (r.bm25_rank > 0) != (r.cosine_rank > 0)]
    if both and single:
        assert max(r.rrf for r in both) >= max(r.rrf for r in single)


def test_quality_deciles_approx_tracks_exact(spark):
    """The sketch-based curriculum path must produce 10 quality-ordered
    buckets whose sizes stay within 25% of the exact NTILE deciles (the
    sketch at accuracy 10k is near-exact at fixture scale)."""
    exact = {r.decile: r.n_docs for r in
             catalog.CATALOG["docs_quality_deciles"].fn(spark, SF_SMOKE).collect()}
    approx = catalog.CATALOG["docs_quality_deciles_approx"].fn(spark, SF_SMOKE).collect()
    assert [r.decile for r in approx] == list(range(1, 11))
    for lo, hi in zip(approx, approx[1:]):
        assert lo.max_quality_u <= hi.min_quality_u
    n = sum(exact.values())
    for r in approx:
        assert abs(r.n_docs - n / 10.0) <= 0.25 * (n / 10.0) + 2, (
            r.decile, r.n_docs, n / 10.0,
        )


def test_semantic_dedup_fast_matches_expression_path(spark):
    """The per-cell BLAS fast path must emit exactly the expression
    path's pair set on the fixture (same index, same threshold), with
    cosines agreeing to the 6-decimal rounding."""
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators import (  # noqa: E501
        similarity as SIM,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    idx = SIM.ivf_build(emb, n_assign=3)
    slow = {(r.id1, r.id2): r.cosine
            for r in SIM.semantic_dedup_pairs(idx, 0.15).collect()}
    fast = {(r.id1, r.id2): r.cosine
            for r in SIM.semantic_dedup_pairs_fast(idx, 0.15).collect()}
    assert set(fast) == set(slow)
    assert all(abs(fast[k] - slow[k]) <= 1e-6 for k in fast)


def test_semantic_canonical_invariants(spark):
    """End-to-end SemDeDup: each near-dup cluster keeps exactly its min
    id; docs in no cluster pass through; kept + losers == corpus."""
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators import (  # noqa: E501
        dedup as DD,
        similarity as SIM,
    )
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.plans.text_queries import (  # noqa: E501
        ivf_index_for,
    )

    idx = ivf_index_for(spark, SF_SMOKE, n_assign=3)
    pairs = SIM.semantic_dedup_pairs_fast(idx, threshold=0.35).select(
        F.col("id1").alias("doc_a"), F.col("id2").alias("doc_b")
    )
    comp = {r.doc_id: r.component for r in DD.connected_components(pairs).collect()}
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    kept = {
        r.doc_id
        for r in DD.canonical_docs(
            docs,
            spark.createDataFrame(
                list(comp.items()), "doc_id long, component long"
            ),
        ).collect()
    }
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    clustered = set(comp)
    losers = {d for d, c in comp.items() if d != c}
    # exactly the losers are dropped
    assert kept == all_ids - losers
    # each cluster's survivor is its min id
    by_comp: dict[int, list[int]] = {}
    for d, c in comp.items():
        by_comp.setdefault(c, []).append(d)
    for c, members in by_comp.items():
        assert min(members) == c
        assert set(members) & kept == {c}
    # sanity: some clustering actually happened on the fixture (at this
    # threshold every fixture doc may appear in SOME pair, so only the
    # loser set is guaranteed non-empty)
    assert losers and clustered <= all_ids
