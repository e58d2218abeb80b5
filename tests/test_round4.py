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
        assert lo.max_quality <= hi.min_quality


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
