"""Round-2 additions: reliable-checkpoint connected components, idempotent
foreachBatch replay, deterministic fast-top-k tie-breaking, tuning and
EM-LDA catalog entries, JSON-path/parquet-path clean parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators import (  # noqa: E501
    dedup as DD,
    similarity as SIM,
)
from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.plans import (  # noqa: E501
    catalog,
)
from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.streaming import (  # noqa: E501
    jobs as SJ,
)

from .conftest import SF_SMOKE


def test_connected_components_chain_reliable_checkpoint(spark, tmp_path):
    """A 9-hop chain (worst-case diameter for min-label propagation) with
    checkpoint_dir set: reliable checkpoints replace localCheckpoint and the
    fixpoint is still the per-component min."""
    chain = [(i, i + 1) for i in range(9)]
    pairs = spark.createDataFrame(chain, "doc_a long, doc_b long")
    got = {
        (r.doc_id, r.component)
        for r in DD.connected_components(
            pairs, checkpoint_dir=str(tmp_path / "ckpt"), driver_max_edges=None
        ).collect()
    }
    assert got == {(i, 0) for i in range(10)}
    # reliable checkpoint files actually landed in the requested dir
    assert any((tmp_path / "ckpt").rglob("*"))


def test_connected_components_max_iter_stops(spark):
    """max_iter bounds the rounds: a chain longer than max_iter hops stops
    early with labels only partially propagated (still monotone ≥ true min,
    never wrong-component merges)."""
    chain = [(i, i + 1) for i in range(9)]
    pairs = spark.createDataFrame(chain, "doc_a long, doc_b long")
    labels = {r.doc_id: r.component for r in DD.connected_components(
        pairs, max_iter=2, driver_max_edges=None).collect()}
    assert labels[0] == 0 and labels[1] == 0 and labels[2] == 0
    assert all(lbl >= 0 for lbl in labels.values())
    # far end of the chain cannot have converged in 2 rounds
    assert labels[9] != 0


def test_foreach_batch_replay_is_idempotent(spark, tmp_path):
    """Replaying the same micro-batch (fresh checkpoint, same sink dir —
    the failure-between-write-and-commit scenario) overwrites its own
    _batch_id partition instead of appending duplicates."""
    out = str(tmp_path / "sink")
    stream = SJ.read_events_stream(spark, SF_SMOKE)
    SJ.run_foreach_batch_parquet(stream, out, str(tmp_path / "ckpt_a"))
    n_first = spark.read.parquet(out).count()
    # fresh checkpoint → the source replays from scratch with the same ids
    stream2 = SJ.read_events_stream(spark, SF_SMOKE)
    SJ.run_foreach_batch_parquet(stream2, out, str(tmp_path / "ckpt_b"))
    back = spark.read.parquet(out)
    assert back.count() == n_first  # not doubled
    assert back.select("_batch_id").distinct().count() == 1


def test_cosine_topk_fast_breaks_ties_deterministically(spark):
    """All-identical vectors → every score ties; the local per-batch cut
    must keep the same (score desc, neighbor_id asc) winners the global
    window would, across multiple partitions."""
    rows = [(i, [1.0, 0.0, 0.0]) for i in range(40)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(4)
    probes = emb.filter(F.col("vec_id") == 0)
    exact = SIM.cosine_topk(emb, probes, k=5)
    fast = SIM.cosine_topk_fast(emb, probes, k=5)
    e = [(r.rank, r.neighbor_id) for r in exact.orderBy("rank").collect()]
    f = [(r.rank, r.neighbor_id) for r in fast.orderBy("rank").collect()]
    assert e == f == [(1, 1), (2, 2), (3, 3), (4, 4), (5, 5)]


def test_tuned_lr_emits_best_params_from_grid(spark):
    out = catalog.CATALOG["ml_timely_lr_tuned"].fn(spark, SF_SMOKE)
    rows = {r.tuner: r for r in out.collect()}
    assert set(rows) == {"cv", "tvs"}
    for r in rows.values():
        # best params must come from the reference grid's domains
        assert r.best_reg_param in {0.0001, 0.001, 0.01, 0.1, 1.0, 10.0}
        assert r.best_elastic_net in {0.0, 0.5, 1.0}
        assert 0.0 <= r.val_auc <= 1.0
        assert 0.0 <= r.test_auc <= 1.0


def test_em_lda_reference_shape(spark):
    """Reference configuration (k=25, em, seed=123): k × terms_per_topic
    rows, positive weights, every topic present."""
    out = catalog.CATALOG["ml_lda_topics_em"].fn(spark, SF_SMOKE)
    rows = out.collect()
    assert len(rows) == 25 * 8
    assert {r.topic for r in rows} == set(range(25))
    assert all(r.weight > 0 for r in rows)


def test_json_path_equals_parquet_path(spark):
    """The PERMISSIVE JSON scan (malformed lines as corrupt records) must
    clean to byte-identical output as the parquet fixture path."""
    a = catalog.CATALOG["complaints_clean"].fn(spark, SF_SMOKE)
    b = catalog.CATALOG["complaints_json_clean"].fn(spark, SF_SMOKE)
    assert a.columns == b.columns
    sa = {tuple(r) for r in a.collect()}
    sb = {tuple(r) for r in b.collect()}
    assert sa == sb
