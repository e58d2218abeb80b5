"""Round-3 additions: TPC-H breadth pack 2, behavioral analytics, and the
distributed token-budget sampler."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators import (  # noqa: E501
    pipeline as PL,
)
from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.plans import (  # noqa: E501
    catalog,
)

from .conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_token_budget_two_phase_matches_naive_global_window(spark):
    """The distributed two-phase prefix sum must equal the single-partition
    global-window formulation row for row (same order key, same cumsum)."""
    docs = _docs(spark)
    budget = 50_000
    fast = {
        (r.doc_id, r.n_tokens, r.cum_tokens)
        for r in PL.sample_token_budget(docs, budget).collect()
    }
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.functions import (  # noqa: E501
        textfns as TF,
    )

    rk = F.md5(F.col("doc_id").cast("string"))
    naive = (
        docs.select(
            "doc_id",
            F.size(TF.tokens("text")).cast("bigint").alias("n_tokens"),
            rk.alias("rk"),
        )
        .withColumn(
            "cum_tokens",
            F.sum("n_tokens").over(
                Window.orderBy("rk", "doc_id").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
        .filter(F.col("cum_tokens") <= budget)
    )
    slow = {(r.doc_id, r.n_tokens, r.cum_tokens) for r in naive.collect()}
    assert fast == slow and len(fast) > 0


def test_token_budget_zero_and_huge(spark):
    docs = _docs(spark)
    assert PL.sample_token_budget(docs, 0).count() == 0
    assert PL.sample_token_budget(docs, 10**12).count() == docs.count()


def test_funnel_counts_monotonically_decrease(spark):
    rows = catalog.CATALOG["events_funnel"].fn(spark, SF_SMOKE).collect()
    counts = [r.n_users for r in sorted(rows, key=lambda r: r.stage)]
    assert len(counts) == 3
    assert counts[0] >= counts[1] >= counts[2] >= 0


def test_cohort_week0_covers_every_user(spark):
    """Every user is active in their own cohort's week 0, so summing week-0
    cells over all cohorts must count every distinct user exactly once."""
    df = catalog.CATALOG["events_cohort_retention"].fn(spark, SF_SMOKE)
    week0 = (
        df.filter(F.col("week_offset") == 0)
        .agg(F.sum("active_users").alias("n"))
        .collect()[0]
        .n
    )
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.sources import (  # noqa: E501
        readers,
    )

    n_users = (
        readers.load_table(spark, SF_SMOKE, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert week0 == n_users


def test_q21_rewrite_no_self_nested_loop(spark):
    """The EXISTS/NOT-EXISTS de-correlation must plan as hash joins — no
    nested-loop re-execution of the lineitem side."""
    spark.catalog.clearCache()
    plan = (
        catalog.CATALOG["q21_waiting_suppliers"]
        .fn(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q15_ties_keep_all_max_suppliers(spark):
    df = catalog.CATALOG["q15_top_supplier"].fn(spark, SF_SMOKE)
    rows = df.collect()
    assert len(rows) >= 1
    revs = {r.total_revenue for r in rows}
    assert len(revs) == 1  # every returned supplier hits the same max


def test_gap_fill_dense_grid_and_locf(spark):
    """Grid is types × hours dense; zero-count hours carry the previous
    observed hourly average forward (LOCF), never a fresh value."""
    df = catalog.CATALOG["events_gap_fill"].fn(spark, SF_SMOKE)
    rows = df.collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    n_hours = {t: len(v) for t, v in by_type.items()}
    assert len(set(n_hours.values())) == 1  # every type spans the same grid
    for t, seq in by_type.items():
        seq.sort(key=lambda r: r.hour)
        prev = None
        for r in seq:
            if r.n_events == 0 and prev is not None:
                assert r.locf_avg_value_u == prev.locf_avg_value_u
            prev = r


def test_user_paths_totals_match_event_counts(spark):
    """Sum of all transitions = total events - one first-event per user."""
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.sources import (  # noqa: E501
        readers,
    )

    ev = readers.load_table(spark, SF_SMOKE, "events")
    total = ev.count()
    n_users = ev.select("user_id").distinct().count()
    paths = catalog.CATALOG["events_user_paths"].fn(spark, SF_SMOKE)
    n_trans = paths.agg(F.sum("n_transitions").alias("s")).collect()[0].s
    assert n_trans == total - n_users


def test_domain_mix_is_pure_filter_and_respects_weights(spark):
    """Kept docs are a subset selected deterministically; a re-run keeps
    exactly the same set, and high-weight sources keep >= low-weight ones
    proportionally (statistically: src0 w=1.0 keeps everything)."""
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.plans import (  # noqa: E501
        analytics_queries as AQ,
    )
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.sources import (  # noqa: E501
        readers,
    )

    a = {
        (r.source, r.n_kept)
        for r in catalog.CATALOG["docs_domain_mix"].fn(spark, SF_SMOKE).collect()
    }
    b = {
        (r.source, r.n_kept)
        for r in catalog.CATALOG["docs_domain_mix"].fn(spark, SF_SMOKE).collect()
    }
    assert a == b and len(a) > 0
    per_source = dict(a)
    totals = {
        r.source: r.n
        for r in readers.load_table(spark, SF_SMOKE, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per_source.get("src0") == totals["src0"]  # w=1.0 keeps all
    for s, kept in per_source.items():
        assert kept <= totals[s]


def test_shard_export_covers_all_docs_balanced(spark):
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.sources import (  # noqa: E501
        readers,
    )

    df = catalog.CATALOG["docs_shard_export"].fn(spark, SF_SMOKE)
    rows = df.collect()
    total = readers.load_table(spark, SF_SMOKE, "documents").count()
    assert sum(r.n_docs for r in rows) == total
    assert all(0 <= r.shard_id < 16 for r in rows)
    # md5 is uniform: no shard should be wildly off a 16-way split
    assert max(r.n_docs for r in rows) <= 4 * max(1, total // 16)


def test_q20_winners_hold_majority_share(spark):
    """Every returned supplier must actually hold >50% of some standard
    part's 1997 volume (recompute the share independently)."""
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.sources import (  # noqa: E501
        readers,
    )

    names = {
        r.s_name
        for r in catalog.CATALOG["q20_potential_promotion"].fn(spark, SF_SMOKE).collect()
    }
    li = readers.load_table(spark, SF_SMOKE, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = (
        readers.load_table(spark, SF_SMOKE, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    pq = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    tot = pq.groupBy(F.col("l_partkey").alias("pk")).agg(F.sum("q").alias("tq"))
    winners = (
        pq.join(tot, F.col("pk") == F.col("l_partkey"))
        .filter(F.col("q") * 2 > F.col("tq"))
        .select("l_suppkey")
        .distinct()
    )
    supp = readers.load_table(spark, SF_SMOKE, "supplier")
    nation = readers.load_table(spark, SF_SMOKE, "nation").filter(
        F.col("n_name") == "NATION_2"
    )
    expected = {
        r.s_name
        for r in supp.join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(winners, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_name")
        .collect()
    }
    assert names == expected


# --- round-3 breadth pack: reshape / stratified sample / LM score / range ---


def test_unpivot_is_single_scan_expand(spark):
    """unpivot must plan as one scan + one Expand (map-side fan-out), not
    the oracle's three scans + union."""
    df = catalog.CATALOG["lineitem_unpivot"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1
    assert "Expand" in plan
    assert "Union" not in plan


def test_pivot_is_single_aggregate_no_extra_job(spark):
    """pivot_agg with enumerated values: one scan, partial+final hash agg,
    and no distinct-collect job for the pivot column."""
    df = catalog.CATALOG["orders_status_pivot"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1
    assert plan.count("HashAggregate") >= 2


def test_stratified_quota_sample_exact_quotas_and_determinism(spark):
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators import (  # noqa: E501
        sampling,
    )

    docs = _docs(spark)
    out = sampling.stratified_quota_sample(docs, "source", quota=5, id_col="doc_id")
    sizes = {r["source"]: r["n"] for r in
             out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    full = {r["source"]: r["n"] for r in
            docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes == {s: min(5, n) for s, n in full.items()}
    # pure function of the data: identical membership on a re-run and on a
    # different partitioning
    a = {tuple(r) for r in out.select("doc_id").collect()}
    b = {
        tuple(r)
        for r in sampling.stratified_quota_sample(
            docs.repartition(13), "source", quota=5, id_col="doc_id"
        ).select("doc_id").collect()
    }
    assert a == b
    # salt re-draws: different membership, same quotas
    c = {
        tuple(r)
        for r in sampling.stratified_quota_sample(
            docs, "source", quota=5, id_col="doc_id", salt="redraw"
        ).select("doc_id").collect()
    }
    assert c != a and len(c) == len(a)


def test_unigram_logprob_matches_handcomputed(spark):
    import math

    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators import (  # noqa: E501
        text as TX,
    )

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    # corpus: a=2, b=2, c=1, total=5
    got = {r.doc_id: (r.n_tokens, float(r.mean_logprob))
           for r in TX.unigram_logprob(docs).collect()}
    lp = {t: round(math.log(c / 5), 6) for t, c in {"a": 2, "b": 2, "c": 1}.items()}
    want1 = round((2 * lp["a"] + lp["b"]) / 3, 6)
    want2 = round((lp["b"] + lp["c"]) / 2, 6)
    assert got[1] == (3, want1)
    assert got[2] == (2, want2)


def test_range_search_consistent_with_topk(spark):
    """Every top-k hit scoring >= threshold must appear in the range result
    with the identical decimal-rounded cosine (shared scoring core)."""
    topk = catalog.CATALOG["ann_cosine_topk"].fn(spark, SF_SMOKE).collect()
    rng = {
        (r.probe_id, r.neighbor_id): r.cosine
        for r in catalog.CATALOG["ann_range_search"].fn(spark, SF_SMOKE).collect()
    }
    overlap = [r for r in topk if r.cosine >= 0.35]
    assert overlap, "fixture should have top-k hits above the range threshold"
    for r in overlap:
        assert rng[(r.probe_id, r.neighbor_id)] == r.cosine
    # and nothing below threshold leaks in
    assert all(c >= 0.35 for c in rng.values())


def test_scd2_history_collapses_and_versions(spark):
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators import (  # noqa: E501
        merge as MG,
    )

    log = spark.createDataFrame(
        [
            (1, "new", 10, 100),
            (1, "new", 20, 101),   # unchanged -> collapses into the first
            (1, "paid", 30, 102),
            (1, "new", 40, 103),   # back to a previous state = new version
            (2, "new", 10, 104),
        ],
        "cust long, status string, ts long, oid long",
    )
    hist = MG.scd2_history(
        log, ["cust"], ["status"], "ts", tiebreak_cols=["oid"]
    )
    rows = sorted(
        (r.cust, r.status, r.valid_from, r.valid_to, r.is_current)
        for r in hist.collect()
    )
    assert rows == [
        (1, "new", 10, 30, False),
        (1, "new", 40, None, True),
        (1, "paid", 30, 40, False),
        (2, "new", 10, None, True),
    ]


def test_boilerplate_spans_handcase(spark):
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators import (  # noqa: E501
        pipeline as PL,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e x1 y1"),   # shares "a b c d e" with doc 2
            (2, "z a b c d e"),
            (3, "p q r s t"),         # unique 5-gram
            (4, "too short"),         # < 5 tokens -> 0 grams
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_grams, r.n_boilerplate, r.boilerplate_fraction)
        for r in PL.boilerplate_spans(docs, n=5, min_docs=2).collect()
    }
    assert got[1] == (3, 1, round(1 / 3, 6))
    assert got[2] == (2, 1, 0.5)
    assert got[3] == (1, 0, 0.0)
    assert got[4] == (0, 0, 0.0)


def test_pivot_agg_null_semantics_consistent(spark):
    """ADVICE r3: NULL pivot values must be DROPPED in both modes — the
    other_label bucket holds only non-NULL out-of-list values (pre-fix,
    the isin->otherwise remap silently folded NULLs into the bucket)."""
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators import (  # noqa: E501
        reshape,
    )

    rows = [("a", "X", 1), ("a", "Y", 2), ("a", "Z", 4), ("a", None, 8)]
    df = spark.createDataFrame(rows, ["k", "p", "v"])

    plain = reshape.pivot_agg(df, ["k"], "p", ["X", "Y"], F.sum("v")).collect()[0]
    assert (plain["X"], plain["Y"]) == (1, 2)

    other = reshape.pivot_agg(
        df, ["k"], "p", ["X", "Y"], F.sum("v"), other_label="other"
    ).collect()[0]
    # Z folds into the bucket; the NULL row does NOT (8 would make it 12)
    assert (other["X"], other["Y"], other["other"]) == (1, 2, 4)


def test_active_users_approx_error_bound(spark):
    """VERDICT r3 stretch item 8: the HLL twin must track the exact
    DAU/WAU/MAU within 3x its configured 2% rsd on every bucket."""
    exact = {
        (r.granularity, r.bucket): r.active_users
        for r in catalog.CATALOG["events_active_users"].fn(spark, SF_SMOKE).collect()
    }
    est = {
        (r.granularity, r.bucket): r.active_users_est
        for r in catalog.CATALOG["events_active_users_approx"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    assert set(est) == set(exact)
    for key, n in exact.items():
        assert abs(est[key] - n) <= max(2.0, 0.06 * n), (key, n, est[key])


def test_weighted_topk_sample_aes_properties(spark):
    """A-ES sampler: exactly k rows, deterministic across invocations,
    and weight-biased (mean weight of the sample exceeds the corpus
    mean — heavy docs are proportionally more likely)."""
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.plans import (  # noqa: E501
        catalog,
    )
    from .conftest import SF_ORACLE

    fn = catalog.CATALOG["docs_weighted_topk_sample"].fn
    a = fn(spark, SF_ORACLE).collect()
    b = fn(spark, SF_ORACLE).collect()
    assert len(a) == 100
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]  # deterministic
    assert [r["rank"] for r in sorted(a, key=lambda r: r["rank"])] == list(
        range(1, 101)
    )
    sel_mean = sum(r["n_chars"] for r in a) / len(a)
    corpus = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    corpus_mean = corpus.agg({"n_chars": "avg"}).collect()[0][0]
    assert sel_mean > corpus_mean
