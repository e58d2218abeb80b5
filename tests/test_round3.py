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
