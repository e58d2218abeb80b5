"""operators/quality.py + merge.snapshot_diff: the audit must CATCH
violations (the catalog oracle only proves clean-data counts) and the
diff must classify every change class correctly."""

from __future__ import annotations

from pyspark.sql import functions as F

from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators import (  # noqa: E501
    merge as MG,
    quality as Q,
)


def test_column_audit_catches_violations_single_pass(spark):
    df = spark.createDataFrame(
        [(1, "A", 10.0), (2, None, -5.0), (3, "Z", 0.0), (4, "B", 2.5)],
        "id bigint, status string, price double",
    )
    out = {
        r["check_name"]: r
        for r in Q.column_audit(
            df,
            {
                "status_not_null": F.col("status").isNull(),
                "status_domain": ~F.col("status").isin("A", "B"),
                "price_positive": ~(F.col("price") > 0),
            },
        ).collect()
    }
    assert all(r["n_checked"] == 4 for r in out.values())
    assert out["status_not_null"]["n_violations"] == 1
    # NULL and 'Z' both violate the domain: the ~isin predicate is NULL on
    # NULL input, and column_audit folds NULL -> violation (ADVICE r5 —
    # three-valued logic would silently wave the NULL through the gate),
    # matching the audit-SQL idiom CASE WHEN ok THEN 0 ELSE 1
    assert out["status_domain"]["n_violations"] == 2
    assert out["price_positive"]["n_violations"] == 2  # -5.0 and 0.0


def test_column_audit_null_counts_as_violation_and_quotes_safe(spark):
    """ADVICE r5 pair: (a) a NULL price must FAIL price_positive — the
    gate's whole point; (b) a quote in a check name must not break the
    plan (names are typed literals now, not interpolated SQL)."""
    df = spark.createDataFrame(
        [(1, None), (2, 5.0)], "id bigint, price double"
    )
    out = {
        r["check_name"]: r["n_violations"]
        for r in Q.column_audit(
            df,
            {
                "price_positive": ~(F.col("price") > 0),
                "it's quoted": F.col("price").isNull(),
            },
        ).collect()
    }
    assert out["price_positive"] == 1  # the NULL row
    assert out["it's quoted"] == 1


def test_snapshot_diff_empty_compare_and_null_keys(spark):
    """ADVICE r5 pair: empty compare_cols = key-presence diff (every
    matched key 'unchanged'); NULL keys reconcile null-safely instead of
    splitting into a spurious deleted+inserted pair."""
    old = spark.createDataFrame(
        [(1, "a"), (None, "b"), (3, "c")], "k bigint, v string"
    )
    new = spark.createDataFrame(
        [(1, "a2"), (None, "b2"), (4, "d")], "k bigint, v string"
    )
    presence = {
        (r["k"], r["change"])
        for r in MG.snapshot_diff(old, new, ["k"], []).collect()
    }
    assert presence == {
        (1, "unchanged"),
        (None, "unchanged"),
        (3, "deleted"),
        (4, "inserted"),
    }
    full = {
        r["k"]: r["change"]
        for r in MG.snapshot_diff(old, new, ["k"], ["v"]).collect()
    }
    assert full == {1: "changed", None: "changed", 3: "deleted", 4: "inserted"}


def test_unique_audit_counts_extra_rows(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 3), (2, 1), (3, 1)], "k bigint, v bigint"
    )
    row = Q.unique_audit(df, ["k"], "k_unique").collect()[0]
    assert row["n_checked"] == 5
    assert row["n_violations"] == 2  # two extra rows under k=1


def test_referential_audit_counts_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (2,), (9,)], "fk bigint")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk bigint")
    row = Q.referential_audit(child, parent, "fk", "pk", "fk_ok").collect()[0]
    assert row["n_checked"] == 4
    assert row["n_violations"] == 1  # the single 9


def test_audit_table_verdicts(spark):
    child = spark.createDataFrame([(1,)], "fk bigint")
    parent = spark.createDataFrame([(1,)], "pk bigint")
    rows = Q.audit_table(
        [
            Q.referential_audit(child, parent, "fk", "pk", "b_fk"),
            Q.unique_audit(child, ["fk"], "a_unique"),
        ]
    ).collect()
    assert [r["check_name"] for r in rows] == ["a_unique", "b_fk"]
    assert all(r["passed"] for r in rows)


def test_snapshot_diff_classifies_all_classes(spark):
    old = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0), (4, None, 4.0)],
        "k bigint, s string, p double",
    )
    new = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 9.0), (4, "w", 4.0), (5, "n", 5.0)],
        "k bigint, s string, p double",
    )
    rows = {
        r["k"]: r
        for r in MG.snapshot_diff(old, new, ["k"], ["s", "p"]).collect()
    }
    assert rows[1]["change"] == "unchanged"
    assert rows[2]["change"] == "changed" and rows[2]["p"] == 9.0
    assert rows[3]["change"] == "deleted" and rows[3]["s"] is None
    # null -> value transition must count as changed (eqNullSafe)
    assert rows[4]["change"] == "changed"
    assert rows[5]["change"] == "inserted"
    assert len(rows) == 5


def test_snapshot_diff_composes_with_merge_upsert(spark):
    # Applying the derived feed to `old` must reproduce `new` exactly.
    old = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "k bigint, s string"
    )
    new = spark.createDataFrame(
        [(1, "x"), (2, "Y"), (5, "n")], "k bigint, s string"
    )
    diff = MG.snapshot_diff(old, new, ["k"], ["s"])
    upserts = diff.filter(
        F.col("change").isin("inserted", "changed")
    ).select("k", "s")
    deletes = diff.filter(F.col("change") == "deleted").select("k")
    applied = MG.merge_upsert(old, upserts, ["k"]).join(
        deletes, "k", "left_anti"
    )
    assert sorted(map(tuple, applied.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_lineitem_numeric_corr_matches_numpy(spark):
    """The exact-decimal-moment corr must agree with numpy's corrcoef
    (float64 two-pass) to ~1e-6 at fixture scale."""
    import numpy as np
    import pandas as pd
    import pytest as _pt

    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.plans import (  # noqa: E501
        catalog,
    )
    from .conftest import SF_ORACLE

    rows = {
        (r["var_x"], r["var_y"]): r["corr"]
        for r in catalog.CATALOG["lineitem_numeric_corr"]
        .fn(spark, SF_ORACLE)
        .collect()
    }
    pdf = pd.read_parquet(
        f"{SF_ORACLE}/lineitem.parquet",
        columns=["l_quantity", "l_discount", "l_tax"],
    )
    c = np.corrcoef(pdf.values.T)
    assert rows[("q", "d")] == _pt.approx(c[0, 1], abs=2e-6)
    assert rows[("q", "t")] == _pt.approx(c[0, 2], abs=2e-6)
    assert rows[("d", "t")] == _pt.approx(c[1, 2], abs=2e-6)


def test_orders_price_psi_properties(spark):
    """PSI terms are individually non-negative ((p-q)ln(p/q) >= 0) and the
    total is their sum; identical-period fixture gives ~0."""
    import pytest as _pt

    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.plans import (  # noqa: E501
        catalog,
    )
    from .conftest import SF_ORACLE

    rows = catalog.CATALOG["orders_price_psi"].fn(spark, SF_ORACLE).collect()
    assert all(r["psi_term"] >= -1e-8 for r in rows)
    total = rows[0]["psi_total"]
    assert all(r["psi_total"] == total for r in rows)
    assert total == _pt.approx(sum(r["psi_term"] for r in rows), abs=1e-6)
    assert 0.0 <= total < 1.0  # same generator both periods: mild drift only


def test_orders_chi2_matches_numpy(spark):
    import numpy as np
    import pandas as pd
    import pytest as _pt

    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.plans import (  # noqa: E501
        catalog,
    )
    from .conftest import SF_ORACLE

    row = (
        catalog.CATALOG["orders_status_priority_chi2"]
        .fn(spark, SF_ORACLE)
        .collect()[0]
    )
    pdf = pd.read_parquet(
        f"{SF_ORACLE}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority"],
    )
    tab = pd.crosstab(pdf["o_orderstatus"], pdf["o_orderpriority"]).values
    exp = np.outer(tab.sum(1), tab.sum(0)) / tab.sum()
    chi2 = ((tab - exp) ** 2 / exp).sum()
    assert row["chi2"] == _pt.approx(chi2, abs=1e-4)
    assert row["dof"] == (tab.shape[0] - 1) * (tab.shape[1] - 1)
    assert row["n"] == tab.sum()
