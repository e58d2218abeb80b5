"""Data-quality pack: the batch gates a 100 TB ingest runs before any
downstream job is allowed to read a snapshot.

- star_constraint_audit:    declarative constraint audit over the star
                            schema (operators/quality.py) — null/domain/
                            range checks folded one-pass-per-table,
                            key uniqueness, FK orphan checks;
- orders_snapshot_diff:     CDC feed derived from two snapshots
                            (operators/merge.snapshot_diff) — the
                            reconcile-a-recrawl primitive, classified
                            and counted.

Every output is an exact integer count (or a boolean over one), so
cross-engine parity needs no numeric discipline at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import merge as MG
from ..operators import quality as Q
from .catalog import _t, register


@register(
    "star_constraint_audit",
    """
WITH o_cols AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null,
    CAST(SUM(CASE WHEN o_orderstatus IN ('P','O','F') THEN 0 ELSE 1 END) AS BIGINT) AS v_dom,
    CAST(SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT) AS v_pos
  FROM orders
),
l_cols AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CASE WHEN l_discount BETWEEN 0 AND 1 THEN 0 ELSE 1 END) AS BIGINT) AS v_disc,
    CAST(SUM(CASE WHEN l_quantity > 0 THEN 0 ELSE 1 END) AS BIGINT) AS v_qty
  FROM lineitem
),
all_checks AS (
  SELECT 'orders.custkey_not_null' AS check_name, n AS n_checked, v_null AS n_violations FROM o_cols
  UNION ALL SELECT 'orders.status_domain', n, v_dom FROM o_cols
  UNION ALL SELECT 'orders.totalprice_positive', n, v_pos FROM o_cols
  UNION ALL SELECT 'lineitem.discount_range', n, v_disc FROM l_cols
  UNION ALL SELECT 'lineitem.quantity_positive', n, v_qty FROM l_cols
  UNION ALL
  SELECT 'orders.orderkey_unique',
         CAST(SUM(c) AS BIGINT), CAST(SUM(c) - COUNT(*) AS BIGINT)
  FROM (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey)
  UNION ALL
  SELECT 'lineitem.line_unique',
         CAST(SUM(c) AS BIGINT), CAST(SUM(c) - COUNT(*) AS BIGINT)
  FROM (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber)
  UNION ALL
  SELECT 'lineitem.orderkey_fk',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
  UNION ALL
  SELECT 'orders.custkey_fk',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
  UNION ALL
  SELECT 'lineitem.suppkey_fk',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
  UNION ALL
  SELECT 'lineitem.partkey_fk',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
)
SELECT check_name, n_checked, n_violations, n_violations = 0 AS passed
FROM all_checks
ORDER BY check_name
""",
    "quality", "audit", "constraints", "anti-join", "agg",
)
def star_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style constraint gate over the star schema: 11 constraints —
    3 orders column checks + 2 lineitem column checks (each table's
    checks fold into ONE conditional-sum aggregate pass), 2 key-
    uniqueness checks (two-level aggregate, no row-wide distinct), and 4
    FK-orphan checks (keyed anti-joins; AQE broadcasts the dim sides).

    Adding a column check costs nothing (it rides the existing pass);
    the audit table is constraint-sized, so the gate's output is readable
    no matter the input scale.  On this synthetic data every constraint
    passes — the oracle proves the COUNTS, and
    tests/test_quality.py proves violations are actually caught.
    """
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    parts = [
        Q.column_audit(
            orders,
            {
                "orders.custkey_not_null": F.col("o_custkey").isNull(),
                "orders.status_domain": ~F.col("o_orderstatus").isin(
                    "P", "O", "F"
                ),
                "orders.totalprice_positive": ~(F.col("o_totalprice") > 0),
            },
        ),
        Q.column_audit(
            li,
            {
                "lineitem.discount_range": ~F.col("l_discount").between(0, 1),
                "lineitem.quantity_positive": ~(F.col("l_quantity") > 0),
            },
        ),
        Q.unique_audit(orders, ["o_orderkey"], "orders.orderkey_unique"),
        Q.unique_audit(
            li, ["l_orderkey", "l_linenumber"], "lineitem.line_unique"
        ),
        Q.referential_audit(
            li, orders, "l_orderkey", "o_orderkey", "lineitem.orderkey_fk"
        ),
        Q.referential_audit(
            orders,
            _t(spark, sf_dir, "customer"),
            "o_custkey",
            "c_custkey",
            "orders.custkey_fk",
        ),
        Q.referential_audit(
            li,
            _t(spark, sf_dir, "supplier"),
            "l_suppkey",
            "s_suppkey",
            "lineitem.suppkey_fk",
        ),
        Q.referential_audit(
            li,
            _t(spark, sf_dir, "part"),
            "l_partkey",
            "p_partkey",
            "lineitem.partkey_fk",
        ),
    ]
    return Q.audit_table(parts)


@register(
    "orders_snapshot_diff",
    """
WITH old AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 97 <> 3
),
new AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 101 = 5 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 89 <> 1
),
d AS (
  SELECT CASE WHEN o.o_orderkey IS NULL THEN 'inserted'
              WHEN n.o_orderkey IS NULL THEN 'deleted'
              WHEN o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
               AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                THEN 'unchanged'
              ELSE 'changed' END AS change
  FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
)
SELECT change, CAST(COUNT(*) AS BIGINT) AS n_keys
FROM d GROUP BY change ORDER BY change
""",
    "quality", "cdc", "snapshot-diff", "full-outer",
)
def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC feed from two snapshots (operators/merge.snapshot_diff): the
    'old' and 'new' order snapshots are carved deterministically from the
    fixture (keys ≡3 mod 97 arrive only in new → inserted; keys ≡1 mod
    89 leave → deleted; keys ≡5 mod 101 get a price bump → changed), so
    every change class is exercised and the classification counts are
    exactly oracle-checkable.

    The diff itself is one co-partitioned full-outer join on the key with
    null-safe per-column comparison — no hashing, no second scan; the
    +1.0 price perturbation is IEEE-exact on both engines.
    """
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    old = orders.filter(F.col("o_orderkey") % 97 != 3)
    new = orders.filter(F.col("o_orderkey") % 89 != 1).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 101 == 5, F.col("o_totalprice") + 1.0
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    diff = MG.snapshot_diff(
        old, new, ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
    )
    return (
        diff.groupBy("change")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_keys"))
        .orderBy("change")
    )
