"""TPC-H-shaped relational breadth pack (adapted to the reduced star schema).

The driver's tables are TPC-H-ish but drop several columns (no ``partsupp``
table, no ``l_commitdate``/``l_receiptdate``/``l_shipmode``, no
``c_phone``/comments), so each query keeps the *shape* — and therefore the
physical-plan strategy it is meant to exercise — while adapting predicates
to columns that exist:

- q4   → left SEMI join with a non-equi component (EXISTS rewrite)
- q7   → multi-way join with a symmetric nation-pair disjunction
- q8   → market-share ratio (conditional agg over a 6-table join)
- q10  → join + agg + deterministic top-k (returned-item revenue)
- q13  → LEFT OUTER join + two-level aggregation (count distribution)
- q14  → conditional-numerator ratio over a part join
- q17  → per-key scalar-subquery rewrite as broadcast avg-join
- q19  → disjunctive predicate pushed through an equi-join
- q22  → ANTI join + global scalar subquery via broadcast cross-join

Scale posture: every dimension side that survives its filter is tiny
relative to ``lineitem``/``orders`` and is explicitly broadcast; the big
fact tables only ever shuffle on their join keys.  Numeric parity follows
the catalog conventions (decimal folds for sums, ROUND(...,6) after double
division, every column aliased identically in Spark and oracle SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import skew
from .catalog import register, _t

# Exact decimal folds shared by every revenue aggregate below (same
# convention as q1_pricing_summary — both engines sum decimals exactly).
_PRICE = "CAST(l_extendedprice AS DECIMAL(14,2))"
_DISC1 = "CAST(1 - l_discount AS DECIMAL(8,4))"
_REV_SQL = f"SUM({_PRICE} * {_DISC1})"


def _rev_col() -> F.Column:
    price = F.col("l_extendedprice").cast("decimal(14,2)")
    disc1 = F.expr("CAST(1 - l_discount AS DECIMAL(8,4))")
    return F.sum(price * disc1)


@register(
    "q4_order_priority",
    """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    "semi-join", "agg",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → LEFT SEMI join (late-shipped lines stand in
    for the missing commit/receipt dates).

    The semi join deduplicates matches engine-side — no distinct needed —
    and only (l_orderkey, l_shipdate) is scanned from the fact table.
    """
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    late = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        orders.join(late, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q7_volume_shipping",
    f"""
SELECT supp_nation, cust_nation, l_year,
       CAST({_REV_SQL} AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(YEAR(l_shipdate) AS INT) AS l_year,
         l_extendedprice, l_discount
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
) sq
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    "join", "agg", "sort",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between a nation pair.

    Both nation lookups broadcast; ``supplier`` and ``customer`` broadcast
    after their nation filters (they shrink to ~1/12 of an already-small
    dim).  The only large shuffle is lineitem↔orders on the orderkey.
    """
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk")
    )
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    joined = (
        li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_rev_col().cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    f"""
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                           ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
         CAST({_PRICE} * {_DISC1} AS DECIMAL(18,6)) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'REGION_0' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
) sq
GROUP BY o_year
ORDER BY o_year
""",
    "join", "agg", "conditional",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional volume per year.

    Classic star join: the filtered ``part`` and the customer-side
    region-restricted dim both broadcast against lineitem; the supplier
    nation rides along as a broadcast lookup for the CASE numerator.
    """
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "REGION_0")
    cust_nat = (
        nation.join(
            F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
        ).select(F.col("n_nationkey").alias("c_nk"))
    )
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(cust_nat), F.col("c_nationkey") == F.col("c_nk")
    ).select("c_custkey")
    supp_nat = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(supp_nat), F.col("s_nationkey") == F.col("s_nk")
    ).select("s_suppkey", "nation")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(14,2)")
    disc1 = F.expr("CAST(1 - l_discount AS DECIMAL(8,4))")
    joined = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .withColumn("volume", (price * disc1).cast("decimal(18,6)"))
    )
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        joined.groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(
                        zero
                    )
                ).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q10_returned_items",
    f"""
SELECT c_custkey, c_name, CAST({_REV_SQL} AS DOUBLE) AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    "join", "agg", "top-k",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue.

    Orders are quarter-filtered before the join (partition-prunable at
    scale); nation broadcasts; the deterministic c_custkey tiebreak makes
    the LIMIT stable across engines.  TakeOrderedAndProject keeps the
    top-k per partition — no global sort materializes.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    nation = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey"), F.col("n_name")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_rev_col().cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q13_customer_distribution",
    """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) sq
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    "outer-join", "agg",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count distribution incl. zero-order customers.

    The LEFT OUTER join keeps customers with no (non-urgent) orders;
    COUNT(o_orderkey) counts only non-null matches, so those customers land
    in the c_count=0 bucket.  The priority predicate (stand-in for the
    original comment filter) is pushed to the orders scan — legal because
    it references only the preserved-side-null input.
    """
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q14_promo_effect",
    f"""
SELECT ROUND(
  100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                        THEN CAST({_PRICE} * {_DISC1} AS DECIMAL(18,6))
                        ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
        / CAST(SUM(CAST({_PRICE} * {_DISC1} AS DECIMAL(18,6))) AS DOUBLE),
  6) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
""",
    "join", "agg", "conditional",
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one month.

    ``part`` broadcasts (two columns after pruning); the month filter
    reaches the lineitem scan; one conditional aggregate — no second pass
    for the denominator.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    price = F.col("l_extendedprice").cast("decimal(14,2)")
    disc1 = F.expr("CAST(1 - l_discount AS DECIMAL(8,4))")
    vol = (price * disc1).cast("decimal(18,6)")
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(zero)).cast(
                    "double"
                )
                / F.sum(vol).cast("double"),
                6,
            ).alias("promo_revenue")
        )
    )


# q17: broadcast the per-part aggregate only when the filtered PART dim
# (an exact upper bound on the aggregate's row count) is provably small.
# Patchable in tests to prove the gate actually disables the hint.
Q17_BROADCAST_MAX_PARTS = 2_000_000


@register(
    "q17_small_quantity_revenue",
    """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) / 7.0, 4)
       AS DOUBLE) AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (
  SELECT l_partkey AS a_partkey,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY l_partkey
) a ON a_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND CAST(l_quantity AS DECIMAL(12,2)) * 5 * cnt < sum_qty
""",
    "join", "agg", "scalar-subquery",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from below-average-quantity lines.

    The correlated scalar subquery (0.2 × per-part avg quantity) is
    rewritten as a per-part aggregate joined back — the standard Spark
    de-correlation — and the comparison is folded to exact integers/
    decimals (qty × 5 × cnt < sum_qty) so both engines agree bit-for-bit.

    The per-part agg has one row per brand-filtered part — linear in
    scale factor, so a *forced* broadcast would eventually OOM the
    driver.  Its broadcast hint is therefore conditional (the
    canonical_docs pattern, operators/dedup.py): one cheap count of the
    filtered PART dim — which exactly bounds the aggregate's cardinality
    without touching lineitem — gates the hint; above the threshold the
    join-back is left unhinted and AQE co-partitions both sides on
    partkey (picking broadcast itself if the runtime size allows).
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23").select(
        "p_partkey"
    )
    qty = F.col("l_quantity").cast("decimal(12,2)")
    per_part = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("a_partkey"))
        .agg(F.sum(qty).alias("sum_qty"), F.count(F.lit(1)).alias("cnt"))
    )
    # |per_part| <= |filtered part| (one row per part seen in lineitem);
    # counting the narrow dim is a pushdown scan, not a lineitem pass.
    per_part = skew.broadcast_if_bounded(
        per_part, part.count(), Q17_BROADCAST_MAX_PARTS
    )
    small = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("a_partkey") == F.col("l_partkey"))
        .filter(qty * F.lit(5) * F.col("cnt") < F.col("sum_qty"))
    )
    return small.agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(14,2)")) / F.lit(7.0), 4
        )
        .cast("double")
        .alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q19_disjunctive_revenue",
    f"""
SELECT CAST({_REV_SQL} AS DOUBLE) AS revenue, COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 20 AND l_quantity <= 30)
""",
    "join", "disjunction",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR of three conjunctive brand/size/quantity clauses.

    Written as an equi-join on partkey with the disjunction as a post-join
    filter; Catalyst additionally derives the implied single-side filters
    (p_brand IN (...), p_size <= 15, quantity range) and pushes them into
    both scans, so the join sees pre-shrunk inputs — the point of Q19.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    clause = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
           & (q >= 20) & (q <= 30))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(clause)
        .agg(
            _rev_col().cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q22_sales_opportunity",
    """
SELECT c_mktsegment,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
  AND c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
    FROM customer
    WHERE c_acctbal > 0.0
      AND c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
  )
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    "anti-join", "scalar-subquery", "agg",
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers with no orders, per segment
    (market segment stands in for the missing phone country code).

    The global scalar subquery becomes a 1-row broadcast cross-join (no
    collect — the threshold never touches the driver); NOT EXISTS becomes a
    LEFT ANTI join on o_custkey.  The exact-decimal sum / count division is
    performed identically on both engines, so the threshold comparison is
    bit-stable.
    """
    segs = ("BUILDING", "AUTOMOBILE", "MACHINERY")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment").isin(*segs))
    bal = F.col("c_acctbal").cast("decimal(12,2)")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(bal).cast("double") / F.count(F.lit(1))).alias("_avg_bal")
    )
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(bal).cast("double").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )
