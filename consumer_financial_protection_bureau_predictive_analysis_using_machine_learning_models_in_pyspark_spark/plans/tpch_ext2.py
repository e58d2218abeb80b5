"""Second TPC-H-shaped breadth pack: the remaining distinct plan shapes.

Like ``tpch_ext``, each query keeps the physical-plan strategy the original
exercises while adapting predicates to the reduced star schema (no
``partsupp`` table — the distinct ``(l_partkey, l_suppkey)`` pairs from
``lineitem`` stand in as the part-supplier bridge; ``s_acctbal`` stands in
for supply cost; ship-delay buckets stand in for the missing ship modes):

- q2   → correlated MIN subquery → per-key min-agg joined back
- q9   → star-join profit rollup by nation × year
- q11  → group aggregate filtered against a GLOBAL scalar threshold
- q12  → CASE-conditional counts after a fact-fact equi-join
- q15  → aggregate → global MAX → equality join (top-supplier view)
- q16  → COUNT(DISTINCT) + NOT IN → broadcast ANTI join
- q20  → nested IN-subquery chain → semi-join ladder
- q21  → double-correlated EXISTS / NOT EXISTS → per-order aggregate rewrite

Scale posture: the part-supplier bridge is built once per query as a
DISTINCT over two int columns (narrow shuffle, text/measures never move);
every filtered dimension broadcasts; per-order / per-part correlated
subqueries are de-correlated into aggregate-and-join-back, which is both
the Catalyst-friendly form and the only form that scales (no nested-loop
re-execution per outer row).  Decimal folds keep numeric parity exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import register, _t

_PRICE = "CAST(l_extendedprice AS DECIMAL(14,2))"
_DISC1 = "CAST(1 - l_discount AS DECIMAL(8,4))"
_REV_SQL = f"SUM({_PRICE} * {_DISC1})"


def _rev_col() -> F.Column:
    price = F.col("l_extendedprice").cast("decimal(14,2)")
    disc1 = F.expr("CAST(1 - l_discount AS DECIMAL(8,4))")
    return F.sum(price * disc1)


def _bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (l_partkey, l_suppkey) pairs — the partsupp stand-in."""
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )


@register(
    "q2_min_cost_supplier",
    """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT s_acctbal, s_name, n_name, p_partkey
FROM ps
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_type = 'SMALL' AND p_size <= 15
  AND CAST(s_acctbal AS DECIMAL(12,2)) = (
    SELECT MIN(CAST(s2.s_acctbal AS DECIMAL(12,2)))
    FROM ps ps2 JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
    WHERE ps2.l_partkey = p_partkey
  )
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
    "join", "scalar-subquery", "top-k",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part minimum-cost supplier (s_acctbal stands in
    for ps_supplycost; the lineitem bridge for partsupp).

    The correlated MIN subquery de-correlates to a per-part min aggregate
    joined back — one extra narrow shuffle instead of a re-executed
    subquery per part.  The filtered part dim (~1% of parts) broadcasts
    into both the bridge scan and the min-agg, so only matching pairs are
    ever aggregated.  The per-part min aggregate carries NO broadcast
    hint: its cardinality is linear in scale factor (one row per filtered
    part), and both sides of the join-back are already keyed on partkey,
    so AQE co-partitions them (and may still choose broadcast at small
    SF).  Ties on the min keep every qualifying supplier (TPC-H
    semantics); the full ORDER BY makes LIMIT deterministic.
    """
    part = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_type") == "SMALL") & (F.col("p_size") <= 15))
        .select("p_partkey")
    )
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(_t(spark, sf_dir, "nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    pairs = (
        _bridge(spark, sf_dir)
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    bal = F.col("s_acctbal").cast("decimal(12,2)")
    min_bal = pairs.groupBy(F.col("p_partkey").alias("_pk")).agg(
        F.min(bal).alias("_min_bal")
    )
    return (
        pairs.join(min_bal, F.col("_pk") == F.col("p_partkey"))
        .filter(bal == F.col("_min_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register(
    "q9_profit_by_nation",
    f"""
SELECT n_name AS nation,
       CAST(YEAR(o_orderdate) AS INT) AS o_year,
       CAST({_REV_SQL} AS DOUBLE) AS profit
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN part     ON p_partkey = l_partkey
WHERE p_type = 'ECONOMY'
GROUP BY n_name, CAST(YEAR(o_orderdate) AS INT)
ORDER BY nation, o_year DESC
""",
    "join", "agg", "sort",
)
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per order-year over a
    5-table star join (discounted revenue stands in for the supplycost
    term partsupp would provide).

    The part filter (p_type) prunes the fact scan via the broadcast join;
    supplier⋈nation and the filtered part dim both broadcast, so lineitem
    shuffles exactly once — on l_orderkey against orders.  The agg keys
    (nation, year) are tiny, so the final agg is map-side heavy.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(_t(spark, sf_dir, "nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(_rev_col().cast("double").alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q11_important_parts",
    f"""
WITH v AS (
  SELECT l_partkey AS partkey, {_REV_SQL} AS val
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT partkey, CAST(val AS DOUBLE) AS part_value
FROM v
WHERE val * 1000 > (SELECT SUM(val) FROM v)
ORDER BY part_value DESC, partkey
""",
    "agg", "scalar-subquery",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value from one nation's suppliers, kept
    only when the part exceeds a FRACTION of the global total (group
    aggregate vs global scalar threshold).

    The per-part aggregate is computed once and reused for both sides:
    the global total is a 1-row re-aggregation broadcast back via
    cross-join — no second fact scan, no driver collect.  The threshold
    compare is decimal-exact on both engines (``val * 1000 > total``
    avoids a lossy fractional multiply).
    """
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    per_part = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(_rev_col().alias("val"))
    )
    total = per_part.agg(F.sum("val").alias("_total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("val") * F.lit(1000) > F.col("_total"))
        .select("partkey", F.col("val").cast("double").alias("part_value"))
        .orderBy(F.col("part_value").desc(), "partkey")
    )


@register(
    "q12_shipping_delay_class",
    """
SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                           CAST(l_shipdate AS DATE)) <= 30 THEN 'FAST'
            WHEN date_diff('day', CAST(o_orderdate AS DATE),
                           CAST(l_shipdate AS DATE)) <= 90 THEN 'MEDIUM'
            ELSE 'SLOW' END AS delay_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY delay_class
ORDER BY delay_class
""",
    "join", "conditional-agg",
)
def q12_shipping_delay_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: CASE-conditional counts by shipping class after an
    orders⋈lineitem equi-join (ship-delay buckets stand in for the missing
    l_shipmode; order priority keeps Q12's urgent/non-urgent split).

    Both fact tables shuffle once on the order key; the CASE expressions
    are pure column arithmetic inside the post-join projection, and the
    3-row group-by is map-side combined.
    """
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    delay = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    delay_class = (
        F.when(delay <= 30, "FAST").when(delay <= 90, "MEDIUM").otherwise("SLOW")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    one_if = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy(delay_class.alias("delay_class"))
        .agg(
            one_if(high).alias("high_line_count"),
            one_if(~high).alias("low_line_count"),
        )
        .orderBy("delay_class")
    )


@register(
    "q15_top_supplier",
    f"""
WITH rev AS (
  SELECT l_suppkey AS supplier_no, {_REV_SQL} AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM supplier JOIN rev ON s_suppkey = supplier_no
WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
ORDER BY s_suppkey
""",
    "agg", "scalar-subquery", "join",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarter revenue per supplier, return the supplier(s)
    hitting the global maximum (aggregate → global MAX → equality join —
    the view-based formulation).

    The revenue aggregate is computed once; its 1-row MAX re-aggregation
    broadcasts back (no window over a single global partition, no
    collect).  Decimal equality makes the max-match exact on both engines.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _rev_col().alias("total_rev")
    )
    max_rev = rev.agg(F.max("total_rev").alias("_max_rev"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_rev") == F.col("_max_rev"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_part_count",
    """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#45'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
    "count-distinct", "anti-join", "agg",
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute triple,
    excluding a supplier denylist (NOT IN → broadcast LEFT ANTI join;
    negative account balance stands in for the complaints-comment filter).

    COUNT(DISTINCT) over the already-distinct bridge pairs means Spark's
    distinct-expansion shuffle carries rows that are unique by
    construction; the denylist is a tiny broadcast anti-join applied
    before the aggregate so excluded pairs never shuffle.
    """
    part = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#45")
            & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        _bridge(spark, sf_dir)
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_potential_promotion",
    """
WITH pq AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(14,2))) AS pair_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'STANDARD')
  GROUP BY l_partkey, l_suppkey
),
tot AS (
  SELECT l_partkey AS t_partkey, SUM(pair_qty) AS part_qty FROM pq
  GROUP BY l_partkey
)
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
WHERE n_name = 'NATION_2'
  AND s_suppkey IN (
    SELECT l_suppkey FROM pq JOIN tot ON t_partkey = l_partkey
    WHERE pair_qty * 2 > part_qty
  )
ORDER BY s_name
""",
    "semi-join", "scalar-subquery", "agg",
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation holding a MAJORITY share of
    some standard part's 1997 shipped volume (the nested IN-subquery ladder;
    pair-share-vs-part-total stands in for ps_availqty > 0.5·sum(qty)).

    The IN chain de-correlates bottom-up: filtered part keys broadcast into
    the fact scan (partition-pruned by the ship-date predicate), one narrow
    (part, supp) aggregate feeds a per-part re-aggregate joined back, and
    the qualifying supplier keys flow upward as a LEFT SEMI join — no
    subquery is ever re-executed per outer row.  Decimal quantity sums keep
    the 2×-share comparison exact on both engines.
    """
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    pq = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(14,2)")).alias("pair_qty"))
    )
    tot = pq.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("pair_qty").alias("part_qty")
    )
    winners = (
        pq.join(tot, F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.col("pair_qty") * 2 > F.col("part_qty"))
        .select("l_suppkey")
    )
    return (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(winners, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "q21_waiting_suppliers",
    """
WITH lo AS (
  SELECT l_orderkey, l_suppkey,
         (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS is_late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
)
SELECT s_name, COUNT(*) AS numwait
FROM lo l1
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE n_name = 'NATION_1'
  AND l1.is_late
  AND EXISTS (SELECT 1 FROM lo l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lo l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.is_late)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
    "semi-join", "anti-join", "agg",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper in a
    multi-supplier finished order (double-correlated EXISTS / NOT EXISTS;
    shipping >60 days after the order date stands in for the missing
    receipt-vs-commit lateness).

    The two correlated subqueries de-correlate into ONE per-order
    aggregate — distinct suppliers and distinct LATE suppliers — joined
    back to the late lines: EXISTS(other supplier) ⇔ n_supp > 1, and
    NOT EXISTS(other late supplier) ⇔ n_late_supp = 1 (the late line's
    own supplier is the one).  One narrow shuffle on l_orderkey replaces
    two subquery re-executions; the nation-filtered supplier dim
    broadcasts at the end so per-order state never carries names.
    """
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    lo = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).alias("is_late"),
        )
    )
    per_order = lo.groupBy(F.col("l_orderkey").alias("_ok")).agg(
        F.countDistinct("l_suppkey").alias("_n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "_n_late_supp"
        ),
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        lo.filter(F.col("is_late"))
        .join(per_order, F.col("_ok") == F.col("l_orderkey"))
        .filter((F.col("_n_supp") > 1) & (F.col("_n_late_supp") == 1))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
