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
  FROM old o FULL OUTER JOIN new n
    ON o.o_orderkey IS NOT DISTINCT FROM n.o_orderkey
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


# Every multiply operand is pre-cast to DECIMAL(19,·): at 19 digits
# DuckDB leaves its int64 decimal fast path (p <= 18) for int128, which
# the sf0.1 sums overflow (Sq unscaled 1.5e9 -> Sq^2 = 2.3e18; caught by
# the r7 sf0.1 parity sweep).  19+19 = 38 keeps the product legal, and
# the unscaled products stay < 10^25 through sf100.  Values are
# unchanged — the casts only widen the physical type.
_CORR_TERM = (
    "CAST(CAST(CAST("
    "CAST(n AS DECIMAL(19,0)) * CAST(s{a}{b} AS DECIMAL(19,{sab}))"
    " - CAST(s{a} AS DECIMAL(19,{sa})) * CAST(s{b} AS DECIMAL(19,{sb}))"
    " AS DECIMAL(34,8)) AS VARCHAR) AS DOUBLE)"
)

_CORR_SCALE = {"q": 2, "d": 4, "t": 4}


def _corr_term_sql(a: str, b: str) -> str:
    return _CORR_TERM.format(
        a=a, b=b,
        sa=_CORR_SCALE[a], sb=_CORR_SCALE[b],
        sab=_CORR_SCALE[a] + _CORR_SCALE[b],
    )


_CORR_PAIR_SQL = """
  SELECT '{x}' AS var_x, '{y}' AS var_y, n,
         ROUND({num}
               / (sqrt({dx})
                  * sqrt({dy})), 6)
           AS corr
  FROM s"""

_CORR_ORACLE = (
    """
WITH s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CAST(l_quantity AS DECIMAL(6,2))) AS DECIMAL(14,2)) AS sq,
    CAST(SUM(CAST(l_discount AS DECIMAL(6,4))) AS DECIMAL(14,4)) AS sd,
    CAST(SUM(CAST(l_tax AS DECIMAL(6,4))) AS DECIMAL(14,4)) AS st,
    CAST(SUM(CAST(l_quantity AS DECIMAL(6,2)) * CAST(l_quantity AS DECIMAL(6,2)))
         AS DECIMAL(20,4)) AS sqq,
    CAST(SUM(CAST(l_discount AS DECIMAL(6,4)) * CAST(l_discount AS DECIMAL(6,4)))
         AS DECIMAL(20,8)) AS sdd,
    CAST(SUM(CAST(l_tax AS DECIMAL(6,4)) * CAST(l_tax AS DECIMAL(6,4)))
         AS DECIMAL(20,8)) AS stt,
    CAST(SUM(CAST(l_quantity AS DECIMAL(6,2)) * CAST(l_discount AS DECIMAL(6,4)))
         AS DECIMAL(20,6)) AS sqd,
    CAST(SUM(CAST(l_quantity AS DECIMAL(6,2)) * CAST(l_tax AS DECIMAL(6,4)))
         AS DECIMAL(20,6)) AS sqt,
    CAST(SUM(CAST(l_discount AS DECIMAL(6,4)) * CAST(l_tax AS DECIMAL(6,4)))
         AS DECIMAL(20,8)) AS sdt
  FROM lineitem
)
"""
    + "\nUNION ALL".join(
        _CORR_PAIR_SQL.format(
            x=x, y=y,
            num=_corr_term_sql(x, y),
            dx=_corr_term_sql(x, x),
            dy=_corr_term_sql(y, y),
        )
        for x, y in (("q", "d"), ("q", "t"), ("d", "t"))
    )
    + "\nORDER BY var_x, var_y\n"
)


@register(
    "lineitem_numeric_corr",
    _CORR_ORACLE,
    "quality", "profiling", "correlation", "agg",
)
def lineitem_numeric_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of lineitem's (quantity, discount,
    tax) from EXACT decimal moment sums in ONE aggregate pass — the
    numeric-profile companion to star_constraint_audit (a correlation
    that jumps between snapshots is a drift alarm).

    Cross-engine parity: every moment folds as an exact decimal (inputs
    are exact at 2/4 decimals); the corr terms n·Sxy − Sx·Sy stay exact
    decimals (≤ precision 38), and the decimal→double hop goes THROUGH A
    STRING (CAST(dec AS STRING) AS DOUBLE): both engines' string→double
    is correctly rounded, sidestepping DuckDB's inexact wide-decimal→
    double cast (the q1 sum_charge gotcha, where unscaled > 2^53).  sqrt
    is IEEE-correctly-rounded, so the final doubles are bit-identical.

    The oracle pre-casts every multiply operand to DECIMAL(19,·): at
    sf0.1 the moment sums overflow DuckDB's int64 decimal fast path
    (p ≤ 18) during Sx·Sy — a physical-width failure, not a value
    divergence — and 19 digits force the int128 path with unscaled
    headroom through sf100 (found by the r7 sf0.1 parity sweep).
    """
    li = _t(spark, sf_dir, "lineitem")
    qd = F.col("l_quantity").cast("decimal(6,2)")
    dd = F.col("l_discount").cast("decimal(6,4)")
    td = F.col("l_tax").cast("decimal(6,4)")
    s = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(qd).cast("decimal(14,2)").alias("sq"),
        F.sum(dd).cast("decimal(14,4)").alias("sd"),
        F.sum(td).cast("decimal(14,4)").alias("st"),
        F.sum(qd * qd).cast("decimal(20,4)").alias("sqq"),
        F.sum(dd * dd).cast("decimal(20,8)").alias("sdd"),
        F.sum(td * td).cast("decimal(20,8)").alias("stt"),
        F.sum(qd * dd).cast("decimal(20,6)").alias("sqd"),
        F.sum(qd * td).cast("decimal(20,6)").alias("sqt"),
        F.sum(dd * td).cast("decimal(20,8)").alias("sdt"),
    )

    def _dbl(expr):
        # decimal -> string -> double: correctly rounded on both engines
        return expr.cast("decimal(34,8)").cast("string").cast("double")

    def _corr(x: str, y: str):
        n10 = F.col("n").cast("decimal(10,0)")
        num = _dbl(n10 * F.col(f"s{x}{y}") - F.col(f"s{x}") * F.col(f"s{y}"))
        dx = _dbl(n10 * F.col(f"s{x}{x}") - F.col(f"s{x}") * F.col(f"s{x}"))
        dy = _dbl(n10 * F.col(f"s{y}{y}") - F.col(f"s{y}") * F.col(f"s{y}"))
        return F.round(num / (F.sqrt(dx) * F.sqrt(dy)), 6)

    # One row per pair via explode-of-structs, NOT a union of selects: a
    # union duplicates the aggregate subtree per branch and Spark scans
    # lineitem three times (caught by
    # tests/test_plans.py::test_corr_scan_prunes_to_three_columns).
    pairs = [("q", "d"), ("q", "t"), ("d", "t")]
    rows = F.array(
        *[
            F.struct(
                F.lit(x).alias("var_x"),
                F.lit(y).alias("var_y"),
                F.col("n").alias("n"),
                _corr(x, y).alias("corr"),
            )
            for x, y in pairs
        ]
    )
    return (
        s.select(F.explode(rows).alias("_r"))
        .select("_r.*")
        .orderBy("var_x", "var_y")
    )


_PSI_SPLIT = "1998-01-01 00:00:00"


@register(
    "orders_price_psi",
    f"""
WITH binned AS (
  SELECT LEAST(CAST(FLOOR(o_totalprice / 100000) AS INT), 4) AS bin,
         CASE WHEN o_orderdate < TIMESTAMP '{_PSI_SPLIT}' THEN 1 ELSE 0 END AS is_ref
  FROM orders
),
counts AS (
  SELECT bin,
         CAST(SUM(is_ref) AS BIGINT) AS n_ref,
         CAST(SUM(1 - is_ref) AS BIGINT) AS n_cur
  FROM binned GROUP BY bin
),
tot AS (
  SELECT CAST(SUM(n_ref) AS BIGINT) AS tr, CAST(SUM(n_cur) AS BIGINT) AS tc
  FROM counts
),
terms AS (
  SELECT c.bin, c.n_ref, c.n_cur,
         GREATEST(CAST(c.n_ref AS DOUBLE) / CAST(t.tr AS DOUBLE), 0.000001) AS p,
         GREATEST(CAST(c.n_cur AS DOUBLE) / CAST(t.tc AS DOUBLE), 0.000001) AS q
  FROM counts c, tot t
),
scored AS (
  SELECT bin, n_ref, n_cur,
         ROUND(p, 6) AS p_ref, ROUND(q, 6) AS p_cur,
         CAST(ROUND((p - q) * ROUND(ln(p / q), 6), 8) AS DECIMAL(12,8)) AS term
  FROM terms
),
total AS (
  SELECT ROUND(CAST(CAST(SUM(term) AS DECIMAL(14,8)) AS DOUBLE), 6) AS psi_total
  FROM scored
)
SELECT s.bin, s.n_ref, s.n_cur, s.p_ref, s.p_cur,
       CAST(s.term AS DOUBLE) AS psi_term, t.psi_total
FROM scored s, total t
ORDER BY s.bin
""",
    "quality", "drift", "psi", "agg",
)
def orders_price_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the pre- and post-1998 order
    price distributions over fixed 100k-wide bins — the standard
    production drift gate for a scoring pipeline (PSI > 0.2 = retrain).

    ONE conditional aggregate builds both periods' histograms (no second
    scan); the PSI fold is bin-count-sized.  Fixed bins (not quantile
    boundaries) keep the gate deterministic AND cross-engine exact: bin
    shares are IEEE int/int divisions, the single ln rounds at 6 before
    the term product, each term rounds at 8 into an exact decimal fold.
    1e-6 clamping guards empty bins with identical literals on both
    engines.

    ln-boundary margin (the unigram lesson, applied as MEASURED margin
    instead of hope): unlike the unigram fold — thousands of ln terms
    summed, where one near-boundary term sank the hash twice — this
    entry evaluates exactly 5 ln values.  Measured at the driver's
    sf0.01: the closest ln(p/q) sits 0.063 rounding-quanta from its
    6-decimal boundary (6.3e-8 absolute) and the closest term 0.063
    quanta from its 8-decimal boundary, vs a worst-case libm divergence
    ~1e-15 — a ≥10^6 safety factor, so no engine build can flip a
    retained digit here."""
    orders = _t(spark, sf_dir, "orders")
    binned = orders.select(
        F.least(
            F.floor(F.col("o_totalprice") / 100000).cast("int"), F.lit(4)
        ).alias("bin"),
        F.when(
            F.col("o_orderdate") < F.lit(_PSI_SPLIT).cast("timestamp"), 1
        )
        .otherwise(0)
        .alias("is_ref"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum("is_ref").cast("bigint").alias("n_ref"),
        F.sum(1 - F.col("is_ref")).cast("bigint").alias("n_cur"),
    )
    tot = counts.agg(
        F.sum("n_ref").cast("bigint").alias("tr"),
        F.sum("n_cur").cast("bigint").alias("tc"),
    )
    p = F.greatest(
        F.col("n_ref").cast("double") / F.col("tr").cast("double"),
        F.lit(0.000001),
    )
    q = F.greatest(
        F.col("n_cur").cast("double") / F.col("tc").cast("double"),
        F.lit(0.000001),
    )
    scored = counts.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_ref",
        "n_cur",
        F.round(p, 6).alias("p_ref"),
        F.round(q, 6).alias("p_cur"),
        F.round((p - q) * F.round(F.log(p / q), 6), 8)
        .cast("decimal(12,8)")
        .alias("term"),
    )
    total = scored.agg(
        F.round(
            F.sum("term").cast("decimal(14,8)").cast("double"), 6
        ).alias("psi_total")
    )
    return (
        scored.crossJoin(F.broadcast(total))
        .select(
            "bin",
            "n_ref",
            "n_cur",
            "p_ref",
            "p_cur",
            F.col("term").cast("double").alias("psi_term"),
            "psi_total",
        )
        .orderBy("bin")
    )


@register(
    "orders_status_priority_chi2",
    """
WITH obs AS (
  SELECT o_orderstatus AS s, o_orderpriority AS p,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM orders GROUP BY 1, 2
),
rt AS (SELECT s, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY s),
ct AS (SELECT p, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY p),
nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
              CAST(COUNT(DISTINCT s) AS BIGINT) AS ns,
              CAST(COUNT(DISTINCT p) AS BIGINT) AS np
       FROM obs),
terms AS (
  SELECT CAST(ROUND(
           (CAST(o.o AS DOUBLE)
            - CAST(rt.r AS DOUBLE) * CAST(ct.c AS DOUBLE) / CAST(nn.n AS DOUBLE))
           * (CAST(o.o AS DOUBLE)
              - CAST(rt.r AS DOUBLE) * CAST(ct.c AS DOUBLE) / CAST(nn.n AS DOUBLE))
           / (CAST(rt.r AS DOUBLE) * CAST(ct.c AS DOUBLE) / CAST(nn.n AS DOUBLE)),
           8) AS DECIMAL(16,8)) AS term
  FROM obs o JOIN rt ON o.s = rt.s JOIN ct ON o.p = ct.p, nn
)
SELECT ROUND(CAST(CAST(SUM(term) AS DECIMAL(18,8)) AS DOUBLE), 6) AS chi2,
       (SELECT (ns - 1) * (np - 1) FROM nn) AS dof,
       (SELECT n FROM nn) AS n
FROM terms
""",
    "quality", "statistics", "chi-square", "agg",
)
def orders_status_priority_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test between order status and
    priority — the categorical companion to lineitem_numeric_corr (a
    dependence that appears between snapshots is drift; on this synthetic
    data the two columns are independent, so chi2 ~ dof).

    One contingency aggregate (|s|x|p| cells), marginals re-folded from
    the cell frame (no table rescan), expected counts as IEEE-exact
    double expressions with identical association order; per-cell terms
    round at 8 into an exact decimal fold, chi2 rounds at 6."""
    orders = _t(spark, sf_dir, "orders")
    obs = orders.groupBy(
        F.col("o_orderstatus").alias("s"), F.col("o_orderpriority").alias("p")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    rt = obs.groupBy("s").agg(F.sum("o").cast("bigint").alias("r"))
    ct = obs.groupBy("p").agg(F.sum("o").cast("bigint").alias("c"))
    nn = obs.agg(
        F.sum("o").cast("bigint").alias("n"),
        F.count_distinct("s").cast("bigint").alias("ns"),
        F.count_distinct("p").cast("bigint").alias("np"),
    )
    exp = (
        F.col("r").cast("double")
        * F.col("c").cast("double")
        / F.col("n").cast("double")
    )
    term = F.round(
        (F.col("o").cast("double") - exp)
        * (F.col("o").cast("double") - exp)
        / exp,
        8,
    ).cast("decimal(16,8)")
    terms = (
        obs.join(rt, "s")
        .join(ct, "p")
        .crossJoin(F.broadcast(nn))
        .select(term.alias("term"), "ns", "np", "n")
    )
    return terms.agg(
        F.round(
            F.sum("term").cast("decimal(18,8)").cast("double"), 6
        ).alias("chi2"),
        ((F.first("ns") - 1) * (F.first("np") - 1)).alias("dof"),
        F.first("n").alias("n"),
    )


@register(
    "orders_price_ks",
    f"""
WITH binned AS (
  SELECT LEAST(CAST(FLOOR(o_totalprice / 5000) AS INT), 99) AS bin,
         CASE WHEN o_orderdate < TIMESTAMP '{_PSI_SPLIT}' THEN 1 ELSE 0 END AS is_ref
  FROM orders
),
counts AS (
  SELECT bin,
         CAST(SUM(is_ref) AS BIGINT) AS n_ref,
         CAST(SUM(1 - is_ref) AS BIGINT) AS n_cur
  FROM binned GROUP BY bin
),
tot AS (
  SELECT CAST(SUM(n_ref) AS BIGINT) AS tr, CAST(SUM(n_cur) AS BIGINT) AS tc
  FROM counts
),
cum AS (
  SELECT bin,
         CAST(SUM(n_ref) OVER (ORDER BY bin
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cr,
         CAST(SUM(n_cur) OVER (ORDER BY bin
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cc
  FROM counts
)
SELECT ROUND(MAX(ABS(CAST(cum.cr AS DOUBLE) / CAST(tot.tr AS DOUBLE)
                     - CAST(cum.cc AS DOUBLE) / CAST(tot.tc AS DOUBLE))), 6)
         AS ks_stat,
       (SELECT tr FROM tot) AS n_ref,
       (SELECT tc FROM tot) AS n_cur
FROM cum, tot
""",
    "quality", "drift", "ks-test", "window", "agg",
)
def orders_price_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned two-sample Kolmogorov–Smirnov statistic between the pre-
    and post-1998 price distributions — the distribution-SHAPE drift
    companion to orders_price_psi (PSI weighs density ratios; KS catches
    location/shape shifts PSI's coarse bins can smear).

    The exact KS statistic needs a global sort of all scores — the
    single-partition anti-pattern at 100 TB — so the production form IS
    the binned one: a 100-bin conditional-aggregate histogram (one scan,
    map-side fold), cumulative shares via a window over the BIN frame
    (≤100 rows, cost-free), max-abs-difference fold.  Bin shares are
    IEEE-exact int/int divisions; the max of identically-rounded doubles
    is engine-exact."""
    orders = _t(spark, sf_dir, "orders")
    from pyspark.sql import Window

    binned = orders.select(
        F.least(
            F.floor(F.col("o_totalprice") / 5000).cast("int"), F.lit(99)
        ).alias("bin"),
        F.when(
            F.col("o_orderdate") < F.lit(_PSI_SPLIT).cast("timestamp"), 1
        )
        .otherwise(0)
        .alias("is_ref"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum("is_ref").cast("bigint").alias("n_ref"),
        F.sum(1 - F.col("is_ref")).cast("bigint").alias("n_cur"),
    )
    tot = counts.agg(
        F.sum("n_ref").cast("bigint").alias("tr"),
        F.sum("n_cur").cast("bigint").alias("tc"),
    )
    wc = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.select(
        "bin",
        F.sum("n_ref").over(wc).cast("bigint").alias("cr"),
        F.sum("n_cur").over(wc).cast("bigint").alias("cc"),
    )
    diff = F.abs(
        F.col("cr").cast("double") / F.col("tr").cast("double")
        - F.col("cc").cast("double") / F.col("tc").cast("double")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.round(F.max(diff), 6).alias("ks_stat"),
            F.first("tr").alias("n_ref"),
            F.first("tc").alias("n_cur"),
        )
    )
