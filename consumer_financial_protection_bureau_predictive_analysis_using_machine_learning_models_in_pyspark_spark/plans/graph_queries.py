"""Graph-analytics pack: PageRank and triangle statistics over
co-occurrence graphs derived from the star schema (operators/graph.py).

- supplier_copurchase_pagerank: weighted PageRank over the supplier
  co-purchase graph (suppliers co-fulfilling an order are linked);
  oracled by a 3-iteration UNROLLED power iteration in SQL — the
  iterative loop itself is oracle-checked, not just its ingredients.
- part_copurchase_triangles: per-node triangle counts + local clustering
  coefficients over the PROMO-segment part co-purchase graph.

Oracle discipline (catalog.py header): edge shares and clustering ratios
are exact IEEE int/int divisions rounded at 6; rank state is ROUND(..,8)
DECIMAL(12,8) per iteration with identical literals and association order
on both engines; every decimal→double cast stays under the 2^53 exact
bound.  No libm anywhere (pure +,×,/), so cross-engine doubles are
bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import graph as G
from .catalog import _t, register

# One unrolled PageRank iteration as a SQL CTE block (DuckDB).  Kept in a
# Python format-template so the 3 oracle iterations cannot drift from each
# other — the same arithmetic the Spark operator performs per step.
_PR_ITER_SQL = """
dang{k} AS (
  SELECT CAST(COALESCE(SUM(r._r), 0) AS DECIMAL(14,8)) AS dm
  FROM r{p} r LEFT JOIN outw o ON r.node = o.src
  WHERE o.src IS NULL
),
c{k} AS (
  SELECT s.dst AS node,
         CAST(SUM(CAST(r._r AS DECIMAL(10,8)) * s.sh) AS DECIMAL(14,12)) AS c
  FROM r{p} r JOIN share s ON r.node = s.src
  GROUP BY s.dst
),
r{k} AS (
  SELECT n.node,
         CAST(ROUND(0.15 / nn.n
                    + 0.85 * (CAST(COALESCE(c.c, 0) AS DOUBLE)
                              + CAST(d.dm AS DOUBLE) / nn.n), 8)
              AS DECIMAL(12,8)) AS _r
  FROM nodes n LEFT JOIN c{k} c ON n.node = c.node, nn, dang{k} d
)"""

_PR_ORACLE = (
    """
WITH os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
e AS (
  SELECT a.l_suppkey AS src, b.l_suppkey AS dst,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM os a JOIN os b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
  GROUP BY 1, 2
),
outw AS (SELECT src, SUM(w) AS wtot FROM e GROUP BY src),
share AS (
  SELECT e.src, e.dst,
         CAST(ROUND(CAST(e.w AS DOUBLE) / CAST(o.wtot AS DOUBLE), 6)
              AS DECIMAL(8,6)) AS sh
  FROM e JOIN outw o ON e.src = o.src
),
nodes AS (SELECT DISTINCT s_suppkey AS node FROM supplier),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
r0 AS (
  SELECT node, CAST(ROUND(1.0 / nn.n, 8) AS DECIMAL(12,8)) AS _r
  FROM nodes, nn
),"""
    + ",".join(_PR_ITER_SQL.format(k=k, p=k - 1) for k in (1, 2, 3))
    + """
SELECT node AS s_suppkey, ROUND(CAST(_r AS DOUBLE), 6) AS pagerank
FROM r3
ORDER BY s_suppkey
"""
)


@register(
    "supplier_copurchase_pagerank",
    _PR_ORACLE,
    "graph", "pagerank", "iterative", "join", "agg",
)
def supplier_copurchase_pagerank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weighted PageRank (3 power iterations, damping 0.85, dangling-mass
    redistribution) over the supplier co-purchase graph: suppliers are
    linked when they co-fulfil an order, weighted by how often.

    The edge build self-joins the (order, supplier) incidence list
    co-located on the order key — fan-out bounded by order width (≤7
    lineitems in TPC-H), never all-pairs.  Each iteration is one
    edge-linear (rank ⋈ share) shuffle plus a node-keyed aggregate; rank
    frames are node-sized, persisted per step with the predecessor
    unpersisted, so lineage stays O(1)-deep at any iteration count.  The
    oracle unrolls the identical arithmetic as 3 SQL CTE blocks — the
    loop's VALUES are hash-checked, which is rare for iterative
    algorithms (components/LDA get rows-only checks).
    """
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    edges = G.co_occurrence_edges(li, "l_suppkey", "l_orderkey")
    return (
        G.pagerank(
            sup.select(F.col("s_suppkey").alias("node")),
            edges,
            node_col="node",
            damping=0.85,
            n_iter=3,
        )
        .select(F.col("node").alias("s_suppkey"), "pagerank")
        .orderBy("s_suppkey")
    )


@register(
    "part_copurchase_triangles",
    """
WITH promo AS (SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
op AS (
  SELECT DISTINCT l.l_orderkey, l.l_partkey
  FROM lineitem l JOIN promo p ON l.l_partkey = p.p_partkey
),
e0 AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v FROM e0
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
  FROM (SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
  GROUP BY node
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM und e1
  JOIN und e2 ON e1.v = e2.u
  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
),
corners AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM (SELECT a AS node FROM tri
        UNION ALL SELECT b AS node FROM tri
        UNION ALL SELECT c AS node FROM tri)
  GROUP BY node
)
SELECT d.node AS p_partkey, d.degree,
       CAST(COALESCE(c.n_triangles, 0) AS BIGINT) AS n_triangles,
       CASE WHEN d.degree >= 2
            THEN ROUND(2.0 * CAST(COALESCE(c.n_triangles, 0) AS DOUBLE)
                       / (CAST(d.degree AS DOUBLE)
                          * (CAST(d.degree AS DOUBLE) - 1.0)), 6)
            ELSE 0.0 END AS clustering
FROM deg d LEFT JOIN corners c ON d.node = c.node
ORDER BY p_partkey
""",
    "graph", "triangles", "self-join", "agg",
)
def part_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counts + local clustering coefficients over the
    PROMO-segment part co-purchase graph (parts bought together in one
    order are linked).

    The segment filter is the scale governor: the full part graph's wedge
    volume is Σ C(deg,2) ≈ 1.4e8 at sf0.1 (measured), while the 1/6
    PROMO slice cuts edges ~36x and wedges below 1e6 at every committed
    scale — the same move a production audit makes (triangle-count one
    segment at a time), not a fixture dodge.  All three joins are
    equi-keyed; each wedge is generated once from its middle-ranked
    vertex (u<v ordering), so no triangle is double-counted.
    """
    li = _t(spark, sf_dir, "lineitem")
    promo = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    # No forced broadcast: part is a scale-linear dim (SF·200k rows), so
    # the hint discipline (tests/test_plans.py fact-hint sweep) applies —
    # AQE picks broadcast at small scale on its own.
    incidence = li.join(
        promo, li["l_partkey"] == promo["p_partkey"], "left_semi"
    ).select("l_orderkey", "l_partkey")
    edges = G.co_occurrence_edges(incidence, "l_partkey", "l_orderkey")
    return (
        G.triangle_stats(edges)
        .select(
            F.col("node").alias("p_partkey"),
            "degree",
            "n_triangles",
            "clustering",
        )
        .orderBy("p_partkey")
    )


@register(
    "part_association_rules",
    """
WITH op AS (SELECT DISTINCT l_orderkey AS cont, l_partkey AS ent FROM lineitem),
nt AS (SELECT CAST(COUNT(DISTINCT cont) AS BIGINT) AS n FROM op),
pe AS (SELECT ent, CAST(COUNT(*) AS BIGINT) AS cnt FROM op GROUP BY ent),
und AS (
  SELECT a.ent AS u, b.ent AS v, CAST(COUNT(*) AS BIGINT) AS nab
  FROM op a JOIN op b ON a.cont = b.cont AND a.ent < b.ent
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
dir AS (
  SELECT u AS antecedent, v AS consequent, nab FROM und
  UNION ALL
  SELECT v AS antecedent, u AS consequent, nab FROM und
)
SELECT d.antecedent, d.consequent, d.nab AS n_both,
       ROUND(CAST(d.nab AS DOUBLE) / CAST(nt.n AS DOUBLE), 6) AS support,
       ROUND(CAST(d.nab AS DOUBLE) / CAST(na.cnt AS DOUBLE), 6) AS confidence,
       ROUND(CAST(d.nab AS DOUBLE) * CAST(nt.n AS DOUBLE)
             / (CAST(na.cnt AS DOUBLE) * CAST(nb.cnt AS DOUBLE)), 6) AS lift
FROM dir d
JOIN pe na ON d.antecedent = na.ent
JOIN pe nb ON d.consequent = nb.ent, nt
ORDER BY lift DESC, antecedent, consequent
LIMIT 50
""",
    "graph", "basket", "association-rules", "self-join", "agg", "topk",
)
def part_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 part-to-part association rules by lift
    (operators/graph.association_rules): the 2-itemset A-priori output —
    support / confidence / lift per directed rule, min pair count 2.

    The frequent-pair scan is the same bounded-fanout order-keyed
    self-join as the co-occurrence builder; the min_count filter prunes
    the singleton tail BEFORE the per-entity count joins, so only
    rule-worthy pairs reach them.  Ratios are exact int/int IEEE
    divisions rounded at 6; the global top-50 is orderBy+limit
    (TakeOrderedAndProject — per-partition local top-k, no single-task
    rank window)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        G.association_rules(
            li, "l_partkey", "l_orderkey", min_count=2, top_k=50
        )
    )


@register(
    "supplier_strong_components",
    """
WITH RECURSIVE os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
e AS (
  SELECT a.l_suppkey AS src, b.l_suppkey AS dst,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM os a JOIN os b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
  GROUP BY 1, 2
),
st AS (SELECT CAST(SUM(w) AS BIGINT) AS tw, CAST(COUNT(*) AS BIGINT) AS ne FROM e),
strong AS (
  SELECT src, dst FROM e, st WHERE 10 * e.w * st.ne >= 11 * st.tw
),
reach(src, dst) AS (
  SELECT src, dst FROM strong
  UNION
  SELECT r.src, s.dst FROM reach r JOIN strong s ON r.dst = s.src
),
comp AS (
  SELECT src AS node, LEAST(src, MIN(dst)) AS component
  FROM reach GROUP BY src
)
SELECT node AS s_suppkey, component FROM comp ORDER BY s_suppkey
""",
    "graph", "components", "community", "iterative",
)
def supplier_strong_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade communities: connected components over the STRONG co-purchase
    graph — edges whose weight sits at least 10% above the mean edge
    weight.  The strength cut is pure integer arithmetic
    (10·w·ne >= 11·tw — no division, so the threshold is exact on both
    engines and scale-free), and the component labels come from the same
    operators.dedup.connected_components min-label fixpoint the dedup
    family uses — one operator, two domains, one recursive-CTE oracle
    pattern.  Only suppliers with at least one strong edge participate
    (community of the strong graph, not the full vertex set)."""
    from ..operators import dedup as DD

    li = _t(spark, sf_dir, "lineitem")
    e = G.co_occurrence_edges(li, "l_suppkey", "l_orderkey")
    st = e.agg(
        F.sum("w").cast("bigint").alias("tw"),
        F.count(F.lit(1)).cast("bigint").alias("ne"),
    )
    strong = (
        e.crossJoin(F.broadcast(st))
        .filter(10 * F.col("w") * F.col("ne") >= 11 * F.col("tw"))
        .filter(F.col("src") < F.col("dst"))  # one direction for components
        .select(F.col("src").alias("doc_a"), F.col("dst").alias("doc_b"))
    )
    return (
        DD.connected_components(strong)
        .select(F.col("doc_id").alias("s_suppkey"), "component")
        .orderBy("s_suppkey")
    )


@register(
    "part_similar_items",
    """
WITH op AS (SELECT DISTINCT l_orderkey AS cont, l_partkey AS ent FROM lineitem),
pe AS (SELECT ent, CAST(COUNT(*) AS BIGINT) AS cnt FROM op GROUP BY ent),
und AS (
  SELECT a.ent AS u, b.ent AS v, CAST(COUNT(*) AS BIGINT) AS nab
  FROM op a JOIN op b ON a.cont = b.cont AND a.ent < b.ent
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
dir AS (
  SELECT u AS item, v AS neighbor, nab FROM und
  UNION ALL
  SELECT v AS item, u AS neighbor, nab FROM und
),
scored AS (
  SELECT d.item, d.neighbor, d.nab AS n_both,
         ROUND(CAST(d.nab AS DOUBLE)
               / (CAST(na.cnt AS DOUBLE) + CAST(nb.cnt AS DOUBLE)
                  - CAST(d.nab AS DOUBLE)), 6) AS jaccard
  FROM dir d
  JOIN pe na ON d.item = na.ent
  JOIN pe nb ON d.neighbor = nb.ent
),
ranked AS (
  SELECT item, neighbor, n_both, jaccard,
         CAST(row_number() OVER (PARTITION BY item
                                 ORDER BY jaccard DESC, neighbor) AS INT)
           AS rank
  FROM scored
)
SELECT item, neighbor, n_both, jaccard, rank
FROM ranked WHERE rank <= 5
ORDER BY item, rank
""",
    "graph", "similarity", "recommender", "window", "topk-per-group",
)
def part_similar_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item recommender table: for every part, its 5 most similar
    parts by order-set Jaccard (operators/graph.jaccard_similar_items) —
    the 'customers who bought X also bought Y' primitive.

    Per-group top-k via a window partitioned by the item (each item
    ranks only its own bounded candidate list — no global sort anywhere);
    min-count pruning keeps the singleton-pair tail out of the per-item
    joins, same discipline as part_association_rules."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        G.jaccard_similar_items(
            li, "l_partkey", "l_orderkey", top_k=5, min_count=2
        )
        .select(
            F.col("item"),
            F.col("neighbor"),
            "n_both",
            "jaccard",
            "rank",
        )
        .orderBy("item", "rank")
    )
