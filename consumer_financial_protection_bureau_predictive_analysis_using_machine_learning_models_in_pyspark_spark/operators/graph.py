"""Graph analytics over co-occurrence graphs: weighted PageRank and
triangle counting / clustering coefficients.

The reference's pipelines stop at flat-table ML (SURVEY §2.9); these
operators extend the engine to the graph-shaped curation signals a
training-data pipeline needs — entity importance ranking (PageRank over a
co-occurrence graph) and community density (triangles / clustering
coefficient), both expressed as pure DataFrame plans so Catalyst plans the
joins and AQE handles skew.

Scale posture (100 TB):
- Edge construction from an (entity, container) incidence list is a
  self-join co-located on the container key; per-container fan-out is
  bounded by container size (TPC-H orders: ≤7 lineitems), so the join
  output is O(rows x container_width), never all-pairs.
- PageRank iterations touch only node-sized frames after the one-time
  edge-share build: each step is one (rank ⋈ share) shuffle on src plus a
  node-keyed aggregate — the textbook power-iteration data layout.  Rank
  frames are persisted per iteration (and the predecessor unpersisted) so
  the lineage never re-runs earlier iterations — depth stays O(1) at any
  iteration count, so no checkpointing is needed.
- Dangling mass (nodes with no out-edges) is folded with an exact decimal
  sum and redistributed uniformly — the standard correction, without which
  total rank leaks each step.

Numeric parity discipline (the unigram_logprob lesson — see
operators/text.py): every cross-engine float is either an IEEE-exact
int/int division, a decimal fold, or a double expression with identical
literals and association order rounded before comparison.  Edge shares are
ROUND(w/W, 6) decimals; per-iteration ranks are ROUND(..., 8) decimals so
the decimal→double casts stay under DuckDB's 2^53 exact-conversion bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def co_occurrence_edges(
    incidence: DataFrame, entity_col: str, container_col: str
) -> DataFrame:
    """Weighted co-occurrence edge list from an (entity, container)
    incidence frame: edge (src, dst, w) where w = number of containers in
    which both entities appear.  Symmetric (both directions emitted).

    The self-join is equi-keyed on the container, so Spark co-partitions
    both sides on one shuffle key; output size is Σ c_i·(c_i−1) over
    container sizes c_i — bounded fan-out, never an all-pairs product.
    """
    pairs = incidence.select(
        F.col(container_col).alias("_cont"), F.col(entity_col).alias("_ent")
    ).distinct()
    a = pairs.alias("a")
    b = pairs.alias("b")
    return (
        a.join(
            b,
            (F.col("a._cont") == F.col("b._cont"))
            & (F.col("a._ent") != F.col("b._ent")),
        )
        .groupBy(
            F.col("a._ent").alias("src"),
            F.col("b._ent").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src: str = "src",
    dst: str = "dst",
    weight_col: str = "w",
    damping: float = 0.85,
    n_iter: int = 3,
    materialize: bool = True,
) -> DataFrame:
    """Weighted PageRank by power iteration with uniform dangling-mass
    redistribution.  Returns (node_col, pagerank DOUBLE rounded to 6).

    r_{k+1}(v) = (1−d)/N + d·( Σ_{u→v} r_k(u)·w(u,v)/W(u) + D_k/N )

    where W(u) is u's total out-weight and D_k = Σ r_k(u) over dangling
    nodes (no out-edges).  `nodes` fixes the vertex set, so isolated
    vertices participate (as dangling) rather than silently vanishing.

    Cross-engine determinism: shares w/W are exact IEEE int/int division
    rounded to 6 decimals and folded as DECIMAL(8,6); rank·share products
    are exact decimal multiplies summed exactly; the per-iteration rank is
    a double expression with fixed association order, rounded to 8
    decimals and stored as DECIMAL(12,8) — so an unrolled SQL oracle
    reproduces the value bit-for-bit (no libm calls anywhere).

    With `materialize` (default) each iteration's node-sized rank frame is
    persisted and counted, and its predecessor unpersisted — lineage depth
    stays O(1) per step instead of O(n_iter) and nothing is recomputed.
    The final frame is left persisted for the caller's action and
    unpersists itself with the session.
    """
    n_frame = nodes.select(F.col(node_col).alias("_node")).distinct()
    e = edges.select(
        F.col(src).alias("_src"),
        F.col(dst).alias("_dst"),
        F.col(weight_col).cast("bigint").alias("_w"),
    )
    outw = e.groupBy("_src").agg(F.sum("_w").alias("_wtot"))
    share = (
        e.join(outw, "_src")
        .select(
            "_src",
            "_dst",
            F.round(
                F.col("_w").cast("double") / F.col("_wtot").cast("double"), 6
            )
            .cast("decimal(8,6)")
            .alias("_sh"),
        )
    )
    # Scalar N as a 1-row broadcast frame (free at any scale).
    nn = n_frame.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    ranks = n_frame.crossJoin(F.broadcast(nn)).select(
        "_node",
        F.round(F.lit(1.0) / F.col("_n"), 8).cast("decimal(12,8)").alias("_r"),
    )
    # Iteration-invariant frames: persist share FIRST, then derive the
    # dangling set from the persisted share (not from outw, whose
    # independent lineage would re-run the whole edge build) — otherwise
    # every iteration pays the upstream self-join again (measured: 17 s
    # -> ~4 s at sf0.1 for 3 iterations).
    if materialize:
        # persist pre-partitioned on the per-iteration join key: the
        # cached frame keeps its outputPartitioning, so each iteration
        # shuffles only the node-sized rank frame, never the edges
        share = share.repartition("_src").persist(StorageLevel.MEMORY_AND_DISK)
        share.count()
    dangling = n_frame.join(
        share.select(F.col("_src").alias("_node")).distinct(),
        "_node",
        "left_anti",
    )
    if materialize:
        dangling = dangling.persist(StorageLevel.MEMORY_AND_DISK)
        ranks = ranks.persist(StorageLevel.MEMORY_AND_DISK)
        ranks.count()
    d = float(damping)
    # teleport mass: 1.0 - 0.85 is 0.15000000000000002 in binary floating
    # point while the unrolled SQL oracle writes the literal 0.15 — round
    # the complement at 12 decimals so both engines start from the SAME
    # double (ADVICE r5: a 1-ulp numerator divergence could in principle
    # flip an 8-decimal rounding boundary).
    teleport = round(1.0 - d, 12)
    for _ in range(n_iter):
        # D_k: exact decimal fold of dangling nodes' ranks (1-row scalar).
        dm = (
            ranks.join(dangling, "_node")
            .agg(
                F.coalesce(
                    F.sum(F.col("_r")), F.lit(0).cast("decimal(12,8)")
                )
                .cast("decimal(14,8)")
                .alias("_dm")
            )
        )
        # Σ r_k(u)·share(u,v): (10,8)x(8,6) decimal products summed
        # exactly, then narrowed to (14,12) so the double cast is exact in
        # both engines (unscaled ≤ 10^12 < 2^53).
        contrib = (
            ranks.join(share, ranks["_node"] == share["_src"])
            .groupBy(F.col("_dst").alias("_node"))
            .agg(
                F.sum(F.col("_r").cast("decimal(10,8)") * F.col("_sh"))
                .cast("decimal(14,12)")
                .alias("_c")
            )
        )
        nxt = (
            n_frame.join(contrib, "_node", "left")
            .crossJoin(F.broadcast(nn))
            .crossJoin(F.broadcast(dm))
            .select(
                "_node",
                F.round(
                    F.lit(teleport) / F.col("_n")
                    + F.lit(d)
                    * (
                        F.coalesce(
                            F.col("_c"), F.lit(0).cast("decimal(14,12)")
                        ).cast("double")
                        + F.col("_dm").cast("double") / F.col("_n")
                    ),
                    8,
                )
                .cast("decimal(12,8)")
                .alias("_r"),
            )
        )
        if materialize:
            nxt = nxt.persist(StorageLevel.MEMORY_AND_DISK)
            nxt.count()
            ranks.unpersist(blocking=False)
        ranks = nxt

    out = ranks.select(
        F.col("_node").alias(node_col),
        F.round(F.col("_r").cast("double"), 6).alias("pagerank"),
    )
    if materialize:
        share.unpersist(blocking=False)
        dangling.unpersist(blocking=False)
    return out


def triangle_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle count and local clustering coefficient from a
    symmetric edge list.  Returns (node, degree, n_triangles, clustering).

    Canonicalizes to undirected (u < v) edges, enumerates each triangle
    once via the two-hop equi-join e(a,b) ⋈ e(b,c) ⋈ e(a,c) with
    a < b < c, then credits all three corners.  Both joins are equi-keyed
    (no theta-join blowup); candidate volume is Σ deg(u)·deg(v) over
    edges — the standard bound, kept tight at scale by the a<b<c ordering
    (each wedge is generated once, from its middle-ranked vertex).

    clustering(v) = 2·T(v) / (deg(v)·(deg(v)−1)) — an exact int/int IEEE
    division rounded to 6, so the oracle matches bit-for-bit.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    e1 = und.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = und.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = und.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = (
        e1.join(e2, "b")
        .join(e3, ["a", "c"])
        .select("a", "b", "c")
    )
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    return (
        deg.join(corners, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce(F.col("n_triangles"), F.lit(0).cast("bigint")).alias(
                "n_triangles"
            ),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    F.lit(2.0)
                    * F.coalesce(
                        F.col("n_triangles"), F.lit(0).cast("bigint")
                    ).cast("double")
                    / (
                        F.col("degree").cast("double")
                        * (F.col("degree").cast("double") - F.lit(1.0))
                    ),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering"),
        )
    )


def association_rules(
    incidence: DataFrame,
    entity_col: str,
    container_col: str,
    min_count: int = 2,
    top_k: int = 50,
) -> DataFrame:
    """Market-basket association rules from an (entity, container)
    incidence list: for each co-contained entity pair, emit both directed
    rules with support, confidence, and lift — the classic A-priori
    output for the 2-itemset case, computed without any candidate
    generation (the pair join IS the frequent-pair scan).

    support(a→b)    = n_ab / N        (N = distinct containers)
    confidence(a→b) = n_ab / n_a
    lift(a→b)       = (n_ab · N) / (n_a · n_b)

    Same bounded-fanout self-join as co_occurrence_edges; `min_count`
    prunes the singleton-pair tail BEFORE the per-entity joins, so the
    rule frame (not the pair scan) is what survives.  All ratios are
    IEEE-exact int/int double expressions rounded to 6 — bit-identical
    cross-engine.  Output: top_k rules by (lift DESC, antecedent,
    consequent) — deterministic under ties.
    """
    pairs_inc = incidence.select(
        F.col(container_col).alias("_cont"), F.col(entity_col).alias("_ent")
    ).distinct()
    n_tot = pairs_inc.select("_cont").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("_n")
    )
    per_ent = pairs_inc.groupBy("_ent").agg(
        F.count(F.lit(1)).cast("bigint").alias("_cnt")
    )
    a = pairs_inc.alias("a")
    b = pairs_inc.alias("b")
    und = (
        a.join(
            b,
            (F.col("a._cont") == F.col("b._cont"))
            & (F.col("a._ent") < F.col("b._ent")),
        )
        .groupBy(
            F.col("a._ent").alias("_u"), F.col("b._ent").alias("_v")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("_nab"))
        .filter(F.col("_nab") >= min_count)
    )
    directed = und.select(
        F.col("_u").alias("antecedent"),
        F.col("_v").alias("consequent"),
        "_nab",
    ).unionAll(
        und.select(
            F.col("_v").alias("antecedent"),
            F.col("_u").alias("consequent"),
            "_nab",
        )
    )
    na = per_ent.select(
        F.col("_ent").alias("antecedent"), F.col("_cnt").alias("_na")
    )
    nb = per_ent.select(
        F.col("_ent").alias("consequent"), F.col("_cnt").alias("_nb")
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        directed.join(na, "antecedent")
        .join(nb, "consequent")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "antecedent",
            "consequent",
            F.col("_nab").alias("n_both"),
            F.round(dbl("_nab") / dbl("_n"), 6).alias("support"),
            F.round(dbl("_nab") / dbl("_na"), 6).alias("confidence"),
            F.round(
                dbl("_nab") * dbl("_n") / (dbl("_na") * dbl("_nb")), 6
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "antecedent", "consequent")
        .limit(top_k)
    )


def jaccard_similar_items(
    incidence: DataFrame,
    entity_col: str,
    container_col: str,
    top_k: int = 5,
    min_count: int = 2,
) -> DataFrame:
    """Item-item similarity (the classic collaborative-filtering
    primitive): for each entity, the top_k most similar entities by
    container-set Jaccard — sim(a,b) = n_ab / (n_a + n_b − n_ab).

    Same bounded-fanout co-occurrence scan as association_rules; the
    per-item ranking is a window PARTITIONED by the item (per-group
    top-k, no global sort — each item ranks only its own candidate
    list, bounded by its co-occurrence degree).  Jaccard is an exact
    int/int IEEE division rounded at 6; ties break on the neighbor id.
    """
    pairs_inc = incidence.select(
        F.col(container_col).alias("_cont"), F.col(entity_col).alias("_ent")
    ).distinct()
    per_ent = pairs_inc.groupBy("_ent").agg(
        F.count(F.lit(1)).cast("bigint").alias("_cnt")
    )
    a = pairs_inc.alias("a")
    b = pairs_inc.alias("b")
    und = (
        a.join(
            b,
            (F.col("a._cont") == F.col("b._cont"))
            & (F.col("a._ent") < F.col("b._ent")),
        )
        .groupBy(F.col("a._ent").alias("_u"), F.col("b._ent").alias("_v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("_nab"))
        .filter(F.col("_nab") >= min_count)
    )
    directed = und.select(
        F.col("_u").alias("item"), F.col("_v").alias("neighbor"), "_nab"
    ).unionAll(
        und.select(
            F.col("_v").alias("item"), F.col("_u").alias("neighbor"), "_nab"
        )
    )
    na = per_ent.select(F.col("_ent").alias("item"), F.col("_cnt").alias("_na"))
    nb = per_ent.select(
        F.col("_ent").alias("neighbor"), F.col("_cnt").alias("_nb")
    )
    from pyspark.sql import Window

    sim = F.round(
        F.col("_nab").cast("double")
        / (
            F.col("_na").cast("double")
            + F.col("_nb").cast("double")
            - F.col("_nab").cast("double")
        ),
        6,
    )
    w = Window.partitionBy("item").orderBy(
        F.desc("jaccard"), F.col("neighbor")
    )
    return (
        directed.join(na, "item")
        .join(nb, "neighbor")
        .select(
            "item",
            "neighbor",
            F.col("_nab").alias("n_both"),
            sim.alias("jaccard"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("item", "neighbor", "n_both", "jaccard", F.col("rank").cast("int").alias("rank"))
    )
