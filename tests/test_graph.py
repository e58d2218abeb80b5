"""Hand-computed fixtures for operators/graph.py (PageRank, triangles).

The catalog-level value check is the unrolled-SQL oracle
(test_oracle_parity: supplier_copurchase_pagerank /
part_copurchase_triangles); these tests pin the operator semantics on
graphs small enough to verify by hand — dangling-mass redistribution,
weight normalization, mass conservation, triangle crediting.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators import (  # noqa: E501
    graph as G,
)


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "node bigint")


def _edges(spark, triples):
    return spark.createDataFrame(list(triples), "src bigint, dst bigint, w bigint")


def test_pagerank_hand_computed_one_iteration(spark):
    # 1 -> 2 (w=1); node 3 dangling.  N=3, d=0.85, one iteration:
    #   r0 = 1/3 each (rounded to 0.33333333)
    #   dangling mass D = r0(2) + r0(3) = 0.66666666   (2 has no out-edges)
    #   r1(v) = 0.15/3 + 0.85*(contrib(v) + D/3)
    #   contrib(2) = r0(1)*1.0 = 0.33333333, contrib(1)=contrib(3)=0
    nodes = _nodes(spark, [1, 2, 3])
    edges = _edges(spark, [(1, 2, 1)])
    out = {
        r["node"]: r["pagerank"]
        for r in G.pagerank(nodes, edges, n_iter=1).collect()
    }
    base = 0.15 / 3.0 + 0.85 * (0.66666666 / 3.0)
    assert out[1] == pytest.approx(round(base, 6), abs=1e-9)
    assert out[3] == out[1]
    assert out[2] == pytest.approx(round(base + 0.85 * 0.33333333, 6), abs=1e-9)


def test_pagerank_weight_normalization(spark):
    # 1 -> 2 (w=3), 1 -> 3 (w=1): shares 0.75 / 0.25; nodes 2,3 dangling.
    nodes = _nodes(spark, [1, 2, 3])
    edges = _edges(spark, [(1, 2, 3), (1, 3, 1)])
    out = {
        r["node"]: r["pagerank"]
        for r in G.pagerank(nodes, edges, n_iter=1).collect()
    }
    d_over_n = 0.66666666 / 3.0
    assert out[2] == pytest.approx(
        round(0.05 + 0.85 * (0.33333333 * 0.75 + d_over_n), 6), abs=1e-9
    )
    assert out[3] == pytest.approx(
        round(0.05 + 0.85 * (0.33333333 * 0.25 + d_over_n), 6), abs=1e-9
    )


def test_pagerank_mass_conserved(spark):
    # With dangling redistribution, total rank stays ~1 every iteration.
    nodes = _nodes(spark, range(1, 7))
    edges = _edges(
        spark, [(1, 2, 1), (2, 3, 2), (3, 1, 1), (4, 1, 5), (5, 4, 1)]
    )
    for n_iter in (1, 3):
        total = (
            G.pagerank(nodes, edges, n_iter=n_iter)
            .agg(F.sum("pagerank"))
            .collect()[0][0]
        )
        assert total == pytest.approx(1.0, abs=1e-5)


def test_pagerank_isolated_nodes_participate(spark):
    # An isolated node keeps teleport + dangling share; never dropped.
    nodes = _nodes(spark, [1, 2, 99])
    edges = _edges(spark, [(1, 2, 1), (2, 1, 1)])
    out = G.pagerank(nodes, edges, n_iter=2)
    assert out.count() == 3
    assert out.filter(F.col("node") == 99).collect()[0]["pagerank"] > 0


def test_co_occurrence_edges_bounded_fanout(spark):
    # Containers {A: 1,2,3}, {B: 2,3}: symmetric weighted co-occurrence.
    inc = spark.createDataFrame(
        [("A", 1), ("A", 2), ("A", 3), ("B", 2), ("B", 3), ("B", 3)],
        "cont string, ent bigint",
    )
    rows = {
        (r["src"], r["dst"]): r["w"]
        for r in G.co_occurrence_edges(inc, "ent", "cont").collect()
    }
    assert rows[(2, 3)] == 2 and rows[(3, 2)] == 2  # duplicate row deduped
    assert rows[(1, 2)] == 1 and rows[(1, 3)] == 1
    assert len(rows) == 6  # 3 undirected pairs, both directions


def test_triangle_stats_hand_computed(spark):
    # K3 on {1,2,3} plus pendant edge 3-4: one triangle.
    edges = _edges(
        spark, [(1, 2, 1), (2, 3, 1), (1, 3, 1), (3, 4, 1), (4, 3, 1)]
    )
    rows = {r["node"]: r for r in G.triangle_stats(edges).collect()}
    assert rows[1]["n_triangles"] == 1 and rows[1]["degree"] == 2
    assert rows[3]["n_triangles"] == 1 and rows[3]["degree"] == 3
    assert rows[4]["n_triangles"] == 0 and rows[4]["degree"] == 1
    assert rows[1]["clustering"] == pytest.approx(1.0)
    # node 3: 2*1/(3*2) = 0.333333
    assert rows[3]["clustering"] == pytest.approx(0.333333, abs=1e-9)
    assert rows[4]["clustering"] == 0.0


def test_triangle_stats_counts_each_triangle_once(spark):
    # K4: every node sits in C(3,2)=3 triangles; 4 triangles total.
    k4 = [
        (a, b, 1) for a in range(1, 5) for b in range(1, 5) if a != b
    ]
    rows = G.triangle_stats(_edges(spark, k4)).collect()
    assert all(r["n_triangles"] == 3 for r in rows)
    assert all(r["clustering"] == pytest.approx(1.0) for r in rows)


def test_association_rules_hand_computed(spark):
    # Baskets: {A:1,2} {B:1,2} {C:1,3} {D:2} -> N=4, n1=3, n2=3, n3=1
    # pair (1,2): nab=2 -> support 0.5; conf(1->2)=2/3; lift=2*4/(3*3)
    inc = spark.createDataFrame(
        [("A", 1), ("A", 2), ("B", 1), ("B", 2), ("C", 1), ("C", 3), ("D", 2)],
        "cont string, ent bigint",
    )
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators import (  # noqa: E501
        graph as G,
    )

    rows = {
        (r["antecedent"], r["consequent"]): r
        for r in G.association_rules(inc, "ent", "cont", min_count=2).collect()
    }
    assert set(rows) == {(1, 2), (2, 1)}  # (1,3) has nab=1, pruned
    r12 = rows[(1, 2)]
    assert r12["n_both"] == 2
    assert r12["support"] == pytest.approx(0.5)
    assert r12["confidence"] == pytest.approx(round(2 / 3, 6))
    assert r12["lift"] == pytest.approx(round(8 / 9, 6))
    # confidence is direction-sensitive when the sides differ
    inc2 = spark.createDataFrame(
        [("A", 1), ("A", 2), ("B", 1), ("B", 2), ("C", 1), ("E", 1)],
        "cont string, ent bigint",
    )
    rows2 = {
        (r["antecedent"], r["consequent"]): r
        for r in G.association_rules(inc2, "ent", "cont", min_count=2).collect()
    }
    assert rows2[(1, 2)]["confidence"] == pytest.approx(0.5)  # 2/4
    assert rows2[(2, 1)]["confidence"] == pytest.approx(1.0)  # 2/2


def test_pagerank_iterations_converge(spark):
    """Power iteration must contract: L1 distance between consecutive
    iterations shrinks (damping 0.85 gives a geometric bound)."""
    nodes = _nodes(spark, range(1, 9))
    edges = _edges(
        spark,
        [(1, 2, 1), (2, 3, 2), (3, 1, 1), (3, 4, 3), (4, 5, 1),
         (5, 1, 2), (6, 1, 1), (7, 6, 1)],
    )
    ranks = {
        k: {
            r["node"]: r["pagerank"]
            for r in G.pagerank(nodes, edges, n_iter=k).collect()
        }
        for k in (1, 2, 3, 4, 5, 6)
    }

    def l1(a, b):
        return sum(abs(a[n] - b[n]) for n in a)

    # consecutive single-step distances contract (damping 0.85 bound)
    d12 = l1(ranks[1], ranks[2])
    d34 = l1(ranks[3], ranks[4])
    d56 = l1(ranks[5], ranks[6])
    assert d34 < d12 and d56 < d34
    # geometric contraction: 4 extra steps at damping 0.85 bound the
    # step-distance by ~0.85^4 ≈ 0.52 of the first step's
    assert d56 < 0.55 * d12


def test_jaccard_similar_items_hand_computed(spark):
    # Baskets: {A:1,2} {B:1,2} {C:1,2} {D:1,3} {E:1,3} {F:3,4} {G:3,4}
    # n1=5, n2=3, n3=4, n4=2; n12=3, n13=2, n34=2 (n14=0, n23=0, n24=0)
    # J(1,2)=3/(5+3-3)=0.6  J(1,3)=2/(5+4-2)=2/7  J(3,4)=2/(4+2-2)=0.5
    inc = spark.createDataFrame(
        [("A", 1), ("A", 2), ("B", 1), ("B", 2), ("C", 1), ("C", 2),
         ("D", 1), ("D", 3), ("E", 1), ("E", 3), ("F", 3), ("F", 4),
         ("G", 3), ("G", 4)],
        "cont string, ent bigint",
    )
    rows = {
        (r["item"], r["rank"]): r
        for r in G.jaccard_similar_items(
            inc, "ent", "cont", top_k=2, min_count=2
        ).collect()
    }
    assert rows[(1, 1)]["neighbor"] == 2
    assert rows[(1, 1)]["jaccard"] == pytest.approx(0.6)
    assert rows[(1, 2)]["neighbor"] == 3
    assert rows[(1, 2)]["jaccard"] == pytest.approx(round(2 / 7, 6))
    assert rows[(3, 1)]["neighbor"] == 4  # 0.5 beats J(3,1)=2/7
    assert rows[(4, 1)]["neighbor"] == 3
    assert (2, 2) not in rows  # item 2 has only one qualifying neighbor
