"""Distributed sketch operators.

Spark ships approximate quantiles (GK) and distinct counts (HLL++) as
built-ins — both exercised in `events_value_quantiles` and its pytest
tolerance twins.  This module adds the sketch Spark lacks: a Count-Min
frequency sketch (Cormode & Muthukrishnan 2005), built and probed as pure
DataFrame aggregations so the whole construction is one shuffle of
(row, bucket) counter cells.

Count-Min at 100 TB: the sketch is d × w counters (here 4 × 256 = 1 K
cells) regardless of input size — the partial aggregation collapses each
executor's slice to ≤ d·w cells before the shuffle, so the reduce moves
KBs.  Estimates are one-sided (est ≥ true count, overshoot bounded by
e·N/w with probability 1 − e^−d) — the right tool for heavy-hitter
screening where misses are unacceptable but overcounts get re-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

P = 2_147_483_647

# d pairwise-independent hash rows: h_i(x) = ((a_i·x + b_i) mod p) mod w.
# Constants are part of the operator contract (the SQL oracle renders the
# same arithmetic), chosen odd / well-mixed like the minhash PERMS.
CMS_SALTS = [
    (1_103_515_245, 12_345),
    (2_654_435_761, 40_503),
    (805_306_457, 784_923),
    (1_597_334_677, 344_555),
]


def _cells(key: F.Column, w: int) -> F.Column:
    """Array of (row, bucket) cells for a bigint key — one per hash row."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                (((F.lit(a) * key + F.lit(b)) % P) % w).alias("bucket"),
            )
            for i, (a, b) in enumerate(CMS_SALTS)
        ]
    )


def cms_build(df: DataFrame, key_col: str, w: int = 256) -> DataFrame:
    """Count-Min sketch of ``key_col`` (bigint): (i, bucket, cnt) cells.

    One explode (d rows per input row, collapsed map-side) + one groupBy —
    the sketch itself is ≤ d·w rows, broadcastable downstream.
    """
    return (
        df.select(F.explode(_cells(F.col(key_col), w)).alias("c"))
        .groupBy(F.col("c.i").alias("i"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, candidates: DataFrame, key_col: str, w: int = 256
) -> DataFrame:
    """Point-query the sketch for every candidate key: est = min over hash
    rows of the addressed counter.  The sketch side is tiny — broadcast —
    so estimation is shuffle-free until the final min-agg by key."""
    probes = candidates.select(
        key_col, F.explode(_cells(F.col(key_col), w)).alias("c")
    ).select(key_col, F.col("c.i").alias("i"), F.col("c.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["i", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est_count"))
    )
