"""Window-function operators (SURVEY §2.5).

The reference only uses a global orderBy (W1) and show(n) limits (W2); its
RDD ``zipWithIndex`` (init.py:29) is the degenerate form of a row ordinal.
The engine exposes the general analytic surface the extensions need:
per-group top-k, ordinals, running aggregates.

Scale posture: every function here partitions by a key — no
``Window.orderBy`` without ``partitionBy`` (a global window is a single-task
sort at 100 TB).  The ordinal operator that replaces zipWithIndex is
``monotonically_increasing_id`` (no shuffle, not dense) or a keyed
row_number when density matters.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
    method: str = "row_number",
) -> DataFrame:
    """Top-k rows per group via a ranking window.

    ``method`` ∈ {row_number, rank, dense_rank}.  With a deterministic
    ``order_by`` (include a tiebreaker column!) row_number gives exactly k
    rows per group.
    """
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[
        method
    ]
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, fn().over(w))
        .filter(F.col(rank_col) <= k)
    )


def with_ordinal(df: DataFrame, name: str = "ordinal") -> DataFrame:
    """Non-dense unique row id — the shuffle-free replacement for the
    reference's ``rdd.zipWithIndex()`` (init.py:29, SURVEY §2.12)."""
    return df.withColumn(name, F.monotonically_increasing_id())


def running_agg(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_col: str,
    value_col: str,
    out_col: str = "running_sum",
) -> DataFrame:
    """Per-key running sum ordered by ``order_col`` (rows unbounded-preceding
    to current)."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.sum(value_col).over(w))
