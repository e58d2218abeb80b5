"""Reshape operators: pivot (long→wide) and unpivot/melt (wide→long).

Extension surface (no reference counterpart — the reference's only
"pivot" is a driver-side NumPy confusion matrix,
desicion_tree_confusion_matrix.py:16-31, which operators.metrics already
replaces).  These are the general reshaping operators an analytics user
expects from the engine.

Scale posture:
- ``pivot_agg`` REQUIRES the pivot values up front.  Spark's
  ``pivot(col)`` without values runs an extra distinct-collect job over
  100 TB and then builds an unbounded-width row; forcing the caller to
  name the columns makes the width explicit and the plan one pass.  The
  result is a single partial+final hash aggregate — pivoting is just
  conditional aggregation, never a shuffle per column.
- ``unpivot`` uses Spark's native ``DataFrame.unpivot`` (Expand node): one
  scan fans each row out to |value_cols| rows map-side; no shuffle at all.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pivot_agg(
    df: DataFrame,
    row_keys: Sequence[str],
    pivot_col: str,
    pivot_values: Sequence[str],
    agg: Column,
    other_label: str | None = None,
) -> DataFrame:
    """Wide table of ``agg`` per (row_keys × pivot value), one pass.

    ``pivot_values`` must be enumerated (see module docstring).  Values
    outside the list are dropped, or folded into ``other_label``'s column
    when given — the stable-schema contract a 100 TB pipeline needs (a new
    dirty value appearing upstream cannot change the output width).

    NULL pivot values are dropped in BOTH modes: the ``other_label``
    bucket holds only non-NULL out-of-list values (the remap is gated on
    ``isNotNull`` — an untyped ``otherwise`` would silently fold NULLs
    into the bucket in one mode while the plain pivot drops them in the
    other; ADVICE r3).
    """
    vals = list(pivot_values)
    src = df
    if other_label is not None:
        src = df.withColumn(
            pivot_col,
            F.when(F.col(pivot_col).isin(vals), F.col(pivot_col)).when(
                F.col(pivot_col).isNotNull(), F.lit(other_label)
            ),
        )
        vals = vals + [other_label]
    return src.groupBy(*row_keys).pivot(pivot_col, vals).agg(agg)


def unpivot(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "measure",
    value_name: str = "value",
) -> DataFrame:
    """Melt ``value_cols`` into (``var_name``, ``value_name``) long rows —
    Spark-native ``unpivot`` (a map-side Expand; zero shuffle)."""
    return df.unpivot(
        ids=list(id_cols),
        values=list(value_cols),
        variableColumnName=var_name,
        valueColumnName=value_name,
    )
