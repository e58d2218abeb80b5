"""Feature-encoding operators (SURVEY §2.10 `frequency_encode`, `date_parts`).

Reference behavior:
- frequency encoding of high-cardinality categoricals: groupBy(key).count →
  left-join back → drop key (reference decision_tree_final_class_8.py:75-84,
  company_response_RF.py:48-51).  Chosen there over one-hot because `company`
  has ~7,000 values (reference README.md:21).
- date parts: cast string → timestamp → year/month/day int columns
  (reference timely_LR.py:57-62, complaints_narrative_LDA.py:34-39).

Scale posture: the frequency dim is tiny (≤ cardinality of the key), so the
join-back is explicitly broadcast — no shuffle of the 100 TB fact side.  The
aggregation itself is a partial+final hash agg (map-side combine), and for a
skewed key like `company` AQE handles the hot partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequency_table(df: DataFrame, key: str, out_col: str | None = None) -> DataFrame:
    """`groupBy(key).count()` dimension table (A1)."""
    out_col = out_col or f"frequency_{key}"
    return df.groupBy(key).agg(F.count(F.lit(1)).alias(out_col))


def frequency_encode(
    df: DataFrame, key: str, out_col: str | None = None, drop_key: bool = False
) -> DataFrame:
    """Composite frequency encode: A1 + broadcast left join (J1/J2).

    The reference leaves join strategy to the planner; at 100 TB the dim
    (≤ ~7,000 rows for `company`) must be broadcast so the fact table never
    shuffles — hence the explicit hint.
    """
    out_col = out_col or f"frequency_{key}"
    freq = frequency_table(df, key, out_col)
    joined = df.join(F.broadcast(freq), on=key, how="left")
    return joined.drop(key) if drop_key else joined


def date_parts(
    df: DataFrame, src_col: str, prefix: str = "", fmt: str | None = None
) -> DataFrame:
    """Cast string column to timestamp and derive year/month/day ints
    (reference timely_LR.py:57-62).

    Uses ``try_to_timestamp`` rather than a bare cast so malformed date
    strings degrade to NULL parts instead of failing the job under ANSI mode
    (Spark 4 default).
    """
    c = F.col(src_col)
    ts = F.try_to_timestamp(c, F.lit(fmt)) if fmt else F.try_to_timestamp(c)
    return df.withColumns(
        {
            f"{prefix}year": F.year(ts),
            f"{prefix}month": F.month(ts),
            f"{prefix}day": F.dayofmonth(ts),
        }
    )
