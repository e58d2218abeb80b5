"""Declarative data-quality gate: constraint checks over huge tables,
folded into the fewest possible passes (the Deequ/expectations pattern,
re-expressed as pure DataFrame aggregates).

A 100 TB ingest without a constraint gate ships corrupt batches straight
into training data; the standard gate is a per-batch audit table of
(constraint, n_checked, n_violations, passed).  Two cost classes:

- COLUMN checks (not-null, accepted-values, range, uniqueness-by-count)
  fold into ONE aggregate pass per table — a single conditional-sum job
  regardless of how many checks ride it, so adding a check is free.
- REFERENTIAL checks (FK orphans) are per-pair anti-join aggregates —
  one keyed shuffle each, broadcastable when the parent is a dim.

All outputs are exact integer counts, so cross-engine parity is trivial.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def column_audit(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Run every column-level check in ONE aggregate pass over `df`.

    `checks` maps constraint name → violation predicate (Column<bool>);
    returns (check_name, n_checked, n_violations).  The whole dict
    compiles to a single conditional-sum aggregate, so the table is
    scanned once no matter how many constraints are registered.

    NULL semantics (ADVICE r5): a predicate like ``~col.isin(...)`` or
    ``~(col > 0)`` evaluates to NULL on NULL input; three-valued logic
    would silently count that as a NON-violation — a quality-gate blind
    spot (a NULL totalprice would pass ``totalprice_positive``).  A NULL
    in a checked domain/range column IS a data defect, so NULL folds to
    violation here — the same semantics as the SQL audit idiom
    ``CASE WHEN ok THEN 0 ELSE 1 END`` (NULL cond falls to ELSE), which
    every oracle for this operator uses.
    """
    if not checks:
        raise ValueError("column_audit requires at least one check")
    aggs: list[Column] = []
    for i, violated in enumerate(checks.values()):
        aggs.append(F.count(F.lit(1)).cast("bigint").alias(f"_c_{i}"))
        aggs.append(
            F.sum(F.when(F.coalesce(violated, F.lit(True)), 1).otherwise(0))
            .cast("bigint")
            .alias(f"_v_{i}")
        )
    row = df.agg(*aggs)
    # typed struct literals, not a string-built stack(): a check name
    # containing a quote can't break the plan (ADVICE r5)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                F.col(f"_c_{i}").alias("n_checked"),
                F.col(f"_v_{i}").alias("n_violations"),
            )
            for i, name in enumerate(checks)
        ]
    )
    return row.select(F.explode(rows).alias("_r")).select(
        "_r.check_name", "_r.n_checked", "_r.n_violations"
    )


def unique_audit(
    df: DataFrame, key_cols: Sequence[str], name: str
) -> DataFrame:
    """Key-uniqueness check: n_violations = rows beyond the first per key
    (COUNT(*) − COUNT(DISTINCT key-tuple), computed as a two-level
    aggregate so no distinct-shuffle of full rows)."""
    per_key = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_n"))
    return per_key.agg(
        F.lit(name).alias("check_name"),
        F.sum("_n").cast("bigint").alias("n_checked"),
        (F.sum("_n") - F.count(F.lit(1))).cast("bigint").alias("n_violations"),
    )


def referential_audit(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    name: str,
) -> DataFrame:
    """FK-orphan check: child rows whose key has no parent.  One keyed
    anti-join (AQE broadcasts dim-sized parents on its own — no forced
    hint, per the fact-hint discipline) plus the child's row count."""
    total = child.agg(F.count(F.lit(1)).cast("bigint").alias("n_checked"))
    orphans = (
        child.select(F.col(child_key).alias("_k"))
        .join(
            parent.select(F.col(parent_key).alias("_k")).distinct(),
            "_k",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
    )
    return total.crossJoin(orphans).select(
        F.lit(name).alias("check_name"), "n_checked", "n_violations"
    )


def audit_table(parts: Sequence[DataFrame]) -> DataFrame:
    """Union per-check frames into the final audit table with a `passed`
    verdict column, ordered by constraint name."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "check_name",
        "n_checked",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("check_name")
