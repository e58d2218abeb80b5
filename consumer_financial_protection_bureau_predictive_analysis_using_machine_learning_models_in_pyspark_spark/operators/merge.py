"""CDC-style table maintenance: upsert merge and log compaction.

A training-data pipeline is not write-once — crawls re-fetch pages, labels
get corrected, and event logs arrive as append-only change streams.  These
operators give the two batch primitives that workflow needs:

- ``merge_upsert``: apply a (small) batch of upserts to a (huge) target —
  the Delta/Iceberg MERGE semantics expressed as pure DataFrame ops.
- ``compact_latest``: collapse an append-only change log to the newest row
  per key — Kafka-style log compaction / CDC snapshot materialization.

Both are shapes Catalyst executes well at 100 TB: the upsert path
broadcast-anti-joins so the target table never shuffles; compaction is a
single hash repartition by key with a per-partition sort (window
``row_number``), no global ordering anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    broadcast_updates: bool = True,
) -> DataFrame:
    """UPSERT ``updates`` into ``target`` by ``key_cols``: matching keys are
    replaced by the update row, new keys are inserted.

    Implementation is anti-join + union — the MERGE formulation that scales:
    with ``broadcast_updates=True`` (the CDC norm: a batch of changes is
    tiny next to the table) the target performs a broadcast anti-join and
    NEVER shuffles; only the update batch moves.  Set it False when the
    update side is itself huge and a shuffled anti-join is the right plan.

    Columns must match between target and updates (unionByName).  If
    ``updates`` carries several rows per key, compact it first
    (``compact_latest``) — MERGE semantics require one action per key.
    """
    keys = [F.col(c) for c in key_cols]
    upd_keys = updates.select(*key_cols)
    if broadcast_updates:
        upd_keys = F.broadcast(upd_keys)
    kept = target.join(upd_keys, list(key_cols), "left_anti")
    return kept.unionByName(updates)


def scd2_history(
    log: DataFrame,
    key_cols: Sequence[str],
    state_cols: Sequence[str],
    order_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from an append-only change
    log: one row per (key, state) INTERVAL with ``valid_from`` /
    ``valid_to`` / ``is_current`` — the third CDC primitive next to
    ``merge_upsert`` (apply) and ``compact_latest`` (snapshot).

    Consecutive rows with an unchanged state collapse into one interval
    (only genuine changes open a new version); ``valid_to`` is the next
    change's ``order_col`` (NULL = open interval, ``is_current`` true).

    Two windows over the SAME (key, order) partitioning — Catalyst plans
    one shuffle + one partition-local sort and reuses them for both —
    never a global sort.  Ties on ``order_col`` are broken by
    ``tiebreak_cols`` ASC so versioning is deterministic.
    """
    order = [F.col(order_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(*order)
    changed = F.lit(False)
    for c in state_cols:
        prev = F.lag(F.col(c)).over(w)
        changed = changed | ~(prev.eqNullSafe(F.col(c)))
    changed = changed | F.row_number().over(w).eqNullSafe(1)
    versions = log.withColumn("_chg", changed).filter(F.col("_chg")).drop("_chg")
    w2 = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(*order)
    return (
        versions.withColumn("valid_from", F.col(order_col))
        .withColumn("valid_to", F.lead(F.col(order_col)).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def compact_latest(
    log: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Latest-wins log compaction: one row per key — the one with the
    greatest ``order_col`` (ties broken by ``tiebreak_cols`` DESC, so the
    result is deterministic even for equal versions).

    One shuffle on the key columns; ``row_number`` needs only a
    per-partition sort.  At 100 TB this is the standard CDC-snapshot
    pattern — never a global orderBy.
    """
    order = [F.col(order_col).desc()] + [
        F.col(c).desc() for c in tiebreak_cols
    ]
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(*order)
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Derive a CDC feed from two table snapshots — the inverse of
    ``merge_upsert``: full-outer join on the key, classify each key as
    'inserted' | 'deleted' | 'changed' | 'unchanged'.

    Output: key columns + ``change`` + the new-side compare columns
    (null for deletes).  Change detection compares each column with
    null-safe equality (``<=>``), so a value→null transition counts as a
    change instead of vanishing.

    One co-partitioned shuffle on the key for both sides; comparison is
    per-row column expressions (codegen'd — no hashing UDF).  At 100 TB
    this is how you reconcile a re-crawl against the previous corpus
    snapshot without replaying any log.
    """
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in key_cols],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
        F.lit(True).alias("_in_new"),
    )
    if not key_cols:
        raise ValueError("snapshot_diff requires at least one key column")
    cond = None
    for k in key_cols:
        # null-safe key equality: a NULL-keyed row must reconcile against
        # its NULL-keyed counterpart, not split into a spurious
        # deleted+inserted pair (ADVICE r5)
        c = F.col(f"_ok_{k}").eqNullSafe(F.col(f"_nk_{k}"))
        cond = c if cond is None else (cond & c)
    joined = o.join(n, cond, "full_outer")
    # empty compare_cols is a legal key-presence diff: every matched key
    # is 'unchanged' (ADVICE r5 — previously F.when(None, ...) raised)
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("inserted"))
        .when(F.col("_in_new").isNull(), F.lit("deleted"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        *[
            F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")).alias(k)
            for k in key_cols
        ],
        change.alias("change"),
        *[F.col(f"_n_{c}").alias(c) for c in compare_cols],
    )
