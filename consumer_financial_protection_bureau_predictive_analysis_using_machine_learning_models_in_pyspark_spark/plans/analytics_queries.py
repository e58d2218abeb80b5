"""Behavioral / product-analytics queries over the events stream, plus the
token-budget corpus-sampling operator's catalog entry.

These are the classic "analytics engine" shapes the relational pack doesn't
cover:

- events_funnel:           ordered multi-stage conversion (view → click →
                           purchase, each stage strictly after the previous
                           one for the same user);
- events_cohort_retention: first-activity cohorts × week-offset activity
                           matrix (COUNT(DISTINCT user) per cell);
- docs_token_budget_sample: deterministic ~N-token corpus slice via a
                           distributed two-phase prefix sum (no global
                           single-partition window).

Scale posture: every per-user reduction is a narrow (user_id, ts) shuffle —
event payloads never move; funnel stages reuse the per-user aggregates
(tiny: one row per converting user) as broadcast joins against the filtered
event scan, so the fact table is read once per stage and never self-joined
row-to-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import pipeline as PL
from .catalog import register, _t


@register(
    "events_funnel",
    """
WITH v AS (
  SELECT user_id, MIN(ts) AS t0 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t1
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t0
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t1
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT * FROM (
  SELECT 1 AS stage, 'view' AS event_type, COUNT(*) AS n_users FROM v
  UNION ALL
  SELECT 2 AS stage, 'click' AS event_type, COUNT(*) AS n_users FROM c
  UNION ALL
  SELECT 3 AS stage, 'purchase' AS event_type, COUNT(*) AS n_users FROM p
) f
ORDER BY stage
""",
    "funnel", "agg", "join",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users who viewed, then clicked strictly
    after their first view, then purchased strictly after that click.

    Each stage is MIN(ts) per user over the type-filtered scan, joined to
    the previous stage's (user_id, ts) frame — which shrinks monotonically
    and is broadcast, so the events table is never shuffled at all: three
    pruned scans, three small per-user aggregates, three 1-row counts.
    """
    ev = _t(spark, sf_dir, "events")

    def stage_min(etype: str, prev: DataFrame | None, prev_t: str, out_t: str):
        e = ev.filter(F.col("event_type") == etype).select("user_id", "ts")
        if prev is not None:
            pv = prev.withColumnRenamed("user_id", "_pu")
            e = e.join(
                F.broadcast(pv),
                (F.col("user_id") == F.col("_pu")) & (F.col("ts") > F.col(prev_t)),
            )
        return e.groupBy("user_id").agg(F.min("ts").alias(out_t))

    v = stage_min("view", None, "", "t0")
    c = stage_min("click", v, "t0", "t1")
    p = stage_min("purchase", c, "t1", "t2")

    def count_row(df: DataFrame, stage: int, etype: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(stage).alias("stage"),
            F.lit(etype).alias("event_type"),
            "n_users",
        )

    return (
        count_row(v, 1, "view")
        .unionAll(count_row(c, 2, "click"))
        .unionAll(count_row(p, 3, "purchase"))
        .orderBy("stage")
    )


@register(
    "events_cohort_retention",
    """
WITH f AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
  FROM events GROUP BY user_id
)
SELECT CAST(f.first_day AS VARCHAR) AS cohort_day,
       CAST(FLOOR(date_diff('day', f.first_day, CAST(e.ts AS DATE)) / 7.0)
            AS BIGINT) AS week_offset,
       COUNT(DISTINCT e.user_id) AS active_users
FROM events e JOIN f ON e.user_id = f.user_id
GROUP BY cohort_day, week_offset
ORDER BY cohort_day, week_offset
""",
    "cohort", "agg", "join",
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day, counted
    distinct per (cohort, weeks-since-first-activity) cell.

    The per-user first-day frame is one narrow aggregate broadcast back
    onto the scan; the retention cells are a two-key distinct-count whose
    distinct expansion carries only (cohort_day, week_offset, user_id).
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("_day")
    )
    first = ev.groupBy(F.col("user_id").alias("_fu")).agg(
        F.min("_day").alias("_first_day")
    )
    return (
        ev.join(F.broadcast(first), F.col("user_id") == F.col("_fu"))
        .groupBy(
            F.date_format("_first_day", "yyyy-MM-dd").alias("cohort_day"),
            F.floor(F.datediff("_day", "_first_day") / 7.0)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_day", "week_offset")
    )


_TOKEN_BUDGET = 200_000

@register(
    "docs_token_budget_sample",
    f"""
WITH r AS (
  SELECT doc_id,
         CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+'))
              AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS rk
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (
           ORDER BY rk, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum_tokens
  FROM r
)
SELECT doc_id, n_tokens, cum_tokens
FROM c WHERE cum_tokens <= {_TOKEN_BUDGET}
ORDER BY doc_id
""",
    "sampling", "window", "prefix-sum",
)
def docs_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic token-budget corpus slice (see
    ``operators.pipeline.sample_token_budget``): md5-shuffled order, keep
    the prefix whose cumulative token count fits the budget.

    The oracle expresses the semantics as the naive global window; the
    Spark side runs the distributed two-phase prefix sum (per-bucket
    totals → broadcast offsets → partitioned within-bucket windows), which
    is the formulation that survives 100 TB — the global ordering only
    ever materializes as a 256-row offset table.
    """
    docs = _t(spark, sf_dir, "documents")
    return PL.sample_token_budget(docs, _TOKEN_BUDGET).orderBy("doc_id")
