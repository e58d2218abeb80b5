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

from pyspark.sql import DataFrame, SparkSession, Window
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
    the previous stage's (user_id, min_ts) frame.  No broadcast hint: the
    stage-1 frame is one row per user who ever viewed — O(all users), the
    one dimension that is NOT guaranteed small at 100 TB — so join strategy
    is left to AQE, which broadcasts at bench scale and falls back to a
    shuffled hash join on user_id (both sides already keyed on it) at
    scale.  A forced F.broadcast here would override Spark's size limits
    and OOM the driver at 100x (VERDICT r2 item 1).
    """
    ev = _t(spark, sf_dir, "events")

    def stage_min(etype: str, prev: DataFrame | None, prev_t: str, out_t: str):
        e = ev.filter(F.col("event_type") == etype).select("user_id", "ts")
        if prev is not None:
            pv = prev.withColumnRenamed("user_id", "_pu")
            e = e.join(
                pv,
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

    The per-user first-day frame is one narrow aggregate joined back onto
    the scan WITHOUT a broadcast hint: it has exactly one row per distinct
    user — the largest dimension the dataset has — so forcing a broadcast
    is a guaranteed OOM at 100x (VERDICT r2 item 2).  Both sides are keyed
    on user_id, so AQE picks broadcast at bench scale and a co-partitioned
    shuffled hash join at scale.  The retention cells are a two-key
    distinct-count whose distinct expansion carries only (cohort_day,
    week_offset, user_id).
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("_day")
    )
    first = ev.groupBy(F.col("user_id").alias("_fu")).agg(
        F.min("_day").alias("_first_day")
    )
    return (
        ev.join(first, F.col("user_id") == F.col("_fu"))
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


@register(
    "events_user_paths",
    """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
ORDER BY prev_type, next_type
""",
    "path-analysis", "window", "agg",
)
def events_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-event transition matrix: for each consecutive event pair within
    a user's timeline, count (previous type → next type) transitions — the
    input to Markov-chain user-path / attribution models.

    One partitioned window (user_id shuffle, payload-free projection) feeds
    a k²-row aggregate; nothing global is ever ordered.  (ts, event_id)
    ordering makes the lag deterministic under same-timestamp events.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("prev_type", "next_type")
    )


@register(
    "events_gap_fill",
    """
WITH RECURSIVE b AS (
  SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
  FROM events
),
hours AS (
  SELECT h0 AS h, h1 FROM b
  UNION ALL
  SELECT h + INTERVAL 1 HOUR, h1 FROM hours WHERE h < h1
),
grid AS (
  SELECT t.event_type, hours.h FROM (SELECT DISTINCT event_type FROM events) t, hours
),
agg AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         COUNT(*) AS n,
         CAST((2 * CAST(SUM(CAST(value AS DECIMAL(14,2))) * 100 AS BIGINT)
               * 10000 + COUNT(*)) // (2 * COUNT(*)) AS BIGINT) AS avg_u
  FROM events GROUP BY event_type, h
)
SELECT g.event_type, CAST(g.h AS STRING) AS hour,
       CAST(COALESCE(a.n, 0) AS BIGINT) AS n_events,
       last_value(a.avg_u IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS locf_avg_value_u
FROM grid g LEFT JOIN agg a ON a.event_type = g.event_type AND a.h = g.h
ORDER BY g.event_type, hour
""",
    "time-series", "gap-fill", "window",
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap filling: hourly event counts per type
    over a COMPLETE hour grid (missing hours appear as 0) with the hourly
    mean value forward-filled across gaps (LOCF).

    Scale posture: the fact table is touched exactly once — one hourly
    aggregate (narrow shuffle on (type, hour)).  The dense grid is built
    from a 1-row bounds aggregate cross-joined with the tiny type dim via
    ``sequence()``/``explode`` — rows × hours never involves the raw
    events.  The LOCF window partitions by type, so no single-partition
    global window exists; leading hours before a type's first observation
    stay NULL on both engines.
    """
    ev = _t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("_h0"),
        F.date_trunc("hour", F.max("ts")).alias("_h1"),
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(
            F.sequence(F.col("_h0"), F.col("_h1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("_h"),
    )
    # hourly mean in half-up integer MICRO-UNITS: ROUND(double_mean, 6)
    # diverged at sf1 the way the verify notes predict — a mean over a
    # 2^k·5 count lands exactly on the 7th-decimal 5 and Spark HALF_UP
    # disagrees with DuckDB half-even (soak r11: 43.472812 vs .472813).
    # (2·cents·10⁴ + n) DIV (2n) is exact integer arithmetic on both
    # engines at any scale.
    agg = ev.groupBy(
        F.col("event_type").alias("_at"), F.date_trunc("hour", "ts").alias("_ah")
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        F.expr(
            "CAST((2 * CAST(SUM(CAST(value AS DECIMAL(14,2))) * 100 AS BIGINT)"
            " * 10000 + COUNT(*)) DIV (2 * COUNT(*)) AS BIGINT)"
        ).alias("_avg_u"),
    )
    locf = (
        Window.partitionBy("event_type")
        .orderBy("_h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(
            agg,
            (F.col("_at") == F.col("event_type")) & (F.col("_ah") == F.col("_h")),
            "left",
        )
        .select(
            "event_type",
            F.col("_h").cast("string").alias("hour"),
            F.coalesce(F.col("_n"), F.lit(0)).cast("bigint").alias("n_events"),
            F.last("_avg_u", ignorenulls=True).over(locf).alias("locf_avg_value_u"),
        )
        .orderBy("event_type", "hour")
    )


# Target mixture for the training-corpus domain-mix sampler: per-source keep
# probabilities, applied via a deterministic md5-threshold so the "sample" is
# a pure filter — reproducible across engines, runs, and partitionings.
_MIX_WEIGHTS = {f"src{i}": w for i, w in zip(range(20), [1.0, 0.9, 0.8, 0.7, 0.6, 0.5, 0.45, 0.4, 0.35, 0.3, 0.25, 0.2, 0.18, 0.15, 0.12, 0.1, 0.08, 0.06, 0.04, 0.02])}
_MIX_DEFAULT = 0.05


def _hex_threshold(w: float) -> str:
    # Hex chars sort below 'g', so 'g' keeps everything (w >= 1).
    return "g" if w >= 1.0 else format(int(w * 16**8), "08x")


def _mix_case_sql() -> str:
    arms = "\n".join(
        f"    WHEN '{s}' THEN '{_hex_threshold(w)}'"
        for s, w in sorted(_MIX_WEIGHTS.items())
    )
    return f"CASE source\n{arms}\n    ELSE '{_hex_threshold(_MIX_DEFAULT)}' END"


@register(
    "docs_domain_mix",
    f"""
SELECT source,
       COUNT(*) AS n_kept,
       CAST(SUM(n_chars) AS BIGINT) AS chars_kept
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < {_mix_case_sql()}
GROUP BY source
ORDER BY source
""",
    "sampling", "mixing", "agg",
)
def docs_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain-mixture sampling: each source keeps a target
    fraction of its documents (down-weighting over-represented domains —
    the standard pre-training mixture step), selected by comparing the
    md5(doc_id) hex prefix against the per-source threshold.

    A pure narrow filter — no shuffle, no RNG state, no sampleBy second
    pass; the kept set is identical on any engine and any partitioning.
    The per-source thresholds compile to a CASE over a 20-arm literal map
    (broadcast-free: it is constant-folded into the scan predicate).
    """
    thr = F.lit(_hex_threshold(_MIX_DEFAULT))
    for s, w in sorted(_MIX_WEIGHTS.items(), reverse=True):
        thr = F.when(F.col("source") == s, F.lit(_hex_threshold(w))).otherwise(thr)
    return (
        _t(spark, sf_dir, "documents")
        .filter(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8) < thr)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").cast("bigint").alias("chars_kept"),
        )
        .orderBy("source")
    )


_N_SHARDS = 16


@register(
    "docs_shard_export",
    f"""
WITH sharded AS (
  SELECT CAST(instr('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS INT)
           AS shard_id,
         n_chars
  FROM documents
)
SELECT shard_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM sharded
GROUP BY shard_id
ORDER BY shard_id
""",
    "sharding", "export", "agg",
)
def docs_shard_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-export sharding: md5-hash each doc id into one
    of {_N_SHARDS} shards and report per-shard document / byte balance —
    the assignment a `partitionBy("shard_id")` training-data writer would
    use, with the balance stats a pre-write skew check.

    The shard id is engine-portable (hex-digit position, no bit tricks), a
    pure projection with no shuffle until the {_N_SHARDS}-row aggregate.
    """
    shard = (
        F.expr(
            "instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 1, 1)) - 1"
        )
    ).cast("int")
    return (
        _t(spark, sf_dir, "documents")
        .select(shard.alias("shard_id"), "n_chars")
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("shard_id")
    )


@register(
    "events_purchase_attribution",
    """
WITH seq AS (
  SELECT user_id, event_type, value,
         first_value(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ft,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS lt
  FROM events
)
SELECT COALESCE(ft, '(direct)') AS first_touch,
       COALESCE(lt, '(direct)') AS last_touch,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
FROM seq
WHERE event_type = 'purchase'
GROUP BY 1, 2
ORDER BY 1, 2
""",
    "path-analysis", "attribution", "window", "agg",
)
def events_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-style conversion attribution: for every purchase event,
    credit the user's FIRST touch (earliest event strictly before the
    purchase) and LAST touch (the immediately preceding event), then fold
    purchases and revenue by (first_touch, last_touch) channel pair.
    Purchases with no prior event credit '(direct)'.

    One user-partitioned window computes both touches in a single pass
    (same shuffle as events_user_paths — at scale these path queries
    share the user_id partitioning); the filter then keeps only purchase
    rows, so the aggregate input is conversion-sized, not event-sized.
    (ts, event_id) ordering makes both window functions deterministic
    under same-timestamp events; revenue folds as exact DECIMAL.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = _t(spark, sf_dir, "events").select(
        "event_type",
        "value",
        F.first("event_type")
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .alias("ft"),
        F.lag("event_type").over(w).alias("lt"),
    )
    return (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce(F.col("ft"), F.lit("(direct)")).alias("first_touch"),
            F.coalesce(F.col("lt"), F.lit("(direct)")).alias("last_touch"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(14,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("first_touch", "last_touch")
    )


@register(
    "events_top_session_paths",
    """
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 10 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM seq
),
paths AS (
  SELECT user_id, sid,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM sess GROUP BY user_id, sid
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT 20
""",
    "path-analysis", "session", "window", "agg", "topk",
)
def events_top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 user journeys: sessionize (10-minute gap, same rule as
    events_sessionize), render each session as an ordered '>'-joined
    event-type path, count identical paths.

    The ordered-path aggregation is the trap this entry exists to pin:
    collect_list has NO intra-group order guarantee after a shuffle, so
    the path is built by sorting an array of (ts, event_id, type)
    structs IN-ROW (array_sort on the collected structs, then a
    transform down to the type) — deterministic regardless of
    shuffle-fetch order, equivalent to DuckDB's
    string_agg(... ORDER BY).  Two keyed shuffles total (user window,
    path count); the top-20 is TakeOrderedAndProject.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # timestampdiff: exact calendar arithmetic, NTZ-safe (see
    # streaming/windows.sessionize — an epoch cast is neither)
    brk = F.when(
        F.col("_prev").isNull()
        | (
            F.expr("timestampdiff(MICROSECOND, _prev, ts)")
            > 600 * 1_000_000
        ),
        1,
    ).otherwise(0)
    sess = (
        _t(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("_prev", F.lag("ts").over(w))
        .withColumn("brk", brk)
        .withColumn(
            "sid",
            F.sum("brk").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    paths = (
        sess.groupBy("user_id", "sid")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("_evs")
        )
        .select(
            F.array_join(
                F.transform(F.col("_evs"), lambda x: x["event_type"]), ">"
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(20)
    )
