"""Round-4 breadth pack: the remaining training-data curation steps a
100 TB corpus pipeline runs between quality scoring and batch export —

- docs_temperature_mix:  temperature-scaled (share^alpha) domain
  resampling, the mBERT/XLM-R-style mixture flattening;
- docs_quality_deciles:  curriculum buckets — exact quality deciles with
  per-decile stats (the assignment step of quality-ordered training);
- docs_pack_manifest:    the ordered per-bin document manifest a data
  loader consumes (extends docs_pack_bins' stats with the id lists).

Oracle discipline follows text_queries/pipeline_queries: shared
tokenization SQL, DECIMAL folds for order-independent sums, explicit
half-up rounding (FLOOR(x*1e6+0.5)/1e6) wherever a rounded double is
compared, and fixed association order for float arithmetic mirrored
between the Spark plan and the DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import pipeline as PL
from ..operators import sampling
from ..operators import text as TX
from .catalog import _t, register
from .text_queries import _D_TOKS, _STOP_SQL

# ---------------------------------------------------------------------------
# Temperature-scaled domain mixture
# ---------------------------------------------------------------------------

_TEMP_WEIGHTS_CTE = """
counts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_g FROM documents GROUP BY source
),
tot AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n_tot FROM counts),
sd AS (
  SELECT source, n_g, n_tot,
         CAST(sqrt(CAST(n_g AS DOUBLE) / n_tot) AS DECIMAL(20,15)) AS sd
  FROM counts CROSS JOIN tot
),
norm AS (SELECT SUM(sd) AS s_tot FROM sd),
weights AS (
  SELECT source, n_g,
         LEAST(1.0, 0.5 * (CAST(sd AS DOUBLE) / CAST(s_tot AS DOUBLE))
                        * (CAST(n_tot AS DOUBLE) / CAST(n_g AS DOUBLE)))
           AS keep
  FROM sd CROSS JOIN norm
)
""".strip()


@register(
    "docs_temperature_mix",
    f"""
WITH {_TEMP_WEIGHTS_CTE}
SELECT d.source,
       MIN(w.n_g) AS n_total,
       FLOOR(MIN(w.keep) * 1e6 + 0.5) / 1e6 AS keep_frac,
       CAST(COUNT(*) AS BIGINT) AS n_kept
FROM documents d
JOIN weights w ON d.source = w.source
WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
        / POWER(16, 13) < w.keep
GROUP BY d.source
ORDER BY d.source
""",
    "sampling", "temperature", "mixture",
)
def docs_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain resampling (q_g ∝ share_g^0.5, half the
    corpus): over-represented sources are down-sampled toward a flattened
    mixture — the standard multilingual/pretraining reweighting.  The
    per-source weight table is a bounded domain dim (broadcast); the
    sample itself is a deterministic hash filter, so membership is
    engine- and partitioning-reproducible.  Reports per source: corpus
    count, keep fraction, kept count.
    """
    docs = _t(spark, sf_dir, "documents")
    kept = sampling.temperature_sample(
        docs, "source", "doc_id", alpha=0.5, target_frac=0.5
    )
    totals = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total")
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.min("keep_frac").alias("keep_frac"),
        )
        .join(F.broadcast(totals), "source")
        .select("source", "n_total", "keep_frac", "n_kept")
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Quality deciles (curriculum buckets)
# ---------------------------------------------------------------------------


@register(
    "docs_quality_deciles",
    f"""
WITH t AS (
  SELECT doc_id, text, {_D_TOKS} AS toks FROM documents
),
q AS (
  SELECT doc_id,
         ROUND(0.25 * least(1.0, length(text) / 500.0)
             + 0.25 * (CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
                       / CAST(length(text) AS DOUBLE))
             + 0.25 * (CAST(len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))) AS DOUBLE)
                       / CAST(len(toks) AS DOUBLE))
             + 0.25 * least(1.0, len(toks) / 100.0), 6) AS quality
  FROM t
),
d AS (
  SELECT doc_id, quality,
         NTILE(10) OVER (ORDER BY quality, doc_id) AS decile
  FROM q
)
SELECT decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(quality) AS min_quality,
       MAX(quality) AS max_quality,
       CAST(SUM(CAST(quality AS DECIMAL(12,6))) AS DOUBLE) AS sum_quality
FROM d
GROUP BY decile
ORDER BY decile
""",
    "text", "quality", "curriculum", "ntile",
)
def docs_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum bucket assignment: exact quality deciles (NTILE over
    (quality, doc_id) — deterministic tiebreak) with per-decile count and
    quality range.  The per-decile mean is reported as the EXACT decimal
    sum (a rounded mean can land on a round-half boundary; the sum
    cannot).

    Scale posture: the window input is the narrow (quality, doc_id)
    projection, never text — but NTILE is still a single global sort; at
    100 TB assign buckets from approx_percentile thresholds instead (one
    sketch aggregate + a map-side CASE; the events_value_quantiles twin
    pattern).  This exact form is the oracle-checkable baseline the
    approx path is validated against.
    """
    from pyspark.sql import Window

    q = TX.quality_score(_t(spark, sf_dir, "documents")).select(
        "doc_id", "quality"
    )
    w = Window.orderBy("quality", "doc_id")
    return (
        q.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("quality").alias("min_quality"),
            F.max("quality").alias("max_quality"),
            F.sum(F.col("quality").cast("decimal(12,6)"))
            .cast("double")
            .alias("sum_quality"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Pack manifest (ordered per-bin document lists)
# ---------------------------------------------------------------------------


@register(
    "docs_pack_manifest",
    f"""
WITH t AS (
  SELECT lang, doc_id, CAST(len({_D_TOKS}) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT lang, doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM t
)
SELECT lang,
       CAST(FLOOR((cum - n_tokens) / 512.0) AS BIGINT) AS bin_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids
FROM c
GROUP BY lang, bin_id
ORDER BY lang, bin_id
""",
    "pipeline", "sequence-packing", "manifest",
)
def docs_pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch manifest a training data loader consumes: per (lang, bin)
    the ordered doc-id list alongside the pack stats — same single window
    pass as docs_pack_bins (shared assign_bins), with sort_array
    canonicalizing collect_list's shuffle-order nondeterminism."""
    docs = _t(spark, sf_dir, "documents")
    return PL.pack_manifest(docs, budget=512, part_col="lang").orderBy(
        "lang", "bin_id"
    )
