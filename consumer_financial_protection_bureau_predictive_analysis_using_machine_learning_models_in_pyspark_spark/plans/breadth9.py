"""Round-9 breadth entries.

Substring-level dedup (VERDICT r8 "What's missing" #2): cross-document
repeated-span location and excision — the standard LLM-pipeline operator
(Lee et al. 2022, approximated at k-gram granularity) that doc-level
Jaccard and containment both miss when the duplicated span is a minority
of each document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.textfns import HASH_P as P
from ..operators import pipeline as PL
from .catalog import _t, register

_SS_K = 10  # gram width == minimum detectable span length, in tokens

# Positional k-gram CTEs shared by both substring entries.  DuckDB list
# slicing is 1-based inclusive: toks[pos:pos+k-1] is exactly k tokens.
_SS_GRAMS_CTE = f"""
tok AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
g AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(unnest(range(1, len(toks) - {_SS_K} + 2)) AS BIGINT) AS pos,
         toks
  FROM tok WHERE len(toks) >= {_SS_K}
),
gr AS (
  SELECT doc_id, n_tokens, pos,
         CAST('0x' || substr(md5(array_to_string(toks[pos:pos+{_SS_K}-1], ' ')),
              1, 14) AS BIGINT) % {P} AS h
  FROM g
),
rep AS (
  SELECT h FROM gr GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
),
cov AS (
  SELECT gr.doc_id, gr.n_tokens, gr.pos FROM gr
  WHERE gr.h IN (SELECT h FROM rep)
),
flagged AS (
  SELECT doc_id, n_tokens, pos,
         CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   > {_SS_K} THEN 1 ELSE 0 END AS new_island
  FROM cov
),
islands AS (
  SELECT doc_id, n_tokens, pos,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
),
spans AS (
  SELECT doc_id, MIN(pos) AS tok_start, MAX(pos) + {_SS_K} - 1 AS tok_end
  FROM islands GROUP BY doc_id, island
)
""".strip()


@register(
    "docs_substring_dedup",
    f"""
WITH {_SS_GRAMS_CTE}
SELECT doc_id, CAST(tok_start AS BIGINT) AS tok_start,
       CAST(tok_end AS BIGINT) AS tok_end,
       CAST(tok_end - tok_start + 1 AS BIGINT) AS span_tokens
FROM spans
ORDER BY doc_id, tok_start
""",
    "pipeline", "dedup", "substring",
)
def docs_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc cut lists of cross-document repeated spans: maximal token
    ranges every {k}-gram of which appears in ≥ 2 distinct documents,
    merged over overlapping/adjacent gram windows (gaps-and-islands).
    Finds the shared boilerplate/contamination spans that doc-level
    Jaccard (< 0.2) and containment (< 0.9) both miss when the span is
    a minority of each doc — pinned on a hand fixture in
    tests/test_round9.py.  No pair join anywhere: linear in corpus size
    regardless of gram popularity (see operators/pipeline.py
    substring_spans for the full scale argument)."""
    return PL.substring_spans(
        _t(spark, sf_dir, "documents"), k=_SS_K
    ).orderBy("doc_id", "tok_start")


@register(
    "docs_substring_clean_stats",
    f"""
WITH {_SS_GRAMS_CTE},
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
         CAST(SUM(tok_end - tok_start + 1) AS BIGINT) AS cut_tokens
  FROM spans GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(COALESCE(p.cut_tokens, 0) AS BIGINT) AS cut_tokens,
       CAST(len(t.toks) - COALESCE(p.cut_tokens, 0) AS BIGINT) AS clean_tokens
FROM tok t LEFT JOIN per_doc p ON p.doc_id = t.doc_id
ORDER BY t.doc_id
""",
    "pipeline", "dedup", "substring",
)
def docs_substring_clean_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaned text lengths after repeated-span excision, for EVERY doc
    (zero-span docs included): (doc_id, n_tokens, n_spans, cut_tokens,
    clean_tokens).  Merged spans never double-count overlapping grams."""
    return PL.substring_clean_stats(
        _t(spark, sf_dir, "documents"), k=_SS_K
    ).orderBy("doc_id")
