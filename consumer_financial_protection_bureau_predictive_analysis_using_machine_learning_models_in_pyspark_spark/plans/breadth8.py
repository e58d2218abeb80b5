"""Round-8 catalog entries.

Leads with the HashingTF-parity hashed-features path (SURVEY §7 handoff
note b / VERDICT r7 item 4): ml.HashingTF's standard murmur3_x86_32 as a
native column expression on the Spark side and the identical generated
arithmetic as nested DuckDB subqueries on the oracle side — making the
last reference-adjacent transformer without a cross-checkable twin
oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import hashing as HH
from ..operators import text as TX
from .catalog import _t, register
from .text_queries import _D_TOKS

_HTF_N = 1024
_HTF_MAXB = 32

_HTF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_D_TOKS}) AS term FROM documents
),
f AS (
  SELECT doc_id, term FROM toks
  WHERE term <> '' AND octet_length(encode(term)) <= {_HTF_MAXB}
)
SELECT feature_ix,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_tokens
FROM {HH.hashingtf_index_duckdb_subquery(
    "SELECT doc_id, term FROM f", ["doc_id", "term"], "term", "feature_ix",
    _HTF_N, _HTF_MAXB)} q
GROUP BY feature_ix
ORDER BY feature_ix
"""


@register(
    "docs_hashed_features",
    _HTF_ORACLE,
    "text", "features", "hashing",
)
def docs_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml.HashingTF-compatible hashed term features, fully native and
    DuckDB-oracled.

    ``feature_ix`` = ``HashingTF(1024).indexOf(term)`` — standard
    murmur3_x86_32 seed 42 over UTF-8 bytes (``hashUnsafeBytes2``), which
    ``F.hash`` does NOT match for tokens whose byte length % 4 != 0
    (functions/hashing.py documents the tail-handling difference; the
    real-HashingTF parity pin is tests/test_hashingtf_parity.py).

    Scale: explode → 90-step codegen'd hash projection → one partial-agg
    shuffle with ≤1024 reduce groups.  No Python, no fanout joins.
    """
    return TX.hashed_term_features(
        _t(spark, sf_dir, "documents"),
        num_features=_HTF_N,
        max_bytes=_HTF_MAXB,
    )
