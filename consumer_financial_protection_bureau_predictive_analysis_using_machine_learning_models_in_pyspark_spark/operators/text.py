"""Text-analysis operators over a document corpus (beyond-reference
extension surface: language-ID, quality scoring, token counting,
fingerprinting — the operations a large-scale training-data pipeline needs).

All operators are pure column expressions (no UDFs): one narrow projection
per document, embarrassingly parallel, no shuffle.  At 100 TB these run at
parquet-scan speed inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import textfns as TF


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, and a BPE-ish
    subword estimate (chars/4 — the usual heuristic for byte-pair models)."""
    toks = TF.tokens(text_col)
    return df.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_tokens"),
        F.ceil(F.length(F.col(text_col)) / 4.0).cast("bigint").alias("bpe_estimate"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality in [0,1]: length, alphabetic ratio,
    stopword ratio, token-count saturation — equal-weighted."""
    text = F.col(text_col)
    toks = TF.tokens(text_col)
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in TF.STOPWORDS_EN])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    alpha_len = F.length(F.regexp_replace(text, r"[^A-Za-z ]", ""))
    len_score = F.least(F.lit(1.0), F.length(text) / F.lit(500.0))
    alpha_ratio = alpha_len.cast("double") / F.length(text).cast("double")
    stop_ratio = n_stop.cast("double") / n_tokens.cast("double")
    tok_score = F.least(F.lit(1.0), n_tokens / F.lit(100.0))
    return df.select(
        "doc_id",
        n_tokens.cast("bigint").alias("n_tokens"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(
            0.25 * len_score + 0.25 * alpha_ratio + 0.25 * stop_ratio
            + 0.25 * tok_score,
            6,
        ).alias("quality"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword-hit language heuristic: score = stopword hits per
    candidate language, argmax with a fixed precedence tiebreak; 'und'
    (undetermined) when no list scores.

    This is the cheap first-pass filter of an LLM data pipeline (a real
    model, e.g. fastText, slots in as a Pandas UDF behind the same
    signature)."""
    toks = TF.tokens(text_col)
    scores = {}
    for lang, words in TF.LANG_STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        scores[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    s = {k: F.col(f"score_{k}") for k in scores}
    pred = (
        F.when(
            (s["en"] == 0) & (s["es"] == 0) & (s["de"] == 0) & (s["fr"] == 0),
            F.lit("und"),
        )
        .when(
            (s["en"] >= s["es"]) & (s["en"] >= s["de"]) & (s["en"] >= s["fr"]),
            F.lit("en"),
        )
        .when((s["es"] >= s["de"]) & (s["es"] >= s["fr"]), F.lit("es"))
        .when(s["de"] >= s["fr"], F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    out = df.select(
        "doc_id",
        "lang",
        *[c.cast("bigint").alias(f"score_{k}") for k, c in scores.items()],
    )
    return out.withColumn("lang_pred", pred)


def fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """56-bit content fingerprint of normalized text (exact-dedup key)."""
    return df.select(
        "doc_id", TF.content_fingerprint(text_col).alias("fingerprint")
    )
