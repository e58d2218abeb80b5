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
from pyspark.storagelevel import StorageLevel

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


def quality_score(
    df: DataFrame, text_col: str = "text", keep: tuple[str, ...] = ()
) -> DataFrame:
    """Heuristic document quality in [0,1]: length, alphabetic ratio,
    stopword ratio, token-count saturation — equal-weighted.  ``keep``
    carries extra passthrough columns (e.g. ``source`` for per-domain
    standardization) so downstream grouping never re-joins the corpus."""
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
        *keep,
        n_tokens.cast("bigint").alias("n_tokens"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(
            0.25 * len_score + 0.25 * alpha_ratio + 0.25 * stop_ratio
            + 0.25 * tok_score,
            6,
        ).alias("quality"),
    )


def quality_moments(text_col: str = "text") -> tuple[Column, Column, Column, Column]:
    """The four exact integer moments that determine the quality score:
    (L, N, A, S) = (char length, token count, alphabetic char count,
    stopword count), each as a BIGINT column with a ``greatest(.., 1)``
    divide-by-zero guard on L and N (mirrored verbatim in the DuckDB
    oracles).  Shared by ``quality_score_exact`` and every catalog entry
    that puts quality on a driver hash surface."""
    text = F.col(text_col)
    toks = TF.tokens(text_col)
    stop_arr = F.array(*[F.lit(s) for s in TF.STOPWORDS_EN])
    L = F.greatest(F.length(text).cast("bigint"), F.lit(1).cast("bigint"))
    N = F.greatest(F.size(toks).cast("bigint"), F.lit(1).cast("bigint"))
    A = F.length(F.regexp_replace(text, r"[^A-Za-z ]", "")).cast("bigint")
    S = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast(
        "bigint"
    )
    return L, N, A, S


def quality_u_expr() -> Column:
    """The micro-unit quality fold over moment columns ``_l/_n/_a/_s``
    (as projected by callers from :func:`quality_moments`): BIGINT,
    half-up integer division only — see :func:`quality_score_exact`."""
    return (
        F.least(F.col("_l"), F.lit(500)) * F.lit(2000)
        + F.expr("(2000000 * _a + _l) DIV (2 * _l)")
        + F.expr("(2000000 * _s + _n) DIV (2 * _n)")
        + F.least(F.col("_n"), F.lit(100)) * F.lit(10000)
    ).cast("bigint")


def quality_score_exact(
    df: DataFrame, text_col: str = "text", keep: tuple[str, ...] = ()
) -> DataFrame:
    """Engine-stable integer twin of ``quality_score``: the same
    equal-weighted heuristic, but every ratio is half-up-rounded to
    integer MICRO-units (1e-6) with pure int64 arithmetic, so the result
    is bit-identical on any engine/build — no IEEE double ever touches
    the surface.

    Emitted columns (all BIGINT):

    - ``n_tokens``
    - ``alpha_ratio_u``    = round_half_up(1e6 · alpha_chars / chars)
    - ``stopword_ratio_u`` = round_half_up(1e6 · stopwords / tokens)
    - ``quality_u``        = Σ of the four per-term micro ratios, i.e.
      4e6 · quality with each term individually rounded;
      quality_u / 4e6 agrees with ``quality_score``'s float ``quality``
      to within 5e-7 (pinned in tests).

    round_half_up(p/q) for positive ints is ``(2p + q) DIV (2q)`` —
    truncating integer division, identical in Spark (``DIV``) and DuckDB
    (``//``).  Motivation (r6 postmortem, `dedup_canonical_best` /
    `docs_unigram_logprob`): ``ROUND(<IEEE double>, 6)`` recomputed on
    two engines is build-sensitive at 6th-decimal rounding boundaries;
    ranking or hashing on that float can flip.  This surface cannot.
    """
    L, N, A, S = quality_moments(text_col)
    base = df.select(
        "doc_id",
        *keep,
        L.alias("_l"),
        N.alias("_n"),
        A.alias("_a"),
        S.alias("_s"),
    )
    alpha_u = F.expr("(2000000 * _a + _l) DIV (2 * _l)")
    stop_u = F.expr("(2000000 * _s + _n) DIV (2 * _n)")
    return base.select(
        "doc_id",
        *keep,
        F.col("_n").alias("n_tokens"),
        alpha_u.cast("bigint").alias("alpha_ratio_u"),
        stop_u.cast("bigint").alias("stopword_ratio_u"),
        quality_u_expr().alias("quality_u"),
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


# --- Gopher/C4-style repetition & quality filters -------------------------

def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition statistics (the Gopher-rules family):
    most-frequent-token share, distinct-token ratio, duplicate-bigram
    fraction.  High values mark boilerplate / degenerate generations that
    an LLM training pipeline drops before training.

    Two scale-friendly passes over a NAMED token column (projecting the
    split once — inlining it into every element_at re-runs the regex per
    element):

    - token mode via explode → (id, token) partial agg → per-doc max; the
      combiner absorbs repeated tokens map-side, so the shuffle carries at
      most one row per distinct (doc, token), never raw length.  This stays
      linear for arbitrarily long documents, unlike an O(n·d) higher-order
      array fold.
    - bigram duplication entirely as array expressions — zero shuffle.
    """
    toks = df.select(id_col, TF.tokens(text_col).alias("_toks"))
    per_tok = (
        toks.select(id_col, F.explode("_toks").alias("_tok"))
        .groupBy(id_col, "_tok")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(
            F.sum("_c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct_tokens"),
            F.max("_c").alias("top_token_count"),
        )
    )
    # Guard: sequence(1, size-1) runs DESCENDING for 1-token docs.
    bigrams = F.when(
        F.size("_toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("_toks") - 1),
            lambda j: F.concat_ws(
                " ", F.element_at(F.col("_toks"), j), F.element_at(F.col("_toks"), j + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    per_bg = toks.select(id_col, bigrams.alias("_bg")).select(
        id_col,
        F.size("_bg").cast("bigint").alias("n_bigrams"),
        F.size(F.array_distinct("_bg")).cast("bigint").alias("_n_distinct_bg"),
    )
    return (
        per_tok.join(per_bg, id_col)
        .select(
            id_col,
            "n_tokens",
            "n_distinct_tokens",
            "top_token_count",
            F.round(
                F.col("top_token_count").cast("double") / F.col("n_tokens"), 6
            ).alias("top_token_fraction"),
            F.round(
                F.col("n_distinct_tokens").cast("double") / F.col("n_tokens"), 6
            ).alias("distinct_token_ratio"),
            "n_bigrams",
            F.when(
                F.col("n_bigrams") > 0,
                F.round(
                    F.lit(1.0)
                    - F.col("_n_distinct_bg").cast("double") / F.col("n_bigrams"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_bigram_fraction"),
        )
    )


def _doc_term_frames(
    df: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """Shared unigram core: explode once, then the per-(doc, term) count
    frame and the corpus vocabulary-count frame.  Map-side combine absorbs
    repeated terms, so the shuffle carries distinct pairs, never raw
    token volume."""
    toks = df.select(id_col, F.explode(TF.tokens(text_col)).alias("_tok"))
    doc_tf = toks.groupBy(id_col, "_tok").agg(F.count(F.lit(1)).alias("_tf"))
    vocab = toks.groupBy("_tok").agg(F.count(F.lit(1)).alias("_cnt"))
    return doc_tf, vocab


def unigram_check_fold(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Transcendental-free verification surface for the unigram-LM scorer:
    the same explode → per-doc tf → vocab-count → broadcast-join plan as
    :func:`unigram_logprob`, folded with EXACT integer arithmetic —
    ``n_tokens = Σ tf``, ``sum_tf_cnt = Σ tf·cnt`` and
    ``sum_tf2_cnt = Σ tf²·cnt``.  Together the two moments pin the joined
    (tf, cnt) multiset per document, so any divergence in tokenization,
    counting, or the join reproduces here — while ln(p) (whose rounded
    recomputation proved DuckDB-build-sensitive across two driver rounds)
    never enters the cross-engine comparison.  ln itself is a fixed
    deterministic function of (cnt, Σcnt), pinned separately in pytest.

    bigint headroom: Σ tf²·cnt ≤ n_tokens·max_tf·max_cnt; at the sf0.01
    oracle scale that is ≪ 2^63, and the production scorer is
    :func:`unigram_logprob` — this entry exists to verify it.
    """
    doc_tf, vocab = _doc_term_frames(df, id_col, text_col)
    return (
        doc_tf.join(F.broadcast(vocab), "_tok")
        .groupBy(id_col)
        .agg(
            F.sum("_tf").cast("bigint").alias("n_tokens"),
            F.sum(F.col("_tf") * F.col("_cnt")).cast("bigint").alias("sum_tf_cnt"),
            F.sum(F.col("_tf") * F.col("_tf") * F.col("_cnt"))
            .cast("bigint")
            .alias("sum_tf2_cnt"),
        )
    )


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus unigram-LM score per document: mean ln P(token) under the
    corpus's own unigram distribution — the cheap perplexity proxy used to
    quality-rank documents before training (a real LM scorer, e.g. KenLM,
    slots in as a Pandas UDF behind the same signature; this native
    version IS the production fallback, not a stub).

    Shape: explode once → per-(doc, term) counts (map-side combine absorbs
    repeats, so the shuffle carries distinct pairs, never raw length) →
    global term frequencies (vocab-sized — broadcast-joined back) → exact
    decimal fold of tf·ln(p).  ln is rounded to 6 decimals before the
    decimal cast — but two rounds of driver evidence showed that ROUND of
    a recomputed transcendental is engine-BUILD-sensitive (DuckDB's
    ROUND(double,n) is binary-multiply based vs Spark's exact-decimal
    HALF_UP, so a different libm build can land a term on the other side
    of a rounding boundary at ANY precision).  The ln fold is therefore
    no longer on the cross-engine comparison surface at all: the driver
    oracle checks :func:`unigram_check_fold` (exact integer math over the
    same explode→tf→vocab→join plan), and the ln values are pinned in
    pytest (hand-computed exact check plus a relative-tolerance DuckDB
    cross-check).
    Returns (doc_id, n_tokens, sum_logprob, mean_logprob).
    """
    doc_tf, vocab = _doc_term_frames(df, id_col, text_col)
    total = vocab.agg(F.sum("_cnt").alias("_total"))
    logp = (
        vocab.crossJoin(F.broadcast(total))  # 1-row scalar: free at any scale
        .select(
            "_tok",
            F.round(
                F.log(F.col("_cnt").cast("double") / F.col("_total")), 6
            )
            .cast("decimal(20,6)")
            .alias("_logp"),
        )
    )
    return (
        doc_tf.join(F.broadcast(logp), "_tok")
        .groupBy(id_col)
        .agg(
            F.sum("_tf").cast("bigint").alias("n_tokens"),
            # tf must be a NARROW decimal before the multiply: bigint
            # promotes to decimal(20,0), and a (20,0)x wide-decimal product
            # exceeds Spark's 38-digit cap, which silently cuts the
            # product's scale. (10,0)x(20,6) -> (31,6) keeps the fold exact.
            # The exact decimal sum is the oracle-checkable value: a
            # rounded MEAN can land exactly on a round-half boundary
            # (sum/2^k divisions preserve it), where engines' half-up vs
            # half-even tie-breaks disagree at the last emitted digit.
            F.sum(F.col("_tf").cast("decimal(10,0)") * F.col("_logp"))
            .cast("decimal(30,6)")
            .alias("sum_logprob"),
            F.round(
                F.sum(F.col("_tf").cast("decimal(10,0)") * F.col("_logp"))
                .cast("double")
                / F.sum("_tf").cast("double"),
                6,
            ).alias("mean_logprob"),
        )
    )


# PII patterns — shared by the Spark operator and the DuckDB oracle; kept to
# RE2 ∩ java.util.regex syntax (character classes + bounded repeats only, no
# backrefs/lookarounds) so both engines match identically.
PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_SSN_RE = r"[0-9]{3}-[0-9]{2}-[0-9]{4}"
PII_PHONE_RE = r"[0-9]{3}-[0-9]{4}"


def pii_redact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact emails → SSNs → phone numbers (in that fixed order, so the
    narrower phone pattern can never eat an SSN's tail) and count each.

    Pure regexp column expressions — whole-stage-codegen'd, no UDF; at
    100 TB this is an embarrassingly parallel map with zero shuffle.
    """
    orig = F.col(text_col)
    n_emails = F.regexp_count(orig, F.lit(PII_EMAIL_RE)).cast("bigint")
    r1 = F.regexp_replace(orig, PII_EMAIL_RE, "<EMAIL>")
    n_ssns = F.regexp_count(r1, F.lit(PII_SSN_RE)).cast("bigint")
    r2 = F.regexp_replace(r1, PII_SSN_RE, "<SSN>")
    n_phones = F.regexp_count(r2, F.lit(PII_PHONE_RE)).cast("bigint")
    r3 = F.regexp_replace(r2, PII_PHONE_RE, "<PHONE>")
    return df.select(
        id_col,
        n_emails.alias("n_emails"),
        n_ssns.alias("n_ssns"),
        n_phones.alias("n_phones"),
        r3.alias("redacted"),
    )


def bm25_rank(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 top-k ranking for a fixed query-term set (the Lucene
    +1-smoothed idf): score(d) = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1-b +
    b·dl/avgdl)), idf_t = ln((N - df_t + 0.5)/(df_t + 0.5) + 1).

    Shape: the tokenized corpus is aggregated twice — per-doc lengths,
    and query-term tf (the isin filter keeps only |query| terms, so that
    shuffle is tiny).  Catalyst does not share the explode subplan, so
    these are two passes over the narrow text column (cheap scans; at
    100 TB persist the exploded frame or pre-compute dl as a stored
    column to collapse them); df_t and the (N, Σdl) scalars ride along
    as broadcast frames and text itself never shuffles.  The per-term
    scores fold through DECIMAL(20,12) so the cross-term sum is
    order-independent; ln carries the usual ≤1-ulp libm caveat
    (measure-zero at the 12-decimal cut).  Top-k by (score desc, id) is
    deterministic and runs as orderBy+limit — Spark's
    TakeOrderedAndProject, a per-partition local top-k merged at the
    driver — NOT an unpartitioned ranking window, which would funnel
    every doc matching any query term into one task (scale-linear for
    common terms; ADVICE r4).  Only the k survivors see the row_number
    window that materializes their rank.
    """
    from pyspark.sql import Window

    toks = df.select(id_col, F.explode(TF.tokens(text_col)).alias("_tok"))
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).cast("bigint").alias("_dl"))
    scal = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("_n_docs"),
        F.sum("_dl").cast("bigint").alias("_sum_dl"),
    )
    qt = toks.filter(F.col("_tok").isin(list(query_terms)))
    tf = qt.groupBy(id_col, "_tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("_tf")
    )
    dfreq = qt.groupBy("_tok").agg(
        F.count_distinct(F.col(id_col)).cast("bigint").alias("_df")
    )
    avgdl = F.col("_sum_dl").cast("double") / F.col("_n_docs").cast("double")
    idf = F.log(
        (F.col("_n_docs").cast("double") - F.col("_df").cast("double") + F.lit(0.5))
        / (F.col("_df").cast("double") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("_tf").cast("double") + F.lit(float(k1)) * (
        F.lit(1.0 - b) + F.lit(float(b)) * (F.col("_dl").cast("double") / avgdl)
    )
    term_score = idf * (
        (F.col("_tf").cast("double") * F.lit(float(k1 + 1.0))) / denom
    )
    w = Window.orderBy(F.col("_score_dec").desc(), F.col(id_col))
    return (
        tf.join(F.broadcast(dfreq), "_tok")
        .join(dl, id_col)
        .crossJoin(F.broadcast(scal))
        .withColumn("_term_dec", term_score.cast("decimal(20,12)"))
        .groupBy(id_col)
        .agg(F.sum("_term_dec").alias("_score_dec"))
        .orderBy(F.col("_score_dec").desc(), F.col(id_col))
        .limit(k)  # TakeOrderedAndProject: distributed local top-k + merge
        .withColumn("rank", F.row_number().over(w))
        .select(
            id_col,
            F.round(F.col("_score_dec").cast("double"), 6).alias("bm25"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def corpus_datasheet(
    df: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """The dataset datasheet: per ``group_col`` (source/domain) — doc
    count, whitespace-token and BPE-estimate totals, exact integer
    quality mass, and predicted-English share — the summary table every
    corpus release ships, computed in ONE aggregation pass (per-doc
    expressions project once, every stat is a parallel agg — never a
    pass per metric; at 100 TB this is a single map-reduce over the
    narrow (group, text) projection).

    Quality folds as exact BIGINT micro-units (quality_score_exact's
    ``quality_u`` — order-independent and engine-stable, unlike the
    pre-r7 sum of ROUND()ed floats); language share reuses language_id's
    argmax expression in place.  Returns (group, n_docs, n_tokens,
    bpe_estimate, sum_quality_u, n_pred_en).
    """
    text = F.col(text_col)
    toks = TF.tokens(text_col)
    n_tokens = F.size(toks)
    scores = {}
    for lang, words in TF.LANG_STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        scores[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    s = scores
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
    L, N, A, S = quality_moments(text_col)
    per_doc = df.select(
        F.col(group_col).alias("grp"),
        n_tokens.cast("bigint").alias("_nt"),
        F.ceil(F.length(text) / 4.0).cast("bigint").alias("_bpe"),
        L.alias("_l"),
        N.alias("_n"),
        A.alias("_a"),
        S.alias("_s"),
        (pred == "en").cast("int").alias("_en"),
    ).select(
        "grp",
        "_nt",
        "_bpe",
        quality_u_expr().alias("_qu"),
        "_en",
    )
    return (
        per_doc.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("_nt").cast("bigint").alias("n_tokens"),
            F.sum("_bpe").cast("bigint").alias("bpe_estimate"),
            F.sum("_qu").cast("bigint").alias("sum_quality_u"),
            F.sum("_en").cast("bigint").alias("n_pred_en"),
        )
        .withColumnRenamed("grp", group_col)
    )


def bigram_pmi(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 3,
    top_k: int = 50,
) -> DataFrame:
    """Collocation mining: top-k token bigrams by pointwise mutual
    information, PMI = ln( P(xy) / (P(x)P(y)) ) — the standard
    phrase-detection pass (word2vec-style phrase merging, tokenizer
    vocabulary curation) a corpus pipeline runs before training.

    Shape: bigrams are built IN-ROW (zip the token array against its
    own tail — no positional self-join, no shuffle to form pairs), then
    one explode feeds the bigram counts and one the unigram counts; the
    vocab and the two 1-row totals broadcast back onto the (tiny,
    min_count-filtered) bigram frame.  The PMI argument is computed as
    ONE double division of two products of exactly-represented integer
    doubles, left-associated identically in the SQL oracle, so the only
    engine-variant op is the final ln — absorbed by 6-decimal rounding
    (the unigram_logprob lesson).  Returns (t1, t2, c_xy, pmi),
    deterministically ordered (pmi desc, t1, t2) and limited to top_k.
    """
    toks = df.select(TF.tokens(text_col).alias("_toks")).filter(
        F.size("_toks") >= 2
    )
    pairs = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(_toks) - 2),"
                " i -> struct(_toks[i] AS t1, _toks[i + 1] AS t2))"
            )
        ).alias("_p")
    ).select("_p.t1", "_p.t2")
    uni = df.select(F.explode(TF.tokens(text_col)).alias("t"))
    c_uni = uni.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    n_uni = c_uni.agg(F.sum("c").cast("double").alias("n_uni"))
    c_bi = pairs.groupBy("t1", "t2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_xy")
    )
    n_bi = c_bi.agg(F.sum("c_xy").cast("double").alias("n_bi"))
    scored = (
        c_bi.filter(F.col("c_xy") >= min_count)
        .join(F.broadcast(c_uni.select(F.col("t").alias("t1"), F.col("c").alias("c_x"))), "t1")
        .join(F.broadcast(c_uni.select(F.col("t").alias("t2"), F.col("c").alias("c_y"))), "t2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select(
            "t1",
            "t2",
            "c_xy",
            F.round(
                F.log(
                    (F.col("c_xy").cast("double") * F.col("n_uni") * F.col("n_uni"))
                    / (F.col("n_bi") * F.col("c_x").cast("double") * F.col("c_y").cast("double"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "t1", "t2").limit(top_k)


def quality_zscore_by_source(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-domain quality standardization: each source's docs are scored
    against the SOURCE's own quality distribution (mean, population sd),
    and the outlier count |z| > 2 is reported — the calibration step
    that stops one verbose domain's absolute scores from drowning
    another's in a global quality cut.

    Two-phase, join-back shape: phase 1 folds exact BIGINT sums of the
    micro-unit quality (quality_score_exact) and its square per source
    (one keyed agg; mean/sd derive from the exact integer sums with a
    FIXED double expression order mirrored in the oracle — every double
    op in that chain is IEEE-correctly-rounded from exact integers, so
    the |z| > 2 comparison is engine-stable, unlike the pre-r7 surface
    that summed ROUND()ed floats); phase 2 broadcasts the domain-sized
    stats table back onto the doc stream for the outlier compare — the
    corpus itself never shuffles.  Output per source: n_docs, sum_qu,
    sum_qu2, n_outliers — integer moments only on the hash surface
    (mean/sd are derivable; the rounded forms live in pytest).

    bigint headroom: qu ≤ 4e6 so qu² ≤ 1.6e13; Σqu² overflows int64
    only past ~576k docs per source — far beyond any driver/bench scale
    (switch the fold to DECIMAL(38,0) when a real corpus approaches it).
    """
    q = quality_score_exact(df, text_col, keep=("source",)).select(
        "source", F.col("quality_u").alias("_qu")
    )
    stats = q.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("_qu").cast("bigint").alias("_sum_qu"),
        F.sum(F.col("_qu") * F.col("_qu")).cast("bigint").alias("_sum_qu2"),
    )
    mean = F.col("_sum_qu").cast("double") / F.col("n_docs").cast("double")
    var = F.col("_sum_qu2").cast("double") / F.col("n_docs").cast("double") - (
        F.col("_sum_qu").cast("double") / F.col("n_docs").cast("double")
    ) * (F.col("_sum_qu").cast("double") / F.col("n_docs").cast("double"))
    stats = stats.select(
        "source",
        "n_docs",
        F.col("_sum_qu").alias("sum_qu"),
        F.col("_sum_qu2").alias("sum_qu2"),
        mean.alias("_mean"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("_sd"),
    )
    outliers = (
        q.join(F.broadcast(stats), "source")
        .select(
            "source",
            (
                F.abs(F.col("_qu").cast("double") - F.col("_mean"))
                > F.lit(2.0) * F.col("_sd")
            ).cast("int").alias("_out"),
        )
        .groupBy("source")
        .agg(F.sum("_out").cast("bigint").alias("n_outliers"))
    )
    return stats.join(outliers, "source").select(
        "source",
        "n_docs",
        "sum_qu",
        "sum_qu2",
        "n_outliers",
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    sizes: tuple[int, ...] = (5, 10, 20),
) -> DataFrame:
    """Tokenizer-vocabulary coverage curve: for each candidate vocab size
    V, the fraction of all corpus tokens covered by the V most frequent
    types (ties broken by token text) — the number that decides a
    vocabulary cut before training a tokenizer.

    Shape: one explode → type counts (map-side combine), ONE ordered
    window over the TYPE table for ranks, then a single conditional agg
    emits every V's (covered, n_types) pair side by side; `stack`
    unpivots the 1-row result.  The global sort is over the type
    dictionary — vocabulary-bounded (millions of rows at web scale, not
    corpus-bounded) — the same bounded-dim window rationale as the
    catalog's NTILE queries.  Returns (vocab_size, n_types,
    covered_tokens, total_tokens, coverage)."""
    from pyspark.sql import Window

    cnt = (
        df.select(F.explode(TF.tokens(text_col)).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    rn = F.row_number().over(Window.orderBy(F.desc("c"), "t"))
    ranked = cnt.withColumn("rn", rn)
    aggs = [F.sum("c").cast("bigint").alias("_tot")]
    for v in sizes:
        aggs += [
            F.sum(F.when(F.col("rn") <= v, F.col("c")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias(f"_cov_{v}"),
            F.sum(F.when(F.col("rn") <= v, 1).otherwise(0))
            .cast("bigint")
            .alias(f"_nt_{v}"),
        ]
    wide = ranked.agg(*aggs)
    stack = ", ".join(f"{v}, _nt_{v}, _cov_{v}, _tot" for v in sizes)
    return wide.selectExpr(
        f"stack({len(sizes)}, {stack}) AS "
        "(vocab_size, n_types, covered_tokens, total_tokens)"
    ).select(
        "vocab_size",
        "n_types",
        "covered_tokens",
        "total_tokens",
        F.round(
            F.col("covered_tokens").cast("double")
            / F.col("total_tokens").cast("double"),
            6,
        ).alias("coverage"),
    )


def _bpe_train(
    df: DataFrame,
    text_col: str,
    vocab_size: int,
    n_merges: int,
) -> tuple[list[DataFrame], DataFrame]:
    """Shared BPE training core: returns (per-step rule frames, the final
    merged word dict).  The ONLY corpus-sized pass is the word-frequency
    aggregate; the merge loop iterates on the top-``vocab_size``
    word/frequency DICT (the classic formulation), so steps cost
    O(vocab) each — independent of corpus size.  The dict frame is
    persisted once; each step is a vocabulary-sized explode→agg plus a
    1-row broadcast of the winning rule (no driver collect anywhere —
    the rule joins back as data).  A step with no pairs left yields an
    EMPTY rule frame; the LEFT-join-on-TRUE dict update applies it as
    identity instead of wiping the vocabulary."""
    toks = df.select(F.explode(TF.tokens(text_col)).alias("word"))
    vocab = (
        toks.filter(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .orderBy(F.desc("w"), "word")
        .limit(vocab_size)
    )
    v = vocab.select(
        "word",
        "w",
        F.regexp_replace("word", "(.)", "{$1}").alias("seq"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    v.count()  # one corpus scan total; iterations run off this dict

    rules = []
    for step in range(1, n_merges + 1):
        arr = F.split(
            F.replace(F.col("seq"), F.lit("}{"), F.lit("} {")), " "
        )
        pair_list = F.when(
            F.size(arr) >= 2,
            F.expr(
                "transform(sequence(1, size(_a) - 1),"
                " i -> concat(element_at(_a, i), element_at(_a, i + 1)))"
            ),
        ).otherwise(F.expr("array()"))
        pairs = (
            v.withColumn("_a", arr)
            .select("w", F.explode(pair_list).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("w").cast("bigint").alias("freq"))
        )
        rule = (
            pairs.orderBy(F.desc("freq"), "pair")
            .limit(1)
            .select(
                F.lit(step).alias("step"),
                "pair",
                F.replace(F.col("pair"), F.lit("}{"), F.lit("")).alias(
                    "merged"
                ),
                "freq",
            )
        )
        # Each rule frame is consumed twice (merge table + the next dict
        # update): persist + materialize the 1-row frame, or the lazy
        # chain branches 2x per step and the final action replays
        # 2^n_merges vocab-sized jobs (measured: 12 s -> ~3 s at sf0.1).
        rule = rule.persist(StorageLevel.MEMORY_AND_DISK)
        rule.count()
        rules.append(rule)
        v = v.join(
            F.broadcast(rule.select("pair", "merged")), F.lit(True), "left"
        ).select(
            "word",
            "w",
            F.when(
                F.col("pair").isNotNull(),
                F.replace(F.col("seq"), F.col("pair"), F.col("merged")),
            )
            .otherwise(F.col("seq"))
            .alias("seq"),
        )
    return rules, v


def bpe_merge_steps(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 500,
    n_merges: int = 5,
) -> DataFrame:
    """BPE tokenizer training, the discovery loop: iteratively find the
    most frequent adjacent symbol pair in the corpus vocabulary and merge
    it — the algorithm behind GPT/Llama tokenizers (Sennrich et al. 2016).
    Returns the ordered merge table (step, pair, merged, freq); the loop
    itself lives in :func:`_bpe_train` (shared with
    :func:`bpe_subword_vocab`).

    Symbol sequences are strings of brace-wrapped symbols ("{l}{o}{w}");
    since the vocabulary is filtered to ^[a-z]+$ words, braces cannot
    occur inside symbols, so a literal replace of "{a}{b}"→"{ab}" is
    boundary-safe and left-to-right-deterministic on both engines (the
    same representation the oracle SQL unrolls).  Ties break on pair
    text, so the merge table is fully deterministic.  A corpus too small
    to learn ``n_merges`` rules returns fewer rows (empty steps are
    dropped rather than fabricated).
    """
    rules, _ = _bpe_train(df, text_col, vocab_size, n_merges)
    out = rules[0]
    for r in rules[1:]:
        out = out.unionByName(r)
    # the persisted dict (and per-step rule frames) must outlive the
    # returned lazy frame; they self-unpersist with the session
    return out.orderBy("step")


def bpe_subword_vocab(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 500,
    n_merges: int = 5,
) -> DataFrame:
    """The third tokenizer artifact: the SUBWORD VOCABULARY with corpus
    frequencies after the learned merges — what a tokenizer ships beside
    its merge table (train → encode → vocab completes the lifecycle).

    Same :func:`_bpe_train` loop, then the FINAL merged symbol sequences
    of the top-``vocab_size`` word dict explode into symbols, each
    occurrence weighted by its word's corpus frequency.  Output
    (symbol, freq) — brace wrapping stripped — ordered by freq desc then
    symbol.  The explode is over the vocabulary dict (≤ vocab_size rows
    × word length), never the corpus; all-integer output, exact
    cross-engine parity for free.
    """
    _, v = _bpe_train(df, text_col, vocab_size, n_merges)
    sym = F.explode(
        F.split(F.replace(F.col("seq"), F.lit("}{"), F.lit("} {")), " ")
    ).alias("_sym")
    return (
        v.select("w", sym)
        .select(
            F.replace(
                F.replace(F.col("_sym"), F.lit("{"), F.lit("")),
                F.lit("}"),
                F.lit(""),
            ).alias("symbol"),
            F.col("w"),
        )
        .groupBy("symbol")
        .agg(F.sum("w").cast("bigint").alias("freq"))
        .orderBy(F.desc("freq"), "symbol")
    )


def bpe_encode_stats(
    df: DataFrame,
    merges: DataFrame,
    n_merges: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BPE tokenizer INFERENCE — the other half of :func:`bpe_merge_steps`'
    training loop: apply the learned merge table, in step order, to every
    document and report per-doc token economics (word count, symbol count
    before merging, subword count after).  Together the two entries close
    the tokenizer lifecycle: train on the corpus, encode the corpus.

    Scale shape: merges apply to the DISTINCT word vocabulary, never to
    running text — the corpus-sized side only explodes to (doc, word)
    pairs and joins the encoded vocabulary back by word, so the string
    rewriting cost is O(|vocab| · n_merges) regardless of corpus size
    (the same dict-formulation argument as training).  Each merge step is
    a 1-row broadcast of that step's rule; application order is the
    training order, which BPE inference requires.

    Counting trick: subwords per word = occurrences of '{' in the merged
    brace-sequence (every symbol carries exactly one opening brace) —
    pure integer string math, exact on both engines, which is what makes
    the whole entry value-oracle-able with zero numeric-parity caveats.
    """
    words = df.select(
        id_col, F.explode(TF.tokens(text_col)).alias("word")
    ).filter(F.col("word").rlike("^[a-z]+$"))
    enc = (
        words.select("word")
        .distinct()
        .withColumn("seq", F.regexp_replace("word", "(.)", "{$1}"))
    )
    for step in range(1, n_merges + 1):
        rule = merges.filter(F.col("step") == step).select("pair", "merged")
        # LEFT join on TRUE, not crossJoin: a corpus too small to learn
        # n_merges rules yields an EMPTY rule frame for the missing
        # steps, and a crossJoin against it would silently wipe the
        # vocabulary; the left join keeps rows and the when() applies
        # the identity instead.
        enc = enc.join(F.broadcast(rule), F.lit(True), "left").select(
            "word",
            F.when(
                F.col("pair").isNotNull(),
                F.replace(F.col("seq"), F.col("pair"), F.col("merged")),
            )
            .otherwise(F.col("seq"))
            .alias("seq"),
        )
    enc = enc.select(
        "word",
        (
            F.length("seq")
            - F.length(F.replace(F.col("seq"), F.lit("{"), F.lit("")))
        )
        .cast("bigint")
        .alias("_n_sub"),
    )
    return (
        words.join(enc, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(F.length("word")).cast("bigint").alias("n_symbols"),
            F.sum("_n_sub").cast("bigint").alias("n_subwords"),
        )
    )


def hashed_term_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_features: int = 1024,
    max_bytes: int = 32,
) -> DataFrame:
    """Per-feature-bucket statistics of ml.HashingTF-compatible hashed
    term features: ``(feature_ix, n_docs, n_tokens)``.

    ``feature_ix`` is exactly ``HashingTF(numFeatures).indexOf(term)``
    (standard murmur3_x86_32, seed 42 — NOT ``F.hash``'s lenient-tail
    variant; see functions/hashing.py), computed as a native unrolled
    column expression, so the hashed-features transformer the reference
    family uses (pyspark.ml TF featurization,
    complaints_narrative_LDA.py:70-80's CountVectorizer sibling) is
    DuckDB-oracle-checkable end-to-end.

    Tokens longer than ``max_bytes`` UTF-8 bytes are filtered on both
    engine and oracle sides (natural-language tokens; the cap bounds the
    unrolled hash rounds).  Scale: explode → hash → one partial-agg
    shuffle on feature_ix (≤ num_features reduce groups); everything
    stays in whole-stage codegen — zero Python transfer.
    """
    from ..functions.hashing import with_hashingtf_index

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(TF.tokens(text_col)).alias("term"),
    ).filter((F.col("term") != "") & (F.octet_length("term") <= max_bytes))
    hashed = with_hashingtf_index(toks, "term", "feature_ix", num_features, max_bytes)
    return (
        hashed.groupBy("feature_ix")
        .agg(
            F.countDistinct("_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        )
        .orderBy("feature_ix")
    )


def bigram_condprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document bigram LM fit score — the quality-filter proxy a
    CCNet-style pipeline computes with a KenLM n-gram model, expressed
    engine-exactly: for every bigram (w1, w2) in the doc, the corpus
    conditional probability P(w2|w1) = c(w1,w2)/c(w1·) in half-up 1e-6
    micro-units, summed per doc (pure int64 — no ln on the hash surface,
    per the r7 ROUND-audit discipline; a doc of corpus-typical
    transitions scores high, boilerplate/garbage scores low).

    Returns (doc_id, n_bigrams, sum_condprob_u, avg_condprob_u).

    Shape: bigrams built IN-ROW (transform over the token array — no
    positional self-join); ONE explode feeds both the corpus bigram
    counts and the per-doc rows (the frame is persisted — two
    consumers); c(w1·) is the bigram-left marginal (sums to the bigram
    total, so probabilities normalize exactly).  The count dims join
    back BROADCAST (bigram vocabulary is sublinear in corpus size).
    At 100 TB: two keyed aggs over the exploded bigrams + broadcast
    joins; the corpus text is read once.

    Cache lifecycle: the persist is session-scoped and DEDUPED by
    logical plan (Spark's CacheManager reuses one entry across repeated
    calls on the same input — it never accumulates copies); in a
    long-lived session the caller owns releasing it
    (``spark.catalog.clearCache()`` or unpersisting the returned
    frame's source) once the result is materialized.
    """
    from pyspark.storagelevel import StorageLevel

    pairs = (
        df.select(F.col(id_col).alias("_id"), TF.tokens(text_col).alias("_toks"))
        .filter(F.size("_toks") >= 2)
        .select(
            "_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(_toks) - 2),"
                    " i -> struct(_toks[i] AS t1, _toks[i + 1] AS t2))"
                )
            ).alias("_p"),
        )
        .select("_id", "_p.t1", "_p.t2")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    c_bi = pairs.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("c12"))
    c_left = c_bi.groupBy("t1").agg(F.sum("c12").alias("c1"))
    scored = (
        pairs.join(F.broadcast(c_bi), ["t1", "t2"])
        .join(F.broadcast(c_left), "t1")
        .withColumn(
            "_pu", F.expr("CAST((2000000 * c12 + c1) DIV (2 * c1) AS BIGINT)")
        )
    )
    return (
        scored.groupBy(F.col("_id").alias(id_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("_pu").cast("bigint").alias("sum_condprob_u"),
        )
        .withColumn(
            "avg_condprob_u",
            F.expr("CAST((2 * sum_condprob_u + n_bigrams) DIV (2 * n_bigrams) AS BIGINT)"),
        )
    )


def dsir_importance(
    df: DataFrame,
    is_target: Column,
    num_features: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bytes: int = 32,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): per-document
    log-likelihood ratio between a TARGET (seed-domain) hashed-unigram
    LM and the RAW-corpus LM, the score importance resampling draws
    against.  ``is_target`` is a boolean column over ``df`` marking the
    seed slice (in production: a curated positive set).

    Exactness discipline: per-bucket counts are exact integers; the only
    transcendental is ONE ln per bucket over a single double division of
    exact-int products — rounded half-up to 1e-6 micro-units AT THE
    BUCKET (≤ ``num_features`` roundings, margins auditable), after
    which the per-doc score is an exact int64 SUM of bucket units, so
    the document surface replays bit-identically on any engine and any
    partitioning (no float accumulation anywhere).

    Returns (doc_id, n_tokens, sum_logratio_u); docs with no valid
    tokens are absent.  Scale: one explode feeds bucket counts AND doc
    scores (persist the hashed frame); the smoothed log-ratio dim is
    ≤ num_features rows and broadcasts; the corpus text never shuffles —
    the shuffles carry (bucket) and (doc_id) keyed integer rows only.
    """
    from pyspark.storagelevel import StorageLevel

    from ..functions.hashing import with_hashingtf_index

    toks = df.select(
        F.col(id_col).alias("_id"),
        is_target.alias("_t"),
        F.explode(TF.tokens(text_col)).alias("term"),
    ).filter((F.col("term") != "") & (F.octet_length("term") <= max_bytes))
    hashed = with_hashingtf_index(
        toks, "term", "b", num_features, max_bytes
    ).select("_id", "_t", "b").persist(StorageLevel.MEMORY_AND_DISK)

    cnt = hashed.groupBy("b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_r"),
        F.sum(F.when(F.col("_t"), 1).otherwise(0)).cast("bigint").alias("c_t"),
    )
    tot = cnt.agg(
        F.sum("c_r").cast("bigint").alias("n_r"),
        F.sum("c_t").cast("bigint").alias("n_t"),
    )
    smooth = F.lit(int(num_features))
    arg = (
        (F.col("c_t") + 1).cast("double")
        * (F.col("n_r") + smooth).cast("double")
    ) / (
        (F.col("c_r") + 1).cast("double")
        * (F.col("n_t") + smooth).cast("double")
    )
    dim = cnt.crossJoin(F.broadcast(tot)).select(
        "b",
        F.floor(F.log(arg) * F.lit(1_000_000.0) + F.lit(0.5))
        .cast("bigint")
        .alias("lr_u"),
    )
    return (
        hashed.join(F.broadcast(dim), "b")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("lr_u").cast("bigint").alias("sum_logratio_u"),
        )
        .select(F.col("_id").alias(id_col), "n_tokens", "sum_logratio_u")
    )


def dsir_gumbel_topk(
    scores: DataFrame,
    k: int = 100,
    id_col: str = "doc_id",
    score_col: str = "sum_logratio_u",
) -> DataFrame:
    """The DSIR APPLY step: exactly-k sampling ∝ exp(score) via the
    Gumbel-max trick — key = score − ln(−ln u) over a deterministic
    md5 uniform of the id, top-k keys win.  ``score_col`` is an exact
    1e-6 micro-unit int64 (``dsir_importance``'s surface).

    Parity discipline (the A-ES lesson, docs_weighted_topk_sample): u is
    a 52-bit-exact uniform, the nested ln rounds at 6 decimals before
    entering the key, the score side divides by an exact power of ten —
    both engines rank identical doubles, ties break on id, the key is
    never emitted.  Scale: map-side key + TakeOrderedAndProject (local
    top-k per partition, never a global sort); the rank window sees only
    k rows.
    """
    from pyspark.sql import Window

    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10
    ).cast("bigint")
    u = (h + F.lit(1)) / F.lit(float(16**13))
    key = (
        F.col(score_col).cast("double") / F.lit(1_000_000.0)
        - F.round(F.log(-F.log(u)), 6)
    )
    w = Window.orderBy(F.desc("_key"), F.col(id_col))
    return (
        scores.withColumn("_key", key)
        .orderBy(F.desc("_key"), id_col)
        .limit(int(k))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .drop("_key")
    )


def dsir_score_batch(
    corpus: DataFrame,
    batch: DataFrame,
    is_target: Column,
    num_features: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bytes: int = 32,
) -> DataFrame:
    """The DSIR SERVING path: score an INGEST batch against the
    corpus-fitted hashed-unigram log-ratio dim — the corpus is scanned
    only to fit the ≤ ``num_features``-row dim (offline, amortized across
    batches); the batch never touches the corpus rows.  Tokens hashing to
    a bucket unseen in the corpus take the pure-smoothing default
    ln((n_r+B)/(n_t+B)) — the same add-one arithmetic the dim rows carry,
    so an out-of-vocabulary batch degrades gracefully instead of dropping
    tokens.

    Same exactness discipline as :func:`dsir_importance` (one ln per dim
    row + one for the default, micro-unit rounded at the dim; per-doc
    scores are exact int64 sums).  Returns (doc_id, n_tokens,
    sum_logratio_u) for the batch."""
    from ..functions.hashing import with_hashingtf_index

    smooth = F.lit(int(num_features))

    from pyspark.storagelevel import StorageLevel

    ctoks = corpus.select(
        is_target.alias("_t"),
        F.explode(TF.tokens(text_col)).alias("term"),
    ).filter((F.col("term") != "") & (F.octet_length("term") <= max_bytes))
    chashed = with_hashingtf_index(
        ctoks, "term", "b", num_features, max_bytes
    ).select("_t", "b")
    # materialize the corpus hash leg through its own LINEAR plan before
    # deriving the dim: optimizing corpus-side AND batch-side 90-step
    # murmur3 alias chains in one tree blows the optimizer up
    # (StackOverflow / driver OOM, measured r10); after this count the
    # dim derives from an InMemoryRelation leaf
    chashed = chashed.persist(StorageLevel.MEMORY_AND_DISK)
    chashed.count()
    cnt = chashed.groupBy("b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_r"),
        F.sum(F.when(F.col("_t"), 1).otherwise(0)).cast("bigint").alias("c_t"),
    )
    tot = cnt.agg(
        F.sum("c_r").cast("bigint").alias("n_r"),
        F.sum("c_t").cast("bigint").alias("n_t"),
    )
    lr = lambda num, den: F.floor(  # noqa: E731
        F.log(num / den) * F.lit(1_000_000.0) + F.lit(0.5)
    ).cast("bigint")
    dim = cnt.crossJoin(F.broadcast(tot)).select(
        "b",
        lr(
            (F.col("c_t") + 1).cast("double")
            * (F.col("n_r") + smooth).cast("double"),
            (F.col("c_r") + 1).cast("double")
            * (F.col("n_t") + smooth).cast("double"),
        ).alias("lr_u"),
    )
    default = tot.select(
        lr(
            (F.col("n_r") + smooth).cast("double"),
            (F.col("n_t") + smooth).cast("double"),
        ).alias("default_u")
    )
    # materialize the (tiny) fitted artifacts — the offline product that
    # serves every batch — then release the corpus leg: the batch plan
    # sees only two in-memory leaves on its broadcast side
    dim = dim.persist(StorageLevel.MEMORY_AND_DISK)
    dim.count()
    default = default.persist(StorageLevel.MEMORY_AND_DISK)
    default.count()
    chashed.unpersist()

    btoks = batch.select(
        F.col(id_col).alias("_id"),
        F.explode(TF.tokens(text_col)).alias("term"),
    ).filter((F.col("term") != "") & (F.octet_length("term") <= max_bytes))
    # the join/coalesce stack below must not see the 90-step murmur3
    # alias chain (optimizer rules inline lateral aliases through
    # non-aggregate operators — exponential; the fit side is safe because
    # its chain feeds an Aggregate directly).  localCheckpoint truncates
    # the lineage; the frame is batch-sized (delta by contract — the
    # pagerank iteration precedent).
    bhashed = (
        with_hashingtf_index(btoks, "term", "b", num_features, max_bytes)
        .select("_id", "b")
        .localCheckpoint(eager=True)
    )
    return (
        bhashed.join(F.broadcast(dim), "b", "left")
        .crossJoin(F.broadcast(default))
        .select(
            "_id", F.coalesce(F.col("lr_u"), F.col("default_u")).alias("lr_u")
        )
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("lr_u").cast("bigint").alias("sum_logratio_u"),
        )
        .select(F.col("_id").alias(id_col), "n_tokens", "sum_logratio_u")
    )
