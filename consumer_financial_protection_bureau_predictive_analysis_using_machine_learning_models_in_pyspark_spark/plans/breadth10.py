"""Round-10 breadth entries.

Containment output governor (VERDICT r9 "What's wrong" #3): the
all-pairs containment anchor emits every qualifying (sub, sup) pair, so
its OUTPUT grows quadratically in clone multiplicity (measured 11.9×
wall for 10× data at sf1 vs the 1.35× panel median).  The canonical
twin keeps the identical candidate generation (df-capped inverted
index) but reduces per contained doc to ONE best covering superset —
output linear in docs — via a map-side-combinable max-struct aggregate,
the exact pick ``operators.dedup.incremental_containment`` already
makes for the ingest case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textfns import tokens as TF_tokens
from ..ml import quality as Q
from .breadth8 import _ct_scored_pairs
from .catalog import CATALOG, _t, register
from .pipeline_queries import quality_rule_set

# The anchor's full pairs SQL (registered before this module imports) is
# wrapped as a subquery so the two oracles can never drift: the canonical
# oracle IS "anchor pairs → best pick per id_sub".
_CT_PAIRS_ORACLE = CATALOG["dedup_containment"].oracle


@register(
    "dedup_containment_canonical",
    f"""
WITH pairs AS ({_CT_PAIRS_ORACLE})
SELECT id_sub, id_sup, n_sub_shingles, n_shared, containment_u
FROM pairs
QUALIFY row_number() OVER (
  PARTITION BY id_sub ORDER BY containment_u DESC, id_sup ASC) = 1
ORDER BY id_sub
""",
    "dedup", "containment", "canonical",
    twin_of="dedup_containment",
    twin_pin="tests/test_round10.py::test_containment_canonical_twin",
)
def dedup_containment_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production form of asymmetric containment dedup: one row per
    CONTAINED doc — its single best covering superset (max containment,
    ties to the smallest sup id; the pick ``incremental_containment``
    makes at ingest) — instead of the anchor's full qualifying pair
    list.

    Scale rationale (VERDICT r9 #3): with clone multiplicity m the
    anchor emits Θ(m²) pairs per duplicate cluster — at 100 TB with
    heavy duplication the pair LIST is the bottleneck even under
    perfect candidate generation.  Here the pair stream collapses
    through ``groupBy(id_sub).agg(max(struct(...)))``, which plans as
    partial_max SortAggregate (struct-max has no unsafe-row hash
    buffer): each partition sorts only ITS OWN candidate slice
    (spill-safe local sort) and combines to ≤ one row per (partition,
    id_sub) BEFORE the exchange, so no executor ever materializes a
    cluster's full pair list, the shuffle carries ≤ one row per doc
    per map task, and the anchor's global pair-list sort disappears —
    measured FASTER than the anchor at sf0.1 (3.47 s vs 3.78 s) while
    emitting 1/pair-multiplicity of the rows.
    The anchor stays registered as the eval/oracle surface; the twin
    pin asserts canonical ⊆ pairs, exactly one row per id_sub, and the
    max-(u, −sup) pick."""
    scored = _ct_scored_pairs(spark, sf_dir)
    best = scored.groupBy("id_sub").agg(
        F.max(
            F.struct(
                F.col("containment_u").alias("u"),
                (-F.col("id_sup")).alias("negsup"),
                F.col("n").alias("n"),
                F.col("n_inter").alias("n_inter"),
            )
        ).alias("_b")
    )
    return best.select(
        "id_sub",
        (-F.col("_b.negsup")).cast("bigint").alias("id_sup"),
        F.col("_b.n").cast("bigint").alias("n_sub_shingles"),
        F.col("_b.n_inter").cast("bigint").alias("n_shared"),
        F.col("_b.u").alias("containment_u"),
    ).orderBy("id_sub")


# ---------------------------------------------------------------------------
# Model-based quality filter (VERDICT r9 "What's missing" #1): train a
# lightweight classifier on the heuristic chain's weak labels, score the
# WHOLE corpus, publish the per-doc scores and the model-vs-heuristic
# confusion.  Rows-only (MLlib L-BFGS is not SQL-expressible); value pins
# with a perturbation tooth live in tests/test_round10.py.
# ---------------------------------------------------------------------------


def _quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    base = Q.weak_label_frame(docs, quality_rule_set()).cache()
    model = Q.fit_quality_model(base)
    out = Q.score_corpus(base, model)
    base.unpersist()
    return out


@register("docs_quality_classifier", None, "ml", "quality", "curation")
def docs_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText/DSIR-style model-based quality filter: weak labels from
    the oracled heuristic chain (``quality_rule_set`` — the exact
    ``docs_filter_chain`` rules), HashingTF(1024)→LogisticRegression fit
    on a bounded deterministic md5 top-400 sample, the FULL corpus scored
    by the model.  Emits (doc_id, heuristic_keep, model_score_u,
    model_keep, agree) — P(keep) in half-up 1e-6 micro-units.

    Reference anchor: the featurize→LR→evaluate shape of
    timely_LR.py:71-106, applied to corpus curation.  100 TB shape: weak
    label + token array come out of ONE projection on the scan (no
    verdict self-join); the fit sees a fixed-size frame at any corpus
    scale (TakeOrdered draw); scoring is a narrow, shuffle-free
    ``transform`` pass."""
    return _quality_scores(spark, sf_dir).orderBy("doc_id")


@register("docs_quality_classifier_agreement", None, "ml", "quality", "curation")
def docs_quality_classifier_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Model-vs-heuristic agreement: the 2×2 confusion (n_docs, mean
    model score per cell) a curation run publishes before swapping the
    heuristic gate for the model gate.  Bounded (≤4 rows); one
    partial-agg shuffle over the scored corpus."""
    return Q.agreement_summary(_quality_scores(spark, sf_dir))


# ---------------------------------------------------------------------------
# Audio fingerprint near-dup (VERDICT r9 "What's missing" #2): a second
# modality through the BINARY-column plumbing.  The energy-delta signature
# is exact integer arithmetic, so the WHOLE pipeline — decode, framing,
# fingerprint fold, hamming pairing — is value-oracled (the engine runs
# banded candidate generation; the oracle brute-forces all pairs).
# ---------------------------------------------------------------------------

_AF_FRAME = 8
_AF_HOP = 4
_AF_NEED = 63 * _AF_HOP + _AF_FRAME  # 260 bytes: no wrap => tail-proof

_AF_SQL = f"""
WITH clones AS (
  SELECT doc_id + 999999 AS doc_id, text || ' xtail' AS text
  FROM documents WHERE doc_id % 30 = 10 AND length(text) >= {_AF_NEED}
),
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id, text FROM clones
),
aud AS (
  SELECT doc_id AS media_id, text, length(text) AS n
  FROM corpus WHERE doc_id % 3 = 1
),
en AS (
  SELECT media_id, f.k AS k,
         SUM(CAST(ascii(substr(text, CAST((f.k*{_AF_HOP} + s.i) % n AS INT) + 1, 1)) AS HUGEINT)
             * ascii(substr(text, CAST((f.k*{_AF_HOP} + s.i) % n AS INT) + 1, 1))) AS e
  FROM aud, range(64) f(k), range({_AF_FRAME}) s(i)
  GROUP BY 1, 2
),
bits AS (
  SELECT media_id, k,
         CASE WHEN e > lag(e) OVER (PARTITION BY media_id ORDER BY k)
              THEN 1 ELSE 0 END AS bit
  FROM en
),
fp AS (
  SELECT media_id,
         CAST(SUM(CAST(bit AS BIGINT) * (CAST(1 AS BIGINT) << CAST(63 - k AS INT)))
              AS BIGINT) AS fingerprint
  FROM bits WHERE k >= 1
  GROUP BY 1
)
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.fingerprint, b.fingerprint)) AS INT) AS hamming
FROM fp a JOIN fp b ON a.media_id < b.media_id
WHERE bit_count(xor(a.fingerprint, b.fingerprint)) <= 3
ORDER BY id_a, id_b
""".strip()


def _audio_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clone-augmented audio corpus: every doc with doc_id ≡ 10 (mod 30)
    — i.e. audio modality, every 10th — and ≥ 260 bytes gets a clone with
    an APPENDED tail (id +999,999, ≡ 1 mod 3 so the clone stays audio).
    The fingerprint reads bytes [0, 260) when no wrap occurs, so each
    clone provably collides with its source at hamming 0; shorter docs
    wrap their (changed) stream, which is why the fixture excludes them —
    the phash fixture's discipline (plans/media_queries.py:201)."""
    from ..operators import multimodal as MM

    docs = _t(spark, sf_dir, "documents")
    clones = docs.filter(
        (F.col("doc_id") % 30 == 10) & (F.length("text") >= _AF_NEED)
    ).select(
        (F.col("doc_id") + 999_999).alias("doc_id"),
        F.concat("text", F.lit(" xtail")).alias("text"),
        "lang",
        "source",
        (F.col("n_chars") + 6).alias("n_chars"),
    )
    aug = docs.select("doc_id", "text", "lang", "source", "n_chars").unionByName(
        clones
    )
    return MM.media_table(aug).filter(F.col("modality") == "audio")


@register(
    "media_audio_fingerprint",
    _AF_SQL,
    "multimodal", "audio", "dedup", "fingerprint", "hamming",
)
def media_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup pairs via energy-delta fingerprints: decode the
    binary sample stream (Arrow mapInPandas, deterministic byte-stream
    stand-in for the codec — operators.multimodal.audio_fingerprint),
    fold 63 frame-energy delta bits into one BIGINT per clip, then pair
    clips within hamming ≤ 3 via pigeonhole banding
    (operators.dedup.hamming_banded_pairs, 4 bands — the image path's
    banding reused verbatim, which is the point: the BINARY plumbing
    generalizes across codec families).  The oracle brute-forces the
    same pairs from the byte stream in SQL; injected appended-tail
    clones must collide at hamming 0 (recall pin, tests/test_round10.py).
    Returns (id_a, id_b, hamming)."""
    from ..operators import dedup as DD
    from ..operators import multimodal as MM

    fps = MM.audio_fingerprint(_audio_media(spark, sf_dir))
    return DD.hamming_banded_pairs(
        fps, fp_col="fingerprint", id_col="media_id",
        bits=63, n_bands=4, max_hamming=3,
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# ANN index maintenance under deletes (VERDICT r9 "What's missing" #3):
# the ivf_build/_prebuilt + incremental-ingest twins cover adds; this
# closes the lifecycle with tombstone → compact-touched-cells → recall
# re-measurement against exact post-delete ground truth.
# ---------------------------------------------------------------------------


@register(
    "ann_ivf_delete_compact", None,
    "similarity", "ann", "ivf", "delete", "compaction", "eval",
)
def ann_ivf_delete_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-delete retrieval quality of a compacted IVF index: tombstone
    a keyed delete set (vec_id ≡ 3 mod 7, ~14% of the corpus) against the
    shared persisted index (text_queries.ivf_index_for — the cache the
    prebuilt serving twin reads), compact only the touched cells
    (operators.similarity.ivf_delete_compact), then re-measure per-probe
    recall@5 of the compacted index against the EXACT post-delete ground
    truth (ann_recall_eval's harness, composed).  Rows-only (KMeans
    codebook); the recall floor, compacted-postings identity
    (original minus deletes, input index unmutated) and index-cache reuse
    are pinned in tests/test_round10.py.  Returns (probe_id, n_truth,
    n_hit, recall)."""
    from ..operators import similarity as SIM
    from .text_queries import ivf_index_for

    emb = _t(spark, sf_dir, "embeddings")
    idx = ivf_index_for(spark, sf_dir)
    deletes = emb.filter(F.col("vec_id") % 7 == 3).select("vec_id")
    compacted = SIM.ivf_delete_compact(idx, deletes)
    probes = emb.filter(F.col("vec_id") < 10)
    pred = SIM.ivf_query(compacted, probes, k=5, n_probe_cells=3)
    remaining = emb.filter(F.col("vec_id") % 7 != 3)
    truth = SIM.cosine_topk(remaining, probes, k=5)
    return SIM.recall_at_k(pred, truth, k=5).orderBy("probe_id")


# ---------------------------------------------------------------------------
# Right-to-be-forgotten through the dedup layer (r10): deleting docs from a
# deduplicated corpus must PROMOTE a new canonical in every cluster whose
# kept representative was deleted — otherwise the training corpus silently
# loses whole clusters that still have legal survivors.  Composes the
# oracled component/quality machinery of dedup_canonical_best.
# ---------------------------------------------------------------------------

from .breadth6 import _COMPONENT_XTAIL_CTES  # noqa: E402
from .text_queries import _D_TOKS, _QU_EXPR_SQL, _QU_MOMENTS_SQL  # noqa: E402

# originals of ≡10 (mod 20) clusters are deleted (clone survives →
# promotion), whole ≡0 (mod 20) clusters are deleted (clone ids keep the
# residue: 1,000,000 ≡ 0 mod 20 → NULL promotion arm exercised)
_DEL_SQL = "(doc_id % 20 = 0) OR (doc_id % 20 = 10 AND doc_id < 1000000)"


@register(
    "dedup_canonical_delete_promote",
    f"""
{_COMPONENT_XTAIL_CTES},
qual AS (
  SELECT doc_id, {_QU_EXPR_SQL} AS quality_u
  FROM (
    SELECT doc_id, {_QU_MOMENTS_SQL}
    FROM (SELECT doc_id, text, {_D_TOKS} AS toks FROM aug)
  )
),
m AS (
  SELECT c.component, c.doc_id, q.quality_u, {_DEL_SQL} AS deleted
  FROM comp c JOIN qual q USING (doc_id)
),
old AS (
  SELECT component, doc_id AS old_canonical, deleted FROM (
    SELECT component, doc_id, deleted,
           ROW_NUMBER() OVER (PARTITION BY component
                              ORDER BY quality_u DESC, doc_id) AS rn
    FROM m) r WHERE rn = 1
),
newc AS (
  SELECT component, doc_id AS new_canonical FROM (
    SELECT component, doc_id,
           ROW_NUMBER() OVER (PARTITION BY component
                              ORDER BY quality_u DESC, doc_id) AS rn
    FROM m WHERE NOT deleted) r WHERE rn = 1
),
cnt AS (
  SELECT component, CAST(COUNT(*) AS BIGINT) AS n_before,
         CAST(SUM(CASE WHEN deleted THEN 0 ELSE 1 END) AS BIGINT) AS n_after
  FROM m GROUP BY component
)
SELECT o.component, o.old_canonical, n.new_canonical, c.n_before, c.n_after
FROM old o
LEFT JOIN newc n USING (component)
JOIN cnt c USING (component)
WHERE o.deleted
ORDER BY o.component
""",
    "dedup", "components", "canonical", "delete", "gdpr",
)
def dedup_canonical_delete_promote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical promotion under deletion: over the ' xtail' near-dup
    corpus (dedup_canonical_best's fixture — clusters whose members
    genuinely differ in quality), apply a keyed delete set and, for every
    cluster whose CURRENT canonical (max quality_u, tie → min id) is
    deleted, emit the promoted survivor — the highest-quality remaining
    member — or NULL when the whole cluster is deleted.  Returns
    (component, old_canonical, new_canonical, n_before, n_after).

    Scale shape: promotion is two ranking windows over the SAME
    component-keyed exchange (cluster-sized partitions; the second sort
    reuses the first's partitioning), counts are one partial-agg pass on
    that frame, and the corpus text feeds only the shared minhash
    candidate stage.  In production the delete predicate is a broadcast
    keyed table; here it is the deterministic residue rule so the whole
    composition — minhash pairs → recursive component closure → exact
    integer quality → promotion — stays DuckDB-oracle-checkable."""
    from pyspark.sql import Window

    from ..operators import dedup as DD
    from ..operators import text as TX

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    aug = d.union(
        d.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat("text", F.lit(" xtail")).alias("text"),
        )
    )
    pairs = DD.minhash_dedup_pairs(spark, aug, threshold=0.5)
    comps = DD.connected_components(pairs)
    qual = TX.quality_score_exact(aug).select("doc_id", "quality_u")
    m = comps.join(qual, "doc_id").withColumn(
        "deleted",
        (F.col("doc_id") % 20 == 0)
        | ((F.col("doc_id") % 20 == 10) & (F.col("doc_id") < 1_000_000)),
    )
    wq = Window.partitionBy("component").orderBy(
        F.col("quality_u").desc(), "doc_id"
    )
    old = (
        m.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") == 1)
        .select("component", F.col("doc_id").alias("old_canonical"), "deleted")
    )
    newc = (
        m.filter(~F.col("deleted"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") == 1)
        .select("component", F.col("doc_id").alias("new_canonical"))
    )
    cnt = m.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_before"),
        F.sum(F.when(F.col("deleted"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_after"),
    )
    return (
        old.filter(F.col("deleted"))
        .drop("deleted")
        .join(newc, "component", "left")
        .join(cnt, "component")
        .select("component", "old_canonical", "new_canonical",
                "n_before", "n_after")
        .orderBy("component")
    )


# ---------------------------------------------------------------------------
# Delete impact through the loader layer (r10): deleting documents
# invalidates the packed training sequences that contain them.  The audit
# a pipeline runs BEFORE honoring a delete request: which sequences must
# be rebuilt, how much of each is salvageable.
# ---------------------------------------------------------------------------

from .breadth7 import _SEQ_LEN  # noqa: E402

_DI_DEL_SQL = "doc_id % 53 = 7"


@register(
    "docs_delete_impact",
    f"""
WITH t AS (
  SELECT doc_id, CAST(len({_D_TOKS}) AS BIGINT) AS nt FROM documents
),
c AS (
  SELECT doc_id, nt,
         CAST(SUM(nt) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum
  FROM t WHERE nt >= 1
),
sp AS (
  SELECT doc_id, cum - nt AS gstart, cum,
         CAST(unnest(range((cum - nt) // {_SEQ_LEN},
                           (cum - 1) // {_SEQ_LEN} + 1)) AS BIGINT) AS seq_id
  FROM c
),
spans AS (
  SELECT seq_id, doc_id,
         LEAST(cum - seq_id * {_SEQ_LEN}, {_SEQ_LEN})
           - GREATEST(gstart - seq_id * {_SEQ_LEN}, 0) AS span_tokens,
         ({_DI_DEL_SQL}) AS deleted
  FROM sp
)
SELECT seq_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(CASE WHEN deleted THEN 1 ELSE 0 END) AS BIGINT)
         AS n_deleted_segments,
       CAST(SUM(CASE WHEN deleted THEN span_tokens ELSE 0 END) AS BIGINT)
         AS deleted_tokens,
       CAST(SUM(CASE WHEN deleted THEN 0 ELSE span_tokens END) AS BIGINT)
         AS kept_tokens
FROM spans
GROUP BY seq_id
HAVING SUM(CASE WHEN deleted THEN 1 ELSE 0 END) > 0
ORDER BY seq_id
""",
    "pipeline", "packing", "delete", "audit", "training-loader",
)
def docs_delete_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packed-sequence invalidation audit for a document delete set
    (doc_id ≡ 7 mod 53 — in production a broadcast keyed table): for
    every training sequence (docs_pack_sequences' seq_len=128 layout)
    containing a deleted document, emit (seq_id, n_segments,
    n_deleted_segments, deleted_tokens, kept_tokens) — the rebuild
    manifest and its salvage accounting.  Sequences untouched by the
    delete set are absent: rebuild cost scales with the damage, not the
    corpus (the orders_replica_reconcile discipline applied to the
    loader layer).

    Scale shape: consumes operators.pipeline.sequence_spans — the SAME
    boundary map pack_sequences aggregates (one definition, two
    consumers; two-phase bucket prefix sum, no global-sort window) —
    then ONE conditional agg keyed by seq_id with the HAVING filter
    pruning clean sequences before the presentation sort."""
    from ..operators import pipeline as PL

    docs = _t(spark, sf_dir, "documents")
    spans = PL.sequence_spans(docs, seq_len=_SEQ_LEN)
    flagged = spans.select(
        "seq_id",
        (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        (F.col("_id") % 53 == 7).alias("deleted"),
    )
    return (
        flagged.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
            F.sum(F.when(F.col("deleted"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_deleted_segments"),
            F.sum(F.when(F.col("deleted"), F.col("span_tokens")).otherwise(0))
            .cast("bigint")
            .alias("deleted_tokens"),
            F.sum(F.when(F.col("deleted"), 0).otherwise(F.col("span_tokens")))
            .cast("bigint")
            .alias("kept_tokens"),
        )
        .filter(F.col("n_deleted_segments") > 0)
        .orderBy("seq_id")
    )


# ---------------------------------------------------------------------------
# DSIR importance weights (r10): the third member of the curation-scoring
# family — heuristic rules (docs_filter_chain), discriminative model
# (docs_quality_classifier), and now generative importance resampling
# (hashed-unigram LM log-likelihood ratio vs a seed domain).
# ---------------------------------------------------------------------------

from ..functions import hashing as HH  # noqa: E402

_DSIR_N = 1024
_DSIR_MAXB = 32
_DSIR_TARGET_SQL = "source IN ('src0', 'src1')"

_DSIR_SQL = f"""
WITH toks AS (
  SELECT doc_id, ({_DSIR_TARGET_SQL}) AS t, unnest({_D_TOKS}) AS term
  FROM documents
),
f AS (
  SELECT doc_id, t, term FROM toks
  WHERE term <> '' AND octet_length(encode(term)) <= {_DSIR_MAXB}
),
h AS (
  SELECT doc_id, t, b
  FROM {HH.hashingtf_index_duckdb_subquery(
      "SELECT doc_id, t, term FROM f", ["doc_id", "t", "term"], "term", "b",
      _DSIR_N, _DSIR_MAXB)} q
),
cnt AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS c_r,
         CAST(SUM(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS c_t
  FROM h GROUP BY b
),
tot AS (
  SELECT CAST(SUM(c_r) AS BIGINT) AS n_r, CAST(SUM(c_t) AS BIGINT) AS n_t
  FROM cnt
),
dim AS (
  SELECT b,
         CAST(FLOOR(ln((CAST(c_t + 1 AS DOUBLE) * CAST(n_r + {_DSIR_N} AS DOUBLE))
                       / (CAST(c_r + 1 AS DOUBLE) * CAST(n_t + {_DSIR_N} AS DOUBLE)))
                    * 1000000 + 0.5) AS BIGINT) AS lr_u
  FROM cnt CROSS JOIN tot
)
SELECT h.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(d.lr_u) AS BIGINT) AS sum_logratio_u
FROM h JOIN dim d USING (b)
GROUP BY h.doc_id
ORDER BY h.doc_id
"""


@register(
    "docs_dsir_importance",
    _DSIR_SQL,
    "text", "curation", "dsir", "importance-sampling", "lm",
)
def docs_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights against a seed domain (sources src0/src1
    as the deterministic stand-in for a curated positive set): per doc,
    the hashed-unigram LM log-likelihood ratio Σ ln(p_target(b)/p_raw(b))
    in exact micro-unit int64 (operators.text.dsir_importance) — the
    score importance resampling draws against, and the generative
    counterpart to docs_quality_classifier's discriminative filter.

    Oracle-exact end-to-end despite the ln: the murmur3 bucket is the
    generated HashingTF-parity program (functions/hashing.py, nested
    subqueries on the DuckDB side), counts/totals are integers, each
    bucket rounds its ONE ln to micro-units, and the doc score is an
    integer sum — the docs_bigram_pmi single-ln discipline with the
    rounding pushed to the 1024-row dim so per-doc sums never touch
    floats.  Weights feed the existing samplers (docs_reweighted_sample
    machinery) unchanged."""
    from ..operators import text as TX

    docs = _t(spark, sf_dir, "documents")
    return TX.dsir_importance(
        docs,
        F.col("source").isin("src0", "src1"),
        num_features=_DSIR_N,
        max_bytes=_DSIR_MAXB,
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# DSIR apply step (r10): importance RESAMPLING via the Gumbel-max trick —
# top-k of (score + Gumbel noise) is an exactly-k sample ∝ exp(score),
# which is the DSIR paper's draw.  Deterministic md5 uniforms, the A-ES
# ln-at-6 parity discipline (docs_weighted_topk_sample), TakeOrdered top-k.
# ---------------------------------------------------------------------------

_DSIR_K = 100

_DSIR_SAMPLE_SQL = f"""
WITH sc AS ({_DSIR_SQL}),
u AS (
  SELECT doc_id, n_tokens, sum_logratio_u,
         (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
          + 1) / POWER(16, 13) AS unif
  FROM sc
),
k AS (
  SELECT doc_id, n_tokens, sum_logratio_u,
         CAST(sum_logratio_u AS DOUBLE) / 1000000.0
           - ROUND(ln(-ln(unif)), 6) AS key
  FROM u
)
SELECT doc_id, n_tokens, sum_logratio_u,
       CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS INT) AS rank
FROM k ORDER BY key DESC, doc_id LIMIT {_DSIR_K}
"""


@register(
    "docs_dsir_sample",
    _DSIR_SAMPLE_SQL,
    "sampling", "dsir", "gumbel", "importance-sampling", "deterministic",
)
def docs_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSIR APPLY step: draw an exactly-k corpus sample with
    probability ∝ exp(importance score) via the Gumbel-max trick —
    key = score − ln(−ln u) over a deterministic md5 uniform, top-k keys
    win.  Closes the optimize→apply loop the same way
    docs_reweighted_sample closes DoReMi's.

    Parity discipline (the A-ES lesson, docs_weighted_topk_sample): u is
    a 52-bit-exact md5 uniform; the ONLY libm surface is the nested
    ln(−ln u), rounded at 6 decimals before entering the key, and the
    score side is an exact int64 micro-unit sum divided by an exact
    power of ten — so both engines rank identical doubles and the key
    itself is never emitted.  Scale: the key is a map-side expression
    over the DSIR score frame; top-k plans as TakeOrderedAndProject
    (per-partition local top-k — never a global sort); the ranking
    window runs over k rows only.

    Fixture honesty note: the synthetic sources share one small
    vocabulary, so doc-level importance gaps (~0.4 nats) sit below the
    Gumbel noise scale (σ≈1.28) and enrichment of the seed domain in
    this sample is mild by construction; the sampler's bias is pinned on
    a constructed two-vocabulary corpus instead
    (tests/test_round10.py::test_dsir_gumbel_bias_on_separated_corpus),
    where the same operator pair concentrates the sample almost entirely
    on the target domain."""
    from ..operators import text as TX

    docs = _t(spark, sf_dir, "documents")
    sc = TX.dsir_importance(
        docs,
        F.col("source").isin("src0", "src1"),
        num_features=_DSIR_N,
        max_bytes=_DSIR_MAXB,
    )
    return TX.dsir_gumbel_topk(sc, k=_DSIR_K).select(
        "doc_id", "n_tokens", "sum_logratio_u", "rank"
    )


# ---------------------------------------------------------------------------
# Streaming model serving (r10): the quality classifier at ingest — train
# offline once, score every arriving micro-batch with the prebuilt model.
# The first stream_* entry that serves an MLlib model.
# ---------------------------------------------------------------------------

_QC_STREAM_DIRS: dict[str, str] = {}


@register(
    "stream_quality_classifier", None,
    "streaming", "ml", "quality", "model-serving", "foreachBatch",
    twin_of="docs_quality_classifier",
    twin_pin="tests/test_round10.py::test_stream_quality_classifier_twin",
)
def stream_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of docs_quality_classifier — the production split
    between training and serving: the HashingTF→LR quality model is fit
    ONCE, offline, on the full corpus's weak-label frame (the exact
    geometry of the batch entry, so the model is the same model), then
    the corpus arrives as TWO parquet micro-batches (doc_id parity,
    mtime-ordered) and each batch is scored by the PREBUILT model via
    streaming.jobs.run_streaming_model_scoring (idempotent _batch_id
    overwrite — replays rewrite themselves).  Rows-only (MLlib);
    streaming scores are pinned EQUAL to the batch entry's full-corpus
    scores, which is the serving-path contract: where the model runs
    (batch job or ingest stream) must not change a single score."""
    import atexit
    import os
    import shutil
    import tempfile

    from ..streaming import jobs as SJ

    docs = _t(spark, sf_dir, "documents")
    base = Q.weak_label_frame(docs, quality_rule_set()).cache()
    model = Q.fit_quality_model(base)
    base.unpersist()

    work = _QC_STREAM_DIRS.get(sf_dir)
    if work is None:
        work = tempfile.mkdtemp(prefix="stream_qc_")
        try:
            in_dir = f"{work}/in"
            raw = docs.select("doc_id", "text")
            raw.filter("pmod(doc_id, 2) == 0").coalesce(1).write.parquet(
                f"{in_dir}/b0"
            )
            raw.filter("pmod(doc_id, 2) == 1").coalesce(1).write.parquet(
                f"{in_dir}/b1"
            )
            flat = f"{work}/batches"
            os.makedirs(flat)
            for i, sub in enumerate(("b0", "b1")):
                for f in os.listdir(f"{in_dir}/{sub}"):
                    if f.endswith(".parquet"):
                        dst = f"{flat}/batch_{i}.parquet"
                        shutil.copyfile(f"{in_dir}/{sub}/{f}", dst)
                        os.utime(dst, (1_600_000_000 + i, 1_600_000_000 + i))
        except BaseException:
            shutil.rmtree(work, ignore_errors=True)
            raise
        if not _QC_STREAM_DIRS:
            atexit.register(
                lambda: [
                    shutil.rmtree(d, ignore_errors=True)
                    for d in _QC_STREAM_DIRS.values()
                ]
            )
        _QC_STREAM_DIRS[sf_dir] = work
    flat = f"{work}/batches"

    def score_fn(batch_df: DataFrame) -> DataFrame:
        return Q.score_corpus(
            Q.weak_label_frame(batch_df, quality_rule_set()), model
        )

    schema = spark.read.parquet(flat).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    SJ.run_streaming_model_scoring(
        stream, score_fn, f"{work}/scores", f"{work}/ckpt"
    )
    return (
        spark.read.parquet(f"{work}/scores")
        .select("doc_id", "heuristic_keep", "model_score_u",
                "model_keep", "agree", "_batch_id")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Quality-gate threshold sweep (r10): pick the model gate's operating point
# from a full confusion curve against the heuristic labels — the
# ml_timely_lr_threshold_sweep one-pass histogram pattern applied to the
# corpus curation model.
# ---------------------------------------------------------------------------

_QC_SWEEP_BINS = 20


@register(
    "docs_quality_classifier_sweep", None,
    "ml", "quality", "curation", "threshold-sweep", "eval",
)
def docs_quality_classifier_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold sweep for the model quality gate: for every threshold
    k·50,000 micro-units (k=1..19), the confusion of model_score_u ≥ t
    against the heuristic chain's labels, with precision/recall/F1 —
    the table a curation run reads to pick the gate's operating point
    (docs_quality_classifier ships the 0.5 point; deployments trade
    recall for precision here).

    One-pass shape (the ml_timely_lr_threshold_sweep discipline,
    plans/ml_queries.py:374): a map-side 20-cell histogram of
    (n, n_positive) by score cell, densified, then every threshold's
    counts fall out of a suffix-sum window over the 20-row aggregate —
    cell k's suffix sum IS {score_u ≥ k·50,000} exactly (floor
    semantics).  The window runs over 20 rows, never the corpus; pinned
    row-for-row equal to the naive 19-filter sweep in
    tests/test_round10.py.  Rows-only (scores are MLlib outputs)."""
    from pyspark.sql import Window

    nb = _QC_SWEEP_BINS
    scored = _quality_scores(spark, sf_dir).select(
        F.least(
            (F.col("model_score_u") / F.lit(1_000_000 // nb)).cast("int"),
            F.lit(nb - 1),
        ).alias("cell"),
        F.col("heuristic_keep").cast("int").alias("y"),
    )
    hist = scored.groupBy("cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
    )
    cells = spark.range(nb).select(F.col("id").cast("int").alias("cell"))
    hist = cells.join(hist, "cell", "left").fillna(0, subset=["n", "n_pos"])
    tot = hist.agg(
        F.sum("n").cast("bigint").alias("_nn"),
        F.sum("n_pos").cast("bigint").alias("_pp"),
    )
    wc = Window.orderBy(F.desc("cell")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "cell",
        F.sum("n").over(wc).alias("_pred_pos"),
        F.sum("n_pos").over(wc).alias("_tp"),
    )
    counts = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("cell") >= 1)
        .select(
            (F.col("cell") * F.lit(1_000_000 // nb))
            .cast("bigint")
            .alias("threshold_u"),
            F.col("_tp").cast("bigint").alias("tp"),
            (F.col("_pred_pos") - F.col("_tp")).cast("bigint").alias("fp"),
            (F.col("_pp") - F.col("_tp")).cast("bigint").alias("fn"),
            (F.col("_nn") - F.col("_pp") - (F.col("_pred_pos") - F.col("_tp")))
            .cast("bigint")
            .alias("tn"),
        )
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.col("tp") / (F.col("tp") + F.col("fp")),
    )
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.col("tp") / (F.col("tp") + F.col("fn")),
    ).otherwise(F.lit(0.0))
    return (
        counts.withColumn("_prec", prec)
        .withColumn("_rec", rec)
        .select(
            "threshold_u", "tp", "fp", "fn", "tn",
            F.round("_prec", 6).alias("precision"),
            F.round("_rec", 6).alias("recall"),
            F.round(
                F.when(
                    F.coalesce(F.col("_prec"), F.lit(0.0)) + F.col("_rec") > 0,
                    2 * F.col("_prec") * F.col("_rec")
                    / (F.col("_prec") + F.col("_rec")),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("f1"),
        )
        .orderBy("threshold_u")
    )


# ---------------------------------------------------------------------------
# Corpus snapshot diff (r10): dataset versioning for the documents table —
# the per-source changelog a training run records when a re-crawl replaces
# the previous corpus version (the orders_snapshot_diff discipline plus
# token accounting; fingerprints and token counts diff, text never joins).
# ---------------------------------------------------------------------------


@register(
    "docs_snapshot_diff",
    f"""
WITH v1 AS (
  SELECT doc_id, source, md5(text) AS fp,
         CAST(len({_D_TOKS}) AS BIGINT) AS nt
  FROM documents WHERE doc_id % 31 <> 5
),
v2 AS (
  SELECT doc_id, source, md5(text) AS fp,
         CAST(len({_D_TOKS}) AS BIGINT) AS nt
  FROM (
    SELECT doc_id, source,
           CASE WHEN doc_id % 23 = 7 THEN text || ' rev2' ELSE text END AS text
    FROM documents WHERE doc_id % 29 <> 3
  )
),
d AS (
  SELECT COALESCE(a.source, b.source) AS source,
         CASE WHEN a.doc_id IS NULL THEN 'added'
              WHEN b.doc_id IS NULL THEN 'removed'
              WHEN a.fp = b.fp THEN 'unchanged'
              ELSE 'changed' END AS change,
         COALESCE(b.nt, 0) - COALESCE(a.nt, 0) AS delta
  FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id
)
SELECT source,
       CAST(SUM(CASE WHEN change = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
       CAST(SUM(CASE WHEN change = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       CAST(SUM(CASE WHEN change = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       CAST(SUM(CASE WHEN change = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
       CAST(SUM(delta) AS BIGINT) AS token_delta
FROM d GROUP BY source ORDER BY source
""",
    "pipeline", "cdc", "snapshot-diff", "versioning", "full-outer",
)
def docs_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus version changelog: diff two deterministic corpus snapshots
    (v1 drops ≡5 mod 31 — those arrive only in v2 → added; v2 drops
    ≡3 mod 29 → removed; v2 appends ' rev2' to ≡7 mod 23 → changed) and
    publish per-SOURCE counts by change class plus the net token delta —
    the dataset-versioning record a training pipeline commits alongside
    a re-crawl before refreshing derived artifacts (dedup indexes, packs).

    Scale shape: each snapshot reduces to (doc_id, source, md5
    fingerprint, token count) in its scan projection — the full-outer
    diff joins 8-byte fingerprints and counts co-partitioned on doc_id,
    the TEXT never moves; the changelog is one source-keyed partial agg
    (bounded by |sources|).  Null-safe everywhere a side can be absent."""
    toks_n = F.size(TF_tokens("text")).cast("bigint")
    docs = _t(spark, sf_dir, "documents")
    v1 = docs.filter(F.col("doc_id") % 31 != 5).select(
        "doc_id", "source", F.md5("text").alias("fp"), toks_n.alias("nt")
    )
    v2 = (
        docs.filter(F.col("doc_id") % 29 != 3)
        .select(
            "doc_id",
            "source",
            F.when(F.col("doc_id") % 23 == 7, F.concat("text", F.lit(" rev2")))
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .select(
            "doc_id", "source", F.md5("text").alias("fp"), toks_n.alias("nt")
        )
    )
    a, b = v1.alias("a"), v2.alias("b")
    d = a.join(b, F.col("a.doc_id") == F.col("b.doc_id"), "full_outer").select(
        F.coalesce(F.col("a.source"), F.col("b.source")).alias("source"),
        F.when(F.col("a.doc_id").isNull(), F.lit("added"))
        .when(F.col("b.doc_id").isNull(), F.lit("removed"))
        .when(F.col("a.fp") == F.col("b.fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("change"),
        (
            F.coalesce(F.col("b.nt"), F.lit(0))
            - F.coalesce(F.col("a.nt"), F.lit(0))
        ).alias("delta"),
    )
    agg = [
        F.sum(F.when(F.col("change") == c, 1).otherwise(0))
        .cast("bigint")
        .alias(f"n_{c}")
        for c in ("added", "removed", "changed", "unchanged")
    ]
    return (
        d.groupBy("source")
        .agg(*agg, F.sum("delta").cast("bigint").alias("token_delta"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# DSIR serving path (r10): score an ingest batch against the PREBUILT
# corpus log-ratio dim — the incremental form of docs_dsir_importance
# (the corpus is scanned only to fit the dim; batches never touch it).
# ---------------------------------------------------------------------------

# the committed importance oracle, minus its final doc-score SELECT: the
# CTE prefix (toks/f/h/cnt/tot/dim) IS the fitted dim, reused verbatim so
# the serving oracle can never drift from the fit oracle
_DSIR_DIM_PREFIX = _DSIR_SQL.split("\nSELECT h.doc_id")[0]

_DSIR_BATCH_SQL = f"""{_DSIR_DIM_PREFIX},
dflt AS (
  SELECT CAST(FLOOR(ln(CAST(n_r + {_DSIR_N} AS DOUBLE)
                       / CAST(n_t + {_DSIR_N} AS DOUBLE))
                    * 1000000 + 0.5) AS BIGINT) AS default_u
  FROM tot
),
batch AS (
  SELECT doc_id + 5000000 AS doc_id, text
  FROM documents WHERE doc_id % 10 = 0
),
bt AS (SELECT doc_id, unnest({_D_TOKS}) AS term FROM batch),
bf AS (
  SELECT doc_id, term FROM bt
  WHERE term <> '' AND octet_length(encode(term)) <= {_DSIR_MAXB}
),
bh AS (
  SELECT doc_id, b
  FROM {HH.hashingtf_index_duckdb_subquery(
      "SELECT doc_id, term FROM bf", ["doc_id", "term"], "term", "b",
      _DSIR_N, _DSIR_MAXB)} q
)
SELECT bh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(COALESCE(d.lr_u, dflt.default_u)) AS BIGINT) AS sum_logratio_u
FROM bh LEFT JOIN dim d USING (b) CROSS JOIN dflt
GROUP BY bh.doc_id
ORDER BY bh.doc_id
"""


@register(
    "docs_dsir_score_batch",
    _DSIR_BATCH_SQL,
    "text", "curation", "dsir", "importance-sampling", "incremental",
    twin_of="docs_dsir_importance",
    twin_pin="tests/test_round10.py::test_dsir_batch_scores_equal_corpus_scores",
)
def docs_dsir_score_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR at ingest: a synthetic batch (re-keyed 10% corpus slice,
    +5,000,000 — verbatim text, so scores must equal the corpus entry's
    for the same docs, which is the twin pin) is scored against the
    PREBUILT corpus log-ratio dim (operators.text.dsir_score_batch).
    Out-of-vocabulary buckets take the pure-smoothing default instead of
    dropping tokens.

    Scale shape: the corpus appears ONLY in the offline dim fit
    (≤ 1024 rows + one default scalar, both broadcast); the batch side
    is explode → codegen'd murmur3 → broadcast left join → doc-keyed
    agg — per-batch cost is linear in the batch, zero corpus reshuffles
    (the incremental-dedup discipline applied to importance scoring).
    The serving oracle reuses the fit oracle's CTE prefix verbatim, so
    the two can never drift."""
    from ..operators import text as TX

    docs = _t(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"), "text"
    )
    return TX.dsir_score_batch(
        docs,
        batch,
        F.col("source").isin("src0", "src1"),
        num_features=_DSIR_N,
        max_bytes=_DSIR_MAXB,
    ).orderBy("doc_id")
