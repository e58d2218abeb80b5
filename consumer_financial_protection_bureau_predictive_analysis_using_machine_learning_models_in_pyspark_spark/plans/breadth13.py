"""Round-13 breadth entries (VERDICT r12 "Next round" items 1-2).

1. ``ann_semantic_collapsed`` (+ ``_fast`` serving twin) — the SemDeDup
   family's clone-collapse governor.  The r12 sf10 wall OOM-killed
   ``ann_semantic_canonical_fast`` on a 64 GB heap: per-cell all-pairs
   is memory-quadratic in clone multiplicity, and a 100-copy corpus
   puts 100-deep byte-identical embedding cliques in every cell.  The
   governor collapses byte-identical vectors to representatives BEFORE
   bucketing / cell assignment and pair verify, then expands verdicts
   to members as a pure projection — the identical pattern the
   containment / minhash / edit-distance families received in r11-r12
   (``dedup_containment_collapsed``, ``dedup_minhash_canonical``).

   Unlike the text families, the semantic collapse is EXACTLY
   verdict-preserving in all regimes: bucket and cell assignment are
   pure functions of the vector, and the pair score of two identical
   vectors is the self-dot, so the collapsed program equals the
   uncollapsed components run member-by-member (the expansion rule's
   one non-obvious arm — a clique whose self-dot is BELOW the
   threshold, i.e. non-unit "duplicate" vectors that are not near-dups
   of each other — is handled by a per-representative ``tight`` bit;
   equality is pinned in tests/test_round13.py on both the fixture and
   a constructed low-norm clone corpus).

2. ``dedup_containment_auto`` / ``dedup_minhash_auto`` /
   ``ann_semantic_auto`` — duplication-factor dispatch
   (operators/dispatch.py): one cheap linear aggregate measures the
   corpus's average clone depth and routes to the family's ``_fast``
   twin (clone-light: collapse is pure premium) or its ``_collapsed``
   governor (clone-heavy: the ungoverned pair stage is
   output-quadratic), returning the chosen arm's frame verbatim.

Entries run over an AUGMENTED embedding corpus (``sem_aug``: the
embeddings table ∪ re-keyed 20% / 4% slices → clone cliques of size 2
and 3 at every scale) so the clone-collapse and expansion arms are
driver-oracled at sf0.01, not just pinned on constructed fixtures —
the ``_AUG_CTE`` discipline the minhash family has used since r2.

Reference anchor: the reference has no similarity or dedup surface at
all (its nearest analogue is dropping duplicate complaint narratives
via DataFrame cleaning, logistic_regression_class_8.py-style
``filter``/``dropna`` chains); SemDeDup-at-scale governors and
regime-adaptive routing are engine-side machinery those operators
imply at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup as DD
from ..operators import similarity as SIM
from ..operators.dispatch import dispatch_by_duplication
from ..operators.similarity import dot_decimal
from .breadth8 import _CT_MIN_U, _ct_corpus, _ct_shingles
from .breadth12 import _MH_CANONICAL_SQL, containment_collapsed_frame
from .catalog import CATALOG, _t, register
from .text_queries import _DIM, _aug

_SEM_T = 0.35  # the SemDeDup near-dup bar shared with ann_semantic_canonical

# ---------------------------------------------------------------------------
# Clone-injected embedding corpus: the synthetic embeddings are all
# distinct (verified at every committed sf), so the collapse entries run
# on embeddings ∪ re-keyed slices — every 5th vector twice, every 25th
# three times — guaranteeing real clone cliques (sizes 2 and 3, rep and
# non-rep members) for the driver oracle to exercise at every scale.
# Offsets clear the vec_id domain up to 1M rows (sf10 wall: ~200k).
# ---------------------------------------------------------------------------

_SEM_AUG_CTE = """
SELECT vec_id, embedding FROM embeddings
UNION ALL
SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0
UNION ALL
SELECT vec_id + 2000000 AS vec_id, embedding FROM embeddings WHERE vec_id % 25 = 0
""".strip()


def sem_aug(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    c1 = e.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    c2 = e.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 2_000_000).alias("vec_id"), "embedding"
    )
    return e.unionByName(c1).unionByName(c2)


# ---------------------------------------------------------------------------
# Oracle: the canonical entry's bucketed→pairs→und→reach→comp CTEs are
# string-spliced VERBATIM onto the collapsed (representative) corpus —
# the r12 splice pattern, so the hyperplane/decimal-dot/closure
# arithmetic cannot drift from the family's — and the member-expansion
# verdict is appended:
#
#   * rep in a component  → member kept iff it IS the component label
#     (labels are rep ids = clique minima, so the rep-level min equals
#     the member-level min);
#   * singleton, no pairs → kept;
#   * clone clique, no external pairs, self-dot ≥ T → clique internally
#     connected: only the minimum member survives;
#   * clone clique, no external pairs, self-dot < T → no edges at all:
#     every member survives (identical vectors that are NOT near-dups).
# ---------------------------------------------------------------------------

_SEM_CANON_SQL = CATALOG["ann_semantic_canonical"].oracle.strip()
_head, _ = _SEM_CANON_SQL.split("\n),\nkept AS (", 1)
assert _head.startswith("WITH RECURSIVE bucketed AS (")
assert _head.count("FROM embeddings") == 1

_REP_COMP_CTES = (
    _head.removeprefix("WITH RECURSIVE ").replace("FROM embeddings", "FROM reps")
    + "\n)"
)

_SEM_COLLAPSED_SQL = f"""
WITH RECURSIVE corpus AS (
{_SEM_AUG_CTE}
),
grp AS (
  SELECT embedding, MIN(vec_id) AS gid, COUNT(*) AS cnt
  FROM corpus GROUP BY embedding
),
reps AS (SELECT gid AS vec_id, embedding FROM grp),
selfd AS (
  SELECT g.gid,
         SUM(CAST(CAST(g.embedding[i.i] AS DOUBLE) * CAST(g.embedding[i.i] AS DOUBLE)
                  AS DECIMAL(20,15))) >= {_SEM_T} AS tight
  FROM grp g
  CROSS JOIN (SELECT unnest(range(1, {_DIM + 1})) AS i) i
  GROUP BY g.gid
),
{_REP_COMP_CTES}
SELECT m.vec_id,
       CASE WHEN c.component IS NOT NULL THEN m.vec_id = c.component
            WHEN m.cnt = 1 THEN TRUE
            WHEN sd.tight THEN m.vec_id = m.gid
            ELSE TRUE END AS kept,
       CAST(CASE WHEN c.component IS NOT NULL THEN c.component
                 WHEN m.cnt = 1 THEN m.vec_id
                 WHEN sd.tight THEN m.gid
                 ELSE m.vec_id END AS BIGINT) AS canon_id
FROM (
  SELECT c0.vec_id, g.gid, g.cnt
  FROM corpus c0 JOIN grp g ON c0.embedding = g.embedding
) m
LEFT JOIN comp c ON c.doc_id = m.gid
JOIN selfd sd ON sd.gid = m.gid
ORDER BY vec_id
""".strip()


def semantic_collapsed_frame(
    corpus: DataFrame,
    dim: int = _DIM,
    threshold: float = _SEM_T,
    pairs_of_reps=None,
) -> DataFrame:
    """Collapse byte-identical embeddings → rep-level near-dup pairs →
    components → member verdicts, over an arbitrary (vec_id, embedding)
    corpus.  ``pairs_of_reps`` swaps the rep-pair generator (exact
    hyperplane path by default; the ``_fast`` twin passes the per-cell
    BLAS path) — everything around it is shared.

    Scale posture: ONE window over the embedding key does collapse,
    membership, and rep selection in a single exchange (no groupBy +
    re-join of the corpus); every downstream stage — pairs, components,
    the tight bit — is representative-sized, so clone multiplicity m
    buys an m× smaller pair stage instead of an m²-pair output, and the
    member expansion is two rep-sized (broadcastable) hash joins back
    onto the corpus.  This is what un-OOMs SemDeDup on clone-heavy
    corpora: the r12 wall's 100-deep cliques never reach a cell."""
    from pyspark.storagelevel import StorageLevel

    w = Window.partitionBy("embedding")
    # persisted: the windowed collapse feeds THREE consumers (rep pairs —
    # evaluated eagerly inside connected_components — the tight bit, and
    # the final member join); without the cache each re-derives the
    # vector-keyed window from the scan (CacheManager dedupes by plan, so
    # repeated catalog calls share one entry)
    cn = corpus.select(
        "vec_id",
        "embedding",
        F.min("vec_id").over(w).alias("_gid"),
        F.count(F.lit(1)).over(w).alias("_cnt"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    reps = cn.filter(F.col("vec_id") == F.col("_gid")).select(
        "vec_id", "embedding"
    )
    if pairs_of_reps is None:
        pr = SIM.cosine_near_dup_pairs(
            reps, dim=dim, threshold=threshold, n_planes=8
        )
    else:
        pr = pairs_of_reps(reps)
    comp = DD.connected_components(
        pr.select(F.col("id1").alias("doc_a"), F.col("id2").alias("doc_b"))
    )
    # the tight bit is only ever consulted for clone cliques (_cnt > 1 —
    # the CASE's earlier arms catch everything else), so the interpreted
    # decimal self-dot fold runs over clique reps only: on clone-light
    # corpora that is ~nothing instead of a corpus-sized pass
    tight = (
        cn.filter((F.col("_cnt") > 1) & (F.col("vec_id") == F.col("_gid")))
        .select(
            "_gid",
            (
                dot_decimal(F.col("embedding"), F.col("embedding")) >= threshold
            ).alias("_tight"),
        )
    )
    j = cn.join(
        comp.select(F.col("doc_id").alias("_gid"), F.col("component").alias("_comp")),
        "_gid",
        "left",
    ).join(tight, "_gid", "left")
    kept = (
        F.when(F.col("_comp").isNotNull(), F.col("vec_id") == F.col("_comp"))
        .when(F.col("_cnt") == 1, F.lit(True))
        .when(F.col("_tight"), F.col("vec_id") == F.col("_gid"))
        .otherwise(F.lit(True))
    )
    canon = (
        F.when(F.col("_comp").isNotNull(), F.col("_comp"))
        .when(F.col("_cnt") == 1, F.col("vec_id"))
        .when(F.col("_tight"), F.col("_gid"))
        .otherwise(F.col("vec_id"))
    )
    return j.select(
        "vec_id", kept.alias("kept"), canon.cast("bigint").alias("canon_id")
    )


def semantic_uncollapsed_frame(
    corpus: DataFrame, dim: int = _DIM, threshold: float = _SEM_T
) -> DataFrame:
    """The same per-member verdict table computed WITHOUT collapse: pair
    every co-bucketed corpus row, components, keep the component minima.
    Value-equal to :func:`semantic_collapsed_frame` in every regime
    (bucketing is a pure function of the vector; identical vectors score
    their self-dot) — the ``fast`` arm of ``ann_semantic_auto`` on
    clone-light corpora, where the collapse window is pure premium."""
    pr = SIM.cosine_near_dup_pairs(
        corpus, dim=dim, threshold=threshold, n_planes=8
    )
    comp = DD.connected_components(
        pr.select(F.col("id1").alias("doc_a"), F.col("id2").alias("doc_b"))
    )
    j = corpus.join(
        comp.select(F.col("doc_id").alias("vec_id"), "component"),
        "vec_id",
        "left",
    )
    kept = F.when(
        F.col("component").isNotNull(), F.col("vec_id") == F.col("component")
    ).otherwise(F.lit(True))
    return j.select(
        "vec_id",
        kept.alias("kept"),
        F.coalesce("component", "vec_id").cast("bigint").alias("canon_id"),
    )


@register(
    "ann_semantic_collapsed",
    _SEM_COLLAPSED_SQL,
    "similarity", "dedup", "semdedup", "canonical", "clone-collapse",
    "serving",
    twin_of="ann_semantic_canonical",
    twin_pin="tests/test_round13.py::test_semantic_collapsed_equals_uncollapsed",
)
def ann_semantic_collapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with EXACT-CLONE COLLAPSE before any pair stage — the
    semantic family's governor for the r12 sf10 OOM
    (ann_semantic_canonical_fast: per-cell all-pairs over 100-deep
    embedding clone cliques exhausted a 64 GB heap; SF10_WALL_r12
    ``excluded_anchors``).  Byte-identical vectors collapse to their
    min-id representative in one window pass; the exact-decimal
    hyperplane pair path + min-label components run over representatives
    only; member verdicts are a projection (see the module docstring for
    the four-arm rule).  Output: (vec_id, kept, canon_id) per corpus
    member — strictly finer than the canonical anchor's per-source
    counts, and fully value-oracled via the spliced canonical CTEs.

    Because bucket assignment and pair scores are pure functions of the
    vector, this EQUALS the uncollapsed member-level components in every
    regime — clone-light corpora included — so the collapse changes the
    work, never the answer (pinned both ways in tests/test_round13.py)."""
    return semantic_collapsed_frame(sem_aug(spark, sf_dir)).orderBy("vec_id")


@register(
    "ann_semantic_collapsed_fast", None,
    "similarity", "dedup", "semdedup", "clone-collapse", "ivf", "blas",
    "serving",
    twin_of="ann_semantic_collapsed",
    twin_pin="tests/test_round13.py::test_semantic_collapsed_fast_collapse_invariance",
)
def ann_semantic_collapsed_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION-cost twin of ``ann_semantic_collapsed``: identical
    collapse and expansion, but rep pairs come from the per-cell BLAS
    scorer over an IVF index built on the REPRESENTATIVES (n_assign=3,
    the dedup-recall setting of ann_semantic_dedup) instead of the
    exact-decimal hyperplane path.  Rows-only (KMeans codebook
    upstream); collapse-invariance under a shared rep-trained codebook —
    per-cell verify over reps + expansion equals per-cell verify over
    every member — is pinned in tests/test_round13.py (cross-generator
    equality with the hyperplane twin is NOT the contract: IVF recall
    at 0.35 is its own documented number, the ann_semantic_dedup
    story).

    This is the entry that replaces the r12 OOM exclusion in the sf10
    wall: cells see at most one member per clone clique, so per-cell
    matrices are distinct-vector-sized no matter how deep the clone
    load — ``M @ M.T`` memory is O(reps²/cells), not O(corpus²/cells)."""

    def ivf_pairs(reps: DataFrame) -> DataFrame:
        idx = SIM.ivf_build(reps, n_cells=8, n_assign=3)
        return SIM.semantic_dedup_pairs_fast(idx, threshold=_SEM_T)

    return semantic_collapsed_frame(
        sem_aug(spark, sf_dir), pairs_of_reps=ivf_pairs
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# Duplication-factor dispatch entries (VERDICT r12 item 2): the regime
# probe routes each family to its fast twin or its collapse governor.
# On the fixture corpora (dup factor 1.0-1.24) every entry routes
# "fast"; on the key-shifted wall corpora (factor ≈ 100) they route
# "collapsed" — pinned in tests on constructed clone corpora.
# ---------------------------------------------------------------------------

def _norm_text():
    # built lazily: Column construction needs an active SparkContext
    return F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")


# The containment family is the one whose arms legitimately DIFFER on
# clone corpora (dfs shift post-collapse — the r12 story), so the auto
# entry's oracle must dispatch exactly like the engine does: compute the
# dup factor in SQL and take the matching arm's full oracle.  DuckDB
# cannot statically prune the unchosen UNION branch (the guard is a
# data-dependent scalar subquery), so the ORACLE evaluates both arms —
# an eval-only cost (measured 75 s at sf1 vs 6 s for one arm), never
# paid by the engine.  The exact COUNT(DISTINCT) here vs the engine's
# HLL probe agree on the routing whenever the factor is away from the
# 2.0 cutoff (fixture regimes: 1.0 / ~10 / ~100).
from .breadth12 import _CT_NORM_SQL  # noqa: E402
from .breadth8 import _CT_CORPUS_CTE  # noqa: E402

_CT_AUTO_SQL = f"""
WITH fac AS (
  SELECT CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT {_CT_NORM_SQL}) AS f
  FROM ({_CT_CORPUS_CTE})
)
SELECT * FROM ({CATALOG["dedup_containment_canonical"].oracle}) q
WHERE (SELECT f FROM fac) < 2.0
UNION ALL
SELECT * FROM ({CATALOG["dedup_containment_collapsed"].oracle}) q
WHERE (SELECT f FROM fac) >= 2.0
""".strip()


@register(
    "dedup_containment_auto",
    _CT_AUTO_SQL,
    "dedup", "containment", "dispatch", "clone-collapse", "serving",
    twin_of="dedup_containment_canonical_fast",
    twin_pin="tests/test_round13.py::test_containment_auto_routes_and_matches",
)
def dedup_containment_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-covering containment behind the duplication-factor dispatch:
    measure the corpus's clone depth (one approx-distinct aggregate over
    the normalized text), then run ``dedup_containment_canonical_fast``'s
    pruned scorer (factor < 2 — the sf0.01/sf0.1 fixture: 1.0) or
    ``dedup_containment_collapsed``'s collapse-first governor (factor
    ≥ 2 — the key-shifted sf1/sf10 corpora: ~10/~100, where that arm is
    a measured 72× win).  The dispatcher returns the chosen arm
    bit-exactly — it adds a decision, never arithmetic — and the ORACLE
    dispatches identically (both arm oracles behind the same factor
    guard), because this is the one family whose arms differ in VALUE on
    clone corpora: collapse recomputes shingle dfs over representatives,
    so clone inflation can't push real shingles past the df cap.  This
    is the containment family's user-facing serving entry: the r12
    finding that no single plan wins both regimes, composed into the
    plan instead of left as twin-choosing folklore."""
    corpus = _ct_corpus(spark, sf_dir)
    _choice, _factor, frame = dispatch_by_duplication(
        corpus,
        _norm_text(),
        fast=lambda: DD.containment_best_covering(
            _ct_shingles(spark, sf_dir), min_u=_CT_MIN_U
        ),
        collapsed=lambda: containment_collapsed_frame(corpus),
    )
    return frame.orderBy("id_sub")


def minhash_argmax_frame(spark: SparkSession, corpus: DataFrame) -> DataFrame:
    """Per-doc best near-duplicate (max jaccard, ties to the smallest id)
    straight off the banded pair list — the UNCOLLAPSED arm of
    ``dedup_minhash_auto``.  Equals ``dedup_minhash_canonical`` in value
    on any corpus (banding is a pure function of text; r12 argmax pin),
    differing only in where the work lands: here every clone pays the
    full band/verify path, there cliques collapse first."""
    pairs = DD.minhash_dedup_pairs(spark, corpus, threshold=0.5)
    b2 = pairs.select(
        F.col("doc_a").alias("_me"), F.col("doc_b").alias("_mt"), "jaccard"
    ).unionByName(
        pairs.select(
            F.col("doc_b").alias("_me"), F.col("doc_a").alias("_mt"), "jaccard"
        )
    )
    return (
        b2.groupBy("_me")
        .agg(
            F.min(
                F.struct((-F.col("jaccard")).alias("d"), F.col("_mt").alias("m"))
            ).alias("_b")
        )
        .select(
            F.col("_me").alias("doc_id"),
            F.col("_b.m").cast("bigint").alias("match_id"),
            (-F.col("_b.d")).alias("jaccard"),
        )
    )


@register(
    "dedup_minhash_auto",
    _MH_CANONICAL_SQL,
    "dedup", "minhash", "lsh", "dispatch", "clone-collapse", "serving",
    twin_of="dedup_minhash_canonical",
    twin_pin="tests/test_round13.py::test_minhash_auto_routes_and_matches",
)
def dedup_minhash_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc best near-duplicate behind the duplication-factor
    dispatch: clone-light corpora (this fixture: factor 1.1) take the
    direct banded argmax (``minhash_argmax_frame`` — no collapse window),
    clone-heavy corpora take ``dedup_minhash_canonical``'s collapse-first
    program.  For THIS family the two arms are value-equal everywhere
    (banding is a pure function of text), so one oracle covers both
    routes and the dispatch is purely a cost decision — the
    factor-232× r12 wall blowup on one side, the collapse premium on the
    other."""
    corpus = _aug(spark, sf_dir)
    _choice, _factor, frame = dispatch_by_duplication(
        corpus,
        _norm_text(),
        fast=lambda: minhash_argmax_frame(spark, corpus),
        collapsed=lambda: CATALOG["dedup_minhash_canonical"].fn(spark, sf_dir),
    )
    return frame.orderBy("doc_id")


@register(
    "ann_semantic_auto",
    _SEM_COLLAPSED_SQL,
    "similarity", "dedup", "semdedup", "dispatch", "clone-collapse",
    "serving",
    twin_of="ann_semantic_collapsed",
    twin_pin="tests/test_round13.py::test_semantic_auto_routes_and_matches",
)
def ann_semantic_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup verdicts behind the duplication-factor dispatch: the
    clone-depth probe runs over the RAW EMBEDDING as the dedup key
    (byte-identical vectors are what the collapse merges), routing to
    the uncollapsed member-level components (factor < 2 — this fixture:
    1.24) or the collapse-first governor (factor ≥ 2 — the regime whose
    ungoverned form OOMed the r12 wall).  Arms are value-equal in every
    regime (module docstring), so the dispatch is purely the cost
    routing and one spliced oracle covers both."""
    corpus = sem_aug(spark, sf_dir)
    _choice, _factor, frame = dispatch_by_duplication(
        corpus,
        F.col("embedding"),
        fast=lambda: semantic_uncollapsed_frame(corpus),
        collapsed=lambda: semantic_collapsed_frame(corpus),
    )
    return frame.orderBy("vec_id")


# ---------------------------------------------------------------------------
# Clone-collapsed fuzzy decontamination (closing the r12 wall's last
# uncollapsed high ratio).  SF10_WALL_r13 measured the fuzzy anchor at
# 26.8x and the prebuilt twin at 40.7x two-decades: the bipartite
# clone-clique verify pays every corpus clone its own band/probe pass.
# Unlike containment, the fuzzy verdict is a PURE FUNCTION of the
# normalized text vs the frozen benchmark index — identical texts have
# identical shingle sets, so collapse is exactly verdict-preserving on
# every corpus and the anchor's SQL is the collapsed entry's oracle
# VERBATIM (no spliced arithmetic needed).
# ---------------------------------------------------------------------------


@register(
    "docs_decontaminate_fuzzy_collapsed",
    CATALOG["docs_decontaminate_fuzzy"].oracle,
    "pipeline", "decontamination", "minhash", "lsh", "fuzzy",
    "clone-collapse", "serving",
    twin_of="docs_decontaminate_fuzzy_prebuilt",
    twin_pin="tests/test_round13.py::test_fuzzy_collapsed_equals_prebuilt",
)
def docs_decontaminate_fuzzy_collapsed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fuzzy benchmark decontamination with EXACT-CLONE COLLAPSE before
    the corpus-side shingle/band/probe pass: byte-identical normalized
    texts collapse to their min-id representative in one window, only
    representatives are hashed and probed against the frozen benchmark
    band index (``fuzzy_bench_index_for`` — the prebuilt serving
    lifecycle), and members inherit their representative's verdict as a
    projection.  Because the verdict is a pure function of (normalized
    text, frozen index), this EQUALS the anchor row-for-row on any
    corpus — the anchor's oracle is reused verbatim, and equality with
    the prebuilt twin is pinned in pytest.

    Scale posture: corpus clone depth m shrinks the shingle+minhash and
    candidate-verify stages m× instead of multiplying the bipartite
    clone-clique verify (the SF10_WALL_r13 26.8×/40.7× two-decade
    ratios this entry governs); the expansion is one rep-dim hash join.
    On clone-light corpora the collapse window is the usual small
    premium — the dup-factor dispatch pattern applies if a caller wants
    it routed (operators/dispatch.py)."""
    from .breadth11 import fd_corpus, fuzzy_flagged
    from .breadth12 import fuzzy_bench_index_for

    from pyspark.storagelevel import StorageLevel

    corpus = fd_corpus(spark, sf_dir)
    w = Window.partitionBy("_ntext")
    # _norm_text() is the SAME normalization the dispatch probe keys on —
    # one definition, so the collapse grouping and the routing factor can
    # never disagree on what counts as a clone; persisted because the
    # windowed frame feeds BOTH the rep probe pipeline and the member
    # join (the semantic/containment collapse-frame discipline)
    cn = (
        corpus.select("doc_id", "text", _norm_text().alias("_ntext"))
        .select("doc_id", "text", F.min("doc_id").over(w).alias("_gid"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    reps = cn.filter(F.col("doc_id") == F.col("_gid")).select(
        "doc_id", "text"
    )
    hc = DD.shingle_hashes(reps)
    bc = DD.minhash_band_keys(hc)
    hb, bb = fuzzy_bench_index_for(spark, sf_dir)
    rep_flags = fuzzy_flagged(hc, bc, hb, bb).withColumnRenamed(
        "doc_id", "_gid"
    )
    return (
        cn.select("doc_id", "_gid")
        .join(rep_flags, "_gid")
        .select("doc_id", "n_bench_hits", "best_bench_id", "best_jaccard_u")
        .orderBy("doc_id")
    )


@register(
    "docs_decontaminate_fuzzy_auto",
    CATALOG["docs_decontaminate_fuzzy"].oracle,
    "pipeline", "decontamination", "minhash", "lsh", "fuzzy", "dispatch",
    "clone-collapse", "serving",
    twin_of="docs_decontaminate_fuzzy_collapsed",
    twin_pin="tests/test_round13.py::test_fuzzy_auto_routes_and_matches",
)
def docs_decontaminate_fuzzy_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy decontamination behind the duplication-factor dispatch —
    the fourth family to get the r13 routing: factor < 2 → the prebuilt
    twin's program (probe the frozen index with the full corpus; this
    fixture: ~1.1, no collapse-window premium), factor ≥ 2 → the
    clone-collapse governor (the key-shifted sf1/sf10 corpora: ~10/~100,
    where it is a measured 8× absolute win at sf10).  Arms are
    value-equal in every regime (verdicts are text-pure), so the
    anchor's oracle covers both routes and the dispatch is purely the
    cost decision."""
    from .breadth11 import fd_corpus, fuzzy_flagged
    from .breadth12 import fuzzy_bench_index_for

    corpus = fd_corpus(spark, sf_dir)

    def fast() -> DataFrame:
        hc = DD.shingle_hashes(corpus)
        bc = DD.minhash_band_keys(hc)
        hb, bb = fuzzy_bench_index_for(spark, sf_dir)
        return fuzzy_flagged(hc, bc, hb, bb)

    _choice, _factor, frame = dispatch_by_duplication(
        corpus,
        _norm_text(),
        fast=fast,
        collapsed=lambda: CATALOG["docs_decontaminate_fuzzy_collapsed"].fn(
            spark, sf_dir
        ),
    )
    return frame.orderBy("doc_id")
