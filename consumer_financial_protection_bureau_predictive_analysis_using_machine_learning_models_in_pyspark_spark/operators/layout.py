"""Physical data-layout operators: Z-order clustering, min-max
data-skipping manifests, and incremental materialized-view maintenance.

At 100 TB the scan is the dominant cost, and the three levers that cut
it are (a) multi-dimensional clustering so range predicates on EITHER
key touch few files (Z-order), (b) per-file min-max statistics so the
planner can skip files without opening them (the manifest every lake
format — Delta, Iceberg, Hudi — maintains), and (c) never re-aggregating
history: a materialized aggregate is maintained by merging the day's
delta PARTIALS into the stored partial state, so the daily job touches
the delta plus the (key-sized, not fact-sized) MV.

Everything here is pure column expressions over integer arithmetic —
bit interleaves, integer division, decimal sums — so the engine path
and a SQL oracle agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Z-order
# ---------------------------------------------------------------------------


def _interleave(px: Column, sx: Column, bits: int) -> Column:
    """Morton/Z interleave of two ``bits``-bit integers: x's bit i lands
    at position 2i+1, y's at 2i.  A fold of shift/mask terms — pure
    integer ops, identical in Spark and ANSI SQL."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(px, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        z = z + F.shiftleft(F.shiftright(sx, i).bitwiseAND(F.lit(1)), 2 * i)
    return z


def zorder_values(
    df: DataFrame,
    col_x: str,
    col_y: str,
    bits: int = 8,
) -> DataFrame:
    """Annotate ``df`` with ``zval``: the Morton interleave of the two
    key columns after min-max scaling each into ``bits``-bit bins
    (columns ``_bx``/``_by`` are kept for extent reporting).

    Writing the table as ``repartitionByRange(n, "zval")
    .sortWithinPartitions("zval")`` yields files whose (x, y) extents
    are small SQUARES of the key space instead of full-width stripes —
    so a range predicate on either dimension prunes ~sqrt instead of
    nothing.  The min/max scalars are a 1-row broadcast (free at any
    scale); everything else is per-row integer math, no shuffle.
    """
    mm = df.agg(
        F.min(col_x).alias("_minx"),
        F.max(col_x).alias("_maxx"),
        F.min(col_y).alias("_miny"),
        F.max(col_y).alias("_maxy"),
    )
    n_bins = 1 << bits
    out = df.crossJoin(F.broadcast(mm))
    bx = F.expr(
        f"least({n_bins - 1}, (({col_x} - _minx) * {n_bins}) div (_maxx - _minx + 1))"
    ).cast("bigint")
    by = F.expr(
        f"least({n_bins - 1}, (({col_y} - _miny) * {n_bins}) div (_maxy - _miny + 1))"
    ).cast("bigint")
    out = out.withColumn("_bx", bx).withColumn("_by", by)
    return out.withColumn("zval", _interleave(F.col("_bx"), F.col("_by"), bits)).drop(
        "_minx", "_maxx", "_miny", "_maxy"
    )


def hilbert_values(
    df: DataFrame,
    col_x: str,
    col_y: str,
    bits: int = 8,
) -> DataFrame:
    """Hilbert twin of :func:`zorder_values`: same min-max binning into
    ``bits``-bit cells (``_bx``/``_by`` kept for extent reporting), but
    the layout key ``zval`` is the HILBERT index of the cell
    (functions.spacefill.with_hilbert — native unrolled integer SQL).

    Why offer both: Morton's bit-interleave takes long diagonal jumps
    between quadrants, so a range bucket can straddle two distant
    squares; the Hilbert walk is unit-step adjacent everywhere, giving
    strictly tighter per-bucket bounding boxes at the same bit depth —
    tests/test_round8.py pins the measured bbox-area win on lineitem.
    Same scale shape: 1-row broadcast of the min/max scalars, per-row
    integer math, no shuffle.
    """
    from ..functions.spacefill import with_hilbert

    mm = df.agg(
        F.min(col_x).alias("_minx"),
        F.max(col_x).alias("_maxx"),
        F.min(col_y).alias("_miny"),
        F.max(col_y).alias("_maxy"),
    )
    n_bins = 1 << bits
    out = df.crossJoin(F.broadcast(mm))
    bx = F.expr(
        f"least({n_bins - 1}, (({col_x} - _minx) * {n_bins}) div (_maxx - _minx + 1))"
    ).cast("bigint")
    by = F.expr(
        f"least({n_bins - 1}, (({col_y} - _miny) * {n_bins}) div (_maxy - _miny + 1))"
    ).cast("bigint")
    out = (
        out.withColumn("_bx", bx)
        .withColumn("_by", by)
        .drop("_minx", "_maxx", "_miny", "_maxy")
    )
    return with_hilbert(out, "_bx", "_by", "zval", bits=bits)


def zorder_extent_report(
    zdf: DataFrame, bits: int = 8, n_buckets: int = 32
) -> DataFrame:
    """Per-Z-range-bucket extent report: bucket ``zval * n div 4**bits``
    (i.e. what a range-partitioned write would co-locate), with the
    bucket's row count and its bounding box in bin space.  The payoff
    number is the bounding-box side length: Z-ordered buckets cover
    ~sqrt(bins) of EACH dimension, where a 1-D sort covers all of one.

    One keyed shuffle on the bucket id; at 100 TB this is the write-side
    clustering audit run on a sample, not the full table.
    """
    z_space = 1 << (2 * bits)
    return (
        zdf.withColumn(
            "bucket",
            F.expr(f"(zval * {n_buckets}) div {z_space}").cast("bigint"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("_bx").alias("min_x_bin"),
            F.max("_bx").alias("max_x_bin"),
            F.min("_by").alias("min_y_bin"),
            F.max("_by").alias("max_y_bin"),
        )
    )


# ---------------------------------------------------------------------------
# Min-max data-skipping manifest
# ---------------------------------------------------------------------------


def skipping_manifest(
    df: DataFrame,
    layouts: dict[str, Column],
    value_col: str,
) -> DataFrame:
    """Per-shard min-max manifest under one or more candidate layouts,
    in ONE scan: each row is exploded into one (layout, shard) tag per
    candidate layout, then a single keyed agg computes every layout's
    per-shard stats together.

    ``layouts`` maps layout name -> shard-id expression (e.g. a hash of
    the ingest key vs. a time-derived id).  This is the stats table a
    lake format keeps per file; computing candidate layouts side by side
    is how you DECIDE a re-clustering pays for itself before running it.
    One scan, one shuffle whose rows are (n_layouts x n_rows) narrow
    tags — never the full row payload.
    """
    tags = F.explode(
        F.array(
            *[
                F.struct(F.lit(name).alias("layout"), sid.cast("bigint").alias("shard"))
                for name, sid in layouts.items()
            ]
        )
    ).alias("_tag")
    return (
        df.select(F.col(value_col).alias("_v"), tags)
        .select("_tag.layout", "_tag.shard", "_v")
        .groupBy("layout", "shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("_v").alias("min_v"),
            F.max("_v").alias("max_v"),
        )
    )


def pruning_report(manifest: DataFrame, lo, hi) -> DataFrame:
    """Fold a skipping manifest into the per-layout pruning outcome for
    the predicate ``value BETWEEN lo AND hi``: a shard is skipped when
    its [min, max] envelope misses the range entirely.  Output per
    layout: shard count, shards skipped, rows skipped, rows scanned —
    the clustering dividend as one number.  Manifest-sized input (a few
    hundred rows at any data scale), so this is a driver-cheap fold.
    """
    skip = (F.col("max_v") < F.lit(lo)) | (F.col("min_v") > F.lit(hi))
    return (
        manifest.withColumn("_skip", skip.cast("int"))
        .groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shards"),
            F.sum("_skip").cast("bigint").alias("n_skipped"),
            F.sum(F.col("_skip") * F.col("n_rows")).cast("bigint").alias("rows_skipped"),
            F.sum((1 - F.col("_skip")) * F.col("n_rows"))
            .cast("bigint")
            .alias("rows_scanned"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental materialized-view maintenance
# ---------------------------------------------------------------------------


def orders_mv_partial(orders: DataFrame) -> DataFrame:
    """The partial-aggregate state of the per-customer order MV:
    (o_custkey, n_orders, sum_total DECIMAL, max_date).  Count and max
    are trivially re-mergeable; the sum is kept in DECIMAL so merge
    order can never change the value (the same exact-sum discipline the
    whole catalog uses).
    """
    return orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_sum_dec"),
        F.max("o_orderdate").alias("max_date"),
    )


def mv_merge(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge a delta's partial state into the stored MV state: union the
    two partial frames and re-fold (sum of counts, sum of decimal sums,
    max of maxes).  This is the algebraic-aggregate contract: history is
    NEVER rescanned — the daily job costs O(delta + |keys touched|),
    not O(all facts ever).  The shuffle carries only partial rows (one
    per key per side); at 100 TB the base side is the key-sized MV
    table read back from storage, and keys absent from the delta stream
    through untouched.
    """
    return (
        base.unionByName(delta)
        .groupBy("o_custkey")
        .agg(
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.sum("_sum_dec").cast("decimal(20,2)").alias("_sum_dec"),
            F.max("max_date").alias("max_date"),
        )
    )


def zorder_write(
    df: DataFrame,
    col_x: str,
    col_y: str,
    out_dir: str,
    n_files: int = 16,
    bits: int = 8,
) -> None:
    """The actual clustered WRITE: annotate with ``zval``, range-partition
    into ``n_files`` z-ranges, sort within each file, and write parquet —
    what a lake format's OPTIMIZE ZORDER materializes.  Each output file
    then covers a compact square-ish region of (x, y) space, so file-level
    min-max stats prune range predicates on EITHER column.

    ``repartitionByRange`` samples the z distribution for balanced
    boundaries (skew-proof, unlike fixed aligned buckets); the sort
    within partitions is a local sort, no extra shuffle.  The bin
    columns ride along so ``file_extent_report`` can audit the layout
    without recomputing the scaling."""
    z = zorder_values(df, col_x, col_y, bits=bits)
    (
        z.repartitionByRange(n_files, F.col("zval"))
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def file_extent_report(spark, path: str, cols: tuple[str, ...]) -> DataFrame:
    """Per-FILE min-max manifest of a written table: group the rows of
    each physical parquet file (``input_file_name``) and fold min/max of
    the given columns + a row count — the stats a lake format stores per
    file at commit time, recovered here by scan (the bootstrap path for
    tables written without a format, or an audit of one).

    Files are identified by their z-order rank (dense rank of file name)
    so the report is stable across temp directories.  One scan + one
    keyed agg whose key count is the file count."""
    from pyspark.sql import Window

    df = spark.read.parquet(path).withColumn("_f", F.input_file_name())
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    per_file = df.groupBy("_f").agg(*aggs)
    rank = F.dense_rank().over(Window.orderBy("_f"))
    return per_file.withColumn("file_rank", rank).drop("_f")


def epoch_shuffle(
    df: DataFrame,
    n_epochs: int = 2,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic multi-epoch training shuffle WITHOUT a global sort:
    for each epoch, every row gets an epoch-salted md5 order key, a
    shard from that key's first hex digit, and reproducible within-shard
    ordering by the key — the loader contract a pretraining run needs
    (each epoch visits the corpus in a different but replayable order,
    and no two epochs correlate shard assignment or order).

    This is `docs_shard_export`'s hash sharding generalized to the
    epoch dimension: the permutation is the RANK of md5(epoch:id) —
    never materialized as a global sort; the writer realizes it as
    ``partitionBy(shard) + sortWithinPartitions(order_key)``, so each
    shard sorts locally and the cluster never funnels through one
    ordered exchange.  Epochs multiply rows here only because the
    manifest view wants all epochs in one frame; a real loader generates
    one epoch per pass with the same expressions.

    Returns (epoch INT, shard_id INT, <id_col>, order_key STRING hex).
    Pure engine-portable string/arith expressions — no bit tricks, no
    rand() — so SQL oracles replay it exactly.  The shard folds the
    first 13 hex digits of the key (a 52-bit uniform, not a single
    digit) so ANY ``n_shards`` — including > 16 and non-divisors of
    16 — gets a balanced assignment.
    """
    key = F.md5(
        F.concat(
            F.col("epoch").cast("string"),
            F.lit(":"),
            F.col(id_col).cast("string"),
        )
    )
    shard = (
        F.conv(F.substring(F.col("order_key"), 1, 13), 16, 10).cast("bigint")
        % F.lit(int(n_shards))
    ).cast("int")
    return (
        df.select(
            F.col(id_col),
            F.explode(
                F.sequence(F.lit(0), F.lit(int(n_epochs) - 1))
            ).alias("epoch"),
        )
        .withColumn("order_key", key)
        .withColumn("shard_id", shard)
        .select("epoch", "shard_id", id_col, "order_key")
    )
