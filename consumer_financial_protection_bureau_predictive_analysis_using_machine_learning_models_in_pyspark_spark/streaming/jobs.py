"""Structured Streaming jobs (beyond-reference extension; the reference is
pure batch — SURVEY §2.11).

Each job takes a STREAMING DataFrame (``spark.readStream``) and returns the
transformed streaming frame; the caller owns the sink/trigger.  The batch
twins in ``streaming.windows`` share the event-time shapes, so one logical
definition serves both (test strategy: run the stream with
``trigger(availableNow=True)`` to a memory sink and diff against the batch
result).

Scale posture:
- every stateful op carries a WATERMARK — unbounded state is the streaming
  analogue of a cartesian join; without one, 100 TB/day of events grows
  state forever.
- state-store keys are (key × window), so skewed users spread across
  windows; the state partition count is pinned per query
  (``STREAM_STATE_PARTITIONS`` below) — it is a durable property of the
  checkpoint, sized to state volume, never inherited from transient
  session width (state store is per-partition RocksDB on a real cluster).
"""

from __future__ import annotations

import contextlib
import os
from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


# State-store / micro-batch shuffle partition count for every streaming
# query this module starts (r13 optimization).  A streaming query's state
# partition count is fixed at FIRST start from spark.sql.shuffle.partitions
# and can never be changed without a state rebuild, so it is a durable
# per-query sizing decision — NOT something to inherit from whatever the
# session's batch width happens to be.  Each stateful operator commits one
# state-store delta file per partition per micro-batch (a stream-stream
# join keeps FOUR stores per partition), so oversized counts multiply
# fixed checkpoint I/O: at the fixture scale, 32 partitions cost a
# measured 5.8 s vs 3.5 s at 8 for stream_click_purchase_join (idle
# local[32], steady-state medians).  8 keeps micro-batch state commits
# cheap while preserving parallelism headroom for fixture-sized batches;
# a production deployment sizes it to state volume via this env knob
# (state partitions should scale with keys held, not cluster width).
STREAM_STATE_PARTITIONS = int(
    os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "8")
)


@contextlib.contextmanager
def pinned_state_partitions(spark, n: int | None = None):
    """Pin spark.sql.shuffle.partitions for the duration of a streaming
    query run (start → awaitTermination), restoring the session value
    after.  Every ``run_*`` helper below wraps its query with this, so
    the state layout every stream commits is the deliberate
    ``STREAM_STATE_PARTITIONS`` sizing rather than the session's batch
    width.  Safe here because each runner drains its query synchronously
    (availableNow + awaitTermination) before the conf is restored."""
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(n or STREAM_STATE_PARTITIONS))
    try:
        yield
    finally:
        spark.conf.set(key, old)


def _start_and_drain(writer, spark) -> None:
    """Start a (trigger-configured) stream writer and block until drained,
    with the state-partition pin held for the query's whole lifetime."""
    with pinned_state_partitions(spark):
        q = writer.start()
        q.awaitTermination()


# One staging dir per source file, reused across calls (repeated test/bench
# runs previously leaked a fresh mkdtemp per call); cleaned up at exit.
_STAGING_DIRS: dict[str, str] = {}


def _staging_dir(src: str) -> str:
    import atexit
    import os
    import shutil
    import tempfile

    stage = _STAGING_DIRS.get(src)
    if stage and os.path.isdir(stage):
        return stage
    stage = tempfile.mkdtemp(prefix="events_stream_")
    os.symlink(src, os.path.join(stage, os.path.basename(src)))
    if not _STAGING_DIRS:
        atexit.register(
            lambda: [shutil.rmtree(d, ignore_errors=True) for d in _STAGING_DIRS.values()]
        )
    _STAGING_DIRS[src] = stage
    return stage


def read_events_stream(
    spark, sf_dir: str, max_files_per_trigger: int | None = None
):
    """File-source stream over the events parquet directory — the local
    stand-in for Kafka (same DataFrame surface; swap `format('kafka')` +
    from_json(value) in production).

    Same ts-encoding sniff as sources.readers._load_events: legacy fixtures
    store TIMESTAMP(NANOS) (read as int64 + reconstruct; Spark's reader
    rejects nanos outright), current ones plain TIMESTAMP(MICROS).  The
    file source wants a DIRECTORY (it tails new files), while the fixture
    is a single file — stage a symlink dir."""
    import os

    from .. import schemas
    from ..sources.readers import _NS_TO_NTZ, _events_ts_is_nanos

    src = os.path.join(sf_dir, "events.parquet")
    stage = _staging_dir(src)
    nanos = _events_ts_is_nanos(src)
    batch_schema = (
        schemas.EVENTS_RAW_SCHEMA
        if nanos
        else spark.read.parquet(src).schema  # file source needs an explicit schema
    )
    r = spark.readStream.schema(batch_schema)
    if max_files_per_trigger:  # None = drain the source in one micro-batch
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = r.parquet(stage)
    # watermarks require TIMESTAMP (LTZ) — cast (session tz is UTC in
    # get_session, so the instant is unchanged)
    ts = F.expr(_NS_TO_NTZ) if nanos else F.col("ts")
    return raw.withColumn("ts", ts.cast("timestamp"))


def windowed_counts(
    events: DataFrame,
    duration: str = "1 hour",
    watermark: str = "2 hours",
    keys: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Watermarked tumbling-window counts — the canonical streaming agg.
    Late events beyond `watermark` are dropped and their window's state
    evicted (bounded state)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # decimal fold: exact, order-independent — same engine-wide
            # numeric discipline as the batch catalog queries
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    duration: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
    keys: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Watermarked sliding (hopping) window counts: each event contributes
    to duration/slide overlapping windows, window starts aligned to epoch
    multiples of ``slide``.  State per key is duration/slide concurrent
    windows; the watermark evicts each as it closes."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration, slide).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    key: str = "user_id",
) -> DataFrame:
    """Native session windows (``F.session_window``): a session closes when
    no event arrives within `gap`; watermark bounds open-session state.
    Batch twin: streaming.windows.sessionize (gaps-and-islands)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col(key))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col(key),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: Sequence[str] = ("event_id",),
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: keep the first occurrence of each key within
    the watermark horizon (`dropDuplicatesWithinWatermark`), state evicted
    after the horizon — the at-least-once → exactly-once repair stage in an
    ingestion pipeline."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


# ---------------------------------------------------------------------------
# Custom stateful operator: applyInPandasWithState
# ---------------------------------------------------------------------------

RUNNING_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_ts", TimestampType()),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("max_ts", TimestampType()),
    ]
)


def running_user_stats(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful operator: per-user running (count, sum(value),
    max(ts)) maintained across micro-batches via
    ``applyInPandasWithState`` — the pattern for semantics Spark's built-in
    aggs can't express (per-key model state, CEP, custom eviction).

    State times out `watermark` past the event-time watermark
    (EventTimeTimeout) so abandoned users are evicted."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total, max_ts = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = pdf["ts"].max()
            max_ts = batch_max if max_ts is None else max(max_ts, batch_max)
        state.update((n, total, max_ts))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 7_200_000)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 4)],
                "max_ts": [max_ts],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_to_memory(
    stream: DataFrame,
    name: str,
    output_mode: str = "append",
    checkpoint: str | None = None,
) -> None:
    """Drain a stream to an in-memory table with availableNow (test/CI
    harness; production uses kafka/delta/parquet sinks + a real trigger)."""
    w = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    _start_and_drain(w, stream.sparkSession)


def click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: each click matches the same
    user's purchases in (click_ts - window, click_ts].

    Both sides carry watermarks and the join predicate bounds event-time on
    BOTH sides — that is what lets Spark evict join state (without the time
    bound, both buffers grow forever).  State per side ≈ watermark-horizon
    rows per user.
    """
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("click_ts") - F.expr(f"INTERVAL {window}"))
        & (F.col("purchase_ts") <= F.col("click_ts")),
    ).select(
        "click_id", "user_id", "click_ts", "click_value",
        "purchase_id", "purchase_ts", "purchase_value",
    )


def run_foreach_batch_parquet(
    stream: DataFrame,
    out_dir: str,
    checkpoint: str,
) -> None:
    """Production sink pattern: ``foreachBatch`` writing each micro-batch to
    parquet partitioned by batch id, with DYNAMIC partition overwrite — a
    replayed batch (failure between write and offset commit) overwrites its
    own ``_batch_id=N`` partition instead of appending duplicates, making
    the sink idempotent and therefore effectively exactly-once.  (With a
    transactional table format — Delta/Iceberg — the same hook does a MERGE
    keyed on batch id.)  availableNow trigger; blocks until drained."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_dir)
        )

    w = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
    _start_and_drain(w, stream.sparkSession)


def run_streaming_rollup(
    stream: DataFrame,
    out_dir: str,
    checkpoint: str,
    level: str = "minute",
    keys: Sequence[str] = ("event_type",),
) -> None:
    """Incremental continuous aggregate (the streaming twin of
    ``operators.windows.multires_rollup``): each micro-batch is collapsed
    to ``level`` partials (bucket, keys, n, decimal sum) and written
    idempotently under its ``_batch_id`` partition — the classic
    materialized-rollup maintenance loop.  Readers merge partials with
    ``read_rollup``; count-sum merge is exact under the decimal fold, so
    the merged view equals the batch rollup of everything ingested,
    whatever the micro-batch boundaries were.  availableNow; blocks until
    drained."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        partial = batch_df.groupBy(
            F.date_trunc(level, F.col("ts")).alias("bucket_start"), *keys
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_dec"),
        )
        (
            partial.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_dir)
        )

    w = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
    _start_and_drain(w, stream.sparkSession)


def read_rollup(
    spark, out_dir: str, keys: Sequence[str] = ("event_type",)
) -> DataFrame:
    """Merge the partials ``run_streaming_rollup`` maintains into the
    current rollup view: (bucket_start, *keys, n_events, sum_value)."""
    return (
        spark.read.parquet(out_dir)
        .groupBy("bucket_start", *keys)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_dec").cast("double").alias("sum_value"),
        )
    )


def static_enrich_counts(
    events: DataFrame,
    dim: DataFrame,
    watermark: str = "2 hours",
    window: str = "1 hour",
) -> DataFrame:
    """Stream-static join: enrich a watermarked event stream with a static
    dimension (user_id -> tier), then tumbling-window counts per tier.

    The static side is re-resolved every micro-batch (Spark re-plans the
    batch join, so a refreshed dim snapshot is picked up on the next
    trigger) and the join itself keeps NO state — only the downstream
    windowed aggregate does.  The dim here is a per-user frame, i.e.
    scale-LINEAR, so it carries no broadcast hint (the r2 verdict class);
    a contractually bounded dim (country list, plan tiers) is where a
    hint would be justified.
    """
    e = events.withWatermark("ts", watermark)
    return (
        e.join(dim, "user_id")
        .groupBy(F.window("ts", window).alias("w"), "tier")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "tier",
            "n_events",
            "sum_value",
        )
    )


def read_embeddings_stream(
    spark, dir_path: str, max_files_per_trigger: int | None = 1
):
    """File-source stream over a directory of embedding parquet files —
    each arriving file (an ingest batch from the upstream embedder) is a
    micro-batch with ``maxFilesPerTrigger=1``.  Kafka stand-in, same as
    ``read_events_stream``."""
    schema = spark.read.parquet(dir_path).schema
    r = spark.readStream.schema(schema)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(dir_path)


def run_streaming_semantic_dedup(
    stream: DataFrame,
    index,
    out_dir: str,
    kept_dir: str,
    checkpoint: str,
    threshold: float = 0.35,
    n_probe_cells: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Streaming SemDeDup: each micro-batch of new embeddings is triaged
    against the canonical corpus PLUS everything kept from earlier
    batches — the continuous-ingest form of
    ``similarity.semantic_dedup_incremental`` (which this calls per
    batch; the quantizer codebook never re-fits).

    State is carried in storage, not in the stream: ``kept_dir`` holds
    the (neighbor_id, vec, cell) rows of every previously-kept batch doc
    under its ``_batch_id`` partition, and each micro-batch unions the
    (already canonical-only) ``index.assigned`` with kept rows from
    STRICTLY EARLIER batches — the ``_batch_id < batch_id`` cut is what
    makes replay idempotent: a re-run batch (failure between write and
    offset commit) does not see its own previous output, so it
    re-derives identical statuses and overwrites its own partitions
    (same exactly-once discipline as ``run_foreach_batch_parquet``).

    Statuses land in ``out_dir`` partitioned by ``_batch_id``;
    sequential equivalence with batch-mode incremental dedup is pinned
    in tests/test_round5.py.
    """
    from ..operators import similarity as SIM

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        base = index.assigned
        if hadoop_path_exists(spark, kept_dir):
            # read failures propagate; only true absence means first batch
            # (the bare-except form silently reset state on ANY error —
            # r8 review finding, fixed here and in the phash twin)
            kept_prev = (
                spark.read.parquet(kept_dir)
                .filter(F.col("_batch_id") < batch_id)
                .select("neighbor_id", "vec", "cell")
            )
            assigned = base.union(kept_prev)
        else:  # first batch: no kept_dir yet
            assigned = base
        idx = SIM.IvfIndex(assigned, index.centroids, index.n_assign)
        # scratch: the operator's internal per-batch persists (corpus_hits)
        # are released below — every micro-batch builds a distinct plan, so
        # without the release the stream accumulates one dead cache entry
        # per batch for its whole lifetime (ADVICE r13)
        scratch: list = []
        st = SIM.semantic_dedup_incremental(
            idx,
            batch_df,
            threshold,
            n_probe_cells=n_probe_cells,
            id_col=id_col,
            vec_col=vec_col,
            scratch=scratch,
        ).persist()
        (
            st.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_dir)
        )
        kept_ids = st.filter(F.col("status") == "kept").select(
            F.col("doc_id").alias(id_col)
        )
        newly_kept = batch_df.join(kept_ids, id_col, "left_semi").select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("vec"),
            F.explode(
                SIM._top_cells(
                    F.col(vec_col), index.centroids, index.n_assign
                )
            ).alias("cell"),
        )
        (
            newly_kept.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(kept_dir)
        )
        st.unpersist()
        for frame in scratch:
            frame.unpersist()

    w = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
    _start_and_drain(w, stream.sparkSession)


def hadoop_path_exists(spark, path: str) -> bool:
    """Existence check through the Hadoop FileSystem API — the ONLY
    acceptable 'is this the first batch?' test for storage-carried
    streaming state.  A bare ``except Exception`` around the state read
    would treat ANY transient read failure (permissions, corrupt footer,
    FS hiccup) as 'no prior state' and silently rebuild dedup state from
    scratch, double-keeping every previously-canonical key (r8 review
    finding); a real read error must propagate and fail the batch."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


def mv_versions(spark, state_dir: str) -> list[int]:
    """Version directories (``v{batch_id}``) under ``state_dir``, resolved
    through the Hadoop FileSystem API so MV state may live on ANY
    Hadoop-supported filesystem (HDFS, object stores), not only the
    driver-local disk — ``os.listdir`` on a remote path silently returns
    nothing, and an empty version list would make a replayed batch
    DOUBLE-FOLD instead of rewriting idempotently (r8 advisor fix).
    Shared by every versioned-MV loop and ``read_mv_state``."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return []
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("v") and name[1:].isdigit():
            out.append(int(name[1:]))
    return sorted(out)


def run_streaming_mv_merge(
    stream: DataFrame,
    state_dir: str,
    checkpoint: str,
    key: str = "user_id",
) -> None:
    """Compact-state MV maintenance — the read-modify-write sibling of
    ``run_streaming_rollup``'s append-partials loop (and the streaming
    form of ``operators.layout.mv_merge``): each micro-batch folds to
    per-key partials (n_events, exact decimal sum, max ts) and is merged
    into the CURRENT MV state, written as a new immutable version
    ``v{batch_id}``.

    Idempotency without a transactional format: version ``v{b}`` is
    derived only from versions `` < b`` plus batch ``b``, so a replayed
    batch (crash between write and offset commit) rewrites ``v{b}``
    byte-identically instead of double-counting; readers take the highest
    complete version (``read_mv_state``).  State is KEY-sized, never
    fact-sized — the trade vs. the rollup loop is a key-sized rewrite per
    batch for an O(keys) read path with no merge-on-read, right when the
    MV is read-heavy.  (On a lake format the same hook becomes MERGE
    INTO; version listing here is a local-FS stand-in for its log.)
    availableNow; blocks until drained."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        partial = batch_df.groupBy(key).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_dec"),
            F.max("ts").alias("max_ts"),
        )
        prev = [v for v in mv_versions(spark, state_dir) if v < batch_id]
        if prev:
            state = spark.read.parquet(f"{state_dir}/v{prev[-1]}")
            merged = (
                state.unionByName(partial)
                .groupBy(key)
                .agg(
                    F.sum("n_events").cast("bigint").alias("n_events"),
                    F.sum("sum_dec").cast("decimal(20,6)").alias("sum_dec"),
                    F.max("max_ts").alias("max_ts"),
                )
            )
        else:
            merged = partial.select(
                key,
                "n_events",
                F.col("sum_dec").cast("decimal(20,6)").alias("sum_dec"),
                "max_ts",
            )
        merged.write.mode("overwrite").parquet(f"{state_dir}/v{batch_id}")

    w = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
    _start_and_drain(w, stream.sparkSession)


def read_mv_state(spark, state_dir: str) -> DataFrame:
    """The current MV view: the highest version ``run_streaming_mv_merge``
    wrote — a single key-sized read, no merge-on-read.  Versions resolve
    through the Hadoop FileSystem API (``mv_versions``) so the state dir
    may be any Hadoop-supported path."""
    versions = mv_versions(spark, state_dir)
    if not versions:
        raise FileNotFoundError(f"no MV versions under {state_dir}")
    return spark.read.parquet(f"{state_dir}/v{versions[-1]}")


def run_streaming_quality_gate(
    stream: DataFrame,
    checks: dict,
    out_dir: str,
    checkpoint: str,
) -> None:
    """Per-micro-batch data-quality gate (the streaming twin of
    plans.quality_queries.star_constraint_audit's column checks): every
    batch is split into ACCEPTED rows and QUARANTINED rows (any failing
    check, with the failing check names attached), and a constraint-sized
    AUDIT table is appended per batch — all three written under
    ``_batch_id=N`` partitions with dynamic overwrite, so a replayed
    batch overwrites itself (idempotent, effectively exactly-once).

    `checks` maps check name → violation predicate (Column<bool>), same
    contract as operators.quality.column_audit — the audit rows ARE that
    operator's output plus the batch id, so streaming and batch gates
    can never disagree on semantics.  At 100 TB/day this is the pattern
    that keeps corrupt crawl batches out of training data while
    preserving them (with reasons) for triage instead of dropping them.
    """
    from ..operators import quality as Q

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        # NULL predicate -> violation (coalesce to True), matching
        # column_audit's r6 NULL semantics: a NULL in a checked column is
        # a defect, and the accept/quarantine split must agree with the
        # audit counts riding the same batch (a NULL-swallowing accept
        # here would pass rows the audit table reports as violations).
        reasons = F.array_compact(
            F.array(
                *[
                    F.when(F.coalesce(pred, F.lit(True)), F.lit(name))
                    for name, pred in checks.items()
                ]
            )
        )
        classified = batch_df.withColumn("_reasons", reasons)
        accepted = classified.filter(F.size("_reasons") == 0).drop("_reasons")
        quarantined = classified.filter(F.size("_reasons") > 0).withColumn(
            "_reasons", F.concat_ws(",", "_reasons")
        )
        audit = Q.column_audit(batch_df, checks)
        for frame, sub in (
            (accepted, "accepted"),
            (quarantined, "quarantine"),
            (audit, "audit"),
        ):
            (
                frame.withColumn("_batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id")
                .parquet(f"{out_dir}/{sub}")
            )

    w = (
        stream.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
    _start_and_drain(w, stream.sparkSession)


def run_streaming_join_mv(
    stream: DataFrame,
    dim_path: str,
    state_dir: str,
    checkpoint: str,
    join_key: str = "user_id",
    attr: str = "segment",
) -> None:
    """JOIN-MV maintenance — the second streaming MV shape (VERDICT r5
    stretch): the maintained state is the stream ENRICHED by a dimension
    (stream-static join), aggregated per dimension attribute, with the
    dimension re-read from ``dim_path`` at EVERY micro-batch so a
    dimension change mid-stream is picked up by the next batch.

    Semantics are attribution-at-ingest: each event is attributed to the
    dimension row current WHEN THE BATCH WAS PROCESSED (the standard
    enrich-then-aggregate MV — replaying history against today's dim is
    a different, backfill-shaped job).  That makes the MV equal, by
    construction, to the union of per-batch (batch ⋈ dim_at_batch)
    aggregates — the batch-equality pin in tests/test_round6.py runs two
    phases with a dimension rewrite in between and checks exactly that.

    Mechanics shared with ``run_streaming_mv_merge``: per-batch partials
    fold map-side to attribute-sized frames; version ``v{b}`` is derived
    only from versions `` < b`` plus batch ``b``, so a crash-replayed
    batch rewrites its version byte-identically (idempotent); readers
    take the highest version (``read_mv_state``).  The dim re-read per
    batch is why the join lives in foreachBatch rather than the
    streaming plan: an unmanaged static DataFrame in the plan may cache
    its scan, silently freezing the dimension.  At 100 TB the dim side
    is broadcast-sized by contract (it is a dimension); state is
    attribute-sized — never fact-sized.  availableNow; blocks until
    drained."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        dim = spark.read.parquet(dim_path).select(join_key, attr)
        partial = (
            batch_df.join(F.broadcast(dim), join_key)
            .groupBy(attr)
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_dec"),
                F.max("ts").alias("max_ts"),
            )
        )
        prev = [v for v in mv_versions(spark, state_dir) if v < batch_id]
        if prev:
            state = spark.read.parquet(f"{state_dir}/v{prev[-1]}")
            merged = (
                state.unionByName(partial)
                .groupBy(attr)
                .agg(
                    F.sum("n_events").cast("bigint").alias("n_events"),
                    F.sum("sum_dec").cast("decimal(20,6)").alias("sum_dec"),
                    F.max("max_ts").alias("max_ts"),
                )
            )
        else:
            merged = partial.select(
                attr,
                "n_events",
                F.col("sum_dec").cast("decimal(20,6)").alias("sum_dec"),
                "max_ts",
            )
        merged.write.mode("overwrite").parquet(f"{state_dir}/v{batch_id}")

    w = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
    _start_and_drain(w, stream.sparkSession)


def run_streaming_checksum_mv(
    stream: DataFrame,
    state_dir: str,
    checkpoint: str,
    mod: int = 1_000_000_007,
) -> None:
    """Incrementally-maintained replica-audit checksums — the streaming
    form of the `orders_partition_checksums` manifest, possible because
    the modular md5 fold is MERGEABLE: (a + b) % m == ((a % m) + (b % m))
    % m, so each micro-batch contributes a per-month partial checksum
    that merges into stored state by modular addition.  A 100 TB table's
    audit manifest stays current at ingest cost (one month-keyed fold
    per batch), never by rescanning history — the property that makes
    continuous replica comparison affordable at all.

    Same idempotent versioning contract as ``run_streaming_mv_merge``:
    version ``v{b}`` is derived only from versions ``< b`` plus batch
    ``b``, so a replayed batch rewrites its version byte-identically
    instead of double-folding; readers take the highest version
    (``read_mv_state``).  State is month-sized.  availableNow; blocks
    until drained."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.metrics import partition_checksum

        spark = batch_df.sparkSession
        # the SHARED fold definition (operators.metrics.partition_checksum)
        # with the events key rendering — batch and streaming manifests
        # agree because they are literally the same expression
        key = F.concat(
            F.col("event_id").cast("string"),
            F.lit("|"),
            F.col("event_type"),
            F.lit("|"),
            F.date_format("ts", "yyyy-MM-dd"),
        )
        partial = partition_checksum(
            batch_df, F.date_format("ts", "yyyy-MM"), key, mod=mod
        ).withColumnRenamed("part", "month")
        prev = [x for x in mv_versions(spark, state_dir) if x < batch_id]
        if prev:
            state = spark.read.parquet(f"{state_dir}/v{prev[-1]}")
            merged = (
                state.unionByName(partial)
                .groupBy("month")
                .agg(
                    F.sum("n_rows").cast("bigint").alias("n_rows"),
                    (
                        F.sum(F.col("checksum").cast("decimal(38,0)"))
                        % F.lit(mod)
                    )
                    .cast("bigint")
                    .alias("checksum"),
                )
            )
        else:
            merged = partial
        merged.write.mode("overwrite").parquet(f"{state_dir}/v{batch_id}")

    w = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
    _start_and_drain(w, stream.sparkSession)


def run_streaming_phash_dedup(
    stream: DataFrame,
    out_dir: str,
    kept_dir: str,
    checkpoint: str,
    width: int = 8,
    height: int = 8,
) -> None:
    """Streaming perceptual-hash image dedup (VERDICT r7 stretch): the
    multimodal family's continuous-ingest twin — each micro-batch of
    image blobs is resized (Arrow mapInPandas), average-hashed to one
    BIGINT per image (operators.multimodal.phash_from_pixels), and
    triaged against every phash kept by STRICTLY EARLIER batches.

    Statuses per image: ``kept`` (first holder of its phash),
    ``dup_prior`` (phash already canonical from an earlier batch;
    ``canonical_id`` names it), ``dup_in_batch`` (another image in the
    SAME batch holds the lower media_id for this phash).  State is
    carried in storage exactly like ``run_streaming_semantic_dedup``:
    ``kept_dir`` holds (phash, media_id) per ``_batch_id`` partition and
    the ``_batch_id < batch_id`` cut + dynamic partition overwrite make
    replay idempotent — a re-run batch never sees its own prior output
    and rewrites identical partitions.

    Scale posture: after the hash the per-batch state join carries
    8 bytes per image; the kept-state side grows with DISTINCT images
    only.  Sequential equivalence with the batch-mode exact-phash dedup
    and replay idempotency are pinned in tests/test_round8.py.
    """
    from ..operators import multimodal as MM

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        spark = batch_df.sparkSession
        hashed = MM.phash_from_pixels(
            MM.resize_images(batch_df, width=width, height=height)
        ).persist()
        if hadoop_path_exists(spark, kept_dir):
            # a read failure past this point PROPAGATES — treating it as
            # "first batch" would silently reset the dedup state
            kept_prev = (
                spark.read.parquet(kept_dir)
                .filter(F.col("_batch_id") < batch_id)
                .select("phash", F.col("media_id").alias("_prior_id"))
            )
        else:  # first batch: kept_dir doesn't exist yet
            kept_prev = None
        w = Window.partitionBy("phash")
        ranked = hashed.withColumn(
            "_rk", F.row_number().over(w.orderBy("media_id"))
        ).withColumn("_batch_canon", F.min("media_id").over(w))
        joined = (
            ranked.join(kept_prev, "phash", "left")
            if kept_prev is not None
            else ranked.withColumn("_prior_id", F.lit(None).cast("long"))
        )
        st = joined.select(
            "media_id",
            "phash",
            F.when(F.col("_prior_id").isNotNull(), F.lit("dup_prior"))
            .when(F.col("_rk") > 1, F.lit("dup_in_batch"))
            .otherwise(F.lit("kept"))
            .alias("status"),
            F.coalesce("_prior_id", "_batch_canon").alias("canonical_id"),
        ).persist()
        (
            st.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_dir)
        )
        (
            st.filter(F.col("status") == "kept")
            .select("phash", "media_id")
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(kept_dir)
        )
        st.unpersist()
        hashed.unpersist()

    w = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
    _start_and_drain(w, stream.sparkSession)


def run_streaming_substring_decontaminate(
    stream: DataFrame,
    out_dir: str,
    gram_dir: str,
    checkpoint: str,
    k: int = 10,
) -> None:
    """Streaming span-level decontamination (the continuous-ingest twin of
    docs_substring_decontaminate): each micro-batch of documents is
    screened against the gram-hash index of every STRICTLY EARLIER batch —
    maximal spans whose every k-gram was already ingested are located and
    measured — then the batch's own distinct gram hashes join the index.

    Output per doc per batch: ``(doc_id, n_tokens, n_spans, cut_tokens)``
    (zero-span docs included — the loader's per-doc cut budget).  State is
    carried in storage exactly like ``run_streaming_phash_dedup``:
    ``gram_dir`` holds distinct gram hashes per ``_batch_id`` partition,
    the ``_batch_id < batch_id`` cut + dynamic partition overwrite make
    replay idempotent.  The first batch sees an empty index (no spans) —
    by design: nothing was ingested before it.

    Scale posture: the index carries ONE bigint per distinct corpus gram;
    the probe is a semi-join on h (linear in batch grams, no pair join);
    the islands merge windows per batch doc only.
    """
    from ..functions import textfns as TF
    from ..operators import pipeline as PL

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        grams = PL.positional_gram_hashes(batch_df, k).persist()
        if hadoop_path_exists(spark, gram_dir):
            # a read failure here PROPAGATES — treating it as "first
            # batch" would silently reset the decontamination index
            prior = (
                spark.read.parquet(gram_dir)
                .filter(F.col("_batch_id") < batch_id)
                .select("h")
            )
            spans = PL.substring_spans_vs_corpus(
                batch_df, k=k, corpus_grams=prior
            )
            per_doc = spans.groupBy("doc_id").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_spans"),
                F.sum("span_tokens").cast("bigint").alias("cut_tokens"),
            )
        else:  # first batch: nothing ingested before it
            per_doc = None
        base = batch_df.select(
            "doc_id", F.size(TF.tokens("text")).cast("bigint").alias("n_tokens")
        )
        joined = (
            base.join(per_doc, "doc_id", "left")
            if per_doc is not None
            else base.withColumn("n_spans", F.lit(None).cast("bigint"))
            .withColumn("cut_tokens", F.lit(None).cast("bigint"))
        )
        out = joined.select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
            F.coalesce("cut_tokens", F.lit(0)).cast("bigint").alias(
                "cut_tokens"
            ),
        )
        (
            out.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_dir)
        )
        (
            grams.select("h")
            .distinct()
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(gram_dir)
        )
        grams.unpersist()

    w = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
    _start_and_drain(w, stream.sparkSession)


def run_streaming_gap_moments(
    stream: DataFrame,
    state_dir: str,
    checkpoint: str,
) -> None:
    """Continuously-maintained per-user inter-event gap moments — the
    streaming form of the bot-regularity surface (`events_bot_users`),
    possible because gap moments are MERGEABLE: carrying
    ``(n_events, n_gaps, Σg, Σg², first_ts, last_ts)`` per user lets two
    time-ordered slices merge exactly — the only cross-slice term is the
    junction gap (prev.last_ts → batch.first_ts), added once to each sum.
    A 100 TB interaction log's bot scores stay current at ingest cost
    (one user-keyed aggregate per batch), never by rescanning history.

    Requires time-ordered arrival per user across batches (standard for
    log ingest; the catalog fixture splits by global time ntiles).  Sums
    are DECIMAL(38,0) — Σg² reaches ~10²⁸ µs² on long spans.  Same
    idempotent versioning contract as ``run_streaming_checksum_mv``:
    version ``v{b}`` derives only from versions ``< b`` plus batch ``b``,
    so a replayed batch rewrites byte-identically.  availableNow; blocks
    until drained."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        g = batch_df.select("user_id", "ts", "event_id").withColumn(
            "_gap",
            F.expr(
                "CAST(timestampdiff(MICROSECOND,"
                " lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),"
                " ts) AS BIGINT)"
            ),
        )
        partial = g.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.count("_gap").cast("bigint").alias("n_gaps"),
            F.expr(
                "CAST(COALESCE(SUM(CAST(_gap AS DECIMAL(19,0))), 0)"
                " AS DECIMAL(38,0))"
            ).alias("s"),
            F.expr(
                "CAST(COALESCE(SUM(CAST(_gap AS DECIMAL(19,0)) * _gap), 0)"
                " AS DECIMAL(38,0))"
            ).alias("s2"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        prev = [x for x in mv_versions(spark, state_dir) if x < batch_id]
        if prev:
            state = spark.read.parquet(f"{state_dir}/v{prev[-1]}")
            j = state.alias("p").join(
                partial.alias("b"), "user_id", "full_outer"
            )
            junction = (
                "CASE WHEN p.last_ts IS NOT NULL AND b.first_ts IS NOT NULL"
                " THEN CAST(timestampdiff(MICROSECOND, p.last_ts, b.first_ts)"
                " AS DECIMAL(19,0)) END"
            )
            merged = j.select(
                "user_id",
                F.expr(
                    "COALESCE(p.n_events, 0) + COALESCE(b.n_events, 0)"
                ).cast("bigint").alias("n_events"),
                F.expr(
                    "COALESCE(p.n_gaps, 0) + COALESCE(b.n_gaps, 0)"
                    f" + CASE WHEN {junction} IS NOT NULL THEN 1 ELSE 0 END"
                ).cast("bigint").alias("n_gaps"),
                F.expr(
                    "CAST(COALESCE(p.s, 0) + COALESCE(b.s, 0)"
                    f" + COALESCE({junction}, 0) AS DECIMAL(38,0))"
                ).alias("s"),
                F.expr(
                    "CAST(COALESCE(p.s2, 0) + COALESCE(b.s2, 0)"
                    f" + COALESCE({junction} * {junction}, 0)"
                    " AS DECIMAL(38,0))"
                ).alias("s2"),
                F.expr("COALESCE(p.first_ts, b.first_ts)").alias("first_ts"),
                F.expr("COALESCE(b.last_ts, p.last_ts)").alias("last_ts"),
            )
        else:
            merged = partial
        merged.write.mode("overwrite").parquet(f"{state_dir}/v{batch_id}")

    w = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
    _start_and_drain(w, stream.sparkSession)


def run_streaming_model_scoring(
    stream: DataFrame,
    score_fn,
    out_dir: str,
    checkpoint: str,
) -> None:
    """Model serving at ingest (r10): score every micro-batch with a
    PREBUILT model — ``score_fn`` is a caller-supplied closure
    ``batch_df -> scored_df`` wrapping the offline-trained model (the
    production split: training is an offline job, the stream only runs
    ``transform``).  Each batch's scores land under ``_batch_id=N``
    partitions with dynamic overwrite, so a replayed batch overwrites
    itself — the same idempotent exactly-once discipline as every other
    foreachBatch job in this module.

    The model rides the closure (driver-resident, broadcast to executors
    by Spark's task serialization exactly as in batch ``transform``);
    nothing is re-fit per batch, so per-batch cost is one narrow scoring
    pass over the batch.

    ``score_fn`` may return either the scored frame, or a
    ``(scored, scratch)`` tuple where ``scratch`` lists internally
    persisted per-batch frames — they are unpersisted after the batch's
    write completes, so a probe that caches a batch-derived frame (a
    distinct plan every micro-batch, un-dedupable by the CacheManager)
    does not leak one cache entry per batch for the stream's lifetime
    (ADVICE r13)."""

    def score(batch_df: DataFrame, batch_id: int) -> None:
        res = score_fn(batch_df)
        scored, scratch = res if isinstance(res, tuple) else (res, [])
        (
            scored
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_dir)
        )
        for frame in scratch:
            frame.unpersist()

    w = (
        stream.writeStream.foreachBatch(score)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
    _start_and_drain(w, stream.sparkSession)


def run_streaming_cusum(
    stream: DataFrame,
    target_u: int,
    slack_u: int,
    threshold_u: int,
    state_dir: str,
    checkpoint: str,
) -> None:
    """Continuously-maintained per-user two-sided CUSUM — the streaming
    form of ``events_cusum_drift``, possible because the prefix-min
    closed form s_i = c_i − min(0, min_{j≤i} c_j) carries across
    time-ordered slices with O(1) state per user and side:
    ``(c_last, m)`` where ``m = min(0, min prefix c) ≤ 0``.  For a batch
    whose LOCAL running sum/min (computed by the same two stacked
    windows as the batch entry) are (lc_i, lmin_i), the global values
    are c_i = c_last + lc_i and m_i = min(m_prev, c_last + lmin_i) — so
    every event's exact excursion and alarm flag come out at per-batch
    ingest cost, never a history rescan, and the drained state is
    batch-split-INVARIANT (what lets the catalog entry carry the batch
    computation's FULL value oracle).

    The target is FROZEN (a prebuilt offline scalar, the model-serving
    convention — a drifting target would chase its own signal).
    Requires time-ordered arrival per user across batches (standard
    log-ingest; the fixture splits by global ts ntiles).  Same
    idempotent versioning contract as ``run_streaming_gap_moments``:
    ``v{b}`` derives only from versions < b plus batch b, so a replayed
    batch rewrites byte-identically."""
    from pyspark.sql import Window

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        w = (
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        v = batch_df.select(
            "event_id",
            "user_id",
            "ts",
            F.expr("CAST(FLOOR(value * 1000000) AS BIGINT)").alias("v_u"),
        )
        loc = v.select(
            "event_id",
            "user_id",
            "ts",
            F.sum(F.col("v_u") - F.lit(target_u) - F.lit(slack_u))
            .over(w)
            .alias("lc_pos"),
            F.sum(F.lit(target_u) - F.col("v_u") - F.lit(slack_u))
            .over(w)
            .alias("lc_neg"),
        ).select(
            "*",
            F.min("lc_pos").over(w).alias("lmin_pos"),
            F.min("lc_neg").over(w).alias("lmin_neg"),
        )
        prev_versions = [
            x for x in mv_versions(spark, state_dir) if x < batch_id
        ]
        prev = (
            spark.read.parquet(f"{state_dir}/v{prev_versions[-1]}")
            if prev_versions
            else None
        )
        carry_cols = [
            "c_last_pos", "m_pos", "c_last_neg", "m_neg",
            "n_events", "max_pos_u", "max_neg_u",
            "n_alarm_events", "first_alarm_event_id",
        ]
        if prev is None:
            prev = spark.createDataFrame(
                [],
                "user_id bigint, c_last_pos bigint, m_pos bigint,"
                " c_last_neg bigint, m_neg bigint, n_events bigint,"
                " max_pos_u bigint, max_neg_u bigint,"
                " n_alarm_events bigint, first_alarm_event_id bigint",
            )
        carry = prev.select(
            "user_id", *[F.col(c).alias(f"_p_{c}") for c in carry_cols]
        )
        ev = (
            loc.join(carry, "user_id", "left")
            .withColumn(
                "c_pos",
                F.coalesce(F.col("_p_c_last_pos"), F.lit(0))
                + F.col("lc_pos"),
            )
            .withColumn(
                "c_neg",
                F.coalesce(F.col("_p_c_last_neg"), F.lit(0))
                + F.col("lc_neg"),
            )
            .withColumn(
                "m_pos_i",
                F.least(
                    F.coalesce(F.col("_p_m_pos"), F.lit(0)),
                    F.coalesce(F.col("_p_c_last_pos"), F.lit(0))
                    + F.col("lmin_pos"),
                ),
            )
            .withColumn(
                "m_neg_i",
                F.least(
                    F.coalesce(F.col("_p_m_neg"), F.lit(0)),
                    F.coalesce(F.col("_p_c_last_neg"), F.lit(0))
                    + F.col("lmin_neg"),
                ),
            )
            .withColumn("s_pos", F.col("c_pos") - F.col("m_pos_i"))
            .withColumn("s_neg", F.col("c_neg") - F.col("m_neg_i"))
        )
        alarm = (F.col("s_pos") >= threshold_u) | (
            F.col("s_neg") >= threshold_u
        )
        ordk = F.struct(F.col("ts"), F.col("event_id"))
        delta = ev.groupBy("user_id").agg(
            F.max_by(F.col("c_pos"), ordk).alias("_b_c_last_pos"),
            F.min("m_pos_i").alias("_b_m_pos"),
            F.max_by(F.col("c_neg"), ordk).alias("_b_c_last_neg"),
            F.min("m_neg_i").alias("_b_m_neg"),
            F.count(F.lit(1)).cast("bigint").alias("_b_n"),
            F.max("s_pos").cast("bigint").alias("_b_max_pos"),
            F.max("s_neg").cast("bigint").alias("_b_max_neg"),
            F.sum(F.when(alarm, 1).otherwise(0))
            .cast("bigint")
            .alias("_b_al"),
            # earliest alarm by (ts, event_id) — matches the batch
            # detector; cross-batch composition is chronological by the
            # time-ordered-arrival contract
            F.min(F.when(alarm, F.struct(F.col("ts"), F.col("event_id"))))[
                "event_id"
            ].alias("_b_first"),
        )
        merged = (
            prev.join(delta, "user_id", "full_outer")
            .select(
                "user_id",
                F.coalesce("_b_c_last_pos", "c_last_pos").alias(
                    "c_last_pos"
                ),
                F.coalesce("_b_m_pos", "m_pos").alias("m_pos"),
                F.coalesce("_b_c_last_neg", "c_last_neg").alias(
                    "c_last_neg"
                ),
                F.coalesce("_b_m_neg", "m_neg").alias("m_neg"),
                (
                    F.coalesce("n_events", F.lit(0))
                    + F.coalesce("_b_n", F.lit(0))
                ).alias("n_events"),
                F.greatest(
                    F.coalesce("max_pos_u", F.lit(0)),
                    F.coalesce("_b_max_pos", F.lit(0)),
                ).alias("max_pos_u"),
                F.greatest(
                    F.coalesce("max_neg_u", F.lit(0)),
                    F.coalesce("_b_max_neg", F.lit(0)),
                ).alias("max_neg_u"),
                (
                    F.coalesce("n_alarm_events", F.lit(0))
                    + F.coalesce("_b_al", F.lit(0))
                ).alias("n_alarm_events"),
                F.coalesce(
                    "first_alarm_event_id", "_b_first"
                ).alias("first_alarm_event_id"),
            )
        )
        merged.coalesce(1).write.mode("overwrite").parquet(
            f"{state_dir}/v{batch_id}"
        )

    w = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
    _start_and_drain(w, stream.sparkSession)


def stage_microbatches(cache: dict, key: str, frames, prefix: str) -> str:
    """Write each frame in ``frames`` as ONE parquet file under a flat
    staging dir with strictly increasing mtimes — the file-source
    micro-batch fixture every ``stream_*`` twin drives (maxFilesPerTrigger
    1 replays them in mtime order).  ``cache`` is the caller's module
    dict keyed by ``key`` (reruns reuse the staged corpus); cleanup is
    registered atexit on first use.  Factored from the five per-entry
    copies of this scaffold (r10b review finding)."""
    import atexit
    import os
    import shutil
    import tempfile

    work = cache.get(key)
    if work is not None:
        return f"{work}/batches"
    work = tempfile.mkdtemp(prefix=prefix)
    try:
        in_dir = f"{work}/in"
        flat = f"{work}/batches"
        os.makedirs(flat)
        for i, frame in enumerate(frames):
            frame.coalesce(1).write.parquet(f"{in_dir}/b{i}")
            for fn in os.listdir(f"{in_dir}/b{i}"):
                if fn.endswith(".parquet"):
                    dst = f"{flat}/batch_{i}.parquet"
                    shutil.copyfile(f"{in_dir}/b{i}/{fn}", dst)
                    os.utime(dst, (1_600_000_000 + i, 1_600_000_000 + i))
    except BaseException:
        shutil.rmtree(work, ignore_errors=True)
        raise
    if not cache:
        atexit.register(
            lambda: [
                shutil.rmtree(d, ignore_errors=True) for d in cache.values()
            ]
        )
    cache[key] = work
    return flat
