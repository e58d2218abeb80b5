"""Structured Streaming jobs: drain with availableNow → memory sink, diff
against the batch twin (SURVEY §2.11 extension surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.sources import (
    readers,
)
from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.streaming import (
    jobs as SJ,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events_stream(spark):
    return SJ.read_events_stream(spark, SF)


@pytest.fixture(scope="module")
def events_batch(spark):
    # load_table handles the TIMESTAMP(NANOS) parquet; cast matches the
    # stream reader's LTZ event-time type
    df = readers.load_table(spark, SF, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return df.cache()


def _drain(spark, stream, name, mode="append"):
    SJ.run_to_memory(stream, name, output_mode=mode)
    return spark.table(name)


def test_windowed_counts_matches_batch(spark, events_stream, events_batch):
    out = _drain(spark, SJ.windowed_counts(events_stream), "t_wincounts")
    batch = (
        events_batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    # availableNow + append emits exactly the closed windows; all windows
    # close once the source is exhausted except those above the final
    # watermark. Compare on the intersection-complete prefix:
    max_wm = out.agg(F.max("window_end")).first()[0]
    b = batch.filter(F.col("window_end") <= max_wm)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, b.collect()))
    assert out.count() > 0


def test_session_windows_stream_runs(spark, events_stream):
    out = _drain(spark, SJ.session_windows(events_stream), "t_sessions")
    assert set(out.columns) == {
        "user_id", "session_start", "session_end", "n_events", "sum_value",
    }
    # sessions are non-empty and well-ordered
    bad = out.filter(
        (F.col("n_events") <= 0) | (F.col("session_end") < F.col("session_start"))
    ).count()
    assert bad == 0 and out.count() > 0


def test_dedup_within_watermark(spark, events_batch, tmp_path):
    # duplicate the source: same events twice → streaming dedup keeps one
    dup_dir = str(tmp_path / "dup_events")
    events_batch.union(events_batch).repartition(4).write.parquet(dup_dir)
    schema = events_batch.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dup_dir)
    )
    # horizon must cover the fixture's full time span: with a short
    # watermark, rows in later files that are older than (max seen ts -
    # horizon) are dropped as late data before dedup sees them
    out = _drain(
        spark,
        SJ.dedup_within_watermark(stream, keys=("event_id",), watermark="365 days"),
        "t_dedup",
    )
    n_unique = events_batch.select("event_id").distinct().count()
    got = out.select("event_id").distinct().count()
    assert got == n_unique
    # each id exactly once (within-watermark exactness holds here: all dups
    # arrive inside the horizon because the whole fixture spans < watermark
    # OR dups are co-batched; assert no id appears twice)
    assert out.groupBy("event_id").count().filter("count > 1").count() == 0


def test_checkpoint_recovery_exactly_once(spark, events_batch, tmp_path):
    """Crash-resume exactly-once (VERDICT r2 item 6): a foreachBatch sink
    crashes AFTER writing a micro-batch but BEFORE the offset commit — the
    worst-case partial-failure point.  Restarting from the same checkpoint
    replays that batch; the dynamic-partition-overwrite sink replaces its
    own _batch_id partition instead of appending, so the recovered output
    equals the source exactly: nothing lost, nothing duplicated."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    events_batch.repartition(4).write.parquet(src)
    total = events_batch.count()

    crash_armed = {"armed": True}

    def write_batch(batch_df, batch_id):
        (
            batch_df.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out)
        )
        if batch_id == 1 and crash_armed["armed"]:
            crash_armed["armed"] = False
            raise RuntimeError("injected crash: batch written, offset not committed")

    def drain():
        stream = (
            spark.readStream.schema(events_batch.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    with pytest.raises(StreamingQueryException):
        drain()
    # batch 1's files exist in the sink but its offset never committed
    drain()  # resume: replays batch 1 (overwriting its partition), then 2-3

    got = spark.read.parquet(out)
    assert got.count() == total
    assert got.select("event_id").distinct().count() == total


def test_running_user_stats_state(spark, events_stream, events_batch):
    out = _drain(
        spark, SJ.running_user_stats(events_stream), "t_runstats", mode="update"
    )
    # final state per user (last update emitted) == batch aggregate
    final = (
        out.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("user_id").orderBy(F.col("n_events").desc())
            ),
        )
        .filter("rn = 1")
        .drop("rn")
    )
    batch = events_batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
        F.max("ts").alias("max_ts"),
    )
    diff = final.join(batch, "user_id").filter(
        (final.n_events != batch.n_events)
        | (F.abs(final.total_value - batch.total_value) > 1e-6)
    )
    assert diff.count() == 0
    assert final.count() == batch.count()


def test_streaming_quality_gate_quarantines_corrupt_batch(spark, tmp_path):
    """Two micro-batches — one clean, one with nulls and a bad type —
    must split into accepted/quarantined with reasons, keep
    accepted+quarantined == input per batch, and replay idempotently."""
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.plans.streaming_queries import (  # noqa: E501
        EVENT_GATE_CHECKS,
    )
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.streaming import (  # noqa: E501
        jobs as SJ,
    )

    schema = "event_id bigint, user_id bigint, event_type string, value double"
    clean = [(1, 10, "click", 1.0), (2, 11, "view", 2.0)]
    dirty = [
        (3, None, "click", 3.0),          # null user
        (4, 12, "teleport", 4.0),         # bad type
        (5, None, "teleport", None),      # all three violated
        (6, 13, "purchase", 6.0),         # clean row in a dirty batch
    ]
    src = tmp_path / "in"
    spark.createDataFrame(clean, schema).coalesce(1).write.parquet(
        str(src / "b0")
    )
    spark.createDataFrame(dirty, schema).coalesce(1).write.parquet(
        str(src / "b1")
    )
    # flatten into one dir; mtime order pins batch order
    import os
    import shutil
    import time

    flat = tmp_path / "flat"
    flat.mkdir()
    for i, sub in enumerate(["b0", "b1"]):
        for f in (src / sub).glob("*.parquet"):
            dst = flat / f"{sub}.parquet"
            shutil.copy(f, dst)
            os.utime(dst, (time.time() - 100 + i, time.time() - 100 + i))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    checks = {n: mk() for n, mk in EVENT_GATE_CHECKS.items()}
    SJ.run_streaming_quality_gate(stream, checks, out, ckpt)

    acc = spark.read.parquet(f"{out}/accepted")
    quar = spark.read.parquet(f"{out}/quarantine")
    audit = spark.read.parquet(f"{out}/audit")

    assert sorted(r.event_id for r in acc.collect()) == [1, 2, 6]
    qrows = {r.event_id: r for r in quar.collect()}
    assert sorted(qrows) == [3, 4, 5]
    assert qrows[3]["_reasons"] == "events.user_not_null"
    assert qrows[4]["_reasons"] == "events.type_domain"
    assert set(qrows[5]["_reasons"].split(",")) == set(EVENT_GATE_CHECKS)
    # conservation per batch: accepted + quarantined == input
    assert acc.count() + quar.count() == 6
    # audit: one row per check per batch, counts match the split
    a = {
        (r.check_name, r._batch_id): r.n_violations for r in audit.collect()
    }
    assert a[("events.user_not_null", 0)] == 0
    assert a[("events.user_not_null", 1)] == 2
    assert a[("events.type_domain", 1)] == 2
    assert a[("events.value_not_null", 1)] == 1

    # replay idempotence: drained source -> rerun adds nothing, rows stable
    SJ.run_streaming_quality_gate(
        (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(flat))
        ),
        checks,
        out,
        ckpt,
    )
    assert spark.read.parquet(f"{out}/accepted").count() == 3
    assert spark.read.parquet(f"{out}/quarantine").count() == 3
    assert spark.read.parquet(f"{out}/audit").count() == 6  # 3 checks x 2
