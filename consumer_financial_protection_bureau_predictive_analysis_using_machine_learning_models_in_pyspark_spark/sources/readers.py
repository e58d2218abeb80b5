"""Sources (SURVEY §2.1, S1/S2).

The reference's only source is inferred-schema NDJSON (reference init.py:13,
timely_LR.py:31).  The engine reads Parquet as the canonical columnar store
(vectorized reader, row-group pruning, pushed filters) and keeps a
schema-pinned PERMISSIVE JSON reader for reference parity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .. import schemas


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated parquet table (TESTDATA.md)."""
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# TIMESTAMP_NTZ epoch reconstruction from int64 nanoseconds, truncating to
# microseconds exactly like DuckDB/Arrow do.  Split into whole seconds +
# microsecond remainder so every double stays exactly representable.
_NS_TO_NTZ = (
    "TIMESTAMP_NTZ '1970-01-01 00:00:00'"
    " + make_dt_interval(0, 0, 0, CAST(ts DIV 1000000000 AS DOUBLE))"
    " + make_dt_interval(0, 0, 0, CAST((ts % 1000000000) DIV 1000 AS DOUBLE) / 1000000.0)"
)


_EVENTS_TS_IS_NANOS: dict[str, bool] = {}


def _events_ts_is_nanos(path: str) -> bool:
    """Sniff the parquet footer (metadata-only read) for the ts encoding.

    Early driver datasets wrote ts as TIMESTAMP(NANOS) — which Spark's
    reader rejects outright ([PARQUET_TYPE_ILLEGAL]) — while current ones
    write plain TIMESTAMP(MICROS).  Detecting from the footer keeps one
    loader working against both vintages with no session conf.
    """
    if path not in _EVENTS_TS_IS_NANOS:
        import pyarrow.parquet as pq

        t = pq.read_schema(path).field("ts").type
        _EVENTS_TS_IS_NANOS[path] = str(t) in ("int64", "timestamp[ns]")
    return _EVENTS_TS_IS_NANOS[path]


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    path = os.path.join(sf_dir, "events.parquet")
    if not _events_ts_is_nanos(path):
        return spark.read.parquet(path)
    raw = spark.read.schema(schemas.EVENTS_RAW_SCHEMA).parquet(path)
    return raw.withColumn("ts", F.expr(_NS_TO_NTZ))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in schemas.TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for the SQL front end."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def read_complaints_json(spark: SparkSession, path: str) -> DataFrame:
    """Reference-parity complaints reader (S1).

    The reference uses ``spark.read.json(path)`` with schema inference and
    keeps ``_corrupt_record`` (reference init.py:13, timely_LR.py:31,
    decision_tree_final_class_8.py:47).  Inference is a full extra data pass,
    so the engine pins the schema and keeps PERMISSIVE corrupt-record capture
    for the same bad-row semantics.
    """
    return (
        spark.read.schema(schemas.COMPLAINTS_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", schemas.CORRUPT_COL)
        .json(path)
    )


def read_orc(spark: SparkSession, path: str):
    """ORC scan.  Schema rides in the file footer (no inference pass);
    predicate pushdown and column pruning reach the stripe level exactly
    as with Parquet, so plans over ORC inputs keep the same PushedFilters
    / ReadSchema shape (proven by the orc_roundtrip_part oracle)."""
    return spark.read.orc(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema,
    header: bool = True,
    mode: str = "PERMISSIVE",
):
    """CSV scan with an EXPLICIT schema (inference costs an extra full
    pass and can mis-type sparse columns — same discipline as the JSON
    reader) and PERMISSIVE malformed-row handling."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", mode)
        .csv(path)
    )
