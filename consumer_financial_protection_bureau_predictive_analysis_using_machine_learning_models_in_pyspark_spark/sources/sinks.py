"""Sinks (SURVEY §2.1 S3/S4).

The reference only ever ``show()``s or collects to pandas/NumPy on the
driver.  At 100 TB the canonical sink is partitioned Parquet; the pandas
hop stays, but only for final small results (metrics tables, confusion
matrices, feature importances).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Partitioned Parquet sink.

    ``partition_by`` should be a low-cardinality column (e.g. year/month of
    date_received) so partition pruning serves the dominant filter; pair with
    ``maxRecordsPerFile`` to bound file sizes at scale.
    """
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int = 32,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (``bucketBy`` + ``saveAsTable``).

    Two tables bucketed by the same key into the same bucket count join
    WITHOUT a shuffle (Spark reuses the bucketing as the join
    distribution) — the pre-pay-once answer for fact tables that join on
    the same key every day at 100 TB.  ``sortBy`` additionally removes the
    in-partition sort from sort-merge joins.
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def to_pandas_small(df: DataFrame, limit: int = 100_000):
    """Driver-side collect for *final small results only* (S4).

    Guard-railed: refuses anything larger than ``limit`` rows so a
    misrouted 100 TB frame can't flatten the driver.
    """
    n = df.limit(limit + 1).count()
    if n > limit:
        raise ValueError(
            f"to_pandas_small: result has >{limit} rows; write_parquet instead"
        )
    return df.toPandas()


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
) -> None:
    """CSV sink for interchange with non-columnar consumers.  Spark's
    writer quotes embedded delimiters/quotes; doubles render in
    shortest-round-trip form, so numeric values survive the text hop
    bit-exactly (proven by the csv_roundtrip_customer oracle).  CSV is an
    interchange format here, not a canonical store — at 100 TB the
    canonical store is partitioned Parquet."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    """ORC sink for interchange with Hive/Trino-side consumers.  ORC is
    columnar with per-stripe min-max statistics, so the engine's skipping
    posture survives the format hop (unlike CSV); values are binary, so
    numerics round-trip exactly by construction.  Zstd-compressed —
    Spark 4's default ORC codec tier for warm data."""
    w = df.write.mode(mode).option("compression", "zstd")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
