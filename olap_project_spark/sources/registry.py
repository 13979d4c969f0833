"""Table loading + catalog registration for the driver's star schema.

``spark.read.parquet(dir)`` subsumes the reference's hand-rolled WebHDFS
recursive listing / per-file pyarrow reads / partition-value regex
recovery (S4-S6, bigquery_update_scheduler.py:59-148 — SURVEY.md §2.1):
Spark's datasource does recursive discovery, footer-parallel schema
reads, and partition-column materialization natively, with predicate
pushdown and partition pruning handled by Catalyst.

Timestamp normalization: the driver's ``events.ts`` has shipped in
three parquet physical forms across rounds, and the engine accepts all
of them, always surfacing plain ``TimestampType``:

- ``INT64 TIMESTAMP(NANOS)`` (unrepresentable in Spark): with
  ``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives as long
  nanoseconds → floor-divide to µs (identical to DuckDB's ns→µs cast
  truncation, so oracle comparisons agree) → ``timestamp_micros``.
- ``timestamp[us]`` (isAdjustedToUTC=false): Spark 4 reads it as
  ``TIMESTAMP_NTZ``, which breaks ``withWatermark`` and numeric casts →
  cast to ``TimestampType``. Under the engine's UTC session timezone the
  wall-clock fields are preserved, matching DuckDB's TIMESTAMP.
- ``timestamp[us, UTC]``: already ``TimestampType``; pass through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

from olap_project_spark.schemas import STAR_TABLES

# Columns known to be timestamps in the driver testdata (the physical
# parquet form has drifted between rounds; see module docstring).
_NANOS_TS_COLUMNS = {"events": ["ts"]}


def normalize_timestamps(df: DataFrame, ns_long_cols: list[str] = ()) -> DataFrame:
    """Coerce every timestamp-ish column to plain ``TimestampType``.

    ``ns_long_cols`` names columns that may be INT64(NANOS)-as-long;
    any ``TIMESTAMP_NTZ`` column (regardless of name) is cast to
    ``TimestampType`` — the engine's session timezone is UTC, so the
    cast is wall-clock-preserving and oracle-stable.
    """
    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
        elif field.name in ns_long_cols and isinstance(field.dataType, LongType):
            # long ns → µs (integer div — float division would lose
            # precision above 2^53 ns) → TimestampType; matches DuckDB's
            # CAST(ts_ns AS TIMESTAMP) truncation.
            df = df.withColumn(
                field.name, F.timestamp_micros(F.expr(f"`{field.name}` div 1000"))
            )
    return df


def load_table(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Scan one table; normalize timestamp columns to TimestampType.

    Safe under any session: the nanosAsLong conf is set at call time so
    driver-owned sessions (which may lack our builder) still read, and
    the session timezone is pinned to UTC — the NTZ→TimestampType cast
    below is wall-clock-preserving only under UTC, so a driver session
    running in another zone would otherwise shift every epoch-derived
    value (``ts.cast('double')``, ``unix_micros``, streaming windows)
    away from the DuckDB oracle.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    return normalize_timestamps(df, _NANOS_TS_COLUMNS.get(table, []))


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register every star-schema table as a temp view so
    ``spark.sql(...)`` works against the same catalog names DuckDB uses."""
    for t in STAR_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
