"""Table loading + catalog registration for the driver's star schema.

``spark.read.parquet(dir)`` subsumes the reference's hand-rolled WebHDFS
recursive listing / per-file pyarrow reads / partition-value regex
recovery (S4-S6, bigquery_update_scheduler.py:59-148 — SURVEY.md §2.1):
Spark's datasource does recursive discovery, footer-parallel schema
reads, and partition-column materialization natively, with predicate
pushdown and partition pruning handled by Catalyst.

Nanosecond caveat: the driver's ``events`` table stores
``INT64 TIMESTAMP(NANOS)``, which Spark cannot represent. With
``spark.sql.legacy.parquet.nanosAsLong=true`` the column arrives as long
nanoseconds; we convert to µs ``TimestampType`` here (floor division —
identical to DuckDB's ns→µs cast truncation, so oracle comparisons
agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from olap_project_spark.schemas import STAR_TABLES

# Columns known to be nanosecond timestamps in the driver testdata.
_NANOS_TS_COLUMNS = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Scan one table; normalize ns-timestamp columns to TimestampType.

    Safe under any session: the nanosAsLong conf is set at call time so
    driver-owned sessions (which may lack our builder) still read.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    for col in _NANOS_TS_COLUMNS.get(table, []):
        if col in df.columns and isinstance(df.schema[col].dataType, LongType):
            # long ns → µs (integer div — float division would lose
            # precision above 2^53 ns) → TimestampType; matches DuckDB's
            # CAST(ts_ns AS TIMESTAMP) truncation.
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register every star-schema table as a temp view so
    ``spark.sql(...)`` works against the same catalog names DuckDB uses."""
    for t in STAR_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
