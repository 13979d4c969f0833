"""Batch raw-transaction sources (SURVEY.md §2.1 S1): schema-pinned CSV
and JSON-lines readers for the POS feed, plus the producer's
timestamp-synthesis transform (P18) for files that lack the event
timestamp.

The explicit schema matters doubly at scale: no inference pass over
the data, and the special-character headers (``Use Chip``, ``Errors?``,
``Is Fraud?``) bind positionally-safe."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olap_project_spark.schemas import RAW_TRANSACTION_SCHEMA


def read_raw_csv(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.option("header", True)
        .schema(RAW_TRANSACTION_SCHEMA)
        .csv(path)
    )


def read_raw_json(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(RAW_TRANSACTION_SCHEMA).json(path)


def synthesize_timestamp(raw: DataFrame) -> DataFrame:
    """Producer behavior P18 (pos_simulator.py:79-110): event timestamp
    from the CSV calendar + time-of-day, ISO-8601. Null-safe: missing
    components leave the timestamp null (→ invalid routing)."""
    return raw.withColumn(
        "timestamp",
        F.when(
            F.col("Year").isNotNull()
            & F.col("Month").isNotNull()
            & F.col("Day").isNotNull()
            & F.col("Time").isNotNull(),
            F.format_string("%04d-%02d-%02dT%s", "Year", "Month", "Day", "Time"),
        ),
    )
