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


# --------------------------------------------------------------------------
# Generic warehouse table IO — one dispatcher per direction so every
# query/export path speaks every columnar+text format Spark ships with
# --------------------------------------------------------------------------

# Formats bundled with a stock Spark distribution. Avro ships as an
# external package (org.apache.spark:spark-avro); it is dispatched when
# present and reported clearly when not.
BUNDLED_FORMATS = ("parquet", "orc", "csv", "json")


def write_table(df: DataFrame, path: str, fmt: str = "parquet", *,
                mode: str = "overwrite", partition_by: list[str] | None = None,
                compression: str | None = None) -> None:
    """Write ``df`` at ``path`` in any supported format.

    Columnar formats (parquet/ORC) keep statistics + predicate-pushdown
    ability; text formats (CSV/JSON) exist for interchange, cost a full
    re-parse on read, and lose types (CSV) — the engine's own sinks are
    columnar, matching the reference's parquet fact store
    (spark_streaming_consumer.py:306-332)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if compression:
        w = w.option("compression", compression)
    if fmt == "csv":
        w = w.option("header", True)
    w.format(fmt).save(path)


def read_table(spark: SparkSession, path: str, fmt: str = "parquet",
               schema=None) -> DataFrame:
    """Read a table written by :func:`write_table`. Partition-directory
    columns are recovered automatically for every format (Spark
    partition discovery — SURVEY.md §2.1 S6 for free). An explicit
    ``schema`` skips inference (required for typed CSV/JSON at scale;
    columnar formats carry their own)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        r = r.option("header", True)
        if schema is None:
            r = r.option("inferSchema", True)
    return r.format(fmt).load(path)
