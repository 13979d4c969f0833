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


_FOOTER_SCHEMA_CACHE: dict[tuple[str, str], "object"] = {}


def _arrow_to_spark_type(t):
    """Map an Arrow type to the Spark type ``spark.read.parquet`` would
    INFER for it under the engine's session confs (nanosAsLong=true).
    Mirroring inference exactly matters: the explicit schema must be
    byte-identical to the inferred one or the reader's behavior drifts
    from the no-schema path."""
    import pyarrow as pa
    from pyspark.sql import types as T

    if pa.types.is_int8(t):
        return T.ByteType()
    if pa.types.is_int16(t):
        return T.ShortType()
    if pa.types.is_int32(t):
        return T.IntegerType()
    if pa.types.is_int64(t):
        return T.LongType()
    if pa.types.is_float32(t):
        return T.FloatType()
    if pa.types.is_float64(t):
        return T.DoubleType()
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return T.StringType()
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return T.BinaryType()
    if pa.types.is_boolean(t):
        return T.BooleanType()
    if pa.types.is_date(t):
        return T.DateType()
    if pa.types.is_decimal(t):
        return T.DecimalType(t.precision, t.scale)
    if pa.types.is_timestamp(t):
        if t.unit == "ns":
            # spark.sql.legacy.parquet.nanosAsLong=true → LongType
            return T.LongType()
        # tz-tagged (isAdjustedToUTC) → TimestampType; untagged → NTZ
        return T.TimestampType() if t.tz is not None else T.TimestampNTZType()
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return T.ArrayType(_arrow_to_spark_type(t.value_type))
    if pa.types.is_map(t):
        return T.MapType(
            _arrow_to_spark_type(t.key_type), _arrow_to_spark_type(t.item_type)
        )
    if pa.types.is_struct(t):
        return T.StructType(
            [
                T.StructField(f.name, _arrow_to_spark_type(f.type), f.nullable)
                for f in t
            ]
        )
    raise TypeError(f"unmapped arrow type in parquet footer: {t}")


def footer_schema(sf_dir: str, table: str):
    """Spark schema for a table, read from the parquet FOOTER on the
    driver (memoized). Passing this to ``spark.read.schema(...)`` skips
    Spark's schema-inference job, so building a query plan launches
    ZERO jobs. At cluster scale the schema comes from the catalog; the
    footer read is the local analogue and stays drift-proof when the
    driver regenerates testdata with different physical encodings."""
    from pyspark.sql import types as T

    key = (sf_dir, table)
    schema = _FOOTER_SCHEMA_CACHE.get(key)
    if schema is None:
        import pyarrow.parquet as pq

        arrow = pq.ParquetFile(f"{sf_dir}/{table}.parquet").schema_arrow
        schema = T.StructType(
            [
                T.StructField(f.name, _arrow_to_spark_type(f.type), f.nullable)
                for f in arrow
            ]
        )
        _FOOTER_SCHEMA_CACHE[key] = schema
    return schema


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
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{table}.parquet"
    if os.path.isdir(path):
        # partitioned directory: partition columns live in dir names,
        # not footers — let Spark's inference discover and append them
        # (the footer-schema fast path is for single-file tables)
        df = spark.read.parquet(path)
    else:
        df = spark.read.schema(footer_schema(sf_dir, table)).parquet(path)
    return normalize_timestamps(df, _NANOS_TS_COLUMNS.get(table, []))


_ROW_COUNT_CACHE: dict[tuple[str, str], int] = {}


def table_row_count(sf_dir: str, table: str) -> int:
    """Table cardinality from parquet FOOTER metadata — no Spark job.

    Query constructors that pick a plan knob by corpus size (e.g. the
    adaptive IVF probe width) must not run an eager action at plan-build
    time; the row count is already sitting in the file footer. At
    cluster scale the same number comes from catalog/table statistics
    (ANALYZE TABLE / lakehouse manifest) — the footer read is the
    single-file local analogue. Memoized per (dir, table): testdata is
    immutable within a round.
    """
    import os

    key = (sf_dir, table)
    n = _ROW_COUNT_CACHE.get(key)
    if n is None:
        import pyarrow.parquet as pq

        path = f"{sf_dir}/{table}.parquet"
        if os.path.isdir(path):
            # partitioned/multi-file table: sum the per-file footers
            # (still driver-side metadata only — no data scan)
            n = sum(
                pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
                for root, _dirs, files in os.walk(path)
                for f in files
                if f.endswith(".parquet")
            )
        else:
            n = pq.ParquetFile(path).metadata.num_rows
        _ROW_COUNT_CACHE[key] = n
    return n


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register every star-schema table as a temp view so
    ``spark.sql(...)`` works against the same catalog names DuckDB uses."""
    for t in STAR_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
