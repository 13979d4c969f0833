"""Driver-local DataFrame construction that plans as ``LocalTableScan``.

``spark.createDataFrame(rows, schema)`` over a plain Python list builds a
*pickled RDD* parallelized over ``defaultParallelism`` slices: counting a
1-row result then schedules 32 near-empty tasks and deserializes Python
rows in each (measured ~430 ms per action at 32 cores — and every
lifecycle proof returns such a frame, and every LakehouseSQL statement
returns one). Routing the same rows through one Arrow record batch makes
Catalyst plan a ``LocalTableScan`` instead: no Python workers, one task,
~4× faster per action (guide §4.1 — Arrow batches rather than pickled
rows, applied to the driver-local boundary).

The construction is exact, not inferred: the declared Spark schema is
converted to the equivalent Arrow schema and each column is built with
its exact Arrow type, so the resulting DataFrame's schema is identical
to the classic path's. Anything Arrow cannot represent (or a value
mismatching the declared type) falls back to the classic builder —
same rows, just slower."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def _as_struct(schema) -> StructType:
    if isinstance(schema, StructType):
        return schema
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(schema)


def arrow_local_frame(spark: SparkSession, rows, schema) -> DataFrame:
    """The raising Arrow builder: one record batch with the declared
    schema's exact Arrow types → ``LocalTableScan``. Raises on dict
    rows (the classic builder binds those by NAME; a positional zip
    would silently reorder), on values Arrow cannot take, and on any
    Arrow round-trip that would alter the declared schema."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    st = _as_struct(schema)
    asch = to_arrow_schema(st)
    rows = list(rows)
    if any(isinstance(r, dict) for r in rows):
        raise TypeError("dict rows bind by name; use the classic builder")
    data = [tuple(r) for r in rows]
    cols = list(zip(*data)) if data else [() for _ in asch]
    tbl = pa.Table.from_arrays(
        [pa.array(list(c), type=f.type) for c, f in zip(cols, asch)],
        schema=asch,
    )
    df = spark.createDataFrame(tbl)
    if df.schema != st:
        raise TypeError("Arrow round-trip altered the declared schema")
    return df


def local_frame(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` planned as a
    ``LocalTableScan`` (Arrow-batch construction), with the classic
    builder as the fallback for types/values Arrow cannot take."""
    try:
        return arrow_local_frame(spark, rows, schema)
    except Exception:  # noqa: BLE001 — exactness first, speed second
        return spark.createDataFrame(rows, schema)
