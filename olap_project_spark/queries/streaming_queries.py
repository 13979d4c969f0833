"""Driver-gate entry that exercises the REAL Structured Streaming
machinery: a watermarked tumbling-window aggregate run as an actual
StreamingQuery (availableNow replay over the events parquet), not a
batch rewrite.

It still carries a full DuckDB oracle because the emission rule of an
append-mode watermarked aggregate under availableNow is deterministic
for a static input: a window emits iff

    window_end <= max(event_time) - watermark_delay

(verified empirically in tests/test_streaming_export.py and by this
query's oracle matching). That makes even the streaming path
hash-checkable — rather than settling for the rows-only check."""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from olap_project_spark.queries import register
from olap_project_spark.streaming.windows import windowed_event_stats

WATERMARK = "10 minutes"
WINDOW = "1 hour"


@register(
    "streaming_hourly_stats",
    oracle="""
    WITH ev AS (
      SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events
    ),
    mx AS (SELECT max(ts) AS m FROM ev),
    agg AS (
      SELECT date_trunc('hour', ts) AS ws,
             event_type,
             COUNT(*) AS n_events,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
      FROM ev GROUP BY 1, 2
    )
    SELECT strftime(ws, '%Y-%m-%d %H:00') AS window_start,
           event_type, n_events, total_value
    FROM agg, mx
    WHERE ws + INTERVAL 1 HOUR <= m - INTERVAL 10 MINUTE
    """,
)
def streaming_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event stats computed BY THE STREAMING ENGINE: file-source
    replay → withWatermark → tumbling window → append-mode memory sink;
    returns the materialized result.

    Scale: in production this is the same code with a Kafka source and
    a parquet sink — state is bounded by the watermark (≤ ~2 windows
    per key live at once), shuffles partition on (window, key)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    stream = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(batch_schema["ts"].dataType, LongType):  # ns-as-long file
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )

    name = f"streaming_hourly_{uuid.uuid4().hex[:8]}"
    q = (
        windowed_event_stats(stream, window=WINDOW, watermark=WATERMARK)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name).select(
        F.date_format("window_start", "yyyy-MM-dd HH:00").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )
