"""The streaming ingest pipeline: source → clean/route (the *same* pure
functions as batch) → multi-sink fan-out.

Reference behavior reproduced, with its two structural defects fixed
(SURVEY.md §3.1 step 4, §2.9):

1. The reference starts up to five independent StreamingQueries, each
   re-reading Kafka (:442-505). Here ONE query consumes the source and
   ``foreachBatch`` fans out each micro-batch to every sink — the batch
   is computed once, persisted, and the four routed filters are cheap
   scans over it.
2. ``coalesce(1)`` small-file control (:317, :350) becomes a
   configurable sink parallelism: at 100 TB you want
   ``maxRecordsPerFile`` + partitionBy, never a single writer task.

Sinks (K1-K3): valid/fraud → Parquet partitioned by Year/Month/Day
(ST6); error → Parquet; invalid → CSV audit log with the
``invalid_log`` projection (F4). All under one checkpointed query —
exactly-once per sink directory via the batch-id-transactional file
sink.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from olap_project_spark.schemas import RAW_TRANSACTION_SCHEMA
from olap_project_spark.transforms.clean import clean, to_output
from olap_project_spark.transforms.route import invalid_log, route

PARTITION_COLS = ["Year", "Month", "Day"]


def read_file_stream(
    spark: SparkSession, source_dir: str, fmt: str = "json"
) -> DataFrame:
    """File-based raw-transaction stream (test/replay source — ST9).
    ``maxFilesPerTrigger`` is left to the caller's trigger policy."""
    reader = spark.readStream.schema(RAW_TRANSACTION_SCHEMA)
    return getattr(reader, fmt)(source_dir)


def encode_kafka_payload(df: DataFrame, key_col: str = "Card") -> DataFrame:
    """The Kafka WIRE FORMAT, producer side (pos_simulator.py:133-141
    semantics): (key, value) where value is the row JSON-encoded and
    key is the card number (keeps a card's events ordered within a
    topic partition). Pure DataFrame→DataFrame so the format is
    testable without a broker — the sink merely appends the transport."""
    from pyspark.sql import functions as F

    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*df.columns)).alias("value"),
    )


def decode_kafka_value(df: DataFrame) -> DataFrame:
    """The Kafka WIRE FORMAT, consumer side (S3,
    spark_streaming_consumer.py:177-212): JSON-decode the string value
    against the fixed raw-transaction schema and flatten. Inverse of
    ``encode_kafka_payload`` (checked by test_kafka_wire_format)."""
    from pyspark.sql import functions as F

    return df.select(
        F.from_json(F.col("value").cast("string"), RAW_TRANSACTION_SCHEMA).alias(
            "data"
        )
    ).select("data.*")


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka raw-transaction stream (S2+S3): subscribe, JSON-decode the
    value against the fixed schema, flatten. Matches the reference's
    source contract (spark_streaming_consumer.py:177-212) — requires the
    spark-sql-kafka package on the cluster (not in this test env)."""
    kafka = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
        .load()
    )
    return decode_kafka_value(kafka)


def write_console(
    df: DataFrame,
    output_mode: str = "append",
    truncate: bool = True,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Console debug sink (K1, reference write_to_console :285-304)."""
    return (
        df.writeStream.outputMode(output_mode)
        .format("console")
        .option("truncate", str(truncate).lower())
        .trigger(**(trigger or {"processingTime": "5 seconds"}))
        .start()
    )


def write_kafka_stream(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    key_col: str = "Card",
) -> StreamingQuery:
    """Kafka sink (K5, pos_simulator.py:133-141 semantics): JSON-encode
    each row as the value, key by card number so a card's events stay
    ordered within a partition. Requires the spark-sql-kafka package on
    the cluster (no broker in this test env — the wire format itself is
    broker-free and covered by test_kafka_wire_format)."""
    payload = encode_kafka_payload(df, key_col=key_col)
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def start_pipeline(
    raw_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    rate: float | None = None,
    mode: str = "reference",
    processed_at: str | None = None,
    trigger: dict | None = None,
    max_records_per_file: int = 1_000_000,
    sink_format: str = "parquet",
    on_batch: Callable[[int, dict[str, int]], None] | None = None,
) -> StreamingQuery:
    """Run the full ingest pipeline as ONE streaming query with
    foreachBatch fan-out.

    Args:
        raw_stream: streaming DataFrame with the raw schema.
        out_dir: sink root — writes {valid,fraud}/ (parquet, partitioned
            Year/Month/Day), error/ (parquet), invalid/ (CSV audit).
        checkpoint_dir: one checkpoint for the single query (ST3).
        rate: literal VND rate (None → reference default). For daily
            rates run transforms.enrich inside a custom fan-out instead.
        trigger: e.g. {"availableNow": True} for replay/tests,
            {"processingTime": "5 seconds"} for the reference cadence.
        on_batch: optional hook (batch_id, per-sink row counts) — test
            observability without a console sink.
    """
    from olap_project_spark.schemas import DEFAULT_VND_PER_USD

    rate_value = DEFAULT_VND_PER_USD if rate is None else rate

    def fan_out(batch_df: DataFrame, batch_id: int) -> None:
        cleaned = clean(batch_df, rate=rate_value, processed_at=processed_at)
        # One materialization; four filters scan the cached batch.
        cleaned.persist()
        # Per-sink counts are OBSERVABILITY, not pipeline logic: each is
        # an extra job over the persisted batch, so pay for them only
        # when a hook is listening.
        want_counts = on_batch is not None
        try:
            streams = route(cleaned, mode=mode)
            counts: dict[str, int] = {}
            for name in ("valid", "fraud"):
                out = to_output(streams[name])
                writer = (
                    out.write.mode("append")
                    .option("maxRecordsPerFile", str(max_records_per_file))
                    .partitionBy(*PARTITION_COLS)
                )
                if sink_format == "csv":  # reference K2 shape
                    writer.option("header", True).csv(f"{out_dir}/{name}")
                else:
                    writer.parquet(f"{out_dir}/{name}")
                if want_counts:
                    counts[name] = out.count()
            err = to_output(streams["error"])
            err.write.mode("append").parquet(f"{out_dir}/error")
            inv = invalid_log(streams["invalid"])
            inv.write.mode("append").option("header", True).csv(f"{out_dir}/invalid")
            if want_counts:
                counts["error"] = err.count()
                counts["invalid"] = inv.count()
                on_batch(batch_id, counts)
        finally:
            cleaned.unpersist()

    writer = raw_stream.writeStream.foreachBatch(fan_out).option(
        "checkpointLocation", checkpoint_dir
    )
    writer = writer.trigger(**(trigger or {"processingTime": "5 seconds"}))
    return writer.start()
