"""Continuous (hypertable-style) rollup: a persistent hourly aggregate
table maintained incrementally by the stream — the TimescaleDB
continuous-aggregate / materialized-rollup operator the task brief
names, built from Spark primitives.

Mechanism (exact, not approximate):
1. each micro-batch is aggregated to partial sums per (hour, key) —
   map-side combinable, tiny;
2. the existing rollup rows for the *affected dates only* are read back
   (partition-pruned — the rollup table is partitioned by date);
3. partials merge with existing rows (sum-of-sums / sum-of-counts);
4. the affected date partitions are atomically replaced via dynamic
   partition overwrite.

Cost per batch is O(batch + touched-partition rows), independent of
table history — the property that makes this a *continuous* rollup
rather than a nightly recompute. Averages and other derived measures
are computed at read time from the maintained sums/counts (algebraic
decomposition), never stored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

DEC = "decimal(18,2)"

ROLLUP_COLS = ["dt", "hour_bucket", "event_type", "n_events", "sum_value"]


def _partials(batch_df: DataFrame) -> DataFrame:
    return (
        batch_df.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00").alias(
                "hour_bucket"
            ),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .withColumn("dt", F.substring("hour_bucket", 1, 10))
    )


def start_continuous_rollup(
    event_stream: DataFrame,
    rollup_dir: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Maintain an hourly (hour_bucket × event_type) rollup parquet
    table, date-partitioned, updated exactly per micro-batch."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        partial = _partials(batch_df)
        partial.persist()
        try:
            affected = [r["dt"] for r in partial.select("dt").distinct().collect()]
            if not affected:
                return
            try:
                # localCheckpoint materializes the touched rows and cuts
                # the lineage back to the rollup files — without it Spark
                # refuses to overwrite a path present in the read plan
                existing = (
                    spark.read.parquet(rollup_dir)
                    .where(F.col("dt").isin(affected))
                    .localCheckpoint(eager=True)
                )
            except Exception:  # first batch: table doesn't exist yet
                existing = None
            merged = (
                partial.select(*ROLLUP_COLS)
                if existing is None
                else partial.select(*ROLLUP_COLS)
                .unionByName(existing.select(*ROLLUP_COLS))
                .groupBy("dt", "hour_bucket", "event_type")
                .agg(
                    F.sum("n_events").cast("bigint").alias("n_events"),
                    F.sum(F.col("sum_value").cast(DEC)).cast("double").alias("sum_value"),
                )
            )
            (
                merged.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("dt")
                .parquet(rollup_dir)
            )
        finally:
            partial.unpersist()

    return (
        event_stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"processingTime": "5 seconds"}))
        .start()
    )


def read_rollup(spark: SparkSession, rollup_dir: str) -> DataFrame:
    """The continuous aggregate, with derived measures computed at read
    time from the maintained algebraic parts."""
    df = spark.read.parquet(rollup_dir)
    return df.select(
        "dt",
        "hour_bucket",
        "event_type",
        "n_events",
        F.round(F.col("sum_value"), 2).alias("sum_value"),
        F.round(F.col("sum_value") / F.col("n_events"), 6).alias("avg_value"),
    )
