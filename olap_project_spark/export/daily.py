"""Daily warehouse export — the reference's entire Airflow DAG body
(bigquery_update_scheduler.py:59-282: WebHDFS recursive listing,
per-file pyarrow reads, partition-regex recovery, pandas concat, column
reorder, CSV staging, BigQuery load job) as ONE partition-pruned Spark
batch append (SURVEY.md §3.2).

Everything the DAG hand-rolled is a Catalyst built-in here:
- S4 recursive listing      → datasource file index
- S5 per-file reads         → vectorized parquet reader
- S6 partition-value regex  → partition-column materialization
- P19 column reorder        → schema-contract select
- K4 staged CSV load        → direct parquet append

The WHERE on partition columns prunes at *planning* time: the job reads
only ``Year=Y/Month=M/Day=D`` files no matter how large the history —
the property the DAG's path-arithmetic was trying to achieve (and broke
with its ``Year=`` vs ``year=`` casing bug, SURVEY.md §1.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olap_project_spark.schemas import OUTPUT_COLUMNS


def export_partition(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    year: int,
    month: int,
    day: int,
) -> int:
    """Append one day's partition from the streaming sink to the
    warehouse table. Returns the row count exported.

    Scale: partition pruning makes this O(day), not O(history); the
    append is shuffle-free (narrow read → write). Idempotency at the
    warehouse is by (partition, load date) — re-running a day appends
    again, matching the reference's WRITE_APPEND semantics."""
    day_df = (
        spark.read.parquet(source_dir)
        .where(
            (F.col("Year") == year) & (F.col("Month") == month) & (F.col("Day") == day)
        )
        .select(*OUTPUT_COLUMNS)  # schema contract (P19)
    )
    day_df.write.mode("append").partitionBy("Year", "Month", "Day").parquet(target_dir)
    return spark.read.parquet(target_dir).where(
        (F.col("Year") == year) & (F.col("Month") == month) & (F.col("Day") == day)
    ).count()


def read_warehouse(spark: SparkSession, target_dir: str) -> DataFrame:
    """The warehouse table (what Power BI read in the reference; what
    the query library reads here)."""
    return spark.read.parquet(target_dir)
