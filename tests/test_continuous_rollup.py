"""Continuous hourly rollup: incremental partial-merge across
micro-batches must equal the one-shot batch aggregate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olap_project_spark.sources import load_table
from olap_project_spark.streaming.rollup import read_rollup, start_continuous_rollup


class TestContinuousRollup:
    def test_incremental_merge_equals_batch_truth(self, spark, sf_dir, tmp_path):
        ev = load_table(spark, sf_dir, "events")
        src = str(tmp_path / "src")
        # two files → two micro-batches with OVERLAPPING hours, so the
        # merge path (existing + partial) is genuinely exercised
        ev.filter("event_id % 2 = 0").coalesce(1).write.mode("overwrite").parquet(src)
        ev.filter("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = start_continuous_rollup(
            stream,
            rollup_dir=str(tmp_path / "rollup"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            trigger={"availableNow": True},
        )
        q.awaitTermination(180)

        got = {
            (r["hour_bucket"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in read_rollup(spark, str(tmp_path / "rollup")).collect()
        }
        want = {
            (r["hour_bucket"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in ev.groupBy(
                F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias(
                    "hour_bucket"
                ),
                "event_type",
            )
            .agg(
                F.count("*").alias("n_events"),
                F.round(
                    F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
                ).alias("sum_value"),
            )
            .collect()
        }
        assert got == want

    def test_rollup_is_date_partitioned(self, spark, sf_dir, tmp_path):
        import os

        ev = load_table(spark, sf_dir, "events").limit(500)
        src = str(tmp_path / "src2")
        ev.coalesce(1).write.mode("overwrite").parquet(src)
        q = start_continuous_rollup(
            spark.readStream.schema(ev.schema).parquet(src),
            rollup_dir=str(tmp_path / "rollup2"),
            checkpoint_dir=str(tmp_path / "ckpt2"),
            trigger={"availableNow": True},
        )
        q.awaitTermination(120)
        parts = os.listdir(str(tmp_path / "rollup2"))
        assert any(p.startswith("dt=") for p in parts)
