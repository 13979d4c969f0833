"""Source-layer tests: table loading over non-single-file layouts."""

from __future__ import annotations

class TestPartitionedTableLoading:
    def test_load_table_on_partitioned_directory(self, spark, sf_dir, tmp_path):
        """A table stored as a partitioned DIRECTORY (what the engine's
        own sinks write at scale) must load through the same
        ``load_table`` path: partition columns recovered from dir
        names, row count correct from summed footers."""
        import shutil

        from pyspark.sql import functions as F

        from olap_project_spark.sources.registry import (
            load_table,
            table_row_count,
        )

        src = load_table(spark, sf_dir, "events")
        root = tmp_path / "part_events"
        (
            src.withColumn("day", F.dayofmonth("ts"))
            .write.partitionBy("day")
            .parquet(str(root / "events.parquet"))
        )
        try:
            df = load_table(spark, str(root), "events")
            assert "day" in df.columns  # recovered partition column
            assert df.count() == src.count()
            assert table_row_count(str(root), "events") == src.count()
        finally:
            shutil.rmtree(root, ignore_errors=True)
