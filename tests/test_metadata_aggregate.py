"""Metadata-only aggregates over the manifest table: COUNT(*)/MIN/MAX/
null counts answered from the log with zero data files opened, the
strict exactness contract, schema-evolution null-backfill accounting,
and survival through partial compaction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olap_project_spark.export.manifest_sink import (
    ManifestSinkDataSource,
    compact_range,
    delete_where,
    metadata_aggregate,
)


@pytest.fixture(scope="module")
def registered(spark):
    try:
        spark.dataSource.register(ManifestSinkDataSource)
    except Exception:  # noqa: BLE001 — already registered this session
        pass
    return spark


@pytest.fixture(scope="module")
def frame(registered):
    return registered.range(0, 1000).select(
        F.col("id").cast("int").alias("k"),
        F.when(F.col("id") % 3 == 0, F.col("id").cast("double")).alias("nv"),
        F.concat(F.lit("s"), F.col("id")).alias("name"),
    )


def _write(df, path, n_parts=3):
    (
        df.repartition(n_parts)
        .write.format("manifest_sink")
        .option("path", path)
        .mode("append")
        .save()
    )


class TestExactness:
    def test_counts_minmax_and_nulls(self, registered, frame, tmp_path):
        path = str(tmp_path / "t")
        _write(frame.filter("k < 600"), path)
        _write(frame.filter("k >= 600"), path, n_parts=2)
        agg = metadata_aggregate(
            path, cols=["nv"], minmax_cols=["k", "name"]
        )
        t = frame.agg(
            F.count("*").alias("n"),
            F.min("k").alias("kmin"),
            F.max("k").alias("kmax"),
            F.count("nv").alias("nvn"),
            F.min("name").alias("smin"),
            F.max("name").alias("smax"),
        ).collect()[0]
        assert agg["n_rows"] == t["n"]
        assert (agg["cols"]["k"]["min"], agg["cols"]["k"]["max"]) == (
            t["kmin"],
            t["kmax"],
        )
        assert agg["cols"]["nv"]["non_null"] == t["nvn"]
        assert agg["cols"]["nv"]["nulls"] == t["n"] - t["nvn"]
        assert (
            agg["cols"]["name"]["min"],
            agg["cols"]["name"]["max"],
        ) == (t["smin"], t["smax"])

    def test_survives_partial_compaction(self, registered, frame, tmp_path):
        path = str(tmp_path / "t")
        _write(frame, path)
        before = metadata_aggregate(path, cols=["nv"], minmax_cols=["k"])
        compact_range(registered, path, frame.schema, "k", 0, 100, n_files=1)
        after = metadata_aggregate(path, cols=["nv"], minmax_cols=["k"])
        assert after == before

    def test_added_column_counts_as_null_backfill(
        self, registered, frame, tmp_path
    ):
        path = str(tmp_path / "t")
        _write(frame.select("k", "name"), path)  # pre-evolution
        wide = frame.select("k", "name", F.lit(7).alias("extra"))
        _write(wide.filter("k < 10"), path, n_parts=1)
        agg = metadata_aggregate(path, cols=["extra"])
        # old files' rows are all-null for the added column — exactly
        # what the null-backfill read produces
        assert agg["cols"]["extra"] == {"nulls": 1000, "non_null": 10}


class TestStrictness:
    def test_rejects_minmax_on_null_bearing_column(
        self, registered, frame, tmp_path
    ):
        path = str(tmp_path / "t")
        _write(frame, path)
        with pytest.raises(ValueError, match="not answerable"):
            metadata_aggregate(path, minmax_cols=["nv"])
        # counts-only access to the same column works
        agg = metadata_aggregate(path, cols=["nv"])
        assert "min" not in agg["cols"]["nv"]

    def test_rejects_tombstones(self, registered, frame, tmp_path):
        path = str(tmp_path / "t")
        _write(frame, path)
        delete_where(
            registered, path, registered.createDataFrame([(1,)], "k int")
        )
        with pytest.raises(ValueError, match="tombstones"):
            metadata_aggregate(path)
