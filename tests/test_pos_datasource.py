"""The POS simulator as a native Spark data source (PySpark 4 Python
DataSource API): deterministic batch slices, streaming offsets, and
compatibility with the clean/route pipeline."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from olap_project_spark.schemas import RAW_TRANSACTION_SCHEMA
from olap_project_spark.sources.pos_datasource import PosSimulatorDataSource
from olap_project_spark.transforms import clean, route


@pytest.fixture(scope="module")
def registered(spark):
    # idempotent across modules: the posfact gate queries may already
    # have registered the source on this session
    from olap_project_spark.queries.posfact import _ensure_pos_source

    _ensure_pos_source(spark)
    return spark


@pytest.fixture(scope="module")
def fmt(spark):
    """The session-scoped format name the source is registered under
    (registration is per-session, see posfact._ensure_pos_source)."""
    from olap_project_spark.queries.posfact import _ensure_pos_source

    return _ensure_pos_source(spark)


class TestBatchSource:
    def test_schema_and_count(self, registered, fmt):
        df = registered.read.format(fmt).option("rows", 500).load()
        assert df.schema == RAW_TRANSACTION_SCHEMA
        assert df.count() == 500

    def test_deterministic_given_seed(self, registered, fmt):
        a = registered.read.format(fmt).option("rows", 200).load()
        b = registered.read.format(fmt).option("rows", 200).load()
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
        c = (
            registered.read.format(fmt)
            .option("rows", 200)
            .option("seed", 7)
            .load()
        )
        assert sorted(map(tuple, a.collect())) != sorted(map(tuple, c.collect()))

    def test_partitioned_generation(self, registered, fmt):
        df = (
            registered.read.format(fmt)
            .option("rows", 100)
            .option("partitions", 4)
            .load()
        )
        assert df.rdd.getNumPartitions() == 4
        assert df.count() == 100

    def test_feeds_clean_route_pipeline(self, registered, fmt):
        raw = registered.read.format(fmt).option("rows", 400).load()
        streams = route(clean(raw))
        counts = {k: v.count() for k, v in streams.items()}
        assert sum(counts.values()) >= 400  # reference-mode valid∩fraud overlap
        assert counts["fraud"] > 0 and counts["error"] > 0
        # every generated amount parses: no invalid-amount routing
        cleaned = clean(raw)
        assert cleaned.filter(F.col("Amount_USD").isNull()).count() == 0


class TestStreamSource:
    def test_micro_batches_drain_bounded_replay(self, registered, fmt, tmp_path):
        # Python stream sources don't support availableNow (the engine
        # logs a single-batch fallback) — drain with processAllAvailable
        # over a bounded feed instead.
        name = f"pos_stream_{uuid.uuid4().hex[:8]}"
        q = (
            registered.readStream.format(fmt)
            .option("rows", 250)
            .option("rows_per_batch", 100)
            .load()
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = registered.table(name)
        assert got.count() == 250
        # identical to the batch generation of the same range
        batch = registered.read.format(fmt).option("rows", 250).load()
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, batch.collect())
        )
