"""Streaming pipeline + windowed operators + daily export tests: file-
source replay through the real StreamingQuery machinery (availableNow
trigger), asserting against the batch-computed truth (SURVEY.md §5)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from olap_project_spark.export.daily import export_partition
from olap_project_spark.schemas import OUTPUT_COLUMNS
from olap_project_spark.sources import load_table
from olap_project_spark.streaming import (
    dedup_stream,
    read_file_stream,
    session_event_counts,
    start_pipeline,
    windowed_event_stats,
)
from olap_project_spark.transforms import clean, route
from tests.fixtures import sample_rows

FIXED_TS = "2024-01-15 08:30:20"
RAW_FIELDS = [
    "User", "Card", "Year", "Month", "Day", "Time", "Amount", "Use Chip",
    "Merchant Name", "Merchant City", "Merchant State", "Zip", "MCC",
    "Errors?", "Is Fraud?", "timestamp",
]


@pytest.fixture()
def raw_json_dir(tmp_path):
    """The synthetic fixture as a JSON file-stream source directory."""
    d = tmp_path / "incoming"
    d.mkdir()
    with open(d / "batch0.json", "w") as f:
        for row in sample_rows():
            f.write(json.dumps(dict(zip(RAW_FIELDS, row))) + "\n")
    return str(d)


class TestIngestPipeline:
    def test_foreachbatch_fanout_matches_batch_routing(
        self, spark, raw_json_dir, tmp_path
    ):
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        seen = {}

        q = start_pipeline(
            read_file_stream(spark, raw_json_dir, fmt="json"),
            out_dir=out,
            checkpoint_dir=ckpt,
            processed_at=FIXED_TS,
            trigger={"availableNow": True},
            on_batch=lambda bid, counts: seen.update(counts),
        )
        q.awaitTermination(120)
        assert not q.isActive

        # Truth: the same transforms, batch mode.
        from tests.fixtures import raw_transactions_df

        truth = route(clean(raw_transactions_df(spark), processed_at=FIXED_TS))
        want = {k: v.count() for k, v in truth.items()}
        assert seen == want

        valid = spark.read.parquet(f"{out}/valid")
        assert sorted(valid.columns) == sorted(OUTPUT_COLUMNS)
        assert valid.count() == want["valid"]
        # partitioned sink layout (ST6)
        years = os.listdir(f"{out}/valid")
        assert any(p.startswith("Year=") for p in years)

        inv = spark.read.option("header", True).csv(f"{out}/invalid")
        assert inv.count() == want["invalid"]
        assert "invalid_reason" in inv.columns

    def test_no_count_jobs_without_observer(self, spark, raw_json_dir, tmp_path):
        """Per-sink counts are observability-only: with no on_batch hook
        the fan-out must not run ANY count() job over the batch (four
        extra jobs per micro-batch, pure waste at scale)."""
        from pyspark.sql import DataFrame

        calls = {"n": 0}
        orig = DataFrame.count

        def counting(self):
            calls["n"] += 1
            return orig(self)

        DataFrame.count = counting
        try:
            q = start_pipeline(
                read_file_stream(spark, raw_json_dir, fmt="json"),
                out_dir=str(tmp_path / "out_nc"),
                checkpoint_dir=str(tmp_path / "ckpt_nc"),
                processed_at=FIXED_TS,
                trigger={"availableNow": True},
                on_batch=None,
            )
            q.awaitTermination(120)
        finally:
            DataFrame.count = orig
        assert calls["n"] == 0

    def test_csv_sink_mode(self, spark, raw_json_dir, tmp_path):
        """Reference K2 shape: valid/fraud as partitioned CSV."""
        out = str(tmp_path / "out_csv")
        q = start_pipeline(
            read_file_stream(spark, raw_json_dir, fmt="json"),
            out_dir=out,
            checkpoint_dir=str(tmp_path / "ckpt_csv"),
            processed_at=FIXED_TS,
            trigger={"availableNow": True},
            sink_format="csv",
        )
        q.awaitTermination(120)
        valid = spark.read.option("header", True).csv(f"{out}/valid")
        from tests.fixtures import raw_transactions_df

        want = route(clean(raw_transactions_df(spark), processed_at=FIXED_TS))[
            "valid"
        ].count()
        assert valid.count() == want
        assert os.path.isdir(f"{out}/valid/Year=2024")

    def test_complete_mode_running_counts(self, spark, raw_json_dir):
        """ST2: update/complete output modes for streaming aggregates —
        a complete-mode running count over the replayed fixture."""
        stream = read_file_stream(spark, raw_json_dir, fmt="json")
        agg = clean(stream, processed_at=FIXED_TS).groupBy("Is_Fraud").count()
        q = (
            agg.writeStream.format("memory")
            .queryName("complete_counts")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {r["Is_Fraud"]: r["count"] for r in spark.table("complete_counts").collect()}
        assert got.get("Yes") == 2  # fixture fraud rows

    def test_restart_is_exactly_once(self, spark, raw_json_dir, tmp_path):
        """Re-starting with the same checkpoint must not duplicate sink
        rows (ST3 exactly-once file sinks)."""
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        for _ in range(2):
            q = start_pipeline(
                read_file_stream(spark, raw_json_dir, fmt="json"),
                out_dir=out,
                checkpoint_dir=ckpt,
                processed_at=FIXED_TS,
                trigger={"availableNow": True},
            )
            q.awaitTermination(120)
        valid = spark.read.parquet(f"{out}/valid")
        from tests.fixtures import raw_transactions_df

        want = route(clean(raw_transactions_df(spark), processed_at=FIXED_TS))[
            "valid"
        ].count()
        assert valid.count() == want

    def test_incremental_arrival_processes_only_new_files(
        self, spark, raw_json_dir, tmp_path
    ):
        """ST3 incremental ingest: a file landing BETWEEN availableNow
        runs is processed exactly once on the next run — the checkpoint
        tracks consumed source files, so re-runs neither re-read old
        batches nor miss new ones (the cron-driven micro-batch pattern
        the daily export rides at scale)."""
        import json as _json

        from tests.fixtures import raw_transactions_df

        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        q = start_pipeline(
            read_file_stream(spark, raw_json_dir, fmt="json"),
            out_dir=out,
            checkpoint_dir=ckpt,
            processed_at=FIXED_TS,
            trigger={"availableNow": True},
        )
        q.awaitTermination(120)
        base = spark.read.parquet(f"{out}/valid").count()

        # a second batch lands: duplicate the fixture with shifted users
        with open(os.path.join(raw_json_dir, "batch1.json"), "w") as f:
            for row in sample_rows():
                rec = dict(zip(RAW_FIELDS, row))
                if rec["User"] is not None:
                    rec["User"] = str(int(rec["User"]) + 1000)
                f.write(_json.dumps(rec) + "\n")
        q = start_pipeline(
            read_file_stream(spark, raw_json_dir, fmt="json"),
            out_dir=out,
            checkpoint_dir=ckpt,
            processed_at=FIXED_TS,
            trigger={"availableNow": True},
        )
        q.awaitTermination(120)
        valid = spark.read.parquet(f"{out}/valid")
        per_batch = route(
            clean(raw_transactions_df(spark), processed_at=FIXED_TS)
        )["valid"].count()
        # exactly-once: old batch not re-processed, new batch fully in
        assert base == per_batch
        assert valid.count() == 2 * per_batch


class TestWindowedOperators:
    @pytest.fixture(scope="class")
    def event_stream_dir(self, spark, sf_dir, tmp_path_factory):
        """sf0.001 events re-written as a single-file stream source."""
        d = str(tmp_path_factory.mktemp("events_stream"))
        load_table(spark, sf_dir, "events").coalesce(1).write.mode("overwrite").parquet(d)
        return d

    def _run_to_memory(self, spark, stream_df, name, mode="append"):
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.table(name)

    def test_tumbling_window_matches_batch(self, spark, sf_dir, event_stream_dir):
        ev = load_table(spark, sf_dir, "events")
        stream = spark.readStream.schema(ev.schema).parquet(event_stream_dir)
        got = self._run_to_memory(
            spark,
            windowed_event_stats(stream, window="1 hour", watermark="10 minutes"),
            "tumbling_test",
            mode="append",
        )
        want = (
            ev.groupBy(
                F.window("ts", "1 hour").alias("win"), F.col("event_type")
            )
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias(
                    "total_value"
                ),
            )
            .select(
                F.col("win.start").alias("window_start"),
                "event_type",
                "n_events",
                "total_value",
            )
        )
        got_rows = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in got.collect()
        }
        want_rows = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in want.collect()
        }
        # availableNow append-mode emits every window whose end precedes
        # the final watermark; with a 10-min watermark over a 30-day
        # replay that is all but the last hour — require ≥95% coverage
        # and exact values on everything emitted.
        assert got_rows, "no windows emitted"
        assert all(got_rows[k] == want_rows[k] for k in got_rows)
        assert len(got_rows) >= 0.95 * len(want_rows)

    def test_session_windows_match_batch_sessionization(
        self, spark, sf_dir, event_stream_dir
    ):
        ev = load_table(spark, sf_dir, "events")
        stream = spark.readStream.schema(ev.schema).parquet(event_stream_dir)
        got = self._run_to_memory(
            spark,
            session_event_counts(stream, gap="30 minutes", watermark="30 minutes"),
            "session_test",
            mode="append",
        )
        # Batch truth: lag/cumsum sessionization with the same 30-min gap
        from pyspark.sql.window import Window

        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        prev = F.lag(F.col("ts").cast("double")).over(w)
        flagged = ev.withColumn(
            "new_session",
            F.when(prev.isNull() | ((F.col("ts").cast("double") - prev) >= 1800), 1).otherwise(0),
        ).withColumn(
            "session_id",
            F.sum("new_session").over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        want = flagged.groupBy("user_id", "session_id").agg(
            F.count("*").alias("n_events")
        )
        # Compare per-user session-size multisets (session ids differ)
        got_sizes = {}
        for r in got.collect():
            got_sizes.setdefault(r["user_id"], []).append(r["n_events"])
        want_sizes = {}
        for r in want.collect():
            want_sizes.setdefault(r["user_id"], []).append(r["n_events"])
        emitted_users = set(got_sizes)
        assert emitted_users, "no sessions emitted"
        matched = sum(
            sorted(got_sizes[u]) == sorted(want_sizes[u]) for u in emitted_users
        )
        # the final (watermark-open) session per user may be withheld —
        # allow that, but the overwhelming majority must match exactly
        assert matched >= 0.8 * len(emitted_users)

    def test_streaming_dedup_drops_replayed_rows(self, spark, sf_dir, tmp_path):
        ev = load_table(spark, sf_dir, "events").limit(200)
        d = str(tmp_path / "dup_stream")
        # write the same rows twice → two files, duplicated event_ids
        ev.coalesce(1).write.mode("overwrite").parquet(d)
        ev.coalesce(1).write.mode("append").parquet(d)
        stream = spark.readStream.schema(ev.schema).parquet(d)
        got = self._run_to_memory(
            spark,
            dedup_stream(stream, keys=["event_id"], watermark="10 hours"),
            "dedup_test",
        )
        assert got.count() == 200


class TestDailyExport:
    def test_partition_pruned_export(self, spark, tmp_path):
        from tests.fixtures import raw_transactions_df
        from olap_project_spark.transforms.clean import to_output

        src = str(tmp_path / "sink")
        wh = str(tmp_path / "warehouse")
        cleaned = clean(raw_transactions_df(spark), processed_at=FIXED_TS)
        valid = route(cleaned)["valid"]
        to_output(valid).write.partitionBy("Year", "Month", "Day").parquet(src)

        n = export_partition(spark, src, wh, 2024, 1, 15)
        assert n == 1  # exactly one valid row on 2024-01-15 in the fixture
        out = spark.read.parquet(wh)
        assert out.select(*OUTPUT_COLUMNS).columns == OUTPUT_COLUMNS
        assert out.count() == 1

        # pruning proof: the day predicate must reach the file index
        plan = (
            spark.read.parquet(src)
            .where((F.col("Year") == 2024) & (F.col("Month") == 1) & (F.col("Day") == 15))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "PartitionFilters" in plan and "Year" in plan


class TestDailyRates:
    def test_cascade_and_dimension(self, spark):
        from datetime import date

        from olap_project_spark.sources.rates import (
            daily_rates_df,
            resolve_rate,
        )

        assert resolve_rate(date(2024, 1, 15)) == 25057.0
        assert resolve_rate(date(2024, 1, 15), [lambda d: 24000.0]) == 24000.0
        rates = daily_rates_df(spark, date(2024, 1, 13), date(2024, 1, 20))
        assert rates.count() == 8

    def test_enrich_matches_literal_clean_for_constant_rate(self, spark):
        from datetime import date

        from olap_project_spark.sources.rates import daily_rates_df
        from olap_project_spark.transforms.enrich import enrich_with_daily_rates
        from tests.fixtures import raw_transactions_df

        raw = raw_transactions_df(spark)
        rates = daily_rates_df(spark, date(2024, 1, 1), date(2024, 1, 31))
        enriched = enrich_with_daily_rates(raw, rates, processed_at=FIXED_TS)
        literal = clean(raw, rate=25057.0, processed_at=FIXED_TS)
        a = {r["User"]: r["Amount_VND"] for r in enriched.select("User", "Amount_VND").collect()}
        b = {r["User"]: r["Amount_VND"] for r in literal.select("User", "Amount_VND").collect()}
        assert a == b

    def test_enrich_uses_per_day_rate(self, spark):
        from olap_project_spark.schemas import EXCHANGE_RATE_SCHEMA
        from olap_project_spark.transforms.enrich import enrich_with_daily_rates
        from tests.fixtures import raw_transactions_df

        raw = raw_transactions_df(spark)
        rates = spark.createDataFrame(
            [("2024-01-15", 20000.0), ("2024-01-13", 30000.0)], EXCHANGE_RATE_SCHEMA
        )
        got = {
            r["User"]: (r["Amount_VND"], r["Exchange_Rate"])
            for r in enrich_with_daily_rates(raw, rates, processed_at=FIXED_TS)
            .select("User", "Amount_VND", "Exchange_Rate")
            .collect()
        }
        assert got["0"] == (pytest.approx(125.50 * 20000.0), 20000)  # Jan 15
        assert got["1"] == (pytest.approx(1000.0 * 30000.0), 30000)  # Jan 13
        # day with no rate row → default fallback
        assert got["3"][1] == 25057


class TestStreamingManifestCommit:
    def test_each_microbatch_commits_one_snapshot(
        self, spark, raw_json_dir, tmp_path
    ):
        """Streaming ingest writing THROUGH the manifest sink: every
        micro-batch commits exactly one snapshot version, so the stream
        gets the transactional fence the reference's WRITE_APPEND path
        lacked — a failed batch leaves only invisible staging files,
        and downstream readers see batch-atomic state."""
        from olap_project_spark.export.manifest_sink import (
            ManifestSinkDataSource,
            read_committed,
            table_versions,
        )
        from olap_project_spark.streaming.pipeline import read_file_stream
        from olap_project_spark.transforms import clean

        try:
            spark.dataSource.register(ManifestSinkDataSource)
        except Exception:  # noqa: BLE001 — already registered
            pass
        path = str(tmp_path / "mtbl")
        ckpt = str(tmp_path / "mckpt")
        stream = read_file_stream(spark, raw_json_dir, fmt="json")

        def commit_batch(batch_df, batch_id):
            out = clean(batch_df, processed_at=FIXED_TS).select(
                "User", "Amount_USD", "Is_Fraud"
            )
            (
                out.write.format("manifest_sink")
                .option("path", path)
                .mode("append")
                .save()
            )

        q = (
            stream.writeStream.foreachBatch(commit_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        versions = table_versions(path)
        assert versions == [1]  # one micro-batch → one snapshot
        sch = "User string, Amount_USD double, Is_Fraud string"
        from pyspark.sql.types import _parse_datatype_string

        got = read_committed(spark, path, _parse_datatype_string(sch))
        assert got.count() == len(sample_rows())  # every fixture row, once
