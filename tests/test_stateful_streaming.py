"""applyInPandasWithState custom stateful operator: streaming run vs a
pure-Python replay of the same semantics."""

from __future__ import annotations

import pandas as pd
import pytest

from olap_project_spark.sources import load_table
from olap_project_spark.streaming.stateful import cumulative_threshold_alerts

THRESHOLD = 1000.0


class TestCumulativeAlerts:
    @pytest.fixture(scope="class")
    def events_dir(self, spark, sf_dir, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("ev_state"))
        load_table(spark, sf_dir, "events").coalesce(1).write.mode("overwrite").parquet(d)
        return d

    def test_alerts_match_python_replay(self, spark, sf_dir, events_dir):
        ev = load_table(spark, sf_dir, "events")
        stream = spark.readStream.schema(ev.schema).parquet(events_dir)
        q = (
            cumulative_threshold_alerts(stream, threshold=THRESHOLD)
            .writeStream.format("memory")
            .queryName("alerts_test")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r["user_id"], r["alerts_so_far"]): r["cum_value"]
            for r in spark.table("alerts_test").collect()
        }

        # Python truth: per-user event-time-ordered prefix sums
        rows = (
            ev.select("user_id", "ts", "value")
            .toPandas()
            .sort_values(["user_id", "ts"], kind="mergesort")
        )
        want = {}
        for uid, grp in rows.groupby("user_id"):
            cum, alerts = 0.0, 0
            for v in grp["value"]:
                new_cum = cum + float(v)
                if int(new_cum // THRESHOLD) > int(cum // THRESHOLD):
                    alerts += 1
                    want[(uid, alerts)] = round(new_cum, 2)
                cum = new_cum
        assert len(got) == len(want)
        for k, v in want.items():
            assert got[k] == pytest.approx(v, abs=1e-6), k

    def test_state_survives_across_batches(self, spark, sf_dir, tmp_path):
        """Two files → (at least potentially) two micro-batches; the
        running totals must continue, not reset."""
        ev = load_table(spark, sf_dir, "events").limit(400)
        first = ev.filter("event_id < 200")
        second = ev.filter("event_id >= 200")
        d = str(tmp_path / "two_batches")
        first.coalesce(1).write.mode("overwrite").parquet(d)
        second.coalesce(1).write.mode("append").parquet(d)

        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        q = (
            cumulative_threshold_alerts(stream, threshold=500.0)
            .writeStream.format("memory")
            .queryName("alerts_batches")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = spark.table("alerts_batches").toPandas()

        rows = (
            ev.select("user_id", "ts", "value")
            .toPandas()
            .sort_values(["user_id", "ts"], kind="mergesort")
        )
        # batch boundary splits by event_id, and within each batch rows
        # re-sort by ts — replicate exactly: file order is (id<200), (>=200)
        ids = ev.select("event_id", "user_id", "ts", "value").toPandas()
        ids["batch"] = (ids["event_id"] >= 200).astype(int)
        ids = ids.sort_values(["batch", "user_id", "ts"], kind="mergesort")
        want_count = 0
        for uid, grp in ids.groupby("user_id"):
            cum, alerts = 0.0, 0
            for _, r in grp.sort_values(["batch", "ts"], kind="mergesort").iterrows():
                new_cum = cum + float(r["value"])
                if int(new_cum // 500.0) > int(cum // 500.0):
                    alerts += 1
                    want_count += 1
                cum = new_cum
        assert len(got) == want_count
        # alert sequence numbers per user must be contiguous from 1
        for uid, grp in got.groupby("user_id"):
            seq = sorted(grp["alerts_so_far"])
            assert seq == list(range(1, len(seq) + 1))


class TestQueryableStateStore:
    """Spark 4's state data source: the checkpointed state of a
    streaming aggregate is itself a readable table — the ops surface
    for debugging watermarks/state growth without instrumenting the
    query. The reference's only state visibility was the console sink."""

    def test_statestore_reflects_aggregation_state(self, spark, sf_dir, tmp_path):
        import uuid

        from pyspark.sql import functions as F
        from olap_project_spark.queries.streaming_queries import (
            _event_stream,
            _streaming_child,
        )

        child = _streaming_child(spark)
        ck = str(tmp_path / "ckpt")
        agg = (
            _event_stream(child, sf_dir)
            .groupBy("event_type")
            .agg(F.count("*").alias("n"))
        )
        name = f"state_probe_{uuid.uuid4().hex[:8]}"
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        state = spark.read.format("statestore").load(ck)
        # the value struct carries the PHYSICAL aggregate buffer's field
        # names (e.g. count(1)), not the query alias — read by position
        got = {r["key"][0]: r["value"][0] for r in state.collect()}
        want = {
            r["event_type"]: r["n"]
            for r in load_table(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert got == want


class TestTransformWithState:
    """The Spark 4 StatefulProcessor API implementation must emit the
    SAME alerts as the applyInPandasWithState one — two stateful-
    operator APIs, one semantic. transformWithStateInPandas speaks a
    protobuf wire protocol to the JVM, so the parity check requires a
    working google.protobuf (skipped, not failed, where absent)."""

    def test_tws_matches_apply_in_pandas_with_state(
        self, spark, sf_dir, tmp_path
    ):
        import uuid

        pytest.importorskip(
            "google.protobuf.descriptor",
            reason="transformWithStateInPandas needs the protobuf runtime",
        )
        from olap_project_spark.streaming.stateful import (
            cumulative_threshold_alerts,
            cumulative_threshold_alerts_tws,
        )

        ev = load_table(spark, sf_dir, "events")
        events_dir = str(tmp_path / "events_replay")
        ev.write.parquet(events_dir)

        def run(build):
            name = f"tws_{uuid.uuid4().hex[:8]}"
            stream = spark.readStream.schema(
                spark.read.parquet(events_dir).schema
            ).parquet(events_dir)
            q = (
                build(stream, threshold=500.0)
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            return {
                (r["user_id"], r["alerts_so_far"]): r["cum_value"]
                for r in spark.table(name).collect()
            }

        old = run(cumulative_threshold_alerts)
        new = run(cumulative_threshold_alerts_tws)
        assert len(old) > 0
        assert new == old


class TestRocksDBStateStore:
    """The production state-store backend: RocksDB (bundled rocksdbjni)
    instead of the default in-JVM-heap HDFSBackedStateStore. At real
    state sizes (hundreds of GB across a cluster) heap state OOMs or
    GC-stalls; RocksDB spills to local disk with changelog
    checkpointing. Results must be identical."""

    def test_rocksdb_provider_matches_batch(self, spark, sf_dir, tmp_path):
        import uuid

        from pyspark.sql import functions as F
        from olap_project_spark.queries.streaming_queries import _event_stream

        child = spark.newSession()
        child.conf.set("spark.sql.shuffle.partitions", "4")
        child.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        agg = (
            _event_stream(child, sf_dir)
            .groupBy("event_type")
            .agg(F.count("*").alias("n"))
        )
        name = f"rocks_{uuid.uuid4().hex[:8]}"
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {r["event_type"]: r["n"] for r in child.table(name).collect()}
        want = {
            r["event_type"]: r["n"]
            for r in load_table(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert got == want


class TestCusumDriftAlarms:
    def test_cross_batch_state_carry_matches_python_replay(
        self, spark, sf_dir, tmp_path
    ):
        from pyspark.sql import functions as F

        """Two files → two micro-batches under maxFilesPerTrigger=1;
        the carried (P, minP, prev_s) must continue across the batch
        boundary so alarms match a single global (ts, event_id)-ordered
        Python replay. The split is BY TIME (first half / second half),
        so batch order and event-time order agree — isolating the
        state-carry question from replay-order questions."""
        from olap_project_spark.streaming.stateful import cusum_drift_alarms

        ev = load_table(spark, sf_dir, "events").limit(600)
        cut_ts = (
            ev.orderBy("ts", "event_id")
            .limit(300)
            .agg(F.max("ts").alias("c"))
            .collect()[0]["c"]
        )
        first = ev.filter(F.col("ts") <= F.lit(cut_ts))
        second = ev.filter(F.col("ts") > F.lit(cut_ts))
        d = str(tmp_path / "cusum_two_batches")
        first.coalesce(1).write.mode("overwrite").parquet(d)
        second.coalesce(1).write.mode("append").parquet(d)

        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        src = stream.select(
            "event_type",
            "ts",
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        q = (
            cusum_drift_alarms(src, reference_cents=5000, threshold_cents=8000)
            .writeStream.format("memory")
            .queryName("cusum_batches")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = spark.table("cusum_batches").toPandas()

        rows = (
            ev.select("event_type", "ts", "event_id", "value")
            .toPandas()
            .sort_values(["event_type", "ts", "event_id"], kind="mergesort")
        )
        want = []
        for et, grp in rows.groupby("event_type"):
            p = minp = prev_s = alarms = 0
            for _, r in grp.iterrows():
                p += int(round(r["value"] * 100)) - 5000
                minp = min(minp, p)
                s = p - minp
                if s > 8000 and prev_s <= 8000:
                    alarms += 1
                    want.append((et, s, alarms))
                prev_s = s
        got_t = sorted(map(tuple, got.values))
        assert got_t == sorted(want)
