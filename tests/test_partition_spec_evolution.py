"""PARTITION-SPEC EVOLUTION — Iceberg's ALTER TABLE … PARTITION FIELD
as a metadata-only alter commit (``set_partition_spec``): the declared
spec changes, old files keep pruning under their own recorded spec,
new files under the new one, writers inherit the declared spec, and
maintenance collapses the spec eras under the CURRENT spec."""

from __future__ import annotations

import datetime

import pytest

from olap_project_spark.export.manifest_sink import (
    ManifestSinkDataSource,
    MaintenancePolicy,
    current_partition_spec,
    maintain,
    metadata_aggregate,
    plan_pruned_files,
    read_committed,
    set_partition_spec,
    table_history,
    table_partitions,
    table_schema,
    write_partitioned,
)


@pytest.fixture(scope="module")
def registered(spark):
    try:
        spark.dataSource.register(ManifestSinkDataSource)
    except Exception:  # noqa: BLE001 — already registered this session
        pass
    return spark


def _events(spark, lo_day, hi_day):
    rows = [
        (datetime.datetime(2024, 1, d, h, 0), d * 100 + h)
        for d in range(lo_day, hi_day)
        for h in (0, 12)
    ]
    return spark.createDataFrame(rows, "ts timestamp, v int")


class TestDeclaredSpec:
    def test_alter_commit_and_writer_inheritance(
        self, registered, tmp_path
    ):
        path = str(tmp_path / "t")
        write_partitioned(
            registered, _events(registered, 1, 5), path, "ts", "days",
            n_files=2,
        )
        assert current_partition_spec(path) == [
            {"col": "ts", "kind": "days", "arg": None}
        ]
        v = set_partition_spec(path, ("ts", "month"))
        assert table_history(path)[-1]["kind"] == "alter"
        assert current_partition_spec(path) == [
            {"col": "ts", "kind": "month", "arg": None}
        ]
        # a writer with NO explicit transform inherits the declared spec
        write_partitioned(
            registered, _events(registered, 5, 9), path, n_files=2
        )
        assert v == 2

    def test_spec_only_alter_creates_no_naming_eras(
        self, registered, tmp_path
    ):
        """A spec evolution must not trip any rename-era machinery:
        plain reads, metadata aggregates, and schema discovery all
        behave as if never altered."""
        path = str(tmp_path / "t")
        write_partitioned(
            registered, _events(registered, 1, 3), path, "ts", "days",
            n_files=1,
        )
        set_partition_spec(path, ("ts", "month"))
        sch = table_schema(path)
        assert [f.name for f in sch.fields] == ["ts", "v"]
        assert read_committed(registered, path, sch).count() == 4
        agg = metadata_aggregate(path, minmax_cols=["v"])
        assert agg["n_rows"] == 4

    def test_rejections(self, registered, tmp_path):
        path = str(tmp_path / "t")
        with pytest.raises(ValueError, match="no recorded schema"):
            set_partition_spec(path, ("ts", "days"))
        write_partitioned(
            registered, _events(registered, 1, 3), path, "ts", "days",
            n_files=1,
        )
        with pytest.raises(ValueError, match="unknown column"):
            set_partition_spec(path, ("ghost", "days"))
        with pytest.raises(ValueError, match="transform"):
            set_partition_spec(path, ("ts", "fortnights"))


class TestMixedSpecPruning:
    def test_both_eras_prune_under_their_own_spec(
        self, registered, tmp_path
    ):
        path = str(tmp_path / "t")
        # era A: days(ts), 4 files over Jan 1-8
        write_partitioned(
            registered, _events(registered, 1, 9), path, "ts", "days",
            n_files=4,
        )
        set_partition_spec(path, [("ts", "hours")])
        # era B: hours(ts) via writer inheritance, 4 files Jan 9-16
        write_partitioned(
            registered, _events(registered, 9, 17), path, n_files=4
        )
        # a ts range inside era A prunes era-A files by the days
        # transform AND all era-B files by the hours transform
        lo = datetime.datetime(2024, 1, 1, 0, 0)
        hi = datetime.datetime(2024, 1, 2, 23, 59)
        keep, total = plan_pruned_files(path, "ts", lo, hi)
        assert total == 8
        assert 1 <= len(keep) <= 2  # era-A prefix only
        # and a range inside era B symmetrically
        lo = datetime.datetime(2024, 1, 15, 0, 0)
        hi = datetime.datetime(2024, 1, 16, 23, 59)
        keep2, _ = plan_pruned_files(path, "ts", lo, hi)
        assert 1 <= len(keep2) <= 2
        assert not set(keep) & set(keep2)

    def test_table_partitions_references_declared_spec(
        self, registered, tmp_path
    ):
        path = str(tmp_path / "t")
        write_partitioned(
            registered, _events(registered, 1, 5), path, "ts", "days",
            n_files=2,
        )
        set_partition_spec(path, ("ts", "month"))
        write_partitioned(
            registered, _events(registered, 5, 9), path, n_files=1
        )
        # era-A files are unaccounted under the new declared spec
        with pytest.raises(ValueError, match="no value-level"):
            table_partitions(path)
        tp = table_partitions(path, strict=False)
        spec = tp["spec"]
        spec = spec[0] if isinstance(spec, list) else spec
        assert spec["kind"] == "month"
        assert tp["unaccounted_files"] == 2
        assert [(e["partition"], e["n_rows"]) for e in tp["partitions"]] == [
            ([648], 8)
        ]


class TestMaintenancePreservesSpec:
    def test_full_compaction_lands_under_current_spec(
        self, registered, tmp_path
    ):
        from olap_project_spark.export.manifest_sink import delete_where

        path = str(tmp_path / "t")
        write_partitioned(
            registered, _events(registered, 1, 9), path, "ts", "days",
            n_files=4,
        )
        set_partition_spec(path, ("ts", "month"))
        # tombstones force maintain()'s full-compaction arm
        delete_where(
            registered,
            path,
            registered.createDataFrame([(100,)], "v int"),
        )
        report = maintain(
            registered,
            path,
            None,
            MaintenancePolicy(col="v", vacuum=False),
        )
        assert "full_compact" in report["actions"]
        # the rewrite re-partitioned under the CURRENT (month) spec:
        # table$partitions is exact again, under the new spec
        tp = table_partitions(path)
        spec = tp["spec"]
        spec = spec[0] if isinstance(spec, list) else spec
        assert spec["kind"] == "month"
        assert tp["unaccounted_files"] == 0
        assert sum(e["n_rows"] for e in tp["partitions"]) == 15
        assert current_partition_spec(path)[0]["kind"] == "month"


class TestStreamAcrossMetadataAlters:
    def test_tail_passes_spec_and_add_alters_stops_at_widen(
        self, registered, tmp_path
    ):
        """A spec-only or add-column alter is pure metadata: the
        fixed-schema tail reads on by DEFAULT. A widen stops it (files
        written wider cannot scan under the started schema)."""
        from olap_project_spark.export.manifest_sink import (
            add_column,
            ensure_manifest_sink,
            widen_column,
        )

        fmt = ensure_manifest_sink(registered)
        path = str(tmp_path / "t")
        (
            registered.createDataFrame([(1, 10)], "k int, v int")
            .coalesce(1)
            .write.format(fmt)
            .option("path", path)
            .mode("append")
            .save()
        )
        set_partition_spec(path, ("k", "bucket", 4))
        add_column(path, "w", "int")
        (
            registered.createDataFrame(
                [(2, 20, 5)], "k int, v int, w int"
            )
            .coalesce(1)
            .write.format(fmt)
            .option("path", path)
            .mode("append")
            .save()
        )

        def drain(ckpt):
            rows = []
            q = (
                registered.readStream.format(fmt)
                .option("path", path)
                .load()
                .writeStream.foreachBatch(
                    lambda df, _i: rows.extend(
                        (r.k, r.v) for r in df.collect()
                    )
                )
                .option(
                    "checkpointLocation", str(tmp_path / ckpt)
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            return sorted(rows)

        # both metadata alters pass silently; both appends delivered
        assert drain("c1") == [(1, 10), (2, 20)]
        widen_column(path, "v", "bigint")
        (
            registered.createDataFrame(
                [(3, 2**40, 6)], "k int, v bigint, w int"
            )
            .coalesce(1)
            .write.format(fmt)
            .option("path", path)
            .mode("append")
            .save()
        )
        import pytest as _pytest

        with _pytest.raises(Exception, match="widening"):
            q = (
                registered.readStream.format(fmt)
                .option("path", path)
                .load()
                .writeStream.format("noop")
                .option(
                    "checkpointLocation", str(tmp_path / "c2")
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            if q.exception() is not None:
                raise q.exception()
