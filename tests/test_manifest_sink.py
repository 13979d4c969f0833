"""Exactly-once manifest-commit sink: committed files are readable,
uncommitted staging output is invisible, appends accumulate."""

from __future__ import annotations

import json
import os

import pytest

from olap_project_spark.export.manifest_sink import (
    ManifestSinkDataSource,
    read_committed,
)


@pytest.fixture(scope="module")
def registered(spark):
    try:
        spark.dataSource.register(ManifestSinkDataSource)
    except Exception:  # noqa: BLE001 — already registered this session
        pass
    return spark


SCHEMA = "k bigint, v string"


def _write(spark, path, rows):
    (
        spark.createDataFrame(rows, SCHEMA)
        .repartition(4)
        .write.format("manifest_sink")
        .option("path", path)
        .mode("append")
        .save()
    )


class TestManifestSink:
    def test_round_trip_and_manifest_shape(self, registered, tmp_path):
        path = str(tmp_path / "wh")
        rows = [(i, f"v{i}") for i in range(100)]
        _write(registered, path, rows)
        manifests = [e for e in os.listdir(path) if e.startswith("_manifest-")]
        assert len(manifests) == 1
        m = json.load(open(os.path.join(path, manifests[0])))
        assert m["n_rows"] == 100 and len(m["files"]) == 4
        back = read_committed(registered, path, SCHEMA)
        assert sorted((r["k"], r["v"]) for r in back.collect()) == rows

    def test_appends_accumulate_one_manifest_each(self, registered, tmp_path):
        path = str(tmp_path / "wh2")
        _write(registered, path, [(1, "a")])
        _write(registered, path, [(2, "b")])
        assert read_committed(registered, path, SCHEMA).count() == 2
        assert (
            len([e for e in os.listdir(path) if e.startswith("_manifest-")]) == 2
        )

    def test_uncommitted_staging_is_invisible(self, registered, tmp_path):
        path = str(tmp_path / "wh3")
        _write(registered, path, [(1, "a")])
        # simulate a crashed attempt: orphan staging file, no manifest
        orphan = os.path.join(path, "_staging", "part-deadbeef.jsonl")
        with open(orphan, "w") as f:
            f.write(json.dumps({"k": 99, "v": "ghost"}) + "\n")
        got = read_committed(registered, path, SCHEMA)
        assert [r["k"] for r in got.collect()] == [1]


class TestTimeTravel:
    def test_as_of_reads_each_snapshot(self, registered, spark, tmp_path):
        from olap_project_spark.export.manifest_sink import (
            read_committed,
            table_versions,
        )

        path = str(tmp_path / "tt")
        schema = "k bigint, v string"
        spark.createDataFrame([(1, "a")], schema).write.format(
            "manifest_sink"
        ).option("path", path).mode("append").save()
        spark.createDataFrame([(2, "b")], schema).write.format(
            "manifest_sink"
        ).option("path", path).mode("append").save()
        versions = table_versions(path)
        assert versions == [1, 2]
        from pyspark.sql.types import StructType

        sch = spark.createDataFrame([(1, "a")], schema).schema
        v1 = read_committed(spark, path, sch, as_of=1)
        assert sorted(r["k"] for r in v1.collect()) == [1]
        v2 = read_committed(spark, path, sch, as_of=2)
        assert sorted(r["k"] for r in v2.collect()) == [1, 2]
        latest = read_committed(spark, path, sch)
        assert sorted(r["k"] for r in latest.collect()) == [1, 2]

    def test_manifest_carries_its_version(self, registered, spark, tmp_path):
        import json
        import os

        path = str(tmp_path / "ver")
        spark.createDataFrame([(1, "a")], "k bigint, v string").write.format(
            "manifest_sink"
        ).option("path", path).mode("append").save()
        entries = [e for e in os.listdir(path) if e.startswith("_manifest-")]
        assert entries == ["_manifest-000001.json"]
        m = json.load(open(os.path.join(path, entries[0])))
        assert m["version"] == 1


class TestCompaction:
    def test_rewrite_preserves_state_and_time_travel(
        self, registered, spark, tmp_path
    ):
        from olap_project_spark.export.manifest_sink import (
            compact_snapshots,
            read_committed,
            table_versions,
        )

        path = str(tmp_path / "cmp")
        schema = "k bigint, v string"
        sch = spark.createDataFrame([(0, "x")], schema).schema
        for k, v in [(1, "a"), (2, "b"), (3, "c")]:
            spark.createDataFrame([(k, v)], schema).write.format(
                "manifest_sink"
            ).option("path", path).mode("append").save()
        ver = compact_snapshots(spark, path, sch)
        assert ver == 4
        # state after compaction == state before
        latest = read_committed(spark, path, sch)
        assert sorted(r["k"] for r in latest.collect()) == [1, 2, 3]
        # time travel to pre-compaction versions still works
        v2 = read_committed(spark, path, sch, as_of=2)
        assert sorted(r["k"] for r in v2.collect()) == [1, 2]
        # appends after compaction stack on the rewrite base
        spark.createDataFrame([(4, "d")], schema).write.format(
            "manifest_sink"
        ).option("path", path).mode("append").save()
        after = read_committed(spark, path, sch)
        assert sorted(r["k"] for r in after.collect()) == [1, 2, 3, 4]
        assert table_versions(path) == [1, 2, 3, 4, 5]


class TestVacuum:
    """Snapshot expiry + orphan GC (the Iceberg expire_snapshots /
    Delta VACUUM contract on the manifest table)."""

    def test_vacuum_collects_orphans_and_expires_to_rewrite_base(
        self, registered, spark, tmp_path
    ):
        from olap_project_spark.export.manifest_sink import (
            compact_snapshots,
            table_versions,
            vacuum_snapshots,
        )

        from olap_project_spark.export.manifest_sink import table_history

        path = str(tmp_path / "whv")
        _write(registered, path, [(i, f"a{i}") for i in range(3)])
        _write(registered, path, [(i, f"b{i}") for i in (10, 11)])
        n_append_files = sum(h["n_files"] for h in table_history(path))
        # a failed attempt whose abort never ran
        orphan = os.path.join(path, "_staging", "part-zombie.jsonl")
        with open(orphan, "w") as f:
            f.write('{"k": 99, "v": "zombie"}\n')
        base = compact_snapshots(spark, path, SCHEMA)
        assert base == 3
        before = sorted(
            (r["k"], r["v"])
            for r in read_committed(spark, path, SCHEMA).collect()
        )
        stats = vacuum_snapshots(path)
        assert stats["orphans_deleted"] == 1 and not os.path.exists(orphan)
        # both append manifests expired with exactly THEIR staging
        # files (one file per non-empty partition — the lazy-create
        # writer stages nothing for empty ones, so the count is read
        # from the manifests rather than pinned to a partitioner's
        # row placement)
        assert stats["expired_manifests"] == 2
        assert stats["expired_files"] == n_append_files
        assert stats["kept_versions"] == [3] == table_versions(path)
        after = sorted(
            (r["k"], r["v"])
            for r in read_committed(spark, path, SCHEMA).collect()
        )
        assert after == before  # current state untouched
        # time travel is SHORTENED, not corrupted: expired reads are empty
        assert read_committed(spark, path, SCHEMA, as_of=1).count() == 0
        assert read_committed(spark, path, SCHEMA, as_of=3).count() == 5

    def test_vacuum_without_rewrite_removes_only_orphans(
        self, registered, spark, tmp_path
    ):
        from olap_project_spark.export.manifest_sink import (
            table_versions,
            vacuum_snapshots,
        )

        path = str(tmp_path / "whn")
        _write(registered, path, [(1, "x")])
        with open(os.path.join(path, "_staging", "part-orphan.jsonl"), "w") as f:
            f.write('{"k": 2, "v": "y"}\n')
        stats = vacuum_snapshots(path)
        assert stats["orphans_deleted"] == 1
        assert stats["expired_manifests"] == 0 and stats["expired_files"] == 0
        assert table_versions(path) == [1]
        assert read_committed(spark, path, SCHEMA).count() == 1

    def test_vacuum_rejects_non_rewrite_base(self, registered, spark, tmp_path):
        from olap_project_spark.export.manifest_sink import (
            compact_snapshots,
            vacuum_snapshots,
        )

        path = str(tmp_path / "whr")
        _write(registered, path, [(1, "x")])
        _write(registered, path, [(2, "y")])
        compact_snapshots(spark, path, SCHEMA)
        with pytest.raises(ValueError, match="not a main rewrite"):
            vacuum_snapshots(path, keep_from=2)

    def test_vacuum_is_idempotent(self, registered, spark, tmp_path):
        from olap_project_spark.export.manifest_sink import (
            compact_snapshots,
            vacuum_snapshots,
        )

        path = str(tmp_path / "whi")
        _write(registered, path, [(1, "x")])
        compact_snapshots(spark, path, SCHEMA)
        first = vacuum_snapshots(path)
        assert first["expired_manifests"] == 1
        second = vacuum_snapshots(path)
        assert second["orphans_deleted"] == 0
        assert second["expired_manifests"] == 0
        assert second["expired_files"] == 0
        assert read_committed(spark, path, SCHEMA).count() == 1


# ---------------------------------------------------------------------------
# Property: under ANY sequence of appends / planted orphans / compactions
# / vacuums, the committed state never changes except by appends, and
# vacuum only ever removes what is provably dead (orphans + manifests
# before the latest rewrite base).
# ---------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

op_strategy = st.sampled_from(["append", "orphan", "compact", "vacuum"])


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(op_strategy, min_size=1, max_size=6))
def test_vacuum_preserves_committed_state(registered, spark, tmp_path, ops):
    from olap_project_spark.export.manifest_sink import (
        compact_snapshots,
        table_versions,
        vacuum_snapshots,
    )

    path = str(tmp_path / ("whp_" + "".join(o[0] for o in ops)))
    model: list[tuple[int, str]] = []  # expected committed rows
    next_k = 0
    latest_rewrite = None
    for op in ops:
        if op == "append":
            rows = [(next_k + i, f"r{next_k + i}") for i in range(2)]
            next_k += 2
            _write(registered, path, rows)
            model.extend(rows)
        elif op == "orphan":
            staging = os.path.join(path, "_staging")
            os.makedirs(staging, exist_ok=True)
            with open(os.path.join(staging, f"part-orphan{next_k}.jsonl"), "w") as f:
                f.write('{"k": -1, "v": "zombie"}\n')
        elif op == "compact":
            if not table_versions(path):
                continue  # nothing committed yet
            latest_rewrite = compact_snapshots(spark, path, SCHEMA)
        elif op == "vacuum":
            if not os.path.isdir(path):
                continue
            stats = vacuum_snapshots(path)
            if latest_rewrite is not None:
                assert min(stats["kept_versions"]) >= latest_rewrite
        if os.path.isdir(path):
            got = sorted(
                (r["k"], r["v"])
                for r in read_committed(spark, path, SCHEMA).collect()
            )
            assert got == sorted(model)
    # terminal orphan sweep is always safe and total
    if os.path.isdir(path):
        vacuum_snapshots(path)
        got = sorted(
            (r["k"], r["v"])
            for r in read_committed(spark, path, SCHEMA).collect()
        )
        assert got == sorted(model)


class TestSchemaEvolution:
    def test_add_column_null_backfill_and_versioned_schema(
        self, registered, tmp_path
    ):
        from olap_project_spark.export.manifest_sink import (
            read_evolved,
            table_schema,
        )

        path = str(tmp_path / "evo")
        _write(registered, path, [(1, "a"), (2, "b")])
        (
            registered.createDataFrame(
                [(3, "c", 30)], "k bigint, v string, extra int"
            )
            .coalesce(1)
            .write.format("manifest_sink")
            .option("path", path)
            .mode("append")
            .save()
        )
        # schema discovery: v1 is the old 2-column schema, latest has 3
        assert [f.name for f in table_schema(path, as_of=1).fields] == ["k", "v"]
        assert "extra" in [f.name for f in table_schema(path).fields]
        # time travel reads the OLD schema
        v1 = read_evolved(registered, path, as_of=1)
        assert v1.columns == ["k", "v"] and v1.count() == 2
        # latest read null-backfills the added column for old files
        latest = read_evolved(registered, path).collect()
        got = {r["k"]: r["extra"] for r in latest}
        assert got == {1: None, 2: None, 3: 30}

    def test_non_additive_evolution_rejected(self, registered, tmp_path):
        from olap_project_spark.export.manifest_sink import table_schema

        path = str(tmp_path / "evo_bad")
        _write(registered, path, [(1, "a")])
        # a write that DROPS column v (rename/delete) must be caught
        (
            registered.createDataFrame([(2,)], "k bigint")
            .coalesce(1)
            .write.format("manifest_sink")
            .option("path", path)
            .mode("append")
            .save()
        )
        with pytest.raises(ValueError, match="not\\s+add-only"):
            table_schema(path)

    def test_schemaless_legacy_manifests_tolerated(
        self, registered, spark, tmp_path
    ):
        from olap_project_spark.export.manifest_sink import table_schema

        path = str(tmp_path / "legacy")
        _write(registered, path, [(1, "a")])
        # simulate a pre-evolution manifest: strip the schema field
        m_file = next(
            os.path.join(path, e)
            for e in os.listdir(path)
            if e.startswith("_manifest-")
        )
        m = json.load(open(m_file))
        m.pop("schema", None)
        json.dump(m, open(m_file, "w"))
        assert table_schema(path) is None
        # read_committed with an explicit schema still works unchanged
        back = read_committed(registered, path, SCHEMA)
        assert back.count() == 1


class TestFileSkipping:
    def test_zone_maps_prune_files_not_rows(self, registered, tmp_path):
        from olap_project_spark.export.manifest_sink import (
            plan_pruned_files,
            read_pruned,
        )

        path = str(tmp_path / "zm")
        # three disjoint key ranges → three single-file appends
        for lo in (0, 100, 200):
            (
                registered.createDataFrame(
                    [(lo + i, f"v{lo + i}") for i in range(50)], SCHEMA
                )
                .coalesce(1)
                .write.format("manifest_sink")
                .option("path", path)
                .mode("append")
                .save()
            )
        files, total = plan_pruned_files(path, "k", 120, 130)
        assert total == 3 and len(files) == 1
        got = (
            read_pruned(registered, path, SCHEMA, "k", 120, 130)
            .filter("k BETWEEN 120 AND 130")
            .count()
        )
        assert got == 11
        # skipping may drop FILES, never ROWS: equal to the full scan
        full = (
            read_committed(registered, path, SCHEMA)
            .filter("k BETWEEN 120 AND 130")
            .count()
        )
        assert got == full

    def test_files_without_stats_conservatively_kept(
        self, registered, tmp_path
    ):
        import json as _json

        from olap_project_spark.export.manifest_sink import plan_pruned_files

        path = str(tmp_path / "zm_legacy")
        _write(registered, path, [(1, "a"), (2, "b")])
        m_file = next(
            os.path.join(path, e)
            for e in os.listdir(path)
            if e.startswith("_manifest-")
        )
        m = _json.load(open(m_file))
        # a genuinely pre-stats manifest records neither zone maps nor
        # row counts (a recorded rows=0 file IS provably excludable —
        # the round-11 empty-file rule — so it must go too)
        m.pop("file_stats", None)
        m.pop("file_rows", None)
        _json.dump(m, open(m_file, "w"))
        files, total = plan_pruned_files(path, "k", 10**9, 10**9 + 1)
        assert len(files) == total  # nothing provably excludable

    def test_null_bearing_column_never_prunes(self, registered, tmp_path):
        from olap_project_spark.export.manifest_sink import plan_pruned_files

        path = str(tmp_path / "zm_nulls")
        (
            registered.createDataFrame(
                [(1, "a"), (None, "b")], SCHEMA
            )
            .coalesce(1)
            .write.format("manifest_sink")
            .option("path", path)
            .mode("append")
            .save()
        )
        files, total = plan_pruned_files(path, "k", 10**9, 10**9 + 1)
        assert len(files) == total == 1  # null seen → zone map disabled


class TestVersionDelta:
    def test_delta_reads_only_new_rows(self, registered, tmp_path):
        from olap_project_spark.export.manifest_sink import read_version_delta

        path = str(tmp_path / "cdf")
        _write(registered, path, [(i, f"v{i}") for i in range(10)])
        _write(registered, path, [(i, f"v{i}") for i in range(10, 25)])
        d01 = read_version_delta(registered, path, SCHEMA, 0, 1)
        d12 = read_version_delta(registered, path, SCHEMA, 1, 2)
        assert d01.count() == 10 and d12.count() == 15
        assert read_version_delta(registered, path, SCHEMA, 2, 2).count() == 0

    def test_delta_across_rewrite_rejected(self, registered, spark, tmp_path):
        from olap_project_spark.export.manifest_sink import (
            compact_snapshots,
            read_version_delta,
        )

        path = str(tmp_path / "cdf_rw")
        _write(registered, path, [(1, "a")])
        _write(registered, path, [(2, "b")])
        compact_snapshots(registered, path, SCHEMA)  # version 3 = rewrite
        with pytest.raises(ValueError, match="rewrite"):
            read_version_delta(registered, path, SCHEMA, 1, 3)
        # a delta range before the rewrite still works
        assert read_version_delta(registered, path, SCHEMA, 0, 2).count() == 2


class TestColumnarDataPlane:
    """Round 9: the staging files under the manifest table are parquet
    (columnar data plane). The commit/skip/CDF/evolution contracts are
    format-agnostic and stay pinned by the classes above; these pin the
    columnar properties — file format, column pruning in the physical
    plan, predicate pushdown into the scan, and the JSONL migration
    path."""

    def test_staging_files_are_parquet(self, registered, tmp_path):
        path = str(tmp_path / "colwh")
        _write(registered, path, [(i, f"v{i}") for i in range(20)])
        staging = os.listdir(os.path.join(path, "_staging"))
        assert staging and all(n.endswith(".parquet") for n in staging)

    def test_committed_scan_prunes_columns_and_pushes_filters(
        self, registered, tmp_path
    ):
        path = str(tmp_path / "colwh2")
        _write(registered, path, [(i, f"v{i}") for i in range(50)])
        scan = read_committed(registered, path, SCHEMA).select("k").filter(
            "k = 7"
        )
        plan = scan._jdf.queryExecution().executedPlan().toString()
        # column pruning: the parquet scan reads ONLY k, not v
        assert "ReadSchema: struct<k:bigint>" in plan, plan
        # predicate pushdown: the filter reaches the scan
        assert "EqualTo(k,7)" in plan, plan
        assert scan.count() == 1

    def test_legacy_jsonl_files_remain_readable(self, registered, tmp_path):
        """Pre-columnar tables (JSONL staging files) still read, and a
        compaction migrates them to parquet — the format-migration
        story."""
        from olap_project_spark.export.manifest_sink import (
            compact_snapshots,
        )

        path = str(tmp_path / "legacy")
        # new-format commit first
        _write(registered, path, [(1, "new")])
        # hand-write a legacy JSONL commit (what the pre-round-9 writer
        # produced): a staging .jsonl file + a manifest referencing it
        staging = os.path.join(path, "_staging")
        with open(os.path.join(staging, "part-legacy0.jsonl"), "w") as f:
            f.write(json.dumps({"k": 2, "v": "old"}) + "\n")
        with open(os.path.join(path, "_manifest-000002.json"), "w") as f:
            json.dump(
                {
                    "kind": "append",
                    "files": ["part-legacy0.jsonl"],
                    "n_rows": 1,
                    "version": 2,
                },
                f,
            )
        back = read_committed(registered, path, SCHEMA)
        assert sorted((r.k, r.v) for r in back.collect()) == [
            (1, "new"),
            (2, "old"),
        ]
        # compaction rewrites the mixed table into pure parquet
        compact_snapshots(registered, path, SCHEMA)
        from olap_project_spark.export.manifest_sink import _committed_files

        assert all(
            n.endswith(".parquet") for n, _ in _committed_files(path)
        )
        assert read_committed(registered, path, SCHEMA).count() == 2


class TestVacuumInFlightGuard:
    def test_orphan_gc_skipped_under_in_flight_commit(
        self, registered, tmp_path
    ):
        """A version file claimed via O_EXCL but not yet replaced with
        content is a commit in flight: its freshly-written staging
        files are unreferenced by any parseable manifest and must NOT
        be GC'd as orphans. The guard disables orphan deletion for the
        run (and reports it), instead of relying on the documented
        maintenance-window precondition."""
        from olap_project_spark.export.manifest_sink import (
            vacuum_snapshots,
        )

        path = str(tmp_path / "vwh")
        _write(registered, path, [(1, "a")])
        staging = os.path.join(path, "_staging")
        # the in-flight commit: claimed (empty) version file + its
        # freshly-written staging data
        open(os.path.join(path, "_manifest-000002.json"), "w").close()
        live = os.path.join(staging, "part-inflight.parquet")
        with open(live, "wb") as f:
            f.write(b"PAR1")
        # plus a genuine orphan that WOULD be deleted in a clean run
        with open(os.path.join(staging, "part-orphan.jsonl"), "w") as f:
            f.write("{}\n")
        stats = vacuum_snapshots(path)
        assert stats["in_flight_commits"] == 1
        assert stats["orphans_deleted"] == 0
        assert os.path.exists(live)  # the live commit's data survived
        # once the commit completes (file now parseable), GC resumes
        with open(os.path.join(path, "_manifest-000002.json"), "w") as f:
            json.dump(
                {
                    "kind": "append",
                    "files": ["part-inflight.parquet"],
                    "n_rows": 0,
                    "version": 2,
                },
                f,
            )
        stats2 = vacuum_snapshots(path)
        assert stats2["in_flight_commits"] == 0
        assert stats2["orphans_deleted"] == 1
        assert os.path.exists(live)


class TestDeletionVectors:
    """Round 9: Iceberg-v2-style equality deletes — merge-on-read
    tombstones, sequence-correct reinsertion, time travel to undeleted
    states, pruned reads that never resurrect rows, the append-only
    CDF guard, and compaction as the materialization point."""

    def _table(self, registered, tmp_path):
        path = str(tmp_path / "dv")
        _write(registered, path, [(i, f"v{i}") for i in range(5)])  # v1
        from olap_project_spark.export.manifest_sink import delete_where

        delete_where(
            registered, path, registered.createDataFrame([(1,), (3,)], "k bigint")
        )  # v2
        _write(registered, path, [(1, "reborn")])  # v3
        return path

    def test_merge_on_read_with_reinsert(self, registered, tmp_path):
        path = self._table(registered, tmp_path)
        got = sorted(
            (r.k, r.v) for r in read_committed(registered, path, SCHEMA).collect()
        )
        # keys 1 and 3 deleted at v2; key 1 re-inserted at v3 SURVIVES
        # (the sequence-number rule) while 3 stays gone
        assert got == [(0, "v0"), (1, "reborn"), (2, "v2"), (4, "v4")]

    def test_time_travel_spans_the_delete(self, registered, tmp_path):
        path = self._table(registered, tmp_path)
        assert read_committed(registered, path, SCHEMA, as_of=1).count() == 5
        assert read_committed(registered, path, SCHEMA, as_of=2).count() == 3

    def test_pruned_read_applies_tombstones(self, registered, tmp_path):
        from olap_project_spark.export.manifest_sink import read_pruned

        path = self._table(registered, tmp_path)
        got = sorted(
            r.k for r in read_pruned(registered, path, SCHEMA, "k", 0, 9).collect()
        )
        assert got == [0, 1, 2, 4]

    def test_cdf_rejects_delete_crossing_range(self, registered, tmp_path):
        from olap_project_spark.export.manifest_sink import read_version_delta

        path = self._table(registered, tmp_path)
        with pytest.raises(ValueError, match="delete"):
            read_version_delta(registered, path, SCHEMA, 1, 3)
        # ranges not crossing the delete still work
        assert read_version_delta(registered, path, SCHEMA, 2, 3).count() == 1

    def test_compaction_materializes_deletes(self, registered, tmp_path):
        from olap_project_spark.export.manifest_sink import (
            _committed_files,
            compact_snapshots,
            table_history,
            vacuum_snapshots,
        )

        path = self._table(registered, tmp_path)
        before = sorted(
            (r.k, r.v) for r in read_committed(registered, path, SCHEMA).collect()
        )
        compact_snapshots(registered, path, SCHEMA)
        hist = table_history(path)
        assert [h["kind"] for h in hist] == [
            "append",
            "delete",
            "append",
            "rewrite",
        ]
        # post-compaction state identical, now tombstone-free
        after = sorted(
            (r.k, r.v) for r in read_committed(registered, path, SCHEMA).collect()
        )
        assert after == before
        vacuum_snapshots(path)
        assert sorted(
            (r.k, r.v) for r in read_committed(registered, path, SCHEMA).collect()
        ) == before
        # no tombstone manifests survive the expiry
        from olap_project_spark.export.manifest_sink import _log

        assert [m.get("kind") for _, m in _log(path)] == ["rewrite"]

    def test_delete_schema_excluded_from_evolution(self, registered, tmp_path):
        """The tombstone key schema is a SUBSET of the table schema by
        design; it must not trip the add-only evolution check."""
        from olap_project_spark.export.manifest_sink import table_schema

        path = self._table(registered, tmp_path)
        sch = table_schema(path)
        assert sch is not None and {f.name for f in sch.fields} == {"k", "v"}


class TestWriteAuditPublish:
    """Round 9: WAP branches — branch-tagged commits claim versions in
    the shared sequence but stay invisible to main readers until
    published (atomic tag drop); publish is fast-forward-only; a red
    audit abandons the branch with pure GC."""

    def _w(self, registered, path, rows, branch=None):
        wr = (
            registered.createDataFrame(rows, SCHEMA)
            .coalesce(1)
            .write.format("manifest_sink")
            .option("path", path)
            .mode("append")
        )
        if branch:
            wr = wr.option("branch", branch)
        wr.save()

    def test_branch_isolation_and_publish(self, registered, tmp_path):
        from olap_project_spark.export.manifest_sink import publish_branch

        path = str(tmp_path / "wap")
        self._w(registered, path, [(0, "a"), (1, "b")])
        self._w(registered, path, [(2, "staged")], branch="audit")
        # main readers blind to the staged commit; the branch reader
        # sees main + staged (branch-from-main-head)
        assert read_committed(registered, path, SCHEMA).count() == 2
        assert (
            read_committed(registered, path, SCHEMA, branch="audit").count()
            == 3
        )
        assert publish_branch(path, "audit") == [2]
        assert read_committed(registered, path, SCHEMA).count() == 3

    def test_abandon_is_pure_gc(self, registered, tmp_path):
        from olap_project_spark.export.manifest_sink import (
            _committed_files,
            abandon_branch,
        )

        path = str(tmp_path / "wap2")
        self._w(registered, path, [(0, "a")])
        self._w(registered, path, [(1, "BAD")], branch="audit")
        assert abandon_branch(path, "audit") == 1
        assert read_committed(registered, path, SCHEMA).count() == 1
        # no dangling staging files: every staging file is referenced
        staging = os.listdir(os.path.join(path, "_staging"))
        referenced = {f for f, _ in _committed_files(path)}
        assert set(staging) == referenced

    def test_publish_is_fast_forward_only(self, registered, tmp_path):
        from olap_project_spark.export.manifest_sink import publish_branch

        path = str(tmp_path / "wap3")
        self._w(registered, path, [(0, "a")])
        self._w(registered, path, [(1, "staged")], branch="b")
        self._w(registered, path, [(2, "mainmoved")])  # main advances
        with pytest.raises(ValueError, match="fast-forward"):
            publish_branch(path, "b")
        # main unaffected by the failed publish
        assert read_committed(registered, path, SCHEMA).count() == 2


class TestBloomSkipping:
    def test_bloom_prunes_absent_keeps_present(self, registered, tmp_path):
        """Opt-in per-file blooms: a present value's file is never
        skipped (no false negatives); an absent value inside the range
        — which zone maps cannot exclude — skips almost everything."""
        from olap_project_spark.export.manifest_sink import (
            plan_bloom_pruned_files,
            plan_pruned_files,
        )

        path = str(tmp_path / "bloomwh")
        (
            registered.createDataFrame(
                [(i, f"v{i}") for i in range(0, 400, 2)], SCHEMA
            )
            .repartition(4)
            .write.format("manifest_sink")
            .option("path", path)
            .option("bloom_col", "k")
            .mode("append")
            .save()
        )
        # present (even) probes: bloom keeps at least the true file,
        # and reading only bloom-kept files finds the row
        from olap_project_spark.export.manifest_sink import _read_files

        for v in (0, 100, 398):
            files, total = plan_bloom_pruned_files(path, "k", v)
            assert total == 4
            got = (
                _read_files(registered, path, SCHEMA, files)
                .filter(f"k = {v}")
                .count()
            )
            assert got == 1, v
        # absent (odd) probes: inside [0, 398], zone maps keep all
        # hash-distributed files; bloom keeps almost none
        bloom_kept = zone_kept = 0
        for v in (1, 101, 399):
            bfiles, _ = plan_bloom_pruned_files(path, "k", v)
            zfiles, _ = plan_pruned_files(path, "k", v, v)
            bloom_kept += len(bfiles)
            zone_kept += len(zfiles)
        # zone maps prune little for in-range probes (file [min,max]
        # on 100 hash-distributed evens mostly spans the probes);
        # blooms exclude them almost entirely
        assert bloom_kept < zone_kept
        assert bloom_kept <= 2

    def test_files_without_bloom_conservatively_kept(
        self, registered, tmp_path
    ):
        from olap_project_spark.export.manifest_sink import (
            plan_bloom_pruned_files,
        )

        path = str(tmp_path / "bloomwh2")
        _write(registered, path, [(1, "a")])  # no bloom_col option
        files, total = plan_bloom_pruned_files(path, "k", 999)
        assert len(files) == total  # never skip un-bloomed files


# ---------------------------------------------------------------------------
# Round 9: the same arbitrary-interleaving discipline over the FULL
# table-format surface — appends, equality deletes, WAP branch cycles
# (stage+publish / stage+abandon), orphans, compaction, vacuum — with a
# pure-Python model of the committed state checked after every step.
# ---------------------------------------------------------------------------
lifecycle_op = st.sampled_from(
    ["append", "delete", "stage_publish", "stage_abandon",
     "orphan", "compact", "vacuum"]
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(lifecycle_op, min_size=2, max_size=7))
def test_full_lifecycle_preserves_committed_state(
    registered, spark, tmp_path, ops
):
    from olap_project_spark.export.manifest_sink import (
        abandon_branch,
        compact_snapshots,
        delete_where,
        publish_branch,
        table_versions,
        vacuum_snapshots,
    )

    path = str(tmp_path / ("wfl_" + "".join(o[0] for o in ops)))
    model: list[tuple[int, str]] = []
    next_k = 0
    latest_rewrite = None
    for op in ops:
        if op == "append":
            rows = [(next_k + i, f"r{next_k + i}") for i in range(2)]
            next_k += 2
            _write(registered, path, rows)
            model.extend(rows)
        elif op == "delete":
            if not model:
                continue
            k = model[0][0]
            delete_where(
                registered,
                path,
                registered.createDataFrame([(k,)], "k bigint").repartition(1),
            )
            model = [r for r in model if r[0] != k]
        elif op == "stage_publish":
            rows = [(next_k, f"b{next_k}")]
            next_k += 1
            (
                registered.createDataFrame(rows, SCHEMA)
                .repartition(1)
                .write.format("manifest_sink")
                .option("path", path)
                .option("branch", "wip")
                .mode("append")
                .save()
            )
            # main must not see it until the publish
            got = sorted(
                (r["k"], r["v"])
                for r in read_committed(registered, path, SCHEMA).collect()
            )
            assert got == sorted(model)
            publish_branch(path, "wip")
            model.extend(rows)
        elif op == "stage_abandon":
            (
                registered.createDataFrame([(-9, "bad")], SCHEMA)
                .repartition(1)
                .write.format("manifest_sink")
                .option("path", path)
                .option("branch", "trash")
                .mode("append")
                .save()
            )
            abandon_branch(path, "trash")
        elif op == "orphan":
            staging = os.path.join(path, "_staging")
            os.makedirs(staging, exist_ok=True)
            with open(
                os.path.join(staging, f"part-orphan{next_k}.jsonl"), "w"
            ) as f:
                f.write('{"k": -1, "v": "zombie"}\n')
        elif op == "compact":
            if not table_versions(path):
                continue
            latest_rewrite = compact_snapshots(registered, path, SCHEMA)
        elif op == "vacuum":
            if not os.path.isdir(path):
                continue
            stats = vacuum_snapshots(path)
            if latest_rewrite is not None:
                assert min(stats["kept_versions"]) >= latest_rewrite
        if os.path.isdir(path):
            got = sorted(
                (r["k"], r["v"])
                for r in read_committed(registered, path, SCHEMA).collect()
            )
            assert got == sorted(model), op


class TestStreamTail:
    def test_tail_rejects_rewrite_in_range(self, registered, tmp_path):
        """A compaction inside the un-consumed range must fail the
        tail loudly (append-only CDF rule), not silently re-deliver."""
        import uuid as _uuid

        from olap_project_spark.export.manifest_sink import (
            compact_snapshots,
            ensure_manifest_sink,
        )

        fmt = ensure_manifest_sink(registered)
        path = str(tmp_path / "tailrw")
        _write(registered, path, [(1, "a")])
        compact_snapshots(registered, path, SCHEMA)
        name = "tailrw_" + _uuid.uuid4().hex[:6]
        from pyspark.errors.exceptions.captured import (
            StreamingQueryException,
        )

        q = (
            registered.readStream.format(fmt)
            .option("path", path)
            .load()
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        with pytest.raises(StreamingQueryException, match="append-only"):
            q.awaitTermination(120)

    def test_schema_discovered_from_log(self, registered, tmp_path):
        from olap_project_spark.export.manifest_sink import (
            ensure_manifest_sink,
        )

        fmt = ensure_manifest_sink(registered)
        path = str(tmp_path / "tailschema")
        _write(registered, path, [(7, "x")])
        stream = registered.readStream.format(fmt).option("path", path).load()
        assert [f.name for f in stream.schema.fields] == ["k", "v"]
