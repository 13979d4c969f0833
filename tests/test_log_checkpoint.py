"""LOG CHECKPOINTS — the Delta _last_checkpoint / Iceberg
metadata-file mechanism: one JSON bundles the stable prefix of the
manifest log so read planning parses 1 file + the tail. A checkpoint
is a pure PARSE CACHE: reads are driven by the physical listing and
fall back per-version to the files, so it can never change WHAT is
read — these tests pin that invariance under appends, tombstones,
time travel, branches, restores, vacuum, and corruption."""

from __future__ import annotations

import json
import os

import pytest

from olap_project_spark.export.manifest_sink import (
    MaintenancePolicy,
    ManifestSinkDataSource,
    checkpoint_log,
    compact_snapshots,
    delete_where,
    maintain,
    metadata_aggregate,
    publish_branch,
    read_committed,
    read_evolved,
    restore_table,
    table_schema,
    vacuum_snapshots,
)

SCHEMA = "k int, v string"


@pytest.fixture(scope="module")
def registered(spark):
    try:
        spark.dataSource.register(ManifestSinkDataSource)
    except Exception:  # noqa: BLE001 — already registered this session
        pass
    return spark


def _write(spark, path, rows, branch=None):
    w = (
        spark.createDataFrame(rows, SCHEMA)
        .coalesce(1)
        .write.format("manifest_sink")
        .option("path", path)
    )
    if branch:
        w = w.option("branch", branch)
    w.mode("append").save()


def _state(spark, path):
    return sorted(
        (r.k, r.v)
        for r in read_committed(spark, path, table_schema(path)).collect()
    )


class TestCheckpointSemantics:
    def test_reads_identical_before_and_after(self, registered, tmp_path):
        path = str(tmp_path / "t")
        for i in range(5):
            _write(registered, path, [(i, f"r{i}")])
        delete_where(
            registered, path, registered.createDataFrame([(1,)], "k int")
        )
        before = _state(registered, path)
        ck = checkpoint_log(path)
        assert ck["version"] == 6 and ck["bundled"] == 6
        assert os.path.exists(
            os.path.join(path, "_logcheckpoint-000006.json")
        )
        assert _state(registered, path) == before
        # time travel below the checkpoint still answers from the cache
        assert (
            read_committed(registered, path, table_schema(path), as_of=2)
            .count()
            == 2
        )
        # metadata folds read through the cache identically
        with pytest.raises(ValueError, match="tombstones"):
            metadata_aggregate(path)  # unmaterialized delete: still strict

    def test_appends_after_checkpoint_visible(self, registered, tmp_path):
        path = str(tmp_path / "t")
        _write(registered, path, [(1, "a")])
        checkpoint_log(path)
        _write(registered, path, [(2, "b")])
        assert _state(registered, path) == [(1, "a"), (2, "b")]
        # idempotent: nothing new below the stable head -> no-op file
        ck2 = checkpoint_log(path)
        assert ck2["version"] == 2
        ck3 = checkpoint_log(path)
        assert ck3["version"] is None

    def test_branch_commits_stay_out_and_publish_correctly(
        self, registered, tmp_path
    ):
        path = str(tmp_path / "t")
        _write(registered, path, [(1, "a")])
        checkpoint_log(path)
        _write(registered, path, [(9, "staged")], branch="audit")
        # the staged commit postdates the checkpoint: main blind to it
        assert _state(registered, path) == [(1, "a")]
        checkpoint_log(path)  # stable head excludes the branch commit
        publish_branch(path, "audit")
        assert _state(registered, path) == [(1, "a"), (9, "staged")]

    def test_restore_and_vacuum_compose(self, registered, tmp_path):
        path = str(tmp_path / "t")
        _write(registered, path, [(1, "a")])
        _write(registered, path, [(2, "b")])
        checkpoint_log(path)
        restore_table(path, 1)
        assert _state(registered, path) == [(1, "a")]
        compact_snapshots(registered, path, None)
        vacuum_snapshots(path)
        # expired versions never resurrect from the cache (the listing
        # drives reads), and the post-vacuum state is intact
        assert _state(registered, path) == [(1, "a")]

    def test_corrupt_checkpoint_degrades_to_files(
        self, registered, tmp_path
    ):
        path = str(tmp_path / "t")
        _write(registered, path, [(1, "a")])
        ck = checkpoint_log(path)
        f = os.path.join(path, f"_logcheckpoint-{ck['version']:06d}.json")
        with open(f, "w") as fh:
            fh.write("{not json")
        assert _state(registered, path) == [(1, "a")]

    def test_supersession_keeps_one_file(self, registered, tmp_path):
        path = str(tmp_path / "t")
        _write(registered, path, [(1, "a")])
        checkpoint_log(path)
        _write(registered, path, [(2, "b")])
        checkpoint_log(path)
        cks = [
            e
            for e in os.listdir(path)
            if e.startswith("_logcheckpoint-")
        ]
        assert cks == ["_logcheckpoint-000002.json"]

    def test_maintain_writes_checkpoint_on_policy(
        self, registered, tmp_path
    ):
        path = str(tmp_path / "t")
        for i in range(3):
            _write(registered, path, [(i, f"r{i}")])
        delete_where(
            registered, path, registered.createDataFrame([(0,)], "k int")
        )
        report = maintain(
            registered,
            path,
            None,
            MaintenancePolicy(col="k", vacuum=False, checkpoint=True),
        )
        assert any(a.startswith("checkpoint@") for a in report["actions"])
        assert report["checkpoint"]["version"] is not None
        assert _state(registered, path) == [(1, "r1"), (2, "r2")]

    def test_era_reads_through_the_cache(self, registered, tmp_path):
        from olap_project_spark.export.manifest_sink import rename_column

        path = str(tmp_path / "t")
        _write(registered, path, [(1, "a")])
        rename_column(path, "v", "label")
        checkpoint_log(path)
        rows = [
            (r.k, r.label)
            for r in read_evolved(registered, path).collect()
        ]
        assert rows == [(1, "a")]
        agg = metadata_aggregate(path, minmax_cols=["label"])
        assert agg["cols"]["label"] == {
            "nulls": 0,
            "non_null": 1,
            "min": "a",
            "max": "a",
        }
