"""Materialized views with CDF-driven incremental refresh: signed-delta
maintenance (O(changes), never a base re-scan), zero-count keys as
filtered tombstone rows (single-commit atomicity), full-recompute
fallback across base compactions, freshness accounting, and the
commit-stamped exactly-once recovery."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olap_project_spark.export.manifest_sink import (
    ManifestSinkDataSource,
    compact_snapshots,
    delete_where,
    read_committed,
    restore_table,
    table_history,
    table_schema,
)
from olap_project_spark.export.matview import (
    mv_create,
    mv_read,
    mv_refresh,
    mv_status,
)

SCHEMA = "k string, v bigint"
SPEC = {"group_by": ["k"], "aggs": [{"expr": "v", "as": "sum_v"}]}


@pytest.fixture(scope="module")
def registered(spark):
    try:
        spark.dataSource.register(ManifestSinkDataSource)
    except Exception:  # noqa: BLE001 — already registered this session
        pass
    return spark


def _write(spark, base, rows):
    (
        spark.createDataFrame(rows, SCHEMA)
        .coalesce(1)
        .write.format("manifest_sink")
        .option("path", base)
        .mode("append")
        .save()
    )


def _state(spark, view):
    return sorted((r.k, r.sum_v) for r in mv_read(spark, view).collect())


def _truth(spark, base):
    df = read_committed(spark, base, table_schema(base))
    return sorted(
        (r.k, r.s)
        for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()
    )


class TestLifecycle:
    def test_create_refresh_delete_fallback(self, registered, tmp_path):
        base, view = str(tmp_path / "b"), str(tmp_path / "v")
        _write(registered, base, [("a", 10), ("a", 5), ("b", 7)])
        meta = mv_create(registered, view, base, SPEC)
        assert meta["base_version"] == 1
        assert _state(registered, view) == _truth(registered, base)

        _write(registered, base, [("b", 3), ("c", 1)])
        st = mv_status(view)
        assert st["lag_versions"] == 1 and not st["fresh"]
        r = mv_refresh(registered, view)
        assert r["mode"] == "incremental"
        assert r["keys_upserted"] == 2 and r["keys_deleted"] == 0
        assert _state(registered, view) == _truth(registered, base)

        # deleting EVERY base row of a key removes the key atomically
        delete_where(
            registered, base, registered.createDataFrame([("a",)], "k string")
        )
        r2 = mv_refresh(registered, view)
        assert r2["mode"] == "incremental" and r2["keys_deleted"] == 1
        assert _state(registered, view) == _truth(registered, base)
        assert ("a", 15) not in _state(registered, view)

        # base compaction in the unrefreshed range → atomic full rebuild
        _write(registered, base, [("d", 9)])
        compact_snapshots(registered, base, SCHEMA)
        r3 = mv_refresh(registered, view)
        assert r3["mode"] == "full"
        assert _state(registered, view) == _truth(registered, base)
        # the fallback committed ONE rewrite snapshot on the view
        assert table_history(view)[-1]["kind"] == "rewrite"

        assert mv_refresh(registered, view)["mode"] == "noop"
        assert mv_status(view)["fresh"]

    def test_refresh_across_base_restore(self, registered, tmp_path):
        base, view = str(tmp_path / "b"), str(tmp_path / "v")
        _write(registered, base, [("a", 1)])
        mv_create(registered, view, base, SPEC)
        _write(registered, base, [("b", 2)])
        restore_table(base, 1)  # CDF emits the symmetric diff
        r = mv_refresh(registered, view)
        assert r["mode"] == "incremental"
        assert _state(registered, view) == [("a", 1)]

    def test_refresh_is_atomic_to_view_readers(self, registered, tmp_path):
        """A refresh that both updates and removes keys is ONE merge
        commit (zero-count keys become filtered tombstone rows), so
        EVERY committed view version — including time-travel reads —
        shows exactly the old or the new state, never a half-applied
        refresh."""
        base, view = str(tmp_path / "b"), str(tmp_path / "v")
        _write(registered, base, [("a", 1), ("b", 2)])
        mv_create(registered, view, base, SPEC)
        delete_where(
            registered, base, registered.createDataFrame([("a",)], "k string")
        )
        _write(registered, base, [("b", 5)])
        r = mv_refresh(registered, view)
        assert r["keys_deleted"] == 1
        sch = table_schema(view)
        states = []
        for h in table_history(view):
            rows = (
                read_committed(registered, view, sch, as_of=h["version"])
                .filter(F.col("_mv_count") > 0)
                .collect()
            )
            states.append(sorted((r.k, r.sum_v) for r in rows))
        old = [("a", 1), ("b", 2)]
        new = [("b", 7)]
        assert all(s in (old, new) for s in states), states

    def test_vacuum_purges_tombstone_rows(self, registered, tmp_path):
        from olap_project_spark.export.matview import mv_vacuum

        base, view = str(tmp_path / "b"), str(tmp_path / "v")
        _write(registered, base, [("a", 1), ("b", 2)])
        mv_create(registered, view, base, SPEC)
        delete_where(
            registered, base, registered.createDataFrame([("a",)], "k string")
        )
        mv_refresh(registered, view)
        assert mv_vacuum(registered, view) == 1
        # physically gone now, and the visible state is unchanged
        raw = read_committed(registered, view, table_schema(view))
        assert raw.count() == 1
        assert _state(registered, view) == [("b", 2)]
        assert mv_vacuum(registered, view) == 0


class TestRejections:
    def test_double_create_and_bad_spec(self, registered, tmp_path):
        base, view = str(tmp_path / "b"), str(tmp_path / "v")
        _write(registered, base, [("a", 1)])
        mv_create(registered, view, base, SPEC)
        with pytest.raises(ValueError, match="already exists"):
            mv_create(registered, view, base, SPEC)
        with pytest.raises(ValueError, match="group_by"):
            mv_create(
                registered, str(tmp_path / "v2"), base, {"group_by": []}
            )


class TestMinMax:
    """MIN/MAX views: incremental on insert-only ranges via
    least/greatest folds (NULL-correct), demoted to the atomic full
    recompute ONLY when a delete leg survives the view's own WHERE
    filter — a delete outside the filter stays incremental."""

    SPEC_MM = {
        "group_by": ["k"],
        "aggs": [
            {"expr": "v", "as": "mn", "fn": "min"},
            {"expr": "v", "as": "mx", "fn": "max"},
            {"expr": "v", "as": "sum_v", "fn": "sum"},
        ],
    }

    def _mm(self, spark, view):
        return sorted(
            (r.k, r.mn, r.mx, r.sum_v)
            for r in mv_read(spark, view).collect()
        )

    def test_insert_only_incremental_null_correct(
        self, registered, tmp_path
    ):
        base, view = str(tmp_path / "b"), str(tmp_path / "v")
        _write(registered, base, [("a", 10), ("a", None), ("b", 7)])
        mv_create(registered, view, base, self.SPEC_MM)
        assert self._mm(registered, view) == [
            ("a", 10, 10, 10),
            ("b", 7, 7, 7),
        ]
        # insert-only range: a's slice is all-NULL (extrema keep),
        # b's tightens the min, and the mode stays incremental
        _write(registered, base, [("a", None), ("b", 2)])
        r = mv_refresh(registered, view)
        assert r["mode"] == "incremental"
        assert self._mm(registered, view) == [
            ("a", 10, 10, 10),
            ("b", 2, 7, 9),
        ]
        # a delete leg demotes exactly one refresh to a full rewrite
        delete_where(
            registered,
            base,
            registered.createDataFrame([(7,)], "v bigint"),
        )
        r = mv_refresh(registered, view)
        assert r["mode"] == "full"
        assert self._mm(registered, view) == [
            ("a", 10, 10, 10),
            ("b", 2, 2, 2),
        ]
        # and the next append-only range is incremental again
        _write(registered, base, [("c", 4)])
        r = mv_refresh(registered, view)
        assert r["mode"] == "incremental"
        assert self._mm(registered, view) == [
            ("a", 10, 10, 10),
            ("b", 2, 2, 2),
            ("c", 4, 4, 4),
        ]

    def test_filtered_minmax_delete_outside_filter_stays_incremental(
        self, registered, tmp_path
    ):
        base, view = str(tmp_path / "b"), str(tmp_path / "v")
        spec = dict(self.SPEC_MM, where="v >= 5")
        _write(registered, base, [("a", 10), ("a", 3), ("b", 7)])
        mv_create(registered, view, base, spec)
        assert self._mm(registered, view) == [
            ("a", 10, 10, 10),
            ("b", 7, 7, 7),
        ]
        # the deleted row never passed the WHERE: the filtered slice
        # carries no delete leg, so the refresh stays incremental
        delete_where(
            registered,
            base,
            registered.createDataFrame([(3,)], "v bigint"),
        )
        r = mv_refresh(registered, view)
        assert r["mode"] == "incremental"
        assert self._mm(registered, view) == [
            ("a", 10, 10, 10),
            ("b", 7, 7, 7),
        ]
        # deleting an in-filter row demotes; the emptied key vanishes
        delete_where(
            registered,
            base,
            registered.createDataFrame([(10,)], "v bigint"),
        )
        r = mv_refresh(registered, view)
        assert r["mode"] == "full"
        assert self._mm(registered, view) == [("b", 7, 7, 7)]


class TestExactlyOnceRecovery:
    def test_stale_meta_cache_cannot_double_apply(
        self, registered, tmp_path
    ):
        """A crash between the refresh commit and the _mv.json write
        leaves a stale cache; recovery must reconcile from the view's
        OWN commit log (the stamped mv_to props) and refuse to re-fold
        the already-applied range."""
        import json
        import os

        base, view = str(tmp_path / "b"), str(tmp_path / "v")
        _write(registered, base, [("a", 1)])
        mv_create(registered, view, base, SPEC)
        _write(registered, base, [("a", 2)])
        mv_refresh(registered, view)
        assert _state(registered, view) == [("a", 3)]
        # simulate the crash: roll the cache back to the pre-refresh
        # base version (the refresh commit itself is already durable)
        mp = os.path.join(view, "_mv.json")
        meta = json.load(open(mp))
        meta["base_version"] = 1
        json.dump(meta, open(mp, "w"))
        r = mv_refresh(registered, view)
        assert r["mode"] == "noop"  # recovered, not double-applied
        assert _state(registered, view) == [("a", 3)]
        # and the cache healed itself
        assert json.load(open(mp))["base_version"] == meta["base_version"] + 1


class TestCreateRace:
    def test_create_pins_the_captured_head(
        self, registered, tmp_path, monkeypatch
    ):
        """A base commit landing between mv_create's head capture and
        its initial read must NOT leak into the built view (it would be
        double-counted by the next incremental refresh). Reproduced
        deterministically by making the head capture see a stale log
        (round-11 advice, medium)."""
        import olap_project_spark.export.matview as mv

        base, view = str(tmp_path / "b"), str(tmp_path / "v")
        _write(registered, base, [("a", 1), ("b", 2)])  # v1
        _write(registered, base, [("a", 10)])  # v2 — the racing commit

        real = mv.committed_versions
        monkeypatch.setattr(
            mv, "committed_versions", lambda p: [
                v for v in real(p) if v <= 1
            ]
        )
        meta = mv_create(registered, view, base, SPEC)
        monkeypatch.setattr(mv, "committed_versions", real)

        assert meta["base_version"] == 1
        # the built view reflects ONLY v1 — the racing commit excluded
        assert _state(registered, view) == [("a", 1), ("b", 2)]
        r = mv_refresh(registered, view)
        assert r["mode"] == "incremental"
        # v2 applied exactly once: totals match the base truth
        assert _state(registered, view) == _truth(registered, base)


class TestMaintainIntegration:
    """Round-12: materialized-view maintenance folded into
    maintain(table, policy) — one scheduler entry point refreshes
    registered views (CDF-incremental, before any base rewrite can
    truncate the CDF range), purges tombstone rows past the policy
    threshold, and compacts the view's own manifest."""

    def test_maintain_refreshes_registered_view(
        self, registered, tmp_path
    ):
        from olap_project_spark.export.manifest_sink import (
            MaintenancePolicy,
            maintain,
        )

        base, view = str(tmp_path / "b"), str(tmp_path / "v")
        _write(registered, base, [("a", 1), ("b", 2)])
        mv_create(registered, view, base, SPEC)
        _write(registered, base, [("a", 10), ("c", 5)])
        pol = MaintenancePolicy(col="v", vacuum=False, matviews=[view])
        report = maintain(registered, base, None, pol)
        assert report["matviews"][0]["mode"] == "incremental"
        assert not report["noop"]
        assert mv_status(view)["fresh"]
        assert _state(registered, view) == _truth(registered, base)
        # idempotent: a second pass does nothing anywhere
        report2 = maintain(registered, base, None, pol)
        assert report2["matviews"][0]["mode"] == "noop"
        assert report2["noop"]

    def test_refresh_runs_before_base_compaction(
        self, registered, tmp_path
    ):
        """Tombstones force the full-compaction arm; the view must
        consume the CDF BEFORE the rewrite truncates it, staying
        incremental."""
        from olap_project_spark.export.manifest_sink import (
            MaintenancePolicy,
            maintain,
        )

        base, view = str(tmp_path / "b"), str(tmp_path / "v")
        _write(registered, base, [("a", 1), ("b", 2)])
        mv_create(registered, view, base, SPEC)
        delete_where(
            registered,
            base,
            registered.createDataFrame([("b",)], "k string"),
        )
        pol = MaintenancePolicy(col="v", vacuum=False, matviews=[view])
        report = maintain(registered, base, None, pol)
        assert report["matviews"][0]["mode"] == "incremental"
        assert "full_compact" in report["actions"]
        assert _state(registered, view) == _truth(registered, base) == [
            ("a", 1)
        ]

    def test_tombstone_purge_past_threshold(self, registered, tmp_path):
        from olap_project_spark.export.manifest_sink import (
            MaintenancePolicy,
            maintain,
            read_committed as rc,
            table_schema as ts,
        )

        base, view = str(tmp_path / "b"), str(tmp_path / "v")
        _write(registered, base, [("a", 1), ("b", 2), ("c", 3)])
        mv_create(registered, view, base, SPEC)
        # kill two keys -> two tombstone rows in the view after refresh
        delete_where(
            registered,
            base,
            registered.createDataFrame([("b",), ("c",)], "k string"),
        )
        pol = MaintenancePolicy(
            col="v",
            vacuum=False,
            matviews=[view],
            mv_vacuum_min_tombstones=2,
        )
        report = maintain(registered, base, None, pol)
        mv_r = report["matviews"][0]
        assert mv_r["tombstones_purged"] == 2
        assert mv_r["compacted"]
        # purge + compact materialized: zero tombstone rows physically
        raw = rc(registered, view, ts(view))
        assert raw.filter(F.col("_mv_count") <= 0).count() == 0
        assert _state(registered, view) == [("a", 1)]
