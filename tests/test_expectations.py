"""Write-time data-quality expectations on the manifest table (the
Delta Live Tables expect / expect-or-drop / expect-or-fail contract):
single-scan violation counters via observation metrics, quarantine
side-table with per-row rule tags, atomic all-or-nothing fail mode via
a WAP branch, and the commit-props audit trail."""

from __future__ import annotations

import pytest

from olap_project_spark.export.manifest_sink import (
    ManifestSinkDataSource,
    committed_versions,
    read_committed,
    table_history,
    table_schema,
    write_with_expectations,
)

RULES = {"pos_amt": "amt > 0", "has_name": "name IS NOT NULL"}


@pytest.fixture(scope="module")
def registered(spark):
    try:
        spark.dataSource.register(ManifestSinkDataSource)
    except Exception:  # noqa: BLE001 — already registered this session
        pass
    return spark


@pytest.fixture()
def dirty(registered):
    # id 1 clean; id 2 negative amt; id 3 NULL name (a NULL predicate
    # result must count as a violation); id 4 zero amt
    return registered.createDataFrame(
        [(1, "a", 10.0), (2, "b", -5.0), (3, None, 3.0), (4, "d", 0.0)],
        "id int, name string, amt double",
    )


class TestQuarantineMode:
    def test_splits_rows_and_tags_rules(self, registered, dirty, tmp_path):
        path = str(tmp_path / "t")
        r = write_with_expectations(
            registered, path, dirty, RULES, on_violation="quarantine"
        )
        assert r["violations"] == {"pos_amt": 2, "has_name": 1}
        assert r["rows_written"] == 1
        assert r["rows_quarantined"] == 3
        assert r["quarantine_version"] == 1
        main = read_committed(registered, path, table_schema(path))
        assert [x.id for x in main.collect()] == [1]
        qp = path + "_quarantine"
        q = read_committed(registered, qp, table_schema(qp))
        tags = {x.id: sorted(x._violated) for x in q.collect()}
        assert tags == {2: ["pos_amt"], 3: ["has_name"], 4: ["pos_amt"]}
        # the enforced contract is part of the audit trail
        props = table_history(path)[-1]["props"]
        assert props["expectations"] == RULES
        assert props["on_violation"] == "quarantine"

    def test_clean_input_skips_quarantine_table(
        self, registered, dirty, tmp_path
    ):
        path = str(tmp_path / "t")
        clean = dirty.filter("amt > 0 AND name IS NOT NULL")
        r = write_with_expectations(
            registered, path, clean, RULES, on_violation="quarantine"
        )
        assert r["rows_quarantined"] == 0
        assert r["quarantine_version"] is None
        assert committed_versions(path + "_quarantine") == []


class TestDropMode:
    def test_drops_and_counts_on_one_scan(self, registered, dirty, tmp_path):
        path = str(tmp_path / "t")
        r = write_with_expectations(
            registered, path, dirty, RULES, on_violation="drop"
        )
        assert r["violations"] == {"pos_amt": 2, "has_name": 1}
        assert r["rows_written"] == 1
        assert r["rows_quarantined"] == 0
        assert (
            read_committed(registered, path, table_schema(path)).count() == 1
        )


class TestFailMode:
    def test_dirty_write_rolls_back_atomically(
        self, registered, dirty, tmp_path
    ):
        path = str(tmp_path / "t")
        with pytest.raises(ValueError, match="rolled back"):
            write_with_expectations(
                registered, path, dirty, RULES, on_violation="fail"
            )
        # nothing became visible, and no version number is burned
        assert committed_versions(path) == []
        clean = dirty.filter("amt > 0 AND name IS NOT NULL")
        r = write_with_expectations(
            registered, path, clean, RULES, on_violation="fail"
        )
        assert r["version"] == 1
        assert r["violations"] == {"pos_amt": 0, "has_name": 0}
        assert (
            read_committed(registered, path, table_schema(path)).count() == 1
        )


class TestRejections:
    def test_bad_mode_and_empty_rules(self, registered, dirty, tmp_path):
        path = str(tmp_path / "t")
        with pytest.raises(ValueError, match="on_violation"):
            write_with_expectations(
                registered, path, dirty, RULES, on_violation="warn"
            )
        with pytest.raises(ValueError, match="at least one rule"):
            write_with_expectations(registered, path, dirty, {})


class TestPublishRace:
    def test_fail_mode_commit_race_rolls_back(self, registered, tmp_path):
        """A concurrent main commit between the fail-mode branch claim
        and its publish breaks the fast-forward condition: the staged
        branch must roll back (nothing visible, claim released) and
        the caller gets a retryable conflict."""
        import olap_project_spark.export.manifest_sink as ms

        path = str(tmp_path / "t")
        clean = registered.createDataFrame(
            [(1, "a", 10.0)], "id int, name string, amt double"
        )
        real_publish = ms.publish_branch

        def racing_publish(p, branch):
            # the rival lands a main commit just before our publish
            # (through ensure_manifest_sink, which also re-pins the
            # active session — the library's own write discipline)
            fmt = ms.ensure_manifest_sink(registered)
            clean.selectExpr("id + 100 as id", "name", "amt").repartition(
                1
            ).write.format(fmt).option("path", p).mode("append").save()
            return real_publish(p, branch)

        ms.publish_branch, saved = racing_publish, ms.publish_branch
        try:
            with pytest.raises(RuntimeError, match="commit race"):
                write_with_expectations(
                    registered, path, clean, RULES, on_violation="fail"
                )
        finally:
            ms.publish_branch = saved
        # only the rival's commit is visible; our staged rows are gone
        rows = read_committed(
            registered, path, table_schema(path)
        ).collect()
        assert [r.id for r in rows] == [101]
