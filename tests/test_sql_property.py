"""PROPERTY: under ANY interleaving of the LakehouseSQL verbs —
INSERT / UPDATE / DELETE / CREATE TAG / WAP stage+publish /
WAP stage+abandon / OPTIMIZE / VACUUM — the SQL-visible state equals
a plain Python model, every live tag still reproduces the exact
snapshot it pinned, and vacuum's documented retention boundary
(expiry below the latest rewrite empties tag reads below it) holds.

This is the SQL-layer analogue of the manifest-sink hypothesis state
machine: the grammar, the rewriters (time travel, branch reads), and
the library calls they compile to are exercised as ONE surface."""

from __future__ import annotations

import uuid

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from olap_project_spark.export.lakehouse_sql import LakehouseSQL

_op = st.sampled_from(
    [
        "insert",
        "update",
        "delete",
        "tag",
        "wap_green",
        "wap_red",
        "optimize",
        "vacuum",
    ]
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def registered(spark):
    from olap_project_spark.export.manifest_sink import (
        ManifestSinkDataSource,
    )

    try:
        spark.dataSource.register(ManifestSinkDataSource)
    except Exception:  # noqa: BLE001 — already registered this session
        pass
    return spark


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_op, min_size=3, max_size=7))
def test_sql_state_matches_model_under_any_interleaving(
    registered, tmp_path, ops
):
    root = str(tmp_path / f"sqlprop_{uuid.uuid4().hex[:12]}")
    lh = LakehouseSQL(registered, root)
    lh.sql("CREATE TABLE t (k INT, cents BIGINT)")
    model: dict[int, int] = {}
    tags: dict[str, dict[int, int]] = {}  # tag -> pinned snapshot
    tag_versions: dict[str, int] = {}
    last_rewrite = 0
    next_k = 0
    n_tag = 0

    def ins_sql(rows):
        return " UNION ALL ".join(
            f"SELECT {k} AS k, {c} AS cents" for k, c in rows
        )

    for op in ops:
        if op == "insert" or (not model and op in ("update", "delete")):
            rows = [(next_k, next_k * 10 + 1), (next_k + 1, next_k * 10 + 7)]
            next_k += 2
            lh.sql(f"INSERT INTO t {ins_sql(rows)}")
            model.update(rows)
        elif op == "update":
            victim = min(model)
            lh.sql(f"UPDATE t SET cents = cents + 5 WHERE k = {victim}")
            model[victim] += 5
        elif op == "delete":
            victim = max(model)
            lh.sql(f"DELETE FROM t WHERE k = {victim}")
            model.pop(victim)
        elif op == "tag":
            name = f"snap{n_tag}"
            n_tag += 1
            v = int(
                lh.sql(f"ALTER TABLE t CREATE TAG {name}")
                .collect()[0]
                .version
            )
            tags[name] = dict(model)
            tag_versions[name] = v
        elif op == "wap_green":
            rows = [(next_k, next_k * 10 + 3)]
            next_k += 1
            lh.sql(f"INSERT INTO t BRANCH g {ins_sql(rows)}")
            # staged: main blind until publish
            assert _rows(lh.sql("SELECT k, cents FROM t")) == sorted(
                model.items()
            )
            assert _rows(
                lh.sql("SELECT k, cents FROM t BRANCH g")
            ) == sorted(model.items() | set(rows))
            lh.sql("ALTER TABLE t PUBLISH BRANCH g")
            model.update(rows)
        elif op == "wap_red":
            rows = [(next_k, -1)]
            next_k += 1
            lh.sql(f"INSERT INTO t BRANCH r {ins_sql(rows)}")
            lh.sql("ALTER TABLE t ABANDON BRANCH r")
        elif op == "optimize":
            last_rewrite = int(
                lh.sql("OPTIMIZE t").collect()[0].version
            )
        elif op == "vacuum":
            lh.sql("VACUUM t")
            if last_rewrite:
                # documented retention boundary: a tag pinned below
                # the expiry anchor is now a DANGLING ref — the SQL
                # layer REFUSES it with an explicit missing-version
                # error (safer than the library's silent empty read);
                # tags at/above the anchor survive intact
                for name, v in list(tag_versions.items()):
                    if v < last_rewrite:
                        with pytest.raises(ValueError, match="no version"):
                            lh.sql(
                                f"SELECT k FROM t VERSION AS OF '{name}'"
                            )
                        tags.pop(name)
                        tag_versions.pop(name)
        # the SQL-visible state equals the model after EVERY op
        assert _rows(lh.sql("SELECT k, cents FROM t")) == sorted(
            model.items()
        )
    # every live tag still reproduces its pinned snapshot exactly
    for name, snap in tags.items():
        assert _rows(
            lh.sql(f"SELECT k, cents FROM t VERSION AS OF '{name}'")
        ) == sorted(snap.items())


_op2 = st.sampled_from(
    [
        "insert",
        "update",
        "delete",
        "optimize",
        "overwrite_full",
        "overwrite_range",
        "constraint_add",
        "constraint_drop",
        "bad_insert",
    ]
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_op2, min_size=3, max_size=8))
def test_overwrite_and_constraints_under_any_interleaving(
    registered, tmp_path, ops
):
    """PROPERTY over the round-13-close verbs: INSERT OVERWRITE (full
    and range-scoped) and CHECK constraints compose with the existing
    DML under ANY interleaving — the scoped overwrite REFUSES across
    unmaterialized tombstones (and the state is untouched by the
    refusal), the full overwrite materializes them, adding a
    constraint validates the existing rows, an active constraint
    rejects violating writes whole, and the SQL-visible state equals
    the Python model after every op."""
    root = str(tmp_path / f"sqlprop2_{uuid.uuid4().hex[:12]}")
    lh = LakehouseSQL(registered, root)
    lh.sql("CREATE TABLE t (k INT, cents BIGINT)")
    model: dict[int, int] = {}
    pending_tombstones = False
    constraint_active = False
    next_k = 0
    neg_k = -5

    def ins_sql(rows):
        return " UNION ALL ".join(
            f"SELECT {k} AS k, {c} AS cents" for k, c in rows
        )

    for op in ops:
        if op == "insert" or (not model and op in ("update", "delete")):
            rows = [(next_k, next_k * 10 + 1), (next_k + 1, next_k * 10 + 7)]
            next_k += 2
            lh.sql(f"INSERT INTO t {ins_sql(rows)}")
            model.update(rows)
        elif op == "update":
            victim = min(model)
            lh.sql(f"UPDATE t SET cents = cents + 5 WHERE k = {victim}")
            model[victim] += 5
            pending_tombstones = True
        elif op == "delete":
            victim = max(model)
            lh.sql(f"DELETE FROM t WHERE k = {victim}")
            model.pop(victim)
            pending_tombstones = True
        elif op == "optimize":
            lh.sql("OPTIMIZE t")
            pending_tombstones = False
        elif op == "overwrite_full":
            rows = [(k, c + 1000) for k, c in sorted(model.items())]
            if not rows:
                # empty-table fallback must CONSUME a fresh key: a fixed
                # literal (0, 1) collides with a later INSERT's key 0 and
                # the dict model cannot represent the duplicate row the
                # engine then (correctly) holds
                rows = [(next_k, 1)]
                next_k += 2
            lh.sql(f"INSERT OVERWRITE t {ins_sql(rows)}")
            model = dict(rows)
            pending_tombstones = False
        elif op == "overwrite_range":
            if model:
                lo = min(model)
            else:
                # empty-table range overwrite must CONSUME fresh keys
                # for the same reason overwrite_full's fallback does:
                # writing k=0 collides with a later INSERT's key 0 and
                # the dict model cannot represent the duplicate row
                # the engine then (correctly) holds
                lo = next_k
                next_k += 2
            stmt = (
                f"INSERT OVERWRITE t WHERE k BETWEEN {lo} AND {lo + 1} "
                f"SELECT {lo} AS k, 4242 AS cents"
            )
            if pending_tombstones:
                # scoped rewrite over unmaterialized tombstones would
                # resurrect deleted rows in retained files: REFUSES,
                # and the refusal changes nothing
                with pytest.raises(ValueError, match="compact_snapshots"):
                    lh.sql(stmt)
            else:
                lh.sql(stmt)
                model = {
                    k: c
                    for k, c in model.items()
                    if not (lo <= k <= lo + 1)
                }
                model[lo] = 4242
        elif op == "constraint_add":
            if constraint_active:
                continue
            if any(k < 0 for k in model):
                with pytest.raises(
                    ValueError, match="existing rows violate"
                ):
                    lh.sql(
                        "ALTER TABLE t ADD CONSTRAINT nonneg "
                        "CHECK (k >= 0)"
                    )
            else:
                lh.sql(
                    "ALTER TABLE t ADD CONSTRAINT nonneg CHECK (k >= 0)"
                )
                constraint_active = True
        elif op == "constraint_drop":
            if constraint_active:
                lh.sql("ALTER TABLE t DROP CONSTRAINT nonneg")
                constraint_active = False
        elif op == "bad_insert":
            stmt = f"INSERT INTO t SELECT {neg_k} AS k, 0 AS cents"
            if constraint_active:
                with pytest.raises(ValueError, match="table constraints"):
                    lh.sql(stmt)
            else:
                lh.sql(stmt)
                model[neg_k] = 0
                neg_k -= 1
        # the SQL-visible state equals the model after EVERY op
        assert _rows(lh.sql("SELECT k, cents FROM t")) == sorted(
            model.items()
        )


def test_concurrent_sql_writers_serialize_cleanly(registered, tmp_path):
    """Two threads driving INSERTs through the SAME LakehouseSQL
    warehouse: the claim protocol serializes them into distinct
    versions with no lost or duplicated rows — the SQL layer adds no
    shared mutable state that could break the library's guarantee."""
    import threading

    root = str(tmp_path / "sqlconc")
    lh = LakehouseSQL(registered, root)
    lh.sql("CREATE TABLE t (k INT, v INT)")
    errs: list[Exception] = []

    def writer(base: int) -> None:
        try:
            w = LakehouseSQL(registered, root)
            for i in range(4):
                w.sql(
                    f"INSERT INTO t SELECT {base + i} AS k, "
                    f"{base + i} AS v"
                )
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [
        threading.Thread(target=writer, args=(b,)) for b in (100, 200)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert errs == []
    rows = sorted(r.k for r in lh.sql("SELECT k FROM t").collect())
    assert rows == [100, 101, 102, 103, 200, 201, 202, 203]
    from olap_project_spark.export.manifest_sink import (
        committed_versions,
    )

    assert len(committed_versions(lh.path("t"))) == 9  # create + 8
