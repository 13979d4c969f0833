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
