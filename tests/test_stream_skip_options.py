"""Delta-parity streaming relaxations on the manifest stream source:
``ignoreDeletes`` (skip equality-delete snapshots) and
``skipChangeCommits`` (skip every non-append kind). Default stays the
safe raise; the opt-ins deliver exactly the plain-append rows, never
re-delivering reorganized or updated bytes."""

from __future__ import annotations

import pytest

from olap_project_spark.export.manifest_sink import (
    ManifestSinkDataSource,
    compact_snapshots,
    delete_where,
    ensure_manifest_sink,
    merge_upsert,
    restore_table,
)

SCHEMA = "k bigint, v string"


@pytest.fixture(scope="module")
def registered(spark):
    try:
        spark.dataSource.register(ManifestSinkDataSource)
    except Exception:  # noqa: BLE001 — already registered this session
        pass
    return spark


def _write(spark, path, rows):
    (
        spark.createDataFrame(rows, SCHEMA)
        .repartition(1)
        .write.format("manifest_sink")
        .option("path", path)
        .mode("append")
        .save()
    )


def _drain(spark, fmt, path, ckpt, **opts):
    got: list[int] = []

    def sink(df, _epoch):
        got.extend(r["k"] for r in df.collect())

    reader = spark.readStream.format(fmt).option("path", path)
    for key, val in opts.items():
        reader = reader.option(key, val)
    q = (
        reader.load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return sorted(got)


class TestIgnoreDeletes:
    def test_delete_snapshots_pass_silently(self, registered, tmp_path):
        fmt = ensure_manifest_sink(registered)
        path = str(tmp_path / "t")
        _write(registered, path, [(1, "a"), (2, "b")])
        delete_where(
            registered, path, registered.createDataFrame([(1,)], "k bigint")
        )
        _write(registered, path, [(3, "c")])
        # default contract still raises (the stream fails)
        with pytest.raises(Exception, match="delete"):
            _drain(registered, fmt, path, str(tmp_path / "c0"))
        got = _drain(
            registered,
            fmt,
            path,
            str(tmp_path / "c1"),
            ignoreDeletes="true",
        )
        # every APPENDED row arrives; the removal never reaches a tail
        assert got == [1, 2, 3]
        # but a merge still raises under ignoreDeletes alone
        merge_upsert(
            registered,
            path,
            registered.createDataFrame([(2, "B")], SCHEMA),
            keys=["k"],
        )
        with pytest.raises(Exception, match="merge"):
            _drain(
                registered,
                fmt,
                path,
                str(tmp_path / "c2"),
                ignoreDeletes="true",
            )


class TestSkipChangeCommits:
    def test_only_plain_append_rows_deliver(self, registered, tmp_path):
        fmt = ensure_manifest_sink(registered)
        path = str(tmp_path / "t")
        _write(registered, path, [(1, "a"), (2, "b")])  # v1
        delete_where(
            registered, path, registered.createDataFrame([(1,)], "k bigint")
        )  # v2
        merge_upsert(  # v3: updates 2, inserts 9
            registered,
            path,
            registered.createDataFrame([(2, "B"), (9, "z")], SCHEMA),
            keys=["k"],
        )
        compact_snapshots(registered, path, SCHEMA)  # v4 rewrite
        restore_table(path, 1)  # v5
        _write(registered, path, [(5, "e")])  # v6
        got = _drain(
            registered,
            fmt,
            path,
            str(tmp_path / "c"),
            skipChangeCommits="true",
        )
        # plain appends only: v1 + v6; the merge's rows, the rewrite's
        # consolidated bytes, and the restore never (re-)deliver
        assert got == [1, 2, 5]
