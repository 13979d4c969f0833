"""Parity of the Arrow local-frame builder with the classic
``createDataFrame`` list path — the contract that lets the conftest
route all list-based test frames (and the engine route its result
rows) through one Arrow record batch.

These tests deliberately call the UNPATCHED classic builder (saved by
the conftest patch) so the comparison stays classic-vs-arrow even
though the suite runs patched."""

from __future__ import annotations

import datetime
import decimal

import pytest
from pyspark.sql import SparkSession

from olap_project_spark.functions.localframe import (
    arrow_local_frame,
    local_frame,
)


def _classic(spark, rows, schema):
    orig = getattr(SparkSession.createDataFrame, "_orig", None)
    if orig is None:  # suite running unpatched
        return spark.createDataFrame(rows, schema)
    return orig(spark, rows, schema)


CASES = [
    ([(1, "a", 2.5), (2, None, 3.5)], "x int, s string, v double"),
    ([], "`User` string, cents bigint"),
    ([([1, 2], True, 9)], "arr array<int>, b boolean, n bigint"),
    (
        [
            (
                datetime.datetime(2024, 1, 1, 3, 4, 5),
                decimal.Decimal("1.25"),
            )
        ],
        "ts timestamp, d decimal(18,2)",
    ),
    ([(None, None)], "a bigint, b string"),
    ([(i, f"s{i}") for i in range(1000)], "k long, s string"),
]


@pytest.mark.parametrize("rows,schema", CASES)
def test_rows_and_schema_match_classic(spark, rows, schema):
    a = _classic(spark, rows, schema)
    b = local_frame(spark, rows, schema)
    assert a.schema == b.schema
    assert sorted(map(tuple, a.collect())) == sorted(
        map(tuple, b.collect())
    )


def test_plans_as_local_table_scan(spark):
    df = arrow_local_frame(spark, [(1, "a")], "x int, s string")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan


def test_dict_rows_fall_back_to_by_name_binding(spark):
    rows = [{"s": "a", "x": 1}]  # reversed key order vs the schema
    df = local_frame(spark, rows, "x int, s string")
    assert df.collect() == [(1, "a")]


def test_write_through_save_manifest_round_trips(spark, tmp_path):
    from olap_project_spark.export.manifest_sink import (
        read_committed,
        save_manifest,
    )

    path = str(tmp_path / "lf")
    rows = [(i, i * 10) for i in range(50)]
    st = save_manifest(
        arrow_local_frame(spark, rows, "k long, v long").coalesce(1), path
    )
    assert st["n_rows"] == 50 and st["n_files"] == 1
    got = sorted(
        (r["k"], r["v"])
        for r in read_committed(spark, path, "k long, v long").collect()
    )
    assert got == rows
