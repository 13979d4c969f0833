from __future__ import annotations

import os

import pytest

from olap_project_spark.session import build_session

TESTDATA_ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
REFERENCE_ROOT = "/root/reference"


def _patch_fast_local_frames() -> None:
    """Suite-wide: route list-based ``createDataFrame(rows, schema)``
    through the engine's Arrow ``local_frame`` builder.

    The classic list path parallelizes over ``defaultParallelism``
    pickled slices — every action on a small fixture frame schedules
    32 near-empty Python tasks (~0.4 s each), and a Python-DataSource
    write over such a frame invokes the writer once per slice
    (measured: a 3-commit fixture fell 16.6 s → 1.6 s). The Arrow
    builder produces the identical rows under the identical declared
    schema as a ``LocalTableScan`` (parity pinned by
    tests/test_localframe.py, which exercises the UNPATCHED builder);
    anything the Arrow path can't take falls back to the original."""
    from pyspark.sql import SparkSession

    from olap_project_spark.functions.localframe import arrow_local_frame

    orig = SparkSession.createDataFrame
    if getattr(SparkSession.createDataFrame, "_fast_local", False):
        return

    def fast(self, data, schema=None, *args, **kwargs):
        if (
            schema is not None
            and not args
            and not kwargs
            and isinstance(data, (list, tuple))
        ):
            try:
                return arrow_local_frame(self, data, schema)
            except Exception:  # noqa: BLE001 — exactness first
                pass
        if schema is None:
            return orig(self, data, *args, **kwargs)
        return orig(self, data, schema, *args, **kwargs)

    fast._fast_local = True
    fast._orig = orig
    SparkSession.createDataFrame = fast


_patch_fast_local_frames()


@pytest.fixture(scope="session")
def spark():
    import tempfile

    spark = build_session(
        app_name="olap-project-spark-tests",
        shuffle_partitions=8,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark-wh-"),
        },
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    d = os.path.join(TESTDATA_ROOT, "sf0.001")
    if not os.path.isdir(d):
        pytest.skip("driver testdata not present")
    return d


@pytest.fixture(scope="session")
def sf_dir_001():
    d = os.path.join(TESTDATA_ROOT, "sf0.01")
    if not os.path.isdir(d):
        pytest.skip("driver testdata not present")
    return d


def reference_path(*parts: str) -> str:
    return os.path.join(REFERENCE_ROOT, *parts)


@pytest.fixture(scope="session")
def raw_transactions_csv():
    p = reference_path("sample_data", "raw_transactions.csv")
    if not os.path.exists(p):
        pytest.skip("reference sample data not present")
    return p


@pytest.fixture(scope="session")
def golden_v2_csv():
    p = reference_path("sample_data", "processed_transactions_v2.csv")
    if not os.path.exists(p):
        pytest.skip("reference sample data not present")
    return p
