from __future__ import annotations

import os

import pytest

from olap_project_spark.session import build_session

TESTDATA_ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
REFERENCE_ROOT = "/root/reference"


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
