"""DuckDB-oracle tests for the TPC-H-shaped decision-support suite
(queries/tpch_suite.py) at sf0.001 — the same row-count + sorted-column
+ value comparison the driver gate applies, scoped to this module so
regressions localize."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from olap_project_spark.queries import QUERY_REGISTRY, _import_all
from olap_project_spark.queries import tpch_suite
from olap_project_spark.schemas import STAR_TABLES

_import_all()

TPCH_NAMES = [
    "revenue_increase_q6",
    "priority_order_counts",
    "local_supplier_volume",
    "volume_shipping",
    "national_market_share",
    "returned_item_customers",
    "promo_revenue_share",
    "top_supplier_quarter",
    "small_qty_revenue_loss",
    "large_volume_customers",
    "discounted_revenue_or",
    "idle_rich_customers",
    "q3_shipping_priority",
    "supplier_nation_profit",
    "min_cost_supplier",
    "important_part_values",
    "part_supplier_diversity",
    "dominant_part_suppliers",
    "sole_late_suppliers",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in STAR_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _cell(v):
    if v is None or (isinstance(v, float) and v != v):
        return None
    return v


def _norm(rows, cols, order):
    idx = [cols.index(c) for c in order]
    return sorted(
        (tuple(_cell(r[i]) for i in idx) for r in rows),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


def _eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


@pytest.mark.parametrize("name", TPCH_NAMES)
def test_tpch_query_matches_oracle(spark, sf_dir, duck, name):
    q = QUERY_REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(q.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column sets differ"
    assert len(srows) == len(drows), f"{name}: row counts differ"
    order = sorted(scols)
    for srow, drow in zip(_norm(srows, scols, order), _norm(drows, dcols, order)):
        for a, b in zip(srow, drow):
            assert _eq(a, b), f"{name}: {srow} != {drow}"


def test_all_tpch_queries_registered():
    for name in TPCH_NAMES:
        assert name in QUERY_REGISTRY
        assert QUERY_REGISTRY[name].oracle is not None


def test_approx_distinct_error_bound(spark, sf_dir):
    """The self-validating sketch contract: every tolerance boolean the
    oracle asserts as TRUE must actually be TRUE (HLL within 2% of the
    exact distinct count, percentile sketches within 5% of the exact
    interpolated percentiles)."""
    rows = QUERY_REGISTRY["approx_distinct_summary"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.hll_within_2pct, (r.event_type, r.exact_users)
        assert r.p50_within_5pct and r.p95_within_5pct, r.event_type


def test_window_longtail_single_exchange(spark, sf_dir):
    """All eight same-spec ranking functions must fuse into ONE Window
    operator (one shuffle + one sort)."""
    plan = (
        QUERY_REGISTRY["segment_balance_ranks"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
