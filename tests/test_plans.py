"""Physical-plan regression tests: the scale properties SURVEY.md §4
and the per-query docstrings promise must actually appear in the
executed plan — pushdown, pruning, broadcast strategy, top-k
compilation, group-limit pushdown, and no row-at-a-time Python
anywhere. These guard against silent plan regressions (e.g. a refactor
that breaks filter pushdown still passes value tests)."""

from __future__ import annotations

import pytest

from olap_project_spark.queries import QUERY_REGISTRY, _import_all

_import_all()


@pytest.fixture(scope="module")
def plan(spark, sf_dir):
    def get(name: str) -> str:
        return (
            QUERY_REGISTRY[name]
            .fn(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    return get


class TestScanEfficiency:
    def test_filter_pushed_to_parquet_scan(self, plan):
        p = plan("pricing_summary")
        scan = next(l for l in p.splitlines() if "FileScan parquet" in l)
        assert "l_shipdate" in scan and "PushedFilters" in p

    def test_column_pruning(self, plan):
        """The 7-column Q1 aggregate must not scan l_orderkey/partkey/
        suppkey — a scan reading all columns for a projection is wrong."""
        p = plan("pricing_summary")
        scan = next(l for l in p.splitlines() if "FileScan parquet" in l)
        for unused in ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"):
            assert unused not in scan, f"scan reads unused column {unused}"

    def test_value_predicate_pushed(self, plan):
        p = plan("large_events_profile")
        assert "PushedFilters" in p and "GreaterThan(value" in p


class TestJoinStrategy:
    def test_star_join_broadcasts_all_dims(self, plan):
        p = plan("nation_revenue")
        assert p.count("BroadcastHashJoin") >= 3
        assert "SortMergeJoin" not in p, "fact table must not shuffle for dims"

    def test_dim_enrichment_broadcasts(self, plan):
        p = plan("segment_event_value")
        assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p

    def test_semi_anti_joins(self, plan):
        assert "LeftSemi" in plan("customers_with_open_orders")
        assert "LeftAnti" in plan("customers_without_open_orders")


class TestOperatorCompilation:
    def test_topk_compiles_to_take_ordered(self, plan):
        """orderBy+limit must become TakeOrderedAndProject (per-partition
        top-k + driver merge), never a global sort."""
        assert "TakeOrderedAndProject" in plan("top10_customers")

    def test_per_group_topn_uses_window_group_limit(self, plan):
        """rn<=3 must push into the window sort (WindowGroupLimit)."""
        assert "WindowGroupLimit" in plan("top3_parts_per_brand")

    def test_no_python_in_relational_paths(self, plan):
        for name in (
            "pricing_summary",
            "nation_revenue",
            "minhash_dup_pairs",
            "simhash_dup_pairs",
            "ann_topk_bruteforce",
            "lang_id_accuracy",
        ):
            p = plan(name)
            assert "BatchEvalPython" not in p, f"{name} fell off codegen into Python"
            assert "ArrowEvalPython" not in p, f"{name} uses a pandas UDF needlessly"

    def test_asof_join_is_joinless(self, plan):
        """The as-of composition must compile to union+window — no join
        operator at all (that's the scalability claim: one shuffle on
        the key, no per-row probe)."""
        p = plan("asof_last_order")
        assert "Window" in p
        for join_op in ("SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoopJoin"):
            assert join_op not in p, f"asof fell back to {join_op}"

    def test_multimodal_uses_arrow_not_row_python(self, plan):
        p = plan("multimodal_decode_stats")
        assert "MapInPandas" in p  # Arrow-batched
        assert "BatchEvalPython" not in p  # never row-at-a-time
