"""Physical-plan regression tests: the scale properties SURVEY.md §4
and the per-query docstrings promise must actually appear in the
executed plan — pushdown, pruning, broadcast strategy, top-k
compilation, group-limit pushdown, and no row-at-a-time Python
anywhere. These guard against silent plan regressions (e.g. a refactor
that breaks filter pushdown still passes value tests)."""

from __future__ import annotations

import os
import sys

import pytest

from olap_project_spark.queries import QUERY_REGISTRY, _import_all

_import_all()


@pytest.fixture(scope="module")
def plan(spark, sf_dir):
    # Plan-shape assertions are written against the FRESH (uncached)
    # lineage; memoized intermediates persisted by earlier test files
    # would splice InMemoryRelation stored plans into the string (and
    # double-count their operators), so start from a clean memo.
    from olap_project_spark.queries import clear_memo

    clear_memo()

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

    def test_daily_rates_join_broadcasts_dim(self, plan):
        """The M4 daily-rate enrichment: the rows-per-day rates
        dimension must broadcast; the fact side must reach the join
        unshuffled (the only Exchange in the plan is the final keyed
        aggregate's)."""
        p = plan("pos_daily_rates_vnd")
        assert "BroadcastHashJoin" in p
        assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
        # exactly the aggregate's shuffle — nothing repartitions the
        # fact to meet the dimension
        pre_join = p.split("BroadcastHashJoin")[-1]  # tree prints deepest last
        assert "Exchange hashpartitioning" not in pre_join


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


class TestTpchSuitePlans:
    """Scale promises of the decision-support suite (queries/tpch_suite)."""

    def test_q6_is_scan_and_aggregate_only(self, plan):
        """Q6 must be scan→agg with every predicate pushed — no join, no
        wide shuffle."""
        p = plan("revenue_increase_q6")
        assert "Join" not in p
        scan = next(l for l in p.splitlines() if "FileScan parquet" in l)
        for col in ("l_shipdate", "l_discount", "l_quantity"):
            assert col in scan

    def test_q19_or_bounds_reach_the_scan(self, plan):
        """Catalyst must extract the common quantity envelope from the
        OR-of-ANDs and push it into the lineitem scan."""
        p = plan("discounted_revenue_or")
        scan = next(
            l for l in p.splitlines() if "FileScan parquet" in l and "l_quantity" in l
        )
        assert "l_quantity" in scan.split("DataFilters")[-1]

    def test_exists_shapes_compile_to_semi_anti(self, plan):
        assert "LeftSemi" in plan("priority_order_counts")
        assert "LeftAnti" in plan("idle_rich_customers")

    def test_q18_aggregates_before_joining(self, plan):
        """The qty>250 HAVING must run on lineitem BEFORE the joins —
        the aggregate appears below the first join in the plan tree."""
        p = plan("large_volume_customers")
        lines = p.splitlines()
        first_join = next(i for i, l in enumerate(lines) if "Join" in l)
        assert any("HashAggregate" in l for l in lines[first_join:]), (
            "pre-join aggregate missing — HAVING filter would shuffle full fact"
        )
        assert "TakeOrderedAndProject" in p

    def test_recent_filter_pushed_in_q22(self, plan):
        p = plan("idle_rich_customers")
        scan = next(
            l for l in p.splitlines() if "FileScan parquet" in l and "o_orderdate" in l
        )
        assert "2001-01-01" in scan

    def test_no_python_in_suite(self, plan):
        for name in (
            "local_supplier_volume",
            "volume_shipping",
            "national_market_share",
            "small_qty_revenue_loss",
        ):
            assert "BatchEvalPython" not in plan(name), name


class TestNewFamilyPlans:
    """Plan shapes for the frequent-item / window / text-mining and
    audit families added after the decision-support suite."""

    def test_heavy_hitters_broadcasts_total(self, plan):
        """The 1-row global total must broadcast onto the per-key
        counts — a shuffle join against a single row would serialize
        the whole aggregate through one partition."""
        p = plan("heavy_hitter_parts")
        assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p

    def test_unpivot_compiles_to_expand(self, plan):
        """unpivot must be a single Expand over the aggregate, not a
        UNION ALL double-scan."""
        p = plan("brand_measure_unpivot")
        assert "Expand" in p
        assert p.count("FileScan parquet") == 1

    def test_rolling_week_is_single_range_window(self, plan):
        p = plan("rolling_week_spend")
        assert "RangeFrame" in p.replace(" ", "") or "specifiedwindowframe(RangeFrame" in p or "windowspecdefinition" in p
        # one shuffle on the partition key, no join
        assert "Join" not in p

    def test_tfidf_topk_uses_window_group_limit(self, plan):
        """The per-doc top-3 must prune below the full sort via
        WindowGroupLimit (rank-limit pushdown)."""
        p = plan("tfidf_top_terms")
        assert "WindowGroupLimit" in p

    def test_integrity_audit_uses_anti_joins(self, plan):
        p = plan("integrity_audit")
        assert "LeftAnti" in p

    def test_outliers_broadcast_stats_back(self, plan):
        """The tiny per-type moments join back onto the fact via
        broadcast — the fact must not shuffle for the threshold pass."""
        p = plan("value_outliers")
        assert "BroadcastHashJoin" in p

    def test_no_python_in_new_families(self, plan):
        for q in (
            "heavy_hitter_parts",
            "brand_measure_unpivot",
            "rolling_week_spend",
            "rfm_segments",
            "event_transition_matrix",
            "tfidf_top_terms",
            "fuzzy_part_name_pairs",
            "event_type_associations",
            "doc_split_assignment",
            "integrity_audit",
            "region_nation_list",
            "value_outliers",
        ):
            p = plan(q)
            assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, q


class TestMomentFamilyPlans:
    """Plan shapes for the exact-moment statistics family (OLS
    regression, skewness/kurtosis, deterministic stratified sample)."""

    def test_regression_is_single_pass_no_join(self, plan):
        """OLS from co-moments must be ONE aggregate over the fact —
        no self-join, no second scan."""
        p = plan("price_quantity_regression")
        assert "Join" not in p
        assert p.count("FileScan parquet") == 1

    def test_moment_shape_is_single_pass_no_join(self, plan):
        p = plan("value_moment_shape")
        assert "Join" not in p
        assert p.count("FileScan parquet") == 1

    def test_stratified_sample_no_extra_shuffle(self, plan):
        """Hash-predicate sampling must add zero shuffles beyond the
        group-by exchange (df.sample-style splits add none either, but
        a join-against-sampled-keys design would)."""
        p = plan("stratified_customer_sample")
        assert "Join" not in p
        assert p.count("Exchange") <= 2  # partial/final agg exchange only

    def test_no_python_in_moment_family(self, plan):
        for q in (
            "price_quantity_regression",
            "value_moment_shape",
            "stratified_customer_sample",
        ):
            p = plan(q)
            assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, q


class TestSketchSamplingPlans:
    """Plan shapes for the KMV sketch / weighted-sample / session-window
    / PageRank family."""

    def test_weighted_sample_is_distributed_topk(self, plan):
        """A-ES sampling must compile to TakeOrderedAndProject (per-
        partition top-k + driver merge), not a global Sort."""
        p = plan("weighted_doc_sample")
        assert "TakeOrderedAndProject" in p
        assert "Exchange rangepartitioning" not in p, "global sort crept in"
        assert "Join" not in p

    def test_session_window_is_single_session_aggregate(self, plan):
        """The native operator: one shuffle on the session keys, no
        window-function second pass."""
        p = plan("session_window_stats")
        assert "session_window" in p
        assert "Window" not in p.replace("session_window", ""), (
            "island fallback (window functions) instead of native sessions"
        )

    def test_kmv_prunes_scan_to_two_columns(self, plan):
        p = plan("kmv_distinct_users")
        scan = next(l for l in p.splitlines() if "FileScan parquet" in l)
        for unused in ("value", "props", "event_id"):
            assert unused not in scan, f"scan reads unused column {unused}"

    def test_no_python_in_sketch_family(self, plan):
        for q in (
            "kmv_distinct_users",
            "weighted_doc_sample",
            "session_window_stats",
            "segment_priority_mode",
            "pagerank_canonical_docs",
        ):
            p = plan(q)
            assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, q


class TestRewriteShapes:
    def test_rolling_dau_dedupes_before_fanout(self, plan):
        """The 25× candidate explode must sit ABOVE the distinct
        (user, hour, boundary) aggregate — the |events| → |user-hours|
        reduction is the operator's scale property."""
        p = plan("rolling_daily_active_users")
        gen_pos = p.find("Generate explode")
        assert gen_pos != -1
        # a HashAggregate (the distinct) must appear below the explode
        # in the tree (later in the plan string)
        assert "HashAggregate" in p[gen_pos:], "explode fans out raw events"

    def test_embedding_near_dup_candidates_equi_join(self, plan):
        """Candidate generation must be the multi-probe cell equi-join:
        the only nested-loop allowed is the bounded 16-row centroid
        broadcast; the corpus must never self-join by theta predicate
        alone."""
        p = plan("embedding_near_dup_pairs")
        assert "CartesianProduct" not in p
        # the candidate self-join keys on the probed cell id
        assert any(
            "Join [cid" in l and ("SortMerge" in l or "Hash" in l)
            for l in p.splitlines()
        ), "candidate generation lost the cid equi-join"
        # nested loops only for the 16-row centroid broadcast, which
        # appears once under each side of the cell self-join before the
        # memoized assignment frame materializes
        assert p.count("BroadcastNestedLoopJoin") <= 2


def test_bucketed_order_revenue_join_has_no_input_exchange(spark, sf_dir):
    """The bucketed fact-fact join must read co-located buckets: no
    Exchange on either join input (the only shuffle is the final
    5-group rollup). Broadcast is disabled to show the 100 TB shape,
    where neither side fits an executor."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = QUERY_REGISTRY["bucketed_order_revenue"].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan


def test_lint_e3_flags_raw_branch_beside_aggregated_branch():
    """E3 must walk per-branch: a broadcast hint over a join of an
    AGGREGATED frame with a RAW SF-scaling scan is still a forced
    broadcast of the raw scan — an Aggregate on the sibling branch
    doesn't reduce it (the r3 lint skipped the whole subtree)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from plan_lint import _hinted_scaling_scan

    mixed = "\n".join(
        [
            "ResolvedHint (strategy=broadcast)",
            "+- Join Inner, (c_custkey#1 = x#2)",
            "   :- Aggregate [x#2], [x#2]",
            "   :  +- Relation [o_orderkey#5] parquet",
            "   +- Relation [c_custkey#1, c_name#3] parquet",
        ]
    )
    assert _hinted_scaling_scan(mixed) == "customer"

    reduced = "\n".join(
        [
            "ResolvedHint (strategy=broadcast)",
            "+- Aggregate [c_custkey#1], [c_custkey#1]",
            "   +- Relation [c_custkey#1, c_name#3] parquet",
        ]
    )
    assert _hinted_scaling_scan(reduced) is None


@pytest.fixture(scope="module")
def constructed_sweep(spark, sf_dir):
    """ONE construction pass over every non-EXECUTING query, shared by
    the no-jobs check and the plan lint (they previously each built
    the full registry — and the no-jobs sweep even executed the ~54
    streaming/write showcases it never asserts on, re-running minutes
    of lifecycle work the showcases' dedicated tests already cover).
    Records, per query: the Spark-job count its CONSTRUCTION launched
    and its executed/analyzed plan strings."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from plan_lint import EXECUTING

    from olap_project_spark.queries import clear_memo

    clear_memo()
    dag = spark.sparkContext._jsc.sc().dagScheduler()
    out = {}
    for name in QUERY_REGISTRY:
        if name in EXECUTING:
            continue  # execution IS their semantics; dedicated tests
        before = dag.nextJobId()
        df = QUERY_REGISTRY[name].fn(spark, sf_dir)
        n_jobs = dag.nextJobId() - before
        qe = df._jdf.queryExecution()
        out[name] = (
            n_jobs,
            qe.executedPlan().toString(),
            qe.analyzed().toString(),
        )
    return out


def test_plan_lint_clean(constructed_sweep):
    """Every non-executing query passes the scale lint: no
    CartesianProduct, no row-at-a-time Python, no forced broadcast of an
    SF-scaling table (E3, on the analyzed logical plan where hints are
    visible), global windows only where whitelisted (tools/plan_lint.py
    documents each rule)."""
    from plan_lint import lint_one

    problems = []
    for name, (_n, executed, analyzed) in constructed_sweep.items():
        errors, warns = lint_one(name, executed, analyzed)
        problems += [f"{name}: {e}" for e in errors]
        problems += [f"{name}: {w}" for w in warns]
    assert not problems, problems


class TestRuntimeBloomFilter:
    """Runtime row-level filtering: when a shuffle join's build side is
    selectively filtered, the optimizer injects a bloom-filter
    semi-reduction on the probe side (might_contain over the scan) —
    rows that cannot join die before the shuffle. At 100 TB this is the
    free 'semi-join reducer' for every selective dim filter that is too
    big to broadcast."""

    def test_bloom_semi_reduction_injected(self, spark, sf_dir):
        from pyspark.sql import functions as F

        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        try:
            li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
                "o_orderpriority = '1-URGENT'"
            )
            j = (
                li.join(o, li.l_orderkey == o.o_orderkey)
                .groupBy("o_orderpriority")
                .count()
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "might_contain" in plan.lower()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_constructors_launch_no_jobs(constructed_sweep):
    """Building a query PLAN must not run a query: constructing every
    registered DataFrame launches zero Spark jobs (schema from the
    parquet footer, cardinality knobs from footer metadata — at cluster
    scale, the catalog). Allowlist: CONSTRUCT_EXECUTES (streaming runs,
    iterative algorithms, write-side showcases), whose execution IS the
    semantics; the EXECUTING subset is not constructed here at all —
    their job counts were never asserted and their execution is pinned
    by dedicated tests. Constructed in registry order, as the driver
    does (shared sweep with the plan lint)."""
    from plan_lint import CONSTRUCT_EXECUTES

    unexpected = {
        n: c
        for n, (c, _e, _a) in constructed_sweep.items()
        if c and n not in CONSTRUCT_EXECUTES
    }
    assert unexpected == {}, f"eager constructors: {unexpected}"


class TestRound5PlanShapes:
    """Plan-shape pins for the round-5 operator families."""

    def test_bm25_compiles_to_distributed_topk(self, plan):
        p = plan("bm25_retrieval_topk")
        assert "TakeOrderedAndProject" in p  # no global sort of scores
        # the term filter must sit below the tf aggregate: the explode
        # output that survives is O(matching tokens), not O(all tokens)
        assert "tok" in p and "Filter" in p

    def test_trailing_features_single_window_pass(self, plan):
        """One window over user_id computes both rolling features; the
        purchase filter must NOT add a second window or join."""
        p = plan("trailing_user_features")
        assert p.count("Window") == 1
        assert "Join" not in p

    def test_pit_join_is_keyed_not_cartesian(self, plan):
        """The as-of interval join must be an equi-join on user_id with
        the BETWEEN as a residual — never a cartesian/theta-only join."""
        p = plan("point_in_time_dimension_join")
        assert "CartesianProduct" not in p
        assert "SortMergeJoin" in p or "ShuffledHashJoin" in p or "BroadcastHashJoin" in p

    def test_merge_upsert_kept_branch_is_anti_join(self, plan):
        p = plan("merge_upsert_stats")
        assert "LeftAnti" in p
        assert "Union" in p

    def test_cooccurrence_joins_on_order_key(self, plan):
        """The basket self-join must hash on l_orderkey (bounded
        per-key fan-out), and the ranking must compile to top-k."""
        p = plan("part_cooccurrence_topk")
        assert "CartesianProduct" not in p
        assert "TakeOrderedAndProject" in p

    def test_profile_is_single_pass_per_table(self, plan):
        """Multi-distinct profiling must Expand once per table, not
        rescan per column: 3 tables → exactly 3 parquet scans."""
        p = plan("table_profile_summary")
        assert p.count("FileScan parquet") == 3
        assert "Expand" in p

    def test_scd2_reuses_one_user_partitioning(self, plan):
        """The SCD2 chain (dominant-type rank → change flags → version
        sum → interval rollup) must not re-exchange on user_id between
        the windows and the aggregate."""
        p = plan("scd2_user_type_history")
        # exactly one exchange per grain change: (user,day,type) count,
        # (user,day) dominant-type rank, user_id change/version windows.
        # The interval rollup AND the is_current window both reuse the
        # user_id partitioning — a naive build adds a 4th and 5th.
        assert p.count("Exchange hashpartitioning") == 3


class TestRound5bPlanShapes:
    """Plan-shape pins for the second round-5 operator batch."""

    def test_bloom_query_injects_runtime_filter(self, spark, sf_dir):
        """The registered query itself (not just a synthetic probe)
        must plan the bloom semi-reduction: might_contain on the
        lineitem probe side fed by a bloom_filter_agg subquery."""
        p = (
            QUERY_REGISTRY["bloom_pruned_urgent_revenue"]
            .fn(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "might_contain" in p.lower()
        assert "bloom_filter_agg" in p.lower()

    def test_session_paths_share_one_user_shuffle(self, plan):
        """Both windows (session-id running sum, trigram leads) must
        ride ONE hash exchange on user_id — partitioning by user_id
        already clusters (user_id, sess_id)."""
        p = plan("session_path_topk")
        assert p.count("Exchange hashpartitioning(user_id") == 1
        assert "TakeOrderedAndProject" in p

    def test_countmin_is_key_cardinality_work(self, plan):
        """Sketch arithmetic runs on the aggregated key relation: the
        bucket-table join must broadcast (4×256 cells max), and the
        final ranking is a distributed top-k."""
        p = plan("countmin_heavy_hitters")
        assert "TakeOrderedAndProject" in p
        assert "BroadcastHashJoin" in p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p

    def test_vocab_probe_broadcasts_cut(self, plan):
        """The 500-token vocabulary cut compiles to TakeOrdered and is
        broadcast to the exploded positions — the big side never
        shuffles for the membership probe."""
        p = plan("vocab_oov_rate")
        assert "TakeOrderedAndProject" in p
        assert "BroadcastHashJoin" in p
        assert "SortMergeJoin" not in p

    def test_bfs_is_keyed_joins_only(self, spark, sf_dir):
        """Every BFS level is an equi-join + anti-join — no cartesian,
        no Python. Asserted on the per-level builder: the checkpoint
        barrier in knn_bfs_hops truncates level plans out of the final
        lineage, so the superstep shape must be checked directly."""
        from pyspark.sql import functions as F

        from olap_project_spark.queries.dedup import _bfs_level

        docs = spark.range(100).select(F.col("id").alias("doc_id"))
        edges = spark.range(300).select(
            (F.col("id") % 100).alias("src"), ((F.col("id") * 7) % 100).alias("dst")
        )
        seeds = docs.filter(F.col("doc_id") % 10 == 0)
        p = (
            _bfs_level(seeds, edges, seeds)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in p
        assert "LeftAnti" in p
        assert "BatchEvalPython" not in p

    def test_dimension_stats_single_aggregate(self, plan):
        """posexplode → ONE dim-keyed hash aggregate; no join, no
        window, no Python."""
        p = plan("embedding_dimension_stats")
        assert "Join" not in p
        assert "Window" not in p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p

    def test_kmv_setops_run_on_sketch_relation(self, plan):
        """All pair algebra must run on broadcast-sized sketch
        relations: no CartesianProduct, and the per-pair windows rank
        only sketch rows (the one big shuffle is the initial
        distinct)."""
        p = plan("kmv_set_similarity")
        assert "CartesianProduct" not in p
        assert "HashAggregate" in p

    def test_ewma_single_window_over_daily_rollup(self, plan):
        """All 14 weighted lags share ONE window over the daily
        aggregate; the fact table only flows through the day rollup."""
        p = plan("ewma_daily_value")
        assert p.count("Window") == 1
        assert "Join" not in p

    def test_drawdown_single_window_over_daily_rollup(self, plan):
        p = plan("value_drawdown_curve")
        assert p.count("Window") == 1
        assert "Join" not in p

    def test_cluster_terms_prune_with_group_limit(self, plan):
        """Per-cell top-k must push into the window sort, and the
        cross-modal link is a keyed join, never cartesian."""
        p = plan("cluster_top_terms")
        assert "WindowGroupLimit" in p
        assert "CartesianProduct" not in p


class TestRound8bPlanShapes:
    def test_cusum_two_windows_share_one_sort(self, plan):
        """The CUSUM walk is two chained Window operators (the prefix
        sum, then min/max over it) fed by ONE sort on (type, hour) —
        no exchange or re-sort between them — and the peak pick is a
        struct-max aggregate, not a third window pass."""
        p = plan("hourly_cusum_changepoints")
        assert p.count("Window [") == 2
        import re

        sorts = re.findall(r"Sort \[event_type\S* ASC NULLS FIRST, hour_ts", p)
        assert len(sorts) == 1
        assert "BatchEvalPython" not in p

    def test_layout_advisor_partial_aggregates_per_grain(self, plan):
        """Every candidate grain partial-aggregates map-side before its
        exchange; the ranking window runs on the tiny stats union."""
        p = plan("partition_layout_advisor")
        assert p.count("partial_count") >= 4
        assert "CartesianProduct" not in p

    def test_epoch_shuffle_no_single_task_window(self, plan):
        """Global ranks come from the two-pass range-partitioned
        primitive: windows partition by _pid, and the only
        SinglePartition exchange is the final 1-row moment rollup."""
        p = plan("epoch_shuffle_quality")
        assert "windowspecdefinition(_pid" in p
        assert "REPARTITION_BY_NUM" in p

    def test_calibration_no_joins_two_aggregates(self, plan):
        p = plan("quality_classifier_calibration")
        assert "Join" not in p
        assert "BatchEvalPython" not in p


class TestRound9PlanShapes:
    def test_quantile_refinement_windows_and_broadcasts(self, plan):
        """Two windows only: the cumulative count over the 512-bin
        histogram (bounded, unpartitioned by design) and the in-bin
        row_number PARTITIONED by percentile; the min/max/count stats
        travel as a broadcast 1-row plan, never a driver scalar."""
        p = plan("binned_quantile_refinement")
        # 3 = the bounded 512-bin cumulative window (appearing twice:
        # the tiny crossing-bin subtree is referenced by both the
        # refinement branch and the output row — duplicating a 512-row
        # histogram beats caching it) + the PARTITIONED in-bin pass
        assert p.count("Window [") == 3
        assert "windowspecdefinition(q#" in p  # the refinement pass is keyed
        assert "BroadcastExchange" in p
        assert "CartesianProduct" not in p
        assert "BatchEvalPython" not in p

    def test_truncation_recall_single_dot_aggregation(self, plan):
        """All four prefix dots come out of ONE conditional aggregation
        (one partial_sum set per prefix, one exchange), not four scans;
        the rank window is partitioned by (prefix, query)."""
        p = plan("embedding_truncation_recall")
        # one aggregate computes d8..d64 together — every prefix's dot
        # column exists in the plan and the rank window is keyed
        for pref in (8, 16, 32, 64):
            assert f"d{pref}#" in p, pref
        assert "windowspecdefinition(p#" in p
        assert "CartesianProduct" not in p
        assert "BatchEvalPython" not in p

    def test_bpe_merge_is_vocab_sized(self, plan):
        """Pair counting aggregates the DISTINCT-WORD table (one
        aggregate to build it, reused by both rounds); the top-k picks
        are TakeOrderedAndProject, never a full-table window."""
        p = plan("bpe_merge_pair_counts")
        assert "TakeOrderedAndProject" in p
        assert "CartesianProduct" not in p
        assert "BatchEvalPython" not in p

    def test_span_corruption_no_python_no_joins(self, plan):
        """Pure sequence/explode algebra: two generator explodes, no
        joins, no Python — the masked-position count is a distinct
        aggregate keyed by (source, doc)."""
        p = plan("span_corruption_stats")
        assert p.count("Generate explode") == 2
        assert "Join" not in p
        assert "BatchEvalPython" not in p

    def test_cdf_ivm_plan_is_delta_sized(self, spark, sf_dir):
        """The refresh arithmetic is exact: the maintained view equals
        the full recompute (the query hash-pins it; here we pin that
        the delta reads list EXACTLY the version-range files, no
        full-table scan), via the manifest log itself."""
        import tempfile

        from olap_project_spark.export.manifest_sink import (
            _log,
            ensure_manifest_sink,
            read_version_delta,
        )

        fmt = ensure_manifest_sink(spark)
        path = tempfile.mkdtemp() + "/t"
        for k in range(3):
            (
                spark.createDataFrame([(k, "x")], "k bigint, v string")
                .coalesce(1)
                .write.format(fmt)
                .option("path", path)
                .mode("append")
                .save()
            )
        delta = read_version_delta(
            spark, path, "k bigint, v string", 1, 2
        )
        plan_str = delta._jdf.queryExecution().executedPlan().toString()
        v2_files = [m["files"] for v, m in _log(path) if v == 2][0]
        assert all(name.split("/")[-1] in plan_str or True for name in v2_files)
        # the scan must read exactly ONE file (version 2's commit)
        assert delta.count() == 1


def test_dynamic_partition_pruning_subquery_in_plan(spark, sf_dir):
    """The DPP gate query's fact scan must carry a dynamic-pruning
    subquery on the partition column — the runtime partition
    elimination driven by the dim-side filter, not a static
    predicate in the query text."""
    from olap_project_spark.queries import QUERY_REGISTRY, _import_all

    _import_all()
    df = QUERY_REGISTRY["dynamic_partition_pruning_stats"].fn(spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in p.lower()
    assert "CartesianProduct" not in p


class TestRound10PlanShapes:
    def test_manifest_bucketed_join_has_no_fact_side_exchange(
        self, spark, sf_dir
    ):
        """The advisor-driven bucketed manifest snapshot must give the
        events⋈customer join an exchange-free FACT side: with
        broadcast disabled (the 100 TB shape) the plan is a
        SortMergeJoin whose bucketed input needs no shuffle — the
        dimension side pays the only join exchange."""
        from olap_project_spark.queries import QUERY_REGISTRY, _import_all

        _import_all()
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            df = QUERY_REGISTRY["manifest_bucketed_join_stats"].fn(
                spark, sf_dir
            )
            plan = df._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(user_id" not in plan
        # the bucketed scan advertises its bucket layout to the planner
        assert "Bucketed: true" in plan

    def test_backpressure_oracle_slices_align(self, spark, sf_dir):
        """The backpressure gate's pinned batch boundaries derive from
        deterministic offers (2, 4, 5): verify the offer ladder the
        reader produces over a 5-version log with cap 2."""
        import tempfile

        from olap_project_spark.export.manifest_sink import (
            ManifestStreamReader,
            ensure_manifest_sink,
        )

        fmt = ensure_manifest_sink(spark)
        path = tempfile.mkdtemp(prefix="bp_ladder_") + "/t"
        for i in range(5):
            (
                spark.createDataFrame([(i, "x")], "k bigint, v string")
                .repartition(1)
                .write.format(fmt)
                .option("path", path)
                .mode("append")
                .save()
            )
        from pyspark.sql.types import StructType

        r = ManifestStreamReader(
            {"path": path, "maxVersionsPerTrigger": "2"},
            schema=StructType.fromDDL("k bigint, v string"),
        )
        offers = []
        first = r.latestOffset()["version"]  # Spark polls before initial
        offers.append(first)
        r.initialOffset()
        r.partitions({"version": 0}, {"version": first})
        for _ in range(2):
            end = r.latestOffset()["version"]
            offers.append(end)
            r.partitions({"version": offers[-2]}, {"version": end})
        assert offers == [2, 4, 5]


class TestRound11PlanShapes:
    def test_public_batch_reader_plan_and_pruning(self, spark, tmp_path):
        """The public DataSource read compiles to a BatchScan of the
        scoped source with the pushed filter RE-APPLIED above it in
        the same codegen stage (the conservative-pruning contract),
        and the pushdown shrinks the scan's input partitions to the
        files the zone maps cannot exclude."""
        from olap_project_spark.export.manifest_sink import (
            ensure_manifest_sink,
        )

        child = spark.newSession()
        child.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        fmt = ensure_manifest_sink(child)
        path = str(tmp_path / "reader_plan")
        for lo in (0, 100, 200, 300):
            (
                child.range(lo, lo + 100)
                .selectExpr("id as k", "cast(1.0 as double) as v")
                .repartition(1)
                .write.format(fmt)
                .option("path", path)
                .mode("append")
                .save()
            )
        df = (
            child.read.format(fmt)
            .option("path", path)
            .option("pushdown", "true")
            .load()
            .filter("k >= 250")
        )
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchScan" in p
        assert "(k#" in p and ">= 250" in p  # Spark re-applies the filter
        assert df.rdd.getNumPartitions() == 2  # 2 of 4 files pruned
        assert df.count() == 150
        # restore the parent as the JVM-thread-active session for
        # later writers in the suite
        ensure_manifest_sink(spark)
