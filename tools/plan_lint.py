#!/usr/bin/env python3
"""Lint the physical plan of EVERY registered (non-executing) query
against the engine's scale rules — the automated form of the review
each query's docstring claims:

ERROR-level (exit 1):
  E1  CartesianProduct — an unconstrained NxM join never survives scale.
      (BroadcastNestedLoopJoin is allowed: the engine uses it only for
      deliberate 1-row/tiny broadcasts — global totals, centroid rows.)
  E2  BatchEvalPython — row-at-a-time Python in a hot path. Python is
      allowed only Arrow-batched (ArrowEvalPython / MapInPandas /
      FlatMapGroupsInPandas) and only in the whitelisted families.
  E3  Explicit broadcast hint on an SF-scaling table — a ResolvedHint
      (broadcast) whose subtree scans customer/supplier/part/orders/
      lineitem/events/documents/embeddings without an intervening
      Aggregate. Such a hint forces an executor-OOM plan at 100×; drop
      it and let AQE convert to broadcast at runtime when the side is
      actually small. Bounded exceptions (1-row query vector, ≤16
      centroid rows selected by a constant predicate) are whitelisted.

  E4  Unpartitioned WindowExec — a window with no partition spec
      serializes its whole frame through ONE task. Detected from the
      physical plan (a Window node with two top-level bracket groups
      instead of three). Allowed only for the GLOBAL_WINDOW_OK set,
      every member of which windows over a BOUNDED frame (a day/hour/
      week spine, a ≤k-row top-k result, the 25-nation rollup, the
      32-resample table…) — never an entity dimension that grows with
      the data. Entity-level global ranks/prefix sums must use
      functions/scale.global_order_stats (range-partitioned two-pass)
      instead.

WARN-level (reported, exit 0):
  W1  Exchange SinglePartition whose nearest enclosing Window/Sort/
      Aggregate ancestor is a Window or Sort — the frame genuinely
      serializes into the window (a SinglePartition feeding a 1-row
      global-total aggregate does NOT warn). Kept warn-level for
      visibility outside GLOBAL_WINDOW_OK; E4 is the hard gate.
  W2  Arrow-batched Python outside the multimodal/udaf families.

Usage:
    python3 tools/plan_lint.py            # lint everything
    python3 tools/plan_lint.py q1 q2      # lint a subset
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Queries that execute work at build time (streaming, driver-loop
# iteration) — their final DataFrame is a materialized table, so the
# interesting plans are asserted in their dedicated tests instead.
EXECUTING = {
    "streaming_hourly_stats",
    "streaming_sliding_stats",
    "streaming_session_counts",
    "streaming_click_attribution",
    "streaming_left_outer_attribution",
    "streaming_full_outer_attribution",
    "streaming_update_mode_counts",
    "streaming_complete_mode_totals",
    "streaming_distinct_user_types",
    "streaming_continuous_rollup",
    "streaming_segment_enrichment",
    "stateful_spend_alerts",
    "stateful_record_highs",
    "stateful_cusum_alarms",
    "kmeans_cluster_profile",
    "near_dup_clusters",
    "part_entity_clusters",
    "format_roundtrip_stats",
    "manifest_snapshot_stats",
    "manifest_schema_evolution_stats",
    "manifest_file_skipping_stats",
    "manifest_snapshot_diff_stats",
    "manifest_table_history",
    "pos_stream_user_totals",
    "pos_route_counts",  # runs the foreachBatch pipeline into tmp sinks
    "mmr_diversified_topk",  # bounded-pool greedy collects 20 rows at build
    "pos_stream_manifest_ingest",  # streams through the manifest sink twice
    "manifest_vacuum_stats",  # builds, compacts, and vacuums the table once
    "pos_stream_merge_upsert",  # streaming foreachBatch MERGE into the sink
    "manifest_lifecycle_stats",  # ingest -> compact -> vacuum lifecycle
    "manifest_delete_vector_stats",  # merge-on-read delete lifecycle
    "write_audit_publish_stats",  # branch stage/audit/publish loop
    "cdf_incremental_agg_refresh",  # CDF-driven IVM refresh loop
    "clustered_compaction_stats",  # OPTIMIZE ZORDER rewrite loop
    "pos_stream_wap_ingest",  # streaming branch/audit/publish loop
    "stateful_idle_timeout_retirement",  # EventTimeTimeout retirement
    "lakehouse_erasure_audit",  # delete -> compact -> vacuum erasure
    "manifest_bloom_skipping_stats",  # bloom point-lookup planning
    "manifest_files_metadata",  # builds + compacts the files table
    "manifest_stream_tail_stats",  # streaming tail + CDC mirror loop
    "manifest_stream_backpressure_stats",  # capped tail drain loop
    "manifest_stale_claim_gc_stats",  # crashed-claim vacuum recovery arc
    "partial_compaction_stats",  # range-scoped OPTIMIZE WHERE rewrite
    "cdf_delete_change_rows_stats",  # row-level CDF with delete rows
    "stateful_rocksdb_store_stats",  # RocksDB-backed streaming state
    "mor_upsert_stats",  # merge-on-read upsert (tombstone + append)
    "compaction_policy_stats",  # advise -> compact -> re-advise loop
    "manifest_type_widening_stats",  # v3 type-widening evolution
    "manifest_snapshot_tag_stats",  # named-ref tag lifecycle
    "manifest_nested_embeddings_stats",  # nested types through the sink
    "manifest_batch_reader_stats",  # public DataSource read w/ pushdown
    "hidden_partitioning_stats",  # partition-transform pruning
    "auto_maintenance_stats",  # plan -> compact -> vacuum policy loop
    "multi_transform_pruning_stats",  # multi-field spec pruning
}

# Queries whose CONSTRUCTOR may legitimately launch Spark jobs: the
# EXECUTING set (streaming runs, write-side showcases) plus the
# iterative-algorithm family, where per-iteration convergence checks /
# centroid collects are bounded scalar actions and part of the
# algorithm, not plan-build eagerness. Every other registered query
# must build its DataFrame with ZERO jobs (schema comes from the
# parquet footer, cardinality knobs from footer metadata) — enforced by
# tests/test_plans.py::test_constructors_launch_no_jobs.
CONSTRUCT_EXECUTES = EXECUTING | {
    # the CC label-propagation loop (iterative, localCheckpoint per
    # round) runs when the near_dup_cc_labels memo is first built —
    # which of its consumers pays is registry-order-dependent (gate
    # rotations reorder it), so EVERY consumer is allowlisted
    "near_dup_clusters",  # CC label propagation (iterative)
    "dedup_keep_best",  # built on the CC memo
    "dup_triangles",  # built on the CC memo
    "leakage_safe_split_stats",  # built on the CC memo
    "dedup_token_savings",  # built on the CC memo
    "pagerank_canonical_docs",  # fixed-point iteration
    "bucketed_order_revenue",  # writes the bucketed table once
    # advisor collect (4 rows) + one-time bucketed commit/compaction;
    # the returned join-aggregate plan itself stays lazy and lintable
    "manifest_bucketed_join_stats",
    # iterative BFS: each superstep localCheckpoints its frontier (the
    # Pregel barrier), which executes under AQE; per-level plan shape
    # is asserted in tests/test_plans.py instead
    "knn_bfs_hops",
    # builds the month-partitioned fact directory once (the DPP
    # substrate); the query plan itself stays lazy and lintable
    "dynamic_partition_pruning_stats",
    # observe()/CollectMetrics showcase: harvesting the metrics
    # requires the noop-sink action at construction time by design
    "observed_ingest_metrics",
    # DECLARE/SET VARIABLE are executed commands (each runs as a tiny
    # driver-side job) — executing them IS the session-variable
    # semantics being showcased; the SELECT itself stays lazy
    "sql_session_variable_params",
    # Lloyd training collects k×dim centroid partials per iteration
    # (bounded scalar pulls, the kmeans_cluster_profile pattern); the
    # returned probe plan itself stays lazy and lintable
    "ann_trained_quantizer_stats",
    # round-11 lakehouse lifecycle showcases: building the fixture
    # table (appends/delete/restore/clone/compaction/expectation
    # writes) IS the semantics; the returned stats frames stay lazy
    "manifest_restore_stats",
    "manifest_clone_stats",
    "expectations_quarantine_stats",
    "manifest_partitions_metadata_stats",
    "token_bloom_search_stats",
    "matview_incremental_refresh_stats",
    "metadata_only_aggregate_stats",
    "stream_skip_change_commits_stats",
    "column_rename_stats",
    # round-12 lakehouse lifecycle showcases: the fixture builds
    # (renamed/spec-evolved tables, the SQL DDL chain, the streamed
    # matview loop) and the driver-side planning probes (bitmap
    # intersections, getNumPartitions) ARE the semantics; the
    # returned stats frames stay lazy
    "token_search_multi_stats",
    "partition_spec_evolution_stats",
    "stream_matview_freshness_stats",
    "sql_lakehouse_ddl_stats",
    "field_id_reader_stats",
    "sql_dml_roundtrip_stats",
    "alter_ddl_stats",
    "log_checkpoint_stats",
    # round-13 lakehouse lifecycle showcases: the fixture builds (SQL
    # UPDATE/MERGE chains, matview create+refresh rounds, the cache
    # burst probes, the build-time parity collects) ARE the semantics;
    # every returned stats frame stays lazy once built
    "sql_update_stats",
    "sql_time_travel_stats",
    "matview_avg_stats",
    "log_cache_stats",
    "matview_join_stats",
    "sql_merge_breadth_stats",
    "matview_minmax_stats",
    "sql_cdf_tags_stats",
    "sql_wap_stats",
    "sql_warehouse_dx_stats",
    "branch_inventory_stats",
    "insert_overwrite_stats",
    "ndv_sketch_stats",
    "sql_constraints_stats",
    "stream_replace_ingest_stats",
    "join_cardinality_estimate_stats",
}

# Queries allowed an UNPARTITIONED window (E4 whitelist): every member
# windows over a frame BOUNDED independent of SF — a calendar spine
# (days/hours/weeks: thousands of rows a decade), a ≤k-row top-k
# result, a fixed bucket/bin table, the 25-nation rollup, or the
# 32-resample table. Entity-level frames (customers/users/parts — they
# grow with the data) are NOT allowed here; those use
# functions/scale.global_order_stats. The same set silences W1.
GLOBAL_WINDOW_OK = {
    # rank windows over the two 10-row component top-k results
    "hybrid_rrf_retrieval",
    # cumulative token ledger over the per-SOURCE aggregate (a bounded
    # dimension — dozens of sources at 100 TB, never the fact table)
    "curriculum_schedule_plan",
    # share-of-total / lag windows over nation (25-row) / month (~80-row)
    # rollups — aggregated inputs, never the fact table
    "revenue_share_drilldown",
    "revenue_growth_mom_yoy",
    # cumulative / lag windows over calendar spines (one row per day or
    # week; a decade is a few thousand rows) — at scale the window
    # gains a series-key partition, same plan keyed
    "weekly_value_growth",
    "cumulative_unique_users",
    "ewma_daily_value",
    "value_drawdown_curve",
    "cusum_changepoints",
    # frontier scan over distinct (price,size) measure pairs — the
    # measure-pair lattice, bounded by the price×size value grid, not
    # by row count
    "part_price_skyline",
    # rank window over the memoized 10-row top-k result
    "retrieval_eval_metrics",
    # rank window over the 32 resample means
    "bootstrap_mean_ci",
    # cumulative window over the 10-row bin table
    "score_lift_gains",
    # cumulative windows over the lifetime-days spine (calendar-
    # bounded; a decade is a few thousand rows)
    "km_churn_survival",
    # cumulative window over the fixed 512-bin histogram (bounded by
    # the bin-count constant, never by SF); the refinement pass's
    # in-bin row_number IS partitioned (by percentile)
    "binned_quantile_refinement",
    # rank windows over the two 5-row TakeOrderedAndProject results
    # (the hybrid_rrf_retrieval pattern: limit first, window after)
    "bpe_merge_pair_counts",
    # cumulative window over the fixed 4096-step score-bin table
    # (bounded by the integer score resolution, never by corpus size)
    "classifier_auc_roc",
}

# Families where Arrow-batched Python is the documented extension point
# (multimodal decode, custom grouped-agg sketches, UDTF chunking).
ARROW_PY_OK_PREFIXES = (
    "multimodal_",
    "frame_sample_",
    "media_feature_",
    "media_phash_",
    "media_codec_",  # real BMP/WAV struct decode (Arrow-batched by design)
    "media_energy_",  # real WAV frame-energy decode (Arrow-batched by design)
    "media_aspect_",  # real BMP header decode feeding ratio bucketing
    "media_resample_",  # real WAV decimate + re-encode round trip
    "doc_chunks",
    "repeated_chunks",
)


# SF-scaling tables: broadcasting any un-aggregated slice of these is
# wrong at scale, whatever the current gate size says. Identified in
# analyzed-plan Relation nodes by a signature column (the plan string
# doesn't carry file paths).
SCALING_TABLES = {
    "customer": "c_custkey#",
    "supplier": "s_suppkey#",
    "part": "p_partkey#",
    "orders": "o_orderkey#",
    "lineitem": "l_orderkey#",
    "events": "event_id#",
    "documents": "doc_id#",
    "embeddings": "vec_id#",
}

# Queries whose broadcast hints cover constant-bounded slices of a
# scaling table (1-row query vector `vec_id = 0`, ≤16 centroid rows
# `vec_id < 16`) — bounded by a literal, not by SF.
BROADCAST_BOUNDED_OK = {
    # query cells + query norms are `vec_id < 10` constant-literal
    # slices (10 vectors × 64 dims; the corpus side never broadcasts)
    "embedding_truncation_recall",
    "ann_topk_bruteforce",
    "ann_ivf_topk",
    "ann_filtered_topk",
    "ann_ivf_recall",
    "embedding_near_dup_pairs",
    "ivf_near_dup_pairs",
    "quantized_cosine_quality",
    "cluster_label_purity",
    "ann_multiprobe_topk",
    "ann_ivf_filtered_topk",
    "ann_multiprobe_recall",
    # composes ann_topk_bruteforce (1-row `vec_id = 0` query vector)
    "hybrid_rrf_retrieval",
    # consumes the memoized _ivf_ranked assignment (≤16 centroid rows)
    "cluster_top_terms",
    # 1-row `vec_id = 0` query-label broadcast (same bound as the ANN family)
    "retrieval_eval_metrics",
    # codebook = `vec_id < 64` subvectors (literal-bounded), 1-row query
    # vector, and the 8×64 ADC lookup table — all constant-size sides
    "pq_adc_quality",
    # consumes the memoized _ivf_ranked assignment (≤16 centroid rows)
    "knn_label_accuracy",
    # _ivf_ranked centroids + PQ codebook (vec_id < 64) + probe-cell
    # list + 1-row query vector — all literal-bounded sides
    "ann_ivf_pq_topk",
    # broadcasts _centroids (vec_id < 16, literal-bounded)
    "semantic_dedup_stats",
    # consumes the memoized _ivf_ranked assignment (≤16 centroid rows)
    "preference_pair_mining",
    # consumes the memoized _ivf_ranked assignment (≤16 centroid rows)
    "ann_hubness_audit",
    # _ivf_ranked centroids + ≤nprobe probed-cell ids + 1-row counts
    "ann_candidate_fraction",
    # 8 anchor rows + anchors×nprobe probed-cell ids — constant-size sides
    "hard_negative_mining",
    # broadcasts the customer rows matching the top-32 heavy-hitter
    # user list (LIMIT 32 after a unique total order) — ≤32 dim rows
    # regardless of SF; the E3 provenance scan can't see the bound
    "hybrid_skew_join_stats",
    # trained centroids (k=32 literal rows, collected k×dim doubles),
    # the 1-row `vec_id = 0` query cell/vector, and 1-row aggregates —
    # all literal-bounded sides
    "ann_trained_quantizer_stats",
}


def _indent(line: str) -> int:
    return len(line) - len(line.lstrip(" :+-"))


_REDUCING_NODES = ("Aggregate", "Deduplicate", "Distinct")


def _hinted_scaling_scan(analyzed: str) -> str | None:
    """Return the first SF-scaling table whose scan sits under a
    broadcast ResolvedHint with no Aggregate on ITS OWN ancestor path
    to the hint. The check is per-branch: a hint wrapping a join of an
    aggregated frame with a raw scaling scan must still flag the raw
    branch (an Aggregate elsewhere in the subtree does not reduce this
    scan)."""
    lines = analyzed.splitlines()
    for i, line in enumerate(lines):
        if "ResolvedHint" not in line or "BROADCAST" not in line.upper():
            continue
        hint_indent = _indent(line)
        end = len(lines)
        for j in range(i + 1, len(lines)):
            if lines[j].strip() and _indent(lines[j]) <= hint_indent:
                end = j
                break
        for j in range(i + 1, end):
            sub = lines[j]
            if "Relation [" not in sub:
                continue
            table = next(
                (t for t, m in SCALING_TABLES.items() if m in sub), None
            )
            if table is None:
                continue
            # ancestor chain = upward walk with strictly decreasing
            # indent; reduced only if a reducing node sits on THIS path
            min_indent = _indent(sub)
            reduced = False
            for k in range(j - 1, i, -1):
                up = lines[k]
                if not up.strip():
                    continue
                ki = _indent(up)
                if ki < min_indent:
                    min_indent = ki
                    if any(tok in up for tok in _REDUCING_NODES):
                        reduced = True
                        break
            if not reduced:
                return table
    return None


def _unpartitioned_windows(plan: str) -> int:
    """Count Window nodes with NO partition spec in a physical-plan
    string. A fully-specified node prints three top-level bracket
    groups (`Window [exprs], [partition], [order]`); with only two, the
    second group is EITHER the partition spec (unordered window — fine,
    it scales out by key) or the sort order (unpartitioned — the
    single-task global sort this rule rejects). The two are told apart
    by sort-direction markers, and an empty second group (``[]``,
    ``partitionBy()``) is likewise global. Brackets nest inside
    expressions, so groups are delimited by depth scan."""
    n = 0
    for line in plan.splitlines():
        idx = line.find("Window [")
        if idx < 0 or "WindowGroupLimit" in line:
            continue
        depth = 0
        groups: list[str] = []
        for ch in line[idx + len("Window ") :]:
            if ch == "[":
                if depth == 0:
                    groups.append("")
                depth += 1
                if depth == 1:
                    continue
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    continue
            if depth >= 1:
                groups[-1] += ch
        if len(groups) >= 3:
            continue  # partition spec present
        second = groups[1].strip() if len(groups) > 1 else ""
        is_ordered = " ASC" in second or " DESC" in second
        if is_ordered or not second:
            n += 1
    return n


def _single_partition_feeds_window(plan: str) -> bool:
    """True when an ``Exchange SinglePartition`` node's nearest
    Window/Sort/Aggregate ANCESTOR is a Window or Sort — i.e. the
    serialized frame flows into windowing, not into a 1-row global
    aggregate (which is the normal broadcast-total idiom)."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        min_indent = _indent(line)
        for k in range(i - 1, -1, -1):
            up = lines[k]
            if not up.strip():
                continue
            ki = _indent(up)
            if ki >= min_indent:
                continue
            min_indent = ki
            if "Window" in up or "Sort " in up:
                return True
            if "Aggregate" in up:
                break
    return False


def lint_one(
    name: str, plan: str, analyzed: str | None = None
) -> tuple[list[str], list[str]]:
    errors: list[str] = []
    warns: list[str] = []
    if "CartesianProduct" in plan:
        errors.append("E1 CartesianProduct")
    if analyzed is not None and name not in BROADCAST_BOUNDED_OK:
        hinted = _hinted_scaling_scan(analyzed)
        if hinted:
            errors.append(f"E3 forced broadcast of SF-scaling table {hinted}")
    if "BatchEvalPython" in plan:
        errors.append("E2 row-at-a-time Python (BatchEvalPython)")
    arrow_py = any(
        tok in plan
        for tok in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
    )
    if arrow_py and not name.startswith(ARROW_PY_OK_PREFIXES):
        warns.append("W2 Arrow Python outside whitelisted family")
    if name not in GLOBAL_WINDOW_OK:
        n_unpart = _unpartitioned_windows(plan)
        if n_unpart:
            errors.append(
                f"E4 unpartitioned WindowExec x{n_unpart} (single-task "
                "sort; use functions/scale.global_order_stats)"
            )
        elif _single_partition_feeds_window(plan):
            warns.append("W1 global window (Exchange SinglePartition)")
    return errors, warns


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument(
        "--sf", default=os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
    )
    args = ap.parse_args()

    from olap_project_spark.queries import QUERY_REGISTRY, _import_all
    from olap_project_spark.session import build_session

    _import_all()
    names = args.queries or [q for q in QUERY_REGISTRY if q not in EXECUTING]
    spark = build_session(
        app_name="plan-lint", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    n_err = 0
    for name in names:
        df = QUERY_REGISTRY[name].fn(spark, args.sf)
        qe = df._jdf.queryExecution()
        plan = qe.executedPlan().toString()
        analyzed = qe.analyzed().toString()
        errors, warns = lint_one(name, plan, analyzed)
        for e in errors:
            print(f"ERROR {name}: {e}")
        for w in warns:
            print(f"warn  {name}: {w}")
        n_err += len(errors)
    print(f"linted {len(names)} plans: {n_err} errors")
    return 1 if n_err else 0


if __name__ == "__main__":
    sys.exit(main())
