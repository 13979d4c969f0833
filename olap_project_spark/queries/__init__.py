"""The engine's query library.

Every query is registered with:
- a DataFrame implementation ``(spark, sf_dir) -> DataFrame`` — the
  engine's native, Catalyst-optimized path;
- optionally an ANSI-SQL oracle string DuckDB can run over the same
  parquet tables (pre-registered views) — the driver's correctness gate.

Cross-engine hash-stability conventions (every query obeys these):
- calendar fields cast to INT on both sides (DuckDB's year()/hour()
  return BIGINT natively, Spark's return INT);
- counts stay BIGINT; DuckDB SUM(integer) is HUGEINT → CAST AS BIGINT;
- money/doubles rounded to 2 dp, ratios to 6 dp, on both sides;
- every LIMIT is preceded by a total order (unique tiebreaker) so the
  selected rows are engine-independent;
- matching column aliases in the DataFrame code and the SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    # ANSI SQL for DuckDB; None → rows-only check. May be registered as
    # a zero-arg callable for oracles that are expensive to BUILD (the
    # pos_* family embeds ~800 generated rows as a VALUES block) — the
    # string is then materialized on first `.oracle` access and cached,
    # so processes that never read oracles (bench, plan lint, most
    # pytest workers) never pay the construction cost.
    oracle_src: str | Callable[[], str] | None
    doc: str

    @property
    def oracle(self) -> str | None:
        src = self.oracle_src
        if callable(src):
            src = src()
            object.__setattr__(self, "oracle_src", src)
        return src


QUERY_REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | Callable[[], str] | None = None):
    """Decorator registering a query implementation (+ optional oracle,
    given as the SQL string or a zero-arg thunk returning it).

    Duplicate names are an ERROR: a second registration would silently
    shadow the first (and orphan its tests and driver-gate history).
    Module re-imports are no-ops because the existing entry holds the
    same function — only a genuinely different function collides."""

    def deco(fn):
        prev = QUERY_REGISTRY.get(name)
        if prev is not None and (
            prev.fn.__code__.co_filename != fn.__code__.co_filename
            or prev.fn.__code__.co_firstlineno != fn.__code__.co_firstlineno
        ):
            raise ValueError(
                f"query name {name!r} already registered by "
                f"{prev.fn.__module__}.{prev.fn.__qualname__}; "
                "pick a distinct name"
            )
        QUERY_REGISTRY[name] = QueryDef(name, fn, oracle, fn.__doc__ or "")
        return fn

    return deco


# Session-scoped memo for intermediates shared by several queries (the
# shingle set, the verified ngram pairs, the cast embeddings corpus). A
# gate/bench run executes the whole registry against one corpus; without
# this each consumer re-derives the intermediate from the raw scan. At
# 100 TB the equivalent is materializing these once as bucketed tables.
_SESSION_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def session_memo(
    spark: SparkSession, sf_dir: str, kind: str, build: Callable[[], DataFrame]
) -> DataFrame:
    """Build-once, persist, and reuse ``kind`` for (session, corpus).

    Keyed on ``applicationId`` — unique and stable for the life of the
    context — not ``id()`` of a py4j proxy, which CPython can reuse
    after the old proxy is collected (a stop/start cycle could then
    hand a consumer a DataFrame bound to the dead context)."""
    key = (spark.sparkContext.applicationId, sf_dir, kind)
    df = _SESSION_MEMO.get(key)
    if df is None:
        df = build().persist()
        _SESSION_MEMO[key] = df
    return df


def clear_memo(spark: SparkSession | None = None, sf_dir: str | None = None) -> int:
    """Unpersist and evict memoized intermediates; returns the number
    evicted. Filters: only ``spark``'s context, only ``sf_dir``'s
    corpus, or everything when both are None. A long-lived session
    (notebook server, multi-corpus bench) calls this when it is done
    with a corpus — otherwise the memo grows by (corpus × kinds)
    persisted DataFrames for the life of the process."""
    removed = 0
    for key in list(_SESSION_MEMO):
        app_id, key_sf, _kind = key
        if spark is not None and app_id != spark.sparkContext.applicationId:
            continue
        if sf_dir is not None and key_sf != sf_dir:
            continue
        df = _SESSION_MEMO.pop(key)
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — context may already be stopped
            pass
        removed += 1
    return removed


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Scan one star-schema table (ns-timestamp-normalizing). A plain
    parquet scan: Catalyst pushes filters/projections into it, and
    partition discovery applies when the table is a partitioned
    directory (as our sinks write at scale)."""
    from olap_project_spark.sources.registry import load_table

    return load_table(spark, sf_dir, table)


# The driver's correctness gate samples the FIRST 50 registered
# queries. Rather than relying on module import order, the window is an
# explicit name list and the registry is rebuilt in that order after all
# modules import. Round-12 window (swapped in from the pre-staged r12
# draft after the ts-encoding canaries passed 3/3): the 14 round-11
# additions that have never had a driver CORRECTNESS row — the
# lakehouse operational tier (restore, clone, write-time expectations,
# table$partitions, token-bloom keyword search, materialized views with
# incremental CDF refresh, metadata-only aggregates, stream skip
# options, rename column, public pushdown batch reader, hidden
# partitioning, maintenance loop, multi-field transform pruning) and
# the k-means-trained IVF quantizer — plus the 24 last round-5 refresh
# rows and the 12 oldest round-6 rows. Rotate the list each round to
# cycle coverage.
GATE_WINDOW: tuple[str, ...] = (
    # round-11 additions — no driver CORRECTNESS row yet
    # (inserted here as they land)
    "manifest_restore_stats",
    "manifest_clone_stats",
    "expectations_quarantine_stats",
    "manifest_partitions_metadata_stats",
    "token_bloom_search_stats",
    "matview_incremental_refresh_stats",
    "metadata_only_aggregate_stats",
    "stream_skip_change_commits_stats",
    "column_rename_stats",
    "manifest_batch_reader_stats",
    "hidden_partitioning_stats",
    "ann_trained_quantizer_stats",
    "auto_maintenance_stats",
    "multi_transform_pruning_stats",
    # round-5 refresh slots — 24 (the last of the round-5 rows)
    "session_funnel_stats",
    "pii_redaction_stats",
    "sql_urgent_open_customers",
    "context_packing_stats",
    "quantized_cosine_quality",
    "ann_topk_bruteforce",
    "ivf_near_dup_pairs",
    "exact_dedup_summary",
    "ngram_dup_pairs",
    "minhash_dup_pairs",
    "simhash_dup_pairs",
    "near_dup_clusters",
    "fuzzy_part_name_pairs",
    "dup_triangles",
    "doc_knn_graph",
    "pagerank_canonical_docs",
    "events_by_hour",
    "anomalous_hours",
    "event_type_summary",
    "user_error_rates",
    "large_events_profile",
    "daily_error_trend",
    "weekend_vs_weekday",
    "above_avg_error_users",
    # round-6 refresh slots — 21 (CORRECTNESS_r06 order; tail
    # trimmed as round-11 additions landed)
    "conversion_latency_quantiles",
    "score_lift_gains",
    "bootstrap_mean_ci",
    "retrieval_eval_metrics",
    "benford_digit_audit",
    "cusum_changepoints",
    "k_anonymity_audit",
    "value_drawdown_curve",
    "cluster_top_terms",
    "aqe_skew_join_stats",
    "ewma_daily_value",
    "embedding_dimension_stats",
)


# Round-13 window, pre-staged (swap into GATE_WINDOW at round-13 start
# AFTER the ts-encoding canaries, per the standing procedure).
# Maintained live during round 12: new round-12 queries are inserted
# at the HEAD and the refresh tail is trimmed to keep the list at
# exactly 50. Current composition: the 38 remaining round-6 rows
# (CORRECTNESS_r06 order) + the 12 oldest round-7 rows
# (CORRECTNESS_r07 order; tail trimmed as round-12 additions land).
GATE_WINDOW_R13_DRAFT: tuple[str, ...] = (
    # round-12 additions — no driver CORRECTNESS row yet
    # (inserted here as they land)
    "token_search_multi_stats",
    "partition_spec_evolution_stats",
    "stream_matview_freshness_stats",
    "sql_lakehouse_ddl_stats",
    "field_id_reader_stats",
    "sql_dml_roundtrip_stats",
    "alter_ddl_stats",
    "log_checkpoint_stats",
    # round-6 refresh slots — 38 (the last of the round-6 rows)
    "kmv_set_similarity",
    "countmin_heavy_hitters",
    "session_path_topk",
    "knn_bfs_hops",
    "vocab_oov_rate",
    "bloom_pruned_urgent_revenue",
    "stateful_spend_alerts",
    "zorder_pruning_benefit",
    "scd2_user_type_history",
    "merge_upsert_stats",
    "table_profile_summary",
    "cohort_retention_matrix",
    "multi_touch_attribution",
    "approx_quantile_contract",
    "point_in_time_dimension_join",
    "bm25_retrieval_topk",
    "cascading_delete_audit",
    "minhash_lsh_quality",
    "value_drift_psi",
    "hybrid_rrf_retrieval",
    "trailing_user_features",
    "revenue_share_drilldown",
    "revenue_growth_mom_yoy",
    "part_cooccurrence_topk",
    "incremental_join_view",
    "latest_event_per_user",
    "signup_purchase_funnel",
    "weekly_retention",
    "geometric_mean_value",
    "hourly_type_pivot",
    "value_histogram",
    "value_percentiles",
    "props_json_stats",
    "segment_event_value",
    "salted_type_stats",
    "event_transition_matrix",
    "event_type_associations",
    "stateful_record_highs",
    # round-7 refresh slots — 12 (CORRECTNESS_r07 order; tail
    # trimmed as round-12 additions land)
    "daily_operations_summary",
    "prefix_filtered_dup_pairs",
    "stratified_sample_stats",
    "pq_adc_quality",
)


def _import_all() -> None:
    # Import for registration side effects, then rebuild the registry
    # with GATE_WINDOW first (the driver gate samples the first 50).
    from olap_project_spark.queries import (  # noqa: F401
        tpch_suite,
        text,
        temporal,
        streaming_queries,
        multimodal,
        iterative,
        relational,
        similarity,
        dedup,
        curation,
        events,
        warehouse,
        posfact,
    )

    ordered = [n for n in GATE_WINDOW if n in QUERY_REGISTRY]
    ordered += [n for n in QUERY_REGISTRY if n not in GATE_WINDOW]
    reordered = {n: QUERY_REGISTRY[n] for n in ordered}
    QUERY_REGISTRY.clear()
    QUERY_REGISTRY.update(reordered)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _import_all()
    return {n: q.fn for n, q in QUERY_REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _import_all()
    return {n: q.oracle for n, q in QUERY_REGISTRY.items() if q.oracle}
