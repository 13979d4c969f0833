"""The driver's correctness gate samples the FIRST 50 registered
queries. These tests pin the round-14 rotation: the 18 round-13
additions that had never been driver-checked occupy the window alongside
the oldest (round-7) refresh rows, every windowed query is
oracle-backed, and reordering loses nothing."""

from __future__ import annotations

from olap_project_spark.queries import GATE_WINDOW, QUERY_REGISTRY, _import_all


def setup_module():
    _import_all()


def test_window_is_first_50_registered():
    assert len(GATE_WINDOW) == 50
    assert list(QUERY_REGISTRY)[:50] == list(GATE_WINDOW)


def test_window_names_all_exist():
    missing = [n for n in GATE_WINDOW if n not in QUERY_REGISTRY]
    assert missing == []


def test_every_windowed_query_is_oracle_backed():
    weak = [n for n in GATE_WINDOW if QUERY_REGISTRY[n].oracle is None]
    assert weak == []


def test_rotation_loses_no_queries():
    # reordering must be a permutation, not a filter
    assert len(QUERY_REGISTRY) >= 144
    assert len(set(QUERY_REGISTRY)) == len(QUERY_REGISTRY)


def test_clear_memo_evicts_and_unpersists(spark, sf_dir):
    from olap_project_spark.queries import _SESSION_MEMO, clear_memo, session_memo

    clear_memo()
    df = session_memo(
        spark, sf_dir, "gate_window_test", lambda: spark.range(10)
    )
    assert df.count() == 10
    assert any(k[2] == "gate_window_test" for k in _SESSION_MEMO)
    # wrong corpus → no-op; right corpus → evicted and unpersisted
    assert clear_memo(spark, sf_dir="/nonexistent") == 0
    n = clear_memo(spark, sf_dir=sf_dir)
    assert n >= 1
    assert not any(k[1] == sf_dir for k in _SESSION_MEMO)
    assert df.storageLevel.useMemory is False


def test_window_covers_the_never_checked_families():
    w = set(GATE_WINDOW)
    # the round-13 additions that had no driver row before this rotation
    for name in (
        "sft_format_stats",
        "join_cardinality_estimate_stats",
        "stream_replace_ingest_stats",
        "sql_constraints_stats",
        "ndv_sketch_stats",
        "insert_overwrite_stats",
        "matview_join_stats",
        "sql_wap_stats",
    ):
        assert name in w, name


def test_catalog_in_sync_with_registry():
    """QUERIES.md is generated from the registry (tools/gen_catalog.py);
    it must list every registered query so the catalog never rots."""
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "QUERIES.md")
    text = open(path).read()
    missing = [n for n in QUERY_REGISTRY if f"`{n}`" not in text]
    assert missing == [], f"run tools/gen_catalog.py; missing: {missing[:5]}"


def test_r15_draft_window_is_valid():
    """The pre-staged round-15 window must stay swappable: exactly 50
    unique registered names, all oracle-backed, none overlapping the
    active round-14 window (every slot either adds a first-time row or
    refreshes one of the oldest)."""
    from olap_project_spark.queries import GATE_WINDOW_R15_DRAFT

    assert len(GATE_WINDOW_R15_DRAFT) == 50
    assert len(set(GATE_WINDOW_R15_DRAFT)) == 50
    missing = [n for n in GATE_WINDOW_R15_DRAFT if n not in QUERY_REGISTRY]
    assert missing == []
    weak = [
        n for n in GATE_WINDOW_R15_DRAFT if QUERY_REGISTRY[n].oracle is None
    ]
    assert weak == []
    overlap = set(GATE_WINDOW_R15_DRAFT) & set(GATE_WINDOW)
    assert overlap == set(), overlap
