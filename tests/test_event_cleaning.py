"""Pure-Python references for the event-stream cleaning operators
(debounce dedup, watermark-lateness accounting) — complementing their
DuckDB oracles with an independent implementation."""

from __future__ import annotations

from collections import defaultdict

import pytest

from olap_project_spark.queries import QUERY_REGISTRY, _import_all

_import_all()


@pytest.fixture(scope="module")
def events(sf_dir):
    import duckdb

    return duckdb.sql(
        f"SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall()


def test_debounce_matches_python(spark, sf_dir, events):
    from olap_project_spark.queries.events import DEBOUNCE_SECONDS

    by_key = defaultdict(list)
    for eid, uid, etype, ts in events:
        by_key[(uid, etype)].append((ts, eid))
    dropped = defaultdict(int)
    raw = defaultdict(int)
    for (uid, etype), rows in by_key.items():
        rows.sort()
        raw[etype] += len(rows)
        for prev, cur in zip(rows, rows[1:]):
            if (cur[0] - prev[0]).total_seconds() <= DEBOUNCE_SECONDS:
                dropped[etype] += 1
    got = {
        r["event_type"]: r
        for r in QUERY_REGISTRY["debounced_event_counts"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(raw)
    for etype in raw:
        assert got[etype]["n_raw"] == raw[etype]
        assert got[etype]["n_dropped"] == dropped[etype]
        assert got[etype]["n_kept"] == raw[etype] - dropped[etype]


def test_lateness_matches_python(spark, sf_dir, events):
    from olap_project_spark.queries.events import LATENESS_WATERMARK_S

    by_user = defaultdict(list)
    for eid, uid, etype, ts in events:
        by_user[uid].append((eid, etype, ts))
    n_events = defaultdict(int)
    n_late = defaultdict(int)
    for uid, rows in by_user.items():
        rows.sort()  # arrival order = event_id
        high = None
        for _eid, etype, ts in rows:
            high = ts if high is None or ts > high else high
            n_events[etype] += 1
            if (high - ts).total_seconds() > LATENESS_WATERMARK_S:
                n_late[etype] += 1
    got = {
        r["event_type"]: r
        for r in QUERY_REGISTRY["late_event_accounting"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(n_events)
    for etype in n_events:
        assert got[etype]["n_events"] == n_events[etype]
        assert got[etype]["n_late"] == n_late[etype]
