"""Pure-Python references for the round-4 analytics additions (Pareto
classes, per-day trending, seasonal anomalies, AQP sample, MAD
outliers) — independent implementations complementing the DuckDB
oracles."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict
from decimal import Decimal

import pytest

from olap_project_spark.queries import QUERY_REGISTRY, _import_all

_import_all()


def q(name):
    return QUERY_REGISTRY[name].fn


@pytest.fixture(scope="module")
def events(sf_dir):
    import duckdb

    return duckdb.sql(
        f"SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall()


def test_pareto_classes_match_python(spark, sf_dir):
    import duckdb

    rows = duckdb.sql(
        f"SELECT o_custkey, o_totalprice FROM '{sf_dir}/orders.parquet'"
    ).fetchall()
    rev = defaultdict(Decimal)
    for ck, price in rows:
        rev[ck] += Decimal(str(round(price, 2)))
    total = sum(rev.values())
    ranked = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    classes = Counter()
    class_rev = defaultdict(Decimal)
    cum = Decimal(0)
    for ck, r in ranked:
        cum += r
        cls = "A" if cum * 5 <= total * 4 else ("B" if cum * 20 <= total * 19 else "C")
        classes[cls] += 1
        class_rev[cls] += r
    got = {r["abc_class"]: r for r in q("pareto_customer_classes")(spark, sf_dir).collect()}
    assert set(got) == set(classes)
    for cls in classes:
        assert got[cls]["n_customers"] == classes[cls]
        assert got[cls]["class_revenue"] == pytest.approx(float(class_rev[cls]), abs=0.01)


def test_trending_matches_python(spark, sf_dir, events):
    counts = Counter()
    for _eid, _uid, etype, ts, _v in events:
        counts[(ts.date(), etype)] += 1
    want = {}
    by_day = defaultdict(list)
    for (day, etype), n in counts.items():
        by_day[day].append((etype, n))
    for day, items in by_day.items():
        items.sort(key=lambda kv: (-kv[1], kv[0]))
        for rnk, (etype, n) in enumerate(items[:3], 1):
            want[(day.isoformat(), rnk)] = (etype, n)
    got = {
        (r["day"], r["rnk"]): (r["event_type"], r["n_events"])
        for r in q("trending_types_daily")(spark, sf_dir).collect()
    }
    assert got == want


def test_seasonal_anomalies_match_python(spark, sf_dir, events):
    hourly = Counter()
    for _eid, _uid, etype, ts, _v in events:
        hourly[(etype, ts.replace(minute=0, second=0, microsecond=0))] += 1
    base = defaultdict(lambda: [0, 0])  # (etype, dow, hod) -> [sum, n]
    for (etype, h), c in hourly.items():
        # Spark dayofweek()-1: Sunday=0 .. Saturday=6
        dow = (h.weekday() + 1) % 7
        key = (etype, dow, h.hour)
        base[key][0] += c
        base[key][1] += 1
    n_slots = Counter()
    n_anom = Counter()
    for (etype, h), c in hourly.items():
        dow = (h.weekday() + 1) % 7
        s, n = base[(etype, dow, h.hour)]
        n_slots[etype] += 1
        if 2 * abs(c * n - s) > s * n:
            n_anom[etype] += 1
    got = {r["event_type"]: r for r in q("seasonal_hour_anomalies")(spark, sf_dir).collect()}
    assert set(got) == set(n_slots)
    for etype in n_slots:
        assert got[etype]["n_slots"] == n_slots[etype]
        assert got[etype]["n_anomalous"] == n_anom[etype]


def test_hash_sample_membership_and_counts(spark, sf_dir, events):
    """The sample is the md5(event_id) % 10 == 0 subset — reproducible
    in pure Python; counts must match exactly."""
    n_total = Counter()
    n_sampled = Counter()
    for eid, _uid, etype, _ts, _v in events:
        n_total[etype] += 1
        if int(hashlib.md5(str(eid).encode()).hexdigest()[:12], 16) % 10 == 0:
            n_sampled[etype] += 1
    got = {r["event_type"]: r for r in q("hash_sampled_value_stats")(spark, sf_dir).collect()}
    for etype in n_total:
        assert got[etype]["n_total"] == n_total[etype]
        assert got[etype]["n_sampled"] == n_sampled[etype]
        assert got[etype]["within_tol"] is True


def test_mad_outliers_match_python(spark, sf_dir, events):
    import statistics

    vals = defaultdict(list)
    for _eid, _uid, etype, _ts, v in events:
        vals[etype].append(v)
    got = {r["event_type"]: r for r in q("value_robust_stats")(spark, sf_dir).collect()}
    for etype, xs in vals.items():
        med = statistics.median(xs)  # interpolated for even n (quantile_cont semantics)
        mad = statistics.median(abs(x - med) for x in xs)
        n_out = sum(1 for x in xs if abs(x - med) > 3 * 1.4826 * mad)
        r = got[etype]
        assert r["median_value"] == pytest.approx(med, abs=1e-6)
        assert r["mad_value"] == pytest.approx(mad, abs=1e-6)
        assert r["n_robust_outliers"] == n_out


def test_session_funnel_matches_python(spark, sf_dir, events):
    from olap_project_spark.queries.events import FUNNEL_GAP_S

    by_user = defaultdict(list)
    for eid, uid, etype, ts, _v in events:
        by_user[uid].append((ts, eid, etype))
    sessions = []
    for uid, rows in by_user.items():
        rows.sort()
        cur = []
        prev = None
        for ts, eid, etype in rows:
            if prev is not None and (ts - prev).total_seconds() > FUNNEL_GAP_S:
                sessions.append(cur)
                cur = []
            cur.append((ts, etype))
            prev = ts
        sessions.append(cur)
    n_sessions = len(sessions)
    n_view = n_vc = n_full = 0
    for sess in sessions:
        v1 = min((t for t, e in sess if e == "view"), default=None)
        if v1 is None:
            continue
        n_view += 1
        c1 = min((t for t, e in sess if e == "click" and t > v1), default=None)
        if c1 is None:
            continue
        n_vc += 1
        if any(e == "purchase" and t > c1 for t, e in sess):
            n_full += 1
    r = q("session_funnel_stats")(spark, sf_dir).collect()[0]
    assert r["n_sessions"] == n_sessions
    assert r["n_with_view"] == n_view
    assert r["n_view_then_click"] == n_vc
    assert r["n_full_funnel"] == n_full
