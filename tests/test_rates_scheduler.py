"""Offline tests for the two control-plane seams the reference ran
against live services: the VCB exchange-rate fetch cascade (XML API →
HTML scrape → default; reference scripts/exchange_rate_service.py) and
the daily-export scheduling contract (cron 0 23 * * *, retries=2 /
5-min delay, catchup=False; reference
airflow/dags/bigquery_update_scheduler.py:288-322). The parsing and
policy logic is fully real; only the network transport is stubbed."""

from __future__ import annotations

from datetime import date, datetime, timedelta

import pytest

from olap_project_spark.export.scheduler import (
    CronSpec,
    ExportPolicy,
    due_runs,
    run_with_retries,
)
from olap_project_spark.schemas import DEFAULT_VND_PER_USD
from olap_project_spark.sources.rates import (
    cached,
    daily_rates_df,
    default_provider,
    make_api_provider,
    make_scrape_provider,
    parse_rate_html,
    parse_rate_xml,
    resolve_rate,
)

VCB_XML = b"""<?xml version="1.0" encoding="utf-8"?>
<ExrateList>
  <DateTime>8/13/2026 9:00:00 AM</DateTime>
  <Exrate CurrencyCode="EUR" CurrencyName="EURO" Buy="27,100.00"
          Transfer="27,200.00" Sell="28,000.00"/>
  <Exrate CurrencyCode="USD" CurrencyName="US DOLLAR" Buy="25,100.00"
          Transfer="25,260.50" Sell="25,500.00"/>
</ExrateList>"""

VCB_HTML_BY_ID = b"""<html><body>
<table id="ctl00_Content_ExrateView_GridView1">
  <tr><th>Code</th><th>Name</th><th>Buy</th><th>Transfer</th></tr>
  <tr><td>EUR</td><td>EURO</td><td>27,100.00</td><td>27,200.00</td></tr>
  <tr><td>USD</td><td>US DOLLAR</td><td>25,100.00</td><td>25,310.25</td></tr>
</table></body></html>"""

VCB_HTML_BY_CLASS = b"""<html><body>
<table class="table">
  <tr><td>USD</td><td>US DOLLAR</td><td>25,100.00</td><td>25,444.75</td></tr>
</table></body></html>"""


class TestRateParsing:
    def test_xml_usd_transfer(self):
        assert parse_rate_xml(VCB_XML) == 25260.50

    def test_xml_no_usd_declines(self):
        assert parse_rate_xml(b"<ExrateList/>") is None

    def test_xml_malformed_declines(self):
        assert parse_rate_xml(b"not xml at all <<<") is None

    def test_html_table_by_id(self):
        assert parse_rate_html(VCB_HTML_BY_ID) == 25310.25

    def test_html_table_by_class_fallback(self):
        assert parse_rate_html(VCB_HTML_BY_CLASS) == 25444.75

    def test_html_no_usd_declines(self):
        assert parse_rate_html(b"<html><table class='table'></table></html>") is None


class TestCascade:
    def test_api_wins_when_it_answers(self):
        cascade = (
            make_api_provider(lambda d: VCB_XML),
            make_scrape_provider(lambda d: VCB_HTML_BY_ID),
            default_provider,
        )
        assert resolve_rate(date(2026, 8, 13), cascade) == 25260.50

    def test_scrape_fallback_when_api_declines(self):
        cascade = (
            make_api_provider(lambda d: None),  # API down
            make_scrape_provider(lambda d: VCB_HTML_BY_ID),
            default_provider,
        )
        assert resolve_rate(date(2026, 8, 13), cascade) == 25310.25

    def test_default_when_everything_declines(self):
        cascade = (
            make_api_provider(lambda d: b"garbage"),
            make_scrape_provider(lambda d: b"<html/>"),
            default_provider,
        )
        assert resolve_rate(date(2026, 8, 13), cascade) == DEFAULT_VND_PER_USD

    def test_cache_by_day(self):
        calls = []

        def transport(d):
            calls.append(d)
            return VCB_XML

        provider = cached(make_api_provider(transport))
        d = date(2026, 8, 13)
        assert provider(d) == provider(d) == 25260.50
        assert len(calls) == 1  # second hit served from the per-day memo

    def test_daily_rates_dimension(self, spark):
        cascade = (
            make_api_provider(lambda d: VCB_XML if d.day % 2 == 0 else None),
            default_provider,
        )
        df = daily_rates_df(spark, date(2026, 8, 1), date(2026, 8, 4), cascade)
        got = {r.rate_date: r.rate_vnd_per_usd for r in df.collect()}
        assert got == {
            "2026-08-01": DEFAULT_VND_PER_USD,
            "2026-08-02": 25260.50,
            "2026-08-03": DEFAULT_VND_PER_USD,
            "2026-08-04": 25260.50,
        }


class TestCron:
    def test_reference_schedule_daily_2300(self):
        spec = CronSpec.parse("0 23 * * *")
        assert spec.next_fire(datetime(2026, 8, 13, 9, 30)) == datetime(
            2026, 8, 13, 23, 0
        )
        # after today's fire → tomorrow
        assert spec.next_fire(datetime(2026, 8, 13, 23, 0)) == datetime(
            2026, 8, 14, 23, 0
        )

    def test_field_forms(self):
        spec = CronSpec.parse("*/15 8-10 1,15 * 0")  # Sundays only
        t = spec.next_fire(datetime(2026, 2, 28, 0, 0))
        assert t == datetime(2026, 3, 1, 8, 0)  # Mar 1 2026 is a Sunday
        assert spec.next_fire(t) == datetime(2026, 3, 1, 8, 15)

    def test_invalid_rejected(self):
        with pytest.raises(ValueError):
            CronSpec.parse("61 23 * * *")
        with pytest.raises(ValueError):
            CronSpec.parse("0 23 * *")
        with pytest.raises(ValueError):
            CronSpec.parse("0 23 * * 8")  # 7 is Sunday's alias; 8 is not

    def test_dow_7_is_sunday_alias(self):
        # standard cron: 0 and 7 both mean Sunday, incl. inside ranges
        assert CronSpec.parse("0 23 * * 7").dow == frozenset({0})
        assert CronSpec.parse("0 23 * * 5-7").dow == frozenset({5, 6, 0})
        sun7 = CronSpec.parse("0 8 * * 7")
        assert sun7.next_fire(datetime(2026, 2, 28, 0, 0)) == datetime(
            2026, 3, 1, 8, 0
        )  # Mar 1 2026 is a Sunday


class TestDueRuns:
    def test_catchup_false_runs_only_latest_missed(self):
        policy = ExportPolicy()  # reference defaults
        fires = due_runs(
            policy,
            last_run=datetime(2026, 8, 10, 23, 0),
            now=datetime(2026, 8, 13, 23, 30),
        )
        assert fires == [datetime(2026, 8, 13, 23, 0)]  # 11th/12th skipped

    def test_catchup_true_runs_all_missed(self):
        policy = ExportPolicy(catchup=True)
        fires = due_runs(
            policy,
            last_run=datetime(2026, 8, 11, 23, 0),
            now=datetime(2026, 8, 13, 23, 30),
        )
        assert fires == [
            datetime(2026, 8, 12, 23, 0),
            datetime(2026, 8, 13, 23, 0),
        ]

    def test_no_prior_run_scans_lookback_window(self):
        from datetime import timedelta

        # fresh deployment: only the latest window inside `lookback`
        # fires, even under catchup=True (backfill is explicit)
        policy = ExportPolicy(catchup=True)
        fires = due_runs(
            policy, last_run=None, now=datetime(2026, 8, 13, 23, 30)
        )
        assert fires == [datetime(2026, 8, 13, 23, 0)]
        # an explicit backfill widens the lookback
        wide = ExportPolicy(catchup=True, lookback=timedelta(days=3))
        fires = due_runs(wide, last_run=None, now=datetime(2026, 8, 13, 23, 30))
        assert fires == [
            datetime(2026, 8, 11, 23, 0),
            datetime(2026, 8, 12, 23, 0),
            datetime(2026, 8, 13, 23, 0),
        ]

    def test_nothing_due(self):
        policy = ExportPolicy()
        assert (
            due_runs(
                policy,
                last_run=datetime(2026, 8, 13, 23, 0),
                now=datetime(2026, 8, 13, 23, 30),
            )
            == []
        )


class TestRetries:
    def test_succeeds_after_transient_failures(self):
        state = {"n": 0}
        slept: list[float] = []

        def flaky():
            state["n"] += 1
            if state["n"] < 3:
                raise RuntimeError(f"transient {state['n']}")
            return 42

        report = run_with_retries(
            flaky, ExportPolicy(), datetime(2026, 8, 13, 23, 0), sleep=slept.append
        )
        assert report.succeeded and report.result == 42
        assert report.attempts == 3  # 1 + retries=2, the reference's budget
        assert slept == [300.0, 300.0]  # retry_delay=5 min between attempts
        assert len(report.errors) == 2

    def test_exhausts_budget_and_reports(self):
        def always_fails():
            raise RuntimeError("boom")

        report = run_with_retries(
            always_fails, ExportPolicy(), datetime(2026, 8, 13, 23, 0), sleep=lambda s: None
        )
        assert not report.succeeded
        assert report.attempts == 3
        assert all("boom" in e for e in report.errors)
