"""Exchange-rate dimension provider — the spec-correct replacement for
the reference's frozen-at-startup scalar rate.

The reference fetches one rate when the consumer boots and bakes it
into a UDF closure (spark_streaming_consumer.py:62-64, :76-86), despite
the spec requiring a daily rate (requirements.md:10). Its fetch cascade
is VCB XML API → VCB web scrape → hard default 25 057
(exchange_rate_service.py:42-57).

Here the cascade is a pluggable provider chain (offline-friendly: the
network providers are stubs that decline in this environment), and the
result is a *dimension DataFrame* (rate_date, rate_vnd_per_usd) that
enrichment broadcast-joins — so each transaction gets its own day's
rate, and a backfill can replay history with historical rates.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from datetime import date, timedelta

from pyspark.sql import DataFrame, SparkSession

from olap_project_spark.schemas import DEFAULT_VND_PER_USD, EXCHANGE_RATE_SCHEMA

RateProvider = Callable[[date], float | None]


def api_provider(d: date) -> float | None:
    """VCB XML API analog. No network in this environment → declines.
    A real deployment implements the HTTP/XML fetch here (reference
    exchange_rate_service.py:59-93) — driver-side, never per-row."""
    return None


def scrape_provider(d: date) -> float | None:
    """HTML-scrape fallback analog (reference :95-137). Declines offline."""
    return None


def default_provider(d: date) -> float | None:
    """Terminal fallback: the reference's hard default (:18)."""
    return DEFAULT_VND_PER_USD


DEFAULT_CASCADE: tuple[RateProvider, ...] = (
    api_provider,
    scrape_provider,
    default_provider,
)


def resolve_rate(d: date, cascade: Iterable[RateProvider] = DEFAULT_CASCADE) -> float:
    """First provider that answers wins (the reference's try-chain)."""
    for provider in cascade:
        rate = provider(d)
        if rate is not None:
            return float(rate)
    return DEFAULT_VND_PER_USD


def daily_rates_df(
    spark: SparkSession,
    start: date,
    end: date,
    cascade: Iterable[RateProvider] = DEFAULT_CASCADE,
) -> DataFrame:
    """One row per day in [start, end] — the broadcastable dimension.
    Rates resolve on the driver (tiny domain: one row/day); the frame is
    a few KB even for decades, so the enrichment join is always a
    broadcast."""
    cascade = tuple(cascade)
    rows = []
    d = start
    while d <= end:
        rows.append((d.isoformat(), resolve_rate(d, cascade)))
        d += timedelta(days=1)
    return spark.createDataFrame(rows, EXCHANGE_RATE_SCHEMA)
