"""Daily-rate enrichment: the broadcast-join alternative to ``clean``'s
single literal rate (SURVEY.md §2.5, M4).

The reference folds one startup rate into every row (P14 as a closure
literal). Spec-correct behavior joins each event to *its day's* rate:

    clean(raw)  →  join(rates, on event date, broadcast)  →  VND

The join key is the event-local calendar date string; unmatched days
(rate feed gap) fall back to the default rate rather than dropping
transactions (left join + coalesce).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olap_project_spark.schemas import DEFAULT_VND_PER_USD
from olap_project_spark.transforms.clean import clean, usd_to_vnd


def enrich_with_daily_rates(
    raw: DataFrame,
    rates: DataFrame,
    processed_at: str | None = None,
    validate_raw_date: bool = False,
) -> DataFrame:
    """clean() with per-day rates: recomputes Amount_VND/Exchange_Rate
    from the joined daily dimension instead of the literal.

    Scale: rates is rows-per-day tiny → always a broadcast hash join;
    the fact side keeps its partitioning (no shuffle). Works identically
    on batch and streaming inputs (stream-static join)."""
    cleaned = clean(
        raw, rate=DEFAULT_VND_PER_USD, processed_at=processed_at,
        validate_raw_date=validate_raw_date,
    ).withColumn("rate_date", F.date_format(F.col("Transaction_Date"), "yyyy-MM-dd"))

    rate = F.coalesce(F.col("rate_vnd_per_usd"), F.lit(DEFAULT_VND_PER_USD))
    return (
        cleaned.join(F.broadcast(rates), on="rate_date", how="left")
        .withColumn("Amount_VND", usd_to_vnd(F.col("Amount_USD"), rate))
        .withColumn("Exchange_Rate", rate.cast("int"))
        .drop("rate_vnd_per_usd", "rate_date")
    )
