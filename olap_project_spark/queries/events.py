"""The reference's OLAP question surface (Q1-Q9, requirements.md:42-53)
over the driver's ``events`` stream table — each prose/DAX question as a
native Spark query with a DuckDB oracle (SURVEY.md §2.4).

``events`` stands in for the Kafka transaction fact: (event_id, ts,
user_id, event_type, value, props). Mapping: event_type ↔ transaction
category (with 'error' ↔ the error stream), value ↔ Amount, user_id ↔
User, ts ↔ transaction_date.

Engine-parity pitfalls handled here:
- DuckDB ``hour()/dayofweek()`` return BIGINT, Spark's return INT →
  explicit INTEGER casts in the SQL.
- DuckDB ``dayofweek`` is 0=Sunday..6=Saturday; Spark's is 1..7 →
  weekend sets (0,6) vs (1,7).
- ``ts`` is ns in parquet; Spark truncates to µs on load
  (sources.registry), DuckDB keeps ns → oracles CAST to µs TIMESTAMP
  before epoch math so sub-second gaps agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from olap_project_spark.functions.localframe import local_frame
from olap_project_spark.queries import load, register

DEC = "decimal(18,2)"


def _dec(col: str):
    return F.col(col).cast(DEC)


# --------------------------------------------------------------------------
# Q1 — busiest time of day
# --------------------------------------------------------------------------
@register(
    "events_by_hour",
    oracle="""
    SELECT CAST(hour(ts) AS INTEGER) AS hour_of_day,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def events_by_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 "busiest time of day" (requirements.md:42): activity histogram
    by hour.

    Scale: 24-group hash agg — map-side partials collapse each scan
    partition to ≤24 rows; the shuffle is negligible at any SF."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.hour("ts").cast("int").alias("hour_of_day"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(_dec("value")).cast("double"), 2).alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# Q1b — anomalous hour windows (count vs avg ± k·stddev)
# --------------------------------------------------------------------------
@register(
    "anomalous_hours",
    oracle="""
    WITH hourly AS (
      SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:00') AS hour_bucket,
             COUNT(*) AS n_events
      FROM events GROUP BY 1
    ), stats AS (
      SELECT AVG(CAST(n_events AS DOUBLE)) AS mu,
             stddev_samp(CAST(n_events AS DOUBLE)) AS sigma
      FROM hourly
    )
    SELECT hour_bucket, n_events
    FROM hourly, stats
    WHERE CAST(n_events AS DOUBLE) > mu + 2 * sigma
    """,
)
def anomalous_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1's anomaly half (requirements.md:42-43): hour buckets whose
    event count exceeds mean + 2σ of all hour buckets.

    Scale: hourly pre-aggregation shrinks the data to one row per
    wall-clock hour; the stats are a 1-row broadcast joined back — no
    second pass over the fact."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00").alias(
            "hour_bucket"
        )
    ).agg(F.count("*").alias("n_events"))
    stats = hourly.agg(
        F.avg(F.col("n_events").cast("double")).alias("mu"),
        F.stddev_samp(F.col("n_events").cast("double")).alias("sigma"),
    )
    return (
        hourly.join(F.broadcast(stats))
        .filter(F.col("n_events").cast("double") > F.col("mu") + 2 * F.col("sigma"))
        .select("hour_bucket", "n_events")
    )


# --------------------------------------------------------------------------
# Q2/Q3 — top dimension by value and by count
# --------------------------------------------------------------------------
@register(
    "event_type_summary",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_value,
           ROUND(CAST(MIN(value) AS DOUBLE), 2) AS min_value,
           ROUND(CAST(MAX(value) AS DOUBLE), 2) AS max_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def event_type_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2/Q3 "highest-value / top dimension" (requirements.md:44-45):
    per-category totals, averages, extremes, distinct users.

    Scale: COUNT(DISTINCT) expands to a two-phase partial-distinct
    aggregate in Spark (no naive global set); everything else is
    map-side combinable."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(_dec("value")).cast("double"), 2).alias("total_value"),
            F.round(F.sum(_dec("value")).cast("double") / F.count("*"), 6).alias("avg_value"),
            F.round(F.min("value").cast("double"), 2).alias("min_value"),
            F.round(F.max("value").cast("double"), 2).alias("max_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# --------------------------------------------------------------------------
# Q4 — anomalously high error rate per dimension
# --------------------------------------------------------------------------
@register(
    "user_error_rates",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS error_rate
    FROM events
    GROUP BY user_id
    """,
)
def user_error_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 "dimension with anomalously high fraud rate"
    (requirements.md:46): error share per user — the reference's DAX
    ratio-of-filtered-counts as one conditional aggregate."""
    ev = load(spark, sf_dir, "events")
    err = F.when(F.col("event_type") == "error", 1).otherwise(0)
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(err).cast("double") / F.count("*"), 6).alias("error_rate"),
    )


# --------------------------------------------------------------------------
# Q5 — consecutive events in a short window (bursts)
# --------------------------------------------------------------------------
@register(
    "user_bursts",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             epoch(CAST(ts AS TIMESTAMP)
                   - lag(CAST(ts AS TIMESTAMP))
                     OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id))
               AS gap_s
      FROM events
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN gap_s < 60 THEN 1 ELSE 0 END) AS BIGINT) AS n_bursts,
           COUNT(gap_s) AS n_gaps
    FROM seq
    WHERE gap_s IS NOT NULL
    GROUP BY user_id
    """,
)
def user_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 "users with many consecutive transactions in a short window"
    (requirements.md:47): per-user lag gaps, counting gaps under 60 s.

    Scale: window partitioned by user — per-key state, distributed; the
    sub-minute threshold compares µs-truncated epochs on both engines."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = (
        F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    )
    seq = ev.withColumn("gap_s", gap_s).filter(F.col("gap_s").isNotNull())
    return seq.groupBy("user_id").agg(
        F.sum(F.when(F.col("gap_s") < 60, 1).otherwise(0)).cast("bigint").alias("n_bursts"),
        F.count("gap_s").alias("n_gaps"),
    )


# --------------------------------------------------------------------------
# Q5b — sessionization (gap > 30 min starts a new session)
# --------------------------------------------------------------------------
@register(
    "user_sessions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id,
             CASE WHEN epoch(CAST(ts AS TIMESTAMP)
                        - lag(CAST(ts AS TIMESTAMP))
                          OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id)) >= 1800
                       OR lag(CAST(ts AS TIMESTAMP))
                          OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id,
           CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events,
           ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(new_session), 6) AS events_per_session
    FROM seq
    GROUP BY user_id
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 sessionized (SURVEY.md §7 "hard parts"): a session breaks after
    a ≥30-minute silence. Batch formulation = lag + boundary flag + sum;
    the streaming layer exposes the same semantic as
    ``F.session_window`` (streaming.windows).

    Scale: one per-user window pass; no cross-partition state."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(F.col("ts").cast("double")).over(w)
    new_session = F.when(
        prev.isNull() | ((F.col("ts").cast("double") - prev) >= 1800), 1
    ).otherwise(0)
    seq = ev.withColumn("new_session", new_session)
    return seq.groupBy("user_id").agg(
        F.sum("new_session").cast("bigint").alias("n_sessions"),
        F.count("*").alias("n_events"),
        F.round(F.count("*").cast("double") / F.sum("new_session"), 6).alias(
            "events_per_session"
        ),
    )


# --------------------------------------------------------------------------
# Q6 — when/where do large transactions occur
# --------------------------------------------------------------------------
@register(
    "large_events_profile",
    oracle="""
    SELECT CAST(hour(ts) AS INTEGER) AS hour_of_day,
           event_type,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
    FROM events
    WHERE value > 400
    GROUP BY 1, 2
    """,
)
def large_events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 "when/where do large transactions occur" (requirements.md:48,
    filter F5): high-value events profiled by hour × type.

    Scale: the value>400 predicate is pushed into the parquet scan
    (rowgroup min/max skip) before any shuffle."""
    ev = load(spark, sf_dir, "events").filter(F.col("value") > 400)
    return (
        ev.groupBy(
            F.hour("ts").cast("int").alias("hour_of_day"), F.col("event_type")
        ).agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(_dec("value")).cast("double"), 2).alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# Q7 — error trend by day
# --------------------------------------------------------------------------
@register(
    "daily_error_trend",
    oracle="""
    SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS event_date,
           COUNT(*) AS n_errors,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS error_value
    FROM events
    WHERE event_type = 'error'
    GROUP BY 1
    """,
)
def daily_error_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 "fraud trend over time" (requirements.md:49) on the error
    subset: daily counts and value."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    return ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("event_date")).agg(
        F.count("*").alias("n_errors"),
        F.round(F.sum(_dec("value")).cast("double"), 2).alias("error_value"),
    )


# --------------------------------------------------------------------------
# Q8 — weekday vs weekend
# --------------------------------------------------------------------------
@register(
    "weekend_vs_weekday",
    oracle="""
    SELECT CASE WHEN dayofweek(CAST(ts AS TIMESTAMP)) IN (0, 6) THEN 'Yes' ELSE 'No' END
             AS is_weekend,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_value
    FROM events
    GROUP BY 1
    """,
)
def weekend_vs_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 weekday/weekend split (requirements.md:50) — the Is_Weekend
    derivation (clean() P12) applied to the stream fact. Note the
    cross-engine dayofweek convention difference handled in the oracle
    (DuckDB 0=Sunday vs Spark 1=Sunday)."""
    ev = load(spark, sf_dir, "events")
    is_weekend = F.when(F.dayofweek("ts").isin(1, 7), "Yes").otherwise("No")
    return ev.groupBy(is_weekend.alias("is_weekend")).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(_dec("value")).cast("double"), 2).alias("total_value"),
        F.round(F.sum(_dec("value")).cast("double") / F.count("*"), 6).alias("avg_value"),
    )


# --------------------------------------------------------------------------
# Q9 — users above the population average (conditional counts)
# --------------------------------------------------------------------------
@register(
    "above_avg_error_users",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_errors
      FROM events GROUP BY user_id
    )
    SELECT user_id, n_errors
    FROM per_user
    WHERE CAST(n_errors AS DOUBLE) >
          (SELECT AVG(CAST(n_errors AS DOUBLE)) FROM per_user)
    """,
)
def above_avg_error_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 "users with above-average error counts" (requirements.md:51):
    per-user conditional count vs a global scalar (broadcast, not a
    self-join)."""
    ev = load(spark, sf_dir, "events")
    err = F.when(F.col("event_type") == "error", 1).otherwise(0)
    per_user = ev.groupBy("user_id").agg(F.sum(err).cast("bigint").alias("n_errors"))
    stats = per_user.agg(F.avg(F.col("n_errors").cast("double")).alias("mu"))
    return (
        per_user.join(F.broadcast(stats))
        .filter(F.col("n_errors").cast("double") > F.col("mu"))
        .select("user_id", "n_errors")
    )


# --------------------------------------------------------------------------
# Q10 — daily operations summary (the narrative-synthesis row)
# --------------------------------------------------------------------------
@register(
    "daily_operations_summary",
    oracle="""
    WITH hourly AS (
      SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS event_date,
             CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS hour,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,2))) AS val_dec,
             SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_err,
             SUM(CASE WHEN value > 400 THEN 1 ELSE 0 END) AS n_large
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY event_date
                                   ORDER BY n DESC, hour) AS rk
      FROM hourly
    )
    SELECT event_date,
           CAST(SUM(n) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(val_dec) AS DOUBLE), 2) AS total_value,
           CAST(MAX(CASE WHEN rk = 1 THEN hour END) AS INTEGER)
             AS busiest_hour,
           CAST(MAX(CASE WHEN rk = 1 THEN n END) AS BIGINT)
             AS busiest_hour_events,
           CAST(SUM(n_err) AS BIGINT) AS n_errors,
           ROUND(CAST(SUM(n_err) AS DOUBLE) / SUM(n), 6) AS error_rate,
           CAST(SUM(n_large) AS BIGINT) AS n_large_events,
           CASE WHEN dayofweek(CAST(event_date AS DATE)) IN (0, 6)
                THEN 'Yes' ELSE 'No' END AS is_weekend
    FROM ranked
    GROUP BY event_date
    """,
)
def daily_operations_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 — the reference's "daily operations summary" narrative
    (requirements.md:52-53), materialized as a real query: ONE row per
    day stitching the Q1/Q4/Q6/Q8 signals — busiest hour (and its
    event count), total volume/value, error count and rate, large-
    transaction count, and the weekend flag. What a dashboard's
    morning-report tile reads directly instead of re-running four
    queries.

    Scale: a single scan feeds one (day, hour) hash aggregate
    (map-side combined, ≤ 24 rows per day); the busiest-hour argmax is
    a row_number window PARTITIONED BY DAY over that rollup (≤ 24 rows
    per partition), then one more per-day aggregate. No global sort,
    no second scan — the four Q-signals are conditional aggregates of
    the same rollup."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        F.hour("ts").cast("int").alias("hour"),
    ).agg(
        F.count("*").alias("n"),
        F.sum(_dec("value")).alias("val_dec"),
        F.sum((F.col("event_type") == "error").cast("bigint")).alias("n_err"),
        F.sum((F.col("value") > 400).cast("bigint")).alias("n_large"),
    )
    w = Window.partitionBy("event_date").orderBy(F.desc("n"), F.asc("hour"))
    ranked = hourly.withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy("event_date")
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.round(F.sum("val_dec").cast("double"), 2).alias("total_value"),
            F.max(F.when(F.col("rk") == 1, F.col("hour")))
            .cast("int")
            .alias("busiest_hour"),
            F.max(F.when(F.col("rk") == 1, F.col("n")))
            .cast("bigint")
            .alias("busiest_hour_events"),
            F.sum("n_err").cast("bigint").alias("n_errors"),
            F.round(
                F.sum("n_err").cast("double") / F.sum("n"), 6
            ).alias("error_rate"),
            F.sum("n_large").cast("bigint").alias("n_large_events"),
        )
        .withColumn(
            "is_weekend",
            F.when(
                F.dayofweek(F.to_date("event_date")).isin(1, 7), "Yes"
            ).otherwise("No"),
        )
    )


# --------------------------------------------------------------------------
# Latest-record dedup (argmax row per key)
# --------------------------------------------------------------------------
@register(
    "latest_event_per_user",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_id, event_type,
             CAST(ts AS TIMESTAMP) AS ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC)
               AS rn
      FROM events
    )
    SELECT user_id, event_id AS latest_event_id, event_type AS latest_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS latest_ts
    FROM ranked WHERE rn = 1
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest record per key — THE workhorse dedup/compaction shape
    (current-state view over an append-only log): row_number over
    (ts desc, id desc) and keep rank 1.

    Scale: one shuffle on the key; WindowGroupLimit prunes each
    partition to its top row before materializing."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.col("event_type").alias("latest_type"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("latest_ts"),
        )
    )


# --------------------------------------------------------------------------
# Funnel conversion (ordered event-sequence matching)
# --------------------------------------------------------------------------
@register(
    "signup_purchase_funnel",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup'
                      THEN CAST(ts AS TIMESTAMP) END) AS first_signup,
             min(CASE WHEN event_type = 'purchase'
                      THEN CAST(ts AS TIMESTAMP) END) AS first_purchase
      FROM events GROUP BY user_id
    )
    SELECT CASE WHEN first_signup IS NULL THEN 'no_signup'
                WHEN first_purchase IS NULL OR first_purchase < first_signup
                     THEN 'signup_only'
                ELSE 'converted' END AS funnel_stage,
           COUNT(*) AS n_users
    FROM firsts
    GROUP BY 1
    """,
)
def signup_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel: users who purchased AFTER their first
    signup vs signup-only vs never-signed-up — the event-sequence
    pattern (MATCH_RECOGNIZE-lite) as conditional min-timestamps, no
    self-join.

    Scale: one aggregate pass; the sequence condition is a comparison
    of two per-user scalars, not an events×events join."""
    ev = load(spark, sf_dir, "events")
    first_of = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))
    firsts = ev.groupBy("user_id").agg(
        first_of("signup").alias("first_signup"),
        first_of("purchase").alias("first_purchase"),
    )
    stage = (
        F.when(F.col("first_signup").isNull(), "no_signup")
        .when(
            F.col("first_purchase").isNull()
            | (F.col("first_purchase") < F.col("first_signup")),
            "signup_only",
        )
        .otherwise("converted")
    )
    return firsts.groupBy(stage.alias("funnel_stage")).agg(
        F.count("*").alias("n_users")
    )


# --------------------------------------------------------------------------
# Cohort retention (week-over-week return rate)
# --------------------------------------------------------------------------
@register(
    "weekly_retention",
    oracle="""
    WITH user_weeks AS (
      SELECT DISTINCT user_id,
             CAST(floor(datediff('day', TIMESTAMP '2024-01-01 00:00:00',
                                 CAST(ts AS TIMESTAMP)) / 7) AS INTEGER) AS week
      FROM events
    )
    SELECT a.week AS cohort_week,
           COUNT(DISTINCT a.user_id) AS n_active,
           COUNT(DISTINCT b.user_id) AS n_retained,
           ROUND(CAST(COUNT(DISTINCT b.user_id) AS DOUBLE)
                 / COUNT(DISTINCT a.user_id), 6) AS retention
    FROM user_weeks a
    LEFT JOIN user_weeks b
      ON b.user_id = a.user_id AND b.week = a.week + 1
    GROUP BY a.week
    """,
)
def weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week retention: of the users active in week N, how
    many return in week N+1 — the cohort self-join on (user, week+1).

    Scale: the fact collapses to DISTINCT (user, week) first — the
    self-join runs on the small activity matrix, never on raw events."""
    ev = load(spark, sf_dir, "events")
    week = F.floor(
        F.datediff(F.to_date("ts"), F.to_date(F.lit("2024-01-01"))) / 7
    ).cast("int")
    uw = ev.select("user_id", week.alias("week")).distinct()
    a = uw.alias("a")
    b = uw.alias("b")
    return (
        a.join(
            b,
            (F.col("b.user_id") == F.col("a.user_id"))
            & (F.col("b.week") == F.col("a.week") + 1),
            "left",
        )
        .groupBy(F.col("a.week").alias("cohort_week"))
        .agg(
            F.countDistinct(F.col("a.user_id")).alias("n_active"),
            F.countDistinct(F.col("b.user_id")).alias("n_retained"),
            F.round(
                F.countDistinct(F.col("b.user_id")).cast("double")
                / F.countDistinct(F.col("a.user_id")),
                6,
            ).alias("retention"),
        )
    )


# --------------------------------------------------------------------------
# Custom UDAF extension point (Arrow grouped-agg pandas UDF)
# --------------------------------------------------------------------------
@register(
    "geometric_mean_value",
    oracle="""
    SELECT event_type,
           ROUND(exp(avg(ln(value))), 6) AS geo_mean_value,
           COUNT(*) AS n_events
    FROM events
    WHERE value > 0
    GROUP BY event_type
    """,
)
def geometric_mean_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric mean of event value per type via a CUSTOM AGGREGATE —
    the engine's UDAF extension point (SURVEY.md §2.10: the reference
    had no UDAF surface at all). Implemented as an Arrow grouped-agg
    pandas UDF: one vectorized numpy reduction per group, never
    row-at-a-time Python.

    Scale: grouped-agg pandas UDFs receive whole groups — fine for
    bounded groups like these 5; for unbounded groups decompose into
    algebraic parts (here: built-in avg(ln) would do) and keep the UDAF
    for genuinely non-decomposable statistics."""
    from olap_project_spark.functions.udafs import geo_mean, group_size

    ev = load(spark, sf_dir, "events").filter(F.col("value") > 0)
    return ev.groupBy("event_type").agg(
        F.round(geo_mean("value"), 6).alias("geo_mean_value"),
        group_size("value").alias("n_events"),
    )


# --------------------------------------------------------------------------
# Pivot (wide OLAP cross-tab — the dashboard matrix shape)
# --------------------------------------------------------------------------
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "hourly_type_pivot",
    oracle=f"""
    SELECT CAST(hour(ts) AS INTEGER) AS hour_of_day,
           {", ".join(f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}" for t in EVENT_TYPES)}
    FROM events
    GROUP BY 1
    """,
)
def hourly_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour × event-type cross-tab via the pivot operator — the
    dashboard-matrix shape Power BI produced for the reference.

    Scale: pivot with an EXPLICIT value list compiles to one pass of
    conditional aggregates (map-side combinable); without the list,
    Spark runs an extra distinct-values job first — always pin the
    columns in production."""
    ev = load(spark, sf_dir, "events")
    out = (
        ev.groupBy(F.hour("ts").cast("int").alias("hour_of_day"))
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))  # count(*) is rejected inside pivot
        .na.fill(0)
    )
    return out.select(
        "hour_of_day", *[F.col(t).cast("bigint").alias(t) for t in EVENT_TYPES]
    )


# --------------------------------------------------------------------------
# Histogram (fixed-width bucket distribution)
# --------------------------------------------------------------------------
@register(
    "value_histogram",
    oracle="""
    SELECT CAST(floor(value / 50) AS INTEGER) AS bucket,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS bucket_value
    FROM events
    GROUP BY 1
    """,
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (50-unit buckets) — the distribution
    profile behind dashboard histograms; bucketing is a pure projection
    so the aggregate stays map-side combinable."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.floor(F.col("value") / 50).cast("int").alias("bucket")
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(_dec("value")).cast("double"), 2).alias("bucket_value"),
    )


# --------------------------------------------------------------------------
# Exact percentiles (interpolated) per group
# --------------------------------------------------------------------------
@register(
    "value_percentiles",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6)  AS p50,
           ROUND(quantile_cont(value, 0.9), 6)  AS p90,
           ROUND(quantile_cont(value, 0.99), 6) AS p99
    FROM events
    GROUP BY event_type
    """,
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (p50/p90/p99) of event value per
    type — Spark ``percentile`` == DuckDB ``quantile_cont`` (both linear
    interpolation over the sorted set).

    Scale: exact percentiles sort per group; for 100 TB switch to
    ``approx_percentile`` (t-digest, mergeable sketches) — kept exact
    here because the oracle must agree bit-for-bit."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
    )


# --------------------------------------------------------------------------
# §2.1 S3 — JSON payload decode (the Kafka-value parse, batch form)
# --------------------------------------------------------------------------
@register(
    "props_json_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS total_k,
           ROUND(CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
                 / COUNT(*), 6) AS avg_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-payload field extraction + aggregate — the reference's
    Kafka-value decode (S3, ``from_json``/``get_json_object``) exercised
    on the stream fact's ``props`` column.

    Scale: get_json_object is a codegen'd SIMD-JSON-style path walk —
    no UDF, no full JSON materialization; for multi-field extraction
    switch to ``from_json`` with an explicit schema (one parse, N
    fields)."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("k").cast("bigint").alias("total_k"),
        F.round(F.sum("k").cast("double") / F.count("*"), 6).alias("avg_k"),
        F.max("k").cast("bigint").alias("max_k"),
    )


# --------------------------------------------------------------------------
# §2.5 — stream fact × dimension join
# --------------------------------------------------------------------------
@register(
    "segment_event_value",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def segment_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event value by customer segment — the broadcast dimension
    enrichment the reference does as a frozen closure literal (P14) done
    properly as a join (SURVEY.md §2.5).

    Scale: customer is broadcast; the stream fact never shuffles."""
    ev = load(spark, sf_dir, "events")
    cu = load(spark, sf_dir, "customer")
    return (
        ev.join(cu, ev.user_id == cu.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(_dec("value")).cast("double"), 2).alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# §2.4 long tail — sketch-based approximate aggregates (HLL / KLL-style)
# --------------------------------------------------------------------------
@register(
    "approx_distinct_summary",
    # Sketch estimates are engine-specific (Spark HLL++ vs DuckDB HLL
    # differ by construction), so raw estimates can't hash-match. The
    # contract is instead SELF-VALIDATING: the query computes the exact
    # answers AND in-tolerance booleans for each sketch; the oracle
    # asserts the exact values and literal TRUE for every bound — the
    # gate's hash check thereby pins sketch QUALITY, not sketch bits.
    # (HLL++ is deterministic given its input, so the bounds are stable
    # across runs; error at rsd=0.01 measured ≤0.7%, discrete-vs-interpolated
    # percentile drift ≤4.0%, across sf0.001/0.01/0.1. Each bound is
    # max(absolute slack, rel·|exact|) — the slack floor keeps small
    # groups from flipping on integer-quantized estimates.)
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS hll_within_2pct,
           TRUE AS p50_within_5pct,
           TRUE AS p95_within_5pct
    FROM events
    GROUP BY event_type
    """,
)
def approx_distinct_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates per event type: HLL++ distinct-user
    estimate checked against the exact count, plus approx_percentile
    (the one-pass quantile sketch) checked against the exact
    interpolated percentile — each reported as an in-tolerance boolean
    so the cross-engine gate verifies the sketches without comparing
    engine-specific sketch bits.

    Scale: THIS is how distinct-count works at 100 TB — the HLL sketch
    is a few KB per group, merges associatively map-side, and never
    shuffles the key universe; exact COUNT(DISTINCT) shuffles every
    distinct (group, user) pair. The exact columns here exist only to
    exhibit the error bound at test scale (drop them in production).

    Reference parity: no sketch surface exists in the reference — this
    is part of the §2.4 long tail a warehouse user expects."""
    ev = load(spark, sf_dir, "events")
    pcts = F.expr("approx_percentile(value, array(0.5, 0.95), 10000)")
    exact_pcts = F.expr("percentile(value, array(0.5, 0.95))")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
        pcts[0].alias("ap50"),
        pcts[1].alias("ap95"),
        exact_pcts[0].alias("ep50"),
        exact_pcts[1].alias("ep95"),
    )

    def within(approx: Column, exact: Column, tol: float, slack: float) -> Column:
        # relative tolerance with an absolute-slack floor: small groups
        # otherwise flip the boolean on integer-quantized estimates (an
        # HLL estimate off by 2 on exact=50 is 4% "relative error")
        return (
            F.abs(approx - exact) <= F.greatest(F.lit(slack), tol * F.abs(exact))
        ).alias("w")

    return agg.select(
        "event_type",
        "exact_users",
        within(
            F.col("approx_users").cast("double"),
            F.col("exact_users").cast("double"),
            0.02,
            2.0,
        ).alias("hll_within_2pct"),
        within(F.col("ap50"), F.col("ep50"), 0.05, 0.5).alias("p50_within_5pct"),
        within(F.col("ap95"), F.col("ep95"), 0.05, 0.5).alias("p95_within_5pct"),
    )


# --------------------------------------------------------------------------
# Skew path — salted two-phase aggregation through the gate
# --------------------------------------------------------------------------
@register(
    "salted_type_stats",
    oracle="""
    SELECT event_type,
           CAST(COUNT(event_id) AS BIGINT) AS count_event_id,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def salted_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event stats per type routed through the SALTED two-phase
    aggregation (functions.scale.salted_agg) — the skew-mitigation path
    proven equal to the plain groupBy by the oracle: a hot key's rows
    split across n_salts partial groups before the final merge.

    Money sums stay exact under salting because the partial sums are
    DECIMAL — double partials would make the result depend on the salt
    assignment. At 100 TB with a key carrying half the table, this (or
    AQE skew handling) is the difference between one straggler task and
    even utilization."""
    from olap_project_spark.functions.scale import salted_agg

    ev = load(spark, sf_dir, "events").select(
        "event_type", "event_id", F.col("value").cast(DEC).alias("value_dec"), "value"
    )
    out = salted_agg(
        ev,
        ["event_type"],
        {"event_id": "count", "value_dec": "sum", "value": "max"},
        n_salts=8,
    )
    return out.select(
        "event_type",
        F.col("count_event_id").cast("bigint").alias("count_event_id"),
        F.round(F.col("sum_value_dec").cast("double"), 2).alias("total_value"),
        F.col("max_value"),
    )


# --------------------------------------------------------------------------
# Markov transition matrix (event-type bigrams per user)
# --------------------------------------------------------------------------
@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      FROM events
    )
    SELECT from_type, to_type,
           COUNT(*) AS n_transitions,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / SUM(COUNT(*)) OVER (PARTITION BY from_type), 6)
             AS p_transition
    FROM seq
    WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current event type) — the path
    model behind funnel and next-action analytics. ``event_id``
    tiebreaks equal timestamps so the sequence (and thus the matrix)
    is deterministic cross-engine.

    Scale: one shuffle on user_id for the lead() window (sequences
    stay local to their user partition), then a |types|² aggregate —
    tiny — with the row-normalization a window over that tiny matrix,
    not over events."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = seq.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_transitions")
    )
    row_total = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(row_total),
            6,
        ).alias("p_transition"),
    )


# --------------------------------------------------------------------------
# Association rules (market-basket co-occurrence over user baskets)
# --------------------------------------------------------------------------
@register(
    "event_type_associations",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM events),
    s AS (SELECT event_type, COUNT(*) AS n_type FROM ut GROUP BY 1),
    p AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_both
      FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b, n_both,
           ROUND(CAST(n_both AS DOUBLE) / n.n_users, 6) AS support,
           ROUND(CAST(n_both AS DOUBLE) / sa.n_type, 6) AS confidence,
           ROUND(CAST(n_both AS DOUBLE) * n.n_users / (sa.n_type * sb.n_type), 6)
             AS lift
    FROM p
    JOIN s sa ON sa.event_type = p.type_a
    JOIN s sb ON sb.event_type = p.type_b
    CROSS JOIN n
    """,
)
def event_type_associations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over user "baskets" of event types:
    support, confidence(A→B), and lift for every co-occurring type
    pair — the market-basket analysis classic, with users as baskets.
    All ratios divide integers, so the doubles are cross-engine exact.

    Scale: baskets come from a two-phase distinct (map-side partial),
    pairs from a self-join WITHIN user (cost Σ|basket|², bounded by the
    type-cardinality squared per user — tiny — never |users|²); the
    margins and the user count are broadcast dimension-sized sides."""
    ev = load(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct().persist()
    n = ev.agg(F.countDistinct("user_id").alias("n_users"))
    s = ut.groupBy("event_type").agg(F.count("*").alias("n_type"))
    a, b = ut.alias("a"), ut.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_both"))
    )
    sa = s.select(F.col("event_type").alias("type_a"), F.col("n_type").alias("na"))
    sb = s.select(F.col("event_type").alias("type_b"), F.col("n_type").alias("nb"))
    both = F.col("n_both").cast("double")
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(n))
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.round(both / F.col("n_users"), 6).alias("support"),
            F.round(both / F.col("na"), 6).alias("confidence"),
            F.round(both * F.col("n_users") / (F.col("na") * F.col("nb")), 6).alias(
                "lift"
            ),
        )
    )


# --------------------------------------------------------------------------
# Outlier detection from exact moments (z-score per group)
# --------------------------------------------------------------------------
@register(
    "value_outliers",
    oracle="""
    WITH m AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,2)))  AS sum_dec,
             SUM(CAST(value AS DECIMAL(18,2))
                 * CAST(value AS DECIMAL(18,2))) AS sumsq_dec
      FROM events
      GROUP BY event_type
    ),
    stats AS (
      SELECT event_type, n,
             CAST(sum_dec AS DOUBLE) / n AS mean,
             sqrt(CAST(sumsq_dec AS DOUBLE) / n
                  - (CAST(sum_dec AS DOUBLE) / n)
                    * (CAST(sum_dec AS DOUBLE) / n)) AS std
      FROM m
    )
    SELECT e.event_type,
           CAST(s.n AS BIGINT) AS n_events,
           ROUND(s.mean, 6) AS mean_value,
           ROUND(s.std, 6) AS std_value,
           CAST(SUM(CASE WHEN abs(e.value - s.mean) > 3 * s.std
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN stats s ON s.event_type = e.event_type
    GROUP BY e.event_type, s.n, s.mean, s.std
    """,
)
def value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier detection per event type (|x − μ| > 3σ) with μ
    and σ derived from EXACT decimal moments (Σx, Σx² — the input
    doubles carry ≤2 fractional digits, so their squares are exact in
    DECIMAL at scale 4): the aggregates are order-independent, the
    double math after them is scalar — so even a variance-based
    detector is bit-reproducible cross-engine. Plain stddev() of
    doubles would not be.

    Scale: two passes — a map-side-combinable moment aggregate
    (|types| rows), then a broadcast join of the tiny stats back onto
    the fact for the threshold count. This two-pass moments+filter
    shape is THE standard big-data outlier scan; the one-pass
    alternative (collect per-group arrays) does not scale."""
    ev = load(spark, sf_dir, "events")
    vdec = F.col("value").cast("decimal(18,2)")
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(vdec).alias("sum_dec"),
        F.sum(vdec * vdec).alias("sumsq_dec"),
    )
    mean = F.col("sum_dec").cast("double") / F.col("n")
    std = F.sqrt(
        F.col("sumsq_dec").cast("double") / F.col("n") - mean * mean
    )
    stats = m.select("event_type", "n", mean.alias("mean"), std.alias("std"))
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type", "n", "mean", "std")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("mean")) > 3 * F.col("std"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers")
        )
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_events"),
            F.round("mean", 6).alias("mean_value"),
            F.round("std", 6).alias("std_value"),
            "n_outliers",
        )
    )


# --------------------------------------------------------------------------
# Robust statistics (median / MAD outliers)
# --------------------------------------------------------------------------
@register(
    "value_robust_stats",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS median_value
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, m.median_value,
             abs(e.value - m.median_value) AS adev, e.value
      FROM events e JOIN med m ON m.event_type = e.event_type
    ),
    mad AS (
      SELECT event_type,
             quantile_cont(adev, 0.5) AS mad_value
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           ROUND(d.median_value, 6) AS median_value,
           ROUND(a.mad_value, 6) AS mad_value,
           CAST(SUM(CASE WHEN abs(d.value - d.median_value)
                              > 3 * 1.4826 * a.mad_value
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_robust_outliers
    FROM dev d JOIN mad a ON a.event_type = d.event_type
    GROUP BY d.event_type, d.median_value, a.mad_value
    """,
)
def value_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust statistics per event type: median, MAD (median absolute
    deviation), and the robust outlier count (|x − med| > 3·1.4826·MAD
    — the consistency-scaled MAD rule) — the heavy-tail-safe companion
    to the moment-based ``value_outliers``. Exact interpolated medians
    are deterministic (no summation), so even the two-level composition
    hash-matches cross-engine.

    Scale: two grouped exact percentiles (each sorts within its
    type partition) + a broadcast of the |types|-row stats back onto
    the fact. At 100 TB swap exact quantiles for approx_percentile
    sketches — same shape, mergeable state."""
    ev = load(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("median_value")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "median_value",
        "value",
        F.abs(F.col("value") - F.col("median_value")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad_value")
    )
    robust = F.abs(F.col("value") - F.col("median_value")) > 3 * 1.4826 * F.col(
        "mad_value"
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "median_value", "mad_value")
        .agg(
            F.sum(F.when(robust, 1).otherwise(0))
            .cast("bigint")
            .alias("n_robust_outliers")
        )
        .select(
            "event_type",
            F.round("median_value", 6).alias("median_value"),
            F.round("mad_value", 6).alias("mad_value"),
            "n_robust_outliers",
        )
    )


# --------------------------------------------------------------------------
# Calendar densification (time spine, zero-fill + LOCF gap filling)
# --------------------------------------------------------------------------
@register(
    "hourly_spine_filled",
    oracle="""
    WITH b AS (
      SELECT date_trunc('hour', MIN(ts)) AS h0,
             date_trunc('hour', MAX(ts)) AS h1
      FROM events
    ),
    spine AS (
      SELECT UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_ts FROM b
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    actual AS (
      SELECT date_trunc('hour', ts) AS hour_ts, event_type,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,2))) AS sum_dec
      FROM events GROUP BY 1, 2
    )
    SELECT strftime(s.hour_ts, '%Y-%m-%d %H:00') AS hour_bucket,
           t.event_type,
           COALESCE(a.n, 0) AS n_events,
           CAST(CASE WHEN a.n IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_gap,
           ROUND(last_value(CAST(a.sum_dec AS DOUBLE) / a.n IGNORE NULLS) OVER (
                   PARTITION BY t.event_type ORDER BY s.hour_ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS filled_avg_value
    FROM spine s
    CROSS JOIN types t
    LEFT JOIN actual a ON a.hour_ts = s.hour_ts AND a.event_type = t.event_type
    """,
)
def hourly_spine_filled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification: a generated hourly spine × the type
    dimension, LEFT-joined to the actual hourly aggregate so silent
    hours appear as explicit zero rows, with the hourly average
    carried forward over gaps (LOCF via ``last(..., ignorenulls)``)
    — the sparse→dense regularization every time-series consumer
    (forecasting, dashboards, anomaly baselines) needs, and an
    operator the reference simply cannot express in its sink-side
    reporting.

    Scale: the spine is |hours|×|types| — generated, never scanned;
    the fact contributes one pre-aggregated row per non-empty cell.
    The LOCF window partitions by type, so fill state scales out by
    key. Exact-decimal hourly sums keep the filled averages
    hash-identical cross-engine."""
    ev = load(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    b = ev.agg(
        F.min(hour).alias("h0"),
        F.max(hour).alias("h1"),
    )
    spine = b.select(
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_ts")
    )
    types = ev.select("event_type").distinct()
    actual = ev.groupBy(
        hour.alias("hour_ts"), F.col("event_type")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_dec"),
    )
    joined = (
        spine.crossJoin(F.broadcast(types))
        .join(actual, ["hour_ts", "event_type"], "left")
    )
    avg_val = F.col("sum_dec").cast("double") / F.col("n")
    locf = F.last(avg_val, ignorenulls=True).over(
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.date_format("hour_ts", "yyyy-MM-dd HH:00").alias("hour_bucket"),
        "event_type",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        F.when(F.col("n").isNull(), 1).otherwise(0).cast("int").alias("is_gap"),
        F.round(locf, 6).alias("filled_avg_value"),
    )


# --------------------------------------------------------------------------
# Last-touch attribution (argmax join within a time window)
# --------------------------------------------------------------------------
@register(
    "last_touch_attribution",
    oracle="""
    WITH clicks AS (
      SELECT user_id, event_id AS click_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
    ),
    purch AS (
      SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
             CAST(value AS DECIMAL(18,2)) AS value_dec
      FROM events WHERE event_type = 'purchase'
    ),
    cand AS (
      SELECT p.purchase_id, p.user_id, p.value_dec,
             c.click_id, c.click_ts, p.purchase_ts
      FROM purch p
      JOIN clicks c ON c.user_id = p.user_id
        AND c.click_ts <  p.purchase_ts
        AND c.click_ts >= p.purchase_ts - INTERVAL 1 HOUR
    )
    SELECT purchase_id, user_id, click_id,
           CAST(epoch_us(purchase_ts) - epoch_us(click_ts) AS BIGINT)
             AS micros_since_click,
           CAST(value_dec AS DOUBLE) AS purchase_value
    FROM (SELECT *, row_number() OVER (
            PARTITION BY purchase_id
            ORDER BY click_ts DESC, click_id DESC) AS rn
          FROM cand)
    WHERE rn = 1
    """,
)
def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-touch attribution: each purchase credits the user's most
    recent click in the preceding hour (row_number argmax over the
    candidate window, click_id tiebreak) — the batch attribution model
    complementing ``streaming_click_attribution``, which enumerates ALL
    click→purchase pairs; attribution picks exactly one.

    Scale: the interval join shuffles both sides on user_id and
    range-prunes candidates per user; the argmax is a per-purchase
    WindowGroupLimit (rank ≤ 1 pushes the limit below the sort). At
    100 TB add a coarse time-bucket equi-key (user, hour) to the join
    so candidates co-locate without a cross-day range scan."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").cast("decimal(18,2)").alias("value_dec"),
    )
    cand = purch.join(
        clicks,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("click_ts") < F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")),
    )
    rn = F.row_number().over(
        Window.partitionBy("purchase_id").orderBy(
            F.desc("click_ts"), F.desc("click_id")
        )
    )
    return (
        cand.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "purchase_id",
            "user_id",
            "click_id",
            (F.unix_micros("purchase_ts") - F.unix_micros("click_ts"))
            .cast("bigint")
            .alias("micros_since_click"),
            F.col("value_dec").cast("double").alias("purchase_value"),
        )
    )


# --------------------------------------------------------------------------
# Sliding distinct count (rolling 24h active users, hourly grain)
# --------------------------------------------------------------------------
@register(
    "rolling_daily_active_users",
    oracle="""
    WITH b AS (
      SELECT date_trunc('hour', MIN(ts)) AS h0,
             date_trunc('hour', MAX(ts)) AS h1
      FROM events
    ),
    spine AS (
      SELECT UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_ts FROM b
    )
    SELECT strftime(s.hour_ts, '%Y-%m-%d %H:00') AS hour_bucket,
           COUNT(DISTINCT e.user_id) AS active_users_24h
    FROM spine s
    JOIN events e
      ON e.ts >  s.hour_ts - INTERVAL 23 HOUR
     AND e.ts <= s.hour_ts + INTERVAL 1 HOUR
    GROUP BY s.hour_ts
    """,
)
def rolling_daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 24-hour distinct active users at hourly grain — the DAU
    curve every product dashboard runs, and the canonical HARD sliding
    aggregate: COUNT(DISTINCT) does not decompose over window frames,
    so it cannot ride a RANGE frame like ``rolling_week_spend``.
    Formulated as spine × range join: each hour joins the events in its
    trailing 24h window, then a two-phase distinct per bucket.

    Scale: NOT the naive spine×fact nested-loop range join (that
    evaluates |hours|·|events| predicates — measured 8.5 s at sf0.1),
    and NOT even a per-event explode: bucket membership depends only on
    the event's HOUR plus an exactly-on-the-boundary flag, so the fact
    first reduces to distinct (user, hour, on_boundary) — at most two
    rows per active user-hour regardless of raw volume — and only THAT
    set explodes to its ≤25 candidate buckets. At 100 TB the reduction
    is |events| → |active user-hours| (orders of magnitude) before any
    fan-out; the boundary predicate keeps it EXACT, not hour-truncated.
    To go further, replace the exact distinct with per-hour HLL
    sketches merged over the trailing 24 (mergeability is exactly what
    the sketch buys; `approx_distinct_summary` shows the primitive)."""
    ev = load(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    b = ev.agg(F.min(hour).alias("h0"), F.max(hour).alias("h1"))
    # (user, hour, on_boundary): the minimal exact carrier of bucket
    # membership — ts > B−23h and ts ≤ B+1h resolve per hour except at
    # the two edges, where "was ts exactly on its hour boundary" decides.
    pts = ev.select(
        "user_id", hour.alias("h"), (F.col("ts") == hour).alias("ob")
    ).distinct()
    # candidate buckets: the hourly grid points whose trailing-24h
    # window can contain an event in hour h — h − 1h .. h + 23h (the
    # −1h edge catches events exactly on the hour); the broadcast
    # bounds clip buckets outside the observed spine.
    cand = pts.select(
        "user_id",
        "h",
        "ob",
        F.explode(
            F.sequence(
                F.col("h") - F.expr("INTERVAL 1 HOUR"),
                F.col("h") + F.expr("INTERVAL 23 HOUR"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour_ts"),
    ).filter(
        # ts > hour_ts − 23h: true whenever h is strictly inside, and at
        # the h == hour_ts−23h edge only for ts strictly past the
        # boundary (¬ob). ts ≤ hour_ts + 1h: true for h ≤ hour_ts, and
        # at h == hour_ts+1h only for ts exactly on the boundary (ob).
        (
            (F.col("h") > F.col("hour_ts") - F.expr("INTERVAL 23 HOUR"))
            | (
                (F.col("h") == F.col("hour_ts") - F.expr("INTERVAL 23 HOUR"))
                & ~F.col("ob")
            )
        )
        & (
            (F.col("h") <= F.col("hour_ts"))
            | (
                (F.col("h") == F.col("hour_ts") + F.expr("INTERVAL 1 HOUR"))
                & F.col("ob")
            )
        )
    )
    clipped = cand.join(F.broadcast(b)).filter(
        (F.col("hour_ts") >= F.col("h0")) & (F.col("hour_ts") <= F.col("h1"))
    )
    return clipped.groupBy(
        F.date_format("hour_ts", "yyyy-MM-dd HH:00").alias("hour_bucket")
    ).agg(F.countDistinct("user_id").alias("active_users_24h"))


# --------------------------------------------------------------------------
# Period-over-period growth (weekly revenue, lag-based deltas)
# --------------------------------------------------------------------------
@register(
    "weekly_value_growth",
    oracle="""
    WITH w AS (
      SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week_start,
             SUM(CAST(value AS DECIMAL(18,2))) AS value_dec,
             COUNT(*) AS n_events
      FROM events
      GROUP BY date_trunc('week', ts)
    )
    SELECT week_start,
           CAST(value_dec AS DOUBLE) AS total_value,
           n_events,
           ROUND(CAST(value_dec - lag(value_dec) OVER (ORDER BY week_start)
                      AS DOUBLE)
                 / CAST(lag(value_dec) OVER (ORDER BY week_start) AS DOUBLE),
                 6) AS wow_growth
    FROM w
    """,
)
def weekly_value_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth: weekly exact-decimal value totals with a
    lag-based growth ratio — the period-over-period delta every BI
    report leads with. Monday-start ``date_trunc('week')`` agrees
    between engines; the growth ratio divides two exact decimals cast
    to double (deterministic scalar math; NULL for the first week).

    Scale: the weekly aggregate is map-side combinable; the lag window
    runs over |weeks| rows — a single tiny partition by design (the
    series itself is small; per-entity series would partition by the
    entity key)."""
    ev = load(spark, sf_dir, "events")
    w = ev.groupBy(
        F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd").alias(
            "week_start"
        )
    ).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("value_dec"),
        F.count("*").alias("n_events"),
    )
    lag = F.lag("value_dec").over(Window.orderBy("week_start"))
    return w.select(
        "week_start",
        F.col("value_dec").cast("double").alias("total_value"),
        "n_events",
        F.round(
            (F.col("value_dec") - lag).cast("double") / lag.cast("double"), 6
        ).alias("wow_growth"),
    )


# --------------------------------------------------------------------------
# Distribution shape (skewness / kurtosis) from exact higher moments
# --------------------------------------------------------------------------
@register(
    "value_moment_shape",
    oracle="""
    WITH m AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(8,2))) AS s1,
             SUM(CAST(value AS DECIMAL(8,2)) * CAST(value AS DECIMAL(8,2))) AS s2,
             SUM(CAST(CAST(value AS DECIMAL(8,2)) * CAST(value AS DECIMAL(8,2))
                      AS DECIMAL(19,4))
                 * CAST(value AS DECIMAL(8,2))) AS s3,
             SUM(CAST(CAST(value AS DECIMAL(8,2)) * CAST(value AS DECIMAL(8,2))
                      AS DECIMAL(19,4))
                 * CAST(CAST(value AS DECIMAL(8,2)) * CAST(value AS DECIMAL(8,2))
                        AS DECIMAL(19,4))) AS s4
      FROM events GROUP BY event_type
    ),
    d AS (
      SELECT event_type, CAST(n AS BIGINT) AS n, CAST(n AS DOUBLE) AS nd,
             CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
             CAST(s3 AS DOUBLE) AS s3, CAST(s4 AS DOUBLE) AS s4
      FROM m
    ),
    c AS (
      SELECT event_type, n,
             s1 / nd AS mean,
             (s2 / nd) - ((s1 / nd) * (s1 / nd)) AS v,
             (s3 / nd) - (((3 * (s1 / nd)) * s2) / nd)
               + ((2 * (s1 / nd)) * (s1 / nd)) * (s1 / nd) AS m3,
             (s4 / nd) - (((4 * (s1 / nd)) * s3) / nd)
               + ((((6 * (s1 / nd)) * (s1 / nd)) * s2) / nd)
               - (((3 * (s1 / nd)) * (s1 / nd)) * ((s1 / nd) * (s1 / nd))) AS m4
      FROM d
    )
    SELECT event_type, n AS n_events,
           ROUND(mean, 6) AS mean_value,
           ROUND(v, 6) AS variance_value,
           ROUND(m3 / (v * sqrt(v)), 6) AS skewness,
           ROUND((m4 / (v * v)) - 3, 6) AS excess_kurtosis
    FROM c
    """,
)
def value_moment_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis per event type from
    EXACT decimal power sums (Σx..Σx⁴ — values carry ≤2 fractional
    digits and are <1000, so x⁴ is exact at scale 8 well inside
    DECIMAL(38)). The central-moment algebra afterwards is scalar IEEE
    double written with IDENTICAL association on both engines, and
    v^1.5 is spelled v·√v (sqrt is correctly rounded everywhere;
    pow(x,1.5) is not guaranteed to be). Spark's own skewness()/
    kurtosis() stream doubles and are partition-order dependent —
    unusable for a bit-exact gate.

    Scale: one map-side-combinable pass, 4 partial sums per group —
    the same shape at 100 TB, scan-bound, no extra shuffle."""
    ev = load(spark, sf_dir, "events")
    x = F.col("value").cast("decimal(8,2)")
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.sum((x * x) * x).alias("s3"),
        F.sum((x * x) * (x * x)).alias("s4"),
    )
    nd = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    s3 = F.col("s3").cast("double")
    s4 = F.col("s4").cast("double")
    mean = s1 / nd
    v = (s2 / nd) - (mean * mean)
    m3 = (s3 / nd) - (((3 * mean) * s2) / nd) + ((2 * mean) * mean) * mean
    m4 = (
        (s4 / nd)
        - (((4 * mean) * s3) / nd)
        + ((((6 * mean) * mean) * s2) / nd)
        - (((3 * mean) * mean) * (mean * mean))
    )
    return m.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        F.round(mean, 6).alias("mean_value"),
        F.round(v, 6).alias("variance_value"),
        F.round(m3 / (v * F.sqrt(v)), 6).alias("skewness"),
        F.round((m4 / (v * v)) - 3, 6).alias("excess_kurtosis"),
    )


# --------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — the REPRODUCIBLE approximate
# distinct count (complements approx_distinct_summary's HLL, which is
# engine-specific and therefore rows-only in the gate)
# --------------------------------------------------------------------------
KMV_K = 64

@register(
    "kmv_distinct_users",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT) AS hv
      FROM events
    ),
    ranked AS (
      SELECT event_type, hv,
             row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS nd
      FROM h
    )
    SELECT event_type,
           CAST(MAX(nd) AS BIGINT) AS exact_distinct,
           ROUND(CASE WHEN MAX(nd) >= {KMV_K}
                      THEN CAST({KMV_K - 1} AS DOUBLE) * CAST({2**48} AS DOUBLE)
                           / MAX(CASE WHEN rn = {KMV_K} THEN hv END)
                      ELSE CAST(MAX(nd) AS DOUBLE) END, 2) AS kmv_estimate
    FROM ranked
    WHERE rn <= {KMV_K}
    GROUP BY event_type
    """,
)
def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type via a KMV
    (k-minimum-values) sketch over the portable 48-bit hash: keep the
    k=64 smallest distinct hash values; if the k-th smallest is h_k,
    the group has ≈ (k−1)·2⁴⁸/h_k distinct members (Bar-Yossef et al.,
    "Counting distinct elements in a data stream", RANDOM 2002).

    Unlike HLL (approx_distinct_summary) the KMV sketch is DETERMINISTIC
    given the hash function — both engines compute the identical md5-
    derived hashes, so the gate hash-compares an *approximate* algorithm
    exactly. Groups with < k distinct values degrade to the exact count.

    Scale: "k smallest of a union = k smallest of the union of each
    partition's k smallest" — the sketch is mergeable, so partial
    aggregation ships 64 longs per (partition, group), never the key
    universe. Exact COUNT(DISTINCT) shuffles every distinct pair; at
    100 TB this sketch is the difference between KBs and TBs of
    shuffle. (Here it's expressed as distinct→window-rank, which does
    shuffle the distinct set — the mergeability claim is realized by
    Spark's partial-distinct; a custom KMV UDAF would cap it at k.)"""
    from olap_project_spark.functions.text import portable_hash48

    ev = load(spark, sf_dir, "events")
    h = ev.select(
        "event_type",
        portable_hash48(F.col("user_id").cast("string")).alias("hv"),
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("hv")
    wa = Window.partitionBy("event_type")
    ranked = h.select(
        "event_type",
        "hv",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wa).alias("nd"),
    ).filter(F.col("rn") <= KMV_K)
    kth = F.max(F.when(F.col("rn") == KMV_K, F.col("hv")))
    est = F.when(
        F.max("nd") >= KMV_K,
        F.lit(float(KMV_K - 1)) * F.lit(float(2**48)) / kth,
    ).otherwise(F.max("nd").cast("double"))
    return ranked.groupBy("event_type").agg(
        F.max("nd").cast("bigint").alias("exact_distinct"),
        F.round(est, 2).alias("kmv_estimate"),
    )


# --------------------------------------------------------------------------
# Native session_window — the batch form of streaming/windows.py's
# sessionization (user_sessions above is the lag/island formulation;
# this is Spark's built-in operator, pinned to the same semantics)
# --------------------------------------------------------------------------
@register(
    "session_window_stats",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
             CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                       OR epoch(CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w) >= 1800
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ),
    grp AS (
      SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM seq
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS session_value
    FROM grp
    GROUP BY user_id, sid
    """,
)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session rollup via Spark's NATIVE ``session_window`` operator
    (30-minute gap): one session row per (user, burst of activity), with
    start, size, and value. The oracle derives identical sessions with
    the classic gaps-and-islands SQL — pinning the operator's merge rule
    (windows merge iff the gap is STRICTLY under the 30-min timeout,
    i.e. a gap of exactly 1800 s starts a new session).

    Scale: session_window is a single shuffle on user_id followed by a
    sort-merge of per-key windows — the same shape as the island
    formulation, but state-store-compatible (the identical call works
    under readStream, see streaming/windows.py). No window-function
    second pass."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(_dec("value")).cast("double"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


# --------------------------------------------------------------------------
# Skew path #2 — salted JOIN through the gate
# --------------------------------------------------------------------------
@register(
    "salted_nation_event_stats",
    oracle="""
    SELECT CAST(c_nationkey AS INTEGER) AS nation_key,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_nationkey
    """,
)
def salted_nation_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event stats per customer nation routed through the SALTED JOIN
    (functions.scale.salted_join) — the companion to salted_type_stats'
    salted aggregation: each fact row picks one of 16 salt buckets, the
    dimension is replicated 16× (one copy per salt), and the join runs
    on (key, salt) so a hot user's rows split across 16 tasks. The
    oracle proves row-identical results to the plain equi-join.

    Downstream aggregation stays exact under salting (decimal partials,
    count merge). At 100 TB this is the fallback when the dimension is
    too large to broadcast AND the fact key is skewed beyond what AQE
    skew-split handles; with a broadcastable dim (this corpus) you'd
    broadcast instead — see segment_event_value for that plan."""
    from olap_project_spark.functions.scale import salted_join

    ev = load(spark, sf_dir, "events").select("user_id", "value")
    cu = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    j = salted_join(ev, cu, key="user_id", n_salts=16)
    return j.groupBy(
        F.col("c_nationkey").cast("int").alias("nation_key")
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(_dec("value")).cast("double"), 2).alias("total_value"),
    )


# --------------------------------------------------------------------------
# Cross-timezone calendar analytics (ICU/IANA tz conversion)
# --------------------------------------------------------------------------
@register(
    "timezone_business_hours",
    oracle="""
    SELECT z.zone,
           CAST(hour(timezone(z.zone, CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC'))
                AS INTEGER) AS local_hour,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
    FROM events
    CROSS JOIN (VALUES ('America/New_York'), ('Asia/Tokyo')) AS z(zone)
    WHERE hour(timezone(z.zone, CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC'))
          BETWEEN 9 AND 17
    GROUP BY 1, 2
    """,
)
def timezone_business_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event traffic during LOCAL business hours (9:00–17:59) in each
    office timezone: the UTC event time is converted per zone with the
    IANA tz database (``convert_timezone`` — DST-correct, unlike the
    fixed-offset arithmetic naive pipelines use), then bucketed by
    local wall-clock hour. Both engines resolve zone rules through the
    same IANA data, so even DST-transition rows hash identically.

    The zone list rides along as an exploded literal array — a
    per-row generate, NOT a cartesian join (the plan-lint bans
    CartesianProduct); each event contributes one row per zone.

    Scale: stateless projection + one grouped aggregate; the zone
    fan-out multiplies rows by |zones| before the partial aggregate,
    which immediately collapses them to |zones|×24 groups map-side."""
    ev = load(spark, sf_dir, "events")
    local_ts = F.convert_timezone(
        F.lit("UTC"), F.col("zone"), F.col("ts")
    )
    return (
        ev.select(
            F.explode(
                F.array(F.lit("America/New_York"), F.lit("Asia/Tokyo"))
            ).alias("zone"),
            "ts",
            "value",
        )
        .select(
            "zone", F.hour(local_ts).cast("int").alias("local_hour"), "value"
        )
        .filter(F.col("local_hour").between(9, 17))
        .groupBy("zone", "local_hour")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(_dec("value")).cast("double"), 2).alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# Cumulative distinct (users-to-date) — the rewrite that scales
# --------------------------------------------------------------------------
@register(
    "cumulative_unique_users",
    oracle="""
    WITH first_seen AS (
      SELECT user_id,
             MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d
      FROM events GROUP BY user_id
    ),
    per_day AS (
      SELECT d, COUNT(*) AS new_users FROM first_seen GROUP BY d
    )
    SELECT strftime(d, '%Y-%m-%d') AS event_date,
           CAST(new_users AS BIGINT) AS new_users,
           CAST(SUM(new_users) OVER (ORDER BY d
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS users_to_date
    FROM per_day
    """,
)
def cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users EVER SEEN up to each day (the growth-curve
    number), via the rewrite that scales: a cumulative COUNT(DISTINCT)
    window does not decompose (every day would re-count its whole
    prefix), but "first-seen date per user → new users per day →
    running sum" is two hash aggregates plus a window over ≤|days|
    rows. rolling_daily_active_users makes the same point for a
    bounded window; this is the unbounded-prefix variant.

    Scale: the user-level aggregate partial-aggregates map-side; the
    running sum runs on the tiny per-day frame (a deliberate
    whitelisted global window over ≤|days| rows — see
    tools/plan_lint.py W1)."""
    ev = load(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d")
    )
    per_day = first_seen.groupBy("d").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        F.date_format("d", "yyyy-MM-dd").alias("event_date"),
        F.col("new_users").cast("bigint").alias("new_users"),
        F.sum("new_users").over(w).cast("bigint").alias("users_to_date"),
    )


# --------------------------------------------------------------------------
# Time-series resampling #2 — LINEAR interpolation across gaps
# --------------------------------------------------------------------------
@register(
    "hourly_spine_interpolated",
    oracle="""
    WITH b AS (
      SELECT date_trunc('hour', MIN(ts)) AS h0,
             date_trunc('hour', MAX(ts)) AS h1
      FROM events
    ),
    spine AS (
      SELECT UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_ts FROM b
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    actual AS (
      SELECT date_trunc('hour', ts) AS hour_ts, event_type,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,2))) AS sum_dec
      FROM events GROUP BY 1, 2
    ),
    legs AS (
      SELECT s.hour_ts, t.event_type,
             CAST(CASE WHEN a.n IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_gap,
             epoch(s.hour_ts) // 3600 AS t,
             last_value(CAST(a.sum_dec AS DOUBLE) / a.n IGNORE NULLS) OVER wp AS v_prev,
             last_value(CASE WHEN a.n IS NOT NULL
                             THEN epoch(s.hour_ts) // 3600 END IGNORE NULLS)
               OVER wp AS t_prev,
             first_value(CAST(a.sum_dec AS DOUBLE) / a.n IGNORE NULLS) OVER wn AS v_next,
             first_value(CASE WHEN a.n IS NOT NULL
                              THEN epoch(s.hour_ts) // 3600 END IGNORE NULLS)
               OVER wn AS t_next
      FROM spine s
      CROSS JOIN types t
      LEFT JOIN actual a ON a.hour_ts = s.hour_ts AND a.event_type = t.event_type
      WINDOW
        wp AS (PARTITION BY t.event_type ORDER BY s.hour_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wn AS (PARTITION BY t.event_type ORDER BY s.hour_ts
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT strftime(hour_ts, '%Y-%m-%d %H:00') AS hour_bucket,
           event_type, is_gap,
           ROUND(CASE WHEN t_prev IS NULL THEN v_next
                      WHEN t_next IS NULL THEN v_prev
                      WHEN t_next = t_prev THEN v_prev
                      ELSE v_prev + ((v_next - v_prev) * CAST(t - t_prev AS DOUBLE))
                                    / CAST(t_next - t_prev AS DOUBLE)
                 END, 6) AS interp_avg_value
    FROM legs
    """,
)
def hourly_spine_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification with LINEAR interpolation: gap hours get
    the value linearly blended between the nearest known hourly
    averages on each side (edges back-/forward-fill) — the resampling
    rule forecasting pipelines want when LOCF's step function
    (hourly_spine_filled) biases the series.

    Both interpolation legs are one window each (carry-forward and its
    mirror, carry-backward via a FOLLOWING frame); the blend arithmetic
    is written with identical association in both engines so the
    doubles hash equal.

    Scale: identical shape to hourly_spine_filled — the window state is
    per event_type over the |hours| spine, never the fact."""
    ev = load(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    b = ev.agg(F.min(hour).alias("h0"), F.max(hour).alias("h1"))
    spine = b.select(
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_ts")
    )
    types = ev.select("event_type").distinct()
    actual = ev.groupBy(hour.alias("hour_ts"), F.col("event_type")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_dec"),
    )
    joined = spine.crossJoin(F.broadcast(types)).join(
        actual, ["hour_ts", "event_type"], "left"
    )
    # TIMESTAMP_NTZ has no direct long cast in Spark 4 — route via ltz
    # (the session is UTC, so the epoch agrees with DuckDB's).
    t = (F.col("hour_ts").cast("timestamp_ltz").cast("long") / 3600).cast(
        "bigint"
    )
    avg_val = F.col("sum_dec").cast("double") / F.col("n")
    known_t = F.when(F.col("n").isNotNull(), t)
    wp = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    legs = joined.select(
        "hour_ts",
        "event_type",
        F.when(F.col("n").isNull(), 1).otherwise(0).cast("int").alias("is_gap"),
        t.alias("t"),
        F.last(avg_val, ignorenulls=True).over(wp).alias("v_prev"),
        F.last(known_t, ignorenulls=True).over(wp).alias("t_prev"),
        F.first(avg_val, ignorenulls=True).over(wn).alias("v_next"),
        F.first(known_t, ignorenulls=True).over(wn).alias("t_next"),
    )
    interp = (
        F.when(F.col("t_prev").isNull(), F.col("v_next"))
        .when(F.col("t_next").isNull(), F.col("v_prev"))
        .when(F.col("t_next") == F.col("t_prev"), F.col("v_prev"))
        .otherwise(
            F.col("v_prev")
            + (
                (F.col("v_next") - F.col("v_prev"))
                * (F.col("t") - F.col("t_prev")).cast("double")
            )
            / (F.col("t_next") - F.col("t_prev")).cast("double")
        )
    )
    return legs.select(
        F.date_format("hour_ts", "yyyy-MM-dd HH:00").alias("hour_bucket"),
        "event_type",
        "is_gap",
        F.round(interp, 6).alias("interp_avg_value"),
    )


# --------------------------------------------------------------------------
# Semi-structured #2 — VariantType (Spark 4's binary JSON)
# --------------------------------------------------------------------------
@register(
    "props_variant_buckets",
    oracle="""
    WITH x AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_bucket
      FROM events
      WHERE json_extract_string(props, '$.k') IS NOT NULL
    )
    SELECT k_bucket,
           COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
    FROM x
    GROUP BY k_bucket
    """,
)
def props_variant_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same semi-structured payload via Spark 4's VARIANT type:
    ``parse_json`` decodes the JSON string ONCE into the binary variant
    encoding, then ``try_variant_get`` path-extracts with a type — the
    shredded-access model (one parse, many typed reads) that replaces
    repeated per-field string path-walks (props_json_stats shows that
    older model). try_* semantics: malformed payloads yield null, never
    a failed task — the posture a 100 TB ingest needs.

    The oracle reads the identical field through DuckDB's JSON path
    API; the variant encoding is an engine-internal detail, so the
    RESULTS (not the encodings) are what must match.

    Scale: variant parse+get are codegen'd JVM expressions; for
    repeatedly-queried fields you'd shred the variant to a column at
    write time — this query is the read-side half of that trade."""
    ev = load(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .select("event_type", F.expr("k div 10").alias("k_bucket"))
        .filter(F.col("k_bucket").isNotNull())
        .groupBy("k_bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("event_type").cast("bigint").alias("n_types"),
        )
    )


# --------------------------------------------------------------------------
# Skew diagnostics — the numbers that decide broadcast/salt/AQE strategy
# --------------------------------------------------------------------------
@register(
    "user_key_skew_profile",
    oracle="""
    WITH freq AS (
      SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT n,
             row_number() OVER (ORDER BY n DESC, user_id) AS rk,
             CAST(COUNT(*) OVER () AS BIGINT) AS n_keys,
             CAST(SUM(n) OVER () AS BIGINT) AS n_rows
      FROM freq
    )
    SELECT n_keys,
           n_rows,
           CAST(MAX(CASE WHEN rk = 1 THEN n END) AS BIGINT) AS top1_rows,
           ROUND(CAST(MAX(CASE WHEN rk = 1 THEN n END) AS DOUBLE)
                 / MAX(n_rows), 6) AS top1_share,
           CAST(SUM(CASE WHEN rk <= 10 THEN n ELSE 0 END) AS BIGINT) AS top10_rows,
           ROUND(CAST(MAX(n_rows) AS DOUBLE) / MAX(n_keys), 6) AS mean_rows_per_key,
           ROUND(CAST(MAX(CASE WHEN rk = 1 THEN n END) AS DOUBLE)
                 / (CAST(MAX(n_rows) AS DOUBLE) / MAX(n_keys)), 6)
             AS top1_to_mean_ratio
    FROM ranked
    GROUP BY n_keys, n_rows
    """,
)
def user_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics for the stream fact's user_id — the
    numbers that decide the physical strategy BEFORE a 100 TB join:
    top-1/top-10 key row shares and the hot-key-to-mean ratio. Rule of
    thumb this feeds: ratio ≲ 10 → plain shuffle join; 10-100 → AQE
    skew-split handles it; ≫100 → salt (salted_nation_event_stats) or
    filter the hot key onto a broadcast path. functions/profile.py
    does the generic one-pass version; this exposes the join-planning
    cut through the gate.

    Scale: one partial-aggregated count per key; the rank is the
    RANGE-PARTITIONED two-pass row_number (functions/scale.
    global_order_stats) and the frame totals are a 1-row broadcast
    aggregate — no single-task sort or unpartitioned window over the
    key dimension (which grows with the data) anywhere in the plan."""
    from olap_project_spark.functions.scale import global_order_stats

    ev = load(spark, sf_dir, "events")
    freq = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    tot = freq.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum("n").cast("bigint").alias("n_rows"),
    )
    ranked = (
        global_order_stats(
            freq, [F.desc("n"), F.asc("user_id")], rank_col="rk"
        )
        .join(F.broadcast(tot))
        .select("n", "rk", "n_keys", "n_rows")
    )
    top1 = F.max(F.when(F.col("rk") == 1, F.col("n")))
    mean = F.max("n_rows").cast("double") / F.max("n_keys")
    return ranked.groupBy("n_keys", "n_rows").agg(
        top1.cast("bigint").alias("top1_rows"),
        F.round(top1.cast("double") / F.max("n_rows"), 6).alias("top1_share"),
        F.sum(F.when(F.col("rk") <= 10, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("top10_rows"),
        F.round(mean, 6).alias("mean_rows_per_key"),
        F.round(top1.cast("double") / mean, 6).alias("top1_to_mean_ratio"),
    )


# --------------------------------------------------------------------------
# Debounce dedup (drop rapid-fire repeats per user+type)
# --------------------------------------------------------------------------
DEBOUNCE_SECONDS = 5


@register(
    "debounced_event_counts",
    oracle=f"""
    WITH ev AS (
      SELECT event_type, user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
      FROM events
    ),
    lagged AS (
      SELECT event_type,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) IS NOT NULL
                   AND epoch(ts) - epoch(lag(ts) OVER (
                         PARTITION BY user_id, event_type
                         ORDER BY ts, event_id)) <= {DEBOUNCE_SECONDS}
                  THEN 1 ELSE 0 END AS dropped
      FROM ev
    )
    SELECT event_type,
           COUNT(*) AS n_raw,
           CAST(COUNT(*) - SUM(dropped) AS BIGINT) AS n_kept,
           CAST(SUM(dropped) AS BIGINT) AS n_dropped,
           ROUND(CAST(SUM(dropped) AS DOUBLE) / COUNT(*), 6) AS drop_frac
    FROM lagged GROUP BY event_type
    """,
)
def debounced_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce deduplication accounting: an event is a rapid-fire
    repeat (double-click, retry storm, sensor chatter) when it follows
    the PREVIOUS event of the same (user, type) within 5 seconds — the
    lag-based form every SQL engine agrees on (true
    relative-to-last-KEPT debouncing is inherently sequential; the
    lag form is the standard one-pass approximation and an upper
    bound on kept rows). Tiebreak on event_id makes the order total.

    Scale: one window partitioned by (user_id, event_type) — state
    scales out with the keyspace — then a per-type rollup. The
    streaming twin is dropDuplicatesWithinWatermark
    (streaming_distinct_user_types); this is the batch/backfill form."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    dropped = (
        prev_ts.isNotNull()
        & (
            F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)
            <= DEBOUNCE_SECONDS
        )
    ).cast("bigint")
    lagged = ev.select("event_type", dropped.alias("dropped"))
    return lagged.groupBy("event_type").agg(
        F.count("*").alias("n_raw"),
        (F.count("*") - F.sum("dropped")).cast("bigint").alias("n_kept"),
        F.sum("dropped").cast("bigint").alias("n_dropped"),
        F.round(F.sum("dropped").cast("double") / F.count("*"), 6).alias(
            "drop_frac"
        ),
    )


# --------------------------------------------------------------------------
# Watermark-lateness accounting (how late does this stream arrive?)
# --------------------------------------------------------------------------
LATENESS_WATERMARK_S = 600  # the 10-minute watermark the gate's streams use


@register(
    "late_event_accounting",
    oracle=f"""
    WITH ev AS (
      SELECT event_type, user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events
    ),
    seen AS (
      SELECT event_type, ts,
             max(ts) OVER (PARTITION BY user_id
                           ORDER BY event_id
                           ROWS UNBOUNDED PRECEDING) AS high_water
      FROM ev
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN epoch(high_water) - epoch(ts)
                              > {LATENESS_WATERMARK_S}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           ROUND(CAST(SUM(CASE WHEN epoch(high_water) - epoch(ts)
                                    > {LATENESS_WATERMARK_S}
                               THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
             AS late_frac
    FROM seen GROUP BY event_type
    """,
)
def late_event_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-tuning diagnostics: per event type, how many events
    arrive more than the streaming watermark (10 min) behind the
    high-water mark of event time already seen on their own key's
    arrival order (event_id = ingestion sequence)? These are exactly
    the rows a watermarked streaming aggregate would DROP — measured
    here on the batch table, which is how you pick a watermark before
    deploying the stream (too tight drops data, too loose bloats
    state).

    Scale: the running high-water mark is a per-user window (state
    scales out; no global order), then a per-type rollup. Counts and
    flags are integer-exact."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    high_water = F.max("ts").over(w)
    late = (
        (F.unix_timestamp(high_water) - F.unix_timestamp("ts"))
        > LATENESS_WATERMARK_S
    ).cast("bigint")
    seen = ev.select("event_type", late.alias("late"))
    return seen.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("late").cast("bigint").alias("n_late"),
        F.round(F.sum("late").cast("double") / F.count("*"), 6).alias(
            "late_frac"
        ),
    )


# --------------------------------------------------------------------------
# Approximate query processing: deterministic hash-sampled aggregates
# --------------------------------------------------------------------------
SAMPLE_MOD = 10        # keep event_id-hash % 10 == 0 → a 10% sample
SAMPLE_REL_TOL = 0.35  # measured max rel. error 0.252 at sf0.001 (n≈20/group)


@register(
    "hash_sampled_value_stats",
    oracle=f"""
    WITH ev AS (
      SELECT event_type, value,
             CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12) AS BIGINT)
               % {SAMPLE_MOD} AS b
      FROM events
    ),
    agg AS (
      SELECT event_type,
             COUNT(*) AS n_total,
             CAST(SUM(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS exact_sum,
             CAST(SUM(CASE WHEN b = 0
                           THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
               AS samp_sum
      FROM ev GROUP BY event_type
    )
    SELECT event_type, n_total, n_sampled,
           ROUND(exact_sum / n_total, 6) AS exact_mean,
           ROUND(samp_sum / n_sampled, 6) AS sampled_mean,
           ROUND(abs(samp_sum / n_sampled - exact_sum / n_total)
                 / abs(exact_sum / n_total), 6) AS rel_error,
           (abs(samp_sum / n_sampled - exact_sum / n_total)
            <= {SAMPLE_REL_TOL} * abs(exact_sum / n_total) + 0.5) AS within_tol
    FROM agg
    """,
)
def hash_sampled_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing by DETERMINISTIC sampling: a 10%
    hash sample (md5(event_id) mod 10 — reproducible across engines
    and runs, unlike TABLESAMPLE's seeded RNG) estimates the per-type
    mean value; the row carries the exact mean, the measured relative
    error, and a self-validating tolerance boolean (rel ≤ 0.35 + 0.5
    absolute slack — sized to the observed worst group at the smallest
    corpus; the HLL contract pattern, approx_distinct_summary). Both
    sums are exact DECIMAL(18,2) (order-independent), so every reported
    digit is bit-stable cross-engine — the gate pins the estimator
    itself, not just its tolerance.

    Scale: this is the dashboard-acceleration lever — the sample
    predicate pushes to the scan, cutting 90% of rows before the
    aggregate; at 100 TB you'd materialize the hash-sample as its own
    table (the AQP summary store) and serve interactive queries from
    it, with this contract query as the nightly accuracy audit."""
    from olap_project_spark.functions.text import portable_hash48

    ev = load(spark, sf_dir, "events")
    b = portable_hash48(F.col("event_id").cast("string")) % SAMPLE_MOD
    dec = F.col("value").cast("decimal(18,2)")
    agg = ev.select("event_type", dec.alias("v"), b.alias("b")).groupBy(
        "event_type"
    ).agg(
        F.count("*").alias("n_total"),
        F.sum((F.col("b") == 0).cast("bigint")).cast("bigint").alias("n_sampled"),
        F.sum("v").cast("double").alias("exact_sum"),
        F.sum(F.when(F.col("b") == 0, F.col("v"))).cast("double").alias("samp_sum"),
    )
    exact_mean = F.col("exact_sum") / F.col("n_total")
    samp_mean = F.col("samp_sum") / F.col("n_sampled")
    return agg.select(
        "event_type",
        "n_total",
        "n_sampled",
        F.round(exact_mean, 6).alias("exact_mean"),
        F.round(samp_mean, 6).alias("sampled_mean"),
        F.round(F.abs(samp_mean - exact_mean) / F.abs(exact_mean), 6).alias(
            "rel_error"
        ),
        (
            F.abs(samp_mean - exact_mean)
            <= SAMPLE_REL_TOL * F.abs(exact_mean) + 0.5
        ).alias("within_tol"),
    )


# --------------------------------------------------------------------------
# Seasonal-baseline anomaly detection (same-slot-of-week comparison)
# --------------------------------------------------------------------------
@register(
    "seasonal_hour_anomalies",
    oracle="""
    WITH hc AS (
      SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    slot AS (
      SELECT event_type, h, c,
             CAST(dayofweek(h) AS INTEGER) AS dow,
             CAST(hour(h) AS INTEGER) AS hod
      FROM hc
    ),
    base AS (
      SELECT event_type, dow, hod,
             CAST(SUM(c) AS BIGINT) AS s, COUNT(*) AS n
      FROM slot GROUP BY 1, 2, 3
    )
    SELECT s.event_type,
           COUNT(*) AS n_slots,
           CAST(SUM(CASE WHEN 2 * abs(s.c * b.n - b.s) > b.s * b.n
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous,
           ROUND(CAST(SUM(CASE WHEN 2 * abs(s.c * b.n - b.s) > b.s * b.n
                               THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
             AS anomaly_frac
    FROM slot s
    JOIN base b ON b.event_type = s.event_type
               AND b.dow = s.dow AND b.hod = s.hod
    GROUP BY s.event_type
    """,
)
def seasonal_hour_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly detection: each observed hour's event
    count is compared against the mean of ITS OWN weekly slot — same
    day-of-week, same hour-of-day — and flagged when it deviates more
    than 50% from that seasonal baseline. A global-mean detector
    (anomalous_hours) calls every Friday evening an anomaly and misses
    a quiet Friday; the seasonal baseline does neither. The deviation
    test cross-multiplies integers (``2·|c·n − S| > S·n``), so no
    floating-point mean is ever compared.

    Scale: an hourly pre-aggregate (map-side combined), a (type, dow,
    hod)-keyed baseline over ≤ |types|·168 groups, and an equi-join of
    the two — the baseline side is tiny and AQE broadcasts it. Hours
    with zero events are absent, not zero-filled (the spine-filled
    variants handle gap semantics)."""
    ev = load(spark, sf_dir, "events")
    hc = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("c"))
    slot = hc.select(
        "event_type",
        "c",
        (F.dayofweek("h") - 1).cast("int").alias("dow"),
        F.hour("h").cast("int").alias("hod"),
    )
    base = slot.groupBy("event_type", "dow", "hod").agg(
        F.sum("c").cast("bigint").alias("s"), F.count("*").alias("n")
    )
    j = slot.join(base, ["event_type", "dow", "hod"])
    anom = (
        2 * F.abs(F.col("c") * F.col("n") - F.col("s")) > F.col("s") * F.col("n")
    ).cast("bigint")
    return j.groupBy("event_type").agg(
        F.count("*").alias("n_slots"),
        F.sum(anom).cast("bigint").alias("n_anomalous"),
        F.round(F.sum(anom).cast("double") / F.count("*"), 6).alias(
            "anomaly_frac"
        ),
    )


# --------------------------------------------------------------------------
# Trending: top-k per time bucket
# --------------------------------------------------------------------------
TRENDING_K = 3


@register(
    "trending_types_daily",
    oracle=f"""
    WITH dc AS (
      SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT day, event_type, n_events,
             row_number() OVER (PARTITION BY day
                                ORDER BY n_events DESC, event_type) AS rnk
      FROM dc
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, CAST(rnk AS INTEGER) AS rnk,
           event_type, n_events
    FROM ranked WHERE rnk <= {TRENDING_K}
    """,
)
def trending_types_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending leaderboard: the top-3 event types of EACH day with
    their rank — the per-time-bucket top-k every activity dashboard
    renders (distinct from global top-k: the ranking restarts per
    bucket, so a type can trend Monday and vanish Tuesday).
    Deterministic tiebreak on the type name.

    Scale: a (day, type) pre-aggregate (map-side combined) feeds a
    rank window PARTITIONED BY DAY — Spark compiles the rnk <= k
    filter to WindowGroupLimit, keeping only k rows per partition
    inside the shuffle instead of ranking every group. State per task
    is O(k), not O(|types|)."""
    ev = load(spark, sf_dir, "events")
    dc = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count("*").alias("n_events"))
    w = Window.partitionBy("day").orderBy(F.desc("n_events"), F.asc("event_type"))
    return (
        dc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TRENDING_K)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("rnk").cast("int").alias("rnk"),
            "event_type",
            "n_events",
        )
    )


# --------------------------------------------------------------------------
# Watermark tuning curve (drop fraction per candidate delay)
# --------------------------------------------------------------------------
WATERMARK_CANDIDATES_S = (60, 300, 600, 1800)


@register(
    "watermark_tuning_curve",
    oracle=f"""
    WITH ev AS (
      SELECT event_type, user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events
    ),
    seen AS (
      SELECT event_type,
             epoch(max(ts) OVER (PARTITION BY user_id
                                 ORDER BY event_id
                                 ROWS UNBOUNDED PRECEDING)) - epoch(ts)
               AS lateness_s
      FROM ev
    ),
    thr AS (SELECT * FROM (VALUES {", ".join(f"({t})" for t in WATERMARK_CANDIDATES_S)}) AS t(threshold_s))
    SELECT s.event_type,
           thr.threshold_s,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN s.lateness_s > thr.threshold_s
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           ROUND(CAST(SUM(CASE WHEN s.lateness_s > thr.threshold_s
                               THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
             AS drop_frac
    FROM seen s, thr
    GROUP BY s.event_type, thr.threshold_s
    """,
)
def watermark_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The watermark DECISION CURVE: for each candidate delay (1 m,
    5 m, 10 m, 30 m), the fraction of events a streaming aggregate
    with that watermark would drop — late_event_accounting generalized
    from the deployed 10-minute point to the curve you actually read
    when choosing the delay (tight → data loss, loose → state bloat;
    pick the knee). Lateness is measured against the per-key event-time
    high-water mark in arrival order; all counts are integer-exact.

    Scale: the per-user running-max window computes lateness ONCE; the
    4-row threshold frame joins by broadcast, so the curve costs the
    same single pass as one point plus a 4× larger (still tiny)
    aggregate."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lateness = F.unix_timestamp(F.max("ts").over(w)) - F.unix_timestamp("ts")
    seen = ev.select("event_type", lateness.alias("lateness_s"))
    thr = local_frame(spark, 
        [(t,) for t in WATERMARK_CANDIDATES_S], "threshold_s int"
    )
    dropped = (F.col("lateness_s") > F.col("threshold_s")).cast("bigint")
    return (
        seen.join(F.broadcast(thr))
        .groupBy("event_type", "threshold_s")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dropped).cast("bigint").alias("n_dropped"),
            F.round(F.sum(dropped).cast("double") / F.count("*"), 6).alias(
                "drop_frac"
            ),
        )
    )


# --------------------------------------------------------------------------
# A/B experiment analysis over deterministic user buckets
# --------------------------------------------------------------------------
@register(
    "ab_bucket_metrics",
    oracle="""
    WITH assigned AS (
      SELECT CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12)
                        AS BIGINT) % 2 = 0
                  THEN 'A' ELSE 'B' END AS bucket,
             user_id, event_type, value
      FROM events
    ),
    per_user AS (
      SELECT bucket, user_id,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_purchases,
             SUM(CAST(value AS DECIMAL(18,2))) AS user_value
      FROM assigned GROUP BY 1, 2
    )
    SELECT bucket,
           COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN n_purchases > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_converted,
           ROUND(CAST(SUM(CASE WHEN n_purchases > 0 THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS conversion_rate,
           CAST(SUM(n_purchases) AS BIGINT) AS total_purchases,
           ROUND(CAST(SUM(user_value) AS DOUBLE), 2) AS total_value
    FROM per_user GROUP BY bucket
    """,
)
def ab_bucket_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout over DETERMINISTIC assignment: users hash
    into bucket A or B (md5 — reproducible, balanced, and immune to the
    reassignment churn a random split suffers on re-runs), and each
    bucket reports user count, converted users (>= 1 purchase),
    conversion rate, purchase volume, and exact decimal value — the
    experiment-analysis table every growth dashboard renders. Unit of
    analysis is the USER (per-user pre-aggregate), not the event —
    event-level rates overweight heavy users (the classic A/B pitfall).

    Scale: one (bucket, user) map-side-combined pre-aggregate, then a
    2-group rollup; assignment is a pure projection pushed to the scan.
    Significance testing adds per-bucket variance of the same per-user
    frame — identical shape, two more aggregate columns."""
    from olap_project_spark.functions.text import portable_hash48

    ev = load(spark, sf_dir, "events")
    bucket = F.when(
        portable_hash48(F.col("user_id").cast("string")) % 2 == 0, "A"
    ).otherwise("B")
    per_user = (
        ev.select(
            bucket.alias("bucket"),
            "user_id",
            (F.col("event_type") == "purchase").cast("bigint").alias("is_p"),
            F.col("value").cast("decimal(18,2)").alias("v"),
        )
        .groupBy("bucket", "user_id")
        .agg(
            F.sum("is_p").cast("bigint").alias("n_purchases"),
            F.sum("v").alias("user_value"),
        )
    )
    return per_user.groupBy("bucket").agg(
        F.count("*").alias("n_users"),
        F.sum((F.col("n_purchases") > 0).cast("bigint"))
        .cast("bigint")
        .alias("n_converted"),
        F.round(
            F.sum((F.col("n_purchases") > 0).cast("bigint")).cast("double")
            / F.count("*"),
            6,
        ).alias("conversion_rate"),
        F.sum("n_purchases").cast("bigint").alias("total_purchases"),
        F.round(F.sum("user_value").cast("double"), 2).alias("total_value"),
    )


# --------------------------------------------------------------------------
# Cohort lifetime-value curve (value companion to weekly_retention)
# --------------------------------------------------------------------------
@register(
    "cohort_value_curve",
    oracle="""
    WITH weeks AS (
      SELECT user_id,
             CAST(floor(datediff('day', TIMESTAMP '2024-01-01 00:00:00',
                                 CAST(ts AS TIMESTAMP)) / 7) AS INTEGER) AS week,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events
    ),
    cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY user_id),
    cell AS (
      SELECT c.cohort_week,
             w.week - c.cohort_week AS weeks_since,
             SUM(w.v) AS week_value
      FROM weeks w JOIN cohort c ON c.user_id = w.user_id
      GROUP BY 1, 2
    ),
    sizes AS (SELECT cohort_week, COUNT(*) AS cohort_users FROM cohort GROUP BY 1)
    SELECT cell.cohort_week,
           CAST(cell.weeks_since AS INTEGER) AS weeks_since,
           CAST(s.cohort_users AS BIGINT) AS cohort_users,
           ROUND(CAST(SUM(cell.week_value) OVER (
                   PARTITION BY cell.cohort_week
                   ORDER BY cell.weeks_since
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2) AS cum_value,
           ROUND(CAST(SUM(cell.week_value) OVER (
                   PARTITION BY cell.cohort_week
                   ORDER BY cell.weeks_since
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / s.cohort_users, 6) AS cum_value_per_user
    FROM cell JOIN sizes s ON s.cohort_week = cell.cohort_week
    """,
)
def cohort_value_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: users grouped by first-active week,
    each cohort's CUMULATIVE event value per user tracked week by week
    — the LTV readout that pairs with ``weekly_retention`` (retention
    counts who comes back; this accumulates what they're worth, which
    is what acquisition spend is actually judged against). The
    cumulative sum runs over exact decimals in (cohort, weeks_since)
    order, so every reported cent is engine-order independent.

    Scale: the fact collapses to (cohort_week, weeks_since) decimal
    cells first (map-side combined); the cumulative window runs per
    cohort over ≤ |weeks| rows — never over raw events."""
    ev = load(spark, sf_dir, "events")
    week = F.floor(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")) / 7
    ).cast("int")
    weeks = ev.select(
        "user_id", week.alias("week"), F.col("value").cast("decimal(18,2)").alias("v")
    )
    cohort = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    cell = (
        weeks.join(cohort, "user_id")
        .groupBy(
            "cohort_week", (F.col("week") - F.col("cohort_week")).alias("weeks_since")
        )
        .agg(F.sum("v").alias("week_value"))
    )
    sizes = cohort.groupBy("cohort_week").agg(F.count("*").alias("cohort_users"))
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("weeks_since")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("week_value").over(w)
    return (
        cell.join(sizes, "cohort_week")
        .select(
            "cohort_week",
            F.col("weeks_since").cast("int").alias("weeks_since"),
            F.col("cohort_users").cast("bigint").alias("cohort_users"),
            F.round(cum.cast("double"), 2).alias("cum_value"),
            F.round(cum.cast("double") / F.col("cohort_users"), 6).alias(
                "cum_value_per_user"
            ),
        )
    )


# --------------------------------------------------------------------------
# Strict in-session sequence funnel (MATCH_RECOGNIZE stand-in)
# --------------------------------------------------------------------------
FUNNEL_GAP_S = 1800  # the same 30-minute silence that bounds user_sessions


@register(
    "session_funnel_stats",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_type, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > {FUNNEL_GAP_S}
                  THEN 1 ELSE 0 END AS new_s
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, event_type, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ),
    v AS (
      SELECT user_id, sid,
             min(CASE WHEN event_type = 'view' THEN ts END) AS v1
      FROM sess GROUP BY 1, 2
    ),
    c AS (
      SELECT s.user_id, s.sid,
             min(CASE WHEN s.event_type = 'click' AND s.ts > v.v1
                      THEN s.ts END) AS c1
      FROM sess s JOIN v ON v.user_id = s.user_id AND v.sid = s.sid
      GROUP BY 1, 2
    ),
    p AS (
      SELECT s.user_id, s.sid,
             CAST(max(CASE WHEN s.event_type = 'purchase' AND s.ts > c.c1
                           THEN 1 ELSE 0 END) AS BIGINT) AS converted
      FROM sess s JOIN c ON c.user_id = s.user_id AND c.sid = s.sid
      GROUP BY 1, 2
    )
    SELECT COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN v.v1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_with_view,
           CAST(SUM(CASE WHEN c.c1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_view_then_click,
           CAST(SUM(p.converted) AS BIGINT) AS n_full_funnel,
           ROUND(CAST(SUM(p.converted) AS DOUBLE) / COUNT(*), 6)
             AS funnel_rate
    FROM v
    JOIN c ON c.user_id = v.user_id AND c.sid = v.sid
    JOIN p ON p.user_id = v.user_id AND p.sid = v.sid
    """,
)
def session_funnel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRICT in-session sequence funnel — view, THEN a click after
    that view, THEN a purchase after that click, all inside one
    30-minute-gap session: the true-subsequence semantics of SQL
    MATCH_RECOGNIZE (which Spark lacks), composed from sessionization
    + staged conditional aggregates. signup_purchase_funnel compares
    USER-lifetime first timestamps; this one is session-scoped and
    three-stage with each stage anchored AFTER the previous stage's
    first occurrence — the pattern ad-attribution and UX funnels
    actually need.

    Scale: island sessionization (per-user window), then three
    aggregate passes linked by (user, session) equi-joins — the stage
    anchors are per-session scalars, so the events×events self-join a
    naive pattern matcher would do never happens."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_s = (
        F.lag("ts").over(w).isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)) > FUNNEL_GAP_S)
    ).cast("int")
    wsum = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = ev.select(
        "user_id", "event_type", "ts", new_s.alias("new_s")
    ).withColumn("sid", F.sum("new_s").over(wsum))
    v = sess.groupBy("user_id", "sid").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("v1")
    )
    c = (
        sess.join(v, ["user_id", "sid"])
        .groupBy("user_id", "sid")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("v1")),
                    F.col("ts"),
                )
            ).alias("c1")
        )
    )
    p = (
        sess.join(c, ["user_id", "sid"])
        .groupBy("user_id", "sid")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("c1")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("converted")
        )
    )
    joined = v.join(c, ["user_id", "sid"]).join(p, ["user_id", "sid"])
    return joined.agg(
        F.count("*").alias("n_sessions"),
        F.sum(F.col("v1").isNotNull().cast("bigint"))
        .cast("bigint")
        .alias("n_with_view"),
        F.sum(F.col("c1").isNotNull().cast("bigint"))
        .cast("bigint")
        .alias("n_view_then_click"),
        F.sum("converted").cast("bigint").alias("n_full_funnel"),
        F.round(F.sum("converted").cast("double") / F.count("*"), 6).alias(
            "funnel_rate"
        ),
    )


# --------------------------------------------------------------------------
# Cohort retention matrix (the classic weekly triangle)
# --------------------------------------------------------------------------
@register(
    "cohort_retention_matrix",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    ),
    first AS (SELECT user_id, MIN(wk) AS cohort FROM act GROUP BY 1),
    coh AS (SELECT cohort, COUNT(*) AS n_cohort FROM first GROUP BY 1),
    j AS (
      SELECT f.cohort,
             CAST(date_diff('day', f.cohort, a.wk) // 7 AS INTEGER)
               AS week_offset,
             COUNT(DISTINCT a.user_id) AS n_active
      FROM act a JOIN first f ON f.user_id = a.user_id
      GROUP BY 1, 2
    )
    SELECT strftime(j.cohort, '%Y-%m-%d') AS cohort_week,
           j.week_offset, j.n_active, c.n_cohort,
           ROUND(j.n_active * 1.0 / c.n_cohort, 6) AS retention
    FROM j JOIN coh c ON c.cohort = j.cohort
    """,
)
def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users are cohorted by the week
    of their FIRST event; retention[cohort][k] is the fraction of that
    cohort active in week cohort+k. The table behind every retention
    curve a growth team reads — and the leakage-prone computation
    (cohorting must come from the GLOBAL first event, not the slice
    under study) done once, correctly, at the engine level.

    Scale: activity dedups to (user, week) FIRST (the biggest
    reduction, map-side combined), cohorts derive from a per-user min,
    and the matrix is a (cohort × offset) aggregate over the deduped
    frame — every shuffle is on user_id or the tiny cohort key.
    Week 0 retention is 1.0 by construction (a self-check the oracle
    hash pins)."""
    ev = load(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    first = act.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    coh = first.groupBy("cohort").agg(F.count("*").alias("n_cohort"))
    j = (
        act.join(first, "user_id")
        .groupBy(
            "cohort",
            F.floor(
                F.datediff(F.col("wk").cast("date"), F.col("cohort").cast("date"))
                / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    return j.join(coh, "cohort").select(
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
        "n_active",
        "n_cohort",
        F.round(F.col("n_active") / F.col("n_cohort"), 6).alias("retention"),
    )


# --------------------------------------------------------------------------
# Multi-touch attribution (U-shaped, exact integer credit)
# --------------------------------------------------------------------------
@register(
    "multi_touch_attribution",
    oracle="""
    WITH purch AS (
      SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT user_id, event_id, ts, event_type
      FROM events WHERE event_type != 'purchase'
    ),
    cand AS (
      SELECT p.purchase_id, t.event_id, t.event_type,
             row_number() OVER (PARTITION BY p.purchase_id
                                ORDER BY t.ts, t.event_id) AS pos,
             COUNT(*) OVER (PARTITION BY p.purchase_id) AS n
      FROM purch p
      JOIN touch t ON t.user_id = p.user_id
        AND t.ts <  p.purchase_ts
        AND t.ts >= p.purchase_ts - INTERVAL 1 HOUR
    ),
    credited AS (
      SELECT event_type, purchase_id,
             CASE WHEN n = 1 THEN 1000000
                  WHEN n = 2 THEN 500000
                  WHEN pos = 1 OR pos = n THEN 400000
                  ELSE 200000 // (n - 2) END AS credit_ppm
      FROM cand
    )
    SELECT event_type,
           COUNT(*) AS n_touches,
           CAST(SUM(credit_ppm) AS BIGINT) AS credit_ppm,
           COUNT(DISTINCT purchase_id) AS n_conversions
    FROM credited GROUP BY event_type
    """,
)
def multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-SHAPED multi-touch attribution: every purchase splits credit
    across ALL its touches in the preceding hour — 40% to the first
    touch, 40% to the last, 20% split over the middle (single touch
    gets 100%, a pair 50/50) — complementing ``last_touch_attribution``
    (argmax, one winner). Credit is integer PARTS-PER-MILLION with
    floor division for the middle split: the stated spec is exact
    integer math, so the cross-engine hash pins it with no
    floating-point association-order risk.

    Scale: same interval-join shape as last-touch (shuffle both sides
    on user_id, per-purchase window for position/count — one window
    shuffle serves both row_number and count), then a hash aggregate
    by event_type. At 100 TB add the (user, hour-bucket) coarse
    equi-key to the join."""
    ev = load(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    touch = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("t_user"),
        F.col("event_id"),
        F.col("ts"),
        F.col("event_type"),
    )
    cand = purch.join(
        touch,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("ts") < F.col("purchase_ts"))
        & (F.col("ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")),
    )
    w = Window.partitionBy("purchase_id")
    pos = F.row_number().over(w.orderBy("ts", "event_id"))
    n = F.count("*").over(w)
    credit = (
        F.when(F.col("n") == 1, F.lit(1000000))
        .when(F.col("n") == 2, F.lit(500000))
        .when(
            (F.col("pos") == 1) | (F.col("pos") == F.col("n")), F.lit(400000)
        )
        .otherwise(F.floor(F.lit(200000) / (F.col("n") - 2)))
    )
    return (
        cand.select(
            "purchase_id",
            "event_type",
            pos.alias("pos"),
            n.alias("n"),
        )
        .withColumn("credit_ppm", credit)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_touches"),
            F.sum("credit_ppm").cast("bigint").alias("credit_ppm"),
            F.countDistinct("purchase_id").alias("n_conversions"),
        )
    )


# --------------------------------------------------------------------------
# Approximate-quantile sketch with a self-validating rank contract
# --------------------------------------------------------------------------
QUANTILE_PS = (0.5, 0.9, 0.99)
QUANTILE_ACCURACY = 1000  # percentile_approx: rank error <= n / accuracy


@register(
    "approx_quantile_contract",
    oracle="""
    SELECT 0.5 AS p, ROUND(quantile_cont(value, 0.5), 4) AS exact_p,
           TRUE AS rank_ok
    FROM events
    UNION ALL
    SELECT 0.9, ROUND(quantile_cont(value, 0.9), 4), TRUE FROM events
    UNION ALL
    SELECT 0.99, ROUND(quantile_cont(value, 0.99), 4), TRUE FROM events
    """,
)
def approx_quantile_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles (``percentile_approx`` — Spark's
    KLL/Greenwald-Khanna-family mergeable sketch) under a
    SELF-VALIDATING rank contract, the sketch-family pattern the HLL
    and k-means queries established: the query re-derives the rank
    interval of each sketch answer against the full data and asserts
    it lies within the sketch's published bound (rank error ≤
    n/accuracy, ties handled by checking the [count(<v), count(≤v)]
    interval). The oracle pins the EXACT interpolated quantiles (both
    engines: linear interpolation at p·(n−1)) and expects every
    ``rank_ok`` to be literally TRUE — a sketch regression flips the
    hash.

    Scale: the sketch is mergeable (one partial per partition, O(1/ε)
    state) — the distributed-quantile operator; the verification pass
    is a 3-row broadcast against one conditional aggregate over the
    scan."""
    ev = load(spark, sf_dir, "events")
    ps = list(QUANTILE_PS)
    p_arr = F.array(*[F.lit(p) for p in ps])
    one = ev.agg(
        F.percentile_approx("value", p_arr, F.lit(QUANTILE_ACCURACY)).alias(
            "approx"
        ),
        F.expr(
            f"percentile(value, array({', '.join(str(p) for p in ps)}))"
        ).alias("exact"),
        F.count("*").alias("n"),
    )
    per = one.select(
        F.explode(
            F.arrays_zip(
                p_arr.alias("p"), F.col("approx").alias("a"),
                F.col("exact").alias("e"),
            )
        ).alias("z"),
        "n",
    ).select(
        F.col("z.p").alias("p"),
        F.col("z.a").alias("a"),
        F.col("z.e").alias("e"),
        "n",
    )
    j = ev.select("value").join(F.broadcast(per))
    ranks = j.groupBy("p", "a", "e", "n").agg(
        F.sum((F.col("value") <= F.col("a")).cast("bigint")).alias("rank_le"),
        F.sum((F.col("value") < F.col("a")).cast("bigint")).alias("rank_lt"),
    )
    err = F.col("n") / QUANTILE_ACCURACY + 1
    target = F.col("p") * F.col("n")
    rank_ok = (F.col("rank_le") >= target - err) & (
        F.col("rank_lt") <= target + err
    )
    return ranks.select(
        "p", F.round("e", 4).alias("exact_p"), rank_ok.alias("rank_ok")
    )


# --------------------------------------------------------------------------
# Distribution drift (PSI) between the month's two halves
# --------------------------------------------------------------------------
@register(
    "value_drift_psi",
    oracle="""
    WITH b AS (
      SELECT MAX(value) AS vmax,
             MIN(CAST(ts AS DATE)) AS d0,
             MAX(CAST(ts AS DATE)) AS d1
      FROM events
    ),
    ev AS (
      SELECT event_type,
             CASE WHEN CAST(ts AS DATE) <=
                       d0 + CAST(date_diff('day', d0, d1) // 2 AS INTEGER)
                  THEN 0 ELSE 1 END AS half,
             LEAST(CAST(floor(value * 10 / vmax) AS INTEGER), 9) AS bucket
      FROM events, b
    ),
    c AS (
      SELECT event_type, half, bucket, COUNT(*) AS c
      FROM ev GROUP BY 1, 2, 3
    ),
    n AS (SELECT event_type, half, SUM(c) AS n FROM c GROUP BY 1, 2),
    spine AS (
      SELECT DISTINCT e.event_type, t.bucket
      FROM (SELECT DISTINCT event_type FROM events) e,
           UNNEST(range(10)) AS t(bucket)
    ),
    freq AS (
      SELECT s.event_type, s.bucket,
             (COALESCE(c0.c, 0) + 1.0) / (n0.n + 10.0) AS p,
             (COALESCE(c1.c, 0) + 1.0) / (n1.n + 10.0) AS q
      FROM spine s
      JOIN n n0 ON n0.event_type = s.event_type AND n0.half = 0
      JOIN n n1 ON n1.event_type = s.event_type AND n1.half = 1
      LEFT JOIN c c0 ON c0.event_type = s.event_type
                    AND c0.half = 0 AND c0.bucket = s.bucket
      LEFT JOIN c c1 ON c1.event_type = s.event_type
                    AND c1.half = 1 AND c1.bucket = s.bucket
    )
    SELECT f.event_type,
           CAST(n0.n AS BIGINT) AS n_first,
           CAST(n1.n AS BIGINT) AS n_second,
           ROUND(SUM((p - q) * ln(p / q)), 6) AS psi
    FROM freq f
    JOIN n n0 ON n0.event_type = f.event_type AND n0.half = 0
    JOIN n n1 ON n1.event_type = f.event_type AND n1.half = 1
    GROUP BY 1, 2, 3
    """,
)
def value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTION-DRIFT detection: Population Stability Index of the
    value distribution between the observation window's two halves,
    per event type — the standard ML-monitoring statistic (PSI < 0.1
    stable, > 0.25 drifted) a training pipeline computes between the
    corpus a model was trained on and the corpus it scores. Ten
    equal-width buckets over [0, max], Laplace-smoothed frequencies
    ((c+1)/(n+10), so empty buckets contribute finitely), PSI =
    Σ (p−q)·ln(p/q).

    The bucket SPINE is explicit (types × range(10)): a bucket empty
    in both halves still contributes its smoothed term — dropping
    absent groups would silently understate drift.

    Scale: one pass bucketizes (bounds broadcast), the counts are a
    (type, half, bucket) ≤ |types|·20-group aggregate, and everything
    after operates on that tiny frame. The halves generalize to
    train-corpus vs serve-corpus scans."""
    ev = load(spark, sf_dir, "events")
    b = ev.agg(
        F.max("value").alias("vmax"),
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    mid = F.date_add(
        F.col("d0"), F.floor(F.datediff(F.col("d1"), F.col("d0")) / 2).cast("int")
    )
    bucket = F.least(
        F.floor(F.col("value") * 10 / F.col("vmax")).cast("int"), F.lit(9)
    )
    half = F.when(F.col("ts").cast("date") <= mid, 0).otherwise(1)
    e = ev.join(F.broadcast(b)).select(
        "event_type", half.alias("half"), bucket.alias("bucket")
    )
    c = e.groupBy("event_type", "half", "bucket").agg(F.count("*").alias("c"))
    n = c.groupBy("event_type", "half").agg(F.sum("c").alias("n"))
    spine = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("bucket")
        )
    )
    n0 = n.filter(F.col("half") == 0).select(
        "event_type", F.col("n").alias("n0")
    )
    n1 = n.filter(F.col("half") == 1).select(
        "event_type", F.col("n").alias("n1")
    )
    c0 = c.filter(F.col("half") == 0).select(
        "event_type", "bucket", F.col("c").alias("c0")
    )
    c1 = c.filter(F.col("half") == 1).select(
        "event_type", "bucket", F.col("c").alias("c1")
    )
    freq = (
        spine.join(n0, "event_type")
        .join(n1, "event_type")
        .join(c0, ["event_type", "bucket"], "left")
        .join(c1, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "n0",
            "n1",
            ((F.coalesce(F.col("c0"), F.lit(0)) + 1.0) / (F.col("n0") + 10.0)).alias("p"),
            ((F.coalesce(F.col("c1"), F.lit(0)) + 1.0) / (F.col("n1") + 10.0)).alias("q"),
        )
    )
    return freq.groupBy(
        "event_type",
        F.col("n0").cast("bigint").alias("n_first"),
        F.col("n1").cast("bigint").alias("n_second"),
    ).agg(
        F.round(
            F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))), 6
        ).alias("psi")
    )


# --------------------------------------------------------------------------
# Trailing point-in-time features (the leakage-safe rolling backfill)
# --------------------------------------------------------------------------
@register(
    "trailing_user_features",
    oracle="""
    WITH f AS (
      SELECT event_id, user_id, event_type,
             CAST(COUNT(*) OVER w AS BIGINT) AS n_prior_7d,
             CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,2))) OVER w, 0)
                  AS DOUBLE) AS value_prior_7d
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id AS purchase_id, user_id, n_prior_7d,
           ROUND(value_prior_7d, 2) AS value_prior_7d
    FROM f WHERE event_type = 'purchase'
    """,
)
def trailing_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAILING point-in-time features for every purchase: the user's
    event count and total value over the 7 days STRICTLY BEFORE the
    purchase instant — the rolling-feature backfill a training pipeline
    runs to label conversion events, with the leakage guard built into
    the frame itself: ``RANGE … AND 1 PRECEDING`` excludes the current
    event AND its exact-timestamp peers, so no feature can see its own
    label's moment. Complements ``point_in_time_dimension_join``
    (categorical as-of state) with continuous rolling aggregates.

    Frame bounds are integer epoch-MICROSECONDS on both engines (no
    interval arithmetic, no DST surface); the monetary sum is exact
    DECIMAL inside the frame, cast to double only at the end.

    Scale: one window shuffle on user_id computes features at EVERY
    event in a single pass (frame eviction is O(1) per row); the
    purchase filter then keeps the labeled rows. Backfilling features
    for a year of labels costs one sort per key, not one scan per
    label."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-7 * 86400 * 1_000_000, -1)
    )
    f = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.count("*").over(w).cast("bigint").alias("n_prior_7d"),
        F.coalesce(
            F.sum(F.col("value").cast("decimal(18,2)")).over(w), F.lit(0)
        )
        .cast("double")
        .alias("value_prior_7d"),
    )
    return f.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "n_prior_7d",
        F.round("value_prior_7d", 2).alias("value_prior_7d"),
    )


# --------------------------------------------------------------------------
# Count-Min sketch heavy hitters (distributed sketch, contract-checked)
# --------------------------------------------------------------------------
CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_TOP_K = 20


@register(
    "countmin_heavy_hitters",
    oracle=f"""
    WITH exact AS (
      SELECT user_id, COUNT(*) AS true_count FROM events GROUP BY user_id
    ),
    cells AS (
      SELECT user_id, true_count, i AS row_i,
             CAST('0x' || substr(md5('cms' || CAST(i AS VARCHAR) || '#'
                                  || CAST(user_id AS VARCHAR)), 1, 12)
                  AS BIGINT) % {CMS_WIDTH} AS bucket
      FROM exact, UNNEST(range(0, {CMS_DEPTH})) AS t(i)
    ),
    buckets AS (
      SELECT row_i, bucket, SUM(true_count) AS bucket_count
      FROM cells GROUP BY 1, 2
    ),
    est AS (
      SELECT c.user_id, c.true_count,
             MIN(b.bucket_count) AS cms_estimate
      FROM cells c
      JOIN buckets b ON b.row_i = c.row_i AND b.bucket = c.bucket
      GROUP BY 1, 2
    )
    SELECT user_id, true_count,
           CAST(cms_estimate AS BIGINT) AS cms_estimate,
           CAST(cms_estimate - true_count AS BIGINT) AS overestimate
    FROM est
    ORDER BY true_count DESC, user_id
    LIMIT {CMS_TOP_K}
    """,
)
def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch ({CMS_DEPTH}×{CMS_WIDTH}) heavy hitters over
    ``user_id`` — the streaming-sketch primitive for frequency
    estimation on keyspaces too large to count exactly, here run
    side-by-side with the exact counts so the one-sided error contract
    (estimate ≥ truth, overestimate bounded by colliding mass) is
    directly visible in the result. The sketch rows use the portable
    48-bit md5 hash, so Spark and the oracle build bit-identical
    sketches.

    Scale: one exact hash-aggregate on the key (the same shuffle any
    per-key count pays), then all sketch arithmetic runs on the
    KEY-CARDINALITY relation, not the event stream: explode keys ×
    {CMS_DEPTH} rows, two hash-aggregates over a {CMS_DEPTH}×{CMS_WIDTH}
    cell space, and a distributed top-k (TakeOrderedAndProject). In a
    true streaming deployment the same cell table is the partial state
    that merges associatively across executors."""
    from olap_project_spark.functions.text import portable_hash48

    ev = load(spark, sf_dir, "events")
    exact = ev.groupBy("user_id").agg(F.count("*").alias("true_count"))
    cells = exact.select(
        "user_id",
        "true_count",
        F.explode(
            F.array(*[F.lit(i) for i in range(CMS_DEPTH)])
        ).alias("row_i"),
    ).withColumn(
        "bucket",
        F.pmod(
            portable_hash48(
                F.concat(
                    F.lit("cms"),
                    F.col("row_i").cast("string"),
                    F.lit("#"),
                    F.col("user_id").cast("string"),
                )
            ),
            F.lit(CMS_WIDTH),
        ),
    )
    buckets = cells.groupBy("row_i", "bucket").agg(
        F.sum("true_count").alias("bucket_count")
    )
    est = (
        cells.join(buckets, ["row_i", "bucket"])
        .groupBy("user_id", "true_count")
        .agg(F.min("bucket_count").alias("cms_estimate"))
    )
    return (
        est.orderBy(F.desc("true_count"), F.asc("user_id"))
        .limit(CMS_TOP_K)
        .select(
            "user_id",
            "true_count",
            F.col("cms_estimate").cast("bigint").alias("cms_estimate"),
            (F.col("cms_estimate") - F.col("true_count"))
            .cast("bigint")
            .alias("overestimate"),
        )
    )


# --------------------------------------------------------------------------
# Session path mining — top event-type trigram paths within sessions
# --------------------------------------------------------------------------
PATH_TOP_K = 10


@register(
    "session_path_topk",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN epoch(CAST(ts AS TIMESTAMP)
                        - lag(CAST(ts AS TIMESTAMP))
                          OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id)) >= 1800
                       OR lag(CAST(ts AS TIMESTAMP))
                          OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sess AS (
      SELECT *, SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM seq
    ),
    tri AS (
      SELECT event_type AS t1,
             lead(event_type, 1) OVER (
               PARTITION BY user_id, sess_id
               ORDER BY ts, event_id) AS t2,
             lead(event_type, 2) OVER (
               PARTITION BY user_id, sess_id
               ORDER BY ts, event_id) AS t3
      FROM sess
    )
    SELECT t1 || '>' || t2 || '>' || t3 AS path,
           COUNT(*) AS n_occurrences
    FROM tri
    WHERE t2 IS NOT NULL AND t3 IS NOT NULL
    GROUP BY 1
    ORDER BY n_occurrences DESC, path
    LIMIT {PATH_TOP_K}
    """,
)
def session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream path mining: the {PATH_TOP_K} most frequent
    three-step event-type sequences WITHIN a session (30-minute-gap
    sessionization, same boundary rule as ``user_sessions``) — the
    navigation-pattern query behind funnel discovery, next-action
    models, and UX audits. Sequences never cross a session boundary
    (the lead window is partitioned by session), unlike a naive
    per-user trigram which would stitch Friday's last click to
    Monday's first.

    Scale: two window passes over the SAME (user_id → ts) partitioning
    — Catalyst reuses one sort+shuffle for both (the session-id running
    sum and the lead pair) — then a trigram hash-aggregate on compact
    path strings and a distributed top-k (TakeOrderedAndProject). No
    per-session row explosion, no collect_list of whole sessions."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(F.col("ts").cast("double")).over(w)
    new_session = F.when(
        prev.isNull() | ((F.col("ts").cast("double") - prev) >= 1800), 1
    ).otherwise(0)
    sess_id = F.sum(new_session).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = ev.withColumn("sess_id", sess_id)
    ws = Window.partitionBy("user_id", "sess_id").orderBy("ts", "event_id")
    tri = sess.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(ws).alias("t2"),
        F.lead("event_type", 2).over(ws).alias("t3"),
    ).filter(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    return (
        tri.groupBy(
            F.concat_ws(">", "t1", "t2", "t3").alias("path")
        )
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("path"))
        .limit(PATH_TOP_K)
    )


# --------------------------------------------------------------------------
# KMV sketch set operations (theta-sketch-style union/intersection)
# --------------------------------------------------------------------------
_HASH_SPACE = 2**48


@register(
    "kmv_set_similarity",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type AS t,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12)
                  AS BIGINT) AS hv
      FROM events
    ),
    nd AS (SELECT t, COUNT(*) AS n FROM h GROUP BY t),
    sk AS (
      SELECT t, hv FROM (
        SELECT t, hv, row_number() OVER (PARTITION BY t ORDER BY hv) AS rn
        FROM h
      ) WHERE rn <= {KMV_K}
    ),
    pairs AS (
      SELECT a.t AS ta, b.t AS tb FROM nd a JOIN nd b ON a.t < b.t
    ),
    u AS (
      SELECT DISTINCT p.ta, p.tb, s.hv
      FROM pairs p JOIN sk s ON s.t = p.ta OR s.t = p.tb
    ),
    ur AS (
      SELECT ta, tb, hv,
             row_number() OVER (PARTITION BY ta, tb ORDER BY hv) AS rn,
             COUNT(*) OVER (PARTITION BY ta, tb) AS n_u
      FROM u
    ),
    theta AS (
      SELECT ta, tb, MAX(n_u) AS n_u,
             MAX(CASE WHEN rn = {KMV_K} THEN hv END) AS th
      FROM ur WHERE rn <= {KMV_K} GROUP BY ta, tb
    ),
    common AS (
      SELECT a.t AS ta, b.t AS tb, a.hv
      FROM sk a JOIN sk b ON a.hv = b.hv AND a.t < b.t
    ),
    cb AS (
      SELECT t.ta, t.tb, t.n_u, t.th,
             COUNT(c.hv) FILTER (c.hv <= COALESCE(t.th, {_HASH_SPACE}))
               AS n_common
      FROM theta t LEFT JOIN common c ON c.ta = t.ta AND c.tb = t.tb
      GROUP BY 1, 2, 3, 4
    ),
    ex AS (
      SELECT a.t AS ta, b.t AS tb, COUNT(*) AS n_inter
      FROM h a JOIN h b ON a.hv = b.hv AND a.t < b.t
      GROUP BY 1, 2
    ),
    est AS (
      SELECT cb.ta, cb.tb,
             na.n + nb.n - COALESCE(ex.n_inter, 0) AS exact_union,
             COALESCE(ex.n_inter, 0) AS exact_intersection,
             CASE WHEN cb.n_u >= {KMV_K}
                  THEN CAST({KMV_K - 1} AS DOUBLE)
                       * CAST({_HASH_SPACE} AS DOUBLE) / cb.th
                  ELSE CAST(cb.n_u AS DOUBLE) END AS union_est,
             CAST(cb.n_common AS DOUBLE)
               / LEAST({KMV_K}, cb.n_u) AS jaccard_est
      FROM cb
      JOIN nd na ON na.t = cb.ta
      JOIN nd nb ON nb.t = cb.tb
      LEFT JOIN ex ON ex.ta = cb.ta AND ex.tb = cb.tb
    )
    SELECT ta AS type_a, tb AS type_b,
           CAST(exact_union AS BIGINT) AS exact_union,
           CAST(exact_intersection AS BIGINT) AS exact_intersection,
           ROUND(union_est, 2) AS union_est,
           ROUND(jaccard_est * union_est, 2) AS intersection_est,
           ROUND(jaccard_est, 6) AS jaccard_est
    FROM est
    """,
)
def kmv_set_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch-style SET OPERATIONS on KMV sketches: for every
    pair of event types, estimate the union size, intersection size,
    and Jaccard similarity of their user sets from the two k-minimum-
    value sketches alone — the mergeable-sketch algebra (Dasgupta et
    al., "Theta sketch framework", and the KMV estimator of Bar-Yossef
    et al. 2002) that answers audience-overlap questions without ever
    shuffling the full key sets against each other. Exact counterparts
    sit in the same row, so the sketch error is visible and the result
    stays hash-comparable (the sketch side is fully deterministic
    given the portable md5 hash).

    Union sketch = k smallest of the two sketches' union (threshold
    θ = its k-th value); intersection estimate = (common sketch hashes
    ≤ θ) / k × union estimate; when the union has < k distinct hashes
    every term degrades to exact. Pairs with no overlap report 0.

    Scale: ONE distinct shuffle over (type, 48-bit hash) builds every
    sketch; all pair algebra runs on ≤ k×types rows (a broadcast-sized
    relation) — type-pair enumeration is a nested-loop over the
    aggregated per-type counts, never over data. Exact columns cost
    one equi-self-join of the distinct sets (dropped in a pure-sketch
    deployment)."""
    from olap_project_spark.functions.text import portable_hash48

    ev = load(spark, sf_dir, "events")
    h = ev.select(
        F.col("event_type").alias("t"),
        portable_hash48(F.col("user_id").cast("string")).alias("hv"),
    ).distinct()
    nd = h.groupBy("t").agg(F.count("*").alias("n"))
    w = Window.partitionBy("t").orderBy("hv")
    sk = (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .select("t", "hv")
    )
    pairs = (
        nd.select(F.col("t").alias("ta"))
        .join(nd.select(F.col("t").alias("tb")), F.col("ta") < F.col("tb"))
    )
    u = (
        pairs.join(sk, (sk["t"] == pairs["ta"]) | (sk["t"] == pairs["tb"]))
        .select("ta", "tb", "hv")
        .distinct()
    )
    wp = Window.partitionBy("ta", "tb").orderBy("hv")
    wc = Window.partitionBy("ta", "tb")
    ur = u.select(
        "ta",
        "tb",
        "hv",
        F.row_number().over(wp).alias("rn"),
        F.count("*").over(wc).alias("n_u"),
    ).filter(F.col("rn") <= KMV_K)
    theta = ur.groupBy("ta", "tb").agg(
        F.max("n_u").alias("n_u"),
        F.max(F.when(F.col("rn") == KMV_K, F.col("hv"))).alias("th"),
    )
    ska, skb = sk.alias("ska"), sk.alias("skb")
    common = ska.join(
        skb,
        (F.col("ska.hv") == F.col("skb.hv"))
        & (F.col("ska.t") < F.col("skb.t")),
    ).select(
        F.col("ska.t").alias("ta"), F.col("skb.t").alias("tb"), F.col("ska.hv")
    )
    cb = (
        theta.join(common, ["ta", "tb"], "left")
        .groupBy("ta", "tb", "n_u", "th")
        .agg(
            F.count(
                F.when(
                    F.col("hv") <= F.coalesce(F.col("th"), F.lit(_HASH_SPACE)),
                    F.col("hv"),
                )
            ).alias("n_common")
        )
    )
    ha, hb = h.alias("ha"), h.alias("hb")
    ex = (
        ha.join(
            hb,
            (F.col("ha.hv") == F.col("hb.hv"))
            & (F.col("ha.t") < F.col("hb.t")),
        )
        .groupBy(F.col("ha.t").alias("ta"), F.col("hb.t").alias("tb"))
        .agg(F.count("*").alias("n_inter"))
    )
    na = nd.select(F.col("t").alias("ta"), F.col("n").alias("n_a"))
    nb = nd.select(F.col("t").alias("tb"), F.col("n").alias("n_b"))
    union_est = F.when(
        F.col("n_u") >= KMV_K,
        F.lit(float(KMV_K - 1)) * F.lit(float(_HASH_SPACE)) / F.col("th"),
    ).otherwise(F.col("n_u").cast("double"))
    jac = F.col("n_common").cast("double") / F.least(
        F.lit(KMV_K), F.col("n_u")
    )
    est = (
        cb.join(na, "ta")
        .join(nb, "tb")
        .join(ex, ["ta", "tb"], "left")
        .select(
            "ta",
            "tb",
            (
                F.col("n_a") + F.col("n_b") - F.coalesce("n_inter", F.lit(0))
            ).alias("exact_union"),
            F.coalesce("n_inter", F.lit(0)).alias("exact_intersection"),
            union_est.alias("union_est"),
            jac.alias("jaccard_est"),
        )
    )
    return est.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.col("exact_union").cast("bigint").alias("exact_union"),
        F.col("exact_intersection").cast("bigint").alias("exact_intersection"),
        F.round("union_est", 2).alias("union_est"),
        F.round(F.col("jaccard_est") * F.col("union_est"), 2).alias(
            "intersection_est"
        ),
        F.round("jaccard_est", 6).alias("jaccard_est"),
    )


# --------------------------------------------------------------------------
# AQE skew-join split (§2.5 scale lever — the automatic one)
# --------------------------------------------------------------------------
SKEW_HOT_MOD = 10     # user_id % 10 < 7 → ~70% of rows share one key
SKEW_DIM_N = 50


@register(
    "aqe_skew_join_stats",
    oracle=f"""
    WITH fact AS (
      SELECT CASE WHEN user_id % {SKEW_HOT_MOD} < 7
                  THEN 0 ELSE user_id END AS hkey,
             value
      FROM events
    ),
    dim AS (SELECT range AS hkey, range + 1 AS w FROM range(0, {SKEW_DIM_N}))
    SELECT fact.hkey,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2)) * w) AS DOUBLE), 2)
             AS weighted_value
    FROM fact JOIN dim USING (hkey)
    GROUP BY 1
    """,
)
def aqe_skew_join_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE's AUTOMATIC skew-join split, driven through the gate: a
    fact side with an engineered Zipf-hot key (~70% of events collapse
    onto one key — the driver's testdata is deliberately uniform, so
    the hot key is derived deterministically from user_id) joins a
    small weight dimension, and the adaptive optimizer splits the
    oversized reduce partition at map-block granularity
    (``SortMergeJoin(skew=true)`` + ``AQEShuffleRead skewed``, pinned
    in tests/test_plans.py). This is the no-code-change counterpart of
    the manual salting levers (salted_type_stats): AQE fixes the
    straggler from runtime shuffle statistics.

    The child session only scales the skew thresholds down to the
    replay's data volume (factor 1.2 / 1 KB instead of 5× / 256 MB —
    at warehouse scale the defaults fire on the same shape) and
    repartitions the one-file replay scan so the shuffle has multiple
    map blocks to split by. Result values are byte-identical to the
    unsplit join — splitting is a pure physical rewrite.

    Scale: the hot partition's work is spread over
    ceil(hot_bytes/advisory) tasks instead of one straggler; the dim
    side is duplicated only for the split partition. At 100 TB this —
    or salting — is the difference between a 10-minute and a 10-hour
    stage tail."""
    child = spark.newSession()
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
    }.items():
        child.conf.set(k, v)
    ev = load(child, sf_dir, "events").repartition(16, "event_id")
    hot = F.when(
        F.col("user_id") % SKEW_HOT_MOD < 7, F.lit(0)
    ).otherwise(F.col("user_id"))
    fact = ev.select(hot.alias("hkey"), "value")
    dim = child.range(0, SKEW_DIM_N).select(
        F.col("id").alias("hkey"), (F.col("id") + 1).alias("w")
    )
    return (
        fact.join(dim, "hkey")
        .groupBy("hkey")
        .agg(
            F.count("*").alias("n_events"),
            # exact decimal sum — ~70% of rows land on the hot key, so a
            # double sum would be partition-order-dependent and the 2dp
            # hash compare vs DuckDB could flake (repo convention:
            # cents-exact sums, round only the final double cast)
            F.round(
                F.sum(_dec("value") * F.col("w")).cast("double"), 2
            ).alias("weighted_value"),
        )
    )


# --------------------------------------------------------------------------
# Truncated EWMA smoothing over the daily value series
# --------------------------------------------------------------------------
EWMA_ALPHA = 0.3
EWMA_TERMS = 14
# Python-computed double literals embedded verbatim on BOTH engines, so
# the weights are bit-identical (pow() implementations may differ by an
# ulp across engines; a shared literal cannot).
_EWMA_W = [(1.0 - EWMA_ALPHA) ** k for k in range(EWMA_TERMS)]


def _ewma_oracle() -> str:
    num = " + ".join(
        f"COALESCE(lag(daily_value, {k}) OVER w, 0) * {w!r}"
        for k, w in enumerate(_EWMA_W)
    )
    den = " + ".join(
        f"CASE WHEN lag(daily_value, {k}) OVER w IS NOT NULL"
        f" THEN {w!r} ELSE 0 END"
        for k, w in enumerate(_EWMA_W)
    )
    return f"""
    WITH daily AS (
      SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS daily_value
      FROM events GROUP BY 1
    )
    SELECT day, daily_value,
           ROUND(({num}) / ({den}), 6) AS ewma14
    FROM daily
    WINDOW w AS (ORDER BY day)
    """


@register("ewma_daily_value", oracle=_ewma_oracle)
def ewma_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of the daily event value —
    the smoothing primitive behind trend lines, anomaly baselines, and
    drift monitors. The recursion EWMA_t = α·x_t + (1−α)·EWMA_{t−1} is
    not window-expressible, so this is the standard truncated form: a
    {EWMA_TERMS}-term weighted lag-sum with weights (1−α)^k, normalized
    by the weights actually present (so the series start is unbiased).
    Weights are shared double literals, daily inputs are pre-rounded
    exact decimal sums — the result is bit-stable across engines.

    Scale: the EWMA runs over the DAILY AGGREGATE (one row per day — a
    few thousand rows for a decade), so the unpartitioned ordered
    window is trivially small; the real data only flows through the
    one map-side-combined day rollup. At 100 TB you'd partition the
    window by series key (per-metric, per-region) — same plan, keyed."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.round(F.sum(_dec("value")).cast("double"), 2).alias("daily_value"))
    w = Window.orderBy("day")
    num = sum(
        (
            F.coalesce(F.lag("daily_value", k).over(w), F.lit(0.0))
            * F.lit(wt)
            for k, wt in enumerate(_EWMA_W)
        ),
        F.lit(0.0),
    )
    den = sum(
        (
            F.when(F.lag("daily_value", k).over(w).isNotNull(), F.lit(wt))
            .otherwise(F.lit(0.0))
            for k, wt in enumerate(_EWMA_W)
        ),
        F.lit(0.0),
    )
    return daily.select(
        "day", "daily_value", F.round(num / den, 6).alias("ewma14")
    )


# --------------------------------------------------------------------------
# Running-peak drawdown over the daily value series
# --------------------------------------------------------------------------
@register(
    "value_drawdown_curve",
    oracle="""
    WITH daily AS (
      SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS daily_value
      FROM events GROUP BY 1
    )
    SELECT day, daily_value,
           MAX(daily_value) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS running_peak,
           ROUND(MAX(daily_value) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - daily_value, 2) AS drawdown,
           ROUND((MAX(daily_value) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - daily_value)
             / MAX(daily_value) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS drawdown_frac
    FROM daily
    """,
)
def value_drawdown_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-peak drawdown of the daily value series — the
    peak-to-trough health metric (how far below its historical maximum
    is today?) behind revenue-regression alerts and KPI monitoring.
    One cumulative-max window; inputs are the exact pre-rounded daily
    decimal sums, so every engine computes identical peaks.

    Scale: like the EWMA, the window runs over the DAILY ROLLUP (one
    row per day), not the event stream; the fact table only flows
    through a map-side-combined day aggregate. Keyed per series at
    warehouse scale — same plan with a partition column."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.round(F.sum(_dec("value")).cast("double"), 2).alias("daily_value"))
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    peak = F.max("daily_value").over(w)
    return daily.select(
        "day",
        "daily_value",
        peak.alias("running_peak"),
        F.round(peak - F.col("daily_value"), 2).alias("drawdown"),
        F.round((peak - F.col("daily_value")) / peak, 6).alias(
            "drawdown_frac"
        ),
    )


# --------------------------------------------------------------------------
# Benford first-digit audit (fraud analytics)
# --------------------------------------------------------------------------
@register(
    "benford_digit_audit",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(value) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INTEGER) AS d
      FROM events WHERE value >= 1
    ),
    counts AS (
      SELECT d, COUNT(*) AS n FROM digits GROUP BY d
    ),
    tot AS (SELECT SUM(n) AS total FROM counts)
    SELECT d AS leading_digit,
           CAST(n AS BIGINT) AS n_values,
           ROUND(CAST(n AS DOUBLE) / total, 6) AS observed_freq,
           ROUND(log10(1.0 + 1.0 / d), 6) AS benford_freq,
           ROUND(CAST(n AS DOUBLE) / total - log10(1.0 + 1.0 / d), 6)
             AS deviation
    FROM counts, tot
    """,
)
def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of the transaction values — the
    classic forensic-accounting check the reference's fraud domain
    calls for: organically generated amounts follow
    P(d) = log10(1 + 1/d); fabricated ones usually don't. Reports each
    leading digit's observed frequency against the Benford expectation
    and the deviation (large positive deviation on a digit = that
    digit is over-represented — a manual review trigger). Values < 1
    are excluded (no stable leading digit).

    Scale: leading digit extracted arithmetically (floor → string head
    — constant-time, no regex), ONE 9-group hash aggregate, 1-row
    total broadcast back. Identical plan at any SF."""
    ev = load(spark, sf_dir, "events").filter(F.col("value") >= 1)
    digits = ev.select(
        F.substring(
            F.floor(F.col("value")).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("d")
    )
    counts = digits.groupBy("d").agg(F.count("*").alias("n"))
    tot = counts.agg(F.sum("n").alias("total"))
    benford = F.round(F.log10(1.0 + 1.0 / F.col("d")), 6)
    obs = F.col("n").cast("double") / F.col("total")
    return counts.join(F.broadcast(tot)).select(
        F.col("d").alias("leading_digit"),
        F.col("n").cast("bigint").alias("n_values"),
        F.round(obs, 6).alias("observed_freq"),
        benford.alias("benford_freq"),
        F.round(obs - F.log10(1.0 + 1.0 / F.col("d")), 6).alias("deviation"),
    )


# --------------------------------------------------------------------------
# CUSUM changepoint detection over the daily value series
# --------------------------------------------------------------------------
CUSUM_THRESHOLD_DEN = 4   # alarm when |cusum| > mean/4 (integer form)


@register(
    "cusum_changepoints",
    oracle=f"""
    WITH daily AS (
      SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS daily_c
      FROM events GROUP BY 1
    ),
    m AS (SELECT (SUM(daily_c)
                  - ((SUM(daily_c) % COUNT(*)) + COUNT(*)) % COUNT(*))
                 // COUNT(*) AS mu_c,
                 COUNT(*) AS n_days
          FROM daily),
    c AS (
      SELECT day, daily_c, mu_c,
             CAST(SUM(daily_c - mu_c) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cusum_c
      FROM daily, m
    )
    SELECT day,
           ROUND(daily_c / 100.0, 2) AS daily_value,
           ROUND(cusum_c / 100.0, 2) AS cusum,
           CAST(CASE WHEN {CUSUM_THRESHOLD_DEN} * abs(cusum_c) > mu_c
                     THEN 1 ELSE 0 END AS INTEGER) AS alarm
    FROM c
    """,
)
def cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM (cumulative-sum) changepoint detection on the daily value
    series: the running sum of deviations from the series mean — flat
    while the level is stable, ramping when the underlying mean shifts
    (Page, "Continuous inspection schemes", Biometrika 1954). Days
    where |CUSUM| exceeds mean/{CUSUM_THRESHOLD_DEN} are flagged —
    the level-shift alarm that complements the EWMA's smoothing and
    the drawdown's peak-relative view. All arithmetic runs in integer
    CENTS (exact decimal sums → bigint; floor-divided mean; integer
    cumulative sum) because windowed double summation is NOT
    order-stable across engines (DuckDB's windowed SUM is a segment
    tree) — the integer form is bit-exact by construction.

    Scale: day rollup (map-side combined) → 1-row mean broadcast → one
    cumulative window over the daily spine. Keyed per series at
    warehouse scale."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg((F.sum(_dec("value")) * 100).cast("bigint").alias("daily_c"))
    # Exact integer FLOOR division, shared rule with the oracle: DuckDB
    # '//' truncates toward zero (-7//2 = -3) while Python floors (-4),
    # and bigint/bigint '/' on either engine is double division (loses
    # exactness past 2^53 cents). Subtracting pmod first makes the
    # numerator divisible, so truncating `div` IS floor division and
    # stays in bigint end-to-end.
    m = daily.agg(
        F.sum("daily_c").alias("sum_c"), F.count("*").alias("n_days")
    ).select(
        F.expr("(sum_c - pmod(sum_c, n_days)) div n_days").alias("mu_c"),
        "n_days",
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = daily.join(F.broadcast(m)).withColumn(
        "cusum_c",
        F.sum(F.col("daily_c") - F.col("mu_c")).over(w).cast("bigint"),
    )
    return c.select(
        "day",
        F.round(F.col("daily_c") / 100.0, 2).alias("daily_value"),
        F.round(F.col("cusum_c") / 100.0, 2).alias("cusum"),
        (CUSUM_THRESHOLD_DEN * F.abs(F.col("cusum_c")) > F.col("mu_c"))
        .cast("int")
        .alias("alarm"),
    )


# --------------------------------------------------------------------------
# Poisson-bootstrap confidence interval for the mean value
# --------------------------------------------------------------------------
BOOT_B = 32
# Poisson(1) inverse-CDF thresholds (cumulative e^-1 Σ 1/k!), embedded
# as shared literals so both engines draw identical resample counts.
_POIS_CDF = [0.367879441, 0.735758882, 0.919698603, 0.981011843,
             0.996340153, 0.999405815]
_U_SCALE = float(2**48)


def _boot_w_sql(u: str) -> str:
    cases = " ".join(
        f"WHEN {u} < {c!r} THEN {k}" for k, c in enumerate(_POIS_CDF)
    )
    return f"CASE {cases} ELSE {len(_POIS_CDF)} END"


@register(
    "bootstrap_mean_ci",
    oracle=f"""
    WITH draws AS (
      SELECT b, value,
             {_boot_w_sql(f"CAST('0x' || substr(md5('boot' || CAST(b AS VARCHAR) || '#' || CAST(event_id AS VARCHAR)), 1, 12) AS BIGINT) / {_U_SCALE!r}")}
               AS w
      FROM events, UNNEST(range(0, {BOOT_B})) AS t(b)
    ),
    means AS (
      SELECT b,
             ROUND(CAST(SUM(w * CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   / SUM(w), 6) AS mean_b
      FROM draws GROUP BY b
    ),
    ranked AS (
      SELECT mean_b, row_number() OVER (ORDER BY mean_b, b) AS rn
      FROM means
    ),
    pt AS (
      SELECT COUNT(*) AS n_events,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*), 6) AS point_mean
      FROM events
    )
    SELECT pt.n_events, pt.point_mean,
           MAX(CASE WHEN rn = 2 THEN mean_b END) AS boot_lo,
           ROUND((MAX(CASE WHEN rn = {BOOT_B // 2} THEN mean_b END)
                  + MAX(CASE WHEN rn = {BOOT_B // 2 + 1} THEN mean_b END))
                 / 2, 6) AS boot_median,
           MAX(CASE WHEN rn = {BOOT_B - 1} THEN mean_b END) AS boot_hi
    FROM ranked, pt
    GROUP BY pt.n_events, pt.point_mean
    """,
)
def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap uncertainty for the mean transaction value:
    {BOOT_B} deterministic resamples (each row's multiplicity drawn
    Poisson(1) from its portable hash — the streaming-friendly
    bootstrap of Chamandy et al., "Estimating uncertainty for massive
    data streams", Google 2012), reporting the point estimate with
    rank-based lo/median/hi of the resample means. Every statistic is
    a rank SELECTION from exactly-computed resample means, never a
    float aggregate over them, so the row is bit-stable across
    engines.

    Scale: one pass over events × {BOOT_B} map-side weight draws →
    a {BOOT_B}-group aggregate (each partial is (Σw, Σw·x) — exact
    decimal); the rank step touches {BOOT_B} rows. The {BOOT_B}×
    explode is the textbook cost of the Poisson bootstrap and is
    embarrassingly map-parallel; at 100 TB you fuse the {BOOT_B}
    accumulators into one pass (same aggregate, wider row)."""
    from olap_project_spark.functions.text import portable_hash48

    ev = load(spark, sf_dir, "events")
    draws = ev.select(
        "event_id",
        "value",
        F.explode(F.array(*[F.lit(b) for b in range(BOOT_B)])).alias("b"),
    ).withColumn(
        "u",
        portable_hash48(
            F.concat(
                F.lit("boot"),
                F.col("b").cast("string"),
                F.lit("#"),
                F.col("event_id").cast("string"),
            )
        )
        / F.lit(_U_SCALE),
    )
    w = F.lit(len(_POIS_CDF))
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        w = F.when(F.col("u") < F.lit(_POIS_CDF[k]), F.lit(k)).otherwise(w)
    means = (
        draws.withColumn("w", w)
        .groupBy("b")
        .agg(
            F.round(
                F.sum(F.col("w") * _dec("value")).cast("double")
                / F.sum("w"),
                6,
            ).alias("mean_b")
        )
    )
    wr = Window.orderBy("mean_b", "b")
    ranked = means.withColumn("rn", F.row_number().over(wr))
    pt = ev.agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(_dec("value")).cast("double") / F.count("*"), 6).alias(
            "point_mean"
        ),
    )
    half = BOOT_B // 2
    return (
        ranked.join(F.broadcast(pt))
        .groupBy("n_events", "point_mean")
        .agg(
            F.max(F.when(F.col("rn") == 2, F.col("mean_b"))).alias("boot_lo"),
            F.round(
                (
                    F.max(F.when(F.col("rn") == half, F.col("mean_b")))
                    + F.max(F.when(F.col("rn") == half + 1, F.col("mean_b")))
                )
                / 2,
                6,
            ).alias("boot_median"),
            F.max(F.when(F.col("rn") == BOOT_B - 1, F.col("mean_b"))).alias(
                "boot_hi"
            ),
        )
        .select("n_events", "point_mean", "boot_lo", "boot_median", "boot_hi")
    )


# --------------------------------------------------------------------------
# Lift / gains curve for a score-targeted outcome
# --------------------------------------------------------------------------
LIFT_BIN_WIDTH = 50   # value-score bins [0,50), [50,100), ... capped at 9
LIFT_N_BINS = 10


@register(
    "score_lift_gains",
    oracle=f"""
    WITH scored AS (
      SELECT LEAST({LIFT_N_BINS - 1},
                   CAST(floor(value / {LIFT_BIN_WIDTH}) AS BIGINT)) AS bin,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS hit
      FROM events
    ),
    bins AS (
      SELECT bin, COUNT(*) AS n_events,
             CAST(SUM(hit) AS BIGINT) AS n_hits
      FROM scored GROUP BY bin
    ),
    tot AS (
      SELECT SUM(n_events) AS total_n, SUM(n_hits) AS total_hits FROM bins
    )
    SELECT CAST(bin AS INTEGER) AS bin,
           n_events, n_hits,
           ROUND(CAST(n_hits AS DOUBLE) / n_events, 6) AS hit_rate,
           ROUND((CAST(n_hits AS DOUBLE) / n_events)
                 / (CAST(total_hits AS DOUBLE) / total_n), 6) AS lift,
           ROUND(CAST(SUM(n_hits) OVER (ORDER BY bin DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE) / total_hits, 6) AS cum_capture,
           ROUND(CAST(SUM(n_events) OVER (ORDER BY bin DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE) / total_n, 6) AS cum_population
    FROM bins, tot
    """,
)
def score_lift_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lift / gains analysis of a risk score against an outcome — the
    model-evaluation table behind "target the top decile" decisions:
    events bucketed by score band (value / {LIFT_BIN_WIDTH}, capped at
    {LIFT_N_BINS} bins), each band's outcome (error) rate, its lift
    over the base rate, and the cumulative capture/population shares
    scanning from the highest band down (the gains curve — capture
    ≫ population in the top bands means the score ranks well). All
    ratios divide exact integer counts; the cumulative sums are
    integer window sums over the {LIFT_N_BINS}-row bin table.

    Scale: one map-side-combined aggregate to the bin table, a 1-row
    total broadcast, and a {LIFT_N_BINS}-row cumulative window —
    nothing after the first aggregate scales with SF."""
    ev = load(spark, sf_dir, "events")
    scored = ev.select(
        F.least(
            F.lit(LIFT_N_BINS - 1),
            F.floor(F.col("value") / LIFT_BIN_WIDTH).cast("bigint"),
        ).alias("bin"),
        (F.col("event_type") == "error").cast("int").alias("hit"),
    )
    bins = scored.groupBy("bin").agg(
        F.count("*").alias("n_events"),
        F.sum("hit").cast("bigint").alias("n_hits"),
    )
    tot = bins.agg(
        F.sum("n_events").alias("total_n"), F.sum("n_hits").alias("total_hits")
    )
    w = Window.orderBy(F.desc("bin")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rate = F.col("n_hits").cast("double") / F.col("n_events")
    base = F.col("total_hits").cast("double") / F.col("total_n")
    return bins.join(F.broadcast(tot)).select(
        F.col("bin").cast("int").alias("bin"),
        "n_events",
        "n_hits",
        F.round(rate, 6).alias("hit_rate"),
        F.round(rate / base, 6).alias("lift"),
        F.round(
            F.sum("n_hits").over(w).cast("double") / F.col("total_hits"), 6
        ).alias("cum_capture"),
        F.round(
            F.sum("n_events").over(w).cast("double") / F.col("total_n"), 6
        ).alias("cum_population"),
    )


# --------------------------------------------------------------------------
# Conversion-latency distribution (first signup → first purchase)
# --------------------------------------------------------------------------
LATENCY_QS = [0.25, 0.5, 0.75, 0.9]


@register(
    "conversion_latency_quantiles",
    oracle=f"""
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup'
                      THEN CAST(ts AS TIMESTAMP) END) AS first_signup,
             min(CASE WHEN event_type = 'purchase'
                      THEN CAST(ts AS TIMESTAMP) END) AS first_purchase
      FROM events GROUP BY user_id
    ),
    lat AS (
      SELECT CAST(floor(epoch(first_purchase - first_signup)) AS BIGINT)
               AS lat_s
      FROM firsts
      WHERE first_signup IS NOT NULL
        AND first_purchase IS NOT NULL
        AND first_purchase >= first_signup
    )
    SELECT COUNT(*) AS n_converted,
           CAST(MIN(lat_s) AS BIGINT) AS min_s,
           {", ".join(f'''ROUND(quantile_cont(lat_s, {q}), 4)
             AS p{int(q * 100)}_s''' for q in LATENCY_QS)},
           CAST(MAX(lat_s) AS BIGINT) AS max_s
    FROM lat
    """,
)
def conversion_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: exact latency quantiles (p25/p50/
    p75/p90, linear interpolation) from each user's FIRST signup to
    their FIRST subsequent purchase — the funnel-velocity readout that
    turns signup_purchase_funnel's "how many converted" into "how
    fast". Latencies are integer seconds, and Spark's exact
    ``percentile`` and DuckDB's ``quantile_cont`` share the same
    linear-interpolation definition, so the row hash-matches.

    Scale: one conditional-min aggregate per user (map-side combined),
    then an exact percentile over ONE latency value per converted user
    — at 100 TB swap in percentile_approx and the contract becomes a
    tolerance row (see approx_quantile_contract); the exact form here
    is the oracle-grade anchor."""
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.col("ts"))
        ).alias("first_signup"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("first_purchase"),
    )
    lat = firsts.filter(
        F.col("first_signup").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_signup"))
    ).select(
        F.floor(
            F.col("first_purchase").cast("double")
            - F.col("first_signup").cast("double")
        )
        .cast("bigint")
        .alias("lat_s")
    )
    agg = [
        F.count("*").alias("n_converted"),
        F.min("lat_s").cast("bigint").alias("min_s"),
    ]
    for q in LATENCY_QS:
        agg.append(
            F.round(F.percentile("lat_s", F.lit(q)), 4).alias(
                f"p{int(q * 100)}_s"
            )
        )
    agg.append(F.max("lat_s").cast("bigint").alias("max_s"))
    return lat.agg(*agg)


# --------------------------------------------------------------------------
# Sweep-line interval concurrency (peak simultaneous sessions per day)
# --------------------------------------------------------------------------
@register(
    "concurrent_session_peaks",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t,
             lag(CAST(ts AS TIMESTAMP))
               OVER (PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
      FROM events
    ),
    flag AS (
      SELECT user_id, event_id, t,
             CASE WHEN prev IS NULL OR epoch(t - prev) >= 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM seq
    ),
    sid AS (
      SELECT user_id, t,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY t, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM flag
    ),
    sess AS (
      SELECT user_id, sid, MIN(t) AS s_start, MAX(t) AS s_end
      FROM sid GROUP BY 1, 2
    ),
    b AS (
      SELECT strftime(s_start, '%Y-%m-%d') AS day, s_start AS t,
             1 AS ds, 0 AS de FROM sess
      UNION ALL
      SELECT strftime(s_start, '%Y-%m-%d'), s_end, 0, 1 FROM sess
    ),
    per_t AS (SELECT day, t, SUM(ds) AS s, SUM(de) AS e
              FROM b GROUP BY 1, 2),
    cum AS (
      SELECT day, e,
             SUM(s - e) OVER (PARTITION BY day ORDER BY t
                              ROWS UNBOUNDED PRECEDING) AS c
      FROM per_t
    ),
    n AS (SELECT strftime(s_start, '%Y-%m-%d') AS day,
                 CAST(COUNT(*) AS BIGINT) AS n_sessions FROM sess GROUP BY 1)
    SELECT cum.day, MAX(n.n_sessions) AS n_sessions,
           CAST(MAX(c + e) AS BIGINT) AS peak_concurrent
    FROM cum JOIN n ON n.day = cum.day
    GROUP BY 1 ORDER BY 1
    """,
)
def concurrent_session_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak simultaneous sessions per day — the interval-algebra
    operator (sweep-line concurrency) behind capacity planning and
    concurrency SLAs: sessionize (the ``user_sessions`` 30-minute-gap
    rule), turn each session [start, end] into +1/−1 boundary events,
    and take the daily running-sum maximum. Touching endpoints count
    as concurrent: boundaries aggregate per instant and the peak at t
    is cum(t) + ends(t), i.e. starts at t are counted before ends at
    t — the closed-interval sweep convention, with no reliance on
    tie-ordering inside a window frame (each (day, t) key is unique
    before the cumulative pass, the determinism requirement for a
    ROWS frame).

    Sessions are keyed to their START day (a session crossing
    midnight counts toward the day it began — documented, identical
    on both engines).

    Scale: sessionization and the session rollup are per-user
    windows/aggregates; the sweep is an integer prefix sum
    PARTITIONED by day over per-instant aggregated boundaries
    (|distinct timestamps| rows per day, exact bigint arithmetic).
    For a day too large for one task, the two-pass range-partitioned
    prefix-sum machinery (functions/scale.py) applies within the day;
    the per-day partitioning already bounds the frame here."""
    ev = load(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(F.col("ts").cast("double")).over(wu)
    new_session = F.when(
        prev.isNull() | ((F.col("ts").cast("double") - prev) >= 1800), 1
    ).otherwise(0)
    sid = ev.withColumn("new_session", new_session).withColumn(
        "sid",
        F.sum("new_session").over(
            wu.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    sess = sid.groupBy("user_id", "sid").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    day = F.date_format("s_start", "yyyy-MM-dd").alias("day")
    b = sess.select(
        day, F.col("s_start").alias("t"), F.lit(1).alias("ds"),
        F.lit(0).alias("de"),
    ).unionByName(
        sess.select(
            day, F.col("s_end").alias("t"), F.lit(0).alias("ds"),
            F.lit(1).alias("de"),
        )
    )
    per_t = b.groupBy("day", "t").agg(
        F.sum("ds").alias("s"), F.sum("de").alias("e")
    )
    wd = (
        Window.partitionBy("day")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = per_t.withColumn("c", F.sum(F.col("s") - F.col("e")).over(wd))
    n = sess.groupBy(day).agg(
        F.count("*").cast("bigint").alias("n_sessions")
    )
    return (
        cum.groupBy("day")
        .agg(
            F.max(F.col("c") + F.col("e")).cast("bigint").alias(
                "peak_concurrent"
            )
        )
        .join(n, "day")
        .select("day", "n_sessions", "peak_concurrent")
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Kaplan-Meier churn survival curve (right-censored)
# --------------------------------------------------------------------------
@register(
    "km_churn_survival",
    oracle="""
    WITH ud AS (
      SELECT user_id,
             CAST(MIN(CAST(ts AS TIMESTAMP)) AS DATE) AS first_d,
             CAST(MAX(CAST(ts AS TIMESTAMP)) AS DATE) AS last_d
      FROM events GROUP BY user_id
    ),
    mx AS (SELECT MAX(last_d) AS max_d FROM ud),
    life AS (
      SELECT user_id, date_diff('day', first_d, last_d) AS t,
             CASE WHEN last_d < max_d THEN 1 ELSE 0 END AS churned
      FROM ud CROSS JOIN mx
    ),
    tl AS (
      SELECT t, CAST(SUM(churned) AS BIGINT) AS d,
             CAST(SUM(1 - churned) AS BIGINT) AS c,
             CAST(COUNT(*) AS BIGINT) AS ended
      FROM life GROUP BY t
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM life),
    cum AS (
      SELECT t, d, c,
             CAST(n_users - COALESCE(SUM(ended) OVER (ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n_risk
      FROM tl CROSS JOIN tot
    ),
    lt AS (
      SELECT t, d, c, n_risk,
             CASE WHEN d = n_risk THEN NULL
                  ELSE CAST(ROUND(ln(1 - CAST(d AS DOUBLE) / n_risk)
                                  * 1000000000) AS BIGINT) END AS lnf,
             CASE WHEN d = n_risk THEN 1 ELSE 0 END AS zero_f
      FROM cum
    ),
    km AS (
      SELECT t, d, c, n_risk,
             SUM(lnf) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS lsum,
             SUM(zero_f) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS zsum
      FROM lt
    )
    SELECT t AS t_days, n_risk AS n_at_risk, d AS n_churned,
           c AS n_censored,
           CASE WHEN zsum > 0 THEN 0.0
                ELSE ROUND(exp(CAST(lsum AS DOUBLE) / 1000000000), 6)
           END AS survival
    FROM km ORDER BY t_days
    """,
)
def km_churn_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve over user lifetime (days between a
    user's first and last event), with RIGHT-CENSORING: users still
    active on the corpus's final day haven't churned — they exit the
    risk set without counting as an event, exactly what naive "days
    until last event" retention gets wrong. S(t) = Π_{i≤t}
    (1 − dᵢ/nᵢ) over event times — the standard churn/retention
    estimator (Kaplan & Meier 1958).

    Determinism: the product runs as a cumulative sum of per-time
    ln(1 − d/n) factors rounded once to integer nano-nats (exact
    bigint window sum, the repo's fixed-point convention), exp'd and
    rounded once at the end; a d = n time (everyone at risk churns)
    zeroes the curve via an integer flag, not via ln(0).

    Scale: per-user lifetimes are one hash aggregate; the curve
    itself lives on the LIFETIME-DAYS spine (bounded by the calendar
    range — a decade is a few thousand rows), so the unpartitioned
    cumulative windows run over an aggregated frame, never an entity
    dimension (GLOBAL_WINDOW_OK class; at scale the window gains a
    cohort/series key partition, same plan keyed)."""
    ev = load(spark, sf_dir, "events")
    ud = ev.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("first_d"),
        F.to_date(F.max("ts")).alias("last_d"),
    )
    mx = ud.agg(F.max("last_d").alias("max_d"))
    life = ud.join(F.broadcast(mx)).select(
        F.datediff("last_d", "first_d").alias("t"),
        F.when(F.col("last_d") < F.col("max_d"), 1).otherwise(0).alias(
            "churned"
        ),
    )
    tl = life.groupBy("t").agg(
        F.sum("churned").cast("bigint").alias("d"),
        F.sum(1 - F.col("churned")).cast("bigint").alias("c"),
        F.count("*").cast("bigint").alias("ended"),
    )
    tot = life.agg(F.count("*").cast("bigint").alias("n_users"))
    w_prev = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = (
        tl.join(F.broadcast(tot))
        .withColumn(
            "n_risk",
            (
                F.col("n_users")
                - F.coalesce(F.sum("ended").over(w_prev), F.lit(0))
            ).cast("bigint"),
        )
    )
    at_cap = F.col("d") == F.col("n_risk")
    lnf = F.when(at_cap, F.lit(None).cast("bigint")).otherwise(
        F.round(
            F.log(1 - F.col("d").cast("double") / F.col("n_risk"))
            * 1_000_000_000
        ).cast("bigint")
    )
    zero_f = F.when(at_cap, 1).otherwise(0)
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    km = cum.select(
        "t", "d", "c", "n_risk", lnf.alias("lnf"), zero_f.alias("zero_f")
    ).select(
        "t",
        "d",
        "c",
        "n_risk",
        F.sum("lnf").over(w_cum).alias("lsum"),
        F.sum("zero_f").over(w_cum).alias("zsum"),
    )
    survival = F.when(F.col("zsum") > 0, F.lit(0.0)).otherwise(
        F.round(F.exp(F.col("lsum").cast("double") / 1_000_000_000), 6)
    )
    return km.select(
        F.col("t").alias("t_days"),
        F.col("n_risk").alias("n_at_risk"),
        F.col("d").alias("n_churned"),
        F.col("c").alias("n_censored"),
        survival.alias("survival"),
    ).orderBy("t_days")


# --------------------------------------------------------------------------
# CUPED variance-reduced A/B metrics
# --------------------------------------------------------------------------
@register(
    "cuped_adjusted_metrics",
    oracle="""
    WITH bounds AS (
      SELECT CAST(MIN(CAST(ts AS TIMESTAMP)) AS DATE) AS min_d,
             CAST(MAX(CAST(ts AS TIMESTAMP)) AS DATE) AS max_d
      FROM events
    ),
    mid AS (SELECT min_d + CAST((date_diff('day', min_d, max_d) + 1) // 2
                                AS INTEGER) AS mid_d FROM bounds),
    pu AS (
      SELECT CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                           1, 12) AS BIGINT) % 2 = 0
                  THEN 'A' ELSE 'B' END AS bucket,
             user_id,
             SUM(CASE WHEN CAST(CAST(ts AS TIMESTAMP) AS DATE) < mid_d
                      THEN CAST(value AS DECIMAL(18,2))
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS x,
             SUM(CASE WHEN CAST(CAST(ts AS TIMESTAMP) AS DATE) >= mid_d
                      THEN CAST(value AS DECIMAL(18,2))
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS y
      FROM events CROSS JOIN mid
      GROUP BY 1, 2
    ),
    pool AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS nd,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(y * y) AS DOUBLE) AS syy
      FROM pu
    ),
    th AS (
      SELECT nd, sx,
             ((nd * sxy) - (sx * sy)) / ((nd * sxx) - (sx * sx)) AS theta,
             ((nd * sxy) - (sx * sy)) * ((nd * sxy) - (sx * sy))
               / (((nd * sxx) - (sx * sx)) * ((nd * syy) - (sy * sy)))
               AS r2
      FROM pool
    ),
    arm AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(x) AS DOUBLE) AS sxa, CAST(SUM(y) AS DOUBLE) AS sya
      FROM pu GROUP BY 1
    )
    SELECT bucket, n_users,
           ROUND(sya / n_users, 6) AS mean_post,
           ROUND(sya / n_users - theta * (sxa / n_users - sx / nd), 6)
             AS mean_adjusted,
           ROUND(theta, 6) AS theta,
           ROUND(r2, 6) AS cuped_r2
    FROM arm CROSS JOIN th
    ORDER BY bucket
    """,
)
def cuped_adjusted_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for the A/B experiment (Deng et al.,
    WSDM 2013 — the industry-standard estimator): split the calendar
    range at its midpoint, use each user's PRE-period spend as the
    covariate x for their post-period metric y, and report per-arm
    adjusted means ŷ_arm − θ·(x̄_arm − x̄) with the pooled
    θ = cov(x,y)/var(x). ``cuped_r2`` is the squared correlation —
    the fraction of metric variance the adjustment removes (the
    sensitivity gain a real experiment would bank; ~0 on this
    synthetic corpus because pre/post spends are independent, which
    the contract reports honestly).

    Determinism: all moments are EXACT decimal sums per the OLS
    convention (price_quantity_regression); doubles appear only
    after the aggregate, in expression trees written identically on
    both engines; arm assignment is the portable 48-bit md5 bucket
    of ab_bucket_metrics.

    Scale: one per-user aggregate (hash shuffle), one 1-row pooled
    moment frame and one |arms|-row frame joined by broadcast — the
    covariate adjustment costs one extra scan-side conditional sum
    over the same shuffle."""
    from olap_project_spark.functions.text import portable_hash48

    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.to_date(F.min("ts")).alias("min_d"),
        F.to_date(F.max("ts")).alias("max_d"),
    )
    mid = bounds.select(
        F.date_add(
            "min_d",
            F.expr("CAST((datediff(max_d, min_d) + 1) div 2 AS INT)"),
        ).alias("mid_d")
    )
    bucket = F.when(
        portable_hash48(F.col("user_id").cast("string")) % 2 == 0, "A"
    ).otherwise("B")
    zero = F.lit(0).cast("decimal(18,2)")
    pu = (
        ev.join(F.broadcast(mid))
        .select(
            bucket.alias("bucket"),
            "user_id",
            F.when(F.to_date("ts") < F.col("mid_d"), _dec("value"))
            .otherwise(zero)
            .alias("xv"),
            F.when(F.to_date("ts") >= F.col("mid_d"), _dec("value"))
            .otherwise(zero)
            .alias("yv"),
        )
        .groupBy("bucket", "user_id")
        .agg(F.sum("xv").alias("x"), F.sum("yv").alias("y"))
    )
    pool = pu.agg(
        F.count("*").cast("double").alias("nd"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    num = (F.col("nd") * F.col("sxy")) - (F.col("sx") * F.col("sy"))
    den_x = (F.col("nd") * F.col("sxx")) - (F.col("sx") * F.col("sx"))
    den_y = (F.col("nd") * F.col("syy")) - (F.col("sy") * F.col("sy"))
    th = pool.select(
        "nd",
        "sx",
        (num / den_x).alias("theta"),
        (num * num / (den_x * den_y)).alias("r2"),
    )
    arm = pu.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("x").cast("double").alias("sxa"),
        F.sum("y").cast("double").alias("sya"),
    )
    mean_post = F.col("sya") / F.col("n_users")
    mean_adj = mean_post - F.col("theta") * (
        F.col("sxa") / F.col("n_users") - F.col("sx") / F.col("nd")
    )
    return (
        arm.join(F.broadcast(th))
        .select(
            "bucket",
            "n_users",
            F.round(mean_post, 6).alias("mean_post"),
            F.round(mean_adj, 6).alias("mean_adjusted"),
            F.round(F.col("theta"), 6).alias("theta"),
            F.round(F.col("r2"), 6).alias("cuped_r2"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# Mann-Whitney U rank test (scale-safe global ordering)
# --------------------------------------------------------------------------
@register(
    "mann_whitney_ab_test",
    oracle="""
    WITH pu AS (
      SELECT CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                           1, 12) AS BIGINT) % 2 = 0
                  THEN 'A' ELSE 'B' END AS bucket,
             user_id, SUM(CAST(value AS DECIMAL(18,2))) AS y
      FROM events GROUP BY 1, 2
    ),
    vc AS (
      SELECT y,
             CAST(SUM(CASE WHEN bucket = 'A' THEN 1 ELSE 0 END) AS BIGINT)
               AS a_v,
             CAST(SUM(CASE WHEN bucket = 'B' THEN 1 ELSE 0 END) AS BIGINT)
               AS b_v,
             CAST(COUNT(*) AS BIGINT) AS t
      FROM pu GROUP BY y
    ),
    cum AS (
      SELECT a_v, b_v, t,
             SUM(b_v) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING) AS cum_b
      FROM vc
    ),
    s AS (
      SELECT CAST(SUM(a_v * (2 * (cum_b - b_v) + b_v)) AS BIGINT) AS u2,
             CAST(SUM(t * t * t - t) AS BIGINT) AS tie3,
             CAST(SUM(CASE WHEN t > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_tied
      FROM cum
    ),
    tot AS (
      SELECT CAST(SUM(CASE WHEN bucket = 'A' THEN 1 ELSE 0 END) AS BIGINT)
               AS na,
             CAST(SUM(CASE WHEN bucket = 'B' THEN 1 ELSE 0 END) AS BIGINT)
               AS nb,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM pu
    )
    SELECT na AS n_a, nb AS n_b,
           CAST(u2 AS DOUBLE) / 2 AS u_a,
           ROUND((CAST(u2 AS DOUBLE) - CAST(na AS DOUBLE) * nb)
                 / (2 * sqrt(CAST(na AS DOUBLE) * nb / 12
                    * ((CAST(n AS DOUBLE) + 1)
                       - CAST(tie3 AS DOUBLE)
                         / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))))),
                 6) AS z_score,
           ROUND(1 - CAST(u2 AS DOUBLE) / (CAST(na AS DOUBLE) * nb), 6)
             AS rank_biserial,
           n_tied AS n_tied_values
    FROM s CROSS JOIN tot
    """,
)
def mann_whitney_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U test between the A/B arms' per-user spend — the
    NONPARAMETRIC significance test (rank-based, outlier-robust) that
    pairs with cuped_adjusted_metrics' mean-based estimate; reports
    the U statistic, normal-approximation z with the standard tie
    correction, and the rank-biserial effect size.

    U is computed WITHOUT materializing pairwise comparisons or a
    global per-row rank: per distinct metric value v, U_A gains
    a_v·(B_below(v) + b_v/2) — so the heavy frame is the distinct-
    value spine, and B_below is an exact-integer prefix sum computed
    by functions/scale.global_order_stats (range-partitioned two-pass
    — no single-task sort; the 2× scaling keeps the half-tie term in
    exact bigints). This is the scale-safe rank-test plan: two hash
    aggregates, one range exchange, one 1-row join.

    Determinism: U, tie mass Σ(t³−t), and all counts are exact
    bigints; z and the effect size are double expression trees
    written identically on both engines, rounded once."""
    from olap_project_spark.functions.scale import global_order_stats
    from olap_project_spark.functions.text import portable_hash48

    ev = load(spark, sf_dir, "events")
    bucket = F.when(
        portable_hash48(F.col("user_id").cast("string")) % 2 == 0, "A"
    ).otherwise("B")
    pu = (
        ev.select(bucket.alias("bucket"), "user_id", _dec("value").alias("v"))
        .groupBy("bucket", "user_id")
        .agg(F.sum("v").alias("y"))
    )
    is_a = (F.col("bucket") == "A").cast("bigint")
    vc = pu.groupBy("y").agg(
        F.sum(is_a).cast("bigint").alias("a_v"),
        F.sum(1 - is_a).cast("bigint").alias("b_v"),
        F.count("*").cast("bigint").alias("t"),
    )
    cum = global_order_stats(
        vc, order_by=[F.col("y")], sum_cols={"cum_b": "b_v"}
    )
    s = cum.agg(
        F.sum(
            F.col("a_v")
            * (2 * (F.col("cum_b") - F.col("b_v")) + F.col("b_v"))
        )
        .cast("bigint")
        .alias("u2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tie3"),
        F.sum((F.col("t") > 1).cast("bigint"))
        .cast("bigint")
        .alias("n_tied"),
    )
    tot = pu.agg(
        F.sum(is_a).cast("bigint").alias("na"),
        F.sum(1 - is_a).cast("bigint").alias("nb"),
        F.count("*").cast("bigint").alias("n"),
    )
    u2d = F.col("u2").cast("double")
    nad = F.col("na").cast("double")
    nbd = F.col("nb").cast("double")
    nd = F.col("n").cast("double")
    z = (u2d - nad * nbd) / (
        2
        * F.sqrt(
            nad
            * nbd
            / 12
            * (
                (nd + 1)
                - F.col("tie3").cast("double") / (nd * (nd - 1))
            )
        )
    )
    return s.join(F.broadcast(tot)).select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        (u2d / 2).alias("u_a"),
        F.round(z, 6).alias("z_score"),
        F.round(1 - u2d / (nad * nbd), 6).alias("rank_biserial"),
        F.col("n_tied").alias("n_tied_values"),
    )


# --------------------------------------------------------------------------
# Chi-squared independence test (event_type x day-of-week)
# --------------------------------------------------------------------------
@register(
    "chi2_type_dow_independence",
    oracle="""
    WITH obs AS (
      SELECT event_type,
             CAST(dayofweek(CAST(ts AS TIMESTAMP)) AS INTEGER) AS dow,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS r
           FROM obs GROUP BY 1),
    ct AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY 1),
    n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
    cells AS (
      SELECT obs.event_type, obs.dow, o, r, c, n.n,
             CAST(r AS DOUBLE) * c / n.n AS expected
      FROM obs JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN n
    ),
    terms AS (
      SELECT event_type, dow, n,
             CAST(ROUND((o - expected) * (o - expected) / expected
                        * 1000000000) AS BIGINT) AS t_nano
      FROM cells
    ),
    chi AS (
      SELECT MAX(n) AS n,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT dow) AS BIGINT) AS n_cols,
             CAST(SUM(t_nano) AS BIGINT) AS chi2_nano
      FROM terms
    )
    SELECT n AS n_events, n_rows AS n_types, n_cols AS n_dows,
           CAST((n_rows - 1) * (n_cols - 1) AS BIGINT) AS dof,
           ROUND(CAST(chi2_nano AS DOUBLE) / 1000000000, 6) AS chi2,
           ROUND(sqrt((CAST(chi2_nano AS DOUBLE) / 1000000000)
                      / (n * LEAST(n_rows - 1, n_cols - 1))), 6)
             AS cramers_v
    FROM chi
    """,
)
def chi2_type_dow_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-squared test of independence between event type and
    day-of-week, with Cramér's V effect size — the categorical
    association audit (is behavior mix calendar-dependent?) that
    complements the rank/mean tests (mann_whitney_ab_test,
    cuped_adjusted_metrics) on the categorical axis.

    Determinism: observed and marginal counts are exact bigints;
    expected = r·c/n is one double expression per cell; per-cell χ²
    terms round once to nano units and sum as exact bigints (the
    contingency table is |types|x7 — bounded), so the statistic is
    partitioning-independent. sqrt is IEEE-exact.

    Scale: one contingency hash aggregate over the fact (map-side
    combined), two marginal rollups of the |cells| frame, a 1-row
    total — no windows, no skew."""
    ev = load(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", F.dayofweek("ts").cast("int").alias("dow")
    ).agg(F.count("*").cast("bigint").alias("o"))
    rt = obs.groupBy("event_type").agg(
        F.sum("o").cast("bigint").alias("r")
    )
    ct = obs.groupBy("dow").agg(F.sum("o").cast("bigint").alias("c"))
    n = obs.agg(F.sum("o").cast("bigint").alias("n"))
    expected = F.col("r").cast("double") * F.col("c") / F.col("n")
    cells = (
        obs.join(rt, "event_type").join(ct, "dow").join(F.broadcast(n))
    )
    terms = cells.select(
        "event_type",
        "dow",
        "n",
        F.round(
            (F.col("o") - expected) * (F.col("o") - expected) / expected
            * 1_000_000_000
        )
        .cast("bigint")
        .alias("t_nano"),
    )
    chi = terms.agg(
        F.max("n").alias("n"),
        F.count_distinct("event_type").cast("bigint").alias("n_rows"),
        F.count_distinct("dow").cast("bigint").alias("n_cols"),
        F.sum("t_nano").cast("bigint").alias("chi2_nano"),
    )
    chi2 = F.col("chi2_nano").cast("double") / 1_000_000_000
    return chi.select(
        F.col("n").alias("n_events"),
        F.col("n_rows").alias("n_types"),
        F.col("n_cols").alias("n_dows"),
        ((F.col("n_rows") - 1) * (F.col("n_cols") - 1))
        .cast("bigint")
        .alias("dof"),
        F.round(chi2, 6).alias("chi2"),
        F.round(
            F.sqrt(
                chi2
                / (
                    F.col("n")
                    * F.least(F.col("n_rows") - 1, F.col("n_cols") - 1)
                )
            ),
            6,
        ).alias("cramers_v"),
    )


# --------------------------------------------------------------------------
# Time-weighted average value (TWAP) — the step-function integral
# --------------------------------------------------------------------------
@register(
    "time_weighted_user_value",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             lead(epoch_us(CAST(ts AS TIMESTAMP)))
               OVER (PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_us
      FROM events
    ),
    g AS (
      SELECT user_id, cents, (next_us - us) // 1000 AS dur_ms
      FROM seq
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(dur_ms) AS BIGINT) AS active_ms,
           ROUND(CAST(SUM(cents * dur_ms) AS DOUBLE) / SUM(dur_ms) / 100, 6)
             AS twap_value
    FROM g
    GROUP BY user_id
    HAVING COUNT(*) >= 2 AND SUM(dur_ms) > 0
    """,
)
def time_weighted_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP) — the step-function
    integral under irregular sampling that a plain AVG gets wrong: each
    event's value holds until the user's next event, so the mean is
    Σ value·Δt / ΣΔt, not Σ value / n. The financial/IoT shape (TWAP,
    sensor duty cycle, time-in-state) the engine must express exactly.

    Exactness across engines: value in integer cents, durations in
    truncated integer milliseconds (identical positive-integer DIV on
    both engines), so both sums are exact int64 and the one quotient is
    computed once on identical operands. The last event carries no
    duration (open interval); single-event and zero-span users are
    excluded by integer HAVING predicates.

    Scale: one per-user window pass (lead) + one hash aggregate — the
    same two shuffles sessionization pays; int64 products stay well
    under overflow (cents ≤ 5·10⁴ × user-span ms)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    seq = ev.select(
        "user_id",
        (_dec("value") * 100).cast("bigint").alias("cents"),
        us.alias("us"),
        F.lead(us).over(w).alias("next_us"),
    ).withColumn("dur_ms", F.expr("(next_us - us) DIV 1000"))
    return (
        seq.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("dur_ms").cast("bigint").alias("active_ms"),
            F.round(
                F.sum(F.col("cents") * F.col("dur_ms")).cast("double")
                / F.sum("dur_ms")
                / 100,
                6,
            ).alias("twap_value"),
        )
        .filter((F.col("n_events") >= 2) & (F.col("active_ms") > 0))
    )


# --------------------------------------------------------------------------
# Segment-overlap (audience intersection) matrix
# --------------------------------------------------------------------------
@register(
    "segment_overlap_matrix",
    oracle="""
    WITH per_ut AS (
      SELECT user_id, event_type, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    totals AS (
      SELECT event_type, SUM(cnt) AS type_total FROM per_ut GROUP BY 1
    ),
    n AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM events),
    heavy AS (
      SELECT p.user_id, p.event_type
      FROM per_ut p JOIN totals t USING (event_type), n
      WHERE p.cnt * n.n_users > t.type_total
    ),
    seg_n AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_heavy
      FROM heavy GROUP BY 1
    ),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM heavy a JOIN heavy b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b,
           sa.n_heavy AS n_heavy_a, sb.n_heavy AS n_heavy_b, n_both,
           ROUND(CAST(n_both AS DOUBLE)
                 / (sa.n_heavy + sb.n_heavy - n_both), 6) AS jaccard
    FROM inter
    JOIN seg_n sa ON sa.event_type = type_a
    JOIN seg_n sb ON sb.event_type = type_b
    """,
)
def segment_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix between behavioral segments — the
    bitmap-index intersection every ad/analytics stack runs: a user is
    in segment T when their T-event count is strictly above the
    per-user average for T (integer cross-multiplication, no
    division), and each segment pair reports both sizes, the exact
    intersection, and Jaccard similarity.

    Scale: segment membership is one (user, type) hash aggregate; the
    intersection is a self-equi-join ON USER, so a user contributes at
    most |types|² tiny rows — never a cross join; per-type sizes are a
    |types|-row aggregate joined back (broadcast). At 100 TB this is
    the groupBy-user formulation of roaring-bitmap ANDs: the shuffle
    carries (user, type-set) pairs, and heavy-key salting is never
    needed because the per-user row group is bounded by |types|."""
    ev = load(spark, sf_dir, "events")
    per_ut = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("cnt")
    )
    totals = per_ut.groupBy("event_type").agg(
        F.sum("cnt").alias("type_total")
    )
    n_users = ev.agg(
        F.countDistinct("user_id").alias("n_users")
    )
    heavy = (
        per_ut.join(F.broadcast(totals), "event_type")
        .crossJoin(F.broadcast(n_users))
        .filter(F.col("cnt") * F.col("n_users") > F.col("type_total"))
        .select("user_id", "event_type")
    )
    seg_n = heavy.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_heavy")
    )
    a, b = heavy.alias("a"), heavy.alias("b")
    both = (
        a.join(
            b,
            on=[
                F.col("a.user_id") == F.col("b.user_id"),
                F.col("a.event_type") < F.col("b.event_type"),
            ],
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").cast("bigint").alias("n_both"))
    )
    sa = F.broadcast(seg_n.withColumnRenamed("n_heavy", "n_heavy_a"))
    sb = F.broadcast(seg_n.withColumnRenamed("n_heavy", "n_heavy_b"))
    return (
        both.join(sa, F.col("type_a") == sa["event_type"])
        .drop(sa["event_type"])
        .join(sb, F.col("type_b") == sb["event_type"])
        .drop(sb["event_type"])
        .select(
            "type_a",
            "type_b",
            "n_heavy_a",
            "n_heavy_b",
            "n_both",
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_heavy_a") + F.col("n_heavy_b") - F.col("n_both")),
                6,
            ).alias("jaccard"),
        )
    )


# --------------------------------------------------------------------------
# Periodicity detection: lagged autocorrelation of the hourly series
# --------------------------------------------------------------------------
@register(
    "hourly_autocorr_lags",
    oracle="""
    WITH ih AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h
      FROM events
    ),
    b AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM ih),
    types AS (SELECT DISTINCT event_type FROM ih),
    spine AS (
      SELECT t.event_type, s.h
      FROM types t, b, UNNEST(range(b.h0, b.h1 + 1)) s(h)
    ),
    cnts AS (SELECT event_type, h, COUNT(*) AS n FROM ih GROUP BY 1, 2),
    dense AS (
      SELECT s.event_type, s.h, COALESCE(c.n, 0) AS x
      FROM spine s LEFT JOIN cnts c
        ON c.event_type = s.event_type AND c.h = s.h
    ),
    lags AS (SELECT UNNEST([1, 24]) AS lag),
    paired AS (
      SELECT a.event_type, l.lag, a.x AS x, y.x AS y
      FROM dense a
      JOIN lags l ON TRUE
      JOIN dense y ON y.event_type = a.event_type AND y.h = a.h + l.lag
    ),
    s AS (
      SELECT event_type, lag,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
      FROM paired GROUP BY 1, 2
    )
    SELECT event_type, CAST(lag AS INTEGER) AS lag, n AS n_pairs,
           ROUND(CAST(n*sxy - sx*sy AS DOUBLE)
                 / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                    * sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 6) AS autocorr
    FROM s
    WHERE n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
    """,
)
def hourly_autocorr_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodicity detection per event type: Pearson autocorrelation of
    the DENSE hourly count series at lag 1 (persistence) and lag 24
    (daily seasonality) — the signal a forecaster or anomaly baseline
    checks before assuming day-shape (``seasonal_hour_anomalies``
    assumes it; this measures it). The series is densified on the
    generated hour spine first — silent hours are real zeros, and
    skipping them would bias r upward.

    Exactness: all five moment sums are exact int64 over integer
    counts; the one Pearson expression is evaluated once from
    identical operands on both engines (degenerate constant series are
    excluded by integer predicates).

    Scale: counts are one hash aggregate; the spine is generated, not
    scanned; the lag pairing is an equi-join on (type, hour+lag) —
    |hours|·|lags| rows per type, never a window over the fact. The
    1-row bounds and 2-row lag dimension broadcast."""
    ev = load(spark, sf_dir, "events")
    ih = ev.select(
        "event_type", F.expr("unix_micros(ts) DIV 3600000000").alias("h")
    )
    bounds = ih.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    types = ih.select("event_type").distinct()
    spine = (
        types.crossJoin(F.broadcast(bounds))
        .select("event_type", F.explode(F.sequence("h0", "h1")).alias("h"))
    )
    cnts = ih.groupBy("event_type", "h").agg(F.count("*").alias("n"))
    dense = (
        spine.join(cnts, ["event_type", "h"], "left")
        .select("event_type", "h", F.coalesce("n", F.lit(0)).alias("x"))
    )
    lags = local_frame(spark, [(1,), (24,)], "lag int")
    a = dense.alias("a")
    y = dense.select(
        F.col("event_type").alias("y_type"),
        F.col("h").alias("y_h"),
        F.col("x").alias("y"),
    ).alias("y")
    paired = (
        a.crossJoin(F.broadcast(lags))
        .join(
            y,
            (F.col("y.y_type") == F.col("a.event_type"))
            & (F.col("y.y_h") == F.col("a.h") + F.col("lag")),
        )
        .select("a.event_type", "lag", F.col("a.x").alias("x"), "y")
    )
    s = paired.groupBy("event_type", "lag").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        s.filter((vx > 0) & (vy > 0))
        .select(
            "event_type",
            F.col("lag").cast("int").alias("lag"),
            F.col("n").alias("n_pairs"),
            F.round(
                num.cast("double")
                / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
                6,
            ).alias("autocorr"),
        )
    )


# --------------------------------------------------------------------------
# CUSUM changepoint detection (prefix-sum rewrite of the recursive fold)
# --------------------------------------------------------------------------
@register(
    "hourly_cusum_changepoints",
    oracle="""
    WITH b AS (
      SELECT date_trunc('hour', MIN(ts)) AS h0,
             date_trunc('hour', MAX(ts)) AS h1
      FROM events
    ),
    spine AS (
      SELECT UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_ts
      FROM b
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    cnts AS (
      SELECT date_trunc('hour', ts) AS hour_ts, event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    dense AS (
      SELECT t.event_type, s.hour_ts, COALESCE(c.n, 0) AS x
      FROM spine s
      CROSS JOIN types t
      LEFT JOIN cnts c
        ON c.hour_ts = s.hour_ts AND c.event_type = t.event_type
    ),
    tot AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS t_hours,
             CAST(SUM(x) AS BIGINT) AS c_total
      FROM dense GROUP BY 1
    ),
    walk AS (
      SELECT d.event_type, d.hour_ts, t.t_hours, t.c_total,
             SUM(t.t_hours * d.x - t.c_total) OVER (
               PARTITION BY d.event_type ORDER BY d.hour_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
      FROM dense d JOIN tot t USING (event_type)
    ),
    s AS (
      -- virtual initial state S_0 = 0: the reflecting floor/ceiling
      -- is min(0, P_1..P_t) / max(0, P_1..P_t), matching the classic
      -- fold max(0, S+e) exactly (S_1 = max(0, e_1), not 0)
      SELECT event_type, hour_ts, t_hours, c_total,
             p - LEAST(MIN(p) OVER w, 0) AS s_up,
             GREATEST(MAX(p) OVER w, 0) - p AS s_dn
      FROM walk
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY s_up DESC, hour_ts ASC) AS r_up,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY s_dn DESC, hour_ts ASC) AS r_dn
      FROM s
    ),
    agg AS (
      SELECT event_type,
             MAX(t_hours) AS n_hours,
             MAX(c_total) AS c_total,
             CAST(SUM(CASE WHEN s_up > 5 * c_total THEN 1 ELSE 0 END)
                  AS BIGINT) AS up_exceed_hours,
             CAST(SUM(CASE WHEN s_dn > 5 * c_total THEN 1 ELSE 0 END)
                  AS BIGINT) AS dn_exceed_hours
      FROM s GROUP BY 1
    )
    SELECT a.event_type,
           a.n_hours,
           ROUND(CAST(a.c_total AS DOUBLE) / a.n_hours, 6) AS mean_hourly,
           strftime(u.hour_ts, '%Y-%m-%d %H:00') AS up_peak_hour,
           ROUND(CAST(u.s_up AS DOUBLE) / a.n_hours, 6) AS up_peak_stat,
           a.up_exceed_hours,
           strftime(d.hour_ts, '%Y-%m-%d %H:00') AS dn_peak_hour,
           ROUND(CAST(d.s_dn AS DOUBLE) / a.n_hours, 6) AS dn_peak_stat,
           a.dn_exceed_hours
    FROM agg a
    JOIN ranked u ON u.event_type = a.event_type AND u.r_up = 1
    JOIN ranked d ON d.event_type = a.event_type AND d.r_dn = 1
    """,
)
def hourly_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type: the classic
    recursive fold ``S_t = max(0, S_{t-1} + (x_t - mean))`` — which
    looks un-distributable — rewritten EXACTLY as window algebra:
    with ``P_t = prefix_sum(x - mean)``, the upward statistic is
    ``S+_t = P_t - min(0, running_min(P))`` and the downward one is
    ``S-_t = max(0, running_max(P)) - P_t`` (the 0 is the virtual
    initial state S_0, so S_1 = max(0, e_1) exactly as the fold
    gives it). Reports, per type, the peak
    CUSUM excursion in each direction (value in events, hour of the
    earliest peak) and how many hours the excursion exceeded a
    5×-mean alarm threshold — the level-shift detector that
    complements ``seasonal_hour_anomalies`` (point outliers) and
    ``hourly_autocorr_lags`` (periodicity).

    Exactness: the rational mean C/T never appears inside the walk —
    deviations are scaled by T (``e_h = T·x_h − C``, exact int64:
    |P| ≤ T·C ≈ 1e17 even at 1e12 events over a decade of hours), so
    prefix sums, running extrema, argmax tie-breaks (earliest hour),
    and the 5×-mean alarm test (``S_scaled > 5·C·T/T ⇔ S > 5·C``)
    are all exact integer comparisons; the two divisions by T round
    once at the edge from identical operands.

    Scale: the fact collapses to one hash aggregate (hour × type
    counts); the walk runs on the GENERATED dense spine —
    |hours|×|types| rows, bounded by calendar time, not data volume.
    Windows partition by event_type, the same key the spine was
    built on, so one sort serves the cumulative sum and both running
    extrema; the peak pick is a struct-max hash aggregate, not
    another window."""
    ev = load(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    b = ev.agg(F.min(hour).alias("h0"), F.max(hour).alias("h1"))
    spine = b.select(
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_ts")
    )
    types = ev.select("event_type").distinct()
    cnts = ev.groupBy(hour.alias("hour_ts"), F.col("event_type")).agg(
        F.count("*").alias("n")
    )
    dense = (
        spine.crossJoin(F.broadcast(types))
        .join(cnts, ["hour_ts", "event_type"], "left")
        .select(
            "event_type", "hour_ts", F.coalesce("n", F.lit(0)).alias("x")
        )
    )
    tot = dense.groupBy("event_type").agg(
        F.count("*").alias("t_hours"), F.sum("x").alias("c_total")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walk = dense.join(F.broadcast(tot), "event_type").withColumn(
        "p",
        F.sum(F.col("t_hours") * F.col("x") - F.col("c_total")).over(w_cum),
    )
    zero = F.lit(0).cast("long")
    s = walk.select(
        "event_type",
        "hour_ts",
        "t_hours",
        "c_total",
        (F.col("p") - F.least(F.min("p").over(w_cum), zero)).alias("s_up"),
        (F.greatest(F.max("p").over(w_cum), zero) - F.col("p")).alias(
            "s_dn"
        ),
    )
    neg_us = (-F.unix_micros("hour_ts")).alias("nh")
    res = s.groupBy("event_type").agg(
        F.max("t_hours").alias("n_hours"),
        F.max("c_total").alias("c_total"),
        F.max(F.struct(F.col("s_up").alias("v"), neg_us)).alias("up"),
        F.max(F.struct(F.col("s_dn").alias("v"), neg_us)).alias("dn"),
        F.sum(F.when(F.col("s_up") > 5 * F.col("c_total"), 1).otherwise(0))
        .cast("bigint")
        .alias("up_exceed_hours"),
        F.sum(F.when(F.col("s_dn") > 5 * F.col("c_total"), 1).otherwise(0))
        .cast("bigint")
        .alias("dn_exceed_hours"),
    )
    t_dbl = F.col("n_hours").cast("double")
    return res.select(
        "event_type",
        "n_hours",
        F.round(F.col("c_total").cast("double") / t_dbl, 6).alias(
            "mean_hourly"
        ),
        F.date_format(
            F.timestamp_micros(-F.col("up.nh")), "yyyy-MM-dd HH:00"
        ).alias("up_peak_hour"),
        F.round(F.col("up.v").cast("double") / t_dbl, 6).alias(
            "up_peak_stat"
        ),
        "up_exceed_hours",
        F.date_format(
            F.timestamp_micros(-F.col("dn.nh")), "yyyy-MM-dd HH:00"
        ).alias("dn_peak_hour"),
        F.round(F.col("dn.v").cast("double") / t_dbl, 6).alias(
            "dn_peak_stat"
        ),
        "dn_exceed_hours",
    )


# --------------------------------------------------------------------------
# Partition-layout advisor: candidate partition keys scored for
# cardinality, skew, and small-partition risk before a table layout is
# committed — the design pass a 100-TB ingest runs first.
# --------------------------------------------------------------------------
@register(
    "partition_layout_advisor",
    oracle="""
    WITH base AS (
      SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             event_type, user_id
      FROM events
    ),
    per AS (
      SELECT 'day' AS candidate, day AS pkey, COUNT(*) AS n
      FROM base GROUP BY 1, 2
      UNION ALL
      SELECT 'event_type', event_type, COUNT(*) FROM base GROUP BY 1, 2
      UNION ALL
      SELECT 'day_x_type', day || '|' || event_type, COUNT(*)
      FROM base GROUP BY 1, 2
      UNION ALL
      SELECT 'user_mod_1024', CAST(user_id % 1024 AS VARCHAR), COUNT(*)
      FROM base GROUP BY 1, 2
    ),
    ranked AS (
      SELECT candidate, n,
             ROW_NUMBER() OVER (PARTITION BY candidate ORDER BY n ASC,
                                pkey ASC) AS rn,
             COUNT(*) OVER (PARTITION BY candidate) AS n_parts,
             SUM(n) OVER (PARTITION BY candidate) AS total_n,
             MAX(n) OVER (PARTITION BY candidate) AS max_n
      FROM per
    )
    SELECT candidate,
           CAST(n_parts AS BIGINT) AS n_partitions,
           CAST(total_n AS BIGINT) AS total_rows,
           CAST(max_n AS BIGINT) AS max_partition_rows,
           CAST(n AS BIGINT) AS median_partition_rows,
           ROUND(CAST(max_n AS DOUBLE) / n, 6) AS skew_ratio,
           ROUND(CAST(max_n * n_parts AS DOUBLE) / total_n, 6)
             AS max_over_mean
    FROM ranked
    WHERE rn = (n_parts + 1) // 2
    """,
)
def partition_layout_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-layout advisor: before a 100-TB table commits to a
    partitioning scheme, score each candidate key — calendar day,
    event type, their cross, and a 1024-way user hash-bucket — on the
    three axes that decide scan health: partition-count (too many →
    small files + listing cost), worst-partition size, and skew
    (max/median and max/mean ratios: a key whose hottest partition is
    50× its median serializes every downstream stage on one task).
    The fact table is scanned once per candidate grain — exactly the
    probe cost a real advisor pays — and everything downstream runs
    on the tiny (candidate, key, count) table.

    Exactness: counts are exact; the median partition size is the
    exact lower median (position (n+1)//2 in value order, row_number
    with a key tie-break so both engines pick the identical row); the
    two ratios divide once at the edge from identical integers.

    Scale: each candidate grain is one map-side-combinable hash
    aggregate; the union'd stats table has |keys| rows, not |events|;
    the ranking window partitions by candidate — four partitions,
    each bounded by key cardinality, never by data volume."""
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "event_type",
        "user_id",
    )

    def per(cand: str, key: Column) -> DataFrame:
        return (
            base.groupBy(key.alias("pkey"))
            .agg(F.count("*").alias("n"))
            .select(F.lit(cand).alias("candidate"), "pkey", "n")
        )

    stats = (
        per("day", F.col("day"))
        .unionByName(per("event_type", F.col("event_type")))
        .unionByName(
            per(
                "day_x_type",
                F.concat_ws("|", F.col("day"), F.col("event_type")),
            )
        )
        .unionByName(
            per(
                "user_mod_1024",
                (F.col("user_id") % 1024).cast("string"),
            )
        )
    )
    wp = Window.partitionBy("candidate")
    ranked = stats.select(
        "candidate",
        "n",
        F.row_number()
        .over(wp.orderBy(F.col("n").asc(), F.col("pkey").asc()))
        .alias("rn"),
        F.count("*").over(wp).alias("n_parts"),
        F.sum("n").over(wp).alias("total_n"),
        F.max("n").over(wp).alias("max_n"),
    )
    return ranked.filter(
        F.col("rn") == F.expr("(n_parts + 1) DIV 2")
    ).select(
        "candidate",
        F.col("n_parts").cast("bigint").alias("n_partitions"),
        F.col("total_n").cast("bigint").alias("total_rows"),
        F.col("max_n").cast("bigint").alias("max_partition_rows"),
        F.col("n").cast("bigint").alias("median_partition_rows"),
        F.round(F.col("max_n").cast("double") / F.col("n"), 6).alias(
            "skew_ratio"
        ),
        F.round(
            (F.col("max_n") * F.col("n_parts")).cast("double")
            / F.col("total_n"),
            6,
        ).alias("max_over_mean"),
    )


# --------------------------------------------------------------------------
# Hybrid hot/cold skew join: the broadcast-the-hot-slice strategy,
# gate-verified against the plain-join oracle.
# --------------------------------------------------------------------------
@register(
    "hybrid_skew_join_stats",
    oracle="""
    WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
    hot AS (SELECT user_id FROM c ORDER BY n DESC, user_id ASC LIMIT 32),
    j AS (
      SELECT e.user_id, e.value, cu.c_mktsegment,
             CASE WHEN h.user_id IS NOT NULL THEN 1 ELSE 0 END AS is_hot
      FROM events e
      JOIN customer cu ON e.user_id = cu.c_custkey
      LEFT JOIN hot h ON h.user_id = e.user_id
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(is_hot) AS BIGINT) AS n_hot_events,
           CAST(COUNT(DISTINCT CASE WHEN is_hot = 1 THEN user_id END)
                AS BIGINT) AS n_hot_users,
           CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT)
             AS value_cents
    FROM j GROUP BY 1
    """,
)
def hybrid_skew_join_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hybrid hot/cold skew join (functions/scale.hybrid_skew_join)
    through the gate: the top-32 heaviest users (deterministic — count
    desc, key asc — and CONSTANT-bounded, so the key list and its dim
    slice stay broadcast-safe at any SF) form the hot set; their
    events join a BROADCAST of the matching customer rows and never
    shuffle, while cold events take the ordinary shuffle join. The
    per-segment aggregate the gate hashes is provably identical to the
    plain join — that identity IS the correctness contract of the
    strategy.

    Scale: this is the skew regime AQE's split can't fix (splitting a
    hot partition still shuffles its rows; here hot rows skip the
    exchange entirely) and salting handles badly (salting replicates
    the WHOLE dim n_salts×; the hybrid replicates only the hot dim
    slice, bounded by the hot-key count). The hot key list is derived
    by one map-side-combinable count + TakeOrdered; a production
    caller persists that tiny list rather than recomputing it per
    branch as this self-contained query does.

    Exactness: hotness, counts, and cents sums are all integer/decimal
    exact; distinct hot users rides the same segment-keyed shuffle."""
    from olap_project_spark.functions.scale import hybrid_skew_join

    ev = load(spark, sf_dir, "events").select("user_id", "value")
    cu = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cnt = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    hot = (
        cnt.orderBy(F.col("n").desc(), F.col("user_id").asc())
        .limit(32)
        .select("user_id")
    )
    joined = hybrid_skew_join(ev, cu, "user_id", "c_custkey", hot_keys=hot)
    tagged = joined.join(
        F.broadcast(hot.withColumn("_hot", F.lit(1))), "user_id", "left"
    )
    return tagged.groupBy("c_mktsegment").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(F.coalesce(F.col("_hot"), F.lit(0)))
        .cast("bigint")
        .alias("n_hot_events"),
        F.countDistinct(
            F.when(F.col("_hot") == 1, F.col("user_id"))
        )
        .cast("bigint")
        .alias("n_hot_users"),
        F.sum(F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("value_cents"),
    )


# --------------------------------------------------------------------------
# Markov next-event prediction eval: temporal train/eval split, argmax
# model from the train window, exact accuracy on the held-out tail.
# --------------------------------------------------------------------------
@register(
    "markov_next_event_accuracy",
    oracle="""
    WITH seq AS (
      SELECT event_type AS cur,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS nxt,
             LEAD(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS nxt_ts
      FROM events
    ),
    t AS (SELECT MAX(ts) - INTERVAL 7 DAY AS cutoff FROM events),
    train AS (
      SELECT cur, nxt FROM seq, t
      WHERE nxt IS NOT NULL AND nxt_ts < cutoff
    ),
    eval AS (
      SELECT cur, nxt FROM seq, t
      WHERE nxt IS NOT NULL AND nxt_ts >= cutoff
    ),
    counts AS (
      SELECT cur, nxt, COUNT(*) AS n FROM train GROUP BY 1, 2
    ),
    model AS (
      SELECT cur, nxt AS predicted_next, n
      FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY cur ORDER BY n DESC, nxt ASC) AS rn
            FROM counts)
      WHERE rn = 1
    ),
    trainsz AS (
      SELECT cur, CAST(SUM(n) AS BIGINT) AS n_train FROM counts GROUP BY 1
    )
    SELECT e.cur,
           COALESCE(ts.n_train, 0) AS n_train,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           m.predicted_next,
           CAST(SUM(CASE WHEN e.nxt = m.predicted_next THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           ROUND(CAST(SUM(CASE WHEN e.nxt = m.predicted_next
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS accuracy
    FROM eval e
    LEFT JOIN model m ON m.cur = e.cur
    LEFT JOIN trainsz ts ON ts.cur = e.cur
    GROUP BY e.cur, ts.n_train, m.predicted_next
    """,
)
def markov_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-event prediction EVALUATED, not just fit: the first-order
    Markov model (``event_transition_matrix``) is trained on
    transitions that land before a temporal cutoff (max ts − 7 days —
    a time-based split, the only split that doesn't leak future
    behavior into the model), its per-state argmax becomes the
    predictor (ties break lexicographically, so the model is
    deterministic), and accuracy is measured exactly on the held-out
    final week. Per current-state row: train/eval sizes, the predicted
    next type, and hit rate — the backtest harness every
    sequence-model claim needs before shipping.

    Scale: one user-keyed window pass derives all transitions (the
    identical shuffle the matrix already pays); train counts collapse
    to ≤|types|² rows, the model to ≤|types| rows, both broadcast into
    the eval-side aggregate. The cutoff is a 1-row broadcast
    aggregate. Nothing beyond the one window pass touches
    event-volume data."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
        F.lead("ts").over(w).alias("nxt_ts"),
    ).filter(F.col("nxt").isNotNull())
    cutoff = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 7 DAY")).alias("cutoff")
    )
    tagged = seq.crossJoin(F.broadcast(cutoff))
    train = tagged.filter(F.col("nxt_ts") < F.col("cutoff"))
    ev_set = tagged.filter(F.col("nxt_ts") >= F.col("cutoff"))
    counts = train.groupBy("cur", "nxt").agg(F.count("*").alias("n"))
    model = (
        counts.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("cur").orderBy(
                    F.col("n").desc(), F.col("nxt").asc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("cur", F.col("nxt").alias("predicted_next"))
    )
    trainsz = counts.groupBy("cur").agg(
        F.sum("n").cast("bigint").alias("n_train")
    )
    hit = (F.col("nxt") == F.col("predicted_next")).cast("bigint")
    return (
        ev_set.join(F.broadcast(model), "cur", "left")
        .join(F.broadcast(trainsz), "cur", "left")
        .groupBy("cur", "n_train", "predicted_next")
        .agg(
            F.count("*").cast("bigint").alias("n_eval"),
            F.sum(F.coalesce(hit, F.lit(0)))
            .cast("bigint")
            .alias("n_correct"),
            F.round(
                F.sum(F.coalesce(hit, F.lit(0))).cast("double")
                / F.count("*"),
                6,
            ).alias("accuracy"),
        )
        .select(
            "cur",
            F.coalesce(F.col("n_train"), F.lit(0))
            .cast("bigint")
            .alias("n_train"),
            "n_eval",
            "predicted_next",
            "n_correct",
            "accuracy",
        )
    )


# --------------------------------------------------------------------------
# Observability: df.observe() / CollectMetrics — free pipeline metrics
# collected DURING an action, self-checked against a declarative
# recomputation and hash-verified by the gate.
# --------------------------------------------------------------------------
@register(
    "observed_ingest_metrics",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT)
             AS sum_cents,
           CAST(MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT)
             AS min_ts_us,
           CAST(MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT)
             AS max_ts_us,
           CAST(1 AS INTEGER) AS observed_matches
    FROM events
    """,
)
def observed_ingest_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability via ``df.observe()`` (the CollectMetrics
    operator): row count, exact cents volume, and the timestamp span
    are captured as a SIDE EFFECT of one pass over the data — the
    mechanism a production ingest uses to emit row-count/volume
    reconciliation metrics without a second scan. The pass here is a
    zero-copy ``noop``-sink write; the harvested metrics are then
    compared field-by-field against an independent declarative
    aggregation, and the gate hashes both the values AND the
    comparison verdict — if observe() ever under- or over-counts
    (dropped Arrow batch, retry double-count), ``observed_matches``
    flips to 0 and the hash breaks.

    Scale: CollectMetrics is map-side accumulation merged on the
    driver (no extra shuffle, no extra scan); the verification second
    pass exists only because this query's POINT is to audit the
    mechanism."""
    from pyspark.sql import Observation

    ev = load(spark, sf_dir, "events")
    cents = F.col("value").cast("decimal(18,2)") * 100
    metrics = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents).cast("bigint").alias("sum_cents"),
        F.min(F.unix_micros("ts")).alias("min_ts_us"),
        F.max(F.unix_micros("ts")).alias("max_ts_us"),
    ]
    obs = Observation("ingest-audit")
    ev.observe(obs, *metrics).write.format("noop").mode(
        "overwrite"
    ).save()
    got = obs.get  # harvested AFTER the noop action completes
    recomputed = ev.agg(*metrics)
    same = (
        (F.col("n_rows") == F.lit(int(got["n_rows"])))
        & (F.col("sum_cents") == F.lit(int(got["sum_cents"])))
        & (F.col("min_ts_us") == F.lit(int(got["min_ts_us"])))
        & (F.col("max_ts_us") == F.lit(int(got["max_ts_us"])))
    )
    return recomputed.select(
        F.col("n_rows").cast("bigint").alias("n_rows"),
        "sum_cents",
        "min_ts_us",
        "max_ts_us",
        F.when(same, 1).otherwise(0).cast("int").alias("observed_matches"),
    )


# --------------------------------------------------------------------------
# MATCH_RECOGNIZE-lite: regex over per-user event-type sequences
# --------------------------------------------------------------------------
# (name, regex over event-type initials c/e/p/s/v, ordered by (ts, id))
EVENT_PATTERNS: tuple[tuple[str, str], ...] = (
    ("error_burst", "ee+"),  # two-or-more consecutive errors
    ("signup_then_error", "se"),  # signup immediately followed by error
    ("view_clicks_purchase", "vc*p"),  # view, any clicks, purchase
)


def _event_regex_oracle() -> str:
    pat_rows = ", ".join(f"('{n}', '{rx}')" for n, rx in EVENT_PATTERNS)
    return f"""
    WITH seq AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), ''
                        ORDER BY CAST(ts AS TIMESTAMP), event_id) AS s
      FROM events GROUP BY user_id
    ),
    pats(name, rx) AS (VALUES {pat_rows}),
    m AS (
      SELECT p.name,
             CAST(len(regexp_extract_all(seq.s, p.rx)) AS BIGINT) AS n
      FROM seq, pats p
    )
    SELECT name AS pattern,
           CAST(SUM(n) AS BIGINT) AS n_matches,
           CAST(COUNT(CASE WHEN n > 0 THEN 1 END) AS BIGINT)
             AS users_matched,
           CAST(MAX(n) AS BIGINT) AS max_per_user
    FROM m GROUP BY name ORDER BY name
    """


@register("event_regex_matches", oracle=_event_regex_oracle)
def event_regex_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL MATCH_RECOGNIZE, which Spark famously lacks, as the
    SEQUENCE-TO-STRING operator: each user's event history collapses to
    a string of event-type initials in exact (ts, event_id) order, and
    row-pattern recognition becomes plain regular-expression counting —
    non-overlapping, leftmost, greedy, the same semantics RE2 and Java
    regex share, so the DuckDB oracle (an INDEPENDENT string_agg +
    regexp_extract_all formulation) hash-pins the match counts. Three
    patterns cover the three regex features MATCH_RECOGNIZE programs
    use: repetition (``ee+`` error bursts), adjacency (``se``
    signup-then-error), and Kleene-star gaps (``vc*p``
    view-clicks-purchase funnels with no intervening event).

    Scale: one shuffle groups events by user; the per-user string is
    bounded by that user's activity (at 100 TB you key by SESSION to
    bound it — same plan); the regex runs JVM-side per group, no
    Python, no self-joins, no windows. The contiguous-subsequence
    semantics differ from session_funnel_stats's gap-tolerant staged
    funnel — this is the strict-adjacency class of pattern."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.substring("event_type", 1, 1).alias("ch"),
    )
    seqs = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "ch"))
                ),
                lambda x: x["ch"],
            ),
            "",
        ).alias("s")
    )
    per_pattern = [
        seqs.select(
            F.lit(name).alias("pattern"),
            F.regexp_count(F.col("s"), F.lit(rx)).cast("bigint").alias("n"),
        )
        for name, rx in EVENT_PATTERNS
    ]
    scored = per_pattern[0]
    for df in per_pattern[1:]:
        scored = scored.unionByName(df)
    return (
        scored.groupBy("pattern")
        .agg(
            F.sum("n").cast("bigint").alias("n_matches"),
            F.sum(F.when(F.col("n") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("users_matched"),
            F.max("n").cast("bigint").alias("max_per_user"),
        )
        .orderBy("pattern")
    )


# --------------------------------------------------------------------------
# Bitmap-mergeable exact distinct counts (re-aggregatable rollup)
# --------------------------------------------------------------------------
@register(
    "bitmap_distinct_rollup",
    oracle="""
    WITH ev AS (
      SELECT CAST(strftime(date_trunc('week', CAST(ts AS TIMESTAMP)),
                           '%Y-%m-%d') AS VARCHAR) AS week,
             CAST(strftime(date_trunc('day', CAST(ts AS TIMESTAMP)),
                           '%Y-%m-%d') AS VARCHAR) AS day,
             user_id
      FROM events
    ),
    daily AS (
      SELECT week, day,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS day_distinct
      FROM ev GROUP BY week, day
    ),
    weekly AS (
      SELECT week,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS week_distinct
      FROM ev GROUP BY week
    )
    SELECT w.week,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(d.day_distinct) AS BIGINT) AS sum_day_distinct,
           w.week_distinct,
           CAST(1 AS INTEGER) AS bitmap_matches_exact
    FROM weekly w JOIN daily d ON d.week = w.week
    GROUP BY w.week, w.week_distinct
    ORDER BY w.week
    """,
)
def bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counts that RE-AGGREGATE — the bitmap rollup
    pattern (Druid/ClickHouse `groupBitmap`, Spark 4's bitmap agg
    family): per (week, day, bucket) the user-id set is materialized
    as a bitmap (``bitmap_construct_agg`` over
    ``bitmap_bit_position``), and the WEEKLY distinct comes from
    OR-merging the daily bitmaps (``bitmap_or_agg`` →
    ``bitmap_count``) — never from rescanning the events. Plain
    COUNT(DISTINCT) cannot roll up (distincts don't sum: the result
    row pins ``sum_day_distinct`` ≠ ``week_distinct``); the bitmap is
    the exact mergeable representation that makes distinct a
    first-class rollup measure. ``bitmap_matches_exact`` hash-pins the
    merged counts against a direct COUNT(DISTINCT) per week.

    Scale: user ids hash into 32k-bit buckets (``bitmap_bucket_number``
    keys the aggregate, so one bitmap never exceeds 4 KB and the
    keyspace shards across executors); the daily layer is the
    materialization a 100-TB pipeline stores, after which every
    coarser rollup (week/month/quarter) is metadata-sized bitmap OR."""
    ev = load(spark, sf_dir, "events").select(
        F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd").alias(
            "week"
        ),
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
            "day"
        ),
        "user_id",
    )
    # layer 1: per (week, day, bucket) bitmaps — the stored rollup
    daily_maps = ev.groupBy(
        "week", "day", F.bitmap_bucket_number(F.col("user_id")).alias("bkt")
    ).agg(
        F.bitmap_construct_agg(
            F.bitmap_bit_position(F.col("user_id"))
        ).alias("bm")
    )
    # daily distinct = Σ over buckets of bitmap_count (buckets are
    # disjoint id ranges, so counts add exactly)
    daily = daily_maps.groupBy("week", "day").agg(
        F.sum(F.bitmap_count(F.col("bm"))).cast("bigint").alias(
            "day_distinct"
        )
    )
    # layer 2: weekly distinct by OR-merging the daily bitmaps per
    # bucket — no rescan of events
    weekly = (
        daily_maps.groupBy("week", "bkt")
        .agg(F.bitmap_or_agg(F.col("bm")).alias("bm"))
        .groupBy("week")
        .agg(
            F.sum(F.bitmap_count(F.col("bm")))
            .cast("bigint")
            .alias("week_distinct_bitmap")
        )
    )
    # the audit: direct exact distinct per week
    exact = ev.groupBy("week").agg(
        F.countDistinct("user_id").cast("bigint").alias("week_distinct")
    )
    return (
        daily.groupBy("week")
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.sum("day_distinct").cast("bigint").alias("sum_day_distinct"),
        )
        .join(weekly, "week")
        .join(exact, "week")
        .select(
            "week",
            "n_days",
            "sum_day_distinct",
            "week_distinct",
            (F.col("week_distinct_bitmap") == F.col("week_distinct"))
            .cast("int")
            .alias("bitmap_matches_exact"),
        )
        .orderBy("week")
    )
