"""The reference's own OLAP surface, DRIVER-VERIFIED: Q0/Q4/Q5 from
``queries/transactions.py`` executed over a transaction fact produced
by the native POS simulator data source and the real ``clean()``
transform — the reference's end-to-end path (simulator → clean →
OLAP question, scripts/spark_streaming_consumer.py:200-252 +
pos/pos_simulator.py:62-205) as gate queries, not just pytest goldens.

Oracle strategy: ``PosSimulatorDataSource`` rows are pure functions of
(seed, index), so the IDENTICAL raw rows are generated in plain Python
(lazily, on first oracle access — the oracles register as thunks) and
embedded in each DuckDB oracle as a VALUES CTE;
the oracle then re-derives the clean-transform semantics (amount
parse, USD→VND, event-time calendar) in independent SQL. Spark's
whole pipeline — Python data source scan → Catalyst clean projection
→ query — is thereby checked against a from-scratch reimplementation,
with ZERO dependence on the parquet corpus (``sf_dir`` is unused).

Scale: the simulator is an arbitrary-size generator (splits generate
independently, no driver materialization); clean() is one
WholeStageCodegen projection; the three queries are map-side
combinable aggregates / per-card windows — the same plans the
transactions.py docstrings pin.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olap_project_spark.functions.localframe import local_frame
from olap_project_spark.queries import register, session_memo
from olap_project_spark.queries.transactions import (
    q0_merchant_rollup,
    q1_busiest_hours,
    q2_top_cities_by_value,
    q3_top_merchants,
    q4_fraud_rate_by,
    q5_rapid_transactions,
    q6_large_txn_profile,
    q7_fraud_trend,
    q8_weekend_comparison,
    q9_above_avg_flag_users,
)
from olap_project_spark.schemas import DEFAULT_VND_PER_USD
from olap_project_spark.sources.pos_datasource import _row

POS_ROWS = 800
POS_SEED = 42
_RATE = int(DEFAULT_VND_PER_USD)

def _raw_rows() -> list[tuple]:
    """The exact rows the Spark data source will generate — reproduced
    in plain Python (pure(seed, i), pos_datasource._row) so each oracle
    can embed them as literals. Built LAZILY and memoized: the oracles
    below register as thunks, so a process that never reads an oracle
    string (bench, plan lint) never generates the rows, and raising
    POS_ROWS costs one build, not one per importing worker."""
    global _RAW_ROWS_CACHE
    if _RAW_ROWS_CACHE is None:
        _RAW_ROWS_CACHE = [_row(POS_SEED, i) for i in range(POS_ROWS)]
    return _RAW_ROWS_CACHE


_RAW_ROWS_CACHE: list[tuple] | None = None


def _esc(s: str) -> str:
    return s.replace("'", "''")


@lru_cache(maxsize=1)
def _raw_cte() -> str:
    """VALUES CTE of the (user, card, amount, merchant, city, errors,
    fraud, ts) projection of the generated rows — the only fields the
    pos_* oracles touch. Memoized: all the pos_* oracles share one
    string."""
    rows = ",\n      ".join(
        "(%d, '%s', '%s', '%s', '%s', '%s', '%s', '%s', '%s')"
        % (i, u, c, a, _esc(m), _esc(city), _esc(e), fr, ts)
        for i, (u, c, _y, _mo, _d, _t, a, _uc, m, city, _st, _z, _mcc, e, fr, ts)
        in enumerate(_raw_rows())
    )
    return f"""raw(i, u, card, amount, merchant, city, err, fraud, tss) AS (
      SELECT * FROM (VALUES {rows}))"""


# Spark's Python-DataSource registry has ASYMMETRIC scoping: lookup is
# per-session, but name uniqueness is JVM-wide — a sibling session can
# neither read a name another session registered nor re-register it.
# So each session gets its own registration under a session-scoped
# name, tracked by sessionUUID (unique, never reused — unlike id() of
# a py4j proxy, which CPython can recycle after a GC, and unlike
# applicationId, which sibling sessions of one context share).
_POS_REGISTERED: dict[str, str] = {}


def _ensure_pos_source(spark: SparkSession) -> str:
    """Register the simulator on ``spark`` (idempotent) and return the
    format name to read it by on that session."""
    uuid = spark._jsparkSession.sessionUUID()
    fmt = _POS_REGISTERED.get(uuid)
    if fmt is None:
        from olap_project_spark.sources.pos_datasource import (
            PosSimulatorDataSource,
        )

        fmt = "pos_simulator_" + uuid.replace("-", "")
        scoped = type(
            "PosSimulatorScoped",
            (PosSimulatorDataSource,),
            {"name": classmethod(lambda cls, _n=fmt: _n)},
        )
        spark.dataSource.register(scoped)
        _POS_REGISTERED[uuid] = fmt
    return fmt


def _pos_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaned transaction fact: simulator scan → ``clean()``.
    Memoized per session under a CONSTANT corpus key — the generator
    is corpus-independent, so one build serves every ``sf_dir`` a
    session touches (and a bench warmup pass pre-pays it)."""
    from olap_project_spark.transforms.clean import clean

    def build() -> DataFrame:
        raw = (
            spark.read.format(_ensure_pos_source(spark))
            .option("rows", POS_ROWS)
            .option("seed", POS_SEED)
            .option("partitions", 8)
            .load()
        )
        return clean(raw, processed_at="2024-01-15 08:30:20")

    return session_memo(spark, "pos-simulator", "pos_fact", build)


@register(
    "pos_merchant_rollup",
    oracle=lambda: f"""
    WITH {_raw_cte()},
    parsed AS (
      SELECT merchant,
             CAST(replace(replace(amount, '$', ''), ',', '') AS DOUBLE) AS usd,
             CAST(tss AS TIMESTAMP) AS ts
      FROM raw
    ),
    fact AS (
      SELECT merchant,
             CAST(year(ts) AS INTEGER) AS y,
             CAST(month(ts) AS INTEGER) AS mo,
             CAST(day(ts) AS INTEGER) AS d,
             CAST(CASE WHEN usd > 0 THEN usd * {_RATE} END
                  AS DECIMAL(18,2)) AS vnd
      FROM parsed
    )
    SELECT merchant AS "Merchant_Name", y AS "Year", mo AS "Month",
           d AS "Day",
           CAST(SUM(vnd) AS DOUBLE) AS total_vnd,
           CAST(COUNT(*) AS BIGINT) AS n_txns
    FROM fact
    GROUP BY ROLLUP(merchant, y, mo, d)
    """,
)
def pos_merchant_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q0 (requirements.md:10-13) through the driver gate: per-merchant
    VND value + count at day→month→year→total rollup levels, over the
    simulator-generated, clean()-derived fact — the reference's
    end-of-period report produced by its own pipeline, verified against
    an independent SQL re-derivation of the same 800 deterministic
    rows.

    Scale: one rollup aggregate (map-side combinable at every level);
    decimal-exact money sums cast to double only at the edge."""
    return q0_merchant_rollup(_pos_fact(spark, sf_dir))


@register(
    "pos_fraud_rate_by_city",
    oracle=lambda: f"""
    WITH {_raw_cte()}
    SELECT city AS "Merchant_City",
           CAST(COUNT(*) AS BIGINT) AS n_txns,
           CAST(SUM(CASE WHEN fraud = 'Yes' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_fraud,
           ROUND(CAST(SUM(CASE WHEN fraud = 'Yes' THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS fraud_rate
    FROM raw
    GROUP BY city
    """,
)
def pos_fraud_rate_by_city(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 (requirements.md:46) through the driver gate: fraud count and
    rate per merchant city over the simulator fact — the reference's
    DIVIDE(COUNTROWS(FILTER(...)), COUNTROWS(...)) DAX pattern as one
    conditional aggregate, rate = quotient of exact bigint counts.

    Scale: single hash aggregate keyed on the city dimension."""
    return q4_fraud_rate_by(_pos_fact(spark, sf_dir), dim="Merchant_City")


@register(
    "pos_rapid_transactions",
    oracle=lambda: f"""
    WITH {_raw_cte()},
    fact AS (SELECT u, card, CAST(tss AS TIMESTAMP) AS ts FROM raw),
    g AS (
      SELECT u,
             epoch(ts) - lag(epoch(ts)) OVER (
               PARTITION BY u, card ORDER BY ts) AS gap_s
      FROM fact
    )
    SELECT u AS "User",
           CAST(SUM(CASE WHEN gap_s < 300 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_rapid,
           CAST(COUNT(*) AS BIGINT) AS n_gaps
    FROM g WHERE gap_s IS NOT NULL
    GROUP BY u
    HAVING SUM(CASE WHEN gap_s < 300 THEN 1 ELSE 0 END) > 0
    """,
)
def pos_rapid_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 (requirements.md:47) through the driver gate: users with
    consecutive transactions under 300 s apart on the same card, over
    the simulator fact — per-card lag on event time. Gap multisets are
    tie-order-invariant (successive differences of a sorted multiset),
    so the window is deterministic even with duplicate timestamps.

    Scale: the window partitions on (User, Card) — entity-keyed, never
    global; counts aggregate map-side."""
    return q5_rapid_transactions(_pos_fact(spark, sf_dir))


@register(
    "pos_top_merchants",
    oracle=lambda: f"""
    WITH {_raw_cte()},
    parsed AS (
      SELECT merchant,
             CAST(replace(replace(amount, '$', ''), ',', '') AS DOUBLE) AS usd
      FROM raw
    ),
    agg AS (
      SELECT merchant AS "Merchant_Name",
             CAST(COUNT(*) AS BIGINT) AS n_txns,
             CAST(SUM(CAST(CASE WHEN usd > 0 THEN usd * {_RATE} END
                           AS DECIMAL(18,2))) AS DOUBLE) AS total_vnd
      FROM parsed GROUP BY merchant
    )
    SELECT * FROM agg
    ORDER BY total_vnd DESC, "Merchant_Name" ASC
    LIMIT 10
    """,
)
def pos_top_merchants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 (requirements.md:45) through the driver gate: top-10
    merchants by total VND value over the simulator fact — the DAX
    TOPN analog as orderBy+limit (TakeOrderedAndProject; LIMIT only
    after the unique (value, name) total order, per the oracle
    conventions).

    Scale: one merchant-keyed hash aggregate, then per-partition top-k
    — no global sort."""
    return q3_top_merchants(_pos_fact(spark, sf_dir), k=10, by="value")


@register(
    "pos_weekend_comparison",
    oracle=lambda: f"""
    WITH {_raw_cte()},
    parsed AS (
      SELECT CAST(replace(replace(amount, '$', ''), ',', '') AS DOUBLE) AS usd,
             CAST(tss AS TIMESTAMP) AS ts
      FROM raw
    ),
    fact AS (
      SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 'Yes' ELSE 'No' END
               AS wk,
             CAST(CASE WHEN usd > 0 THEN usd * {_RATE} END
                  AS DECIMAL(18,2)) AS vnd
      FROM parsed
    )
    SELECT wk AS "Is_Weekend",
           CAST(COUNT(*) AS BIGINT) AS n_txns,
           CAST(SUM(vnd) AS DOUBLE) AS total_vnd,
           ROUND(CAST(SUM(vnd) AS DOUBLE) / COUNT(*), 6) AS avg_vnd
    FROM fact GROUP BY wk
    """,
)
def pos_weekend_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 (requirements.md:50) through the driver gate: weekday vs
    weekend transaction value over the simulator fact. The weekend
    flag is clean()'s P12 expression (``dayofweek IN (1,7)`` Spark =
    Sunday/Saturday; DuckDB's 0-based ``IN (0,6)``); the average is a
    quotient of the exact decimal sum and the bigint count.

    Scale: two-group hash aggregate — map-side combinable, trivially
    bounded."""
    return q8_weekend_comparison(_pos_fact(spark, sf_dir))


@register(
    "pos_busiest_hours",
    oracle=lambda: f"""
    WITH {_raw_cte()}
    SELECT CAST(hour(CAST(tss AS TIMESTAMP)) AS INTEGER) AS "Hour",
           CAST(COUNT(*) AS BIGINT) AS n_txns
    FROM raw GROUP BY 1
    """,
)
def pos_busiest_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 busiest-hours half (requirements.md:42) through the driver
    gate: transaction counts per event-time hour over the simulator
    fact.

    Scale: one 24-group hash aggregate; the ordering is presentation
    only (hash compare is order-insensitive)."""
    return q1_busiest_hours(_pos_fact(spark, sf_dir))


@register(
    "pos_top_cities",
    oracle=lambda: f"""
    WITH {_raw_cte()},
    parsed AS (
      SELECT city,
             CAST(replace(replace(amount, '$', ''), ',', '') AS DOUBLE) AS usd
      FROM raw
    ),
    agg AS (
      SELECT city AS "Merchant_City",
             CAST(SUM(CAST(CASE WHEN usd > 0 THEN usd * {_RATE} END
                           AS DECIMAL(18,2))) AS DOUBLE) AS total_vnd
      FROM parsed GROUP BY city
    )
    SELECT * FROM agg
    ORDER BY total_vnd DESC, "Merchant_City" ASC
    LIMIT 10
    """,
)
def pos_top_cities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 (requirements.md:44) through the driver gate: cities ranked
    by total VND value — LIMIT only after the unique (value, city)
    total order.

    Scale: city-keyed hash aggregate + TakeOrderedAndProject."""
    return q2_top_cities_by_value(_pos_fact(spark, sf_dir), k=10)


@register(
    "pos_large_txn_profile",
    oracle=lambda: f"""
    WITH {_raw_cte()},
    parsed AS (
      SELECT city,
             CAST(replace(replace(amount, '$', ''), ',', '') AS DOUBLE) AS usd,
             CAST(tss AS TIMESTAMP) AS ts
      FROM raw
    )
    SELECT CAST(hour(ts) AS INTEGER) AS "Hour",
           city AS "Merchant_City",
           CAST(COUNT(*) AS BIGINT) AS n_txns,
           CAST(SUM(CAST(CASE WHEN usd > 0 THEN usd * {_RATE} END
                         AS DECIMAL(18,2))) AS DOUBLE) AS total_vnd
    FROM parsed
    WHERE usd > 500.0
    GROUP BY 1, 2
    """,
)
def pos_large_txn_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 (requirements.md:48, filter F5) through the driver gate:
    when/where large transactions (> $500) occur, by hour × city.

    Scale: the threshold predicate applies before the aggregate (at a
    parquet-backed fact it reaches the scan); the groupBy is
    map-side combinable."""
    return q6_large_txn_profile(_pos_fact(spark, sf_dir), threshold_usd=500.0)


@register(
    "pos_fraud_trend",
    oracle=lambda: f"""
    WITH {_raw_cte()},
    parsed AS (
      SELECT fraud,
             CAST(replace(replace(amount, '$', ''), ',', '') AS DOUBLE) AS usd,
             CAST(tss AS TIMESTAMP) AS ts
      FROM raw
    )
    SELECT CAST(hour(ts) AS INTEGER) AS "Hour",
           CAST(COUNT(*) AS BIGINT) AS n_fraud,
           CAST(SUM(CAST(CASE WHEN usd > 0 THEN usd * {_RATE} END
                         AS DECIMAL(18,2))) AS DOUBLE) AS fraud_vnd
    FROM parsed
    WHERE fraud = 'Yes'
    GROUP BY 1
    """,
)
def pos_fraud_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 (requirements.md:49) through the driver gate: fraud count
    and VND volume per hour — the fraud trend dimensioned on event
    time.

    Scale: predicate then 24-group aggregate; swap the dim argument
    for merchant/city trends, same plan."""
    return q7_fraud_trend(_pos_fact(spark, sf_dir), dim="Hour")


@register(
    "pos_above_avg_fraud_users",
    oracle=lambda: f"""
    WITH {_raw_cte()},
    per_user AS (
      SELECT u AS "User",
             CAST(SUM(CASE WHEN fraud = 'Yes' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_flagged
      FROM raw GROUP BY u
    ),
    mu AS (SELECT AVG(CAST(n_flagged AS DOUBLE)) AS mu FROM per_user)
    SELECT "User", n_flagged
    FROM per_user, mu
    WHERE CAST(n_flagged AS DOUBLE) > mu
    """,
)
def pos_above_avg_fraud_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 (requirements.md:51) through the driver gate: users whose
    fraud count exceeds the population average — per-user conditional
    count vs a broadcast scalar (no self-join). The average is an
    exact-integer sum divided once in double, identical on both
    engines.

    Scale: user-keyed aggregate + 1-row broadcast — the standard
    above-average idiom at any size."""
    return q9_above_avg_flag_users(_pos_fact(spark, sf_dir), flag="fraud")


@register(
    "pos_daily_operations",
    oracle=lambda: f"""
    WITH {_raw_cte()},
    parsed AS (
      SELECT u, fraud,
             CAST(replace(replace(amount, '$', ''), ',', '') AS DOUBLE) AS usd,
             CAST(tss AS TIMESTAMP) AS ts
      FROM raw
    )
    SELECT CAST(year(ts) AS INTEGER) AS "Year",
           CAST(month(ts) AS INTEGER) AS "Month",
           CAST(day(ts) AS INTEGER) AS "Day",
           CAST(COUNT(*) AS BIGINT) AS n_txns,
           CAST(COUNT(DISTINCT u) AS BIGINT) AS n_users,
           CAST(SUM(CAST(CASE WHEN usd > 0 THEN usd * {_RATE} END
                         AS DECIMAL(18,2))) AS DOUBLE) AS total_vnd,
           CAST(SUM(CASE WHEN fraud = 'Yes' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_fraud,
           ROUND(CAST(SUM(CASE WHEN fraud = 'Yes' THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS fraud_rate,
           CAST(SUM(CASE WHEN usd > 500.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_large
    FROM parsed
    GROUP BY 1, 2, 3
    """,
)
def pos_daily_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 synthesis (requirements.md:52-53) through the driver gate:
    the daily operations report over the simulator fact — volume,
    active users, VND value, fraud count/rate, and large-transaction
    count per calendar day, in ONE multi-signal rollup. With
    Q0–Q9 as their own ``pos_*`` gate rows, this completes
    driver-verified coverage of the reference's entire OLAP question
    list on its own pipeline's fact.

    Scale: one day-keyed aggregate; the distinct-user count is the
    only non-combinable term (exact here; swap for
    approx_count_distinct at 100 TB if a bounded error is
    acceptable)."""
    fact = _pos_fact(spark, sf_dir)
    fraud = F.when(F.col("Is_Fraud") == "Yes", 1).otherwise(0)
    large = F.when(F.col("Amount_USD") > 500.0, 1).otherwise(0)
    return fact.groupBy("Year", "Month", "Day").agg(
        F.count("*").alias("n_txns"),
        F.countDistinct("User").cast("bigint").alias("n_users"),
        F.sum(_vnd_dec()).cast("double").alias("total_vnd"),
        F.sum(fraud).cast("bigint").alias("n_fraud"),
        F.round(F.sum(fraud).cast("double") / F.count("*"), 6).alias(
            "fraud_rate"
        ),
        F.sum(large).cast("bigint").alias("n_large"),
    )


def _vnd_dec():
    return F.col("Amount_VND").cast("decimal(18,2)")


@register(
    "pos_stream_user_totals",
    oracle=lambda: f"""
    WITH {_raw_cte()}
    SELECT u AS "User",
           CAST(COUNT(*) AS BIGINT) AS n_txns,
           CAST(SUM(CAST(replace(replace(amount, '$', ''), '.', '')
                         AS BIGINT)) AS BIGINT) AS total_cents
    FROM raw
    GROUP BY u
    """,
)
def pos_stream_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ST9 replay source driven END-TO-END by the STREAMING engine
    through the gate: the native Python-DataSource POS stream
    (deterministic offsets, {POS_ROWS} rows in 200-row micro-batches)
    feeds an incremental per-user aggregate in complete output mode;
    the memory-sink table is the result. Because rows are
    pure(seed, i), the DuckDB oracle knows the exact totals — the
    streaming path is hash-checked, not rows-only. Money is summed as
    exact integer cents parsed from the '$x.xx' string.

    Scale: in production the same code reads the Kafka feed; state is
    one running (count, sum) pair per user key — the minimal stateful
    aggregate, partitioned on the grouping key.

    Runs on a CHILD session (``newSession()``: shared SparkContext,
    own SQLConf + catalog) so the state-partition sizing below never
    mutates the caller's ``spark.sql.shuffle.partitions`` — the same
    isolation the manifest sink uses for its active-session pitfall.
    The POS source registers under the child's own session-scoped
    name (see ``_ensure_pos_source``); the memory-sink table lands in
    the child's catalog, which is where the result is read from."""
    import uuid

    child = spark.newSession()
    # streaming state is one store per shuffle partition: size to the
    # 10-user keyspace for the run — on the child's conf only
    child.conf.set("spark.sql.shuffle.partitions", "4")
    stream = (
        child.readStream.format(_ensure_pos_source(child))
        .option("rows", POS_ROWS)
        .option("seed", POS_SEED)
        .option("rows_per_batch", 200)
        .load()
    )
    agg = stream.groupBy(F.col("User")).agg(
        F.count("*").alias("n_txns"),
        F.sum(
            F.regexp_replace(F.col("Amount"), r"[$.]", "").cast("bigint")
        )
        .cast("bigint")
        .alias("total_cents"),
    )
    name = f"pos_stream_totals_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(processingTime="0 seconds")
        .start()
    )
    # Python stream sources fall back to single-batch under
    # availableNow; a bounded feed + processAllAvailable drains the
    # same rows in real micro-batches instead.
    q.processAllAvailable()
    q.stop()
    return child.table(name)


# The daily-rates dimension for pos_daily_rates_vnd: five of the six
# event dates carry a quoted rate; 2024-01-18 is a deliberate FEED GAP
# so the left join's coalesce-to-default (DEFAULT_VND_PER_USD) is
# exercised through the gate, not just in pytest.
_DAILY_RATES: tuple[tuple[str, float], ...] = (
    ("2024-01-15", 24510.0),
    ("2024-01-16", 24655.0),
    ("2024-01-17", 24820.0),
    ("2024-01-19", 25130.0),
    ("2024-01-20", 25240.0),
)


def _rates_values_sql() -> str:
    rows = ", ".join(f"('{d}', {r})" for d, r in _DAILY_RATES)
    return (
        "rates(rate_date, rate_vnd_per_usd) AS (SELECT * FROM (VALUES "
        + rows
        + "))"
    )


@register(
    "pos_daily_rates_vnd",
    oracle=lambda: f"""
    WITH {_raw_cte()},
    {_rates_values_sql()},
    parsed AS (
      SELECT CAST(replace(replace(amount, '$', ''), ',', '') AS DOUBLE)
               AS usd,
             strftime(CAST(tss AS TIMESTAMP), '%Y-%m-%d') AS d
      FROM raw
    ),
    joined AS (
      SELECT p.d, COALESCE(r.rate_vnd_per_usd, {_RATE}.0) AS rate, p.usd
      FROM parsed p LEFT JOIN rates r ON p.d = r.rate_date
    )
    SELECT d AS rate_date,
           CAST(rate AS INTEGER) AS ex_rate,
           CAST(COUNT(*) AS BIGINT) AS n_txns,
           CAST(COUNT(CASE WHEN usd > 0 THEN 1 END) AS BIGINT)
             AS n_converted,
           CAST(SUM(CASE WHEN usd > 0
                         THEN CAST(usd * rate AS DECIMAL(18,2)) END)
                AS DOUBLE) AS total_vnd
    FROM joined
    GROUP BY d, rate
    """,
)
def pos_daily_rates_vnd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The M4/P14-spec daily-rate enrichment (transforms/enrich.py)
    through the driver gate: the simulator fact joined to ITS DAY'S
    rate via a broadcast left join, with the 2024-01-18 feed gap
    falling back to the default rate ({_RATE}) instead of dropping
    rows — the spec-correct alternative to the reference's single
    startup-rate closure (scripts/spark_streaming_consumer.py:72-86).
    Result: per (event date, applied rate) txn counts, converted-row
    counts, and the VND total summed as exact DECIMAL(18,2).

    Scale: the rates dimension is rows-per-day tiny → always a
    broadcast hash join; the fact side keeps its partitioning (no
    shuffle before the final keyed aggregate). The per-row double
    usd*rate has ≤2 true decimals (cents × integer rate / 100), so the
    DECIMAL(18,2) cast lands exactly on the same value in both engines.
    """
    from olap_project_spark.transforms.enrich import enrich_with_daily_rates

    raw = (
        spark.read.format(_ensure_pos_source(spark))
        .option("rows", POS_ROWS)
        .option("seed", POS_SEED)
        .option("partitions", 8)
        .load()
    )
    rates = local_frame(spark, 
        list(_DAILY_RATES), schema="rate_date string, rate_vnd_per_usd double"
    )
    fact = enrich_with_daily_rates(raw, rates, processed_at="2024-01-15 08:30:20")
    return (
        fact.withColumn(
            "rate_date", F.date_format("Transaction_Date", "yyyy-MM-dd")
        )
        .groupBy("rate_date", F.col("Exchange_Rate").alias("ex_rate"))
        .agg(
            F.count("*").alias("n_txns"),
            F.count("Amount_VND").cast("bigint").alias("n_converted"),
            F.sum(_vnd_dec()).cast("double").alias("total_vnd"),
        )
    )


@register(
    "pos_route_counts",
    oracle=lambda: f"""
    WITH {_raw_cte()},
    parsed AS (
      SELECT u, card, err, fraud,
             CAST(replace(replace(amount, '$', ''), ',', '') AS DOUBLE)
               AS usd,
             CAST(tss AS TIMESTAMP) IS NOT NULL AS valid_date
      FROM raw
    ),
    vnd AS (
      SELECT *, CASE WHEN usd > 0
                     THEN CAST(usd * {_RATE} AS DECIMAL(18,2)) END AS v
      FROM parsed
    )
    SELECT 'error' AS stream, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(v) AS DOUBLE) AS total_vnd
    FROM vnd WHERE err IS NOT NULL AND err <> ''
    UNION ALL
    SELECT 'fraud', CAST(COUNT(*) AS BIGINT), CAST(SUM(v) AS DOUBLE)
    FROM vnd WHERE fraud = 'Yes'
    UNION ALL
    SELECT 'invalid', CAST(COUNT(*) AS BIGINT), CAST(NULL AS DOUBLE)
    FROM vnd
    WHERE (err IS NULL OR err = '') AND fraud = 'No'
      AND (usd IS NULL OR usd <= 0 OR length(card) < 16 OR NOT valid_date)
    UNION ALL
    SELECT 'valid', CAST(COUNT(*) AS BIGINT), CAST(SUM(v) AS DOUBLE)
    FROM vnd
    WHERE u IS NOT NULL AND card IS NOT NULL AND length(card) >= 16
      AND usd > 0 AND valid_date
    """,
)
def pos_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The foreachBatch ingest pipeline (ST4 + F1-F4) driven END-TO-END
    through the gate: the POS stream replays in 200-row micro-batches
    through ``start_pipeline`` — ONE streaming query, clean() once per
    batch, four routed sinks (valid/fraud parquet partitioned
    Year/Month/Day, error parquet, invalid CSV audit) — and the result
    is what the SINKS contain, read back per stream: row count + VND
    total (exact DECIMAL(18,2) sums). The DuckDB oracle re-derives the
    four reference-mode routing predicates
    (scripts/spark_streaming_consumer.py:254-281) over the embedded
    rows, so the classifier is driver-verified end-to-end, not just
    pytest-golden. Expected mix at seed {POS_SEED}: all {POS_ROWS} rows
    well-formed (valid), a fraud subset, an Errors subset, zero
    invalid — the empty-sink leg checks the audit CSV stays readable.

    Scale: the same code is the production ingest; the batch is
    persisted once and the four filters are codegen'd scans over it
    (the reference re-read Kafka once per sink); sinks use
    maxRecordsPerFile, never coalesce(1)."""
    import shutil
    import tempfile

    from olap_project_spark.schemas import INVALID_LOG_COLUMNS
    from olap_project_spark.streaming.pipeline import start_pipeline

    stream = (
        spark.readStream.format(_ensure_pos_source(spark))
        .option("rows", POS_ROWS)
        .option("seed", POS_SEED)
        # 400-row batches: two real micro-batches through four sinks —
        # multi-batch semantics at half the per-batch sink overhead
        .option("rows_per_batch", 400)
        .load()
    )
    root = tempfile.mkdtemp(prefix="pos_route_")
    try:
        q = start_pipeline(
            stream,
            out_dir=f"{root}/out",
            checkpoint_dir=f"{root}/ckpt",
            processed_at="2024-01-15 08:30:20",
            trigger={"processingTime": "0 seconds"},
        )
        q.processAllAvailable()
        q.stop()

        def sink_stats(name: str, df: DataFrame) -> DataFrame:
            return df.agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(_vnd_dec()).cast("double").alias("total_vnd"),
            ).select(F.lit(name).alias("stream"), "n_rows", "total_vnd")

        valid = spark.read.parquet(f"{root}/out/valid")
        fraud = spark.read.parquet(f"{root}/out/fraud")
        error = spark.read.parquet(f"{root}/out/error")
        # the invalid audit sink may be legitimately empty (only a
        # _SUCCESS marker) — an explicit schema keeps it readable
        inv_schema = ", ".join(f"`{c}` string" for c in INVALID_LOG_COLUMNS)
        invalid = (
            spark.read.schema(inv_schema)
            .option("header", True)
            .csv(f"{root}/out/invalid")
        )
        inv_stats = invalid.agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.lit(None).cast("double").alias("total_vnd"),
        ).select(F.lit("invalid").alias("stream"), "n_rows", "total_vnd")

        out = (
            sink_stats("error", error)
            .unionByName(sink_stats("fraud", fraud))
            .unionByName(inv_stats)
            .unionByName(sink_stats("valid", valid))
        )
        # materialize before the sink root is deleted
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "pos_stream_manifest_ingest",
    oracle=lambda: f"""
    WITH {_raw_cte()}
    SELECT u AS "User",
           CAST(COUNT(*) AS BIGINT) AS n_txns,
           CAST(SUM(CAST(replace(replace(amount, '$', ''), '.', '')
                         AS BIGINT)) AS BIGINT) AS total_cents
    FROM raw
    GROUP BY u
    """,
)
def pos_stream_manifest_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST3 + K4 driver-verified TOGETHER: the POS stream replays in
    real micro-batches through a foreachBatch that appends each
    batch through the manifest-commit exactly-once sink
    (export/manifest_sink.py — one snapshot version per micro-batch);
    the stream is then RESTARTED from the same checkpoint, which must
    replay nothing (committed offsets) and add no versions; the result
    is per-user (count, exact-cents total) read back from the
    COMMITTED manifests only. If the restart double-loaded (the
    reference DAG's unfenced WRITE_APPEND hole) or a staging file
    leaked into the read, the totals double and the oracle hash
    catches it.

    Scale: the same two fences production needs at 100 TB — source
    offsets in the checkpoint (replay protection) and the O(tasks)
    manifest commit (partial-write protection) — with data flowing
    through ordinary parallel file writes."""
    import shutil
    import tempfile

    from olap_project_spark.export.manifest_sink import (
        ensure_manifest_sink,
        read_committed,
        save_manifest,
        table_versions,
    )

    ensure_manifest_sink(spark)  # register the read format on this session
    root = tempfile.mkdtemp(prefix="pos_manifest_")
    table = f"{root}/user_events"
    ckpt = f"{root}/ckpt"

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = batch_df.select(
            F.col("User"),
            F.regexp_replace(F.col("Amount"), r"[$.]", "")
            .cast("bigint")
            .alias("cents"),
        )
        save_manifest(out, table)

    def run_once() -> None:
        stream = (
            spark.readStream.format(_ensure_pos_source(spark))
            .option("rows", POS_ROWS)
            .option("seed", POS_SEED)
            # two micro-batches → two snapshot versions; the restart
            # fence and per-batch commit are identical in kind at half
            # the engine overhead
            .option("rows_per_batch", 400)
            .load()
        )
        q = (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    try:
        run_once()
        versions_after_first = table_versions(table)
        run_once()  # checkpoint restart: committed offsets → no-op
        if table_versions(table) != versions_after_first:
            raise AssertionError(
                "checkpoint restart added snapshot versions — "
                "exactly-once fence broken"
            )
        committed = read_committed(
            spark, table, schema="`User` string, cents bigint"
        )
        out = committed.groupBy("User").agg(
            F.count("*").cast("bigint").alias("n_txns"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "pos_stream_merge_upsert",
    oracle=lambda: f"""
    WITH {_raw_cte()},
    b1 AS (SELECT DISTINCT u FROM raw WHERE i < 400),
    b2 AS (SELECT DISTINCT u FROM raw WHERE i >= 400)
    SELECT (SELECT CAST(COUNT(DISTINCT u) AS BIGINT) FROM raw) AS n_users,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM raw) AS total_txns,
           (SELECT CAST(SUM(CAST(replace(replace(amount, '$', ''), '.', '')
                                 AS BIGINT)) AS BIGINT) FROM raw)
             AS total_cents,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM b1)
             + (SELECT CAST(COUNT(*) AS BIGINT) FROM b2
                WHERE u NOT IN (SELECT u FROM b1)) AS n_inserts,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM b2
            WHERE u IN (SELECT u FROM b1)) AS n_updates,
           CAST(2 AS BIGINT) AS n_versions
    """,
)
def pos_stream_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MERGE into the lakehouse table — the Delta-style
    "foreachBatch upsert" pattern: each micro-batch aggregates its
    per-user delta, classifies keys against the CURRENT committed
    state (insert = first sighting, update = existing key), merges
    additively, and commits the merged state as one REWRITE snapshot
    through the exactly-once manifest sink — so the keyed table always
    holds exactly one row per user and every batch is one atomic
    version. The oracle pins per-batch insert/update arithmetic from
    the embedded generator rows (batch boundary at row 400), the final
    exact-cents state, and the version count.

    Scale: the CDC-to-lakehouse shape at 100 TB — the delta is keyed
    and tiny relative to the table; the additive merge is a
    unionByName + hash re-aggregate on the key (at real scale: a
    bucketed MERGE keyed the same way, functions/merge.py); the
    commit stays O(tasks). The insert/update counts are bounded
    per-batch key-set aggregates."""
    import shutil
    import tempfile

    from olap_project_spark.export.manifest_sink import (
        ensure_manifest_sink,
        read_committed,
        save_manifest,
        table_versions,
    )

    src_fmt = _ensure_pos_source(spark)
    ensure_manifest_sink(spark)  # register the read format on this session
    root = tempfile.mkdtemp(prefix="pos_merge_")
    table = f"{root}/user_state"
    ckpt = f"{root}/ckpt"
    state_schema = "`User` string, n_txns bigint, total_cents bigint"
    counters = {"inserts": 0, "updates": 0}

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        bs = batch_df.sparkSession
        delta = (
            batch_df.select(
                F.col("User"),
                F.regexp_replace(F.col("Amount"), r"[$.]", "")
                .cast("bigint")
                .alias("cents"),
            )
            .groupBy("User")
            .agg(
                F.count("*").cast("bigint").alias("n_txns"),
                F.sum("cents").cast("bigint").alias("total_cents"),
            )
        )
        current = read_committed(bs, table, state_schema)
        # bounded key-set classification (|delta keys| rows) — matched
        # and unmatched counts from ONE left-join aggregate instead of
        # a semi-join count plus a recount of the delta
        cls = (
            delta.join(
                current.select("User").withColumn("__m", F.lit(1)),
                "User",
                "left",
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.count("__m").alias("n_upd"),
            )
            .collect()[0]
        )
        counters["updates"] += cls["n_upd"]
        counters["inserts"] += cls["n"] - cls["n_upd"]
        merged = (
            current.unionByName(delta)
            .groupBy("User")
            .agg(
                F.sum("n_txns").cast("bigint").alias("n_txns"),
                F.sum("total_cents").cast("bigint").alias("total_cents"),
            )
        )
        save_manifest(merged, table, kind="rewrite")

    try:
        stream = (
            spark.readStream.format(src_fmt)
            .option("rows", POS_ROWS)
            .option("seed", POS_SEED)
            .option("rows_per_batch", 400)
            .load()
        )
        q = (
            stream.writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        state = read_committed(spark, table, state_schema)
        summary = state.agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum("n_txns").cast("bigint").alias("total_txns"),
            F.sum("total_cents").cast("bigint").alias("total_cents"),
        ).collect()[0]
        n_versions = len(table_versions(table))
        return local_frame(spark, 
            [
                (
                    summary["n_users"],
                    summary["total_txns"],
                    summary["total_cents"],
                    counters["inserts"],
                    counters["updates"],
                    n_versions,
                )
            ],
            "n_users bigint, total_txns bigint, total_cents bigint, "
            "n_inserts bigint, n_updates bigint, n_versions bigint",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "manifest_lifecycle_stats",
    oracle=lambda: f"""
    WITH {_raw_cte()}
    SELECT CAST(4 AS BIGINT) AS versions_ingested,
           CAST(4 AS BIGINT) AS files_before,
           CAST(5 AS BIGINT) AS versions_after_compact,
           CAST(200 AS BIGINT) AS rows_at_v1_precompact,
           CAST(1 AS INTEGER) AS state_identical_after_compact,
           CAST(1 AS BIGINT) AS orphans_deleted,
           CAST(4 AS BIGINT) AS expired_manifests,
           CAST(4 AS BIGINT) AS expired_files,
           CAST(1 AS BIGINT) AS versions_after_vacuum,
           CAST(0 AS BIGINT) AS rows_at_v1_postvacuum,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM raw) AS n_txns,
           (SELECT CAST(SUM(CAST(replace(replace(amount, '$', ''), '.', '')
                                 AS BIGINT)) AS BIGINT) FROM raw)
             AS total_cents
    """,
)
def manifest_lifecycle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL lakehouse maintenance lifecycle over a STREAMED table,
    in one run: micro-batched ingest through the manifest-commit sink
    (4 batches → 4 snapshot versions, one coalesced parquet file each)
    → small-file compaction (one rewrite snapshot; pre-compaction
    versions still time-travelable) → VACUUM (orphan GC + snapshot
    expiry to the rewrite base) → re-reads proving version retention.
    The reference's daily DAG compacted nothing and could not expire
    anything (no snapshot log at all); this is the maintenance loop a
    100-TB streamed table cannot operate without.

    Every transition is verified by a value in the row, not a side
    assertion: the per-user state before and after compaction is
    diffed distributedly (``exceptAll`` both ways — byte-identical
    table state, emitted as ``state_identical_after_compact``);
    ``rows_at_v1_precompact`` proves time travel still works across
    the compaction; the vacuum counters prove exactly the 4 pre-rewrite
    manifests and their 4 data files (plus 1 planted orphan) were
    collected; ``rows_at_v1_postvacuum`` proves expiry SHORTENED time
    travel (v1 reads empty); and (n_txns, total_cents) re-aggregate
    the surviving committed state — if compaction or vacuum lost or
    doubled a single row, the exact-cents total flips and the oracle
    hash catches it."""
    import os
    import shutil
    import tempfile

    from olap_project_spark.export.manifest_sink import (
        compact_snapshots,
        ensure_manifest_sink,
        read_committed,
        save_manifest,
        table_versions,
        vacuum_snapshots,
    )

    ensure_manifest_sink(spark)  # register the read format on this session
    root = tempfile.mkdtemp(prefix="manifest_lifecycle_")
    table = f"{root}/user_events"
    ckpt = f"{root}/ckpt"
    schema = "`User` string, cents bigint"

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = batch_df.select(
            F.col("User"),
            F.regexp_replace(F.col("Amount"), r"[$.]", "")
            .cast("bigint")
            .alias("cents"),
        )
        # one file per micro-batch commit → deterministic file counts;
        # at real scale you keep the natural task parallelism and the
        # counts scale with it (commit cost is O(tasks) either way)
        save_manifest(out.coalesce(1), table)

    try:
        stream = (
            spark.readStream.format(_ensure_pos_source(spark))
            .option("rows", POS_ROWS)
            .option("seed", POS_SEED)
            .option("rows_per_batch", 200)  # 4 micro-batches
            .load()
        )
        q = (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        q.processAllAvailable()
        q.stop()

        versions_ingested = len(table_versions(table))
        staging = os.path.join(table, "_staging")
        files_before = len(os.listdir(staging))
        state_before = read_committed(spark, table, schema)
        rows_at_v1_pre = read_committed(spark, table, schema, as_of=1).count()

        # plant the residue of a failed attempt whose abort never ran —
        # vacuum's orphan GC must collect exactly this one file
        with open(os.path.join(staging, "part-orphan.parquet"), "wb") as f:
            f.write(b"PAR1")

        compact_snapshots(spark, table, schema)
        versions_after_compact = len(table_versions(table))
        state_after = read_committed(spark, table, schema)
        # byte-identical table state across the compaction, verified
        # distributedly (no driver-side row materialization)
        state_identical = int(
            state_before.exceptAll(state_after)
            .unionAll(state_after.exceptAll(state_before))
            .isEmpty()  # one symmetric-diff job, not two
        )

        v = vacuum_snapshots(table)  # default keep_from = the rewrite
        rows_at_v1_post = read_committed(spark, table, schema, as_of=1).count()
        final = read_committed(spark, table, schema)
        totals = final.agg(
            F.count("*").cast("bigint").alias("n_txns"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        ).collect()[0]
        return local_frame(spark, 
            [
                (
                    versions_ingested,
                    files_before,
                    versions_after_compact,
                    rows_at_v1_pre,
                    state_identical,
                    v["orphans_deleted"],
                    v["expired_manifests"],
                    v["expired_files"],
                    len(v["kept_versions"]),
                    rows_at_v1_post,
                    totals["n_txns"],
                    totals["total_cents"],
                )
            ],
            "versions_ingested bigint, files_before bigint, "
            "versions_after_compact bigint, rows_at_v1_precompact bigint, "
            "state_identical_after_compact int, orphans_deleted bigint, "
            "expired_manifests bigint, expired_files bigint, "
            "versions_after_vacuum bigint, rows_at_v1_postvacuum bigint, "
            "n_txns bigint, total_cents bigint",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


WAP_LIMIT_CENTS = 497_000  # audit rule: no single txn above $4,970


@register(
    "pos_stream_wap_ingest",
    oracle=lambda: f"""
    WITH {_raw_cte()},
    per AS (
      SELECT (i // 200) AS batch_id,
             CAST(COUNT(*) AS BIGINT) AS n_staged,
             CAST(COUNT(CASE WHEN CAST(replace(replace(amount, '$', ''),
                                              '.', '') AS BIGINT)
                             > {WAP_LIMIT_CENTS} THEN 1 END) AS BIGINT)
               AS n_violations
      FROM raw GROUP BY 1
    )
    SELECT CAST(batch_id AS INTEGER) AS batch_id,
           n_staged,
           n_violations,
           CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS INTEGER)
             AS published,
           (SELECT CAST(COALESCE(SUM(n_staged), 0) AS BIGINT)
            FROM per WHERE n_violations = 0) AS rows_in_main
    FROM per ORDER BY batch_id
    """,
)
def pos_stream_wap_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING ingest through the write-audit-publish quarantine —
    the composition of the engine's two strongest fences: each POS
    micro-batch lands on its OWN lakehouse branch (invisible to main
    readers), a per-batch AUDIT runs against the branch read (here: no
    single transaction above ${WAP_LIMIT_CENTS // 100}), and the batch
    is PUBLISHED (atomic fast-forward tag drop) only on a green audit —
    a red batch is abandoned with pure GC and main never sees one of
    its rows. The reference pipeline (spark_streaming_consumer.py →
    BigQuery WRITE_APPEND) streams bad rows straight into the serving
    table and cleans up after the fact.

    The result is the per-batch ingest ledger (staged rows, violations,
    published flag) plus ``rows_in_main``, the total the published
    batches contributed — hash-pinned, so one leaked quarantined row
    flips the gate. With the fixture's 4 batches, batches 0 and 2 carry
    over-limit transactions and are abandoned; 1 and 3 publish.

    Scale: per-batch audit cost is O(batch) on the branch read; publish
    is O(#manifests) metadata. This is exactly Iceberg's WAP pattern
    under a Structured Streaming foreachBatch."""
    import shutil
    import tempfile

    from olap_project_spark.export.manifest_sink import (
        abandon_branch,
        ensure_manifest_sink,
        publish_branch,
        read_committed,
        save_manifest,
    )

    ensure_manifest_sink(spark)  # register the read format on this session
    root = tempfile.mkdtemp(prefix="pos_wap_")
    table = f"{root}/txns"
    ckpt = f"{root}/ckpt"
    schema = "`User` string, cents bigint"
    ledger: dict[int, tuple[int, int, int]] = {}

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        branch = f"b{batch_id}"
        out = batch_df.select(
            F.col("User"),
            F.regexp_replace(F.col("Amount"), r"[$.]", "")
            .cast("bigint")
            .alias("cents"),
        )
        # staged-row count from the commit messages (re-counting would
        # re-run the batch projection); the audit still reads the
        # BRANCH state — what publish would make main
        n_staged = save_manifest(out.coalesce(1), table, branch=branch)[
            "n_rows"
        ]
        branch_view = read_committed(spark, table, schema, branch=branch)
        violations = branch_view.filter(
            F.col("cents") > WAP_LIMIT_CENTS
        ).count()
        if violations == 0:
            publish_branch(table, branch)
            published = 1
        else:
            abandon_branch(table, branch)
            published = 0
        ledger[int(batch_id)] = (n_staged, violations, published)

    stream = (
        spark.readStream.format(_ensure_pos_source(spark))
        .option("rows", POS_ROWS)
        .option("seed", POS_SEED)
        .option("rows_per_batch", 200)
        .load()
    )
    try:
        q = (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        rows_in_main = read_committed(spark, table, schema).count()
        return local_frame(spark, 
            [
                (b, n, v, p, rows_in_main)
                for b, (n, v, p) in sorted(ledger.items())
            ],
            "batch_id int, n_staged bigint, n_violations bigint, "
            "published int, rows_in_main bigint",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
