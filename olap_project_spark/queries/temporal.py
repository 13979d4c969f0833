"""Temporal join operators Spark lacks as built-ins — as-of
(point-in-time) join and range join — implemented as compositions of
existing DataFrame ops (the task brief's option (a)), with DuckDB's
native ASOF JOIN / inequality joins as the oracles.

As-of join, the Spark-scalable formulation: union the two timelines,
sort per key by (time, side), and carry the last dimension row forward
with ``last(..., ignorenulls=True)`` over an unbounded-preceding frame.
One shuffle on the key, no per-row probe — this is how you do
point-in-time enrichment of 100 TB of events against a slowly-changing
dimension (the alternative — a range join — is quadratic per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from olap_project_spark.functions.localframe import local_frame
from olap_project_spark.queries import load, register

DEC = "decimal(18,2)"


# --------------------------------------------------------------------------
# As-of join: each event ↔ the user's latest order at-or-before it
# --------------------------------------------------------------------------
@register(
    "asof_last_order",
    oracle="""
    WITH ords AS (
      -- one row per (custkey, orderdate): greatest orderkey wins, so
      -- the as-of match is deterministic under date ties
      SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    ),
    ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
    SELECT ev.event_id,
           ev.user_id,
           strftime(ords.o_orderdate, '%Y-%m-%d') AS last_order_date,
           ords.o_orderkey AS last_orderkey,
           CAST(datediff('day', ords.o_orderdate, ev.ts) AS INTEGER) AS days_since_order
    FROM ev ASOF JOIN ords
      ON ev.user_id = ords.o_custkey AND ev.ts >= ords.o_orderdate
    """,
)
def asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN: for every event, the user's most recent order at or
    before the event time (point-in-time-correct enrichment — the
    feature-store join).

    Spark has no ASOF JOIN; this is the union-and-carry-forward
    composition: both timelines union on (key, time), a per-key window
    ordered by (time, side) carries the latest order's columns forward
    with last(ignorenulls), and the event rows are kept. Exactly one
    shuffle (by key) regardless of how many dimension versions exist.

    The DuckDB oracle uses its native ASOF JOIN — matching results
    prove the composition implements the standard semantics."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", F.col("user_id").alias("k"), F.col("ts").alias("t")
    )
    ords = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("k"), F.col("o_orderdate").alias("t")
        )
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    left = ev.select(
        "k", "t", "event_id",
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp").alias("o_date"),
        F.lit(1).alias("is_event"),
    )
    right = ords.select(
        "k", "t",
        F.lit(None).cast("long").alias("event_id"),
        "o_orderkey",
        F.col("t").alias("o_date"),
        F.lit(0).alias("is_event"),
    )
    # at equal timestamps the order row sorts first (is_event 0 < 1) →
    # "at-or-before" is inclusive
    w = (
        Window.partitionBy("k")
        .orderBy("t", "is_event", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        left.unionByName(right)
        .withColumn("last_orderkey", F.last("o_orderkey", ignorenulls=True).over(w))
        .withColumn("last_order_ts", F.last("o_date", ignorenulls=True).over(w))
        .filter(F.col("is_event") == 1)
        .filter(F.col("last_orderkey").isNotNull())  # inner asof
    )
    return carried.select(
        "event_id",
        F.col("k").alias("user_id"),
        F.date_format("last_order_ts", "yyyy-MM-dd").alias("last_order_date"),
        "last_orderkey",
        F.datediff(F.to_date("t"), F.to_date("last_order_ts"))
        .cast("int")
        .alias("days_since_order"),
    )


# --------------------------------------------------------------------------
# Range join: prices ↔ a band dimension (lo ≤ p < hi)
# --------------------------------------------------------------------------
PRICE_BANDS = [
    ("budget", 0, 20_000),
    ("mid", 20_000, 45_000),
    ("premium", 45_000, 70_000),
    ("luxury", 70_000, 10_000_000),
]


@register(
    "price_band_distribution",
    oracle=f"""
    WITH bands(band, lo, hi) AS (VALUES
      {", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in PRICE_BANDS)})
    SELECT band,
           COUNT(*) AS n_items,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS band_revenue
    FROM lineitem JOIN bands
      ON l_extendedprice >= lo AND l_extendedprice < hi
    GROUP BY band
    """,
)
def price_band_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE JOIN: each lineitem matched to its price band
    (lo ≤ price < hi) — the interval-dimension join shape (tiering,
    SLA buckets, geo ranges).

    Scale: the band table is tiny → broadcast nested-loop with interval
    predicates, evaluated stream-side with zero shuffle. For a LARGE
    interval dimension, quantize both sides to a bucket key
    (floor(p/width)) and equi-join bucket-to-overlapping-bucket — turns
    the nested loop into a hash join."""
    li = load(spark, sf_dir, "lineitem")
    bands = local_frame(spark, PRICE_BANDS, "band STRING, lo LONG, hi LONG")
    return (
        li.join(
            F.broadcast(bands),
            (F.col("l_extendedprice") >= F.col("lo"))
            & (F.col("l_extendedprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice").cast(DEC)).cast("double"), 2
            ).alias("band_revenue"),
        )
    )


# --------------------------------------------------------------------------
# Decile windows (ntile)
# --------------------------------------------------------------------------
@register(
    "customer_spend_deciles",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT o_custkey, total_spend,
             CAST(ntile(10) OVER (ORDER BY total_spend DESC, o_custkey) AS INTEGER)
               AS decile
      FROM spend
    )
    SELECT decile,
           COUNT(*) AS n_customers,
           ROUND(SUM(total_spend), 2) AS decile_spend
    FROM ranked
    GROUP BY decile
    """,
)
def customer_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-value deciles via ntile(10) — the cohort-bucketing
    window shape (whale analysis / pareto curves).

    Scale: ntile over a GLOBAL order is normally a single-partition
    window; here the global rank comes from the RANGE-PARTITIONED
    two-pass row_number (functions/scale.global_order_stats) and the
    tile id is derived arithmetically from (rank, n) with exact
    SQL-standard ntile semantics (functions/scale.ntile_from_rank) —
    bucket-for-bucket identical to ntile(10) with no single-task sort
    of the customer dimension."""
    from olap_project_spark.functions.scale import (
        global_order_stats,
        ntile_from_rank,
    )

    od = load(spark, sf_dir, "orders")
    spend = od.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total_spend")
    )
    n_tot = spend.agg(F.count("*").alias("_n"))
    ranked = global_order_stats(
        spend, [F.desc("total_spend"), F.asc("o_custkey")], rank_col="_i"
    ).join(F.broadcast(n_tot))
    ranked = ranked.withColumn(
        "decile", ntile_from_rank(F.col("_i"), F.col("_n"), 10)
    )
    return ranked.groupBy("decile").agg(
        F.count("*").alias("n_customers"),
        F.round(F.sum("total_spend"), 2).alias("decile_spend"),
    )


# --------------------------------------------------------------------------
# Time-range window frame (RANGE BETWEEN INTERVAL ... PRECEDING)
# --------------------------------------------------------------------------
@register(
    "rolling_week_spend",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderdate
                  RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS spend_7d,
           CAST(COUNT(*) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderdate
                  RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
                AS BIGINT) AS orders_7d
    FROM orders
    """,
)
def rolling_week_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day spend per customer at each order — a TIME-RANGE
    window frame (``RANGE BETWEEN INTERVAL``), not a row-count frame:
    the frame holds every order whose date falls in the closed interval
    [current − 6 days, current], however many rows that is. Spark has
    no interval literal in ``rangeBetween``, so the timestamp is
    ordered as epoch seconds and the frame is ±seconds — semantically
    identical for fixed-width intervals (no DST in naive timestamps).
    TIMESTAMP_NTZ has no direct long cast in Spark 4; routing through
    TIMESTAMP_LTZ is exact because the session timezone is pinned UTC.

    Scale: state is one running frame per customer partition — scales
    out by key like every other window here; frame eviction is O(1)
    per row (monotone order)."""
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp_ltz").cast("long"))
        .rangeBetween(-6 * 86400, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("spend_7d"),
        F.count("*").over(w).cast("bigint").alias("orders_7d"),
    )


# --------------------------------------------------------------------------
# RFM segmentation (recency / frequency / monetary quartiles)
# --------------------------------------------------------------------------
@register(
    "rfm_segments",
    oracle="""
    WITH maxd AS (SELECT MAX(o_orderdate) AS d FROM orders),
    cust AS (
      SELECT o_custkey,
             date_diff('day', CAST(MAX(o_orderdate) AS DATE), CAST(maxd.d AS DATE))
               AS recency_days,
             COUNT(*) AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary_dec
      FROM orders, maxd
      GROUP BY o_custkey, maxd.d
    ),
    scored AS (
      SELECT o_custkey, monetary_dec,
             ntile(4) OVER (ORDER BY recency_days, o_custkey)       AS r_score,
             ntile(4) OVER (ORDER BY frequency DESC, o_custkey)     AS f_score,
             ntile(4) OVER (ORDER BY monetary_dec DESC, o_custkey)  AS m_score
      FROM cust
    )
    SELECT CAST(r_score * 100 + f_score * 10 + m_score AS INTEGER) AS rfm_segment,
           COUNT(*) AS n_customers,
           ROUND(CAST(SUM(monetary_dec) AS DOUBLE) / COUNT(*), 2) AS avg_monetary
    FROM scored
    GROUP BY 1
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: quartile-score each customer on Recency (days
    since last order), Frequency (order count), Monetary (exact decimal
    spend), concatenate the scores into a segment id (111..444), and
    profile each segment — the canonical customer-analytics rollup the
    reference's dashboards imply. Every ntile orders with the customer
    key as tiebreaker so quartile boundaries are deterministic
    cross-engine; monetary stays DECIMAL until the final division.

    Scale: the per-customer aggregate shuffles the fact once; each of
    the three quartile scores is a RANGE-PARTITIONED two-pass global
    rank (functions/scale.global_order_stats) turned into a tile id
    arithmetically (functions/scale.ntile_from_rank) — exact ntile(4)
    semantics with no single-task sort of the customer dimension in
    any of the three orderings."""
    from olap_project_spark.functions.scale import (
        global_order_stats,
        ntile_from_rank,
    )

    orders = load(spark, sf_dir, "orders")
    maxd = orders.agg(F.max("o_orderdate").alias("global_max"))
    cust = (
        orders.crossJoin(F.broadcast(maxd))
        .groupBy("o_custkey")
        .agg(
            F.datediff(
                F.to_date(F.first("global_max")), F.to_date(F.max("o_orderdate"))
            ).alias("recency_days"),
            F.count("*").alias("frequency"),
            F.sum(F.col("o_totalprice").cast(DEC)).alias("monetary_dec"),
        )
    )
    n_tot = cust.agg(F.count("*").alias("_n"))
    # Three INDEPENDENT rank passes joined on the customer key — not a
    # chain: chaining would put pass k-1's whole plan inside pass k's
    # range-exchange subtree, recomputing it per pass. Independent
    # passes each rank the bare per-customer aggregate (a canonically
    # identical subtree the scheduler reuses), and the final equi-joins
    # run on the reduced customer dimension.
    r_rank = global_order_stats(
        cust.select("o_custkey", "recency_days"),
        [F.asc("recency_days"), F.asc("o_custkey")],
        rank_col="_ir",
    ).select("o_custkey", "_ir")
    f_rank = global_order_stats(
        cust.select("o_custkey", "frequency"),
        [F.desc("frequency"), F.asc("o_custkey")],
        rank_col="_if",
    ).select("o_custkey", "_if")
    m_rank = global_order_stats(
        cust.select("o_custkey", "monetary_dec"),
        [F.desc("monetary_dec"), F.asc("o_custkey")],
        rank_col="_im",
    ).select("o_custkey", "_im")
    ranked = (
        cust.select("o_custkey", "monetary_dec")
        .join(r_rank, "o_custkey")
        .join(f_rank, "o_custkey")
        .join(m_rank, "o_custkey")
        .join(F.broadcast(n_tot))
    )
    scored = ranked.select(
        "monetary_dec",
        ntile_from_rank(F.col("_ir"), F.col("_n"), 4).alias("r_score"),
        ntile_from_rank(F.col("_if"), F.col("_n"), 4).alias("f_score"),
        ntile_from_rank(F.col("_im"), F.col("_n"), 4).alias("m_score"),
    )
    return (
        scored.groupBy(
            (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score"))
            .cast("int")
            .alias("rfm_segment")
        )
        .agg(
            F.count("*").alias("n_customers"),
            F.round(
                F.sum("monetary_dec").cast("double") / F.count("*"), 2
            ).alias("avg_monetary"),
        )
    )


# --------------------------------------------------------------------------
# SCD2 dimension build (effective-dated versions via lead)
# --------------------------------------------------------------------------
@register(
    "scd2_customer_price_ranges",
    oracle="""
    SELECT o_custkey AS cust_key,
           o_orderkey AS order_key,
           strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
           strftime(lead(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey),
                    '%Y-%m-%d') AS valid_to,
           ROUND(o_totalprice, 2) AS snapshot_price
    FROM orders
    """,
)
def scd2_customer_price_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a type-2 slowly-changing dimension from the order history:
    each order becomes a customer-state VERSION effective from its
    order date until the next order (open-ended for the current state,
    valid_to null) — the standard warehouse versioning the reference's
    append-only BigQuery table (SURVEY.md §1.1) cannot answer
    point-in-time questions without. Consumers range-join on
    valid_from <= ts < valid_to (the as-of composition in this module
    is the read side of exactly this shape).

    Determinism: same-day orders tie-break on order key, and the lead
    window uses the identical total order in both engines; dates emit
    as strings (DATE hashes differently via pandas across engines).

    Scale: one window pass partitioned by customer — the SCD2 build is
    a single shuffle at any scale, no self-join against the 'next
    version' as naive SQL would."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = load(spark, sf_dir, "orders")
    return o.select(
        F.col("o_custkey").alias("cust_key"),
        F.col("o_orderkey").alias("order_key"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
        F.date_format(F.lead("o_orderdate").over(w), "yyyy-MM-dd").alias(
            "valid_to"
        ),
        F.round("o_totalprice", 2).alias("snapshot_price"),
    )


# --------------------------------------------------------------------------
# Interval × interval overlap join — the second temporal-join shape
# Spark lacks natively (asof_last_order covers point-in-interval; this
# covers interval-overlap). Decomposed into an equi-join on time
# buckets with the "responsibility bucket" trick so no dedup pass is
# needed: a pair is emitted only in the single bucket where the later
# interval starts.
# --------------------------------------------------------------------------
OVERLAP_BUCKET_US = 900_000_000  # 15-minute buckets (≈ p99 session length)


@register(
    "session_overlap_pairs",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t,
             lag(CAST(ts AS TIMESTAMP))
               OVER (PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
      FROM events
    ),
    flag AS (
      SELECT user_id, t,
             CASE WHEN prev IS NULL OR epoch(t - prev) >= 1800
                  THEN 1 ELSE 0 END AS ns,
             event_id
      FROM seq
    ),
    sid AS (
      SELECT user_id, t,
             SUM(ns) OVER (PARTITION BY user_id ORDER BY t, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
      FROM flag
    ),
    sess AS (
      SELECT user_id, sid,
             epoch_us(MIN(t)) AS s_us, epoch_us(MAX(t)) AS e_us
      FROM sid GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.user_id AS user_a, b.user_id AS user_b,
             LEAST(a.e_us, b.e_us) - GREATEST(a.s_us, b.s_us) AS ov_us
      FROM sess a JOIN sess b
        ON a.user_id < b.user_id
       AND a.s_us <= b.e_us AND b.s_us <= a.e_us
    )
    SELECT user_a, user_b,
           CAST(COUNT(*) AS BIGINT) AS n_session_pairs,
           CAST(SUM(ov_us) AS BIGINT) AS total_overlap_us
    FROM pairs
    GROUP BY 1, 2
    ORDER BY total_overlap_us DESC, user_a, user_b
    LIMIT 25
    """,
)
def session_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which user pairs are online at the same time — an interval ×
    interval overlap self-join over 30-minute-gap sessions (the
    ``user_sessions`` boundary rule), reported as the 25 most
    co-present cross-user pairs with exact microsecond overlap.
    Touching endpoints count as overlapping (closed intervals, the
    ``concurrent_session_peaks`` sweep convention; a touch contributes
    0 µs but 1 pair).

    Scale — the range-join decomposition Spark has no native operator
    for: each session explodes into the 15-minute buckets it spans
    (bounded: sessions are gap-bounded, so buckets/session is small),
    the pair search becomes an EQUI-join on the bucket id, and the
    classic duplicate problem (a pair co-bucketed k times appears k
    times) is solved without any distinct shuffle by the
    responsibility-bucket rule: emit the pair only in the bucket where
    the LATER interval starts (``bucket = greatest(start_a, start_b)``)
    — that bucket is unique, and for truly overlapping pairs both
    intervals provably span it. Candidate pairs are Σ|bucket|², never
    |sessions|²; the oracle is the direct quadratic theta-join DuckDB
    can afford at sf0.01. The decomposition is factored as
    functions/temporal.interval_overlap_pairs and property-tested
    against the brute-force join (tests/test_interval_join.py)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(F.col("ts").cast("double")).over(w)
    new_session = F.when(
        prev.isNull() | ((F.col("ts").cast("double") - prev) >= 1800), 1
    ).otherwise(0)
    from olap_project_spark.functions.temporal import interval_overlap_pairs

    sess = (
        ev.withColumn("ns", new_session)
        .withColumn(
            "sid",
            F.sum("ns").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "sid")
        .agg(
            F.min(F.unix_micros("ts")).alias("s_us"),
            F.max(F.unix_micros("ts")).alias("e_us"),
        )
    )
    pairs = interval_overlap_pairs(
        sess,
        OVERLAP_BUCKET_US,
        s_col="s_us",
        e_col="e_us",
        distinct_on=F.col("a.user_id") < F.col("b.user_id"),
    ).select(
        F.col("a.user_id").alias("user_a"),
        F.col("b.user_id").alias("user_b"),
        F.col("ov").alias("ov_us"),
    )
    return (
        pairs.groupBy("user_a", "user_b")
        .agg(
            F.count("*").cast("bigint").alias("n_session_pairs"),
            F.sum("ov_us").cast("bigint").alias("total_overlap_us"),
        )
        .orderBy(F.col("total_overlap_us").desc(), "user_a", "user_b")
        .limit(25)
    )
