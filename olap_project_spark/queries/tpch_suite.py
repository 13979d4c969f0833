"""Classic decision-support query shapes (TPC-H Q4-Q22 analogs) adapted
to the star schema the driver generates — the multi-join / correlated-
subquery / OR-predicate long tail of SURVEY.md §2.4-§2.6 that the
reference's dashboard spec implies but never materializes.

Why these exist: the reference's analytics surface (requirements.md
Q0-Q9) covers single-fact aggregation; a switching user will also run
the warehouse-canon shapes — selective multi-way star joins, EXISTS /
NOT EXISTS, scalar subqueries, correlated per-key thresholds, OR-of-AND
predicate pushdown. Each query here is the Spark-first formulation with
an exact DuckDB oracle.

Shared scale design (local[32] test, 1000-executor target):
- dimension tables (region/nation/supplier/customer/part) broadcast;
  fact tables never shuffle for dimension joins;
- fact-fact joins (orders⋈lineitem) shuffle on the order key — at scale
  both sides would be bucketed on it (functions.scale.write_bucketed)
  making these joins shuffle-free;
- all single-table predicates sit directly on the scan so they reach
  parquet as pushed filters / row-group skips;
- money math in DECIMAL(18,2) (order-independent exact sums), ratios
  and averages derived from exact sums in double (see queries/__init__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olap_project_spark.queries import load, register

DEC = "decimal(18,2)"


def _dec(col: str):
    return F.col(col).cast(DEC)


def _disc_price():
    """l_extendedprice * (1 - l_discount) as an exact decimal."""
    return _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))


# --------------------------------------------------------------------------
# Q6-shape — pure filter + single aggregate (the pushdown showcase)
# --------------------------------------------------------------------------
@register(
    "revenue_increase_q6",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '2001-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def revenue_increase_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-shaped what-if: revenue that discounts in a band gave
    away during one year, for small-quantity lines.

    Scale: zero joins, zero wide shuffles — every predicate (date range,
    discount band, quantity cap) is pushed into the parquet scan
    (row-group min/max skipping); the aggregate is a 1-row partial+final.
    This is the query whose plan should be scan→partial-agg→exchange(1)→
    final-agg and nothing else."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2001-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double"), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n_items"),
    )


# --------------------------------------------------------------------------
# Q4-shape — EXISTS with a join-dependent predicate (semi join)
# --------------------------------------------------------------------------
@register(
    "priority_order_counts",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '2000-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def priority_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shaped priority check: orders in a quarter having at
    least one line shipped after the order date, counted by priority
    (the schema's stand-in for commitdate < receiptdate).

    Scale: EXISTS compiles to a LEFT SEMI join — the lineitem side ships
    only (l_orderkey, l_shipdate), duplicates never multiply, and the
    probe stops at first match per key. The quarter filter prunes the
    orders scan before the shuffle."""
    od = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        od.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


# --------------------------------------------------------------------------
# Q5-shape — six-way star join with a locality predicate
# --------------------------------------------------------------------------
@register(
    "local_supplier_volume",
    oracle="""
    SELECT n_name,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '2001-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped local-supplier volume: revenue by nation where
    the customer and the line's supplier share a nation, restricted to
    one region and one order year.

    Scale: the only fact-fact shuffle is orders⋈lineitem on the order
    key; supplier/nation/region broadcast, and the locality predicate
    (c_nationkey = s_nationkey) is evaluated map-side after the
    broadcasts. Region+date filters shrink the shuffled slice first."""
    cu = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    od = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2001-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    su = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    na = load(spark, sf_dir, "nation")
    re = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        od.join(cu, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            su,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(_disc_price()).cast("double"), 2).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q7-shape — bidirectional nation-pair trade, self-joined dimension
# --------------------------------------------------------------------------
@register(
    "volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue
    FROM supplier
    JOIN lineitem  ON s_suppkey = l_suppkey
    JOIN orders    ON o_orderkey = l_orderkey
    JOIN customer  ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY n1.n_name, n2.n_name, CAST(year(l_shipdate) AS INTEGER)
    """,
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-shaped trade flow between two nations, either direction,
    by ship year — the same dimension table joined twice under different
    roles (supplier's nation vs customer's nation).

    Scale: both nation joins are broadcasts of the SAME tiny table under
    two aliases; the OR-pair predicate is evaluated after both
    broadcasts, map-side. The one shuffle is orders⋈lineitem."""
    li = load(spark, sf_dir, "lineitem")
    od = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    su = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    na = load(spark, sf_dir, "nation")
    n1 = na.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = na.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(od, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cu, F.col("c_custkey") == F.col("o_custkey"))
        .join(su, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.round(F.sum(_disc_price()).cast("double"), 2).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q8-shape — market share (conditional share of an exact-sum ratio)
# --------------------------------------------------------------------------
@register(
    "national_market_share",
    oracle="""
    WITH vol AS (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN orders    ON o_orderkey = l_orderkey
      JOIN customer  ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN supplier  ON s_suppkey = l_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA'
    )
    SELECT o_year,
           ROUND(CAST(COALESCE(SUM(CASE WHEN supp_nation = 'NATION_3'
                                        THEN volume END), 0) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM vol
    GROUP BY o_year
    """,
)
def national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-shaped market share: NATION_3 suppliers' fraction of all
    revenue delivered into ASIA customers, by order year — a ratio of
    two exact decimal sums per group (numerator conditional).

    Scale: one fact-fact shuffle; the share is a conditional aggregate,
    NOT a self-join of two aggregations — one pass computes both sums."""
    li = load(spark, sf_dir, "lineitem")
    od = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cu = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    su = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    na = load(spark, sf_dir, "nation")
    re = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = na.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = na.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = (
        li.join(od, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cu, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(re), F.col("n1_region") == F.col("r_regionkey"))
        .join(su, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            _disc_price().alias("volume"),
            "supp_nation",
        )
    )
    num = F.coalesce(
        F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))),
        F.lit(0).cast(DEC),
    )
    return vol.groupBy("o_year").agg(
        F.round(num.cast("double") / F.sum("volume").cast("double"), 6).alias("mkt_share")
    )


# --------------------------------------------------------------------------
# Q10-shape — returned-item revenue ranking
# --------------------------------------------------------------------------
@register(
    "returned_item_customers",
    oracle="""
    SELECT c_custkey, c_name,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue,
           COUNT(*) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '2000-04-01 00:00:00'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped lost-revenue ranking: customers who returned the
    most value in a quarter (returnflag='R'), top-20.

    Scale: the returnflag + quarter predicates push into both fact
    scans before the orders⋈lineitem shuffle; customer joins broadcast;
    top-k is TakeOrderedAndProject (no global sort)."""
    cu = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    od = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        od.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum(_disc_price()).cast("double"), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q14-shape — promotion share (conditional ratio over a part join)
# --------------------------------------------------------------------------
@register(
    "promo_revenue_share",
    oracle="""
    SELECT ROUND(CAST(COALESCE(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2))) END), 0) AS DOUBLE)
                 * 100
                 / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
                 6) AS promo_share_pct,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '2000-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '2000-10-01 00:00:00'
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shaped promotion effect: percentage of one month's
    revenue from PROMO-type parts.

    Scale: month predicate prunes the lineitem scan to ~1/80 of rows
    BEFORE the part join; part broadcasts; numerator and denominator are
    one conditional aggregate pass (no two-query ratio)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("2000-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-10-01").cast("timestamp"))
    )
    pa = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    num = F.coalesce(
        F.sum(F.when(F.col("p_type") == "PROMO", _disc_price())),
        F.lit(0).cast(DEC),
    )
    return (
        li.join(pa, F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(
                num.cast("double") * 100 / F.sum(_disc_price()).cast("double"), 6
            ).alias("promo_share_pct"),
            F.count("*").alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Q15-shape — top supplier via scalar-subquery max
# --------------------------------------------------------------------------
@register(
    "top_supplier_quarter",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '2000-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def top_supplier_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-shaped top supplier: supplier(s) whose quarter revenue
    equals the maximum — the view + scalar-subquery pattern (returns all
    ties, unlike LIMIT 1).

    Scale: per-supplier aggregate once; the max is a 1-row broadcast
    joined back (no re-aggregation, no global sort). Exact-decimal-
    derived rounded doubles make the equality deterministic cross-
    engine."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-04-01").cast("timestamp"))
    )
    su = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(_disc_price()).cast("double"), 2).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(su, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# Q17-shape — correlated per-key threshold (avg-quantity anti-pattern)
# --------------------------------------------------------------------------
@register(
    "small_qty_revenue_loss",
    oracle="""
    WITH pq AS (
      SELECT l_partkey AS pk,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) * 0.2 AS thresh
      FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / 7.0, 2) AS avg_yearly_loss,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pq   ON pk = l_partkey
    WHERE p_brand = 'Brand#1' AND l_quantity < thresh
    """,
)
def small_qty_revenue_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-shaped small-order analysis: average yearly revenue
    that would vanish if sub-20%-of-average-quantity orders of one brand
    were dropped — the correlated scalar subquery (per-part average)
    decorrelated into an aggregate + join.

    Scale: the per-part threshold aggregate shuffles on l_partkey once;
    the threshold table (one row per part) then joins back — at our SFs
    it broadcasts, beyond the threshold AQE demotes it. The brand filter
    broadcasts part and prunes the probe early. Threshold math
    (exact-sum/count*0.2 in double) is replicated exactly on both
    engines so the strict < cut is deterministic."""
    li = load(spark, sf_dir, "lineitem")
    pa = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select(
        "p_partkey"
    )
    pq = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(_dec("l_quantity")).cast("double") / F.count("*") * 0.2).alias("thresh")
    )
    return (
        li.join(pa, F.col("p_partkey") == F.col("l_partkey"))
        .join(pq, F.col("pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("thresh"))
        .agg(
            F.round(F.sum(_dec("l_extendedprice")).cast("double") / 7.0, 2).alias(
                "avg_yearly_loss"
            ),
            F.count("*").alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Q18-shape — large-volume orders (HAVING over a fact-fact join)
# --------------------------------------------------------------------------
@register(
    "large_volume_customers",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped large-volume orders: orders whose total quantity
    exceeds 250 units, with their customers, ranked by order value.

    Scale: aggregate lineitem by order key FIRST (the HAVING filter cuts
    ~99.97% of orders before any customer data moves), then join the
    survivors to orders+customer — at 100 TB the pre-aggregation is the
    difference between shuffling 600 GB and 200 KB into the join."""
    cu = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    od = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty_dec"))
        .filter(F.col("qty_dec") > 250)
    )
    return (
        big.join(od, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cu, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_totalprice",
            F.col("qty_dec").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q19-shape — disjunctive multi-attribute predicates
# --------------------------------------------------------------------------
@register(
    "discounted_revenue_or",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
    """,
)
def discounted_revenue_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-shaped OR-of-ANDs: revenue from two alternative
    (brand, size, quantity) envelopes — the disjunctive predicate that
    defeats naive single-column pushdown.

    Scale: Catalyst extracts the common sub-predicates per side —
    p_brand IN ('Brand#1','Brand#2') prunes the broadcast part build,
    l_quantity BETWEEN 1 AND 30 pushes into the lineitem scan — then
    the full disjunction is evaluated map-side after the broadcast
    join."""
    li = load(spark, sf_dir, "lineitem")
    pa = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
    )
    return (
        li.join(pa, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.round(F.sum(_disc_price()).cast("double"), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Q22-shape — dormant high-balance customers (anti join + scalar avg)
# --------------------------------------------------------------------------
@register(
    "idle_rich_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS ab
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_acctbal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
    GROUP BY c_mktsegment
    """,
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-shaped sales opportunity: customers with above-average
    positive balance and no recent orders, grouped by segment.

    Scale: the global average is a 1-row broadcast (scalar subquery);
    NOT EXISTS is a LEFT ANTI join against orders pre-filtered to the
    recent window (the filter pushes into the orders scan, shrinking the
    anti-join build dramatically). Average = exact-sum/count for a
    deterministic cut."""
    cu = load(spark, sf_dir, "customer")
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    ).select("o_custkey")
    avg_bal = cu.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count("*")).alias("ab")
    )
    return (
        cu.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum(_dec("c_acctbal")).cast("double"), 2).alias("total_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# Q3-shape — shipping-priority top-k over a three-way selective star join
# --------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2)
             AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-shape: the 10 highest-revenue orders placed before the cutoff
    but (partly) unshipped after it, for one market segment — the
    canonical selective star join + top-k: every single-table predicate
    prunes BEFORE its join, and the final ordering is a bounded top-k,
    not a full sort.

    Scale: customer (filtered to one segment) broadcasts into orders;
    the orders⋈lineitem fact-fact join shuffles on the order key
    (bucket both on l_orderkey/o_orderkey at scale to eliminate it);
    orderBy+limit compiles to TakeOrderedAndProject. The revenue
    tiebreak is the order key, so the LIMIT edge is deterministic."""
    cutoff = "1998-03-15 00:00:00"
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")
    )
    return (
        li.join(
            orders.join(
                cust, orders.o_custkey == cust.c_custkey
            ).select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(_disc_price()).cast("double"), 2).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q9-shape — multi-dimension star join with derived profit measure
# --------------------------------------------------------------------------
@register(
    "supplier_nation_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(YEAR(l.l_shipdate) AS INT) AS ship_year,
           ROUND(CAST(SUM(
               CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
               - CAST(p.p_retailprice AS DECIMAL(18,2))
                 * CAST(l.l_quantity AS DECIMAL(18,2))
           ) AS DOUBLE), 2) AS profit,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey  = l.l_suppkey
    JOIN nation   n ON n.n_nationkey = s.s_nationkey
    JOIN part     p ON p.p_partkey  = l.l_partkey
    GROUP BY n.n_name, YEAR(l.l_shipdate)
    ORDER BY nation, ship_year
    """,
)
def supplier_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-shaped profit rollup: margin (discounted revenue minus a
    retail-price x quantity cost proxy — the star schema has no partsupp
    table, so p_retailprice stands in for ps_supplycost) by supplier
    nation and ship year. The widest dimension fan-in in the suite: one
    fact joined to three dimensions at once.

    Scale: all three joins broadcast (supplier/nation/part are dims);
    the fact never shuffles for joins — the only exchange is the final
    25-nation x few-year hash aggregate, reduced map-side first. Profit
    math stays DECIMAL end-to-end (exact, order-independent) and is cast
    to double only after the SUM. Reference parity: extends the Q0
    merchant rollup family (requirements.md:10-13) to multi-dim joins
    the reference's spec implies (SURVEY.md section 2.5) but never built."""
    li = load(spark, sf_dir, "lineitem")
    su = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    na = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pa = load(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    margin = _disc_price() - _dec("p_retailprice") * _dec("l_quantity")
    return (
        li.join(su, li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), F.col("s_nationkey") == na.n_nationkey)
        .join(pa, li.l_partkey == pa.p_partkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            F.round(F.sum(margin).cast("double"), 2).alias("profit"),
            F.count("*").alias("n_items"),
        )
        .orderBy("nation", "ship_year")
    )


# --------------------------------------------------------------------------
# Q2-shape — correlated min over a derived supplier-part cost relation
# --------------------------------------------------------------------------
@register(
    "min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice * (1 - l_discount) / l_quantity) AS ucost
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
    ), best AS (
      SELECT l_partkey AS bp, MIN(ucost) AS best_cost
      FROM cost GROUP BY l_partkey
    )
    SELECT p_partkey AS partkey, p_name AS part_name, s_name AS supplier,
           n_name AS nation,
           ROUND(CAST(s_acctbal AS DOUBLE), 2) AS acctbal,
           ROUND(ucost, 2) AS unit_cost
    FROM cost
    JOIN best     ON bp = l_partkey AND ucost = best_cost
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_type = 'PROMO' AND p_size <= 10
    ORDER BY acctbal DESC, nation, supplier, partkey
    LIMIT 25
    """,
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-shaped correlated minimum: for small PROMO parts, the
    supplier(s) offering the lowest observed unit cost — the star schema
    has no partsupp table, so the supplier-part cost relation is derived
    from lineitem history (min effective unit price per supplier-part).

    Scale: the part filter broadcasts and SEMI-reduces lineitem BEFORE
    the cost aggregation, so only matching parts' lines shuffle; the
    per-part best cost is a window MIN over the already-aggregated
    (part, supplier) relation — no second shuffle (same key). The unit
    cost divides double-by-double in source order on both engines, so
    the correlated equality join is exact."""
    from pyspark.sql import Window

    pa = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_type") == "PROMO") & (F.col("p_size") <= 10))
        .select("p_partkey", "p_name")
    )
    li = load(spark, sf_dir, "lineitem").join(
        pa, F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    ucost = (
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    ) / F.col("l_quantity")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(F.min(ucost).alias("ucost"))
    best = F.min("ucost").over(Window.partitionBy("l_partkey"))
    su = load(spark, sf_dir, "supplier")
    na = load(spark, sf_dir, "nation")
    return (
        cost.withColumn("best_cost", best)
        .filter(F.col("ucost") == F.col("best_cost"))
        .join(pa, F.col("p_partkey") == F.col("l_partkey"))
        .join(su, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(na), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("part_name"),
            F.col("s_name").alias("supplier"),
            F.col("n_name").alias("nation"),
            F.round(F.col("s_acctbal").cast("double"), 2).alias("acctbal"),
            F.round(F.col("ucost"), 2).alias("unit_cost"),
        )
        .orderBy(F.desc("acctbal"), "nation", "supplier", "partkey")
        .limit(25)
    )


# --------------------------------------------------------------------------
# Q11-shape — group-sum filtered by a scalar-subquery fraction of total
# --------------------------------------------------------------------------
@register(
    "important_part_values",
    oracle="""
    WITH supval AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS val
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      WHERE s_nationkey = 3
      GROUP BY l_partkey
    ), tot AS (SELECT SUM(val) AS total FROM supval)
    SELECT l_partkey AS partkey,
           ROUND(CAST(val AS DOUBLE), 2) AS part_value
    FROM supval, tot
    WHERE CAST(val AS DOUBLE) > CAST(total AS DOUBLE) * 0.001
    ORDER BY part_value DESC, partkey
    """,
)
def important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-shaped importance cut: parts whose revenue through one
    nation's suppliers exceeds 0.1% of that nation's total — a group
    aggregate thresholded by a scalar subquery over itself.

    Scale: the nation-3 supplier set broadcasts as a SEMI reduction on
    the scan; the per-part aggregate shuffles once; the grand total is
    a 1-row broadcast back onto it (no second pass over the fact). The
    threshold compares exact decimal sums cast to double identically on
    both engines, so the cut row-set is deterministic."""
    su = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == 3)
        .select("s_suppkey")
    )
    li = load(spark, sf_dir, "lineitem").join(
        su, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
    )
    supval = li.groupBy("l_partkey").agg(F.sum(_disc_price()).alias("val"))
    tot = supval.agg(F.sum("val").alias("total"))
    return (
        supval.join(F.broadcast(tot))
        .filter(
            F.col("val").cast("double") > F.col("total").cast("double") * 0.001
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round(F.col("val").cast("double"), 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "partkey")
    )


# --------------------------------------------------------------------------
# Q16-shape — distinct-count with NOT IN exclusion subquery
# --------------------------------------------------------------------------
@register(
    "part_supplier_diversity",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 30
    """,
)
def part_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-shaped supplier diversity: how many distinct suppliers
    ship each (brand, type, size) combination, excluding one brand, one
    type, off-list sizes, and suppliers in arrears (the NOT IN
    complaint-supplier analog — supplier keys are never null here, so
    ANTI join implements NOT IN exactly).

    Scale: both dimension filters broadcast (part as a SEMI reduction,
    bad suppliers as an ANTI); the only wide exchange is the distinct-
    count aggregate, which Spark executes as partial dedup on
    (group, suppkey) before the final count — no row-level shuffle of
    the raw fact."""
    pa = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(bad, F.col("l_suppkey") == F.col("s_suppkey"),
              "left_anti")
    )
    return (
        li.join(pa, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(30)
    )


# --------------------------------------------------------------------------
# Q20-shape — nested aggregation threshold (share-of-part dominance)
# --------------------------------------------------------------------------
@register(
    "dominant_part_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey, l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '2001-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey
    ), ptot AS (
      SELECT l_partkey AS tp, SUM(qty) AS total_qty
      FROM shipped GROUP BY l_partkey
    )
    SELECT DISTINCT s_name AS supplier, n_name AS nation
    FROM shipped
    JOIN ptot     ON tp = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE CAST(qty AS DOUBLE) > 0.3 * CAST(total_qty AS DOUBLE)
    ORDER BY supplier, nation
    """,
)
def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-shaped excess-share detection: suppliers who shipped
    more than 30% of a 'small%' part's total volume in one year — the
    availqty-vs-shipped threshold of Q20 re-derived from lineitem
    (no partsupp table in this star schema).

    Scale: name+date filters reduce the fact before any exchange (the
    part filter broadcast-SEMI, the date range pushed to parquet); the
    per-(supplier, part) aggregate shuffles once and the per-part total
    is a window SUM over it on the same key — no second shuffle.
    Quantity sums are exact decimals; the 30% cut compares doubles
    derived identically on both engines."""
    from pyspark.sql import Window

    pa = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("2001-01-01").cast("timestamp"))
        )
        .join(pa, F.col("l_partkey") == F.col("p_partkey"),
              "left_semi")
    )
    shipped = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(_dec("l_quantity")).alias("qty")
    )
    total = F.sum("qty").over(Window.partitionBy("l_partkey"))
    su = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    na = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        shipped.withColumn("total_qty", total)
        .filter(
            F.col("qty").cast("double") > F.lit(0.3) * F.col("total_qty").cast("double")
        )
        .join(su, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(na), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(F.col("s_name").alias("supplier"), F.col("n_name").alias("nation"))
        .distinct()
        .orderBy("supplier", "nation")
    )


# --------------------------------------------------------------------------
# Q21-shape — sole-blame detection (EXISTS + NOT EXISTS as one aggregate)
# --------------------------------------------------------------------------
@register(
    "sole_late_suppliers",
    oracle="""
    WITH li2 AS (
      SELECT l_orderkey, l_suppkey,
             MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                      THEN 1 ELSE 0 END) AS is_late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY l_orderkey, l_suppkey
    ), ord AS (
      SELECT l_orderkey AS ok, COUNT(*) AS n_supp, SUM(is_late) AS n_late
      FROM li2 GROUP BY l_orderkey
    )
    SELECT s_name AS supplier, COUNT(*) AS numwait
    FROM li2
    JOIN ord      ON ok = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE is_late = 1 AND n_supp > 1 AND n_late = 1
    GROUP BY s_name
    ORDER BY numwait DESC, supplier
    LIMIT 20
    """,
)
def sole_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-shaped sole-blame ranking: suppliers who were the ONLY
    late shipper (>90 days after order date — the star schema has no
    commit/receipt dates) on finished multi-supplier orders.

    Spark-first reformulation: Q21's EXISTS / NOT EXISTS self-joins are
    algebraically a per-order aggregate — n_suppliers > 1 AND
    n_late_suppliers = 1 AND this supplier late — so instead of two
    extra fact self-joins, one groupBy derives per-(order, supplier)
    lateness and a window on the SAME key derives the order stats: one
    shuffle total, versus three for the literal EXISTS plan.

    Scale: the status filter pushes to the orders scan; orders⋈lineitem
    is the one wide join (bucket both on the order key to eliminate);
    everything after lives on l_orderkey partitioning unchanged."""
    from pyspark.sql import Window

    od = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    per = (
        li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(late, 1).otherwise(0)).alias("is_late"))
    )
    w = Window.partitionBy("l_orderkey")
    su = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per.withColumn("n_supp", F.count("*").over(w))
        .withColumn("n_late", F.sum("is_late").over(w))
        .filter(
            (F.col("is_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1)
        )
        .join(su, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.col("s_name").alias("supplier"))
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "supplier")
        .limit(20)
    )
