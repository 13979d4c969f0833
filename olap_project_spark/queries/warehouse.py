"""Warehouse-maintenance query family: SCD2 dimension building,
MERGE-style rollup maintenance, and table profiling — the operations a
user of the reference runs in BigQuery scheduled queries
(bigquery_update_scheduler.py, SURVEY.md §2.11 K4), here engine-native
and oracle-checked.

Built on the generic operators in functions/merge.py; see each
docstring for the 100 TB shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from olap_project_spark.queries import load, register


# --------------------------------------------------------------------------
# SCD2: compress a change stream into validity intervals
# --------------------------------------------------------------------------
# The interval-build CTE chain, shared by the history query and the
# point-in-time join oracle below (same text → provably same dimension).
_SCD2_IV_CTE = """
    daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day, event_type, COUNT(*) AS c
      FROM events GROUP BY 1, 2, 3
    ),
    dom AS (
      SELECT user_id, day, event_type AS dominant_type
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id, day
                                         ORDER BY c DESC, event_type) AS rn
            FROM daily)
      WHERE rn = 1
    ),
    flag AS (
      SELECT user_id, day, dominant_type,
             CASE WHEN lag(dominant_type) OVER (PARTITION BY user_id
                                                ORDER BY day)
                       IS DISTINCT FROM dominant_type
                  THEN 1 ELSE 0 END AS chg
      FROM dom
    ),
    ver AS (
      SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY day
                               ROWS UNBOUNDED PRECEDING) AS v
      FROM flag
    ),
    iv AS (
      SELECT user_id, dominant_type, MIN(day) AS valid_from,
             MAX(day) AS valid_to, COUNT(*) AS n_obs
      FROM ver GROUP BY user_id, v, dominant_type
    )
"""


def _user_type_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCD2 interval frame (dates as DATE, for joining): each
    user's dominant-event-type validity intervals."""
    from olap_project_spark.functions.merge import scd2_compress

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count("*").alias("c"))
    rn = F.row_number().over(
        Window.partitionBy("user_id", "day").orderBy(
            F.desc("c"), F.asc("event_type")
        )
    )
    dom = (
        daily.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("user_id", "day", F.col("event_type").alias("dominant_type"))
    )
    return scd2_compress(dom, ["user_id"], ["dominant_type"], "day")


@register(
    "scd2_user_type_history",
    oracle=f"""
    WITH {_SCD2_IV_CTE}
    SELECT user_id, dominant_type,
           strftime(valid_from, '%Y-%m-%d') AS valid_from,
           strftime(valid_to, '%Y-%m-%d') AS valid_to,
           n_obs,
           valid_to = MAX(valid_to) OVER (PARTITION BY user_id) AS is_current
    FROM iv
    """,
)
def scd2_user_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 (type-2 slowly-changing-dimension) build: each user's
    daily dominant event type (count-desc, type-asc tiebreak) is a
    dimension snapshot; consecutive days with the same value collapse
    into one validity interval [valid_from, valid_to] with an
    ``is_current`` marker — the history table a warehouse keeps for
    "what was this user's segment ON date X" joins. Compression is the
    generic ``functions.merge.scd2_compress`` operator (gaps-and-
    islands: null-safe change flags → running version → interval
    rollup).

    Scale: the daily snapshot is a map-side-combined aggregate; the
    compression is ONE window shuffle on user_id reused by the interval
    rollup (same partitioning, no second exchange). Dimension history
    stays O(changes), not O(snapshots) — the point of SCD2 at 100 TB.

    Reference parity: the reference stores only current-state rows
    (merchants.csv reload, SURVEY §2.1); this is the history-preserving
    upgrade its BigQuery users would schedule."""
    return _user_type_intervals(spark, sf_dir).select(
        "user_id",
        "dominant_type",
        F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd").alias("valid_to"),
        F.col("n_obs"),
        "is_current",
    )


# --------------------------------------------------------------------------
# MERGE-style rollup maintenance
# --------------------------------------------------------------------------
@register(
    "merge_upsert_stats",
    oracle="""
    WITH full_r AS (
      SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
             COUNT(*) AS n_orders,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS revenue
      FROM orders GROUP BY 1
    ),
    stale AS (
      SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
             COUNT(*) AS n_orders,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS revenue
      FROM orders WHERE o_orderkey % 5 != 0 GROUP BY 1
    ),
    b AS (SELECT MAX(month) AS mx FROM full_r),
    tgt AS (SELECT s.* FROM stale s, b
            WHERE s.month <= mx - INTERVAL 12 MONTH),
    src AS (SELECT f.* FROM full_r f, b
            WHERE f.month > mx - INTERVAL 24 MONTH),
    merged AS (
      SELECT t.* FROM tgt t LEFT JOIN src s USING (month)
      WHERE s.month IS NULL
      UNION ALL
      SELECT * FROM src
    )
    SELECT strftime(month, '%Y-%m-%d') AS month, n_orders, revenue,
           CASE WHEN month > mx - INTERVAL 12 MONTH THEN 'inserted'
                WHEN month > mx - INTERVAL 24 MONTH THEN 'updated'
                ELSE 'kept' END AS action
    FROM merged, b
    """,
)
def merge_upsert_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup maintenance with MERGE semantics: a stale monthly revenue
    rollup (built before 20% of orders arrived, truncated 12 months
    ago) is repaired by merging in a freshly computed rollup of the
    trailing 24 months — matched months are REPLACED (updated),
    missing months INSERTED, untouched history KEPT. The merge is the
    generic ``functions.merge.merge_upsert`` (anti-join + union) —
    Spark-native MERGE INTO without a lakehouse dependency; the
    ``action`` column audits which path each output row took.

    Scale: the anti join shuffles only the (months × 1 row) rollups,
    never the fact table; the fresh rollup scans only the trailing
    window (partition-pruned on o_orderdate at 100 TB). This is the
    incremental-maintenance pattern: recompute a bounded recent slice,
    merge, leave deep history untouched."""
    from olap_project_spark.functions.merge import merge_upsert

    orders = load(spark, sf_dir, "orders")

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.trunc(F.col("o_orderdate").cast("date"), "month").alias("month")
        ).agg(
            F.count("*").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                    "double"
                ),
                2,
            ).alias("revenue"),
        )

    full_r = rollup(orders)
    stale = rollup(orders.filter(F.col("o_orderkey") % 5 != 0))
    b = full_r.agg(F.max("month").alias("mx"))
    tgt = (
        stale.join(F.broadcast(b))
        .filter(F.col("month") <= F.add_months(F.col("mx"), -12))
        .drop("mx")
    )
    src = (
        full_r.join(F.broadcast(b))
        .filter(F.col("month") > F.add_months(F.col("mx"), -24))
        .drop("mx")
    )
    merged = merge_upsert(tgt, src, ["month"])
    action = (
        F.when(
            F.col("month") > F.add_months(F.col("mx"), -12), F.lit("inserted")
        )
        .when(
            F.col("month") > F.add_months(F.col("mx"), -24), F.lit("updated")
        )
        .otherwise(F.lit("kept"))
    )
    return (
        merged.join(F.broadcast(b))
        .select(
            F.date_format("month", "yyyy-MM-dd").alias("month"),
            "n_orders",
            "revenue",
            action.alias("action"),
        )
    )


# --------------------------------------------------------------------------
# Table profiling (the ANALYZE pass a pipeline runs before training)
# --------------------------------------------------------------------------
_PROFILE_COLUMNS: dict[str, list[str]] = {
    "customer": ["c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "orders": ["o_custkey", "o_orderstatus", "o_orderpriority"],
    "events": ["user_id", "event_type", "value"],
}


def _profile_oracle() -> str:
    parts = []
    for table, cols in _PROFILE_COLUMNS.items():
        for c in cols:
            parts.append(
                f"SELECT '{table}' AS tbl, '{c}' AS col,"
                f" COUNT(*) AS n_rows,"
                f" COUNT(*) - COUNT({c}) AS n_nulls,"
                f" COUNT(DISTINCT {c}) AS n_distinct"
                f" FROM {table}"
            )
    return " UNION ALL ".join(parts)


@register("table_profile_summary", oracle=_profile_oracle)
def table_profile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data profile over the warehouse's hot tables: row
    count, null count, and EXACT distinct count per column — the
    ANALYZE/profiling pass a training-data pipeline runs to catch
    schema rot (nulls appearing in a key column, cardinality
    explosions) before they poison a run.

    Scale: ONE pass per table — all per-column counts and distincts
    compute in a single multi-distinct aggregate (Catalyst plans the
    Expand), then ``stack`` unpivots the 1-row result into per-column
    rows. No per-column rescans. At 100 TB swap the exact distincts
    for ``approx_count_distinct`` (the HLL path events.py's sketch
    family already verifies) — the plan shape is identical."""
    out: DataFrame | None = None
    for table, cols in _PROFILE_COLUMNS.items():
        df = load(spark, sf_dir, table)
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for c in cols:
            aggs.append(F.count(F.col(c)).alias(f"n_{c}"))
            aggs.append(F.countDistinct(F.col(c)).alias(f"d_{c}"))
        one = df.agg(*aggs)
        stack_args = ", ".join(
            f"'{c}', n_rows - n_{c}, d_{c}" for c in cols
        )
        rows = one.select(
            F.lit(table).alias("tbl"),
            F.col("n_rows"),
            F.expr(
                f"stack({len(cols)}, {stack_args}) AS (col, n_nulls, n_distinct)"
            ),
        ).select("tbl", "col", "n_rows", "n_nulls", "n_distinct")
        out = rows if out is None else out.unionByName(rows)
    assert out is not None
    return out


# --------------------------------------------------------------------------
# Point-in-time dimension join (the leakage-safe feature join)
# --------------------------------------------------------------------------
@register(
    "point_in_time_dimension_join",
    oracle=f"""
    WITH {_SCD2_IV_CTE},
    purch AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events WHERE event_type = 'purchase'
    )
    SELECT COALESCE(i.dominant_type, 'UNKNOWN') AS dominant_type,
           COUNT(*) AS n_purchases,
           ROUND(CAST(SUM(p.v) AS DOUBLE), 2) AS total_value
    FROM purch p LEFT JOIN iv i
      ON i.user_id = p.user_id
     AND p.day BETWEEN i.valid_from AND i.valid_to
    GROUP BY 1
    """,
)
def point_in_time_dimension_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME (as-of) dimension join against the SCD2 history:
    each purchase is enriched with the user's dominant event type AS OF
    the purchase day — interval containment against the type-2
    dimension, NOT the current value. This is the leakage-safe feature
    join an ML training pipeline must use: joining today's dimension
    value onto last year's fact rows leaks the future into the
    features; the SCD2 interval join cannot.

    Correctness by construction: intervals are non-overlapping per
    user (scd2_compress partitions the observed days), so the join
    multiplicity is ≤ 1 — no fan-out, and a purchase day (itself an
    event day) always falls inside exactly one interval.

    Scale: equi-join on user_id with an interval residual — both sides
    shuffle on the key once, per-user interval lists are O(changes)
    and scanned linearly per probe. At 100 TB sort intervals per user
    and binary-search (the as-of merge pattern), or band the join with
    a coarse month key so residual scans stay bounded."""
    iv = _user_type_intervals(spark, sf_dir)
    purch = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").cast("date").alias("day"),
            F.col("value").cast("decimal(18,2)").alias("v"),
        )
    )
    j = purch.join(
        iv,
        (F.col("user_id") == F.col("p_user"))
        & F.col("day").between(F.col("valid_from"), F.col("valid_to")),
        "left",
    )
    return j.groupBy(
        F.coalesce(F.col("dominant_type"), F.lit("UNKNOWN")).alias(
            "dominant_type"
        )
    ).agg(
        F.count("*").alias("n_purchases"),
        F.round(F.sum("v").cast("double"), 2).alias("total_value"),
    )


# --------------------------------------------------------------------------
# Cascading delete (right-to-be-forgotten) audit
# --------------------------------------------------------------------------
@register(
    "cascading_delete_audit",
    oracle="""
    WITH del_cust AS (
      SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0
    ),
    del_orders AS (
      SELECT o.o_orderkey, o.o_custkey FROM orders o
      JOIN del_cust d ON o.o_custkey = d.c_custkey
    ),
    del_li AS (
      SELECT l.l_orderkey, l.l_linenumber FROM lineitem l
      JOIN del_orders d ON l.l_orderkey = d.o_orderkey
    ),
    rem_orders AS (
      SELECT o.* FROM orders o
      LEFT JOIN del_cust d ON o.o_custkey = d.c_custkey
      WHERE d.c_custkey IS NULL
    ),
    rem_li AS (
      SELECT l.* FROM lineitem l
      LEFT JOIN del_orders d ON l.l_orderkey = d.o_orderkey
      WHERE d.o_orderkey IS NULL
    )
    SELECT 'customer' AS tbl,
           (SELECT COUNT(*) FROM del_cust) AS n_deleted,
           (SELECT COUNT(*) FROM customer) - (SELECT COUNT(*) FROM del_cust)
             AS n_remaining,
           0 AS n_orphans
    UNION ALL
    SELECT 'orders',
           (SELECT COUNT(*) FROM del_orders),
           (SELECT COUNT(*) FROM rem_orders),
           (SELECT COUNT(*) FROM rem_orders r
            JOIN del_cust d ON r.o_custkey = d.c_custkey)
    UNION ALL
    SELECT 'lineitem',
           (SELECT COUNT(*) FROM del_li),
           (SELECT COUNT(*) FROM rem_li),
           (SELECT COUNT(*) FROM rem_li r
            JOIN del_orders d ON r.l_orderkey = d.o_orderkey)
    """,
)
def cascading_delete_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT-TO-BE-FORGOTTEN cascade audit: a deterministic erasure
    set (customers with key ≡ 0 mod 97) propagates through the FK
    chain customer → orders → lineitem; the query reports, per table,
    how many rows the cascade deletes, how many remain, and — the
    audit that matters — that the remaining rows contain ZERO orphans
    referencing a deleted parent (the n_orphans column the compliance
    check asserts to be 0, pinned by the oracle hash).

    Scale: the cascade is semi-join propagation (each level shuffles
    on its FK once; the erasure set is broadcast when small) and the
    orphan checks are the matching anti/semi joins — no row is
    rewritten here; in production each level feeds the manifest sink's
    atomic rewrite (export/manifest_sink.py) partition-by-partition."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    del_cust = cust.filter(F.col("c_custkey") % 97 == 0).select("c_custkey")
    del_orders = orders.join(
        del_cust, orders.o_custkey == del_cust.c_custkey, "left_semi"
    ).select("o_orderkey", "o_custkey")
    del_li = li.join(
        del_orders.select("o_orderkey"),
        li.l_orderkey == F.col("o_orderkey"),
        "left_semi",
    )
    rem_orders = orders.join(
        del_cust, orders.o_custkey == del_cust.c_custkey, "left_anti"
    )
    rem_li = li.join(
        del_orders.select("o_orderkey"),
        li.l_orderkey == F.col("o_orderkey"),
        "left_anti",
    )

    def counted(df: DataFrame, alias: str) -> DataFrame:
        return df.agg(F.count("*").alias(alias))

    c_del = counted(del_cust, "n")
    c_all = counted(cust, "n_all")
    o_del = counted(del_orders, "n")
    o_rem = counted(rem_orders, "n_rem")
    o_orph = counted(
        rem_orders.join(
            del_cust, rem_orders.o_custkey == del_cust.c_custkey, "left_semi"
        ),
        "n_orph",
    )
    l_del = counted(del_li, "n")
    l_rem = counted(rem_li, "n_rem")
    l_orph = counted(
        rem_li.join(
            del_orders.select("o_orderkey"),
            rem_li.l_orderkey == F.col("o_orderkey"),
            "left_semi",
        ),
        "n_orph",
    )
    cust_row = c_del.join(F.broadcast(c_all)).select(
        F.lit("customer").alias("tbl"),
        F.col("n").alias("n_deleted"),
        (F.col("n_all") - F.col("n")).alias("n_remaining"),
        F.lit(0).cast("bigint").alias("n_orphans"),
    )
    ord_row = (
        o_del.join(F.broadcast(o_rem))
        .join(F.broadcast(o_orph))
        .select(
            F.lit("orders").alias("tbl"),
            F.col("n").alias("n_deleted"),
            F.col("n_rem").alias("n_remaining"),
            F.col("n_orph").alias("n_orphans"),
        )
    )
    li_row = (
        l_del.join(F.broadcast(l_rem))
        .join(F.broadcast(l_orph))
        .select(
            F.lit("lineitem").alias("tbl"),
            F.col("n").alias("n_deleted"),
            F.col("n_rem").alias("n_remaining"),
            F.col("n_orph").alias("n_orphans"),
        )
    )
    return cust_row.unionByName(ord_row).unionByName(li_row)


# --------------------------------------------------------------------------
# Incremental view maintenance (the delta rule for join views)
# --------------------------------------------------------------------------
@register(
    "incremental_join_view",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n_orders,
           ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS revenue
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1
    """,
)
def incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL VIEW MAINTENANCE, correctness-proved: the join view
    ``orders ⋈ customer`` rolled up by segment is computed the way an
    IVM engine maintains it — base⋈base plus the three delta quadrants
    Δo⋈base ∪ base⋈Δc ∪ Δo⋈Δc (orders arriving with key ≡ 0 mod 7,
    customers with key ≡ 0 mod 3 playing the deltas) — and the oracle
    is the plain full recompute. A hash match IS the delta-rule proof
    Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB on this corpus: miss one quadrant
    (the classic ΔA⋈ΔB bug) or double-count one, and the row hashes
    flip.

    Scale: this is why incremental beats recompute at 100 TB — the
    three delta joins touch |Δ|-sized slices (partition-pruned on
    arrival date in production), and the partial rollups merge by key
    (the merge_upsert pattern). Each quadrant here is a plain
    equi-join; the final re-aggregate merges four segment-grain
    partials, not fact rows."""
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderkey"
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base_o = orders.filter(F.col("o_orderkey") % 7 != 0)
    delta_o = orders.filter(F.col("o_orderkey") % 7 == 0)
    base_c = cust.filter(F.col("c_custkey") % 3 != 0)
    delta_c = cust.filter(F.col("c_custkey") % 3 == 0)

    def quadrant(o: DataFrame, c: DataFrame) -> DataFrame:
        return (
            o.join(c, o.o_custkey == c.c_custkey)
            .groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("r"),
            )
        )

    partials = (
        quadrant(base_o, base_c)
        .unionByName(quadrant(delta_o, base_c))
        .unionByName(quadrant(base_o, delta_c))
        .unionByName(quadrant(delta_o, delta_c))
    )
    return partials.groupBy("segment").agg(
        F.sum("n").cast("bigint").alias("n_orders"),
        F.round(F.sum("r").cast("double"), 2).alias("revenue"),
    )
