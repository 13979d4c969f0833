"""The SQL entry point (SURVEY.md §3.3: `engine.sql(...)` is the
primary analyst interface): register the star schema as views and run
Spark SQL directly — same catalog names the DuckDB oracle uses."""

from __future__ import annotations

from olap_project_spark.sources import register_tables


class TestSqlEntry:
    def test_sql_over_registered_views(self, spark, sf_dir):
        register_tables(spark, sf_dir)
        row = spark.sql(
            """
            SELECT r_name, ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS v
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            GROUP BY r_name
            ORDER BY v DESC
            LIMIT 1
            """
        ).collect()[0]
        assert row["r_name"] and float(row["v"]) > 0

    def test_sql_sees_normalized_event_timestamps(self, spark, sf_dir):
        register_tables(spark, sf_dir)
        got = spark.sql("SELECT MIN(hour(ts)) h FROM events").collect()[0]["h"]
        assert got == 0  # ts arrived as TimestampType, not raw ns longs


class TestCostBasedOptimizer:
    """ANALYZE TABLE feeds the CBO: after stats collection the optimized
    plan carries real rowCounts (not just sizeInBytes guesses), which is
    what drives join reordering and broadcast decisions at 100 TB —
    AQE fixes mistakes at runtime, CBO avoids making them at plan time."""

    def test_analyzed_stats_reach_the_plan(self, spark, sf_dir):
        from olap_project_spark.sources.registry import load_table

        # CBO estimation reads the conf of the session that OWNS the
        # cached relation — a child newSession()'s conf.set is ignored
        # here, so toggle on the root session and restore after.
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            load_table(spark, sf_dir, "nation").write.mode(
                "overwrite"
            ).saveAsTable("cbo_nation")
            spark.sql(
                "ANALYZE TABLE cbo_nation COMPUTE STATISTICS FOR ALL COLUMNS"
            )
            cost = (
                spark.table("cbo_nation")
                .filter("n_regionkey = 1")
                ._jdf.queryExecution()
                .stringWithStats()
            )
            # with column stats the filter estimate is EXACT, not a guess
            n = spark.table("cbo_nation").filter("n_regionkey = 1").count()
            assert f"rowCount={n}" in cost
            spark.sql("DROP TABLE cbo_nation")
        finally:
            spark.conf.set("spark.sql.cbo.enabled", "false")
