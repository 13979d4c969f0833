"""Scale-tooling tests: bucketed joins skip the exchange, salted
aggregation/join return results identical to their plain forms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olap_project_spark.functions.scale import salted_agg, salted_join, write_bucketed
from olap_project_spark.sources import load_table


class TestBucketing:
    def test_bucketed_join_has_no_shuffle(self, spark, sf_dir):
        orders = load_table(spark, sf_dir, "orders")
        lineitem = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        )
        write_bucketed(orders, "orders_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
        write_bucketed(lineitem, "lineitem_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
        ob = spark.table("orders_b")
        lb = spark.table("lineitem_b")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        # at this tiny SF Spark would broadcast (also shuffle-free);
        # force the sort-merge path to show the bucketing property that
        # matters at 100 TB, where neither side broadcasts
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # co-located buckets: sort-merge join with NO ShuffleExchange
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning" not in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        # and the result is the plain join's result
        plain = load_table(spark, sf_dir, "orders").join(
            load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        assert joined.count() == plain.count()


class TestBucketedGateQuery:
    def test_tolerates_orphaned_table_location(self, spark, sf_dir):
        """A prior session's table dir survives while the in-memory
        catalog does not; the bucketed gate query must clear the orphan
        instead of dying with LOCATION_ALREADY_EXISTS, and must write
        under /tmp (a driver session's cwd/warehouse may be read-only)."""
        import hashlib
        import os

        from olap_project_spark.queries.relational import _bucketed_fact_tables

        st = os.stat(f"{sf_dir}/orders.parquet")
        tag = hashlib.md5(
            f"{sf_dir}|{st.st_size}|{st.st_mtime_ns}".encode()
        ).hexdigest()[:10]
        spark.sql(f"DROP TABLE IF EXISTS orders_bkt_{tag}")
        spark.sql(f"DROP TABLE IF EXISTS lineitem_bkt_{tag}")
        root = os.path.join("/tmp", f"olap_project_spark_bucketed_{os.getpid()}")
        orphan = os.path.join(root, f"orders_bkt_{tag}")
        os.makedirs(orphan, exist_ok=True)
        with open(os.path.join(orphan, "junk"), "w") as fh:
            fh.write("stale")
        t_orders, t_lineitem = _bucketed_fact_tables(spark, sf_dir)
        assert spark.table(t_orders).count() > 0
        assert spark.table(t_lineitem).count() > 0
        # external location under the per-process /tmp root
        loc = (
            spark.sql(f"DESCRIBE TABLE EXTENDED {t_orders}")
            .filter("col_name = 'Location'")
            .collect()[0]["data_type"]
        )
        assert root in loc


class TestSaltedAggregation:
    def test_salted_agg_matches_plain(self, spark, sf_dir):
        ev = load_table(spark, sf_dir, "events")
        got = {
            r["event_type"]: (r["sum_value"], r["count_value"], r["max_value"])
            for r in salted_agg(ev, ["event_type"], {"value": "sum"}, n_salts=8)
            .join(
                salted_agg(ev, ["event_type"], {"value": "count"}, n_salts=8),
                "event_type",
            )
            .join(
                salted_agg(ev, ["event_type"], {"value": "max"}, n_salts=8),
                "event_type",
            )
            .collect()
        }
        want = {
            r["event_type"]: (r["sum_value"], r["count_value"], r["max_value"])
            for r in ev.groupBy("event_type")
            .agg(
                F.sum("value").alias("sum_value"),
                F.count("value").alias("count_value"),
                F.max("value").alias("max_value"),
            )
            .collect()
        }
        assert set(got) == set(want)
        for k in want:
            assert got[k][1] == want[k][1]  # counts exact
            assert got[k][2] == want[k][2]  # max exact
            assert got[k][0] == pytest.approx(want[k][0], rel=1e-9)  # sum fp-assoc

    def test_salted_agg_has_two_aggregate_phases(self, spark, sf_dir):
        ev = load_table(spark, sf_dir, "events")
        plan = (
            salted_agg(ev, ["event_type"], {"value": "sum"}, n_salts=8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("HashAggregate") >= 4  # partial+final × two phases


class TestSaltedJoin:
    def test_salted_join_matches_plain(self, spark, sf_dir):
        ev = load_table(spark, sf_dir, "events").withColumnRenamed("user_id", "k")
        cu = load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("k"), "c_mktsegment"
        )
        got = salted_join(ev, cu, "k", n_salts=8)
        plain = ev.join(cu, "k")
        assert got.count() == plain.count()
        g = got.groupBy("c_mktsegment").count().collect()
        p = plain.groupBy("c_mktsegment").count().collect()
        assert {r["c_mktsegment"]: r["count"] for r in g} == {
            r["c_mktsegment"]: r["count"] for r in p
        }


class TestHybridSkewJoin:
    def _frames(self, spark, sf_dir):
        ev = load_table(spark, sf_dir, "events").select("user_id", "value")
        cu = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment"
        )
        return ev, cu

    def test_matches_plain_join(self, spark, sf_dir):
        from olap_project_spark.functions.scale import hybrid_skew_join

        ev, cu = self._frames(spark, sf_dir)
        hot = (
            ev.groupBy("user_id")
            .count()
            .orderBy(F.col("count").desc(), F.col("user_id"))
            .limit(8)
            .select("user_id")
        )
        got = (
            hybrid_skew_join(ev, cu, "user_id", "c_custkey", hot_keys=hot)
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("value").cast("decimal(18,2)")).alias("v"),
            )
        )
        want = (
            ev.join(cu, ev.user_id == cu.c_custkey)
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("value").cast("decimal(18,2)")).alias("v"),
            )
        )
        g = {r["c_mktsegment"]: (r["n"], r["v"]) for r in got.collect()}
        w = {r["c_mktsegment"]: (r["n"], r["v"]) for r in want.collect()}
        assert g == w

    def test_empty_hot_set_degenerates_to_plain(self, spark, sf_dir):
        from olap_project_spark.functions.scale import hybrid_skew_join

        ev, cu = self._frames(spark, sf_dir)
        # absurdly high threshold → no hot keys → pure cold path
        got = hybrid_skew_join(
            ev, cu, "user_id", "c_custkey", hot_min_rows=10**12
        )
        assert got.count() == ev.join(cu, ev.user_id == cu.c_custkey).count()

    def test_hot_slice_broadcasts_cold_slice_shuffles(self, spark, sf_dir):
        from olap_project_spark.functions.scale import hybrid_skew_join

        ev, cu = self._frames(spark, sf_dir)
        hot = (
            ev.groupBy("user_id")
            .count()
            .orderBy(F.col("count").desc(), F.col("user_id"))
            .limit(8)
            .select("user_id")
        )
        # pin autobroadcast OFF so the tiny test dim doesn't get
        # broadcast on the cold path too — at real scale the dim
        # exceeds the threshold and this is the natural plan
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = (
                hybrid_skew_join(ev, cu, "user_id", "c_custkey", hot_keys=hot)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        # hot branch: dim slice broadcast-joined despite the pin (the
        # explicit hint survives), plus the semi/anti membership probes
        assert "BroadcastHashJoin" in plan
        # cold branch: an ordinary shuffle join remains for the dim
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


class TestZorder:
    def test_key_matches_python_interleave(self, spark):
        from olap_project_spark.functions.scale import zorder_key
        from pyspark.sql import functions as F

        def py_z(x, y, bits=8):
            z = 0
            for i in range(bits):
                z |= ((x >> i) & 1) << (2 * i)
                z |= ((y >> i) & 1) << (2 * i + 1)
            return z

        rows = [(x, y) for x in (0, 1, 5, 127, 200, 255) for y in (0, 3, 64, 255)]
        df = spark.createDataFrame(rows, "x bigint, y bigint")
        got = df.select(
            "x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")
        ).collect()
        for r in got:
            assert r["z"] == py_z(r["x"], r["y"]), (r["x"], r["y"])

    def test_layout_localizes_both_dimensions(self, spark, sf_dir):
        """The point of the z-layout: every bucket spans far fewer than
        all 256 cells of EACH dimension (a linear sort spans all cells
        of its trailing dimension)."""
        from olap_project_spark.queries import QUERY_REGISTRY, _import_all

        _import_all()
        rows = QUERY_REGISTRY["zorder_layout_stats"].fn(spark, sf_dir).collect()
        assert rows
        # 64 buckets → 6-bit z-prefix → 3 bits per dim → ≤ 2^(8-3)=32
        # cells per dim per bucket (exactly, by construction of Morton
        # order: a fixed prefix fixes the top bits of both dims)
        for r in rows:
            assert r["custkey_cells"] <= 32
            assert r["day_cells"] <= 32


class TestZorderRealFooterPruning:
    def test_row_group_stats_prune_more_under_zorder(self, spark, sf_dir, tmp_path):
        """Write orders twice — sorted linearly by custkey and sorted by
        the Morton key — with small row groups, then replay a parquet
        reader's row-group-skipping decision from the REAL footer
        min/max statistics: for a predicate on the NON-leading dimension
        (order date), the z-order layout must let the reader skip row
        groups the linear layout cannot (which keeps every date in every
        group)."""
        import pyarrow.parquet as pq

        from olap_project_spark.functions.scale import zorder_key

        orders = load_table(spark, sf_dir, "orders")
        bounds = orders.agg(
            F.max("o_custkey").alias("ck_max"),
            F.min(F.col("o_orderdate").cast("date")).alias("d_min"),
            F.max(F.col("o_orderdate").cast("date")).alias("d_max"),
        )
        o = orders.join(F.broadcast(bounds))
        x8 = F.floor(F.col("o_custkey") * 256 / (F.col("ck_max") + 1)).cast(
            "bigint"
        )
        dnum = F.datediff(F.col("o_orderdate").cast("date"), F.col("d_min"))
        dspan = F.datediff(F.col("d_max"), F.col("d_min")) + 1
        y8 = F.floor(dnum * 256 / dspan).cast("bigint")
        pts = o.select(x8.alias("x8"), y8.alias("y8"))

        def write_sorted(df, order_col, path):
            # one sorted task emitting ≤100-row files: the files are the
            # skip unit (dict-encoded test data never fills a row group)
            (
                df.orderBy(order_col)
                .coalesce(1)
                .write.option("maxRecordsPerFile", 100)
                .mode("overwrite")
                .parquet(str(path))
            )

        write_sorted(pts, F.col("x8"), tmp_path / "linear")
        write_sorted(
            pts.withColumn("zkey", zorder_key(F.col("x8"), F.col("y8"))),
            F.col("zkey"),
            tmp_path / "zorder",
        )

        def surviving_row_groups(path, column, value):
            import glob

            files = glob.glob(f"{path}/*.parquet")
            total = survive = 0
            for f in files:
                md = pq.ParquetFile(f).metadata
                idx = {
                    md.schema.column(i).name: i for i in range(md.num_columns)
                }[column]
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    total += 1
                    if st.min <= value <= st.max:
                        survive += 1
            return survive, total

        y_lin, n_lin = surviving_row_groups(tmp_path / "linear", "y8", 100)
        y_z, n_z = surviving_row_groups(tmp_path / "zorder", "y8", 100)
        # enough row groups for skipping to be meaningful at all
        assert n_lin >= 8 and n_z >= 8
        # linear-by-custkey keeps (nearly) every date in every group
        assert y_lin >= n_lin - 1
        # the z-layout localizes dates too: the reader skips most groups
        assert y_z <= n_z // 2, (y_z, n_z)


class TestGlobalOrderStats:
    """global_order_stats must equal the single-partition window's
    row_number / running sums EXACTLY, while keeping every Window in
    its plan partitioned (that's its whole point)."""

    def test_rank_matches_global_row_number(self, spark, sf_dir):
        from pyspark.sql.window import Window

        from olap_project_spark.functions.scale import global_order_stats

        ev = load_table(spark, sf_dir, "events").select("event_id", "value")
        got = {
            r["event_id"]: r["i"]
            for r in global_order_stats(
                ev, [F.desc("value"), F.asc("event_id")], rank_col="i"
            ).collect()
        }
        want = {
            r["event_id"]: r["i"]
            for r in ev.withColumn(
                "i",
                F.row_number().over(
                    Window.orderBy(F.desc("value"), F.asc("event_id"))
                ),
            ).collect()
        }
        assert got == want

    def test_prefix_sum_matches_window_cumsum(self, spark, sf_dir):
        from pyspark.sql.window import Window

        from olap_project_spark.functions.scale import global_order_stats

        ev = (
            load_table(spark, sf_dir, "events")
            .select(
                "event_id",
                F.round(F.col("value") * 100).cast("bigint").alias("cents"),
            )
        )
        got = {
            r["event_id"]: r["cum"]
            for r in global_order_stats(
                ev,
                [F.asc("cents"), F.asc("event_id")],
                sum_cols={"cum": "cents"},
                rank_col="_i",
            ).collect()
        }
        w = (
            Window.orderBy(F.asc("cents"), F.asc("event_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        want = {
            r["event_id"]: r["cum"]
            for r in ev.withColumn("cum", F.sum("cents").over(w)).collect()
        }
        assert got == want

    def test_branch_alignment_across_many_partitions(self, spark):
        """The r6-advice hazard: the windowed branch and the totals
        branch hang off the same range exchange, but column pruning
        makes the two exchange subtrees differ (the totals branch drops
        the payload), so without a pinned partition count AQE could
        coalesce each independently and misalign `_pid`. Build a frame
        big enough to span MANY range partitions, with a payload column
        present only in the windowed branch, and require exact equality
        with the single-partition window — under AQE, with the default
        (conf-derived) partition count."""
        from pyspark.sql.window import Window

        from olap_project_spark.functions.scale import global_order_stats

        n = 20_000
        df = spark.range(n).select(
            F.col("id"),
            # orders the frame differently from id so ranges really mix
            F.pmod(F.xxhash64("id"), F.lit(10_000)).alias("k"),
            (F.col("id") % 97).alias("payload"),
        )
        got = global_order_stats(
            df,
            [F.asc("k"), F.asc("id")],
            sum_cols={"cum": "payload"},
            rank_col="i",
        )
        # the frame must actually span multiple post-shuffle partitions
        # for this test to exercise branch alignment
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        spanned = (
            df.repartitionByRange(n_parts, F.asc("k"), F.asc("id"))
            .select(F.spark_partition_id().alias("p"))
            .distinct()
            .count()
        )
        assert spanned >= 2, "frame too small to span partitions"
        w = Window.orderBy(F.asc("k"), F.asc("id")).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        want = df.withColumn(
            "i", F.row_number().over(Window.orderBy(F.asc("k"), F.asc("id")))
        ).withColumn("cum", F.sum("payload").over(w))
        got_m = {r["id"]: (r["i"], r["cum"]) for r in got.collect()}
        want_m = {r["id"]: (r["i"], r["cum"]) for r in want.collect()}
        assert got_m == want_m

    def test_no_unpartitioned_window_in_plan(self, spark, sf_dir):
        import os
        import sys

        sys.path.insert(
            0,
            os.path.join(os.path.dirname(__file__), "..", "tools"),
        )
        from plan_lint import _unpartitioned_windows

        from olap_project_spark.functions.scale import global_order_stats

        ev = load_table(spark, sf_dir, "events").select("event_id", "value")
        df = global_order_stats(
            ev, [F.asc("value"), F.asc("event_id")], sum_cols={"s": "value"}
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Window" in plan  # it IS window-based…
        assert _unpartitioned_windows(plan) == 0  # …but never global

    def test_ntile_from_rank_matches_ntile(self, spark):
        from pyspark.sql.window import Window

        from olap_project_spark.functions.scale import ntile_from_rank

        # frame sizes that exercise the uneven-tile arithmetic,
        # including n < k (every tile size 0 or 1)
        for n, k in ((10, 4), (7, 3), (100, 7), (3, 5), (64, 8)):
            base = spark.range(1, n + 1).select(
                F.col("id").alias("i"), F.lit(n).alias("n")
            )
            got = {
                r["i"]: r["t"]
                for r in base.select(
                    "i", ntile_from_rank(F.col("i"), F.col("n"), k).alias("t")
                ).collect()
            }
            want = {
                r["i"]: r["t"]
                for r in base.select(
                    "i", F.ntile(k).over(Window.orderBy("i")).alias("t")
                ).collect()
            }
            assert got == want, (n, k)
