"""Unit tests for the warehouse-maintenance operators
(functions/merge.py): MERGE-style upsert and SCD2 interval
compression — semantics pinned on small frames where the expected
result is hand-checkable."""

from __future__ import annotations

from pyspark.sql import functions as F

from olap_project_spark.functions.merge import merge_upsert, scd2_compress


class TestMergeUpsert:
    def test_update_insert_keep(self, spark):
        target = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, v string, x int"
        )
        source = spark.createDataFrame(
            [(2, "B", 22), (4, "d", 40)], "k int, v string, x int"
        )
        got = {
            r["k"]: (r["v"], r["x"])
            for r in merge_upsert(target, source, ["k"]).collect()
        }
        assert got == {
            1: ("a", 10),  # kept
            2: ("B", 22),  # updated (replaced by source)
            3: ("c", 30),  # kept
            4: ("d", 40),  # inserted
        }

    def test_empty_source_is_identity(self, spark):
        target = spark.createDataFrame([(1, "a")], "k int, v string")
        source = target.filter(F.lit(False))
        assert merge_upsert(target, source, ["k"]).collect() == target.collect()

    def test_composite_keys(self, spark):
        target = spark.createDataFrame(
            [(1, "x", 1.0), (1, "y", 2.0)], "k1 int, k2 string, v double"
        )
        source = spark.createDataFrame(
            [(1, "y", 9.0)], "k1 int, k2 string, v double"
        )
        got = {
            (r["k1"], r["k2"]): r["v"]
            for r in merge_upsert(target, source, ["k1", "k2"]).collect()
        }
        assert got == {(1, "x"): 1.0, (1, "y"): 9.0}


class TestScd2Compress:
    def test_islands_and_current_flag(self, spark):
        obs = spark.createDataFrame(
            [
                (1, 1, "a"), (1, 2, "a"), (1, 3, "b"), (1, 4, "a"),
                (2, 1, "z"), (2, 2, "z"), (2, 3, "z"),
            ],
            "k int, t int, attr string",
        )
        rows = {
            (r["k"], r["valid_from"]): (
                r["attr"], r["valid_to"], r["n_obs"], r["is_current"]
            )
            for r in scd2_compress(obs, ["k"], ["attr"], "t").collect()
        }
        assert rows == {
            (1, 1): ("a", 2, 2, False),
            (1, 3): ("b", 3, 1, False),
            (1, 4): ("a", 4, 1, True),  # a→b→a: three versions, not two
            (2, 1): ("z", 3, 3, True),
        }

    def test_null_transitions_are_versions(self, spark):
        obs = spark.createDataFrame(
            [(1, 1, "a"), (1, 2, None), (1, 3, None), (1, 4, "a")],
            "k int, t int, attr string",
        )
        got = sorted(
            (r["valid_from"], r["attr"], r["n_obs"])
            for r in scd2_compress(obs, ["k"], ["attr"], "t").collect()
        )
        assert got == [(1, "a", 1), (2, None, 2), (4, "a", 1)]

    def test_multi_attribute_change_detection(self, spark):
        obs = spark.createDataFrame(
            [(1, 1, "a", 10), (1, 2, "a", 11), (1, 3, "a", 11)],
            "k int, t int, s string, x int",
        )
        got = sorted(
            (r["valid_from"], r["s"], r["x"])
            for r in scd2_compress(obs, ["k"], ["s", "x"], "t").collect()
        )
        # change in EITHER attribute opens a new version
        assert got == [(1, "a", 10), (2, "a", 11)]
