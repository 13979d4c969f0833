"""Property test: the bucketed interval-overlap equi-join
(functions/temporal.interval_overlap_pairs) is EXACTLY the brute-force
theta-join — every overlapping pair found once, no duplicates from
multi-bucket co-occurrence, closed-interval touch semantics — across
arbitrary interval sets, bucket widths, and boundary alignments."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from olap_project_spark.functions.temporal import interval_overlap_pairs

interval_strategy = st.tuples(
    st.integers(min_value=0, max_value=400),   # start
    st.integers(min_value=0, max_value=120),   # length (0 = instant)
)


def brute_force(rows):
    out = set()
    for i, (s1, l1) in enumerate(rows):
        for j, (s2, l2) in enumerate(rows):
            if i < j and s1 <= s2 + l2 and s2 <= s1 + l1:
                out.add(
                    (i, j, min(s1 + l1, s2 + l2) - max(s1, s2))
                )
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(interval_strategy, min_size=1, max_size=20),
    st.sampled_from([1, 7, 50, 64, 1000]),
)
def test_bucketed_join_equals_brute_force(spark, rows, bucket_width):
    df = spark.createDataFrame(
        [(i, s, s + l) for i, (s, l) in enumerate(rows)],
        "id bigint, s bigint, e bigint",
    )
    got = {
        (r["ia"], r["ib"], r["ov"])
        for r in interval_overlap_pairs(
            df, bucket_width, distinct_on=F.col("a.id") < F.col("b.id")
        )
        .select(
            F.col("a.id").alias("ia"), F.col("b.id").alias("ib"), "ov"
        )
        .collect()
    }
    assert got == brute_force(rows)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.tuples(st.integers(-200, 200), st.integers(0, 90)), min_size=1, max_size=12))
def test_bucketed_join_handles_negative_times(spark, rows):
    # pmod-based floor bucketing must stay monotone+contiguous across 0
    df = spark.createDataFrame(
        [(i, s, s + l) for i, (s, l) in enumerate(rows)],
        "id bigint, s bigint, e bigint",
    )
    got = {
        (r["ia"], r["ib"], r["ov"])
        for r in interval_overlap_pairs(
            df, 60, distinct_on=F.col("a.id") < F.col("b.id")
        )
        .select(F.col("a.id").alias("ia"), F.col("b.id").alias("ib"), "ov")
        .collect()
    }
    assert got == brute_force(rows)


def test_missing_distinct_on_raises(spark):
    """Omitting the strict-order predicate would silently emit every
    pair twice plus self-pairs — it is a required argument and must
    fail loudly, not a documented hazard."""
    import pytest

    df = spark.createDataFrame([(1, 0, 10)], "id bigint, s bigint, e bigint")
    with pytest.raises(ValueError, match="distinct_on"):
        interval_overlap_pairs(df, 60)
