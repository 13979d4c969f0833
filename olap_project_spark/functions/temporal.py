"""Temporal-join building blocks — the interval-overlap equi-join
decomposition used by queries/temporal.py (session_overlap_pairs) and
property-tested in tests/test_interval_join.py.

Spark has no native interval×interval overlap join: the naive
formulation is a theta-join (CartesianProduct at plan level). The
scalable decomposition here buckets time, equi-joins on the bucket id,
and uses the RESPONSIBILITY-BUCKET rule to avoid the classic duplicate
problem without a distinct pass: a qualifying pair is emitted only in
the single bucket where the LATER interval starts. For a truly
overlapping pair, the later start lies inside the earlier interval, so
both intervals provably span that bucket — emission is exactly-once by
construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_overlap_pairs(
    intervals: DataFrame,
    bucket_width: int,
    s_col: str = "s",
    e_col: str = "e",
    distinct_on: Column | None = None,
) -> DataFrame:
    """All ordered pairs (a, b) of rows whose CLOSED intervals
    [s, e] overlap (touching endpoints count, contributing 0 width),
    as an equi-join on integer time buckets of ``bucket_width``.

    ``intervals`` must carry integer (bigint) ``s_col`` <= ``e_col``
    and whatever identity columns the caller needs; the result has
    every column twice under ``a.*`` / ``b.*`` aliases plus ``ov``,
    the exact overlap width ``min(e)-max(s)``. ``distinct_on`` is
    REQUIRED: the strict-order predicate distinguishing a from b,
    e.g. ``col("a.id") < col("b.id")`` — without one every pair would
    appear twice and self-pairs once, so omitting it raises rather
    than silently doubling (it stays a keyword with a None default
    only so the error can name the fix).

    Scale: each interval explodes into ``(e-s)/bucket_width + 1``
    bucket rows (choose the bucket near the typical interval length to
    bound the blow-up), the join is hash-partitioned on the bucket id
    (candidates Σ|bucket|², never n²), and the responsibility rule
    ``bucket == greatest(a.sb, b.sb)`` replaces the distinct shuffle a
    naive bucket join needs."""
    if distinct_on is None:
        raise ValueError(
            "interval_overlap_pairs requires distinct_on — a strict-order "
            "predicate such as F.col('a.id') < F.col('b.id'); without it "
            "every pair is emitted twice and self-pairs once"
        )
    # floor-division bucketing in pure integer arithmetic (pmod keeps
    # the bucket function monotone+contiguous for negative times too)
    sb = F.expr(f"({s_col} - pmod({s_col}, {bucket_width})) DIV {bucket_width}")
    eb = F.expr(f"({e_col} - pmod({e_col}, {bucket_width})) DIV {bucket_width}")
    spans = intervals.withColumn("_sb", sb).withColumn("_eb", eb).withColumn(
        "_bucket", F.explode(F.sequence("_sb", "_eb"))
    )
    a, b = spans.alias("a"), spans.alias("b")
    conds = [
        F.col("a._bucket") == F.col("b._bucket"),
        F.col(f"a.{s_col}") <= F.col(f"b.{e_col}"),
        F.col(f"b.{s_col}") <= F.col(f"a.{e_col}"),
        F.col("a._bucket") == F.greatest(F.col("a._sb"), F.col("b._sb")),
    ]
    if distinct_on is not None:
        conds.append(distinct_on)
    ov = F.least(F.col(f"a.{e_col}"), F.col(f"b.{e_col}")) - F.greatest(
        F.col(f"a.{s_col}"), F.col(f"b.{s_col}")
    )
    return (
        a.join(b, on=conds)
        .withColumn("ov", ov)
        .drop("_sb", "_eb", "_bucket")
    )
