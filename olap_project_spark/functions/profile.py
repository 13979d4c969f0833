"""Table profiling: per-column null/distinct/min/max statistics in ONE
pass — the data-quality reconnaissance every migration and every
training-data intake runs first.

One job, not one job per column: all statistics for all columns are
expressions in a single aggregate, so the table is scanned once
regardless of width. Values are surfaced as strings so heterogeneous
column types share one result schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, approx_distinct: bool = False) -> DataFrame:
    """(column, n_nulls, n_distinct, min_value, max_value) per column.

    ``approx_distinct=True`` swaps exact countDistinct for HLL
    ``approx_count_distinct`` — at 100 TB the exact form is one
    two-phase distinct per column and usually still fine, but the
    sketch is O(1) memory per column."""
    n_distinct = (
        F.approx_count_distinct if approx_distinct else F.countDistinct
    )
    aggs = []
    for c in df.columns:
        col = F.col(f"`{c}`")
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).cast("bigint").alias(f"__nn_{c}"),
            n_distinct(col).cast("bigint").alias(f"__nd_{c}"),
            F.min(col).cast("string").alias(f"__mn_{c}"),
            F.max(col).cast("string").alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"`__nn_{c}`").alias("n_nulls"),
                F.col(f"`__nd_{c}`").alias("n_distinct"),
                F.col(f"`__mn_{c}`").alias("min_value"),
                F.col(f"`__mx_{c}`").alias("max_value"),
            )
            for c in df.columns
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*")
