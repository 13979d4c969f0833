"""Warehouse maintenance operators Spark SQL lacks natively: MERGE-
style upsert and SCD2 (slowly-changing-dimension type 2) interval
compression — both as pure plan rewrites over DataFrame ops, no
lakehouse dependency.

The reference delegates all warehouse maintenance to BigQuery
scheduled rewrites (bigquery_update_scheduler.py — SURVEY.md §2.11
K4); these are the engine-native equivalents, composing with the
manifest sink (export/manifest_sink.py) for exactly-once commits.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame, source: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """``MERGE INTO target USING source ON keys WHEN MATCHED THEN
    UPDATE SET * WHEN NOT MATCHED THEN INSERT *`` as a plan rewrite:
    keep every target row with no source match (left anti join), then
    union the whole source (which carries both the updates and the
    inserts). Column sets must match; the result is the maintained
    table, ready for an atomic swap/manifest commit.

    Scale: one shuffle of each side on the merge keys (the anti join),
    plus a union that is purely logical. With both sides bucketed on
    the keys the anti join is exchange-free (functions/scale.py
    ``write_bucketed``); at 100 TB partition the target by a key-
    derived column and rewrite only the partitions the source touches
    (partition-pruned maintenance, the export/daily.py pattern).

    Precondition (the same one SQL MERGE imposes): ``source`` has at
    most one row per key — otherwise MERGE's "multiple matched rows"
    error becomes a silent duplicate here.
    """
    return target.join(source, list(keys), "left_anti").unionByName(source)


def scd2_compress(
    df: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
    order_col: str,
) -> DataFrame:
    """Compress a (key, attributes, observation) change stream into
    SCD2 validity intervals: consecutive observations of a key with
    identical attribute values collapse into one row carrying
    ``valid_from`` / ``valid_to`` (inclusive observation bounds),
    ``n_obs``, and ``is_current`` (the key's latest interval) — the
    gaps-and-islands pattern that builds a type-2 dimension from
    snapshots.

    Scale: one window over (keys → order_col) computes the change
    flags and running version number in a single shuffle; the interval
    rollup groups by (keys, version) — same partitioning, no second
    exchange. State per key is O(1); nothing is collected.
    """
    w = Window.partitionBy(*keys).orderBy(order_col)
    changed: Column | None = None
    for a in attrs:
        prev = F.lag(F.col(a)).over(w)
        # null-safe inequality: a change to/from NULL is a new version
        c = ~F.col(a).eqNullSafe(prev)
        changed = c if changed is None else (changed | c)
    assert changed is not None
    first = F.row_number().over(w) == 1
    is_change = (first | changed).cast("bigint")
    versioned = df.withColumn(
        "_version",
        F.sum(is_change).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    out = versioned.groupBy(*keys, "_version", *attrs).agg(
        F.min(order_col).alias("valid_from"),
        F.max(order_col).alias("valid_to"),
        F.count("*").alias("n_obs"),
    )
    w_cur = Window.partitionBy(*keys)
    return (
        out.withColumn(
            "is_current", F.col("valid_to") == F.max("valid_to").over(w_cur)
        )
        .drop("_version")
    )
