"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 as a smoke check;
``queries()``/``oracle_sql()`` expose the engine's full query library
(olap_project_spark.queries) for the driver's DuckDB correctness gate at
sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: revenue by region/nation — scan → broadcast star
    join → decimal-exact aggregate (queries/relational.nation_revenue)."""
    from olap_project_spark.queries import _import_all, QUERY_REGISTRY

    _import_all()
    return QUERY_REGISTRY["nation_revenue"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query (SURVEY.md §2)."""
    from olap_project_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same column aliases as the
    Spark implementations). Queries without an entry here are genuinely
    non-SQL-expressible and take the driver's rows-only check."""
    from olap_project_spark.queries import all_oracles

    return all_oracles()
