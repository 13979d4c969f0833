"""olap_project_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference system ``pqkkkkk/olap-project`` (a Kafka → Spark Structured
Streaming → partitioned Parquet → warehouse → OLAP-dashboard pipeline),
plus the large-scale training-data operations (dedup, similarity search,
text analysis, multimodal plumbing) such an engine needs at 100 TB.

Layout
------
- ``session``     SparkSession builder (AQE, Arrow, UTC, sane shuffle sizing)
- ``schemas``     canonical schemas (raw/processed transaction, rates, ...)
- ``transforms``  clean / route / enrich — the streaming-ETL core as pure
                  batch-compatible DataFrame functions
- ``queries``     the OLAP query library (reference Q0-Q9 shapes over both
                  the transaction fact and the driver's star schema)
- ``functions``   text analysis, dedup, similarity, multimodal ops
- ``sources``     table registration + dimension providers (exchange rates)
- ``streaming``   readStream pipelines, watermarks, windowed aggs, fan-out
- ``export``      partition-pruned daily warehouse append (the DAG, as one job)

Everything is DataFrame/SQL-declarative so Catalyst handles pushdown,
pruning, join strategy, and whole-stage codegen; Python row-UDFs are
banned from hot paths (see SURVEY.md §2.10, §4).
"""

__version__ = "0.1.0"
