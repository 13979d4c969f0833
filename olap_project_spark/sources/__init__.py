from olap_project_spark.sources.registry import load_table, register_tables  # noqa: F401
