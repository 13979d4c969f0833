from olap_project_spark.export.daily import export_partition  # noqa: F401
