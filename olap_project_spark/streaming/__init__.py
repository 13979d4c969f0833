from olap_project_spark.streaming.pipeline import (  # noqa: F401
    read_file_stream,
    read_kafka_stream,
    start_pipeline,
)
from olap_project_spark.streaming.windows import (  # noqa: F401
    dedup_stream,
    session_event_counts,
    windowed_event_stats,
)
