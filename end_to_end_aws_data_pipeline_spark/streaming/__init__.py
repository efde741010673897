"""Structured Streaming surface: the reference *is* an event-triggered
incremental loader (S3 event → gate → load, SURVEY.md §2 streaming
rows); here that becomes one continuously-running Spark app — a
checkpointed file source with exactly-once processing, windowed
aggregations with watermark late-data handling, and arbitrary stateful
operators.
"""

from end_to_end_aws_data_pipeline_spark.streaming.ingest_stream import (  # noqa: F401
    StreamingIngest,
)
