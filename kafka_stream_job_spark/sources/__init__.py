"""Custom Spark data sources (Python DataSource API, Spark 4)."""

from kafka_stream_job_spark.sources.offsetlog import OffsetLogDataSource

__all__ = ["OffsetLogDataSource"]
