"""Checkpoint offset log as a Spark TABLE — a custom Python DataSource
(Spark 4 ``pyspark.sql.datasource`` API).

The reference reads Spark's streaming checkpoint offset log with ad-hoc
file parsing (S3: SparkCheckpointReader.scala:18-43, last-line variants
CheckpointKafkaDataLossMonitor.java:78-95). This module lifts that read
into the engine itself: ``spark.read.format("ksj_offsetlog")
.option("path", ckpt).load()`` yields one row per (batch, source entry),
so the loss predicates (checkpoint.py) and any ad-hoc audit become plain
DataFrame queries over the log.

Scale/parallelism: each offsets file is one InputPartition, so a log
with thousands of batches scans in parallel across executors. Rows are
metadata-sized (a few per micro-batch) — this is a control-plane table,
not a data-plane one.

Schema (one row per batch × source entry):
    batch_id     long   — numeric offsets filename
    source_kind  string — 'kafka' (topic→partition map) or 'log'
                           (FileStreamSource-style {"logOffset": N}) or
                           'other'
    topic        string — Kafka topic, NULL for non-kafka entries
    partition    int    — Kafka partition, NULL for non-kafka entries
    end_offset   long   — committed end offset (kafka) / logOffset value
    watermark_ms long   — batchWatermarkMs from the batch metadata line
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_SCHEMA = (
    "batch_id long, source_kind string, topic string, partition int, "
    "end_offset long, watermark_ms long"
)


class _BatchFile(InputPartition):
    def __init__(self, batch_id: int, path: str):
        self.batch_id = batch_id
        self.path = path


class _OffsetLogReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("ksj_offsetlog requires .option('path', <checkpoint dir>)")
        self._checkpoint_dir = path

    def partitions(self):
        from kafka_stream_job_spark.checkpoint import list_offset_batches

        return [
            _BatchFile(batch_id, path)
            for batch_id, path in list_offset_batches(self._checkpoint_dir)
        ]

    def read(self, partition: _BatchFile):
        import json

        # Scheme-aware read (pyarrow fs): executor-side scans must work when
        # the checkpoint lives on HDFS/S3, not only on a POSIX mount.
        from kafka_stream_job_spark.checkpoint import read_text_file

        lines = read_text_file(partition.path).splitlines()
        meta = json.loads(lines[1]) if len(lines) > 1 and lines[1] else {}
        watermark_ms = int(meta.get("batchWatermarkMs", 0))
        for raw in lines[2:]:
            if not raw:
                continue
            try:
                parsed = json.loads(raw)
            except json.JSONDecodeError:
                yield (partition.batch_id, "other", None, None, None, watermark_ms)
                continue
            if isinstance(parsed, dict) and "logOffset" in parsed:
                yield (
                    partition.batch_id,
                    "log",
                    None,
                    None,
                    int(parsed["logOffset"]),
                    watermark_ms,
                )
            elif isinstance(parsed, dict) and all(
                isinstance(v, dict) for v in parsed.values()
            ):
                for topic, parts in parsed.items():
                    for part, off in parts.items():
                        yield (
                            partition.batch_id,
                            "kafka",
                            topic,
                            int(part),
                            int(off),
                            watermark_ms,
                        )
            else:
                yield (partition.batch_id, "other", None, None, None, watermark_ms)


class OffsetLogDataSource(DataSource):
    """``format("ksj_offsetlog")`` — checkpoint offset log as a table."""

    @classmethod
    def name(cls) -> str:
        return "ksj_offsetlog"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _OffsetLogReader(self.options)


def register_offsetlog_source(spark) -> None:
    """Idempotently register the data source with a session."""
    spark.dataSource.register(OffsetLogDataSource)
