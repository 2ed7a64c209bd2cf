"""Checkpoint commit log as a Spark TABLE — the COMPLETED half of the
offsets→commits two-phase protocol, as a custom Python DataSource
(companion to sources/offsetlog.py's planned half).

The reference's monitors reason about exactly this pairing: an offsets
entry with no matching commits entry is the "planned but never
committed" batch the batch-transition detector re-checks on restart
(KafkaBatchDataLossMonitor.java:59-62 family). Lifting the commit log
into a table makes that audit a plain anti-join between two DataFrames:

    spark.read.format("ksj_commitlog").option("path", ckpt).load()

Schema (one row per committed batch):
    batch_id          long   — numeric commit filename
    format_version    string — the ``v1`` header tag
    next_watermark_ms long   — nextBatchWatermarkMs recorded at commit,
                               i.e. the event-time frontier the NEXT
                               batch will read state with

Scale/parallelism: one InputPartition per commit file (parallel scan,
same as the offset log); rows are metadata-sized — a control-plane
table. Scheme-aware reads via checkpoint._filesystem, so a checkpoint
on HDFS/S3 lists and reads identically.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_SCHEMA = "batch_id long, format_version string, next_watermark_ms long"


class _CommitFile(InputPartition):
    def __init__(self, batch_id: int, path: str):
        self.batch_id = batch_id
        self.path = path


class _CommitLogReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("ksj_commitlog requires .option('path', <checkpoint dir>)")
        self._checkpoint_dir = path

    def partitions(self):
        from kafka_stream_job_spark.checkpoint import list_commit_batches

        out = [
            _CommitFile(batch_id, path)
            for batch_id, path in list_commit_batches(self._checkpoint_dir)
        ]
        # a commit-less checkpoint (no batch committed yet) still needs
        # ≥1 partition so the scan plans an empty result, not an error
        return out or [_CommitFile(-1, "")]

    def read(self, partition: _CommitFile):
        import json

        from kafka_stream_job_spark.checkpoint import read_text_file

        if not partition.path:
            return
        lines = read_text_file(partition.path).splitlines()
        version = lines[0] if lines else ""
        meta = {}
        if len(lines) > 1 and lines[1]:
            try:
                meta = json.loads(lines[1])
            except json.JSONDecodeError:
                meta = {}
        yield (
            partition.batch_id,
            version,
            int(meta.get("nextBatchWatermarkMs", 0)),
        )


class CommitLogDataSource(DataSource):
    """``format("ksj_commitlog")`` — checkpoint commit log as a table."""

    @classmethod
    def name(cls) -> str:
        return "ksj_commitlog"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _CommitLogReader(self.options)


def register_commitlog_source(spark) -> None:
    """Idempotently register the data source with a session."""
    spark.dataSource.register(CommitLogDataSource)
