"""Custom Python DataSource WRITER (Spark 4 DataSource API, write path) —
the companion to sources/replay.py's reader: an "audit sink" that counts
what flows through each write task executor-side, ships the counts back
as WriterCommitMessages, and has the driver-side commit() persist one
JSON audit manifest atomically. abort() removes nothing (no partial
files are ever visible — the manifest only appears on commit), which is
the exactly-once contract a custom sink owes the engine.

This completes the Python DataSource surface: batch read (bounded
slices), batch read with pushFilters pruning, streaming read
(offset-tracked frontier), and now batch WRITE with commit/abort.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


class AuditCommit(WriterCommitMessage):
    def __init__(self, n_rows: int, id_sum: int):
        self.n_rows = n_rows
        self.id_sum = id_sum


class _AuditWriter(DataSourceWriter):
    def __init__(self, path: str):
        self._path = path

    def write(self, iterator):
        n, s = 0, 0
        for row in iterator:
            n += 1
            s += int(row[0])  # first column is the audited id
        return AuditCommit(n, s)

    def commit(self, messages):
        # Scheme-aware staged write (the checkpoint.py helper): works when
        # the audit path is hdfs://-s3://, appears atomically, and cleans
        # its tmp on failure — builtin open/os.replace would silently
        # write driver-local on a cluster.
        from kafka_stream_job_spark.checkpoint import write_text_file

        out = {
            "n_rows": sum(m.n_rows for m in messages),
            "id_sum": sum(m.id_sum for m in messages),
            "n_tasks": len(messages),
        }
        write_text_file(self._path, json.dumps(out))

    def abort(self, messages):
        # No partial manifest is ever visible; sweep every tmp a DEAD
        # thread of THIS driver process could have left behind. Two
        # guards keep the sweep from eating a LIVE writer's tmp:
        # the pid is matched up to its "-" delimiter (pid 7 must not
        # sweep pid 71's files), and tmps whose thread-id suffix belongs
        # to a currently-live thread are skipped (a concurrent commit to
        # the same destination keeps its staged file).
        import contextlib
        import posixpath
        import threading

        from pyarrow import fs as pafs

        from kafka_stream_job_spark.checkpoint import _filesystem, tmp_prefix

        filesystem, prefix = _filesystem(tmp_prefix(self._path))
        parent = posixpath.dirname(prefix)
        base = posixpath.basename(prefix) + "-"
        live = {str(t.ident) for t in threading.enumerate()}
        with contextlib.suppress(Exception):
            for entry in filesystem.get_file_info(pafs.FileSelector(parent)):
                if (
                    entry.type == pafs.FileType.File
                    and entry.base_name.startswith(base)
                    and entry.base_name[len(base):] not in live
                ):
                    with contextlib.suppress(Exception):
                        filesystem.delete_file(entry.path)


class AuditDataSource(DataSource):
    @classmethod
    def name(cls):
        return "ksj_audit"

    def writer(self, schema, overwrite: bool):
        return _AuditWriter(self.options["path"])
