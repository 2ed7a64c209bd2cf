"""Hive-partition-aware custom Python DataSource — the partition-pruning
half of the connector story the replay source's row-index pruning began
(reference parity: the offset/partition-assignment contract of the Kafka
batch source, KafkaBatchJob.java:70-77, re-expressed over a directory
layout instead of broker partitions).

Layout: ``<path>/event_type=<value>/*.parquet`` — the hive convention the
engine's own ``partitionBy("event_type")`` writer emits. The reader:

- **Plans one InputPartition per data file**, so read parallelism scales
  with the file count, not the directory count.
- **Prunes whole directories at planning time** via Spark 4.1's
  ``pushFilters``: ``event_type = 'x'`` / ``event_type IN (...)`` filters
  are CONSUMED (not re-returned) and non-matching ``event_type=`` dirs
  are never listed into partitions — the custom-connector analogue of
  Catalyst's partition pruning, and the same files-never-opened guarantee
  Kafka gets by excluding topic-partitions from the assignment.
- **Scheme-aware listing** through the shared pyarrow-fs helper
  (checkpoint._filesystem), so an hdfs://-s3:// layout lists the same
  way the checkpoint readers do.
- **Arrow-batch reads on executors**: the partition VALUE is attached as
  a constant column executor-side; the file bytes never carry it.

Scale note: planning cost is one directory listing (O(dirs + files)
metadata, no file opens); pruned dirs contribute nothing.

- **Row-group min/max skipping inside each file**: residual range
  predicates on the data columns (``value > 0``-style) are recorded at
  pushdown time but still RETURNED as unsupported, so Spark re-applies
  them post-scan — skipping is a pure I/O optimization whose
  correctness is guaranteed by the residual evaluation. Executor reads
  consult each row group's footer statistics and only decode groups
  whose [min, max] can contain a match; a group with no statistics is
  conservatively read. Together with directory pruning this is the
  two-level skip (partition → row group) a 100 TB layout needs.
"""

from __future__ import annotations

import dataclasses
from urllib.parse import unquote

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

_SCHEMA = "event_id long, user_id long, value double, event_type string"
#: file-column order (event_type is attached from the dir name, last).
_FILE_COLUMNS = ("event_id", "user_id", "value")


def _row_groups_matching(metadata, ranges):
    """Indices of row groups whose footer statistics cannot RULE OUT the
    recorded range predicates.

    ``ranges`` is a sequence of ``(column, op, value)`` with op in
    ``> >= < <= =``. A group is skipped only when some predicate is
    provably unsatisfiable from its [min, max] (NULLs never satisfy a
    comparison, so null counts cannot un-skip); missing statistics keep
    the group — skipping must never change results, only I/O.
    """
    col_idx = {
        metadata.schema.column(i).name: i
        for i in range(metadata.num_columns)
    }
    keep = []
    for g in range(metadata.num_row_groups):
        rg = metadata.row_group(g)
        dead = False
        for col, op, val in ranges:
            i = col_idx.get(col)
            if i is None:
                continue
            stats = rg.column(i).statistics
            if stats is None or not stats.has_min_max:
                continue
            lo, hi = stats.min, stats.max
            if (
                (op == ">" and hi <= val)
                or (op == ">=" and hi < val)
                or (op == "<" and lo >= val)
                or (op == "<=" and lo > val)
                or (op == "=" and (lo > val or hi < val))
            ):
                dead = True
                break
        if not dead:
            keep.append(g)
    return keep


@dataclasses.dataclass
class _PartFile(InputPartition):
    file_path: str
    part_value: str
    #: original (scheme-carrying) option path — executors re-resolve the
    #: pyarrow filesystem from it, since ``file_path`` is fs-local and a
    #: bare ``bucket/key`` would otherwise be misread as a POSIX path.
    base_uri: str = ""


class _HivePartReader(DataSourceReader):
    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError(
                "ksj_hive_events requires .option('path', <events_part dir>)"
            )
        self._types: set | None = None  # None → no pruning filter seen
        #: (column, op, value) range predicates for row-group skipping.
        #: These are ALSO returned unsupported — Spark re-applies them,
        #: so the skip is an I/O optimization, never a semantics change.
        self._ranges: list[tuple[str, str, object]] = []

    def pushFilters(self, filters):
        # Plain eager function (not a generator) — same contract rationale
        # as replay.py: pruning state must not depend on the caller
        # draining the result. EqualTo/In on the PARTITION column are
        # fully handled here (whole directories pruned), so they are
        # consumed; everything else is returned for post-scan evaluation.
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            LessThan,
            LessThanOrEqual,
        )

        _RANGE_OPS = (
            (GreaterThan, ">"),
            (GreaterThanOrEqual, ">="),
            (LessThan, "<"),
            (LessThanOrEqual, "<="),
            (EqualTo, "="),
        )
        unsupported = []
        for f in filters:
            col = f.attribute[0] if getattr(f, "attribute", None) else None
            if col == "event_type" and isinstance(f, EqualTo):
                t = {f.value}
                self._types = t if self._types is None else self._types & t
            elif col == "event_type" and isinstance(f, In):
                vs = set(f.value)
                self._types = vs if self._types is None else self._types & vs
            else:
                if col in _FILE_COLUMNS:
                    for cls, op in _RANGE_OPS:
                        if isinstance(f, cls):
                            self._ranges.append((col, op, f.value))
                            break
                unsupported.append(f)
        return unsupported

    def partitions(self):
        from kafka_stream_job_spark.checkpoint import _filesystem

        from pyarrow import fs as pafs

        filesystem, base = _filesystem(self._path)
        out = []
        for entry in filesystem.get_file_info(pafs.FileSelector(base)):
            if entry.type != pafs.FileType.Directory:
                continue
            name = entry.base_name
            if not name.startswith("event_type="):
                continue
            value = unquote(name.split("=", 1)[1])
            if self._types is not None and value not in self._types:
                continue  # pruned: this directory is never listed further
            for f in filesystem.get_file_info(pafs.FileSelector(entry.path)):
                if f.type == pafs.FileType.File and f.base_name.endswith(
                    ".parquet"
                ):
                    out.append(_PartFile(f.path, value, self._path))
        # an all-pruned (or empty) layout still needs ≥1 partition so the
        # scan plans an empty result instead of failing
        return out or [_PartFile("", "")]

    def read(self, partition: _PartFile):
        if not partition.file_path:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        from kafka_stream_job_spark.checkpoint import _filesystem

        filesystem, _ = _filesystem(partition.base_uri or partition.file_path)
        with filesystem.open_input_file(partition.file_path) as src:
            pf = pq.ParquetFile(src)
            keep = (
                _row_groups_matching(pf.metadata, self._ranges)
                if self._ranges
                else list(range(pf.metadata.num_row_groups))
            )
            if not keep:
                return  # every row group provably dead: zero bytes decoded
            tab = pf.read_row_groups(keep, columns=list(_FILE_COLUMNS))
        for batch in tab.to_batches():
            yield pa.RecordBatch.from_arrays(
                [*batch.columns, pa.array([partition.part_value] * batch.num_rows)],
                names=[*_FILE_COLUMNS, "event_type"],
            )


class HivePartitionedDataSource(DataSource):
    """``read.format("ksj_hive_events")`` — hive-layout events reader with
    planning-time partition pruning."""

    @classmethod
    def name(cls) -> str:
        return "ksj_hive_events"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _HivePartReader(self.options)


def register_hivepart_source(spark) -> None:
    spark.dataSource.register(HivePartitionedDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
