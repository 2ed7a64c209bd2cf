"""Deterministic replay STREAMING source — a custom connector on the
Spark 4 Python DataSource streaming API (``DataSourceStreamReader``),
standing in for the reference's Kafka source (S1,
KafkaAvroToIceberg.scala:55-64) with the same operational contract:

- **Offsets**: the source tracks progress as a row index over the
  event_id-sorted events table — the analogue of Kafka's per-partition
  offsets. ``initialOffset`` = 0 ("earliest"), ``latestOffset`` reports
  the full frontier, ``commit`` is the exactly-once bookkeeping hook.
  latestOffset is deliberately STATELESS: Spark may service offset calls
  from more than one reader instance, and a frontier derived from
  instance state can regress below the committed offset on restart —
  which makes Spark re-plan and re-read committed rows (caught by
  tests/test_datasources.py). Rate-limited multi-batch replay coverage
  lives in the file-source staged queries instead
  (streaming/pipeline.py, maxFilesPerTrigger).
- **Partitioned reads**: each micro-batch's row range splits into
  ``n_splits`` InputPartitions read ON EXECUTORS — the driver only plans
  offsets, as with Kafka.
- **Determinism**: rows are ordered by event_id, so offset N always
  denotes the same record — replayable from any committed offset.

Scale note: each read re-opens the parquet and row-filters its slice;
fine for a replay/test source (checkpoint-size data), and the executor-
side partition reads mean throughput scales with splits. A production
connector would push the range into the file's row-group index.
"""

from __future__ import annotations

import dataclasses
import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


#: per-Python-worker cache: (path, mtime) → event_id-sorted table. A
#: replay of B micro-batches × S splits calls read() B*S times in a few
#: long-lived worker processes; sorting once and slicing per call turns
#: an O(file) cost per read into O(slice).
_SORTED_CACHE: dict = {}


def _sorted_table(path: str):
    import os as _os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    key = (path, _os.path.getmtime(path))
    tab = _SORTED_CACHE.get(key)
    if tab is None:
        raw = pq.read_table(path)
        tab = raw.take(pc.sort_indices(raw, sort_keys=[("event_id", "ascending")]))
        _SORTED_CACHE.clear()
        _SORTED_CACHE[key] = tab
    return tab


#: column order must match _SCHEMA — Arrow batches map positionally.
_COLUMNS = ("event_id", "ts", "user_id", "event_type", "value", "props")


def _read_slice_batches(partition: "_Slice"):
    """Yield the slice as ``pyarrow.RecordBatch``es (the Spark 4 Python
    DataSource Arrow fast path) — no per-row Python tuple materialization,
    which is what keeps executor-side reads vectorized at scale."""
    if partition.end <= partition.start:
        return
    tab = _sorted_table(partition.path).select(list(_COLUMNS))
    yield from tab.slice(partition.start, partition.end - partition.start).to_batches()


@dataclasses.dataclass
class _Slice(InputPartition):
    path: str
    start: int
    end: int


class _ReplayStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("ksj_replay requires .option('path', <events.parquet>)")
        self._n_splits = int(options.get("n_splits", 4))
        self._total: int | None = None

    def _total_rows(self) -> int:
        if self._total is None:
            import pyarrow.parquet as pq

            self._total = pq.ParquetFile(self._path).metadata.num_rows
        return self._total

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def latestOffset(self) -> dict:
        # Stateless full-frontier report (see module docstring): monotone
        # under restarts and identical across reader instances, so the
        # committed offset can never regress and no row is read twice.
        return {"idx": self._total_rows()}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["idx"]), int(end["idx"])
        if hi <= lo:
            return [ _Slice(self._path, lo, lo) ]
        n = max(1, self._n_splits)
        step = max(1, (hi - lo + n - 1) // n)
        return [
            _Slice(self._path, s, min(s + step, hi))
            for s in range(lo, hi, step)
        ]

    def read(self, partition: _Slice):
        yield from _read_slice_batches(partition)

    def commit(self, end: dict) -> None:
        # exactly-once bookkeeping hook (the reference's checkpoint commit
        # step); nothing to clean up for an immutable file.
        pass

    def stop(self) -> None:
        pass


class ReplayDataSource(DataSource):
    """``readStream.format("ksj_replay")`` — deterministic events replay."""

    @classmethod
    def name(cls) -> str:
        return "ksj_replay"

    def schema(self) -> str:
        return _SCHEMA

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _ReplayStreamReader(self.options)

    def reader(self, schema) -> DataSourceReader:
        return _ReplayBatchReader(self.options)


def register_replay_source(spark) -> None:
    spark.dataSource.register(ReplayDataSource)


class _ReplayBatchReader(DataSourceReader):
    """Bounded offset-range batch read — the reference's S2 contract
    (explicit startingOffsets/endingOffsets, KafkaBatchJob.java:70-77)
    over the same row-index offset space as the stream reader."""

    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("ksj_replay requires .option('path', <events.parquet>)")
        self._start = int(options.get("start_idx", 0))
        end = options.get("end_idx")
        self._end = None if end is None else int(end)
        self._n_splits = int(options.get("n_splits", 4))

    def partitions(self):
        import pyarrow.parquet as pq

        total = pq.ParquetFile(self._path).metadata.num_rows
        lo = max(0, self._start)
        hi = total if self._end is None else min(self._end, total)
        if hi <= lo:
            return [_Slice(self._path, lo, lo)]
        n = max(1, self._n_splits)
        step = max(1, (hi - lo + n - 1) // n)
        return [
            _Slice(self._path, s, min(s + step, hi)) for s in range(lo, hi, step)
        ]

    def read(self, partition: _Slice):
        yield from _read_slice_batches(partition)
