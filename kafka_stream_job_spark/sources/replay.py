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


#: driver-side cache: (path, mtime) → sorted event_id Arrow column only.
#: Planning-time pruning needs just the id order, so it reads ONE int64
#: column (8 bytes/row, no boxing) instead of pulling the whole table
#: through _sorted_table on the driver. Lock-guarded: concurrent planning
#: threads (the threaded oracle sweep) would otherwise race the
#: single-entry clear-then-set and thrash each other's entry.
_SORTED_IDS_CACHE: dict = {}
_SORTED_IDS_LOCK = __import__("threading").Lock()


def _sorted_ids(path: str):
    import os as _os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    key = (path, _os.path.getmtime(path))
    with _SORTED_IDS_LOCK:
        ids = _SORTED_IDS_CACHE.get(key)
    if ids is None:
        col = pq.read_table(path, columns=["event_id"]).column("event_id")
        ids = col.take(pc.sort_indices(col)).combine_chunks()
        with _SORTED_IDS_LOCK:
            _SORTED_IDS_CACHE.clear()
            _SORTED_IDS_CACHE[key] = ids
    return ids


def _arrow_bisect(ids, target, right: bool) -> int:
    """bisect_left/bisect_right over a sorted Arrow column via O(log n)
    single-value probes — never materializes the column to Python."""
    lo, hi = 0, len(ids)
    while lo < hi:
        mid = (lo + hi) // 2
        v = ids[mid].as_py()
        if v < target or (right and v == target):
            lo = mid + 1
        else:
            hi = mid
    return lo


#: column order must match _SCHEMA — Arrow batches map positionally.
_COLUMNS = ("event_id", "ts", "user_id", "event_type", "value", "props")

#: floor on rows per planned split. Each InputPartition costs a Python
#: worker round-trip (interpreter + pyarrow import on a cold executor),
#: so fanning a few hundred pruned rows into n_splits confetti
#: partitions pays 8× the fixed cost to move nothing — the same
#: anti-pattern as scheduling 8 Spark tasks over one row group. Splits
#: are capped so each carries at least this many rows; large ranges
#: still fan out to the requested n_splits.
_MIN_SPLIT_ROWS = 4096


def _plan_slices(path: str, lo: int, hi: int, n_splits: int) -> list["_Slice"]:
    """Split [lo, hi) into at most n_splits row-range partitions, each at
    least _MIN_SPLIT_ROWS rows (except the last remainder)."""
    if hi <= lo:
        return [_Slice(path, lo, lo)]
    n = max(1, min(n_splits, (hi - lo + _MIN_SPLIT_ROWS - 1) // _MIN_SPLIT_ROWS))
    step = max(1, (hi - lo + n - 1) // n)
    return [_Slice(path, s, min(s + step, hi)) for s in range(lo, hi, step)]


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
        return _plan_slices(self._path, int(start["idx"]), int(end["idx"]), self._n_splits)

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
    # The batch reader implements pushFilters; Spark refuses to plan a
    # pushFilters-capable Python source while this conf is false, so
    # enabling it here keeps every consumer working (it is also a session
    # default, but the driver may pass its own bare session).
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")


class _ReplayBatchReader(DataSourceReader):
    """Bounded offset-range batch read — the reference's S2 contract
    (explicit startingOffsets/endingOffsets, KafkaBatchJob.java:70-77)
    over the same row-index offset space as the stream reader.

    FILTER PUSHDOWN (Spark 4.1 Python DataSource ``pushFilters``, enabled
    by ``spark.sql.python.filterPushdown.enabled``): because the offset
    space is the event_id-SORTED row index, any event_id comparison
    filter maps to a row-index range — the source binary-searches the
    sorted id column at planning time and PRUNES InputPartitions to the
    matching slice (the Python-source analogue of Kafka offset-range /
    parquet row-group pruning). event_type equality/IN filters are
    applied inside read() on the Arrow batches, so pruned AND filtered
    bytes never cross into the JVM. All other filters are returned to
    Spark for post-scan evaluation."""

    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("ksj_replay requires .option('path', <events.parquet>)")
        self._start = int(options.get("start_idx", 0))
        end = options.get("end_idx")
        self._end = None if end is None else int(end)
        self._n_splits = int(options.get("n_splits", 4))
        self._eid_lo: int | None = None  # inclusive event_id bound
        self._eid_hi: int | None = None  # inclusive event_id bound
        self._types: set | None = None  # event_type IN (...) pushdown

    def pushFilters(self, filters):
        # A plain function (NOT a generator): bound-tightening happens
        # eagerly and unconditionally, so a caller that never drains the
        # result still gets correct pruning — pyspark's current pushdown
        # worker fully drains the iterable, but that is its implementation
        # detail, not a contract this source should lean on.
        from pyspark.sql.datasource import EqualTo, GreaterThan, GreaterThanOrEqual
        from pyspark.sql.datasource import In, LessThan, LessThanOrEqual

        def tighten_lo(v):
            self._eid_lo = v if self._eid_lo is None else max(self._eid_lo, v)

        def tighten_hi(v):
            self._eid_hi = v if self._eid_hi is None else min(self._eid_hi, v)

        unsupported = []
        for f in filters:
            col = f.attribute[0] if getattr(f, "attribute", None) else None
            if col == "event_id" and isinstance(f, EqualTo):
                tighten_lo(f.value)
                tighten_hi(f.value)
            elif col == "event_id" and isinstance(f, GreaterThan):
                tighten_lo(f.value + 1)
            elif col == "event_id" and isinstance(f, GreaterThanOrEqual):
                tighten_lo(f.value)
            elif col == "event_id" and isinstance(f, LessThan):
                tighten_hi(f.value - 1)
            elif col == "event_id" and isinstance(f, LessThanOrEqual):
                tighten_hi(f.value)
            elif col == "event_type" and isinstance(f, EqualTo):
                t = {f.value} if self._types is None else self._types & {f.value}
                self._types = t
            elif col == "event_type" and isinstance(f, In):
                vs = set(f.value)  # In.value is the tuple of allowed values
                self._types = vs if self._types is None else self._types & vs
            else:
                unsupported.append(f)  # Spark evaluates it post-scan
        return unsupported

    def partitions(self):
        import pyarrow.parquet as pq

        total = pq.ParquetFile(self._path).metadata.num_rows
        lo = max(0, self._start)
        hi = total if self._end is None else min(self._end, total)
        if self._eid_lo is not None or self._eid_hi is not None:
            # planning-time prune: sorted event_id column → index range.
            # O(log n) value probes against the cached Arrow column — no
            # to_pylist() materialization of n boxed ints on the driver.
            ids = _sorted_ids(self._path)
            if self._eid_lo is not None:
                lo = max(lo, _arrow_bisect(ids, self._eid_lo, right=False))
            if self._eid_hi is not None:
                hi = min(hi, _arrow_bisect(ids, self._eid_hi, right=True))
        return _plan_slices(self._path, lo, hi, self._n_splits)

    def read(self, partition: _Slice):
        if self._types is None:
            yield from _read_slice_batches(partition)
            return
        import pyarrow as pa
        import pyarrow.compute as pc

        allowed = pa.array(sorted(self._types), type=pa.string())
        for batch in _read_slice_batches(partition):
            filtered = batch.filter(pc.is_in(batch.column("event_type"), allowed))
            if filtered.num_rows:
                yield filtered
