"""Spark Structured Streaming checkpoint offset-log reading + the single
data-loss predicate every monitor shares.

Reference parity:

- Offsets-file format — line 0 ``"v1"``, line 1 metadata JSON, line 2
  offsets JSON ``{topic: {"<partition>": endOffset}}`` — documented at
  SparkCheckpointReader.scala:12-17, parsed at :24-37; last-line variants
  CheckpointKafkaDataLossMonitor.java:78-95,
  KafkaStreamingPreflightDetector.java:159-185.
- Batch enumeration: numerically-sorted filenames in ``<ckpt>/offsets``
  (KafkaStreamingPreflightDetector.java:167-172, Utils.scala:43-47).
- Loss predicate: **loss iff broker_earliest > expected_start**, lost range
  ``[expected_start, earliest-1]``, count ``earliest - expected_start``
  (DataLossMonitor.java:107-142, KafkaBatchDataLossMonitor.java:77-88,
  KafkaLossDetector.scala:31-43).

Everything here is pure driver-side Python over files and dicts — no Spark,
no broker. Broker I/O is injected by callers (monitors.py) so the
arithmetic is unit-testable exactly as the reference structures it.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

#: (topic, partition) → offset. The unit of loss arithmetic, mirroring the
#: reference's Map<TopicPartition, Long> (DataLossMonitor.java:79-102).
OffsetMap = dict[tuple[str, int], int]


@dataclass(frozen=True)
class DataLossEvent:
    """Typed loss record — mirrors the reference's DataLossEvent
    (KafkaBatchDataLossMonitor.java:140-149)."""

    topic: str
    partition: int
    lost_from: int
    lost_to: int
    lost_count: int
    expected_start: int
    expected_end: int | None
    kafka_earliest: int
    kafka_latest: int | None

    def describe(self) -> str:
        return (
            f"[DATA-LOSS] {self.topic}-{self.partition}: offsets "
            f"{self.lost_from}..{self.lost_to} ({self.lost_count} records) "
            f"expired before read; expected_start={self.expected_start}, "
            f"broker_earliest={self.kafka_earliest}"
        )


def parse_offsets_json(payload: str) -> OffsetMap:
    """``{"orders":{"0":20,"1":40,"2":6}}`` → {("orders",0):20, ...}.

    Same JSON shape as the checkpoint offsets line and as Spark's
    startingOffsets/endingOffsets options and StreamingQueryProgress
    start/endOffset fields — one parser serves all of them.
    """
    out: OffsetMap = {}
    parsed = json.loads(payload)
    if not isinstance(parsed, dict):
        return out
    for topic, parts in parsed.items():
        # Non-Kafka sources write other shapes here (e.g. FileStreamSource's
        # {"logOffset": N}); only topic→{partition: offset} maps are ours.
        if not isinstance(parts, dict):
            continue
        for partition, offset in parts.items():
            out[(topic, int(partition))] = int(offset)
    return out


def _filesystem(path: str):
    """(pyarrow FileSystem, fs-local path) for ``path``, keyed off its
    scheme. Plain paths stay on the local filesystem; ``hdfs://``,
    ``s3://``, ``file://`` … resolve through ``FileSystem.from_uri`` so
    checkpoint dirs on cluster storage read the same way. pyarrow, not
    builtin ``open``: executors scanning a production checkpoint cannot
    assume a POSIX mount."""
    from pyarrow import fs as pafs

    if "://" in path:
        filesystem, fs_path = pafs.FileSystem.from_uri(path)
        return filesystem, fs_path
    return pafs.LocalFileSystem(), path


def read_text_file(path: str) -> str:
    """Whole-file UTF-8 read through the scheme-aware filesystem."""
    filesystem, fs_path = _filesystem(path)
    with filesystem.open_input_stream(fs_path) as fh:
        return fh.read().decode("utf-8")


def tmp_prefix(path: str) -> str:
    """Per-process tmp-name prefix next to ``path`` — abort() sweeps by
    this prefix, so it catches any thread's stranded tmp without knowing
    which thread staged it."""
    import os

    return f"{path}.tmp-{os.getpid()}"


def tmp_sibling(path: str) -> str:
    """Deterministic tmp-file name next to ``path`` for staged writes —
    shared between write_text_file and callers that must clean up a
    crashed write (e.g. a sink's abort()). Thread id in the name: two
    same-process writers to one destination (the threaded oracle sweep)
    must not share a tmp file and interleave write/move."""
    import threading

    return f"{tmp_prefix(path)}-{threading.get_ident()}"


def write_text_file(path: str, text: str) -> None:
    """UTF-8 write through the scheme-aware filesystem, staged via a tmp
    sibling then moved into place — a true atomic rename on local/HDFS
    (pyarrow move), copy+delete on object stores where the destination
    object still appears all-or-nothing. The tmp is removed on any
    failure, so a crash never strands a ``.tmp-<pid>`` file."""
    import contextlib

    filesystem, fs_path = _filesystem(path)
    _, tmp = _filesystem(tmp_sibling(path))
    try:
        with filesystem.open_output_stream(tmp) as fh:
            fh.write(text.encode("utf-8"))
        filesystem.move(tmp, fs_path)
    except Exception:
        with contextlib.suppress(Exception):
            filesystem.delete_file(tmp)
        raise


def read_offsets_file(path: str) -> tuple[dict, OffsetMap]:
    """Parse one checkpoint offsets file → (metadata, offsets).

    Format per SparkCheckpointReader.scala:12-17: first line version tag
    ``v1``, second line metadata JSON, each following line one source's
    offsets JSON (we read source 0, the Kafka source, like the reference's
    lines[2] / readLastLine variants).
    """
    lines = [ln.strip() for ln in read_text_file(path).splitlines() if ln.strip()]
    if not lines or not lines[0].startswith("v"):
        raise ValueError(f"{path}: not a Spark offsets file (missing version line)")
    metadata = json.loads(lines[1]) if len(lines) > 1 else {}
    offsets: OffsetMap = {}
    if len(lines) > 2:
        offsets = parse_offsets_json(lines[2])
    return metadata, offsets


def _list_batch_files(checkpoint_dir: str, subdir: str) -> list[tuple[int, str]]:
    """Numerically-sorted (batch_id, path) pairs from a checkpoint metadata
    log directory (``offsets``/``commits``). Ignores .crc/tmp."""
    from pyarrow import fs as pafs

    sep = "/" if "://" in checkpoint_dir else os.sep
    log_dir = checkpoint_dir.rstrip(sep) + sep + subdir
    filesystem, fs_dir = _filesystem(log_dir)
    info = filesystem.get_file_info(fs_dir)
    if info.type != pafs.FileType.Directory:
        return []
    # Reconstruct caller-scheme paths so read_offsets_file re-resolves the
    # same filesystem from the returned path strings.
    prefix = log_dir.rstrip(sep) + sep
    batches = [
        (int(fi.base_name), prefix + fi.base_name)
        for fi in filesystem.get_file_info(pafs.FileSelector(fs_dir))
        if fi.base_name.isdigit()
    ]
    return sorted(batches)


def list_offset_batches(checkpoint_dir: str) -> list[tuple[int, str]]:
    """Numerically-sorted (batch_id, path) pairs from ``<ckpt>/offsets``
    (KafkaStreamingPreflightDetector.java:167-172)."""
    return _list_batch_files(checkpoint_dir, "offsets")


def list_commit_batches(checkpoint_dir: str) -> list[tuple[int, str]]:
    """Numerically-sorted (batch_id, path) pairs from ``<ckpt>/commits`` —
    the COMPLETED half of the two-phase offsets→commits protocol the
    batch-transition monitor reasons about (a batch id present in offsets
    but absent here is exactly the "planned but never committed" state)."""
    return _list_batch_files(checkpoint_dir, "commits")


def read_checkpoint_offset(
    checkpoint_dir: str, topic: str, partition: int, batch_id: int | None = None
) -> int | None:
    """Committed end-offset for one (topic, partition) from the checkpoint
    (SparkCheckpointReader.scala:18-43). batch_id=None → latest batch."""
    batches = list_offset_batches(checkpoint_dir)
    if not batches:
        return None
    if batch_id is None:
        path = batches[-1][1]
    else:
        by_id = dict(batches)
        if batch_id not in by_id:
            return None
        path = by_id[batch_id]
    _, offsets = read_offsets_file(path)
    return offsets.get((topic, partition))


def compute_loss(
    expected_start: OffsetMap,
    earliest: OffsetMap,
    expected_end: OffsetMap | None = None,
    latest: OffsetMap | None = None,
) -> list[DataLossEvent]:
    """THE loss predicate, shared by all monitor modes (SURVEY.md §2.6):
    for each partition, loss iff ``earliest > expected_start``; the lost
    range is [expected_start, earliest-1] (DataLossMonitor.java:107-142,
    KafkaBatchDataLossMonitor.java:77-88)."""
    events: list[DataLossEvent] = []
    for tp, start in sorted(expected_start.items()):
        if tp not in earliest:
            continue
        early = earliest[tp]
        if early > start >= 0:
            topic, partition = tp
            events.append(
                DataLossEvent(
                    topic=topic,
                    partition=partition,
                    lost_from=start,
                    lost_to=early - 1,
                    lost_count=early - start,
                    expected_start=start,
                    expected_end=(expected_end or {}).get(tp),
                    kafka_earliest=early,
                    kafka_latest=(latest or {}).get(tp),
                )
            )
    return events


def batch_transition_loss(
    prev_end: OffsetMap, curr_start: OffsetMap, earliest: OffsetMap
) -> list[tuple[str, int, int, int]]:
    """L3's variant predicate over the last TWO checkpoint batches
    (CheckpointKafkaDataLossMonitor.java:55-72): Spark already jumped —
    ``prevEnd >= 0 && prevEnd < earliest && currStart == earliest``.
    Returns (topic, partition, prev_end, earliest) per suspect partition.
    """
    suspects = []
    for tp, pend in sorted(prev_end.items()):
        early = earliest.get(tp)
        cstart = curr_start.get(tp)
        if early is None or cstart is None:
            continue
        if pend >= 0 and pend < early and cstart == early:
            suspects.append((tp[0], tp[1], pend, early))
    return suspects
