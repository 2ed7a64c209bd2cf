"""The four-mechanism Kafka data-loss detection suite + standalone logger —
the reference's core IP (SURVEY.md §2.6), as driver-side Python around the
shared predicate in :mod:`kafka_stream_job_spark.checkpoint`.

| here                        | reference                                   |
|-----------------------------|---------------------------------------------|
| ``LiveDataLossMonitor``     | DataLossMonitor.java:16-165 (L1)            |
| ``preflight_detect``        | KafkaStreamingPreflightDetector.java:25-210 (L2) |
| ``check_batch_transition``  | CheckpointKafkaDataLossMonitor.java:14-102 (L3) |
| ``BatchOffsetGuard``        | KafkaBatchDataLossMonitor.java:18-150 (L4)  |
| ``detect_and_log``          | KafkaLossDetector.scala:8-47 (L5)           |
| ``scan_log_for_loss``       | KafkaDataLossAppender.java:37-52 (L6)       |

Broker I/O is dependency-injected: every mechanism takes an
``earliest_provider`` callable ``(list[(topic, partition)]) →
{(topic, partition): offset}`` so the sandbox (no broker) unit-tests the
arithmetic with fakes, and production wires a Kafka AdminClient-backed
provider (``kafka_admin_provider`` below, import-gated). This mirrors the
reference's graceful-degrade posture (KafkaBatchDataLossMonitor.java:59-62:
monitor "not ready" when the broker is unreachable → never blocks the job).
"""

from __future__ import annotations

import json
import logging
import re
from collections.abc import Callable, Iterable

from kafka_stream_job_spark.checkpoint import (
    DataLossEvent,
    OffsetMap,
    batch_transition_loss,
    compute_loss,
    list_offset_batches,
    parse_offsets_json,
    read_offsets_file,
)

log = logging.getLogger("kafka_stream_job_spark.monitors")

#: (tps) -> {tp: offset}; raising == broker unreachable.
OffsetProvider = Callable[[Iterable[tuple[str, int]]], OffsetMap]


def kafka_admin_provider(brokers: str, spec: str = "earliest") -> OffsetProvider:
    """Production offset provider over a Kafka AdminClient (reference:
    listOffsets with OffsetSpec.earliest()/latest(),
    DataLossMonitor.java:144-164). Import-gated: the sandbox ships no
    Kafka client library."""
    try:
        from confluent_kafka import Consumer, TopicPartition
    except ImportError as exc:  # pragma: no cover - not installed in sandbox
        raise RuntimeError(
            "confluent-kafka not installed; inject a custom provider"
        ) from exc

    def provider(tps: Iterable[tuple[str, int]]) -> OffsetMap:  # pragma: no cover
        consumer = Consumer(
            {"bootstrap.servers": brokers, "group.id": "kafka-stream-job-spark-monitor"}
        )
        try:
            out: OffsetMap = {}
            for topic, partition in tps:
                low, high = consumer.get_watermark_offsets(
                    TopicPartition(topic, partition), timeout=10
                )
                out[(topic, partition)] = low if spec == "earliest" else high
            return out
        finally:
            consumer.close()

    return provider


# ---------------------------------------------------------------------------
# L1 — live per-micro-batch monitor (StreamingQueryListener).
# ---------------------------------------------------------------------------
try:  # the listener base class needs a running py4j bridge at import time
    from pyspark.sql.streaming.listener import StreamingQueryListener
except ImportError:  # pragma: no cover
    StreamingQueryListener = object  # type: ignore[assignment,misc]


class LiveDataLossMonitor(StreamingQueryListener):
    """Per-micro-batch loss detection, reference DataLossMonitor.java:16-165:
    on every progress event, for each Kafka source, compare the batch's
    startOffset against broker earliest; loss iff earliest > expected start.

    Mirrored behaviors: source filtering on "KafkaV2" in the description
    (:40), first-batch skip when startOffset is null/empty (:47-51), and
    never throwing from the callback (listener bus must survive).
    """

    def __init__(self, earliest_provider: OffsetProvider) -> None:
        self._earliest = earliest_provider
        self.events: list[DataLossEvent] = []

    # -- listener callbacks -------------------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        try:
            progress = event.progress
            sources = progress.sources or []
            for src in sources:
                self.check_source(src.description or "", src.startOffset, src.endOffset)
        except Exception:  # pragma: no cover - defensive, like the reference
            log.exception("data-loss monitor failed (non-fatal)")

    # -- pure logic (unit-tested without a running stream) ------------------
    def check_source(
        self, description: str, start_offset: str | None, end_offset: str | None
    ) -> list[DataLossEvent]:
        if "KafkaV2" not in description:  # DataLossMonitor.java:40
            return []
        if not start_offset or start_offset in ("null", "{}"):  # :47-51
            return []
        expected_start = parse_offsets_json(start_offset)
        expected_end = parse_offsets_json(end_offset) if end_offset else {}
        earliest = self._earliest(expected_start.keys())
        found = compute_loss(expected_start, earliest, expected_end=expected_end)
        for ev in found:
            log.error(ev.describe())
        self.events.extend(found)
        return found


# ---------------------------------------------------------------------------
# L2 — streaming preflight: last checkpoint batch vs broker earliest, rich
# diagnostics, never throws.
# ---------------------------------------------------------------------------
def preflight_detect(
    checkpoint_dir: str, earliest_provider: OffsetProvider
) -> list[DataLossEvent]:
    """Reference KafkaStreamingPreflightDetector.java:25-210. First-run
    fast-path when no checkpoint exists (:76-81); on loss, log the
    multi-paragraph diagnostic (:94-137) and return events — the caller
    decides policy (the reference never aborts here)."""
    batches = list_offset_batches(checkpoint_dir)
    if not batches:
        log.info("preflight: no checkpoint at %s — first run, nothing to check", checkpoint_dir)
        return []
    batch_id, path = batches[-1]
    _, committed = read_offsets_file(path)
    if not committed:
        return []
    try:
        earliest = earliest_provider(committed.keys())
    except Exception as exc:  # graceful degrade, KafkaBatchDataLossMonitor.java:59-62
        log.warning("preflight: broker unreachable (%s) — skipping check", exc)
        return []
    events = compute_loss(committed, earliest)
    for ev in events:
        log.error(
            "POSSIBLE DATA LOSS (preflight, batch %s): %s\n"
            "  Likely causes: retention expiry before restart; topic "
            "recreated; aggressive cleanup policy.\n"
            "  Recommended: inspect broker retention.ms, reset the "
            "checkpoint deliberately, or accept the gap and record it.",
            batch_id,
            ev.describe(),
        )
    return events


# ---------------------------------------------------------------------------
# L3 — checkpoint batch-transition check over the last two batches.
# ---------------------------------------------------------------------------
def check_batch_transition(
    checkpoint_dir: str, earliest_provider: OffsetProvider
) -> list[tuple[str, int, int, int]]:
    """Reference CheckpointKafkaDataLossMonitor.java:14-102: detects that
    Spark *already* silently jumped forward — prev batch ended below the
    broker's earliest AND the current batch starts exactly at earliest."""
    batches = list_offset_batches(checkpoint_dir)
    if len(batches) < 2:
        return []
    _, prev_end = read_offsets_file(batches[-2][1])
    _, curr_start = read_offsets_file(batches[-1][1])
    if not prev_end or not curr_start:
        return []
    try:
        earliest = earliest_provider(prev_end.keys())
    except Exception as exc:
        log.warning("batch-transition check: broker unreachable (%s)", exc)
        return []
    suspects = batch_transition_loss(prev_end, curr_start, earliest)
    for topic, partition, pend, early in suspects:
        log.error(
            "POSSIBLE DATA LOSS via checkpoint: %s-%d prev_end=%d < earliest=%d "
            "and current batch starts at earliest",
            topic,
            partition,
            pend,
            early,
        )
    return suspects


# ---------------------------------------------------------------------------
# L4 — batch-job offset-range guard.
# ---------------------------------------------------------------------------
class BatchOffsetGuard:
    """Reference KafkaBatchDataLossMonitor.java:18-150: before a bounded
    Kafka read, verify the requested startingOffsets still exist. Degrades
    gracefully (``ready`` False) when the broker probe fails (:26-47,
    59-62); the caller chooses throw-vs-continue (KafkaBatchJob.java:47-49).
    """

    def __init__(
        self,
        earliest_provider: OffsetProvider,
        latest_provider: OffsetProvider | None = None,
    ) -> None:
        self._earliest = earliest_provider
        self._latest = latest_provider
        self.ready = True

    def check(self, starting_offsets: str, ending_offsets: str | None = None) -> list[DataLossEvent]:
        expected_start = parse_offsets_json(starting_offsets)
        expected_end = parse_offsets_json(ending_offsets) if ending_offsets else {}
        try:
            earliest = self._earliest(expected_start.keys())
            latest = self._latest(expected_start.keys()) if self._latest else {}
        except Exception as exc:
            self.ready = False
            log.warning("batch guard: broker unreachable (%s) — monitor not ready", exc)
            return []
        return compute_loss(expected_start, earliest, expected_end=expected_end, latest=latest)


# ---------------------------------------------------------------------------
# L5 — standalone detect-and-log over every checkpoint batch × partition.
# ---------------------------------------------------------------------------
def detect_and_log(
    checkpoint_dir: str,
    earliest_provider: OffsetProvider,
    loss_log_path: str,
) -> int:
    """Reference KafkaLossDetector.scala:8-47 driven by Utils.checkDataLoss
    (Utils.scala:34-70): for each checkpoint offsets file and partition,
    append a ``[DATA-LOSS]`` line when committed < broker earliest. Returns
    the number of loss lines written."""
    written = 0
    with open(loss_log_path, "a", encoding="utf-8") as out:
        for batch_id, path in list_offset_batches(checkpoint_dir):
            _, committed = read_offsets_file(path)
            if not committed:
                continue
            try:
                earliest = earliest_provider(committed.keys())
            except Exception:
                continue
            for ev in compute_loss(committed, earliest):
                out.write(f"batch={batch_id} {ev.describe()}\n")
                written += 1
    return written


# ---------------------------------------------------------------------------
# L6 — log-scraping fallback: the reference's log4j2 appender patterns
# (KafkaDataLossAppender.java:37-52) as a post-hoc scan.
# ---------------------------------------------------------------------------
LOSS_LOG_PATTERNS = re.compile(
    "|".join(
        re.escape(p)
        for p in ("Some data may be lost", "Cannot fetch offset", "Skip missing records")
    )
)


def scan_log_for_loss(lines: Iterable[str]) -> list[str]:
    """Return the log lines matching Spark's own data-loss warnings."""
    return [ln for ln in lines if LOSS_LOG_PATTERNS.search(ln)]


class LiveLossLogHook:
    """L6 as a LIVE in-flight hook — the reference's log4j2 appender
    (KafkaDataLossAppender.java:37-52) rebuilt over py4j: a log4j2
    ``WriterAppender`` is attached to the JVM root logger config at WARN
    level, so every Spark log event flows through it the moment it is
    logged (same interception point as the reference's custom appender).
    ``drain()`` dispatches any captured lines matching the three
    reference loss patterns to ``on_match`` — call it mid-stream (or from
    a poller thread) for live alerting, and once after shutdown.

    Python cannot subclass a log4j2 appender without a py4j callback
    server (which Spark does not start), so capture is JVM-side (the
    appender buffers into a ``StringWriter``) and dispatch is
    Python-side — capture is in-flight, dispatch is poll-granular.
    """

    def __init__(self, spark, on_match: Callable[[str], None] | None = None) -> None:
        self._on_match = on_match
        self.matches: list[str] = []
        self._pos = 0
        jvm = spark._jvm  # noqa: SLF001
        self._ctx = jvm.org.apache.logging.log4j.LogManager.getContext(False)
        config = self._ctx.getConfiguration()
        self._writer = jvm.java.io.StringWriter()
        layout = (
            jvm.org.apache.logging.log4j.core.layout.PatternLayout.newBuilder()
            .withPattern("%p %c{1}: %m%n")
            .build()
        )
        self._appender = (
            jvm.org.apache.logging.log4j.core.appender.WriterAppender.createAppender(
                layout, None, self._writer, "ksj-live-loss-hook", False, True
            )
        )
        self._appender.start()
        config.addAppender(self._appender)
        self._root = config.getRootLogger()
        self._root.addAppender(
            self._appender, jvm.org.apache.logging.log4j.Level.WARN, None
        )
        self._ctx.updateLoggers()

    def drain(self) -> list[str]:
        """Scan appender output captured since the last drain; dispatch and
        return new loss matches."""
        buf = self._writer.toString()
        new = buf[self._pos :]
        self._pos = len(buf)
        found = scan_log_for_loss(new.splitlines())
        for line in found:
            log.error("[DATA-LOSS][live-hook] %s", line)
            if self._on_match is not None:
                self._on_match(line)
        self.matches.extend(found)
        return found

    def detach(self) -> None:
        """Remove the appender from the root logger config."""
        self._root.removeAppender("ksj-live-loss-hook")
        self._ctx.updateLoggers()
        self._appender.stop()


def write_offsets_fixture(
    checkpoint_dir: str, batch_id: int, offsets: dict[str, dict[str, int]], metadata: dict | None = None
) -> str:
    """Test/fixture helper: write a Spark-format offsets file (v1 line,
    metadata JSON, offsets JSON — test/checkpoint-offset.json:1-25 shape).
    Lives here (not in tests) because ops tooling also uses it to fabricate
    recovery checkpoints."""
    import os

    offsets_dir = os.path.join(checkpoint_dir, "offsets")
    os.makedirs(offsets_dir, exist_ok=True)
    path = os.path.join(offsets_dir, str(batch_id))
    meta = metadata or {"batchWatermarkMs": 0, "batchTimestampMs": 0}
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("v1\n")
        fh.write(json.dumps(meta) + "\n")
        fh.write(json.dumps(offsets) + "\n")
    return path


def observe_rows(df, name: str = "pipeline_metrics"):
    """Attach named observed metrics (row count + null-key count) to a
    batch or streaming DataFrame — Spark's ``observe`` API computes them
    as a side effect of the normal plan (no extra pass, no extra action).

    Streaming: the metrics surface per micro-batch in
    ``StreamingQueryProgress.observedMetrics[name]`` and in
    ``QueryProgressEvent`` — the push-based counterpart of the
    reference's L1 progress monitor (DataLossMonitor.java:40-142), for
    data-quality invariants instead of offsets. Batch: read them back via
    ``pyspark.sql.Observation``.

    At 100 TB: observed metrics are aggregated executor-side with the
    running job (one extra partial agg fused into existing stages), so
    per-batch row accounting costs no additional scan — the difference
    between "count the stream twice" and "observe it once".
    """
    from pyspark.sql import functions as F

    return df.observe(
        name,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col(df.columns[0]).isNull(), 1).otherwise(0)
        ).alias("n_null_key"),
    )
