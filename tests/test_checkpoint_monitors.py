"""Unit tests for the checkpoint reader + the four-mechanism data-loss
suite (SURVEY.md §2.6), using fabricated checkpoint dirs + injected broker
offset providers — the same fixture strategy the reference implies with
test/checkpoint-offset.json (FIXTURES.md §A3)."""

from __future__ import annotations

import pytest

from kafka_stream_job_spark.checkpoint import (
    batch_transition_loss,
    compute_loss,
    list_offset_batches,
    parse_offsets_json,
    read_checkpoint_offset,
    read_offsets_file,
)
from kafka_stream_job_spark.monitors import (
    BatchOffsetGuard,
    LiveDataLossMonitor,
    check_batch_transition,
    detect_and_log,
    preflight_detect,
    scan_log_for_loss,
    write_offsets_fixture,
)

# The reference's own captured offsets fixture (test/checkpoint-offset.json:19-23)
REF_OFFSETS = {"orders": {"0": 20, "1": 40, "2": 6}}


def provider_with(offsets: dict):
    """Fake broker: fixed earliest offsets."""
    return lambda tps: {tp: offsets[tp] for tp in tps if tp in offsets}


def failing_provider(tps):
    raise ConnectionError("broker unreachable")


# -- checkpoint reader ------------------------------------------------------


def test_parse_offsets_json():
    om = parse_offsets_json('{"orders":{"0":20,"1":40,"2":6}}')
    assert om == {("orders", 0): 20, ("orders", 1): 40, ("orders", 2): 6}


def test_read_offsets_file_roundtrip(tmp_path):
    path = write_offsets_fixture(str(tmp_path), 5, REF_OFFSETS, {"batchWatermarkMs": 0})
    meta, offsets = read_offsets_file(path)
    assert meta["batchWatermarkMs"] == 0
    assert offsets[("orders", 1)] == 40


def test_read_offsets_file_rejects_garbage(tmp_path):
    p = tmp_path / "offsets" / "0"
    p.parent.mkdir()
    p.write_text("not an offsets file\n")
    with pytest.raises(ValueError):
        read_offsets_file(str(p))


def test_list_offset_batches_numeric_sort(tmp_path):
    for b in (0, 2, 10, 9):  # lexicographic would order 10 before 9
        write_offsets_fixture(str(tmp_path), b, REF_OFFSETS)
    assert [b for b, _ in list_offset_batches(str(tmp_path))] == [0, 2, 9, 10]


def test_read_checkpoint_offset_latest_and_specific(tmp_path):
    write_offsets_fixture(str(tmp_path), 0, {"orders": {"0": 5}})
    write_offsets_fixture(str(tmp_path), 1, {"orders": {"0": 20}})
    assert read_checkpoint_offset(str(tmp_path), "orders", 0) == 20
    assert read_checkpoint_offset(str(tmp_path), "orders", 0, batch_id=0) == 5
    assert read_checkpoint_offset(str(tmp_path), "orders", 9) is None
    assert read_checkpoint_offset(str(tmp_path), "nope", 0) is None


# -- the shared loss predicate ---------------------------------------------


def test_compute_loss_predicate():
    # reference semantics: loss iff earliest > expected_start; lost range
    # [start, earliest-1], count = earliest - start.
    expected = {("orders", 0): 100, ("orders", 1): 60}
    earliest = {("orders", 0): 120, ("orders", 1): 60}
    events = compute_loss(expected, earliest)
    assert len(events) == 1
    ev = events[0]
    assert (ev.topic, ev.partition) == ("orders", 0)
    assert (ev.lost_from, ev.lost_to, ev.lost_count) == (100, 119, 20)


def test_compute_loss_no_loss_when_equal_or_behind():
    expected = {("orders", 0): 50}
    assert compute_loss(expected, {("orders", 0): 50}) == []
    assert compute_loss(expected, {("orders", 0): 10}) == []
    assert compute_loss(expected, {}) == []


def test_batch_transition_predicate():
    # CheckpointKafkaDataLossMonitor.java:61-63: prevEnd >= 0 && prevEnd <
    # earliest && currStart == earliest
    prev = {("orders", 0): 66}
    curr = {("orders", 0): 120}
    assert batch_transition_loss(prev, curr, {("orders", 0): 120}) == [
        ("orders", 0, 66, 120)
    ]
    # current start != earliest → no verdict
    assert batch_transition_loss(prev, {("orders", 0): 121}, {("orders", 0): 120}) == []
    # prev end at earliest → continuous, fine
    assert batch_transition_loss({("orders", 0): 120}, curr, {("orders", 0): 120}) == []


# -- L1 live monitor --------------------------------------------------------


def test_live_monitor_detects_loss_from_progress_json():
    mon = LiveDataLossMonitor(provider_with({("orders", 0): 30, ("orders", 1): 40}))
    found = mon.check_source(
        "KafkaV2[Subscribe[orders]]",
        '{"orders":{"0":20,"1":40}}',
        '{"orders":{"0":50,"1":60}}',
    )
    assert len(found) == 1
    assert found[0].lost_count == 10
    assert mon.events == found


def test_live_monitor_filters_non_kafka_and_first_batch():
    mon = LiveDataLossMonitor(provider_with({("orders", 0): 99}))
    assert mon.check_source("FileStreamSource[/x]", '{"orders":{"0":0}}', None) == []
    assert mon.check_source("KafkaV2[Subscribe[orders]]", None, None) == []
    assert mon.check_source("KafkaV2[Subscribe[orders]]", "{}", None) == []


# -- L2 preflight -----------------------------------------------------------


def test_preflight_first_run_and_loss(tmp_path):
    assert preflight_detect(str(tmp_path), provider_with({})) == []
    write_offsets_fixture(str(tmp_path), 0, REF_OFFSETS)
    events = preflight_detect(
        str(tmp_path), provider_with({("orders", 0): 25, ("orders", 1): 10, ("orders", 2): 6})
    )
    assert [(e.partition, e.lost_count) for e in events] == [(0, 5)]


def test_preflight_broker_down_degrades(tmp_path):
    write_offsets_fixture(str(tmp_path), 0, REF_OFFSETS)
    assert preflight_detect(str(tmp_path), failing_provider) == []


# -- L3 batch-transition monitor -------------------------------------------


def test_check_batch_transition_over_checkpoint(tmp_path):
    write_offsets_fixture(str(tmp_path), 0, {"orders": {"0": 66}})
    write_offsets_fixture(str(tmp_path), 1, {"orders": {"0": 120}})
    suspects = check_batch_transition(str(tmp_path), provider_with({("orders", 0): 120}))
    assert suspects == [("orders", 0, 66, 120)]
    # single batch → nothing to compare
    assert check_batch_transition(str(tmp_path / "nope"), provider_with({})) == []


# -- L4 batch guard ---------------------------------------------------------


def test_batch_guard_matches_reference_fixture():
    # KafkaBatchJob.java:24-25 fixture offsets
    guard = BatchOffsetGuard(
        provider_with({("orders", 0): 110, ("orders", 1): 0, ("orders", 2): 66}),
        latest_provider=provider_with({("orders", 0): 200, ("orders", 1): 200, ("orders", 2): 200}),
    )
    events = guard.check(
        '{"orders":{"0":100,"1":60,"2":66}}', '{"orders":{"0":120,"1":120,"2":86}}'
    )
    assert guard.ready
    assert [(e.partition, e.lost_from, e.lost_to, e.lost_count) for e in events] == [
        (0, 100, 109, 10)
    ]
    assert events[0].expected_end == 120
    assert events[0].kafka_latest == 200


def test_batch_guard_degrades_when_broker_down():
    guard = BatchOffsetGuard(failing_provider)
    assert guard.check('{"orders":{"0":100}}') == []
    assert not guard.ready


# -- L5 standalone logger ---------------------------------------------------


def test_detect_and_log_appends_lines(tmp_path):
    ckpt = tmp_path / "ckpt"
    write_offsets_fixture(str(ckpt), 0, {"orders": {"0": 5, "1": 5}})
    write_offsets_fixture(str(ckpt), 1, {"orders": {"0": 50, "1": 50}})
    log_path = tmp_path / "loss.log"
    n = detect_and_log(str(ckpt), provider_with({("orders", 0): 10, ("orders", 1): 5}), str(log_path))
    # batch 0 partition 0: committed 5 < earliest 10 → one loss line
    assert n == 1
    lines = log_path.read_text().splitlines()
    assert len(lines) == 1 and "[DATA-LOSS] orders-0" in lines[0]


# -- L6 log scan ------------------------------------------------------------


def test_scan_log_for_loss_patterns():
    lines = [
        "INFO all good",
        "WARN Some data may be lost because they are not available in Kafka any more",
        "WARN Cannot fetch offset 42",
        "INFO Skip missing records",
    ]
    assert len(scan_log_for_loss(lines)) == 3


def test_live_loss_log_hook_fires_during_stream(spark, tmp_path):
    """L6 live: the log4j2 appender hook must capture a data-loss warning
    logged WHILE a streaming query runs (in-flight interception, not a
    post-hoc file scan) and dispatch the on_match callback; unrelated
    warnings must not fire it."""
    from kafka_stream_job_spark.monitors import LiveLossLogHook

    fired = []
    hook = LiveLossLogHook(spark, on_match=fired.append)
    try:
        jvm_logger = spark._jvm.org.apache.logging.log4j.LogManager.getLogger(
            "ksj.test.kafka"
        )
        query = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", "10")
            .load()
            .writeStream.format("memory")
            .queryName("live_hook_probe")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            jvm_logger.warn("benign condition, nothing lost here")
            jvm_logger.warn(
                "Some data may be lost because they are not available in "
                "Kafka any more"
            )
            # drain mid-stream: the hook must already have the line
            matches = hook.drain()
            assert query.isActive
        finally:
            query.stop()
        assert len(matches) == 1 and "Some data may be lost" in matches[0]
        assert fired == matches
        assert hook.matches == matches
        # post-stop drain finds nothing new (no duplicate dispatch)
        assert hook.drain() == []
    finally:
        hook.detach()

    # after detach the appender no longer captures
    spark._jvm.org.apache.logging.log4j.LogManager.getLogger("ksj.test.kafka").warn(
        "Cannot fetch offset 99"
    )
    assert hook.drain() == []


# ---------------------------------------------------------------------------
# Property-based coverage of THE loss predicate (hypothesis): for any
# offset maps, compute_loss must report exactly the partitions where
# earliest > expected_start >= 0, with the arithmetic invariants the four
# monitors rely on.
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st

_tp = st.tuples(st.sampled_from(["orders", "events"]), st.integers(0, 5))
_offsets = st.dictionaries(_tp, st.integers(-1, 10_000), max_size=8)


@settings(max_examples=200, deadline=None)
@given(expected=_offsets, earliest=_offsets)
def test_compute_loss_properties(expected, earliest):
    from kafka_stream_job_spark.checkpoint import compute_loss

    events = compute_loss(expected, earliest)
    flagged = {(e.topic, e.partition) for e in events}
    should = {
        tp
        for tp, start in expected.items()
        if tp in earliest and earliest[tp] > start >= 0
    }
    assert flagged == should
    for e in events:
        tp = (e.topic, e.partition)
        assert e.lost_from == expected[tp]
        assert e.lost_to == earliest[tp] - 1
        assert e.lost_count == e.lost_to - e.lost_from + 1 > 0
        assert e.kafka_earliest == earliest[tp]


@settings(max_examples=200, deadline=None)
@given(
    prev_end=_offsets,
    curr_start=_offsets,
    earliest=_offsets,
)
def test_batch_transition_loss_never_false_positive_when_contiguous(
    prev_end, curr_start, earliest
):
    """If for every partition curr_start <= prev_end + 1 (no forward jump),
    the batch-transition monitor must stay silent regardless of broker
    state below curr_start."""
    from kafka_stream_job_spark.checkpoint import batch_transition_loss

    contiguous = {tp: min(v, prev_end.get(tp, v)) for tp, v in curr_start.items()}
    sus = batch_transition_loss(prev_end, contiguous, earliest)
    for finding in sus:
        tp = (finding.topic, finding.partition)
        # any finding must involve an actual jump past prev_end
        assert earliest.get(tp, -1) > prev_end.get(tp, -1)


def test_offsetlog_datasource_reads_kafka_shaped_checkpoint(spark, tmp_path):
    """The ksj_offsetlog Python DataSource must expand a Kafka-shaped
    offsets file (the reference's captured fixture) into one row per
    (batch, topic, partition) with the batch metadata watermark, and scan
    one InputPartition per batch file."""
    from kafka_stream_job_spark.sources.offsetlog import register_offsetlog_source

    write_offsets_fixture(str(tmp_path), 0, REF_OFFSETS, {"batchWatermarkMs": 0})
    write_offsets_fixture(str(tmp_path), 1, {"orders": {"0": 25, "1": 41, "2": 9}},
                          {"batchWatermarkMs": 1234})
    register_offsetlog_source(spark)
    rows = {
        tuple(r)
        for r in spark.read.format("ksj_offsetlog")
        .option("path", str(tmp_path))
        .load()
        .collect()
    }
    assert rows == {
        (0, "kafka", "orders", 0, 20, 0),
        (0, "kafka", "orders", 1, 40, 0),
        (0, "kafka", "orders", 2, 6, 0),
        (1, "kafka", "orders", 0, 25, 1234),
        (1, "kafka", "orders", 1, 41, 1234),
        (1, "kafka", "orders", 2, 9, 1234),
    }


def test_tmp_sibling_unique_per_thread_and_prefix_sweepable():
    """Two same-process threads staging to one destination must get
    distinct tmp names, and every name must fall under tmp_prefix() so
    abort()'s prefix sweep still finds them."""
    import threading

    from kafka_stream_job_spark.checkpoint import tmp_prefix, tmp_sibling

    path = "/tmp/some/manifest.json"
    got = {}
    # both threads must be ALIVE simultaneously — Python reuses thread
    # idents after exit, and concurrent writers are the hazard here
    barrier = threading.Barrier(2)

    def grab(k):
        barrier.wait()
        got[k] = tmp_sibling(path)
        barrier.wait()

    threads = [threading.Thread(target=grab, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert got[0] != got[1]
    assert all(v.startswith(tmp_prefix(path)) for v in got.values())
    assert tmp_sibling(path) == tmp_sibling(path)  # stable within a thread


def test_drain_clamp_releases_lock_when_conf_access_fails():
    """If conf access raises inside __enter__, the process-wide drain lock
    must be released — otherwise every later drain deadlocks."""
    import pytest

    # relational must register first — streaming.pipeline's module-level
    # registrations read oracles from the relational registry entries
    from kafka_stream_job_spark.operators import relational  # noqa: F401
    from kafka_stream_job_spark.streaming.pipeline import _drain_partitions

    class _BoomConf:
        def get(self, *_):
            raise RuntimeError("py4j hiccup")

        def set(self, *_):
            raise RuntimeError("py4j hiccup")

    class _BoomSpark:
        conf = _BoomConf()

    with pytest.raises(RuntimeError, match="hiccup"):
        with _drain_partitions(_BoomSpark()):
            pass  # pragma: no cover — enter must raise
    # the lock must be free and the depth untouched
    assert _drain_partitions._lock.acquire(timeout=1)
    _drain_partitions._lock.release()
    assert _drain_partitions._depth == 0
