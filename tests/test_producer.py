"""K4 producer parity: Avro binary encoding round-trips, fixture shape
matches the reference run (256 messages), and the Kafka frame is valid."""

from __future__ import annotations

from kafka_stream_job_spark.producer import (
    N_FIXTURE_MESSAGES,
    decode_order_event,
    encode_order_event,
    fixture_order_events,
    frame_for_kafka,
)


def test_avro_binary_roundtrip_unit():
    cases = [
        ("order-abc", 128.75, "2024-01-01T00:00:00Z"),
        ("", 0.0, ""),
        ("x" * 300, -1.5e300, "t"),  # multi-byte varint length
        ("ünïcødé-id", 3.141592653589793, "2024-06-30T23:59:59Z"),
    ]
    for oid, amount, ts in cases:
        assert decode_order_event(encode_order_event(oid, amount, ts)) == (
            oid,
            amount,
            ts,
        )


def test_fixture_frame_roundtrip(spark):
    events = fixture_order_events(spark)
    framed = frame_for_kafka(events)
    rows = framed.collect()
    assert len(rows) == N_FIXTURE_MESSAGES
    originals = {r["orderId"]: r for r in events.collect()}
    for r in rows:
        oid, amount, ts = decode_order_event(bytes(r["value"]))
        assert bytes(r["key"]).decode("utf-8") == oid
        src = originals[oid]
        assert amount == src["amount"]
        assert ts == src["ts"]
