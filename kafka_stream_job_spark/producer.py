"""K4 — the test-fixture producer (reference: TestAvroProducer.scala:32-74):
generate OrderEvent messages, Avro-binary-encode them, and frame them for a
Kafka sink.

The reference serializes one ``GenericRecord`` per message through a
``BinaryEncoder`` with no schema-registry framing
(TestAvroProducer.scala:51-63). Avro's binary encoding for the 3-field
OrderEvent record is tiny and stable — string = zigzag-varint length +
UTF-8 bytes, double = 8 bytes IEEE-754 little-endian — so the encoder here
is pure Python (no avro library in the sandbox), with a decoder for
round-trip tests. Production delivery is ``df.write.format("kafka")`` with
``kafka.acks=all`` (the reference's producer config,
TestAvroProducer.scala:41); without a broker the framed DataFrame is the
testable artifact.
"""

from __future__ import annotations

import struct

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_FIXTURE_MESSAGES = 256  # TestAvroProducer.scala:48


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def encode_order_event(order_id: str, amount: float, ts: str) -> bytes:
    """Avro binary encoding of OrderEvent{orderId,amount,ts} — identical
    bytes to the reference's GenericDatumWriter+BinaryEncoder output
    (TestAvroProducer.scala:57-63)."""
    oid = order_id.encode("utf-8")
    t = ts.encode("utf-8")
    return (
        _write_varint(_zigzag(len(oid)))
        + oid
        + struct.pack("<d", amount)
        + _write_varint(_zigzag(len(t)))
        + t
    )


def decode_order_event(payload: bytes) -> tuple[str, float, str]:
    """Inverse of encode_order_event, for round-trip verification."""
    n, pos = _read_varint(payload, 0)
    n = _unzigzag(n)
    order_id = payload[pos : pos + n].decode("utf-8")
    pos += n
    (amount,) = struct.unpack_from("<d", payload, pos)
    pos += 8
    n, pos = _read_varint(payload, pos)
    n = _unzigzag(n)
    ts = payload[pos : pos + n].decode("utf-8")
    return order_id, amount, ts


def fixture_order_events(
    spark: SparkSession, n: int = N_FIXTURE_MESSAGES
) -> DataFrame:
    """Deterministic stand-in for the reference's random 256-message run:
    (orderId, amount, ts) rows generated distributed via ``range`` — no
    driver-side list for large n."""
    return spark.range(n).select(
        F.concat(F.lit("order-"), F.md5(F.col("id").cast("string"))).alias("orderId"),
        (F.pmod(F.col("id") * 7919, F.lit(100000)) / 100.0).alias("amount"),
        F.date_format(
            F.timestamp_seconds(F.lit(1700000000) + F.col("id")),
            "yyyy-MM-dd'T'HH:mm:ss'Z'",
        ).alias("ts"),
    )


def frame_for_kafka(events: DataFrame) -> DataFrame:
    """(key, value) binary frame for ``df.write.format("kafka")``. The
    value is the Avro binary record, built by an Arrow-batched UDF (the
    encoder is Python; at fixture scale this is fine — a production
    pipeline with the spark-avro jar uses ``to_avro(struct(...))``
    JVM-side instead, same frame)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def encode(order_id: "pd.Series", amount: "pd.Series", ts: "pd.Series") -> "pd.Series":
        return pd.Series(
            [
                encode_order_event(o, float(a), t)
                for o, a, t in zip(order_id, amount, ts)
            ]
        )

    return events.select(
        F.encode(F.col("orderId"), "UTF-8").alias("key"),
        encode("orderId", "amount", "ts").alias("value"),
    )


def write_kafka_batch(framed: DataFrame, brokers: str, topic: str) -> None:
    """Produce the framed messages — ``acks=all`` like the reference
    (TestAvroProducer.scala:41). Requires a broker + the Kafka connector."""
    (
        framed.write.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("kafka.acks", "all")
        .option("topic", topic)
        .save()
    )
