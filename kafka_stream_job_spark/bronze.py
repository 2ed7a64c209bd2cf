"""The bronze ingestion pipeline — the reference's actual job, re-expressed.

Reference parity (SURVEY.md §2.1-2.4):

- T1 decode:    ``from_avro(col("value"), schema).as("data")``
                (KafkaAvroToIceberg.scala:67-70, KafkaBatchJob.java:79-82)
- T2 flatten:   ``.select("data.*")`` (KafkaAvroToIceberg.scala:71)
- T3 alias:     ``.as("data")`` (KafkaAvroToIceberg.scala:70)
- T4 enrich:    ``withColumn("ingested_at", current_timestamp())``
                (KafkaAvroToIceberg.scala:72, KafkaBatchJob.java:84)
- T5 tag:       ``withColumn("source", lit("kafka-batch"))``
                (KafkaBatchJob.java:85)
- K1 DDL:       CREATE TABLE IF NOT EXISTS … (KafkaAvroToIceberg.scala:79-89)
- K2/K3 sinks:  streaming/batch append (KafkaAvroToIceberg.scala:92-100,
                KafkaBatchJob.java:95-98)

Design: the decode step is **format-pluggable** (avro | json). The sandbox
has no spark-avro jar and no Kafka broker, so the default running path is
JSON payloads over any binary `value` column (same binary→struct→flatten
shape); `from_avro` activates when the jar is on the classpath — the
DataFrame program downstream is byte-identical either way. The input can be
a real Kafka source (`kafka_stream`/`kafka_batch` below) or any DataFrame
with a binary `value` column (parquet-backed in tests).

Scale: decode+flatten+enrich is a stateless narrow map — no shuffle, fully
whole-stage-codegen'd (JSON/Avro parse JVM-side). Sink parallelism ==
source partitions; at 100 TB you scale Kafka partitions / input splits, not
this code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_stream_job_spark.operators._portable import pround
from kafka_stream_job_spark.registry import register
from kafka_stream_job_spark.tables import load_table

#: The reference's OrderEvent schema (test/order.schema.json:1-19,
#: KafkaAvroToIceberg.scala:41-52) as both Avro JSON and Spark DDL.
ORDER_EVENT_AVRO = """
{
  "type": "record", "name": "OrderEvent", "namespace": "demo",
  "fields": [
    {"name": "orderId", "type": "string"},
    {"name": "amount", "type": "double"},
    {"name": "ts", "type": "string"}
  ]
}
"""
ORDER_EVENT_STRUCT = T.StructType(
    [
        T.StructField("orderId", T.StringType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("ts", T.StringType()),
    ]
)

#: Bronze table DDL — reference: KafkaAvroToIceberg.scala:81-87 (Iceberg in
#: production; `USING parquet` is the sandbox stand-in, same columns).
BRONZE_DDL = """
CREATE TABLE IF NOT EXISTS {table} (
  orderId STRING, amount DOUBLE, ts STRING,
  ingested_at TIMESTAMP, source STRING
) USING {provider}
"""


def avro_available(spark: SparkSession) -> bool:
    """True if the spark-avro connector is on the JVM classpath."""
    try:
        jvm = spark._jvm  # noqa: SLF001
        jvm.Class.forName("org.apache.spark.sql.avro.AvroDataToCatalyst")
        return True
    except Exception:
        return False


def iceberg_available(spark: SparkSession) -> bool:
    """True if the Iceberg Spark runtime is on the JVM classpath
    (production sink provider, KafkaAvroToIceberg.scala:79-100)."""
    try:
        jvm = spark._jvm  # noqa: SLF001
        jvm.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    extra_options: dict[str, str] | None = None,
) -> DataFrame:
    """S1 — Kafka streaming source (KafkaAvroToIceberg.scala:55-64).

    ``extra_options`` passes production knobs through verbatim — e.g.
    ``maxOffsetsPerTrigger`` (micro-batch rate limit, the Kafka twin of
    the maxFilesPerTrigger pacing tested on the file source),
    ``minPartitions`` (fan a hot topic out past its partition count),
    and ``kafka.security.protocol``/SASL settings. Defaults stay exactly
    the reference's four options.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("failOnDataLoss", "false")
    )
    for key, value in (extra_options or {}).items():
        reader = reader.option(key, value)
    return reader.load()


def kafka_batch(
    spark: SparkSession, brokers: str, topic: str, starting: str, ending: str
) -> DataFrame:
    """S2 — bounded Kafka batch source (KafkaBatchJob.java:70-77); the
    offset-range JSONs are per-partition maps like
    ``{"orders":{"0":100,"1":60,"2":66}}`` (KafkaBatchJob.java:24-25)."""
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting)
        .option("endingOffsets", ending)
        .load()
    )


def decode_events(
    raw: DataFrame,
    payload_format: str = "json",
    schema_json: str = ORDER_EVENT_AVRO,
    struct_schema: T.StructType = ORDER_EVENT_STRUCT,
    source_tag: str | None = None,
) -> DataFrame:
    """T1-T5: binary `value` → struct → flatten → enrich.

    Mirrors KafkaAvroToIceberg.scala:67-72 / KafkaBatchJob.java:79-85 with
    a pluggable decoder. Avro needs the spark-avro jar; JSON is the
    always-available path with the identical plan shape.
    """
    if payload_format == "avro":
        from pyspark.sql.avro.functions import from_avro

        data = from_avro(F.col("value"), schema_json).alias("data")
    elif payload_format == "json":
        data = F.from_json(
            F.decode(F.col("value"), "UTF-8"), struct_schema
        ).alias("data")
    else:
        raise ValueError(f"unknown payload_format {payload_format!r}")

    out = (
        raw.select(data)
        .select("data.*")
        .withColumn("ingested_at", F.current_timestamp())
    )
    if source_tag is not None:
        out = out.withColumn("source", F.lit(source_tag))
    return out


def create_bronze_table(
    spark: SparkSession, table: str, provider: str = "parquet"
) -> None:
    """K1 — bronze DDL (KafkaAvroToIceberg.scala:79-89). provider='iceberg'
    in production, 'parquet' in-sandbox."""
    spark.sql(BRONZE_DDL.format(table=table, provider=provider))


def write_stream_append(
    decoded: DataFrame, table: str, checkpoint_dir: str, fmt: str = "parquet"
):
    """K2 — streaming append sink with exactly-once checkpoint bookkeeping
    (KafkaAvroToIceberg.scala:92-100). Returns the StreamingQuery."""
    return (
        decoded.writeStream.format(fmt)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .toTable(table)
    )


def write_batch_append(decoded: DataFrame, table: str) -> None:
    """K3 — atomic batch append (KafkaBatchJob.java:95-98)."""
    decoded.write.mode("append").saveAsTable(table)


# ---------------------------------------------------------------------------
# Oracle-checked pipeline query: serialize the events table to JSON binary
# payloads (standing in for the Kafka `value` bytes, cf. the producer
# TestAvroProducer.scala:51-63), run the full decode→flatten→enrich
# pipeline, and project the deterministic columns. This exercises the exact
# bronze plan shape end-to-end inside the correctness gate.
# ---------------------------------------------------------------------------
_EVENT_PAYLOAD_STRUCT = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@register(
    "bronze_decode_roundtrip",
    oracle="""
        SELECT
            event_id,
            user_id,
            event_type,
            ROUND((value) * 1000000.0) / 1000000.0  AS value_r,
            'kafka-batch'    AS source
        FROM events
    """,
    tags=("bronze", "decode", "events"),
    bench=True,
)
def bronze_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    raw = events.select(
        F.encode(
            F.to_json(F.struct("event_id", "user_id", "event_type", "value")), "UTF-8"
        ).alias("value")
    )
    decoded = decode_events(
        raw,
        payload_format="json",
        struct_schema=_EVENT_PAYLOAD_STRUCT,
        source_tag="kafka-batch",
    )
    return decoded.select(
        "event_id",
        "user_id",
        "event_type",
        pround("value", 6).alias("value_r"),
        "source",
    )


# ---------------------------------------------------------------------------
# Decode-failure accounting — the operational twin of the reference's
# failOnDataLoss=false posture (KafkaAvroToIceberg.scala:60): tolerate bad
# payloads, never drop them silently. from_json is PERMISSIVE (null struct
# on corrupt input); this query corrupts a deterministic slice of payloads
# (every 50th event loses its closing brace) and reports per-type
# valid/corrupt counts — the dead-letter metric a bronze pipeline alerts on.
# ---------------------------------------------------------------------------
@register(
    "bronze_decode_errors",
    oracle="""
        SELECT
            event_type,
            CAST(SUM(CASE WHEN event_id % 50 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
            CAST(SUM(CASE WHEN event_id % 50 =  0 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt
        FROM events
        GROUP BY event_type
    """,
    tags=("bronze", "decode", "errors", "events"),
)
def bronze_decode_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    payload = F.to_json(F.struct("event_id", "user_id", "event_type", "value"))
    corrupted = F.when(
        F.col("event_id") % 50 == 0, F.substring(payload, 1, 10)
    ).otherwise(payload)
    raw = events.select(
        "event_type", F.encode(corrupted, "UTF-8").alias("value")
    )
    parsed = raw.select(
        "event_type",
        F.from_json(F.decode(F.col("value"), "UTF-8"), _EVENT_PAYLOAD_STRUCT).alias(
            "data"
        ),
    )
    # PERMISSIVE from_json yields an all-null struct (not NULL) on corrupt
    # input — probe a required field, not the struct itself.
    ok = F.col("data.event_id").isNotNull()
    return parsed.groupBy("event_type").agg(
        F.sum(F.when(ok, 1).otherwise(0)).alias("n_valid"),
        F.sum(F.when(~ok, 1).otherwise(0)).alias("n_corrupt"),
    )
