"""kafka_stream_job_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``CoderYellow/kafka-stream-job`` (Kafka → Avro → Iceberg bronze ingestion
with a four-mechanism data-loss detection suite), extended — per the project
north star — into a full relational + LLM-data-pipeline operator surface,
all expressed as idiomatic Spark DataFrame/SQL programs so Catalyst/Tungsten
(and AQE at cluster scale) pick the physical strategy.

Layout
------
- ``session``     : SparkSession builder + .properties config loader
                    (re-expresses SparkConfigLoader.scala:9-24).
- ``tables``      : explicit schemas + loaders for the sandbox star schema.
- ``bronze``      : the reference's decode/enrich/append pipeline
                    (KafkaAvroToIceberg.scala:55-100, KafkaBatchJob.java:70-98)
                    parameterized over Kafka / parquet-binary inputs.
- ``checkpoint``  : Spark offset-log reader + the single loss predicate
                    shared by all monitors (SparkCheckpointReader.scala:18-43).
- ``monitors``    : the four data-loss detection mechanisms L1-L4 plus the
                    standalone logger L5 (SURVEY.md §2.6), driver-side Python.
- ``operators``   : relational core, dedup, similarity, text analysis,
                    multimodal plumbing — each op is a DataFrame program.
- ``streaming``   : Structured Streaming pipelines (watermarks, event-time
                    windows, stateful dedup) mirroring the bronze stream shape.
- ``registry``    : the query registry that feeds ``__spark_entry__.py``:
                    every operator ships as (name, spark_fn, oracle_sql).
"""

__version__ = "0.1.0"
