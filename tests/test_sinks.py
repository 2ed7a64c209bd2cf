"""Partitioned sink layout + partition pruning: the write path a 100 TB
events table actually uses (hive-style date partitions), verified by
checking that a date filter prunes the file listing instead of scanning
every partition."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafka_stream_job_spark.tables import load_table

from .conftest import SF_SMOKE


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """Additive schema evolution on the bronze layer: v2 files gain a
    column; mergeSchema reads both generations, with v1 rows null-filled
    — the no-rewrite evolution path a long-lived ingestion table needs."""
    events = load_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "bronze_evolving")
    v1 = events.select("event_id", "event_type", "value").limit(500)
    v1.write.parquet(out + "/gen=1")
    v2 = (
        events.select("event_id", "event_type", "value")
        .withColumn("schema_rev", F.lit(2))
        .limit(300)
    )
    v2.write.parquet(out + "/gen=2")

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {
        "event_id", "event_type", "value", "schema_rev", "gen",
    }
    assert merged.count() == 800
    assert merged.filter(F.col("schema_rev").isNull()).count() == 500
    assert merged.filter(F.col("schema_rev") == 2).count() == 300


def test_partitioned_write_and_partition_pruning(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    out = str(tmp_path / "events_by_date")
    events.write.partitionBy("event_date").parquet(out)

    # hive-style layout on disk
    parts = sorted(d for d in os.listdir(out) if d.startswith("event_date="))
    assert len(parts) > 1, "expected multiple date partitions"

    back = spark.read.parquet(out)
    one_day = parts[0].split("=")[1]
    q = back.filter(F.col("event_date") == one_day)

    # the date filter must become a partition filter (pruned listing),
    # not a row-level post-scan filter
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan[plan.find("PartitionFilters") :]
    assert "event_date" in pf[: pf.find("]") + 1]

    expected = events.filter(F.col("event_date") == one_day).count()
    assert q.count() == expected > 0

    # round-trip completeness
    assert back.count() == events.count()


def test_format_round_trips_preserve_orders(spark, tmp_path):
    """CSV / JSON-lines / ORC round-trips of the orders table: the engine
    must ingest the interchange formats a warehouse actually receives, not
    only parquet. Values (including timestamps) must survive each
    round-trip bit-for-bit against the parquet original."""
    orders = load_table(spark, SF_SMOKE, "orders")
    want = sorted(tuple(r) for r in orders.collect())

    csv_dir = str(tmp_path / "orders_csv")
    orders.write.option("header", True).option(
        "timestampFormat", "yyyy-MM-dd HH:mm:ss"
    ).csv(csv_dir)
    got_csv = spark.read.option("header", True).schema(orders.schema).option(
        "timestampFormat", "yyyy-MM-dd HH:mm:ss"
    ).csv(csv_dir)
    assert sorted(tuple(r) for r in got_csv.collect()) == want

    json_dir = str(tmp_path / "orders_json")
    orders.write.json(json_dir)
    got_json = spark.read.schema(orders.schema).json(json_dir)
    assert sorted(tuple(r) for r in got_json.collect()) == want

    orc_dir = str(tmp_path / "orders_orc")
    orders.write.orc(orc_dir)
    got_orc = spark.read.orc(orc_dir)
    assert sorted(tuple(r) for r in got_orc.collect()) == want


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """Schema-on-read evolution the reference lacks (SURVEY.md §1.2 —
    fixed declared schema, no evolution): a bronze directory accretes
    files written under a WIDER schema; mergeSchema=True reads the union,
    null-filling the old rows — additive evolution without rewriting
    history. At 100 TB the same contract comes from Iceberg schema
    evolution; this is the parquet stand-in's version."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "bronze_evolving")
    v1 = spark.range(0, 10).select(
        F.col("id").alias("orderId"), (F.col("id") * 1.5).alias("amount")
    )
    v1.write.parquet(path)
    v2 = spark.range(10, 15).select(
        F.col("id").alias("orderId"),
        (F.col("id") * 1.5).alias("amount"),
        F.lit("eu-west").alias("region"),  # new column, additive
    )
    v2.write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"orderId", "amount", "region"}
    assert merged.count() == 15
    old = merged.filter(F.col("orderId") < 10)
    assert old.filter(F.col("region").isNull()).count() == 10  # null-filled
    assert merged.filter(F.col("region") == "eu-west").count() == 5
