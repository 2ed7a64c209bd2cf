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
