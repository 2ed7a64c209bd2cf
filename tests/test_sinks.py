"""Partitioned sink layout + partition pruning: the write path a 100 TB
events table actually uses (hive-style date partitions), verified by
checking that a date filter prunes the file listing instead of scanning
every partition."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafka_stream_job_spark.tables import load_table

from .conftest import SF_SMOKE


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
