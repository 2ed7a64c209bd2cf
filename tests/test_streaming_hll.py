"""Streaming HLL: the mergeability contract asserted literally — the
streaming state after N micro-batches must equal the batch sketch over
all data seen, register for register (max is exact to merge, so there is
no approximation gap between streaming and batch)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_job_spark.operators.sketches import (
    hll_estimate_from_registers,
    hll_register_ranks,
)
from kafka_stream_job_spark.streaming.hll import StreamingHLL
from kafka_stream_job_spark.tables import load_table

from .conftest import SF_SMOKE


def _batch_registers(spark):
    events = load_table(spark, SF_SMOKE, "events")
    return {
        int(r["register"]): int(r["m_rank"])
        for r in hll_register_ranks(events, "user_id").collect()
    }


def test_two_microbatches_equal_batch_sketch(spark):
    events = load_table(spark, SF_SMOKE, "events").withColumn(
        "half", F.col("event_id") % 2
    )
    hll = StreamingHLL(spark, "user_id")
    for batch_id in (0, 1):
        hll.update(events.filter(F.col("half") == batch_id), batch_id)
    assert hll.batches_seen == 2
    assert hll.registers == _batch_registers(spark), (
        "streaming merge drifted from the batch sketch"
    )


def test_stream_foreach_batch_matches_batch_estimate(spark, tmp_path):
    """Drive a real bounded file stream through foreachBatch and compare
    the final estimate to the batch construction."""
    events = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id")
    src = str(tmp_path / "src")
    events.repartition(3).write.parquet(src)

    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    hll = StreamingHLL(spark, "user_id")
    q = stream.writeStream.foreachBatch(hll.update).option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).start()
    q.processAllAvailable()
    q.stop()

    assert hll.batches_seen >= 2, "expected multiple micro-batches"
    batch_regs = _batch_registers(spark)
    assert hll.registers == batch_regs
    assert hll.estimate() == hll_estimate_from_registers(batch_regs)
    n_exact = (
        load_table(spark, SF_SMOKE, "events")
        .agg(F.countDistinct("user_id"))
        .collect()[0][0]
    )
    # within the standard HLL error envelope for m=256 (~6.5% at 3 sigma
    # it is ~20%; the tiny smoke corpus sits in the exact
    # linear-counting regime, so the bound is comfortably loose)
    assert abs(hll.estimate() - n_exact) <= max(3.0, 0.2 * n_exact)


def test_streaming_hll_registry_query_equals_batch_twin(spark):
    """The registered streaming_hll_distinct_users drain must emit the
    SAME (n_registers_hit, hll_estimate) row as the batch
    hll_distinct_users plan — the bit-identical-merge claim surfaced at
    the registry level."""
    from kafka_stream_job_spark.registry import all_specs

    specs = all_specs()
    got = specs["streaming_hll_distinct_users"].fn(spark, SF_SMOKE).collect()[0]
    want = specs["hll_distinct_users"].fn(spark, SF_SMOKE).collect()[0]
    assert got["n_registers_hit"] == want["n_registers_hit"]
    assert got["hll_estimate"] == want["hll_estimate"]


def test_streaming_kmv_state_equals_batch_sketch(spark):
    """KMV's 'k smallest of the union' merge law: the drained streaming
    state must be BIT-IDENTICAL to the batch sketch, and the registry
    query must agree with kmv_distinct_users row-for-row (minus
    n_exact)."""
    from kafka_stream_job_spark.registry import all_specs

    specs = all_specs()
    got = specs["streaming_kmv_distinct_users"].fn(spark, SF_SMOKE).collect()[0]
    want = specs["kmv_distinct_users"].fn(spark, SF_SMOKE).collect()[0]
    assert got["n_sketch"] == want["n_sketch"]
    assert got["kth_hash"] == want["kth_hash"]
    assert got["kmv_estimate"] == want["kmv_estimate"]
