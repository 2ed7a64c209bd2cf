"""Streaming HyperLogLog — mergeable distinct-count state over a stream.

Per micro-batch, the distributed plan computes the batch's HLL register
maxima (operators.sketches.hll_register_ranks — map-side partial max, at
most HLL_M rows per partition cross the exchange), and only those <=HLL_M
(register, rank) rows reach the driver, where they merge into the running
state by register-wise max. Because HLL merge is exact (max is
associative/commutative/idempotent), the streaming state after any number
of micro-batches is BIT-IDENTICAL to the batch sketch over the union of
the data — which the tests assert literally against the
``hll_distinct_users`` registry query's construction.

This is the foreachBatch architecture of streaming/kmeans.py for the same
reason: an applyInPandasWithState formulation would funnel all rows
through one state key (single-task bottleneck at 100 TB), while here the
only driver-side state is O(HLL_M) regardless of stream volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_stream_job_spark.operators.sketches import (
    HLL_M,
    hll_estimate_from_registers,
    hll_register_ranks,
)


class StreamingHLL:
    """Driver-side register state + the foreachBatch update body."""

    def __init__(self, spark: SparkSession, key_col: str) -> None:
        self._spark = spark
        self.key_col = key_col
        self.registers: dict[int, int] = {}
        self.batches_seen = 0

    def update(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch body: merge this batch's register maxima."""
        for row in hll_register_ranks(batch_df, self.key_col).collect():
            reg, rank = int(row["register"]), int(row["m_rank"])
            if rank > self.registers.get(reg, 0):
                self.registers[reg] = rank
        self.batches_seen += 1

    def estimate(self) -> float:
        return hll_estimate_from_registers(self.registers, HLL_M)
