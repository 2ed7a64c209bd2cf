"""Streaming Misra-Gries heavy hitters — mergeable frequent-items state
over a stream, the foreachBatch twin of operators.sketches.

Per micro-batch the distributed plan computes exact per-token batch
counts (map-side partial agg; the shuffle carries the batch's distinct
tokens), and only that bounded summary reaches the driver, where
``mg_merge`` folds it into the running MG summary at fixed capacity.
MG summaries are mergeable (Agarwal et al.): after any number of
micro-batches the summary undercounts any token by at most N/(capacity+1)
of ALL rows seen, so the candidate set is a guaranteed superset of the
true heavy hitters of the whole stream — the exact-recount verify pass
(see heavy_hitter_tokens) can then run as a periodic batch job.

Driver-side state is O(capacity) regardless of stream volume — the same
argument as streaming/hll.py and streaming/kmeans.py for why this is
foreachBatch and not a single applyInPandasWithState key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_stream_job_spark.operators.sketches import mg_merge


class StreamingHeavyHitters:
    """Driver-side MG summary + the foreachBatch update body."""

    def __init__(self, spark: SparkSession, key_col: str, capacity: int = 100) -> None:
        self._spark = spark
        self.key_col = key_col
        self.capacity = capacity
        self.counters: dict[str, int] = {}
        self.rows_seen = 0
        self.batches_seen = 0

    def update(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch body: exact batch counts (distributed partial agg),
        then one driver-side MG merge of the bounded summary."""
        counts = (
            batch_df.groupBy(self.key_col)
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        batch = {str(r[self.key_col]): int(r["c"]) for r in counts}
        self.rows_seen += sum(batch.values())
        self.counters = mg_merge(self.counters, batch, self.capacity)
        self.batches_seen += 1

    def candidates(self) -> set[str]:
        """Superset of every key with true count > rows_seen/capacity."""
        return set(self.counters)
