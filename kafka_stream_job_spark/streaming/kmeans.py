"""Streaming (mini-batch) k-means over an embedding stream.

Semantics follow the classic streaming k-means update (Spark MLlib's
StreamingKMeans forgetfulness model): for each micro-batch, points are
assigned to their nearest current centroid, then each centroid moves to
the decay-weighted mean of its history and the batch:

    n'  =  n·decay + m
    c'  =  (c·n·decay + Σ batch points) / n'

Architecture is ``foreachBatch``, NOT a single stateful group: assignment
and per-centroid summation run as a fully distributed DataFrame plan
(broadcast centroids → argmin window → posexplode partial agg — the same
shape as the batch ``cluster_kmeans_embeddings`` iteration in
operators/similarity.py), and only the K×DIM centroid summary crosses to
the driver to update the closure state. An ``applyInPandasWithState``
formulation would funnel every row through one state key — a single-task
bottleneck at 100 TB — so the state lives driver-side where it is O(K·DIM)
regardless of stream volume.

The Kafka-facing twin of this module's bounded file-stream tests is
bronze.kafka_stream (reference KafkaAvroToIceberg.scala:55-64): swap the
source, the foreachBatch body is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_stream_job_spark.operators._portable import jvm_values_df


class StreamingKMeans:
    """Driver-side centroid state + the foreachBatch update body.

    ``centroids``: {cent_id: list[float]} current positions.
    ``weights``:   {cent_id: float} decayed point mass per centroid.
    """

    def __init__(
        self,
        spark: SparkSession,
        init_centroids: dict[int, list[float]],
        decay: float = 1.0,
    ) -> None:
        if not 0.0 < decay <= 1.0:
            raise ValueError(f"decay must be in (0, 1], got {decay}")
        self._spark = spark
        self.decay = decay
        self.centroids: dict[int, list[float]] = {
            k: [float(x) for x in v] for k, v in init_centroids.items()
        }
        self.weights: dict[int, float] = {k: 0.0 for k in init_centroids}
        self.batches_seen = 0
        self.points_seen = 0

    # -- distributed per-batch plan -----------------------------------------
    def _assign(self, batch_df: DataFrame) -> DataFrame:
        """Nearest-centroid assignment: broadcast the K tiny centroids,
        argmin by (distance, cent_id) — batch rows never shuffle."""
        from pyspark.sql import Window

        # JVM VALUES relation: the pickled-RDD createDataFrame path pays
        # a Python-worker stage per materialization, once per BATCH here
        cent = jvm_values_df(
            self._spark,
            [(k, v) for k, v in sorted(self.centroids.items())],
            "cent_id long, c_emb array<double>",
        )
        dist = F.aggregate(
            F.zip_with(
                F.col("emb"),
                F.col("c_emb"),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        w = Window.partitionBy("vec_id").orderBy("dist", "cent_id")
        return (
            batch_df.crossJoin(F.broadcast(cent))
            .select("vec_id", "emb", "cent_id", dist.alias("dist"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    def update_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch body: distributed assign + per-centroid per-dim
        sums, then an O(K·DIM) driver-side state update."""
        assigned = self._assign(
            batch_df.select("vec_id", F.col("emb").cast("array<double>").alias("emb"))
        )
        summary = (
            assigned.select("cent_id", F.posexplode("emb").alias("pos", "x"))
            .groupBy("cent_id", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("m"))
            .groupBy("cent_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "s"))),
                    lambda st: st["s"],
                ).alias("sums"),
                F.max("m").alias("m"),
            )
        ).collect()  # K rows — centroid summaries only, never data rows

        for row in summary:
            k = row["cent_id"]
            m = float(row["m"])
            n = self.weights[k] * self.decay
            n_new = n + m
            c = self.centroids[k]
            self.centroids[k] = [
                (c[i] * n + row["sums"][i]) / n_new for i in range(len(c))
            ]
            self.weights[k] = n_new
            self.points_seen += int(m)
        # centroids with no batch points only decay their mass
        hit = {row["cent_id"] for row in summary}
        for k in self.weights:
            if k not in hit:
                self.weights[k] *= self.decay
        self.batches_seen += 1

    # -- stream wiring -------------------------------------------------------
    def fit_stream(self, emb_stream: DataFrame, checkpoint_dir: str):
        """Attach to an unbounded (vec_id, emb) stream; returns the
        StreamingQuery (caller drains/stops)."""
        return (
            emb_stream.writeStream.foreachBatch(self.update_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )

    def predict(self, vectors: DataFrame) -> DataFrame:
        """Batch-assign vectors to the current centroids."""
        return self._assign(
            vectors.select("vec_id", F.col("emb").cast("array<double>").alias("emb"))
        ).select("vec_id", "cent_id", "dist")
