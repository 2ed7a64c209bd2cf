"""Streaming mini-batch k-means: the foreachBatch update must (a) match
the closed-form decay-weighted mean exactly on a single batch, and (b)
accumulate correctly across micro-batches with the distributed assign
path partitioning the whole corpus."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafka_stream_job_spark.streaming.kmeans import StreamingKMeans
from kafka_stream_job_spark.tables import load_table

from .conftest import SF_SMOKE

K = 4


def _emb_rows(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    return [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.orderBy("vec_id").collect()
    ]


def _init_centroids(rows):
    return {int(vid): vec for vid, vec in rows[:K]}


def _nearest(vec, centroids):
    best, best_d = None, math.inf
    for k in sorted(centroids):
        d = sum((a - b) ** 2 for a, b in zip(vec, centroids[k]))
        if d < best_d:
            best, best_d = k, d
    return best


def test_single_batch_equals_closed_form(spark):
    """decay=1, zero prior mass, one batch → each centroid lands exactly on
    the mean of its assigned points (pure-Python closed form)."""
    rows = _emb_rows(spark)
    init = _init_centroids(rows)
    skm = StreamingKMeans(spark, init, decay=1.0)

    batch = spark.createDataFrame(
        [(vid, vec) for vid, vec in rows], "vec_id long, emb array<double>"
    )
    skm.update_batch(batch, 0)

    member = {}
    for vid, vec in rows:
        member.setdefault(_nearest(vec, init), []).append(vec)
    for k, vecs in member.items():
        want = [sum(col) / len(vecs) for col in zip(*vecs)]
        got = skm.centroids[k]
        assert all(
            abs(a - b) < 1e-9 for a, b in zip(got, want)
        ), f"centroid {k} diverged from closed-form mean"
        assert skm.weights[k] == len(vecs)
    assert skm.points_seen == len(rows)


def test_stream_two_microbatches_accumulates(spark, tmp_path):
    """Two files + maxFilesPerTrigger=1 → two micro-batches; mass and
    counts accumulate, every vector predicts to a live centroid."""
    rows = _emb_rows(spark)
    init = _init_centroids(rows)
    skm = StreamingKMeans(spark, init, decay=1.0)

    src = str(tmp_path / "stream_src")
    full = spark.createDataFrame(
        [(vid, vec) for vid, vec in rows], "vec_id long, emb array<double>"
    )
    full.filter(F.col("vec_id") % 2 == 0).coalesce(1).write.parquet(src)
    full.filter(F.col("vec_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("vec_id long, emb array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = skm.fit_stream(stream, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert skm.batches_seen >= 2, "maxFilesPerTrigger=1 should split batches"
    assert skm.points_seen == len(rows)
    assert sum(skm.weights.values()) == pytest.approx(len(rows))

    pred = skm.predict(full)
    assert pred.count() == len(rows)
    assert pred.select("cent_id").distinct().count() <= K
    assert pred.filter(F.col("cent_id").isNull()).count() == 0


def test_decay_forgets_history(spark):
    """decay<1 discounts old mass: after a second identical batch, the
    weight equals m·(1+decay), not 2m."""
    rows = _emb_rows(spark)[:40]
    init = _init_centroids(rows)
    skm = StreamingKMeans(spark, init, decay=0.5)
    batch = spark.createDataFrame(
        [(vid, vec) for vid, vec in rows], "vec_id long, emb array<double>"
    )
    skm.update_batch(batch, 0)
    w1 = dict(skm.weights)
    skm.update_batch(batch, 1)
    for k, w in skm.weights.items():
        assert w == pytest.approx(w1[k] * 0.5 + w1[k]), f"centroid {k}"
