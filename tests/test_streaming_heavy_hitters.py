"""Streaming MG: the mergeable-summaries guarantee asserted across real
micro-batches — candidates after the stream must contain every token
whose TOTAL count exceeds rows_seen/capacity, and the summary never
exceeds its capacity."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_job_spark.streaming.heavy_hitters import StreamingHeavyHitters
from kafka_stream_job_spark.tables import load_table

from .conftest import SF_SMOKE


def _token_stream_df(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    return docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
    )


def test_superset_guarantee_across_microbatches(spark):
    base = _token_stream_df(spark)
    # the smoke corpus is near-uniform (31-token vocab), so no token can
    # exceed n/8 — inject a genuinely hot token to make the guarantee
    # non-vacuous while capacity 8 < vocab still forces evictions
    n_base = base.count()
    hot = spark.range(n_base // 4).select(
        (F.col("id") % 4).alias("doc_id"), F.lit("__hot__").alias("token")
    )
    toks = base.unionByName(hot)
    hh = StreamingHeavyHitters(spark, "token", capacity=8)
    for batch_id in range(4):
        hh.update(toks.filter(F.col("doc_id") % 4 == batch_id), batch_id)
    assert hh.batches_seen == 4
    assert len(hh.counters) <= hh.capacity
    exact = {
        r["token"]: r["c"]
        for r in toks.groupBy("token").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    n = sum(exact.values())
    assert hh.rows_seen == n
    heavy = {t for t, c in exact.items() if c > n / hh.capacity}
    assert heavy, "smoke corpus must have heavy tokens at capacity 8"
    assert heavy <= hh.candidates(), "streaming MG lost a true heavy hitter"


def test_stream_foreach_batch_bounded_state(spark, tmp_path):
    toks = _token_stream_df(spark).select("token")
    src = str(tmp_path / "src")
    toks.repartition(3).write.parquet(src)
    stream = spark.readStream.schema(toks.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    hh = StreamingHeavyHitters(spark, "token", capacity=16)
    q = stream.writeStream.foreachBatch(hh.update).option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).start()
    q.processAllAvailable()
    q.stop()
    assert hh.batches_seen >= 2
    assert len(hh.counters) <= 16
    assert hh.rows_seen == toks.count()


def test_streaming_mg_registry_query_is_exact_heavy_hitters(spark):
    """The registered streaming MG query must return EXACTLY the true
    heavy hitters (count·capacity > N) — deterministic despite eviction
    order, because the exact verify pass filters the guaranteed-superset
    candidate set."""
    from kafka_stream_job_spark.registry import all_specs
    from kafka_stream_job_spark.streaming.pipeline import MG_STREAM_CAPACITY
    from kafka_stream_job_spark.tables import load_table
    from pyspark.sql import functions as F

    got = {
        (r["user_id"], r["n_events"])
        for r in all_specs()["streaming_heavy_hitter_users"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    events = load_table(spark, SF_SMOKE, "events")
    total = events.count()
    want = {
        (r["user_id"], r["n"])
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
        if r["n"] * MG_STREAM_CAPACITY > total
    }
    assert got == want and len(want) > 0
