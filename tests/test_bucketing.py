"""Bucketed co-located joins — the pre-shuffle strategy a 100 TB fact/fact
join relies on: write both sides bucketed by the join key, and the join
plans with ZERO shuffle exchanges (each bucket pair joins in place).
This is the batch analogue of Kafka partition co-location the reference
gets for free from its single-topic design."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_job_spark.tables import load_table

from .conftest import SF_SMOKE

N_BUCKETS = 8


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")

    (
        orders.write.bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    (
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_lineitem")
    )

    # disable broadcast so the join would otherwise shuffle both sides
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("b_orders")
            .join(spark.table("b_lineitem"), "o_orderkey")
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        # bucket co-location: no exchange below the join — the only
        # allowed exchange is the final tiny groupBy rollup
        join_part = plan[plan.find("SortMergeJoin") :]
        assert "Exchange hashpartitioning" not in join_part, (
            "bucketed join still shuffles:\n" + plan
        )
        assert "SelectedBucketsCount" in plan

        # correctness: same result as the plain (shuffling) join
        want = {
            (r["o_orderstatus"], r["n"])
            for r in orders.join(
                lineitem, orders.o_orderkey == lineitem.l_orderkey
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        got = {(r["o_orderstatus"], r["n"]) for r in joined.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        for name in ("b_orders", "b_lineitem"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucket_pruning_on_key_filter(spark):
    """A point filter on the bucket key must prune to 1 of N buckets at
    scan time (SelectedBucketsCount 1 out of N) — the scan cost of a key
    lookup is 1/N of the table regardless of table size."""
    orders = load_table(spark, SF_SMOKE, "orders")
    spark.sql("DROP TABLE IF EXISTS b_orders_prune")
    (
        orders.write.bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders_prune")
    )
    # DisableUnnecessaryBucketedScan turns the bucketed scan off when no
    # join/agg consumes the distribution — force it on so the FILTER
    # pruning path (the point-lookup case) is what's under test.
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        key = orders.select(F.min("o_orderkey")).first()[0]
        q = spark.table("b_orders_prune").filter(F.col("o_orderkey") == key)
        plan = _plan(q)
        assert f"SelectedBucketsCount: 1 out of {N_BUCKETS}" in plan, plan
        assert q.count() == orders.filter(F.col("o_orderkey") == key).count()
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
        spark.sql("DROP TABLE IF EXISTS b_orders_prune")
