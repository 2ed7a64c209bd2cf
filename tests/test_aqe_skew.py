"""AQE runtime skew handling — the second half of the skew story next to
the static salting pattern (`salted_join_supplier_volume`): with adaptive
execution on (the session default), a hot join key is detected at runtime
and its partition split, without any query rewrite. Locked in here so a
session-config regression (AQE or skew-join accidentally disabled) fails
CI instead of surfacing as a straggler executor at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

SKEW_CONF = {
    # thresholds sized for a local-test shuffle (compressed KBs, not GBs)
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the SMJ path
}


def test_aqe_splits_skewed_join_partition(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"

    old = {k: spark.conf.get(k, None) for k in SKEW_CONF}
    for k, v in SKEW_CONF.items():
        spark.conf.set(k, v)
    try:
        # every 4th row lands on key 7 → one partition ~125k rows of
        # incompressible payload vs a ~1k-row median
        left = spark.range(500_000).select(
            F.when(F.col("id") % 4 == 0, F.lit(7))
            .otherwise(F.col("id"))
            .alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        right = spark.range(5_000).select(
            F.col("id").alias("k"), F.lit("dim").alias("tag")
        )
        joined = left.join(right, "k")
        rows = joined.collect()  # AQE decisions appear in the FINAL plan
        # 125_000 rows of key 7 + 3_750 non-hot keys < 5_000 (k % 4 != 0)
        assert len(rows) == 128_750

        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan, (
            "AQE did not mark the join skewed:\n" + plan
        )
        assert "skewed" in plan.split("ShuffleQueryStage 0")[0], (
            "hot side's AQEShuffleRead was not skew-split"
        )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
