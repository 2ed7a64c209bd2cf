"""Runtime bloom-filter injection — the shuffle-join analogue of broadcast
pruning. When a selective filter sits on one side of a shuffle join,
Catalyst builds a bloom filter over the creation side's join keys and
injects a `might_contain` probe into the other side, so fact rows that
cannot match are dropped BEFORE the shuffle. At 100 TB this is the lever
that saves the exchange when the dim side is too big to broadcast; locked
in here so a config or plan regression fails CI.

The size thresholds are tuned for the tiny test parquet (the application
side must look "big" and the creation side "small"); the assertion is on
plan STRUCTURE, which is scale-independent.
"""

from __future__ import annotations

import pytest

from .conftest import SF_SMOKE


@pytest.fixture()
def bloom_spark(spark):
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    # No broadcast (forces the shuffle-join path bloom filters exist for);
    # zero application-side threshold so the tiny test scan qualifies.
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    yield spark
    for k, v in saved.items():
        conf.set(k, v)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bloom_filter_injected_into_fact_side(bloom_spark):
    spark = bloom_spark
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").filter(
        "o_totalprice > 400000"
    )
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .count()
    )
    plan = _plan(j)
    assert "bloom_filter_agg" in plan, "no bloom filter built on the dim side"
    assert "might_contain" in plan, "no bloom probe injected into the fact side"
    # the probe must sit on the lineitem (application) side, i.e. reference
    # the fact join key
    probe_idx = plan.find("might_contain")
    assert "l_orderkey" in plan[probe_idx : probe_idx + 400]


def test_bloom_filter_respects_kill_switch(bloom_spark):
    spark = bloom_spark
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").filter(
        "o_totalprice > 400000"
    )
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    assert "might_contain" not in _plan(j)
