"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`kafka_stream_job_spark.registry` — every operator
the engine implements is registered there as (name, spark_fn, oracle_sql);
this module re-exposes the registry in the driver's shape:

- ``entry(spark)``    — flagship query at sf0.001 (smoke: rows > 0).
- ``queries()``       — {name: (spark, sf_dir) -> DataFrame}.
- ``oracle_sql()``    — {name: ANSI SQL for DuckDB}; names absent here are
                        non-SQL-expressible ops checked rows-only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: shipping-priority top-k (join + agg + top-k over
    customer/orders/lineitem) at sf0.001."""
    from kafka_stream_job_spark.operators.relational import q3_shipping_priority

    return q3_shipping_priority(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kafka_stream_job_spark.registry import all_specs

    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    from kafka_stream_job_spark.registry import all_specs, prepare_oracle_inputs

    specs = all_specs()
    # Stage oracle inputs that live outside the sf_dir tables (lazy —
    # module import itself does no filesystem I/O).
    prepare_oracle_inputs()
    return {
        name: spec.oracle for name, spec in specs.items() if spec.oracle is not None
    }
