"""The engine's SQL surface: `register_views` + `spark.sql` runs ANSI SQL
directly against the same table names the oracles use — Spark SQL (parser
→ Catalyst → Tungsten) IS the SQL engine; this pins the contract that
DataFrame programs and SQL text produce identical results."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_job_spark.operators.relational import top_customers_by_revenue
from kafka_stream_job_spark.tables import TABLE_NAMES, register_views

from .conftest import SF_SMOKE


def test_sql_matches_dataframe_api(spark):
    register_views(spark, SF_SMOKE)
    sql_rows = spark.sql(
        """
        SELECT c_custkey, c_name,
               ROUND(SUM(o_totalprice) * 100.0) / 100.0 AS revenue,
               COUNT(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 25
        """
    ).collect()
    df_rows = top_customers_by_revenue(spark, SF_SMOKE).collect()
    assert [tuple(r) for r in sql_rows] == [tuple(r) for r in df_rows]


def test_all_views_queryable(spark):
    register_views(spark, SF_SMOKE)
    for name in TABLE_NAMES:
        assert spark.sql(f"SELECT COUNT(*) AS n FROM {name}").collect()[0]["n"] > 0


def test_sql_explain_surface(spark):
    """Q3 introspection parity (query.explain(true),
    KafkaAvroToIceberg.scala:113): the four-plan stack is exposed."""
    register_views(spark, SF_SMOKE)
    q = spark.sql("SELECT event_type, COUNT(*) FROM events GROUP BY event_type")
    ext = q._jdf.queryExecution().toString()
    for section in ("Parsed Logical Plan", "Analyzed Logical Plan",
                    "Optimized Logical Plan", "Physical Plan"):
        assert section in ext


def test_sql_udf_inlines_no_python_boundary(spark):
    """SQL UDFs must inline into the plan — no BatchEvalPython /
    ArrowEvalPython stage, sums stay inside whole-stage codegen."""
    from kafka_stream_job_spark.registry import all_specs

    from .conftest import SF_SMOKE

    df = all_specs()["sql_udf_showcase"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan


def test_sql_scripting_bisection_finds_minimal_threshold(spark):
    """The scripted bisection must return the MINIMAL integer T with
    count(price <= T) >= half the table."""
    from kafka_stream_job_spark.registry import all_specs
    from kafka_stream_job_spark.tables import load_table
    from pyspark.sql import functions as F

    from .conftest import SF_SMOKE

    row = all_specs()["sql_scripting_showcase"].fn(spark, SF_SMOKE).collect()[0]
    li = load_table(spark, SF_SMOKE, "lineitem")
    assert row["n_at_or_below"] >= row["target"]
    below = li.filter(F.col("l_extendedprice") <= row["threshold"] - 1).count()
    assert below < row["target"]
