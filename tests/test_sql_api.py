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
