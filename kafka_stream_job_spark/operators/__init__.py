"""Operator surface: relational core + LLM-data-pipeline extensions.

Each module registers its queries with :mod:`kafka_stream_job_spark.registry`
at import time. SURVEY.md §2.7 / §7.3 is the coverage map.
"""
