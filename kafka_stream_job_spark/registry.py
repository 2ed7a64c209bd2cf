"""Query registry — single source of truth for the driver contract.

Every operator the engine implements ships here as a :class:`QuerySpec`:
a name, a PySpark callable ``(spark, sf_dir) -> DataFrame``, and (when
SQL-expressible) the equivalent ANSI SQL the DuckDB oracle runs on the same
parquet tables. ``__spark_entry__.py`` re-exports this registry as
``queries()`` / ``oracle_sql()``; ``bench.py`` runs the specs tagged
``bench=True``; tests iterate all of it.

Keeping the Spark program and the oracle side by side in one decorator call
is what keeps column names/aliases in lockstep — the driver's compare sorts
columns by name before hashing, so any alias drift is an instant mismatch.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline run


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query spec to the registry."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, bench=bench)
        return fn

    return wrap


def all_specs() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: registration) and return
    the full registry."""
    # Imports live here (not module top) so importing the registry alone
    # stays cheap and cycle-free.
    from kafka_stream_job_spark.operators import (  # noqa: F401
        dedup,
        multimodal,
        pandas_ops,
        pipeline,
        relational,
        similarity,
        text,
    )
    from kafka_stream_job_spark import bronze  # noqa: F401

    return dict(REGISTRY)
