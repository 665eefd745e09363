"""Query registry: every operator the engine claims is backed by a
named query (Spark implementation) and, where SQL-expressible, a
DuckDB oracle SQL string over the same parquet tables.

The driver (and ``tests/``) runs both sides at sf=0.01 and compares
row-count + schema + order-insensitive value hash. Column names are
aliased identically on both sides; float aggregates are rounded on
both sides so summation-order epsilon can't flip the hash; timestamps
are formatted to strings on both sides (Spark session TZ is UTC,
DuckDB is UTC-naive).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a (spark_fn, oracle_sql) pair to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(
            name=name, spark_fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags
        )
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import all query modules (side effect: registry population)."""
    from hyppo_worker_spark.queries import (  # noqa: F401
        dedup_queries,
        pipeline_queries,
        relational,
        similarity_queries,
        text_queries,
    )

    return REGISTRY
