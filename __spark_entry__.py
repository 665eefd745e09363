"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``hyppo_worker_spark/queries/`` — this module
only adapts the registry to the driver's entry-point shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hyppo_worker_spark.queries import driver_registry, load_all  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary aggregate) on sf0.001."""
    registry = load_all()
    return registry["q01_pricing_summary"].spark_fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Curated driver-facing slice (≤50) of the full registry.

    The driver checks only the alphabetically-first 50 entries, so this
    returns the curated ``driver_registry()`` — every operator family
    keeps a representative; redundant relational variants are retired
    to ``DRIVER_RETIRED`` but remain registered and locally checked by
    ``tools/check.py`` (which runs the FULL registry).
    """
    return {name: q.spark_fn for name, q in driver_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted → rows-only check)."""
    return {
        name: q.oracle
        for name, q in driver_registry().items()
        if q.oracle is not None
    }
