"""Bucketed (co-located) tables: shuffle-free joins and aggregations.

At 100 TB the expensive part of a repeated fact-to-fact join is the
shuffle of both sides on every run. Writing both tables bucketed by
the join key with the same bucket count pins row co-location at rest:
Spark's bucketing-aware planner then joins bucket-by-bucket with NO
exchange on either side — the shuffle is paid once at write time and
amortized over every subsequent join/aggregation on that key.
"""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) managed table.

    A fresh session's in-memory catalog does not know about managed
    table locations left in the warehouse dir by a previous session,
    and ``saveAsTable`` refuses to reuse the location — drop the table
    AND clear a stale local location before writing.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
    if warehouse:
        shutil.rmtree(f"{warehouse.rstrip('/')}/{table}", ignore_errors=True)
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With equal
    bucket counts the planner emits SortMergeJoin with zero Exchange
    operators (verify with plans.explain.count_exchanges)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
