"""Sharded training-data writer: deterministic global shuffle of a
corpus into N sized shards.

The last stage of a training-data pipeline is a *reproducible* global
shuffle — examples must land in the same shard regardless of input
partitioning, cluster size, or engine, so a training run can be
resumed/audited and two exports of the same corpus are byte-comparable
shard-for-shard. Spark's ``repartition(n)`` round-robin is
partition-order dependent, and ``hash(col)`` is engine-internal; the
shard key here is a content hash (md5 of the key column, same
convention as the sampling gates in ``queries/text_queries.py``), so
the assignment is a pure function of the row key.

At 100 TB: one hash-partitioned exchange on the shard id (the only
shuffle), map-side-free, with AQE coalescing disabled for the final
write (shard count is the contract, not a planner hint). Each shard is
written as its own parquet directory partition (``shard=K``), so a
trainer can mount an arbitrary subset of shards and downstream scans
get partition pruning on the shard column for free.

Reference parity: the reference persists processed data as one
records file per task (SURVEY.md §2.A PersistProcessedData;
``worker/src/main/scala/com/harrys/hyppo/worker/exec
/TaskSpecificExecutor.scala`` writes per-task files) — this operator
is the Spark-native generalization: deterministic placement + sized
output files.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHARD_COL = "shard"


def assign_shards(df: DataFrame, key_col: str, n_shards: int) -> DataFrame:
    """Add a deterministic ``shard`` column: md5-bucket(key) % n_shards.

    A pure function of the key column — independent of partitioning,
    row order, cluster size, and engine (DuckDB computes the identical
    bucket from the identical expression, see t13's oracle).
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    from hyppo_worker_spark.functions.text import md5_bucket

    # 15 hex chars (vs the gates' 7) so bucket skew stays negligible
    # even at shard counts in the tens of thousands.
    return df.withColumn(
        SHARD_COL, md5_bucket(key_col, n_shards, chars=15).cast("int")
    )


def plan_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int | None = None,
    target_rows: int | None = None,
) -> tuple[DataFrame, int]:
    """Resolve the shard count and return (df + shard column, n_shards).

    Either a fixed ``n_shards`` or a ``target_rows`` per shard (one
    count action resolves the total; ceil division sizes the fleet).
    """
    if (n_shards is None) == (target_rows is None):
        raise ValueError("pass exactly one of n_shards / target_rows")
    if n_shards is None:
        total = df.count()
        n_shards = max(1, math.ceil(total / target_rows))
    return assign_shards(df, key_col, n_shards), n_shards


def write_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int | None = None,
    target_rows: int | None = None,
    mode: str = "overwrite",
) -> int:
    """Shard the corpus and write one parquet directory per shard.

    Repartitions BY the shard column (one exchange; all rows of a
    shard are co-located, so each ``shard=K`` directory is written by
    a single task — no small-file fan-out) and sorts within partitions
    by the key so shard files are internally ordered (stable diffs,
    better column compression). Returns the shard count.
    """
    sharded, n = plan_shards(df, key_col, n_shards=n_shards, target_rows=target_rows)
    (
        sharded.repartition(n, F.col(SHARD_COL))
        .sortWithinPartitions(SHARD_COL, key_col)
        .write.mode(mode)
        .partitionBy(SHARD_COL)
        .parquet(path)
    )
    return n
