"""SparkSession factory tuned for the engine.

Local-mode testing uses ``local[N]``; the same configs are the ones
you'd set on a real cluster (AQE, adaptive skew join, Arrow). The
shuffle-partition count is sized to cores locally; on a 1000-executor
cluster you'd raise it (or let AQE coalesce from a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hyppo_worker_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    AQE is enabled so runtime statistics re-plan shuffles (partition
    coalescing, skew-join splitting, dynamic broadcast) — this is the
    scale path: the same job that runs on local[32] re-plans itself on
    a 1000-executor cluster without code changes.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if master.startswith("local") else 200

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Python DataSource connectors (sources/integration_source.py)
        # prune whole ingestion tasks via pushFilters — off by default
        # in Spark 4.1.
        .config("spark.sql.python.filterPushdown.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


from contextlib import contextmanager


@contextmanager
def scoped_conf(spark: SparkSession, key: str, value: str):
    """Set a runtime conf for the duration of a block, restoring the
    previous value after — queries must neither depend on ambient
    session configs (the p06 failure class) nor leak their own.

    Main use: ``spark.sql.shuffle.partitions`` around a streaming
    query start. A stateful streaming operator creates one state-store
    instance PER shuffle partition PER store (a stream-stream join has
    four stores), and the count is frozen into the checkpoint at first
    run — inheriting a batch-sized default means hundreds of state
    stores each paying per-batch checkpoint file I/O for a stream
    whose throughput needs a handful. Measured on p18 (sf0.1, 4
    micro-batches): 32 partitions = 14-23s drain, 8 partitions =
    4-5s, identical results. On a real cluster, size this to stream
    throughput — it cannot be AQE-coalesced after the checkpoint
    exists."""
    # get(key) raises for keys with no default that were never set;
    # a previously-UNSET key must be restored by unsetting it, not by
    # writing some value back (which would leak the scoped setting).
    prev = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def clear_cache(spark: SparkSession) -> None:
    """Drop all persisted intermediates. Operators like MinHash-LSH
    persist narrow projections as codegen/recompute barriers; a
    long-lived session (bench loops, the engine) should clear them
    between unrelated queries."""
    spark.catalog.clearCache()


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES):
    """Read the synthetic star-schema tables and register temp views.

    Returns a dict of DataFrames. Reads are lazy; Catalyst prunes
    columns and pushes filters into the parquet scans per query.
    """
    from pyspark.sql import functions as F

    # The driver may invoke queries with ITS OWN session; pin the
    # runtime-settable confs every oracle comparison depends on
    # (timestamp→string formatting must agree with DuckDB's UTC-naive
    # timestamps regardless of host timezone).
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    dfs = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if name == "events":
            # events.parquet uses INT64 TIMESTAMP(NANOS) which Spark's
            # parquet reader rejects; read nanos as long and truncate to
            # microsecond timestamps (matches DuckDB's second-level
            # formatting in oracles).
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
            if dict(df.dtypes).get("ts") == "bigint":
                df = df.withColumn(
                    "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
                )
        else:
            df = spark.read.parquet(path)
        # Newer driver-generated parquet marks timestamps as
        # isAdjustedToUTC=false, which Spark 4 infers as TIMESTAMP_NTZ.
        # Keep NTZ as-is: casting it to LTZ here would put a CAST above
        # every date filter and kill parquet predicate pushdown on
        # o_orderdate / l_shipdate / ts (measured ~1.5x on the
        # filter-heavy queries). NTZ compares/formats identically to
        # LTZ under the pinned UTC session; the one NTZ restriction —
        # no direct numeric cast — is handled at the expression site
        # (epoch arithmetic goes through an explicit
        # .cast("timestamp") first, which stays above the scan).
        df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs
