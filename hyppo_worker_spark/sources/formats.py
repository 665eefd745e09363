"""Format read/write helpers — the engine's scan/sink surface
(SURVEY.md §2.4 "scans/sources" and "sinks" rows).

The reference's data plane is Avro container files + opaque raw files
through S3 plus arbitrary integration persisters; the Spark engine
exposes the corresponding declarative surface: parquet / avro (jar-
gated) / json / csv / orc / binaryFile readers with explicit schemas
(never ``inferSchema`` in production paths) and parquet/avro/jdbc
sinks with the idempotent-vs-unsafe contract from the scheduler.

Delta/Iceberg/Hudi and JDBC drivers are not in this container: their
entry points exist but raise a clear ``FormatUnavailable`` when the
classpath lacks the jars (import-try gating, per the build rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class FormatUnavailable(RuntimeError):
    """Raised when a format needs a jar that is not on the classpath."""


_jar_probe_cache: dict[str, bool] = {}


def _jar_probe(spark: SparkSession, fmt: str) -> bool:
    """True when ``fmt`` resolves to a registered data source.

    Uses Spark's own ``DataSource.lookupDataSource`` (the exact check
    the analyzer performs) WITHOUT issuing a read, so a missing jar
    never logs an analyzer ERROR through ExecutionListenerBus — that
    was pure driver-log noise on every gated-format probe.
    """
    if fmt in _jar_probe_cache:
        return _jar_probe_cache[fmt]
    try:
        jvm = spark._jvm  # noqa: SLF001
        conf = jvm.org.apache.spark.sql.internal.SQLConf.get()
        jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            fmt, conf
        )
        _jar_probe_cache[fmt] = True
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        # Cache only the definitive "no such data source" verdict; a
        # transient gateway/JVM hiccup must not poison the cache into
        # a permanent FormatUnavailable for the rest of the process.
        if "FAILED_TO_FIND_DATA_SOURCE" in msg or "Failed to find" in msg:
            _jar_probe_cache[fmt] = False
        return False


def read_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.parquet(path)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True, **options
) -> DataFrame:
    """Schema is required: inference double-scans and guesses types."""
    return spark.read.schema(schema).options(header=str(header).lower(), **options).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType, **options) -> DataFrame:
    return spark.read.schema(schema).options(**options).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Opaque files as (path, modificationTime, length, content) rows —
    the raw-data zone reader."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    if not _jar_probe(spark, "avro"):
        raise FormatUnavailable(
            "spark-avro jar not on classpath; records zone falls back to parquet"
        )
    return spark.read.format("avro").load(path)


def read_jdbc(spark: SparkSession, url: str, table: str, **options) -> DataFrame:
    try:
        return spark.read.format("jdbc").options(url=url, dbtable=table, **options).load()
    except Exception as e:  # noqa: BLE001
        if "ClassNotFoundException" in str(e) or "No suitable driver" in str(e):
            raise FormatUnavailable(f"no JDBC driver for {url!r} on classpath") from e
        raise


def write_parquet(
    df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_orc(
    df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None
) -> None:
    """ORC sink (built into Spark — no jar gate, unlike avro). ORC
    carries min/max/bloom row-group statistics like parquet, so
    filter pushdown works the same way at scan time."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite", codec: str = "deflate") -> None:
    """Avro sink with the reference's default codec
    (``reference.conf:82``: deflate)."""
    if not _jar_probe(df.sparkSession, "avro"):
        raise FormatUnavailable("spark-avro jar not on classpath")
    df.write.mode(mode).format("avro").option("compression", codec).save(path)


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append", **options) -> None:
    try:
        df.write.mode(mode).format("jdbc").options(url=url, dbtable=table, **options).save()
    except Exception as e:  # noqa: BLE001
        if "ClassNotFoundException" in str(e) or "No suitable driver" in str(e):
            raise FormatUnavailable(f"no JDBC driver for {url!r} on classpath") from e
        raise


def read_xml(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    row_tag: str = "row",
    **options,
) -> DataFrame:
    """XML scan via Spark 4's BUILT-IN xml source (the spark-xml
    package was folded into core in 4.0 — probed PRESENT in this
    build, unlike avro). Schema is required for the same reason as
    csv/json: inference double-scans. ``rowTag`` selects the repeated
    element that becomes a row; nested elements map to structs/arrays
    exactly like json."""
    if not _jar_probe(spark, "xml"):
        raise FormatUnavailable("xml data source not on the classpath")
    return (
        spark.read.schema(schema)
        .options(rowTag=row_tag, **options)
        .format("xml")
        .load(path)
    )


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """XML sink through the same built-in source."""
    if not _jar_probe(df.sparkSession, "xml"):
        raise FormatUnavailable("xml data source not on the classpath")
    (
        df.write.mode(mode)
        .options(rowTag=row_tag, rootTag=root_tag)
        .format("xml")
        .save(path)
    )
