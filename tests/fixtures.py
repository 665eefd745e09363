"""Test integrations mirroring the reference's stub fixtures
(``worker/src/test/scala/com/harrys/hyppo/worker/ProcessedDataStub.scala:27-41``,
``RawDataStub.scala:30-47``): the canonical TestRecord schema
{name: string, valueOne: int|null, valueTwo: long|null} and the
"records only for matching raw content" filter semantics."""

from __future__ import annotations

import gzip

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hyppo_worker_spark.model import DataIngestionJob, DataIngestionTask, PersistingSemantics
from hyppo_worker_spark.registry import ProcessedDataIntegration, RawDataIntegration

TEST_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("valueOne", T.IntegerType(), True),
        T.StructField("valueTwo", T.LongType(), True),
    ]
)


class ProcessedDataStub(ProcessedDataIntegration):
    """Emits exactly one record ("Name Value", 1, 2); creates one task."""

    source_name = "Test Source"
    version = 1

    def __init__(self):
        self.persisted_rows: list = []

    def record_schema(self) -> T.StructType:
        return TEST_RECORD_SCHEMA

    def create_tasks(self, job: DataIngestionJob):
        return [{}]

    def fetch_processed(self, spark: SparkSession, task: DataIngestionTask) -> DataFrame:
        return spark.createDataFrame([("Name Value", 1, 2)], TEST_RECORD_SCHEMA)

    def persist(self, spark: SparkSession, task: DataIngestionTask, records: DataFrame) -> None:
        self.persisted_rows.extend(records.collect())


class RawDataStub(RawDataIntegration):
    """Raw payload is the bytes ``b"hello"``; the processor emits one
    record per raw file whose (gunzipped) content matches, none
    otherwise — the filter+flatMap semantics the reference test pins."""

    source_name = "Raw Source"
    version = 1
    expected_payload = b"hello"

    def __init__(self, payloads: list[bytes] | None = None):
        self.payloads = payloads if payloads is not None else [self.expected_payload]
        self.persisted_rows: list = []

    def record_schema(self) -> T.StructType:
        return TEST_RECORD_SCHEMA

    def create_tasks(self, job: DataIngestionJob):
        return [{}]

    def fetch_raw(self, task: DataIngestionTask) -> list[bytes]:
        return list(self.payloads)

    def process_raw(
        self, spark: SparkSession, task: DataIngestionTask, raw_df: DataFrame
    ) -> DataFrame:
        @F.udf(T.BinaryType())
        def gunzip(b):
            return gzip.decompress(bytes(b))

        matches = raw_df.withColumn("raw", gunzip(F.col("content"))).filter(
            F.col("raw") == F.lit(self.expected_payload)
        )
        return matches.select(
            F.lit("Test Name").alias("name"),
            F.lit(1).cast("int").alias("valueOne"),
            F.lit(2).cast("long").alias("valueTwo"),
        )

    def persist(self, spark: SparkSession, task: DataIngestionTask, records: DataFrame) -> None:
        self.persisted_rows.extend(records.collect())


class SlowSparkStub(ProcessedDataStub):
    """fetch_processed returns a plan whose execution blocks inside a
    Spark task (UDF sleep) — the deliberately-hung integration for the
    Running-state watchdog and graceful-shutdown tests (the analog of
    ``BlockingProcessedDataStub.scala``'s latch)."""

    source_name = "Slow Source"

    def __init__(self, sleep_s: float = 30.0):
        super().__init__()
        self.sleep_s = sleep_s
        self.fetch_attempts = 0

    def fetch_processed(self, spark: SparkSession, task: DataIngestionTask) -> DataFrame:
        self.fetch_attempts += 1
        sleep_s = self.sleep_s

        @F.udf(T.IntegerType())
        def snooze(x):
            import time as _time

            _time.sleep(sleep_s)
            return x

        df = spark.createDataFrame([("Name Value", 1, 2)], TEST_RECORD_SCHEMA)
        if sleep_s > 0:
            df = df.withColumn("valueOne", snooze(F.col("valueOne")))
        return df


class UnsafePersistStub(ProcessedDataStub):
    """PersistingSemantics.Unsafe — at-most-once sink
    (``BlockingProcessedDataStub.scala:16-47`` analog, minus sleeps)."""

    source_name = "Unsafe Source"
    persisting_semantics = PersistingSemantics.UNSAFE

    def __init__(self, fail_persist: bool = False):
        super().__init__()
        self.fail_persist = fail_persist
        self.persist_attempts = 0

    def persist(self, spark: SparkSession, task: DataIngestionTask, records: DataFrame) -> None:
        self.persist_attempts += 1
        if self.fail_persist:
            raise RuntimeError("sink exploded mid-write")
        super().persist(spark, task, records)
