"""End-to-end ingestion-pipeline queries: the full engine loop
(submit → delegate → operations 2→5→6→7 / 2→3→4→6 → typed responses)
run against the synthetic tables, with the persisted output compared
to a plain-SQL oracle over the same source table.

This is the Spark-native analog of the reference's executor
round-trip tests (``ProcessedDataTest.scala`` / ``RawDataTest.scala``)
promoted to an oracle-checked correctness query: if any stage of the
control plane (task fan-out, records zone write/read, checksums,
persist, ack semantics) corrupted or dropped rows, the final
aggregate would not match the direct SQL on the source table.
"""

from __future__ import annotations

import gzip
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hyppo_worker_spark.model import (
    CreateIngestionTasksRequest,
    DataIngestionJob,
    FailureResponse,
    FetchProcessedDataRequest,
    FetchRawDataRequest,
    HandleJobCompletedRequest,
    IngestionSource,
    Operation,
    PersistProcessedDataRequest,
    ProcessRawDataRequest,
)
from hyppo_worker_spark.queries import register
from hyppo_worker_spark.streaming import drain_stream
from hyppo_worker_spark.registry import (
    IntegrationRegistry,
    ProcessedDataIntegration,
    RawDataIntegration,
)
from hyppo_worker_spark.scheduler.scheduler import EngineConfig, HyppoEngine
from hyppo_worker_spark.session import load_tables, local_frame, tracked_persist
from hyppo_worker_spark.storage import DataFileHandler, StorageLayout


def _move_staged_blocks(
    stage_dir: str,
    dst_dir: str,
    now: float,
    n_blocks: int,
    sentinel: bool = False,
    prefix: str = "batch",
) -> None:
    """Move a consolidated staging write's per-block files into a
    stream source dir as time-ordered ``batch<i>.parquet`` files
    (mtimes define the maxFilesPerTrigger drain order; the last block
    is ``batch<n>-sentinel.parquet`` when ``sentinel``).

    ``partitionBy("blk")`` OMITS a ``blk=<i>`` directory entirely when
    that time block has zero rows — a dataset/SF that doesn't cover
    every expected day bucket would otherwise surface as a bare
    ``IndexError`` on the glob (ADVICE r9); fail with the real reason
    instead."""
    import glob
    import os
    import shutil

    missing = [
        i
        for i in range(n_blocks)
        if not glob.glob(
            os.path.join(stage_dir, f"blk={i}", "part-*.parquet")
        )
    ]
    if missing:
        raise ValueError(
            f"staged write at {stage_dir} produced no rows for time "
            f"block(s) {missing} of {list(range(n_blocks))} — the input "
            "does not cover every expected day bucket at this scale; "
            "this streaming row needs >=1 row per block to define its "
            "per-trigger batches"
        )
    for i in range(n_blocks):
        part = glob.glob(
            os.path.join(stage_dir, f"blk={i}", "part-*.parquet")
        )[0]
        name = (
            f"{prefix}{i}-sentinel.parquet"
            if sentinel and i == n_blocks - 1
            else f"{prefix}{i}.parquet"
        )
        dest = os.path.join(dst_dir, name)
        shutil.move(part, dest)
        os.utime(dest, (now - 300 + 100 * i,) * 2)

N_TASKS = 4


class LineitemIntegration(ProcessedDataIntegration):
    """Fetches lineitem slices (task = l_orderkey % N_TASKS bucket) and
    persists them into a per-job output area."""

    source_name = "Lineitem Feed"
    version = 1

    def __init__(self, sf_dir: str, out_dir: str):
        self.sf_dir = sf_dir
        self.out_dir = out_dir

    def record_schema(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField("l_orderkey", T.LongType(), False),
                T.StructField("l_partkey", T.LongType(), False),
                T.StructField("l_returnflag", T.StringType(), False),
                T.StructField("l_quantity", T.DoubleType(), False),
                T.StructField("l_extendedprice", T.DoubleType(), False),
            ]
        )

    def create_tasks(self, job: DataIngestionJob):
        return [{"bucket": i} for i in range(N_TASKS)]

    def fetch_processed(self, spark: SparkSession, task) -> DataFrame:
        li = load_tables(spark, self.sf_dir, ("lineitem",))["lineitem"]
        bucket = task.task_arguments["bucket"]
        return li.filter(F.col("l_orderkey") % N_TASKS == bucket).select(
            "l_orderkey", "l_partkey", "l_returnflag", "l_quantity", "l_extendedprice"
        )

    def persist(self, spark: SparkSession, task, records: DataFrame) -> None:
        # Per-task output directory: concurrent tasks never share a
        # commit staging area (same per-task layout as the reference's
        # records zone).
        records.write.mode("overwrite").parquet(
            f"{self.out_dir}/final/task-{task.task_number}"
        )


class DocumentsRawIntegration(RawDataIntegration):
    """Raw path: each task lands one gzipped CSV-ish payload per
    language, the processor parses them back into typed records
    distributed over the binaryFile rows."""

    source_name = "Docs Raw Feed"
    version = 1

    def __init__(self, sf_dir: str, out_dir: str):
        self.sf_dir = sf_dir
        self.out_dir = out_dir

    def record_schema(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("lang", T.StringType(), False),
                T.StructField("n_chars", T.LongType(), False),
            ]
        )

    def create_tasks(self, job: DataIngestionJob):
        return [{}]

    def fetch_raw(self, task) -> list[bytes]:
        # One payload per language: lines of "doc_id,lang,n_chars".
        import duckdb

        con = duckdb.connect()
        rows = con.execute(
            f"SELECT doc_id, lang, n_chars FROM read_parquet('{self.sf_dir}/documents.parquet') ORDER BY lang, doc_id"
        ).fetchall()
        by_lang: dict[str, list[str]] = {}
        for doc_id, lang, n_chars in rows:
            by_lang.setdefault(lang, []).append(f"{doc_id},{lang},{n_chars}")
        return [("\n".join(lines)).encode() for _, lines in sorted(by_lang.items())]

    def process_raw(self, spark: SparkSession, task, raw_df: DataFrame) -> DataFrame:
        @F.udf(T.ArrayType(T.StringType()))
        def gunzip_lines(b):
            return gzip.decompress(bytes(b)).decode().split("\n")

        lines = raw_df.select(F.explode(gunzip_lines(F.col("content"))).alias("line"))
        parts = F.split(F.col("line"), ",")
        return lines.select(
            parts[0].cast("long").alias("doc_id"),
            parts[1].alias("lang"),
            parts[2].cast("long").alias("n_chars"),
        )

    def persist(self, spark: SparkSession, task, records: DataFrame) -> None:
        records.write.mode("overwrite").parquet(
            f"{self.out_dir}/final/task-{task.task_number}"
        )


def _run_job(
    spark: SparkSession,
    integration,
    request_cls_chain,
    records_fmt: str | None = None,
) -> None:
    """Drive a full job through the engine with response-chained
    submissions; raise on any FailureResponse."""
    registry = IntegrationRegistry()
    registry.register(integration)
    layout = StorageLayout(bucket=tempfile.mkdtemp(prefix="hyppo-pipeline-"))
    # 4 worker slots: tasks execute concurrently (Spark schedules the
    # jobs from multiple driver threads), as a real deployment would.
    engine = HyppoEngine(
        spark,
        registry,
        DataFileHandler(spark, layout, records_fmt=records_fmt),
        EngineConfig(worker_count=4),
    )
    details = integration.details()
    job = DataIngestionJob(source=IngestionSource(name=integration.source_name))
    is_raw = details.is_raw_data_integration

    @engine.responses.on_completed
    def chain(resp):
        op = resp.input.operation
        if op is Operation.CREATE_INGESTION_TASKS:
            for t in resp.tasks:
                if is_raw:
                    engine.submit(FetchRawDataRequest(integration=details, task=t))
                else:
                    engine.submit(FetchProcessedDataRequest(integration=details, task=t))
        elif op is Operation.FETCH_RAW_DATA:
            engine.submit(
                ProcessRawDataRequest(
                    integration=details, task=resp.input.task, files=resp.data
                )
            )
        elif op in (Operation.FETCH_PROCESSED_DATA, Operation.PROCESS_RAW_DATA):
            engine.submit(
                PersistProcessedDataRequest(
                    integration=details, task=resp.input.task, data=resp.data
                )
            )

    engine.submit(CreateIngestionTasksRequest(integration=details, job=job))
    engine.run_until_idle()
    engine.submit(
        HandleJobCompletedRequest(integration=details, job=job, tasks=())
    )
    engine.run_until_idle()
    failures = [r for r in engine.results_log if isinstance(r, FailureResponse)]
    if failures:
        raise RuntimeError(
            f"pipeline failed: {failures[0].exception.exception_class}: "
            f"{failures[0].exception.message}"
        )


@register(
    "p01_ingestion_pipeline",
    oracle="""
    SELECT l_returnflag AS l_returnflag,
           count(*) AS n_rows,
           count(DISTINCT l_orderkey) AS n_orders,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("pipeline", "control-plane", "flagship"),
)
def p01_ingestion_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full engine run over lineitem (4-task fan-out, records zone,
    persist) → aggregate of the persisted output."""
    out_dir = tempfile.mkdtemp(prefix="hyppo-out-")
    _run_job(spark, LineitemIntegration(sf_dir, out_dir), None)
    final = spark.read.parquet(f"{out_dir}/final/task-*")
    return (
        final.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "p02_raw_pipeline",
    oracle="""
    SELECT lang AS lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("pipeline", "control-plane", "raw"),
)
def p02_raw_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-path engine run over documents (gzip landing + distributed
    parse) → aggregate of the persisted output."""
    out_dir = tempfile.mkdtemp(prefix="hyppo-out-")
    # records_fmt="avro-py": the raw pipeline's records zone persists
    # REAL Avro-with-deflate through the pure-Python container — the
    # reference's wire format exercised end-to-end by a driver row
    # every round (volume here is documents-table sized, so the row
    # codec cost is negligible; p01's bulk path stays columnar).
    _run_job(
        spark, DocumentsRawIntegration(sf_dir, out_dir), None,
        records_fmt="avro-py",
    )
    final = spark.read.parquet(f"{out_dir}/final/task-*")
    return (
        final.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# p03 — the custom Python DataSource connector
# (sources/integration_source.py): the reference's per-task integration
# fetch surfaced as spark.read.format("hyppo_integration"). The task
# list is the partition plan — each task's fetch runs on an executor —
# and the oracle regenerates the same deterministic rows in SQL, so a
# mismatch catches a connector that drops/duplicates/corrupts rows or
# partitions. sf_dir is unused: the connector is its own source.
# --------------------------------------------------------------------------
_P03_TASKS = [
    {"task_id": t, "day": f"2024-01-{(t % 3) + 1:02d}", "n_rows": 40 + 10 * t}
    for t in range(1, 7)
]

_P03_TASKS_SQL = ", ".join(
    f"({t['task_id']}, '{t['day']}', {t['n_rows']})" for t in _P03_TASKS
)


@register(
    "p03_integration_connector",
    oracle=f"""
    WITH tasks(task_id, day, n_rows) AS (VALUES {_P03_TASKS_SQL}),
    expanded AS (
        SELECT task_id, day, unnest(range(0, n_rows)) AS seq
        FROM tasks
    ),
    rows AS (
        SELECT task_id, day, seq,
               'evt-' || task_id || '-' || seq AS name,
               (seq * 7 + task_id) % 100 AS score
        FROM expanded
    )
    SELECT day,
           count(*) AS n_events,
           CAST(sum(score) AS BIGINT) AS sum_score,
           count(DISTINCT name) AS n_names
    FROM rows GROUP BY day ORDER BY day
    """,
    tags=("pipeline", "connector", "datasource", "pushdown"),
)
def p03_integration_connector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six ingestion tasks fetched through the Python DataSource (one
    input partition each), aggregated per day."""
    import json

    from hyppo_worker_spark.sources.integration_source import (
        FORMAT_NAME,
        register_integration_source,
    )

    register_integration_source(spark)
    df = (
        spark.read.format(FORMAT_NAME)
        .schema("task_id int, day string, seq int, name string, score int")
        .option(
            "fetcher",
            "hyppo_worker_spark.sources.integration_source:"
            "synthetic_events_fetcher",
        )
        .option("tasks", json.dumps(_P03_TASKS))
        .load()
    )
    return (
        df.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("score").alias("sum_score"),
            F.countDistinct("name").alias("n_names"),
        )
        .orderBy("day")
    )


@register(
    "p04_integration_sink_roundtrip",
    oracle=f"""
    WITH tasks(task_id, day, n_rows) AS (VALUES {_P03_TASKS_SQL}),
    expanded AS (
        SELECT task_id, day, unnest(range(0, n_rows)) AS seq
        FROM tasks
    ),
    rows AS (
        SELECT task_id, day, seq,
               'evt-' || task_id || '-' || seq AS name,
               (seq * 7 + task_id) % 100 AS score
        FROM expanded
    )
    SELECT CAST(task_id AS BIGINT) AS task_id,
           count(*) AS n_rows,
           CAST(sum(score) AS BIGINT) AS sum_score
    FROM rows GROUP BY task_id ORDER BY task_id
    """,
    tags=("pipeline", "connector", "datasource", "sink", "manifest"),
)
def p04_integration_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The connector's WRITE path round-tripped: fetch the six tasks
    through the Python DataSource reader, persist them through the
    manifest-committed sink (one staged file per task, atomic manifest
    flip — the reference's PersistProcessedData contract), then read
    back ONLY manifest-listed files with checksum verification and
    aggregate per task. Values must equal the never-persisted oracle
    regeneration, proving the sink neither loses, duplicates, nor
    corrupts rows."""
    import json
    import shutil

    from hyppo_worker_spark.sources.integration_source import (
        FORMAT_NAME,
        read_committed,
        register_integration_source,
    )

    register_integration_source(spark)
    src = (
        spark.read.format(FORMAT_NAME)
        .schema("task_id int, day string, seq int, name string, score int")
        .option(
            "fetcher",
            "hyppo_worker_spark.sources.integration_source:"
            "synthetic_events_fetcher",
        )
        .option("tasks", json.dumps(_P03_TASKS))
        .load()
    )
    out = "/tmp/hyppo-p04-sink"
    shutil.rmtree(out, ignore_errors=True)
    src.write.format(FORMAT_NAME).option("path", out).mode("overwrite").save()
    back = read_committed(
        spark, out, "task_id long, day string, seq long, name string, score long"
    )
    return (
        back.groupBy("task_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("score").alias("sum_score"),
        )
        .orderBy("task_id")
    )


# --------------------------------------------------------------------------
# p05 — streaming sketch maintenance, driver-checkable (VERDICT r4 item
# 5): the streaming layer's correctness evidence was pytest-only; this
# row EXECUTES the foreachBatch maintenance path for real — a bounded
# multi-file stream drained with availableNow through SketchRollupSink
# (micro-batch HLL build + full-outer sketch-union merge + table
# rewrite per batch) — then verifies the maintained table against
# exact twins computed relationally, with the q44/q27 contract turning
# sketch accuracy into in-plan booleans the DuckDB oracle states as
# literal TRUE. A dropped/duplicated batch breaks n_events equality; a
# broken union breaks the estimate bound; a single-batch shortcut
# (merge path never exercised) breaks the multi_batch literal.
# --------------------------------------------------------------------------
@register(
    "p05_streaming_sketch_rollup",
    oracle="""
    WITH daily AS (
        SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
               count(DISTINCT user_id) AS exact_users,
               count(*) AS n_events
        FROM events GROUP BY 1
    ),
    total AS (
        SELECT 'TOTAL' AS day, count(DISTINCT user_id) AS exact_users,
               count(*) AS n_events
        FROM events
    )
    SELECT day, exact_users, CAST(n_events AS BIGINT) AS n_events,
           TRUE AS estimate_within_5pct, TRUE AS multi_batch
    FROM (SELECT * FROM daily UNION ALL SELECT * FROM total)
    ORDER BY day
    """,
    tags=("pipeline", "streaming", "sketch", "hll", "maintenance"),
)
def p05_streaming_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the events table as a 3-file bounded stream
    (maxFilesPerTrigger=1 → 3 real micro-batches) through the HLL
    sketch-maintenance sink, then check the maintained per-day table:
    sketch estimates within ±5% of exact distincts, event counts
    exactly equal, and >= 2 batches actually merged."""
    import os
    import tempfile

    from hyppo_worker_spark.streaming.sketch_maintenance import (
        SketchRollupSink,
        maintain_sketches,
    )

    events = load_tables(spark, sf_dir, ("events",))["events"]
    work = tempfile.mkdtemp(prefix="hyppo-p05-")
    src_dir = os.path.join(work, "stream-src")
    (
        events.select(
            F.col("ts").cast("timestamp").alias("ts"), "user_id"
        )
        .repartition(3)
        .write.parquet(src_dir)
    )
    stream = (
        spark.readStream.schema("ts timestamp, user_id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    sink = SketchRollupSink(spark, os.path.join(work, "store"))
    q = maintain_sketches(stream, sink, os.path.join(work, "ckpt"))
    drain_stream(q, 300)
    n_batches = len(os.listdir(sink.marker_dir))

    base = events.select(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"), "user_id"
    )
    daily_exact = base.groupBy("day").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_exact"),
    )
    total_exact = base.agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_exact"),
    ).select(F.lit("TOTAL").alias("day"), "exact_users", "n_exact")
    exact = daily_exact.unionByName(total_exact)

    est = sink.estimates()  # (day, est_users, n_events) — no event scan
    return (
        est.join(exact, "day")
        .select(
            "day",
            "exact_users",
            # the SINK's count, equality-checked against the oracle's
            # count(*) via the value hash (n_exact only gates in-plan)
            F.col("n_events").cast("long").alias("n_events"),
            (
                (F.col("n_events") == F.col("n_exact"))
                & (
                    F.abs(F.col("est_users") - F.col("exact_users")) * 20
                    <= F.col("exact_users")
                )
            ).alias("estimate_within_5pct"),
            F.lit(n_batches >= 2).alias("multi_batch"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# p06 — manifest snapshot versioning + time travel: the corpus-
# reproducibility contract a training pipeline needs ("train run X
# used corpus AS OF version 1"). Every manifest commit publishes an
# immutable _MANIFEST-v{n}.json snapshot listing the FULL visible
# file set (sources/integration_source.py:_publish_manifest — the
# manifest-level form of Delta/Iceberg snapshot isolation); a
# time-travel read opens exactly one snapshot, so append-mode history
# stays readable forever. This query commits the six connector tasks
# in TWO versions (tasks 1-3, then 4-6 appended) and aggregates each
# version through read_committed(version=n) — checksum-verified,
# manifest-gated reads at both points in time, equal to the oracle's
# never-persisted regeneration of each snapshot.
# --------------------------------------------------------------------------
_P06_TASKS_V1_SQL = ", ".join(
    f"({t['task_id']}, '{t['day']}', {t['n_rows']})" for t in _P03_TASKS[:3]
)


@register(
    "p06_manifest_time_travel",
    oracle=f"""
    WITH t1(task_id, day, n_rows) AS (VALUES {_P06_TASKS_V1_SQL}),
    t2(task_id, day, n_rows) AS (VALUES {_P03_TASKS_SQL}),
    r1 AS (
        SELECT task_id, (seq * 7 + task_id) % 100 AS score
        FROM t1, LATERAL unnest(range(0, n_rows)) AS u(seq)
    ),
    r2 AS (
        SELECT task_id, (seq * 7 + task_id) % 100 AS score
        FROM t2, LATERAL unnest(range(0, n_rows)) AS u(seq)
    )
    SELECT 1 AS version, count(*) AS n_rows,
           CAST(sum(score) AS BIGINT) AS sum_score
    FROM r1
    UNION ALL
    SELECT 2 AS version, count(*) AS n_rows,
           CAST(sum(score) AS BIGINT) AS sum_score
    FROM r2
    ORDER BY version
    """,
    tags=("pipeline", "connector", "manifest", "versioning", "time-travel"),
)
def p06_manifest_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two manifest commits (tasks 1-3, then 4-6 appended) read back
    AS OF each version: per-version row count + score sum through the
    checksum-verified time-travel read."""
    import json
    import shutil

    from hyppo_worker_spark.sources.integration_source import (
        FORMAT_NAME,
        read_committed,
        register_integration_source,
    )

    register_integration_source(spark)

    def fetched(tasks):
        return (
            spark.read.format(FORMAT_NAME)
            .schema("task_id int, day string, seq int, name string, score int")
            .option(
                "fetcher",
                "hyppo_worker_spark.sources.integration_source:"
                "synthetic_events_fetcher",
            )
            .option("tasks", json.dumps(tasks))
            .load()
        )

    out = "/tmp/hyppo-p06-sink"
    shutil.rmtree(out, ignore_errors=True)
    for batch in (_P03_TASKS[:3], _P03_TASKS[3:]):
        fetched(batch).write.format(FORMAT_NAME).option("path", out).mode(
            "append"
        ).save()

    schema = "task_id long, day string, seq long, name string, score long"
    parts = []
    for v in (1, 2):
        parts.append(
            read_committed(spark, out, schema, version=v).agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("score").alias("sum_score"),
            ).select(F.lit(v).alias("version"), "n_rows", "sum_score")
        )
    return parts[0].unionByName(parts[1]).orderBy("version")


# --------------------------------------------------------------------------
# p07 — streaming CDC -> SCD2 maintenance, oracle-checked end-to-end:
# the second streaming row that EXECUTES for real (after p05's sketch
# rollup). Three CDC batches derived deterministically from the
# customer table (full load; balance bump for k%3 PLUS no-op
# resubmissions for k%7 that must spawn nothing; segment move for
# k%5 carrying the then-current balance) drain through
# Scd2DimensionSink — per-batch last-writer compaction, open-slice
# scd2_apply, staged-swap commit — and the resulting type-2 HISTORY
# is compared row-for-row against the oracle's lead()-window
# reconstruction of the same change log. A wrongly spawned no-op
# version, a missed close, a dropped batch, or a marker bug each
# change the row set. Monetary values ride integer cents so the
# cross-engine hash is exact.
# --------------------------------------------------------------------------
_P07_T1, _P07_T2, _P07_T3 = (
    "2024-01-01 00:00:00",
    "2024-02-01 00:00:00",
    "2024-03-01 00:00:00",
)


@register(
    "p07_streaming_scd2_cdc",
    oracle=f"""
    WITH base AS (
        SELECT c_custkey AS k, c_mktsegment AS seg,
               CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal
        FROM customer
    ),
    log AS (
        SELECT k, seg, bal, '{_P07_T1}' AS ts FROM base
        UNION ALL
        SELECT k, seg, bal + 1000, '{_P07_T2}' FROM base WHERE k % 3 = 0
        UNION ALL
        SELECT k, 'MOVED',
               bal + CASE WHEN k % 3 = 0 THEN 1000 ELSE 0 END, '{_P07_T3}'
        FROM base WHERE k % 5 = 0
    ),
    hist AS (
        SELECT k, seg, bal, ts AS valid_from,
               coalesce(lead(ts) OVER (PARTITION BY k ORDER BY ts),
                        '9999-12-31 00:00:00') AS valid_to
        FROM log
    )
    SELECT k, seg, CAST(bal AS BIGINT) AS bal_cents, valid_from, valid_to
    FROM hist ORDER BY k, valid_from
    """,
    tags=("pipeline", "streaming", "cdc", "scd2", "maintenance"),
)
def p07_streaming_scd2_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain three deterministic CDC batches through the streaming
    SCD2 sink and return the maintained type-2 history (key, seg,
    bal_cents, valid_from, valid_to)."""
    import glob
    import os
    import shutil
    import time

    from hyppo_worker_spark.streaming.scd2_maintenance import (
        Scd2DimensionSink,
        maintain_scd2,
    )

    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    base = cust.select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("bal"),
    )
    b1 = base.withColumn("update_ts", F.lit(_P07_T1))
    changed2 = (
        base.filter(F.col("k") % 3 == 0)
        .withColumn("bal", F.col("bal") + 1000)
    )
    noop2 = base.filter((F.col("k") % 7 == 0) & (F.col("k") % 3 != 0))
    b2 = changed2.unionByName(noop2).withColumn("update_ts", F.lit(_P07_T2))
    b3 = (
        base.filter(F.col("k") % 5 == 0)
        .select(
            "k",
            F.lit("MOVED").alias("seg"),
            (
                F.col("bal")
                + F.when(F.col("k") % 3 == 0, 1000).otherwise(0)
            ).alias("bal"),
        )
        .withColumn("update_ts", F.lit(_P07_T3))
    )

    work = tempfile.mkdtemp(prefix="hyppo-p07-")
    src_dir = os.path.join(work, "cdc")
    os.makedirs(src_dir)
    now = time.time()
    for i, b in enumerate((b1, b2, b3)):
        staged = os.path.join(work, f"stage-{i}")
        b.coalesce(1).write.parquet(staged)
        part = glob.glob(os.path.join(staged, "part-*.parquet"))[0]
        dest = os.path.join(src_dir, f"batch{i}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (now - 300 + 100 * i,) * 2)

    stream = (
        spark.readStream.schema("k long, seg string, bal long, update_ts string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    sink = Scd2DimensionSink(
        spark, os.path.join(work, "store"), "k", ["seg", "bal"]
    )
    q = maintain_scd2(stream, sink, os.path.join(work, "ckpt"))
    drain_stream(q, 300)

    return (
        sink.history()
        .select(
            "k",
            "seg",
            F.col("bal").cast("long").alias("bal_cents"),
            "valid_from",
            "valid_to",
        )
        .orderBy("k", "valid_from")
    )


# --------------------------------------------------------------------------
# p08 — incremental connected-components maintenance, oracle-checked
# end-to-end: a deterministic sparse edge set over the documents id
# space (stride edges gated by md5) drains in 3 micro-batches through
# IncrementalCCSink — per batch only the TOUCHED components recompute
# (state-as-star-edges subgraph + O(log n) batch CC, staged-swap
# commits) — and the final maintained state's component-size
# HISTOGRAM must equal the recursive-CTE closure over the full edge
# set. Batches split by an md5 gate on the source node, so later
# batches bridge components built by earlier ones (the merge path is
# exercised for real, not just growth). A wrong merge, a stale
# untouched row, or a dropped batch all change the histogram.
# --------------------------------------------------------------------------
@register(
    "p08_streaming_incremental_cc",
    oracle="""
    WITH RECURSIVE e0 AS (
        SELECT doc_id AS a, doc_id + 1 + doc_id % 5 AS b
        FROM documents
        WHERE {gate} < 60
    ),
    edges AS (
        SELECT a AS u, b AS v FROM e0 UNION SELECT b, a FROM e0
    ),
    paths AS (
        SELECT u, v FROM edges
        UNION
        SELECT p.u, e.v FROM paths p JOIN edges e ON p.v = e.u
    ),
    comp AS (
        SELECT u AS node, least(u, min(v)) AS comp
        FROM paths GROUP BY u
    ),
    sizes AS (SELECT comp, count(*) AS sz FROM comp GROUP BY comp)
    SELECT CAST(sz AS BIGINT) AS comp_size,
           CAST(count(*) AS BIGINT) AS n_comps
    FROM sizes GROUP BY sz ORDER BY comp_size
    """.replace(
        "{gate}",
        # late import avoids a cycle at module load
        __import__(
            "hyppo_worker_spark.functions.text", fromlist=["md5_bucket_sql"]
        ).md5_bucket_sql("doc_id", 100),
    ),
    tags=("pipeline", "streaming", "graph", "connected-components",
          "incremental"),
)
def p08_streaming_incremental_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain a 3-batch edge stream through the incremental CC sink and
    return the maintained state's component-size histogram."""
    import glob
    import os
    import shutil
    import time

    from hyppo_worker_spark.functions import text as TX2
    from hyppo_worker_spark.streaming.incremental_cc import (
        IncrementalCCSink,
        maintain_cc,
    )

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    edges = docs.filter(TX2.md5_bucket(F.col("doc_id"), 100) < 60).select(
        F.col("doc_id").alias("a_id"),
        (F.col("doc_id") + 1 + F.col("doc_id") % 5).alias("b_id"),
    )
    work = tempfile.mkdtemp(prefix="hyppo-p08-")
    src_dir = os.path.join(work, "edges")
    os.makedirs(src_dir)
    now = time.time()
    for i in range(3):
        batch = edges.filter(TX2.md5_bucket(F.col("a_id"), 3) == i)
        staged = os.path.join(work, f"stage-{i}")
        batch.coalesce(1).write.parquet(staged)
        part = glob.glob(os.path.join(staged, "part-*.parquet"))[0]
        dest = os.path.join(src_dir, f"batch{i}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (now - 300 + 100 * i,) * 2)

    stream = (
        spark.readStream.schema("a_id long, b_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    sink = IncrementalCCSink(spark, os.path.join(work, "store"))
    q = maintain_cc(stream, sink, os.path.join(work, "ckpt"))
    drain_stream(q, 300)

    sizes = sink.state().groupBy("comp").agg(
        F.count(F.lit(1)).alias("sz")
    )
    return (
        sizes.groupBy(F.col("sz").cast("long").alias("comp_size"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_comps"))
        .orderBy("comp_size")
    )


# --------------------------------------------------------------------------
# p09 — the scheduler's priority/ack ledger under the driver's oracle:
# the FIRST driver row for the §2.B control plane (reference:
# ``WorkQueuePrioritizer.scala:14-75`` ordering chain,
# ``QueueNaming.scala`` sanitize + integration naming,
# ``TaskFSM.scala:102-115`` ack-after-completion). Work items derived
# from `orders` run through the REAL broker (WorkQueueTable enqueue /
# basic_get / ack — FIFO within a queue, unacked accounting) and the
# REAL WorkQueuePrioritizer recursion, with two things pinned for
# determinism: the clock (TTLs can't fire, idle_since constant) and
# per-queue service rates (distinct primes larger than any queue's
# backlog, standing in for the path-dependent rate EMA, which keeps
# its own pytest property coverage).
#
# WHY an oracle can reproduce this: with ack-after-completion the
# j-th service of queue q sees ready = n_q - j + 1, so q's
# ExpectedCompletion key (ready/rate) is STRICTLY decreasing in j —
# the prioritizer's greedy max-ETA drain is therefore exactly a
# global descending sort of all (queue, j) pairs, and prime rates
# larger than any backlog make cross-queue key ties impossible
# (ready_a * p_b = ready_b * p_a would need p_a | ready_a). DuckDB
# reproduces the full ledger with two window functions; any drift in
# FIFO order, ready accounting, naming, or the ordering chain breaks
# the value hash.
# --------------------------------------------------------------------------
_P09_N = 200
_P09_PRIMES = (10007, 10009, 10037, 10039, 10061, 10067, 10069, 10079)


@register(
    "p09_scheduler_priority_ledger",
    oracle=f"""
    WITH items AS (
        SELECT o_orderkey, o_orderpriority FROM orders
        ORDER BY o_orderkey LIMIT {_P09_N}
    ),
    named AS (
        SELECT o_orderkey,
               -- mirrors source_name.replace('-',' ') -> sanitize_name
               -- (' ' -> '_'): net effect '-' and ' ' both become '_'
               -- ('4-NOT SPECIFIED' -> '4_NOT_SPECIFIED')
               'hyppo.integration.'
                   || replace(replace(o_orderpriority, '-', '_'), ' ', '_')
                   || '-v1' AS queue_name
        FROM items
    ),
    sized AS (
        SELECT queue_name, count(*) AS n,
               (list_value{_P09_PRIMES})[
                   CAST(row_number() OVER (ORDER BY queue_name) AS INT)
               ] AS rate
        FROM named GROUP BY queue_name
    ),
    served AS (
        SELECT nm.o_orderkey, nm.queue_name, s.n, s.rate,
               row_number() OVER (
                   PARTITION BY nm.queue_name ORDER BY nm.o_orderkey
               ) AS j
        FROM named nm JOIN sized s USING (queue_name)
    )
    SELECT row_number() OVER (
               ORDER BY (n - j + 1) * 1.0 / rate DESC, queue_name
           ) AS seq,
           queue_name,
           o_orderkey AS order_key,
           CAST(n - j + 1 AS BIGINT) AS ready_at_decision,
           CAST((n - j + 1) * 1000000 // rate AS BIGINT) AS eta_us
    FROM served
    ORDER BY seq
    """,
    tags=("pipeline", "control-plane", "scheduler", "priority"),
)
def p09_scheduler_priority_ledger(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Completion ledger of N order-derived work items drained through
    the real broker + priority chain (pinned clock and rates)."""
    from datetime import datetime, timezone

    from hyppo_worker_spark.model import (
        IntegrationDetails,
        ValidateIntegrationRequest,
    )
    from hyppo_worker_spark.scheduler.priority import (
        AbsoluteSizeOrdering,
        ExpectedCompletionOrdering,
        IdleSinceMinuteOrdering,
        QueueDetails,
        WorkQueuePrioritizer,
    )
    from hyppo_worker_spark.scheduler.queues import WorkQueueTable

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    items = (
        orders.select("o_orderkey", "o_orderpriority")
        .orderBy("o_orderkey")
        .limit(_P09_N)
        .collect()  # bounded control-plane scale: _P09_N rows
    )

    qt = WorkQueueTable(clock=lambda: 0.0)  # pinned: no TTL can fire
    for r in items:
        # source name with a space exercises the real sanitize_name
        # ('1 URGENT' -> queue '...integration.1_URGENT-v1')
        details = IntegrationDetails(
            source_name=r.o_orderpriority.replace("-", " "),
            version_number=1,
            is_raw_data_integration=False,
        )
        qt.enqueue(
            ValidateIntegrationRequest(
                integration=details,
                execution_id=f"order-{r.o_orderkey}",
            )
        )

    qnames = sorted(
        n for n in (d.queue_name for d in qt.all_details())
        if n != qt.naming.general
    )
    rates = {n: _P09_PRIMES[i] for i, n in enumerate(qnames)}
    prioritizer = WorkQueuePrioritizer(
        [
            ExpectedCompletionOrdering(),
            IdleSinceMinuteOrdering(),
            AbsoluteSizeOrdering(),
        ]
    )
    epoch = datetime(2024, 1, 1, tzinfo=timezone.utc)  # pinned clock
    ledger = []
    while True:
        stats = [
            QueueDetails(
                queue_name=d.queue_name,
                size=d.size,
                rate=rates[d.queue_name],
                ready=d.ready,
                unacknowledged=d.unacknowledged,
                idle_since=epoch,
            )
            for d in qt.all_details()
            if d.queue_name != qt.naming.general and d.ready > 0
        ]
        if not stats:
            break
        head = next(iter(prioritizer.prioritize(stats)))
        delivery = qt.basic_get(head.queue_name)
        qt.ack(delivery)  # ack-after-completion: ready drops by one
        ledger.append(
            (
                len(ledger) + 1,
                head.queue_name,
                int(delivery.item.input.execution_id.removeprefix("order-")),
                head.ready,
                head.ready * 1_000_000 // rates[head.queue_name],
            )
        )
    return local_frame(spark, 
        ledger,
        "seq long, queue_name string, order_key long, "
        "ready_at_decision long, eta_us long",
    )


# --------------------------------------------------------------------------
# p10 — TTL / dead-letter / redelivery semantics under the driver's
# oracle: the second §2.B control-plane row (p09 covers priorities;
# this covers the lifecycle FSM — reference: TTL expiry to the
# expired collection (``QueueNaming.scala`` expired queue,
# ``reference.conf`` work_timeout), ``basicReject(requeue=true)``
# redelivery with delivery counts/headers
# (``TaskFSM.scala:135-140``, ``QueueItemHeaders.scala:11-26``)).
# Work items from `customer` enqueue into per-market-segment queues
# with DATA-DERIVED TTLs under a pinned manual clock; the clock then
# advances once and the REAL broker decides every item's fate:
#
# - expired sweep: items whose ttl <= elapsed dead-letter to the
#   expired collection (the broker's `>=` boundary is pinned by the
#   oracle's `<=` — an off-by-one boundary flips ~1/40 of rows);
# - survivors drain FIFO; every third customer is rejected-with-
#   requeue once (appendleft → redelivered immediately, count 2).
#
# Every output column is a pure function of c_custkey, so DuckDB
# reproduces the ledger with no simulation — what is under test is
# that the broker's sweep boundary, requeue-to-front, delivery
# counting, and redelivered flag agree with the spec exactly.
# --------------------------------------------------------------------------
_P10_N = 150


@register(
    "p10_ttl_redelivery_ledger",
    oracle=f"""
    WITH items AS (
        SELECT c_custkey, c_mktsegment FROM customer
        ORDER BY c_custkey LIMIT {_P10_N}
    )
    SELECT c_custkey AS cust_key,
           'hyppo.integration.' || c_mktsegment || '-v1' AS queue_name,
           CASE WHEN c_custkey % 40 <= 20 THEN 'expired'
                ELSE 'delivered' END AS status,
           CAST(CASE WHEN c_custkey % 40 <= 20 THEN 0
                     WHEN c_custkey % 3 = 0 THEN 2
                     ELSE 1 END AS BIGINT) AS delivery_count,
           (c_custkey % 40 > 20 AND c_custkey % 3 = 0) AS redelivered
    FROM items
    ORDER BY cust_key
    """,
    tags=("pipeline", "control-plane", "scheduler", "ttl", "redelivery"),
)
def p10_ttl_redelivery_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifecycle ledger of N customer-derived work items: data-derived
    TTLs swept under a pinned clock, FIFO drain with one
    reject-requeue per third item, through the real broker."""
    from hyppo_worker_spark.model import (
        IntegrationDetails,
        ValidateIntegrationRequest,
    )
    from hyppo_worker_spark.scheduler.queues import WorkQueueTable

    customer = load_tables(spark, sf_dir, ("customer",))["customer"]
    items = (
        customer.select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
        .limit(_P10_N)
        .collect()
    )

    clock = [0.0]
    qt = WorkQueueTable(clock=lambda: clock[0])
    for r in items:
        details = IntegrationDetails(
            source_name=r.c_mktsegment,
            version_number=1,
            is_raw_data_integration=False,
        )
        qt.enqueue(
            ValidateIntegrationRequest(
                integration=details,
                execution_id=f"cust-{r.c_custkey}",
            ),
            ttl_s=float(r.c_custkey % 40),
        )

    clock[0] = 20.0  # the single clock advance
    ledger = []

    def _key(delivery_or_item) -> int:
        return int(
            delivery_or_item.input.execution_id.removeprefix("cust-")
        )

    for qname, item in qt.sweep_expired():
        ledger.append((_key(item), qname, "expired", 0, False))

    for qname in sorted(
        n for n in (d.queue_name for d in qt.all_details())
        if n != qt.naming.general
    ):
        while True:
            d = qt.basic_get(qname)
            if d is None:
                break
            if _key(d.item) % 3 == 0 and not d.redelivered:
                assert qt.reject_requeue(d) == "requeued"
                continue  # comes straight back from the queue front
            qt.ack(d)
            ledger.append(
                (
                    _key(d.item),
                    qname,
                    "delivered",
                    d.item.delivery_count,
                    d.redelivered,
                )
            )
    return local_frame(spark, 
        ledger,
        "cust_key long, queue_name string, status string, "
        "delivery_count long, redelivered boolean",
    ).orderBy("cust_key")


# --------------------------------------------------------------------------
# p11 — backoff + throttle curves under the driver's oracle: the
# third §2.B row, covering the two resource-contention mechanisms
# p09/p10 do not touch (reference: the Gompertz re-attempt curve
# ``Sigmoid.scala:21-49`` with the reference.conf:84-88 parameter
# shape, and the token-bucket ThrottledWorkResource
# ``WorkResource.scala:27-43``). Per nation row:
#
# - the REAL `gompertz_backoff_factor` evaluated at data-derived
#   seconds (scale 0.2, delay 5.0 — the configured-minimum-delay /
#   growth-factor semantics), rounded to 9 decimals on both engines
#   (values are pure functions of small ints, identical at every SF
#   — any libm last-ulp divergence would show as a stable, not
#   flaky, mismatch);
# - the k-th acquisition time of a 250 ms token-bucket resource
#   drained sequentially through the REAL ResourcePool under a
#   pinned manual clock (acquire → release schedules the next token
#   at now + rate → clock jumps to readiness): closed form
#   (k-1) * 250 ms, which pins the bucket's release-schedules-refill
#   contract and the all-or-nothing acquire path.
# --------------------------------------------------------------------------
_P11_SCALE = 0.2
_P11_DELAY = 5.0
_P11_RATE_MS = 250


@register(
    "p11_backoff_throttle_curves",
    oracle=f"""
    SELECT n_nationkey AS nationkey,
           CAST(n_nationkey * 4 AS BIGINT) AS backoff_s,
           round(exp(-({_P11_DELAY} * exp(-{_P11_SCALE} * (n_nationkey * 4)))), 9)
               AS reattempt_p,
           CAST(n_nationkey * {_P11_RATE_MS} AS BIGINT) AS acquire_ms
    FROM nation
    ORDER BY nationkey
    """,
    tags=("pipeline", "control-plane", "backoff", "throttle", "gompertz"),
)
def p11_backoff_throttle_curves(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Gompertz re-attempt probabilities at data-derived delays plus
    the token-bucket acquisition schedule, both produced by the real
    scheduler components under a pinned clock."""
    from hyppo_worker_spark.model import ThrottledWorkResource
    from hyppo_worker_spark.scheduler.resources import ResourcePool
    from hyppo_worker_spark.scheduler.sigmoid import gompertz_backoff_factor

    nation = load_tables(spark, sf_dir, ("nation",))["nation"]
    keys = sorted(
        r.n_nationkey for r in nation.select("n_nationkey").collect()
    )

    clock = [0.0]
    pool = ResourcePool(clock=lambda: clock[0])
    bucket = ThrottledWorkResource(
        name="api", throttle_rate_ms=_P11_RATE_MS
    )
    rows = []
    for k in keys:
        leases = pool.acquire_all([bucket])  # k-th token
        acquire_ms = int(round(clock[0] * 1000))
        pool.release_all(leases)  # schedules the next token
        clock[0] = pool._throttle_next["api"]  # jump to readiness
        rows.append(
            (
                int(k),
                int(k) * 4,
                round(
                    gompertz_backoff_factor(
                        int(k) * 4, _P11_SCALE, _P11_DELAY
                    ),
                    9,
                ),
                acquire_ms,
            )
        )
    return local_frame(spark, 
        rows,
        "nationkey long, backoff_s long, reattempt_p double, "
        "acquire_ms long",
    ).orderBy("nationkey")


# --------------------------------------------------------------------------
# p12 — source/sink format matrix under one driver row: a documents
# slice round-trips through every batch file format the engine
# exposes (parquet, orc, csv, json, xml via the Spark 4 built-in,
# and the pure-Python Avro container with deflate), and each leg
# reports identical value-sensitive statistics — row count, key sum,
# and 52-bit md5 digest sums over the text column AND a synthesized
# HOSTILE column carrying a comma, double quote, XML specials and an
# embedded newline (built by the same expression in both engines),
# so CSV quoting+multiLine, JSON escaping, and XML entity encoding
# actually have to defend. The oracle computes the same stats
# straight off the table once per format label — any encoding,
# quoting, escaping, type, or null defect in any leg breaks exactly
# that leg's row. (sources/formats.py schema-required readers; the
# avro leg exercises sources/avro_container.py end-to-end.)
# --------------------------------------------------------------------------
_P12_FORMATS = ("avro", "csv", "json", "orc", "parquet", "xml")


@register(
    "p12_format_roundtrips",
    oracle="""
    WITH src AS (
        SELECT doc_id, lang, text,
               substr(text, 1, 20) || ',"x&<y>' || chr(10) || '''z'''
                   AS hostile
        FROM documents
    )
    SELECT fmt,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(doc_id) AS BIGINT) AS key_sum,
           CAST(sum(('0x' || substr(md5(text), 1, 13))::BIGINT)
               AS BIGINT) AS text_digest_sum,
           CAST(sum(('0x' || substr(md5(hostile), 1, 13))::BIGINT)
               AS BIGINT) AS hostile_digest_sum
    FROM src, (
        SELECT unnest(['avro','csv','json','orc','parquet','xml']) AS fmt
    ) f
    GROUP BY fmt
    ORDER BY fmt
    """,
    tags=("pipeline", "sources", "sinks", "formats", "roundtrip"),
)
def p12_format_roundtrips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write+read a documents slice through all six batch formats and
    report per-leg value-sensitive statistics (including a
    quote/comma/newline/XML-special hostile column)."""
    import os
    import tempfile

    from hyppo_worker_spark.sources import avro_container as AC
    from hyppo_worker_spark.sources import formats as FMT

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    hostile = F.concat(
        F.substring("text", 1, 20), F.lit(',"x&<y>\n\'z\'')
    )
    src = docs.select("doc_id", "lang", "text", hostile.alias("hostile"))
    schema = src.schema
    base = tempfile.mkdtemp(prefix="hyppo-p12-")
    legs = []
    for fmt in _P12_FORMATS:
        path = os.path.join(base, fmt)
        if fmt == "avro":
            AC.write_avro(src, path, codec="deflate")
            back = AC.read_avro(spark, path)
        elif fmt == "csv":
            src.write.option("header", "true").csv(path)
            back = FMT.read_csv(spark, path, schema, multiLine="true")
        elif fmt == "json":
            src.write.json(path)
            back = FMT.read_json(spark, path, schema)
        elif fmt == "orc":
            FMT.write_orc(src, path)
            back = FMT.read_orc(spark, path)
        elif fmt == "parquet":
            FMT.write_parquet(src, path)
            back = FMT.read_parquet(spark, path)
        else:
            FMT.write_xml(src, path, row_tag="doc")
            back = FMT.read_xml(spark, path, schema, row_tag="doc")
        digest = lambda c: F.sum(  # noqa: E731
            F.conv(F.substring(F.md5(c), 1, 13), 16, 10).cast("bigint")
        ).cast("bigint")
        legs.append(
            back.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("doc_id").cast("bigint").alias("key_sum"),
                digest("text").alias("text_digest_sum"),
                digest("hostile").alias("hostile_digest_sum"),
            ).select(F.lit(fmt).alias("fmt"), "*")
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.orderBy("fmt")


# --------------------------------------------------------------------------
# p13 — native streaming deduplication: Structured Streaming's
# stateful dropDuplicates under the driver's oracle (the one built-in
# stateful operator the streaming suite had not yet exercised as a
# registry row — funnel/retention/CC/sketch sinks are custom
# operators). Planted exact duplicates of every 7th event are routed
# to a DIFFERENT micro-batch file than their originals (md5-bucket
# +1 mod 3), so the drop requires CROSS-BATCH state, not per-batch
# distinct; the stream drains availableNow with a watermark bounding
# the dedup state, foreachBatch appends survivors, and the result
# must equal the original per-type counts exactly — any state loss
# double-counts, any over-dedup under-counts. Local-evidence row
# this round (window full at 50 after eight promotions); first in
# line for the r7 rotation.
# --------------------------------------------------------------------------
@register(
    "p13_streaming_dropdup",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           count(DISTINCT event_id) AS n_ids
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("pipeline", "streaming", "dedup", "dropDuplicates", "stateful"),
)
def p13_streaming_dropdup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain a 3-batch event stream with planted cross-batch exact
    duplicates through stateful dropDuplicates; per-type survivor
    counts must equal the duplicate-free originals."""
    import glob
    import os
    import shutil
    import tempfile
    import time

    from hyppo_worker_spark.functions import text as TX2

    ev = load_tables(spark, sf_dir, ("events",))["events"].select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
    )
    dupes = ev.filter(F.col("event_id") % 7 == 0)
    bucket = TX2.md5_bucket(F.col("event_id"), 3)
    staged_rows = ev.withColumn("bucket", bucket).unionByName(
        dupes.withColumn("bucket", (bucket + 1) % 3)
    )

    work = tempfile.mkdtemp(prefix="hyppo-p13-")
    src_dir = os.path.join(work, "events")
    os.makedirs(src_dir)
    now = time.time()
    for i in range(3):
        batch = staged_rows.filter(F.col("bucket") == i).drop("bucket")
        staged = os.path.join(work, f"stage-{i}")
        batch.coalesce(1).write.parquet(staged)
        part = glob.glob(os.path.join(staged, "part-*.parquet"))[0]
        dest = os.path.join(src_dir, f"batch{i}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (now - 300 + 100 * i,) * 2)

    out_dir = os.path.join(work, "deduped")
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    # The watermark must span the full event-time range of the
    # corpus: batches are md5-bucketed (NOT time-ordered), so a tight
    # watermark would classify most of batches 2-3 as late and
    # silently DROP them inside dropDuplicates (observed: ~30% loss
    # at "1 hour"). With time-ordered arrival a production pipeline
    # tightens this to its real disorder bound; the state-bounding
    # mechanism is identical.
    deduped = stream.withWatermark("ts", "60 days").dropDuplicates(
        ["event_id"]
    )

    def sink(batch: DataFrame, _bid: int) -> None:
        batch.write.mode("append").parquet(out_dir)

    # state stores sized to the stream, not the batch default
    # (session.scoped_conf docstring: measured 3-6x drain cut)
    from hyppo_worker_spark.session import scoped_conf

    with scoped_conf(spark, "spark.sql.shuffle.partitions", "4"):
        q = (
            deduped.writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        drain_stream(q, 300)

    return (
        spark.read.parquet(out_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_id").alias("n_ids"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# p14 — delegation strategy + worker affinity + contention filter
# under the driver's oracle: the fourth §2.B control-plane row,
# covering the one scheduler subsystem p09-p11 do not (reference:
# ``DelegationStrategy.scala:35-114`` — affinity-first segment
# ordering, the general-queue interleave, and the probabilistic
# Gompertz contention filter with its per-resource memoized verdict).
# A 25×5 scenario grid (nation × region) drives the REAL
# ``DefaultDelegationStrategy`` once per scenario: five integration
# queues (real QueueNaming over region names — MIDDLE EAST exercises
# sanitize), data-derived ready counts, per-queue resources with
# data-derived contention ages (queues 1 and 2 SHARE one resource, so
# the one-verdict-per-resource memoization is load-bearing), a
# rotating warm-affinity target, and a general queue whose has_work
# toggles. Everything nondeterministic is pinned: the clock (ages are
# exact small integers) and the rng (a constant-0.5 stub), which
# makes the filter verdict the pure inequality
# ``age >= 5 AND 0.5 <= e^(-5·e^(-0.2·age))`` — the oracle states the
# same curve with exp() (nearest integer age sits 8e-3 from the 0.5
# boundary, 13 orders of magnitude above cross-libm ulp drift).
# WHY the oracle can reproduce the full ordering: distinct prime
# rates larger than any ready count make ExpectedCompletion keys
# tie-free (ready_a·p_b = ready_b·p_a would need p_a | ready_a), so
# the strategy's segment-wise greedy order equals
# ORDER BY (segment, ready/rate DESC) — two window functions in SQL.
# Any drift in segment order, affinity matching, contention
# hard-minimum, curve shape, sanitize, or FIFO-of-segments breaks
# the value hash.
# --------------------------------------------------------------------------
_P14_PRIMES = (10007, 10009, 10037, 10061, 10067)


class _HalfRng:
    """Pinned rng: the contention coin always lands on 0.5."""

    def random(self) -> float:  # noqa: D102 - rng protocol
        return 0.5


@register(
    "p14_delegation_affinity_ledger",
    oracle=f"""
    WITH q AS (
        SELECT r_regionkey AS q,
               'hyppo.integration.'
                   || replace(replace(trim(r_name), '.', '-'), ' ', '_')
                   || '-v1' AS queue_name,
               (list_value{_P14_PRIMES})[CAST(r_regionkey + 1 AS INT)]
                   AS rate,
               CASE WHEN r_regionkey IN (1, 2) THEN 1 ELSE r_regionkey
                   END AS q_eff
        FROM region
    ),
    grid AS (
        SELECT n.n_nationkey AS s, q.q, q.queue_name, q.rate,
               (n.n_nationkey * 7 + q.q * 3) % 5 AS ready,
               (n.n_nationkey * 5 + q.q_eff * 4) % 21 AS age,
               ((n.n_nationkey + q.q_eff) % 4) <> 0 AS contended,
               CASE WHEN q.q = n.n_nationkey % 5 THEN 0 ELSE 2
                   END AS segment
        FROM nation n, q
    ),
    ints AS (
        SELECT s, segment, queue_name,
               CAST(ready * 1000000 // rate AS BIGINT) AS eta_us,
               ready * 1.0 / rate AS key
        FROM grid
        WHERE ready > 0
          AND (NOT contended
               OR (age >= 5
                   AND 0.5 <= exp(-(5.0 * exp(-0.2 * age)))))
    ),
    gen AS (
        SELECT n_nationkey AS s, 1 AS segment,
               'hyppo.general' AS queue_name,
               CAST(0 AS BIGINT) AS eta_us, 0.0 AS key
        FROM nation WHERE n_nationkey % 3 = 0
    ),
    merged AS (
        SELECT * FROM ints UNION ALL SELECT * FROM gen
    )
    SELECT CAST(s AS BIGINT) AS scenario,
           row_number() OVER (
               PARTITION BY s ORDER BY segment, key DESC
           ) AS pos,
           CAST(segment AS BIGINT) AS segment,
           queue_name, eta_us
    FROM merged
    ORDER BY scenario, pos
    """,
    tags=("pipeline", "control-plane", "scheduler", "delegation",
          "affinity", "contention"),
)
def p14_delegation_affinity_ledger(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delegation order produced by the real affinity-first strategy
    (contention-filtered, prioritized) over a 25-scenario grid with
    pinned clock and rng."""
    from datetime import datetime, timezone

    from hyppo_worker_spark.model import ConcurrencyWorkResource
    from hyppo_worker_spark.scheduler.delegation import (
        BackoffConfig,
        DefaultDelegationStrategy,
        WorkQueueMetrics,
    )
    from hyppo_worker_spark.scheduler.priority import (
        AbsoluteSizeOrdering,
        ExpectedCompletionOrdering,
        IdleSinceMinuteOrdering,
        QueueDetails,
        WorkQueuePrioritizer,
    )
    from hyppo_worker_spark.scheduler.queues import QueueNaming
    from hyppo_worker_spark.scheduler.resources import (
        RecentResourceContention,
    )

    tables = load_tables(spark, sf_dir, ("nation", "region"))
    scenarios = sorted(
        r.n_nationkey for r in tables["nation"].select("n_nationkey").collect()
    )
    regions = {
        r.r_regionkey: r.r_name
        for r in tables["region"].select("r_regionkey", "r_name").collect()
    }
    naming = QueueNaming()
    epoch = datetime(2024, 1, 1, tzinfo=timezone.utc)
    now = 1000.0  # pinned clock: ages below are exact small ints
    ledger = []
    for s in scenarios:
        qkeys = sorted(regions)
        q_eff = {q: (1 if q in (1, 2) else q) for q in qkeys}
        resources = {
            e: ConcurrencyWorkResource(name=f"res-{e}", concurrency=1)
            for e in sorted(set(q_eff.values()))
        }
        tnow = [now]
        contention = RecentResourceContention(
            retention_max_s=1e9, clock=lambda: tnow[0]
        )
        for e, res in resources.items():
            if (s + e) % 4 != 0:  # this resource saw contention
                tnow[0] = now - float((s * 5 + e * 4) % 21)
                contention.failed_to_acquire(res)
        tnow[0] = now
        strategy = DefaultDelegationStrategy(
            WorkQueuePrioritizer(
                [
                    ExpectedCompletionOrdering(),
                    IdleSinceMinuteOrdering(),
                    AbsoluteSizeOrdering(),
                ]
            ),
            contention,
            BackoffConfig(),  # scale 0.2, min delay 5s (reference.conf)
            rng=_HalfRng(),
            clock=lambda: tnow[0],
        )
        names = {
            q: naming.integration(regions[q], 1) for q in qkeys
        }
        integrations = [
            WorkQueueMetrics(
                details=QueueDetails(
                    queue_name=names[q],
                    size=(s * 7 + q * 3) % 5,
                    rate=float(_P14_PRIMES[q]),
                    ready=(s * 7 + q * 3) % 5,
                    unacknowledged=0,
                    idle_since=epoch,
                ),
                resources=(resources[q_eff[q]],),
            )
            for q in qkeys
        ]
        general = WorkQueueMetrics(
            details=QueueDetails(
                queue_name=naming.general,
                size=1 if s % 3 == 0 else 0,
                rate=1.0,
                ready=1 if s % 3 == 0 else 0,
                unacknowledged=0,
                idle_since=epoch,
            ),
            resources=(),
        )
        affinity_name = names[s % 5]
        rate_of = {names[q]: _P14_PRIMES[q] for q in qkeys}
        ready_of = {names[q]: (s * 7 + q * 3) % 5 for q in qkeys}
        order = list(
            strategy.priority_order_with_preference(
                lambda qn: qn == affinity_name, general, integrations
            )
        )
        for pos, details in enumerate(order, start=1):
            if details.queue_name == naming.general:
                seg, eta = 1, 0
            else:
                seg = 0 if details.queue_name == affinity_name else 2
                eta = (
                    ready_of[details.queue_name]
                    * 1_000_000
                    // rate_of[details.queue_name]
                )
            ledger.append((s, pos, seg, details.queue_name, eta))
    return local_frame(spark, 
        ledger,
        "scenario long, pos long, segment long, queue_name string, "
        "eta_us long",
    ).orderBy("scenario", "pos")


# --------------------------------------------------------------------------
# p15 — the streaming conversion funnel under the driver's oracle:
# until now the exact stateful funnel (streaming/funnel.py — chained
# conditional MINs with watermark-finality state compaction via
# applyInPandasWithState) had pytest-only evidence. This row EXECUTES
# it in the PRODUCTION configuration — time-ordered arrival with a
# bounded disorder horizon and a TIGHT watermark, so the finality
# cascade genuinely compacts state (p13's lesson applied: a blanket
# corpus-spanning delay would keep every candidate forever). The
# corpus drains as three consecutive event-time blocks (pinned file
# mtimes fix replay order); a deterministic md5-gated subset of each
# block's last-12-hours funnel events is ROUTED into the next file,
# so later micro-batches carry genuinely earlier events — bounded
# (12 h) disorder under a 2-day delay, and those late signups/views
# must REVISE downstream stages computed in the previous batch (the
# failure mode a naive furthest-stage state machine gets wrong, and
# exactly what the compaction rule must never break: it may only
# drop candidates <= watermark, which no admissible late event can
# beat). Each user's FINAL emission (argmax batch id — state is
# cumulative) is aggregated into a per-(stage, completion-day)
# census with per-user completion epochs summed, so every timestamp
# is value-bearing. The oracle recomputes the funnel relationally
# (q43's chained-min recurrence + stage-0 LEFT JOINs): a dropped or
# late-classified event, a non-revising update, an over-eager
# compaction, or a wrong strict-ordering comparison breaks the hash.
# Unbounded-disorder exactness keeps its pytest twin
# (tests/test_streaming_funnel.py, 365-day delay over md5 scatter).
# --------------------------------------------------------------------------
@register(
    "p15_streaming_funnel",
    oracle="""
    WITH s1 AS (
        SELECT user_id, min(ts) AS t FROM events
        WHERE event_type = 'signup' GROUP BY 1
    ),
    s2 AS (
        SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY 1
    ),
    s3 AS (
        SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY 1
    ),
    s4 AS (
        SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s3 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY 1
    ),
    per_user AS (
        SELECT u.user_id,
               CASE WHEN s4.t IS NOT NULL THEN 4
                    WHEN s3.t IS NOT NULL THEN 3
                    WHEN s2.t IS NOT NULL THEN 2
                    WHEN s1.t IS NOT NULL THEN 1
                    ELSE 0 END AS stage_reached,
               coalesce(s4.t, s3.t, s2.t, s1.t) AS completed
        FROM (SELECT DISTINCT user_id FROM events) u
        LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        LEFT JOIN s3 USING (user_id) LEFT JOIN s4 USING (user_id)
    )
    SELECT CAST(stage_reached AS BIGINT) AS stage_reached,
           coalesce(strftime(CAST(completed AS DATE), '%Y-%m-%d'), 'NONE')
               AS completed_day,
           count(*) AS n_users,
           CAST(sum(coalesce(CAST(floor(epoch(completed)) AS BIGINT), -1))
               AS BIGINT) AS sum_completed_s
    FROM per_user GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("pipeline", "streaming", "stateful", "funnel", "events"),
)
def p15_streaming_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage census of each user's final streaming-funnel state
    after draining events through the real applyInPandasWithState
    operator in 3 disorder-scattered micro-batches."""
    import os
    import tempfile

    from pyspark.sql.window import Window

    from hyppo_worker_spark.streaming.funnel import streaming_funnel
    from hyppo_worker_spark.streaming.pipeline import EVENTS_SCHEMA

    import glob
    import shutil
    import time

    events = load_tables(spark, sf_dir, ("events",))["events"]
    work = tempfile.mkdtemp(prefix="hyppo-p15-")
    src_dir = os.path.join(work, "stream-src")
    os.makedirs(src_dir)
    out_dir = os.path.join(work, "emissions")
    ev = events.select(
        "event_id", "user_id", "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
    )
    # three consecutive event-time blocks (corpus spans one month),
    # then bounded disorder: funnel events from the last 12 h of
    # blocks 0/1 for an md5-gated 1-in-5 user subset arrive one
    # batch LATE (well inside the 2-day delay) and must revise the
    # previous batch's funnel state.
    from hyppo_worker_spark.functions import text as TX2

    block = F.least(
        (F.dayofmonth("ts") - 1) / F.lit(10), F.lit(2)
    ).cast("int")
    late = (
        (TX2.md5_bucket(F.col("user_id"), 5) == 0)
        & (block < 2)
        & (F.dayofmonth("ts") % 10 == 0)
        & (F.hour("ts") >= 12)
    )
    staged = ev.withColumn(
        "blk", F.when(late, block + 1).otherwise(block)
    )
    now = time.time()
    stage_dir = os.path.join(work, "stage")
    staged.coalesce(1).write.partitionBy("blk").parquet(stage_dir)
    _move_staged_blocks(stage_dir, src_dir, now, 3)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    def sink(batch: DataFrame, bid: int) -> None:
        batch.withColumn("batch_id", F.lit(bid)).write.mode(
            "append"
        ).parquet(out_dir)

    # Deliberately NOT scoped to 8 shuffle partitions like p13/p16/
    # p18: the funnel's applyInPandasWithState stage does real
    # per-user Python work, and cutting task parallelism 32 -> 8
    # measured SLOWER (5.2s -> 6.7s at sf0.1) — the state-store
    # fixed-cost saving loses to the Python compute serialization.
    q = (
        streaming_funnel(stream, delay="2 days")
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    drain_stream(q, 300)

    emissions = spark.read.parquet(out_dir)
    final = (
        emissions.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.col("batch_id").desc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
    )
    return (
        final.groupBy(
            F.col("stage_reached").cast("bigint").alias("stage_reached"),
            F.coalesce(
                F.date_format(F.to_date("completed_ts"), "yyyy-MM-dd"),
                F.lit("NONE"),
            ).alias("completed_day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(
                F.coalesce(
                    F.unix_timestamp("completed_ts"), F.lit(-1)
                )
            )
            .cast("bigint")
            .alias("sum_completed_s"),
        )
        .orderBy("stage_reached", "completed_day")
    )


# --------------------------------------------------------------------------
# p16 — bounded-state streaming dedup: dropDuplicatesWithinWatermark,
# the operator that makes streaming dedup viable at 100 TB. p13's
# plain dropDuplicates keeps EVERY key forever (its md5-bucketed
# arrival forces a corpus-spanning watermark, documented there); this
# row drains the same corpus TIME-ORDERED (three consecutive
# event-time blocks, file mtimes pinned so the source replays them in
# order), plants exact duplicates both within-block and ACROSS the
# block boundary (originals in the last 12 h of block i, copies
# arriving one batch later), and dedups with a 2-DAY delay — state
# for a key lives only until the watermark passes ts+delay, so the
# store holds the disorder horizon, not the corpus. Correctness needs
# delay > boundary disorder (12 h) for lateness and >= 6 h for
# state overlap at the dupe's arrival — 2 days clears both with
# margin while evicting ~80% of each drained block. Eviction is
# asserted IN-PLAN from the query's own state-operator metrics
# (final numRowsTotal must stay under half the distinct originals —
# at full retention it equals ALL originals + planted dupes), and the
# oracle states the bound as literal TRUE alongside the exact
# per-type survivor counts: any state loss double-counts survivors,
# any over-dedup under-counts, any eviction failure flips the bound.
# --------------------------------------------------------------------------
@register(
    "p16_dropdup_within_watermark",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           count(DISTINCT event_id) AS n_ids,
           TRUE AS state_bounded
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("pipeline", "streaming", "dedup", "watermark", "bounded-state"),
)
def p16_dropdup_within_watermark(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Time-ordered 3-batch drain through dropDuplicatesWithinWatermark
    (2-day delay): planted within-block and cross-boundary duplicates
    all dropped, per-type survivors exact, state provably evicted."""
    import glob
    import os
    import shutil
    import tempfile
    import time

    ev = load_tables(spark, sf_dir, ("events",))["events"].select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
    )
    # three consecutive event-time blocks (corpus spans one month)
    block = F.least(
        (F.dayofmonth("ts") - 1) / F.lit(10), F.lit(2)
    ).cast("int")
    base = ev.withColumn("blk", block)
    same_block = base.filter(F.col("event_id") % 7 == 0)
    boundary = base.filter(
        (F.col("event_id") % 11 == 0)
        & (F.col("blk") < 2)
        # last 12 h of the block: disorder stays under the 2-day delay
        & (F.dayofmonth("ts") % 10 == 0)
        & (F.hour("ts") >= 12)
    ).withColumn("blk", F.col("blk") + 1)
    staged = base.unionByName(same_block).unionByName(boundary)

    work = tempfile.mkdtemp(prefix="hyppo-p16-")
    src_dir = os.path.join(work, "events")
    os.makedirs(src_dir)
    now = time.time()
    stage_dir = os.path.join(work, "stage")
    staged.coalesce(1).write.partitionBy("blk").parquet(stage_dir)
    _move_staged_blocks(stage_dir, src_dir, now, 3)

    out_dir = os.path.join(work, "deduped")
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    deduped = stream.withWatermark(
        "ts", "2 days"
    ).dropDuplicatesWithinWatermark(["event_id"])

    def sink(batch: DataFrame, _bid: int) -> None:
        batch.write.mode("append").parquet(out_dir)

    # state stores sized to the stream, not the batch default
    # (session.scoped_conf docstring: measured 3-6x drain cut)
    from hyppo_worker_spark.session import scoped_conf

    with scoped_conf(spark, "spark.sql.shuffle.partitions", "4"):
        q = (
            deduped.writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        drain_stream(q, 300)

    prog = [p for p in q.recentProgress if p.get("stateOperators")]
    last_state = (
        prog[-1]["stateOperators"][0]["numRowsTotal"] if prog else -1
    )
    n_orig = ev.count()
    bounded = 0 <= last_state < n_orig // 2

    return (
        spark.read.parquet(out_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_id").alias("n_ids"),
        )
        .withColumn("state_bounded", F.lit(bounded))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# p17 — logical queue rollup + stats EMA ledger: the last §2.B surface
# without a driver row (VERDICT r6 item 7). Exercises, through the REAL
# broker, the reference's queue-statistics aggregation plane:
#   - per-queue completion-rate EMA (rate = 0.3/dt after one pinned
#     completion pair; the engine's analog of the polled RabbitMQ rate),
#   - QueueNaming.toLogicalQueueDetails grouping (base queue + every
#     md5-resource-suffixed variant fold into one logical entry;
#     single-member groups pass through unchanged — seq.head),
#   - MultiQueueDetails merge (QueueDetails.scala:50-92): summed
#     size/ready/unacked, size-WEIGHTED mean rate — the oracle states
#     the weighted mean verbatim, so a plain rate SUM (the bug this
#     round fixed) breaks the value hash,
#   - unknownQueueDetails stub (zeros for a never-declared queue).
# Scenario grid from the nation table: nation n gets 1 + n%3 queues
# (base + resource variants), each with formulaic ready/unacked counts
# and a distinct-prime EMA interval, all under a pinned clock.
# --------------------------------------------------------------------------
def _first_primes(k: int) -> list[int]:
    out, c = [], 2
    while len(out) < k:
        if all(c % p for p in out if p * p <= c):
            out.append(c)
        c += 1
    return out


_P17_PRIMES = _first_primes(75)
_P17_PRIMES_SQL = ", ".join(
    f"({i}, {p})" for i, p in enumerate(_P17_PRIMES)
)


@register(
    "p17_queue_rollup_ledger",
    oracle=f"""
    WITH primes(idx, p) AS (VALUES {_P17_PRIMES_SQL}),
    members AS (
        SELECT n.n_nationkey AS nk, j.j AS j,
               2 + (n.n_nationkey + j.j) % 3 AS ready,
               3 + (n.n_nationkey + j.j) % 3 AS msize,
               0.3 / pr.p AS rate
        FROM nation n,
             LATERAL unnest(range(0, n.n_nationkey % 3 + 1)) AS j(j)
             JOIN primes pr ON pr.idx = n.n_nationkey * 3 + j.j
    ),
    logical_q AS (
        SELECT nk,
               'hyppo.integration.SRC' || nk || '-v1' AS logical_name,
               count(*) AS n_queues,
               sum(msize) AS qsize,
               sum(ready) AS qready,
               count(*) AS qunacked,
               round(CASE WHEN count(*) = 1 THEN min(rate)
                          ELSE sum(rate * msize) / sum(msize)
                     END, 9) AS rate_r9
        FROM members GROUP BY nk
    )
    SELECT CAST(nk AS BIGINT) AS nationkey, logical_name,
           CAST(n_queues AS BIGINT) AS n_queues,
           CAST(qsize AS BIGINT) AS qsize,
           CAST(qready AS BIGINT) AS qready,
           CAST(qunacked AS BIGINT) AS qunacked,
           rate_r9
    FROM logical_q
    UNION ALL
    SELECT -1, 'hyppo.resource.concurrency.ghost', 0, 0, 0, 0, 0.0
    ORDER BY nationkey
    """,
    tags=("pipeline", "control-plane", "scheduler", "rollup", "ema"),
)
def p17_queue_rollup_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logical-rollup stats ledger: nation-derived queue families driven
    through the real broker (enqueue / basic_get / ack under a pinned
    clock), then ``logical_rollup()`` — one row per logical queue plus
    the unknown-queue stub row."""
    from hyppo_worker_spark.model import (
        ConcurrencyWorkResource,
        IntegrationDetails,
        ValidateIntegrationRequest,
    )
    from hyppo_worker_spark.scheduler.queues import (
        WorkQueueTable,
        stub_details,
    )

    nations = sorted(
        r.n_nationkey
        for r in load_tables(spark, sf_dir, ("nation",))["nation"]
        .select("n_nationkey")
        .collect()  # bounded control-plane scale: 25 rows
    )
    tnow = [0.0]
    qt = WorkQueueTable(clock=lambda: tnow[0])
    base_of: dict[int, str] = {}
    for n in nations:
        for j in range(n % 3 + 1):
            details = IntegrationDetails(
                source_name=f"SRC{n}",
                version_number=1,
                is_raw_data_integration=False,
            )
            resources = (
                (ConcurrencyWorkResource(name=f"r{n}_{j}", concurrency=1),)
                if j > 0
                else ()
            )
            item = ValidateIntegrationRequest(
                integration=details, resources=resources
            )
            ready_keep = 2 + (n + j) % 3
            # ready_keep left in queue + 1 left unacked + 2 acked for
            # the EMA pair; huge TTL so the advancing clock can't
            # expire anything mid-scenario
            name = None
            for _ in range(ready_keep + 3):
                name = qt.enqueue(item, ttl_s=1e12)
            if j == 0:
                base_of[n] = name
            qt.ack(qt.basic_get(name))  # 1st completion: rate stays 0
            tnow[0] += float(_P17_PRIMES[n * 3 + j])
            qt.ack(qt.basic_get(name))  # 2nd: rate = 0.3/prime
            qt.basic_get(name)  # left unacked
    rollup = qt.logical_rollup()
    ledger = []
    for n in nations:
        d = rollup[base_of[n]]
        ledger.append(
            (n, base_of[n], n % 3 + 1, d.size, d.ready,
             d.unacknowledged, d.rate)
        )
    ghost = stub_details("hyppo.resource.concurrency.ghost")
    ledger.append(
        (-1, ghost.queue_name, 0, ghost.size, ghost.ready,
         ghost.unacknowledged, ghost.rate)
    )
    return (
        local_frame(spark, 
            ledger,
            "nationkey long, logical_name string, n_queues long, "
            "qsize long, qready long, qunacked long, rate double",
        )
        .select(
            "nationkey", "logical_name", "n_queues", "qsize", "qready",
            "qunacked", F.round("rate", 9).alias("rate_r9"),
        )
        .orderBy("nationkey")
    )


# --------------------------------------------------------------------------
# p18 — watermarked STREAM-STREAM inner join: the one streaming
# operator category the registry didn't cover (p05/p07/p08 foreachBatch
# maintenance, p13/p16 stateful dedup, p15 applyInPandasWithState —
# none exercise Spark's symmetric hash join with two watermarked
# sources). Attribution shape: every purchase within 2 hours of a view
# by the same user. Both sides drain as three TIME-ORDERED blocks
# (days 1-10 / 11-20 / 21-30, pinned mtimes, maxFilesPerTrigger=1 +
# availableNow pulls one file PER SOURCE per trigger), watermarked at
# 3 days — tight enough that the join state provably evicts (the
# in-plan state_bounded column: final numRowsTotal across both join
# sides must stay under 60% of the input rows, where blanket retention
# holds ~100%), wide enough that no cross-boundary match is dropped
# (a boundary pair spans at most 2 hours; the watermark when block
# i+1 processes is max_ts(block_i) - 3 days, far below the partner's
# timestamp). The oracle is the equivalent batch range-join — any
# dropped late row, double-emitted match, or mis-bounded range breaks
# row counts or the cents sum. Money rides integer cents.
# --------------------------------------------------------------------------
@register(
    "p18_stream_stream_join",
    oracle="""
    WITH v AS (
        SELECT event_id AS vid, user_id, ts AS vts
        FROM events WHERE event_type = 'view'
    ),
    p AS (
        SELECT event_id AS pid, user_id, ts AS pts,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    pairs AS (
        SELECT v.vid, p.pid, v.user_id, v.vts, p.cents
        FROM v JOIN p ON v.user_id = p.user_id
            AND p.pts >= v.vts
            AND p.pts <= v.vts + INTERVAL 2 HOUR
    )
    SELECT strftime(vts, '%Y-%m-%d') AS view_day,
           count(*) AS n_pairs,
           count(DISTINCT vid) AS n_views,
           count(DISTINCT user_id) AS n_buyers,
           CAST(sum(cents) AS BIGINT) AS cents,
           TRUE AS state_bounded
    FROM pairs GROUP BY view_day ORDER BY view_day
    """,
    tags=("pipeline", "streaming", "stream-stream-join", "watermark"),
)
def p18_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two watermarked event streams (views, purchases) joined inside
    Structured Streaming's symmetric hash join; per-view-day matched
    pairs, distinct views/buyers, and purchase cents must equal the
    batch range-join oracle, with join state provably evicted."""
    import glob
    import os
    import shutil
    import tempfile
    import time

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("vid"),
        F.col("user_id").alias("vuser"),
        F.col("ts").cast("timestamp").alias("vts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("puser"),
        F.col("ts").cast("timestamp").alias("pts"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )

    work = tempfile.mkdtemp(prefix="hyppo-p18-")
    now = time.time()
    dirs = {}
    for label, df, ts_col in (
        ("views", views, "vts"), ("purchases", purchases, "pts")
    ):
        src = os.path.join(work, label)
        os.makedirs(src)
        blk = F.least(
            (F.dayofmonth(ts_col) - 1) / F.lit(10), F.lit(2)
        ).cast("int")
        # Staging shape re-measured r10: coalesce(1)+partitionBy (ONE
        # job, no exchange) beats the per-block filter loop 4.5-4.7 vs
        # 4.8-5.3s end-to-end (interleaved min-of-3 pairs, sf0.1). The
        # r7 note that rejected consolidation measured repartition(3,
        # blk) — the exchange, not the partitioned write, was the cost.
        staged = df.withColumn("blk", blk)
        stage_dir = os.path.join(work, f"stage-{label}")
        staged.coalesce(1).write.partitionBy("blk").parquet(stage_dir)
        _move_staged_blocks(stage_dir, src, now, 3)
        dirs[label] = src

    vstream = (
        spark.readStream.schema("vid long, vuser long, vts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(dirs["views"])
        .withWatermark("vts", "3 days")
    )
    pstream = (
        spark.readStream.schema(
            "pid long, puser long, pts timestamp, cents long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(dirs["purchases"])
        .withWatermark("pts", "3 days")
    )
    joined = vstream.join(
        pstream,
        (F.col("vuser") == F.col("puser"))
        & (F.col("pts") >= F.col("vts"))
        & (F.col("pts") <= F.col("vts") + F.expr("INTERVAL 2 HOURS")),
        "inner",
    ).select("vid", "pid", "vuser", "vts", "cents")

    out_dir = os.path.join(work, "pairs")

    def sink(batch: DataFrame, _bid: int) -> None:
        batch.write.mode("append").parquet(out_dir)

    # State-store count = shuffle partitions x 4 join stores, frozen
    # into the checkpoint at first run; sized to this stream's
    # throughput instead of the batch default (session.scoped_conf
    # docstring has the measurements: 14-23s -> 4-5s at sf0.1).
    from hyppo_worker_spark.session import scoped_conf

    with scoped_conf(spark, "spark.sql.shuffle.partitions", "4"):
        q = (
            joined.writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        drain_stream(q, 300)

    prog = [p for p in q.recentProgress if p.get("stateOperators")]
    last_state = (
        prog[-1]["stateOperators"][0]["numRowsTotal"] if prog else -1
    )
    # count the staged files, not the events table — no third scan
    n_inputs = (
        spark.read.parquet(dirs["views"]).count()
        + spark.read.parquet(dirs["purchases"]).count()
    )
    # blanket retention would hold ~100% of both sides; the 3-day
    # watermark must have evicted everything older than ~day 17 by the
    # final batch (days 17-30 of a 30-day corpus ~= 47% retained)
    bounded = 0 <= last_state < n_inputs * 6 // 10

    return (
        spark.read.parquet(out_dir)
        .dropDuplicates(["vid", "pid"])  # idempotent re-read guard
        .groupBy(F.date_format("vts", "yyyy-MM-dd").alias("view_day"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("vid").alias("n_views"),
            F.countDistinct("vuser").alias("n_buyers"),
            F.sum("cents").alias("cents"),
        )
        .withColumn("state_bounded", F.lit(bounded))
        .orderBy("view_day")
    )


# --------------------------------------------------------------------------
# p19 — SCHEMA-EVOLUTION round-trip through the Avro records zone: the
# reference identifies every integration schema by MD5 fingerprint
# (``IntegrationSchema.scala:11-31``), so each evolution is a new
# version and old files stay on disk under old schemas. The engine's
# declared-schema-preserving writer + spec Schema Resolution reader
# (round 8) make that history readable: half of `orders` is written
# under schema v1 (enum status, int cents, date day), half under v2
# (cents promoted int->long, a `channel` string field added — v1
# files must fill its declared default "legacy"), and the zone is
# read back as ONE DataFrame under the v2 READER schema with
# per-file resolution from each file's own header. The oracle
# reproduces the same rows from `orders` directly: the md5 gate
# decides which rows carry the default. Money rides integer cents
# (p18 precedent: the floor(x*100+0.5) expression is stated
# identically on both sides).
# --------------------------------------------------------------------------
@register(
    "p19_schema_evolution_roundtrip",
    oracle="""
    WITH src AS (
        SELECT o_orderkey AS order_key,
               o_orderstatus AS status,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
               CASE WHEN {gate} = 0 THEN 'legacy'
                    ELSE lower(o_orderpriority) END AS channel
        FROM orders
    )
    SELECT status,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           CAST(sum(CASE WHEN channel = 'legacy' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_legacy,
           CAST(count(DISTINCT channel) AS BIGINT) AS n_channels
    FROM src GROUP BY status ORDER BY status
    """.replace(
        "{gate}",
        __import__(
            "hyppo_worker_spark.functions.text", fromlist=["md5_bucket_sql"]
        ).md5_bucket_sql("o_orderkey", 2),
    ),
    tags=("pipeline", "avro", "schema-evolution", "formats"),
)
def p19_schema_evolution_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Write orders split across Avro schema versions v1/v2 (declared
    schemas embedded verbatim — fingerprint-preserving), read the zone
    back under the v2 reader with per-file Schema Resolution (v1 rows
    promote cents int->long and fill channel's default), and aggregate
    per status; must equal the direct SQL over orders."""
    import json as _json
    import tempfile

    from hyppo_worker_spark.functions import text as TX3
    from hyppo_worker_spark.sources.avro_container import (
        read_avro,
        write_avro,
    )
    v1 = _json.dumps({
        "type": "record", "name": "order_rec",
        "fields": [
            {"name": "order_key", "type": "long"},
            {"name": "status",
             "type": {"type": "enum", "name": "order_status",
                      "symbols": ["F", "O", "P"]}},
            {"name": "cents", "type": "int"},
        ],
    })
    v2 = _json.dumps({
        "type": "record", "name": "order_rec",
        "fields": [
            {"name": "order_key", "type": "long"},
            {"name": "status",
             "type": {"type": "enum", "name": "order_status",
                      "symbols": ["F", "O", "P"]}},
            {"name": "cents", "type": "long"},
            {"name": "channel", "type": "string", "default": "legacy"},
        ],
    })

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    base = orders.select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_orderstatus").alias("status"),
        F.floor(F.col("o_totalprice") * 100 + 0.5)
        .cast("long")
        .alias("cents"),
        F.lower("o_orderpriority").alias("channel"),
        TX3.md5_bucket(F.col("o_orderkey"), 2).alias("gate"),
    )
    zone = tempfile.mkdtemp(prefix="hyppo-p19-")
    # the Python encode in write_avro is CPU-bound per partition, and
    # the gate filter inherits the parquet scan's partitioning (ONE
    # task at 10x — m08 lesson: the planner sizes a stage by its scan
    # input, not by downstream work); spread the encode explicitly
    n_enc = max(8, spark.sparkContext.defaultParallelism // 4)
    old = base.filter(F.col("gate") == 0).repartition(n_enc).select(
        "order_key", "status", F.col("cents").cast("int").alias("cents")
    )
    new = base.filter(F.col("gate") == 1).repartition(n_enc).select(
        "order_key", "status", "cents", "channel"
    )
    # v1 files: int cents, NO channel column; v2 files: long cents +
    # channel. Both writes embed their declared schema verbatim
    # (write_avro validates the shape against the declared schema).
    write_avro(old, zone, codec="deflate", declared_schema=v1)
    write_avro(new, zone, codec="deflate", declared_schema=v2)

    merged = read_avro(spark, zone, reader_schema=v2)
    return (
        merged.groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("sum_cents"),
            F.sum((F.col("channel") == "legacy").cast("long"))
            .cast("long")
            .alias("n_legacy"),
            F.countDistinct("channel").cast("long").alias("n_channels"),
        )
        .orderBy("status")
    )


# --------------------------------------------------------------------------
# p20 — watermarked stream-stream LEFT OUTER join: the outer variant has
# semantics the p18 inner join never exercises — an unmatched left row
# is EMITTED WITH NULLS only when the watermark proves no partner can
# still arrive (state tracks a matched bit; eviction emits the null row
# exactly once). Determinism needs the watermark to pass EVERY view's
# join window before the stream ends, so each side stages a sentinel
# file (user -1, max corpus ts + 30 days) processed last: the sentinel
# batch advances the global watermark past all real rows and the
# trailing no-data micro-batch (on by default) flushes every undecided
# view. That also makes the eviction assertion strict: final join state
# must hold only the sentinels' neighborhood (< 5% of input, vs p18's
# 60% bound). The oracle is the equivalent batch LEFT JOIN — a dropped
# null row, a double emission (null + match for one vid), or an
# unflushed tail breaks n_rows / n_unmatched / the cents sum.
# Reference: the reference's join operators declare inner/left/right
# semantics in one enum (`JoinOp` surface, SURVEY.md §2.4 joins);
# streaming left-outer is the Spark-native expression of that contract
# over unbounded inputs.
# --------------------------------------------------------------------------
@register(
    "p20_stream_stream_outer_join",
    oracle="""
    WITH v AS (
        SELECT event_id AS vid, user_id, ts AS vts
        FROM events WHERE event_type = 'view'
    ),
    p AS (
        SELECT event_id AS pid, user_id, ts AS pts,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    pairs AS (
        SELECT v.vid, p.pid, v.vts, p.cents
        FROM v LEFT JOIN p ON v.user_id = p.user_id
            AND p.pts >= v.vts
            AND p.pts <= v.vts + INTERVAL 2 HOUR
    )
    SELECT strftime(vts, '%Y-%m-%d') AS view_day,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT vid) AS BIGINT) AS n_views,
           CAST(sum(CASE WHEN pid IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unmatched,
           CAST(coalesce(sum(cents), 0) AS BIGINT) AS cents,
           TRUE AS state_flushed
    FROM pairs GROUP BY view_day ORDER BY view_day
    """,
    tags=("pipeline", "streaming", "stream-stream-join", "outer-join",
          "watermark"),
)
def p20_stream_stream_outer_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Views LEFT OUTER JOIN purchases (same user, purchase within 2h)
    inside Structured Streaming: matched pairs stream out as they meet;
    unmatched views emit null-padded rows on watermark-proven expiry,
    forced complete by a far-future sentinel batch per side; per-day
    rollup must equal the batch left join, with join state flushed to
    <5% of input."""
    import glob
    import os
    import shutil
    import time

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    max_ts = ev.agg(F.max(F.col("ts").cast("timestamp"))).collect()[0][0]
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("vid"),
        F.col("user_id").alias("vuser"),
        F.col("ts").cast("timestamp").alias("vts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("puser"),
        F.col("ts").cast("timestamp").alias("pts"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )

    work = tempfile.mkdtemp(prefix="hyppo-p20-")
    now = time.time()
    dirs = {}
    for label, df, cols in (
        ("views", views, "vid long, vuser long, vts timestamp"),
        ("purchases", purchases,
         "pid long, puser long, pts timestamp, cents long"),
    ):
        src = os.path.join(work, label)
        os.makedirs(src)
        ts_col = cols.split(",")[2].strip().split(" ")[0]
        blk = F.least(
            (F.dayofmonth(ts_col) - 1) / F.lit(10), F.lit(2)
        ).cast("int")
        # sentinel: one far-future row, processed LAST — pushes the
        # watermark past every real row's join window so all unmatched
        # views are decided before the stream ends; staged as blk=3 so
        # ONE partitioned write materializes all four time-ordered
        # files (the p26 staging cut, r9 profile)
        flush_ts = F.lit(max_ts) + F.expr("INTERVAL 30 DAYS")
        if label == "views":
            sent = spark.range(1).select(
                F.lit(-1).cast("long").alias("vid"),
                F.lit(-1).cast("long").alias("vuser"),
                flush_ts.alias("vts"),
            )
        else:
            sent = spark.range(1).select(
                F.lit(-1).cast("long").alias("pid"),
                F.lit(-1).cast("long").alias("puser"),
                flush_ts.alias("pts"),
                F.lit(0).cast("long").alias("cents"),
            )
        staged = df.withColumn("blk", blk).unionByName(
            sent.withColumn("blk", F.lit(3))
        )
        stage_dir = os.path.join(work, f"stage-{label}")
        staged.coalesce(1).write.partitionBy("blk").parquet(stage_dir)
        _move_staged_blocks(stage_dir, src, now, 4, sentinel=True)
        dirs[label] = src

    vstream = (
        spark.readStream.schema("vid long, vuser long, vts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(dirs["views"])
        .withWatermark("vts", "3 days")
    )
    pstream = (
        spark.readStream.schema(
            "pid long, puser long, pts timestamp, cents long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(dirs["purchases"])
        .withWatermark("pts", "3 days")
    )
    joined = vstream.join(
        pstream,
        (F.col("vuser") == F.col("puser"))
        & (F.col("pts") >= F.col("vts"))
        & (F.col("pts") <= F.col("vts") + F.expr("INTERVAL 2 HOURS")),
        "leftOuter",
    ).select("vid", "vuser", "vts", "pid", "cents")

    out_dir = os.path.join(work, "pairs")

    def sink(batch: DataFrame, _bid: int) -> None:
        batch.write.mode("append").parquet(out_dir)

    from hyppo_worker_spark.session import scoped_conf

    # 4 state partitions: the outer join keeps FOUR state stores per
    # partition, so store commits = 4 x partitions x triggers — the
    # dominant task-time at test scale (r9 profile: 11-14 task-s at 8
    # partitions, p26 precedent). At 100 TB this knob goes UP; state
    # partition count freezes into the checkpoint (SCALE.md rule).
    with scoped_conf(spark, "spark.sql.shuffle.partitions", "4"):
        q = (
            joined.writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        drain_stream(q, 300)

    prog = [p for p in q.recentProgress if p.get("stateOperators")]
    last_state = (
        prog[-1]["stateOperators"][0]["numRowsTotal"] if prog else -1
    )
    n_inputs = (
        spark.read.parquet(dirs["views"]).count()
        + spark.read.parquet(dirs["purchases"]).count()
    )
    # the sentinel flush must leave only the sentinels' neighborhood in
    # state — far stricter than p18's 60% blanket-retention bound
    flushed = 0 <= last_state < max(4, n_inputs // 20)

    return (
        spark.read.parquet(out_dir)
        .filter(F.col("vuser") != -1)  # drop the sentinel's own row
        .dropDuplicates(["vid", "pid"])  # idempotent re-read guard
        .groupBy(F.date_format("vts", "yyyy-MM-dd").alias("view_day"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("vid").alias("n_views"),
            F.sum(F.col("pid").isNull().cast("long")).alias(
                "n_unmatched"
            ),
            F.coalesce(F.sum("cents"), F.lit(0)).alias("cents"),
        )
        .withColumn("state_flushed", F.lit(flushed))
        .orderBy("view_day")
    )


# --------------------------------------------------------------------------
# p21 — STREAM-STATIC broadcast enrichment join: the stateless third
# streaming-join path (p18 inner and p20 outer both run the stateful
# StreamingSymmetricHashJoin; joining a stream to a STATIC dimension
# plans a plain BroadcastHashJoin inside every micro-batch — no
# watermark, no state store, and the dimension is re-broadcast per
# batch, which at 100 TB is exactly the "small dim enriches unbounded
# fact" contract: dimension size bounds executor memory, stream size
# bounds nothing). Events drain in three time-ordered blocks and each
# batch left-joins user_id against a customer-derived segment
# dimension (unmatched users keep 'unknown'); the in-plan
# `stateless` column asserts the streaming progress reported ZERO
# state operators — proof the planner chose the stateless path, which
# blanket use of a stream-stream join would break. The oracle is the
# equivalent batch left join; cents ride integers.
# --------------------------------------------------------------------------
@register(
    "p21_stream_static_enrichment",
    oracle="""
    WITH dim AS (
        SELECT c_custkey AS user_id, c_mktsegment AS segment
        FROM customer WHERE c_custkey < 150
    ),
    enriched AS (
        SELECT e.event_id, e.user_id,
               coalesce(d.segment, 'unknown') AS segment,
               CAST(floor(e.value * 100 + 0.5) AS BIGINT) AS cents
        FROM events e LEFT JOIN dim d ON e.user_id = d.user_id
    )
    SELECT segment,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(cents) AS BIGINT) AS cents,
           TRUE AS stateless
    FROM enriched GROUP BY segment ORDER BY segment
    """,
    tags=("pipeline", "streaming", "stream-static-join", "broadcast"),
)
def p21_stream_static_enrichment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Event stream left-joined per micro-batch against a broadcast
    customer-segment dimension (stateless — the progress log must show
    zero state operators); per-segment rollup equals the batch left
    join."""
    import glob
    import os
    import shutil
    import time

    tabs = load_tables(spark, sf_dir, ("events", "customer"))
    ev = tabs["events"].select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    dim = (
        tabs["customer"]
        .filter(F.col("c_custkey") < 150)
        .select(
            F.col("c_custkey").alias("duser"),
            F.col("c_mktsegment").alias("segment"),
        )
    )

    work = tempfile.mkdtemp(prefix="hyppo-p21-")
    src_dir = os.path.join(work, "events")
    os.makedirs(src_dir)
    now = time.time()
    blk = F.least(
        (F.dayofmonth("ts") - 1) / F.lit(10), F.lit(2)
    ).cast("int")
    staged = ev.withColumn("blk", blk)
    stage_dir = os.path.join(work, "stage")
    staged.coalesce(1).write.partitionBy("blk").parquet(stage_dir)
    _move_staged_blocks(stage_dir, src_dir, now, 3)

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, cents long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    enriched = stream.join(
        F.broadcast(dim), stream.user_id == dim.duser, "left"
    ).select(
        "event_id",
        "user_id",
        F.coalesce("segment", F.lit("unknown")).alias("segment"),
        "cents",
    )

    out_dir = os.path.join(work, "enriched")

    def sink(batch: DataFrame, _bid: int) -> None:
        batch.write.mode("append").parquet(out_dir)

    q = (
        enriched.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    drain_stream(q, 300)

    # the stateless path reports NO state operators in any progress
    # entry — a stream-stream plan (or an accidental stateful agg)
    # would populate stateOperators and break the literal-TRUE column
    stateless = all(
        not p.get("stateOperators") for p in q.recentProgress
    ) and len(q.recentProgress) > 0

    return (
        spark.read.parquet(out_dir)
        .dropDuplicates(["event_id"])  # idempotent re-read guard
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("cents").alias("cents"),
        )
        .withColumn("stateless", F.lit(stateless))
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# p22 — DATA-QUALITY GATE: the validation stage every training-data
# ingest needs before a corpus is admitted (the reference gates
# ingestion on schema fingerprints, `IntegrationSchema.scala:25-28`;
# this is the row-level analog: PK uniqueness, FK integrity, required
# non-null, numeric range, enum domain). A clean corpus yields all
# zeros, which a value hash cannot discriminate — so the gate runs on
# a deterministically CORRUPTED staged copy of orders (md5-gated 1%
# slices each violating exactly one constraint: duplicated keys,
# orphaned custkeys, nulled dates, negated totals, an off-domain
# status), and every constraint must report its planted count.
# Scale-first shapes: the five checks cost two shuffles total —
# duplicate detection and FK orphan share nothing, but nulls/range/
# enum fold into ONE conditional-aggregation pass over the staged
# scan (no per-constraint rescans), and the FK anti-join keys on
# custkey (broadcastable at dimension scale, SMJ beyond).
# --------------------------------------------------------------------------
@register(
    "p22_data_quality_gate",
    oracle="""
    WITH staged AS (
        SELECT o_orderkey,
               CASE WHEN {g} = 1 THEN -o_custkey ELSE o_custkey END
                   AS o_custkey,
               CASE WHEN {g} = 2 THEN NULL ELSE o_orderdate END
                   AS o_orderdate,
               CASE WHEN {g} = 3 THEN -o_totalprice ELSE o_totalprice
                   END AS o_totalprice,
               CASE WHEN {g} = 4 THEN 'X' ELSE o_orderstatus END
                   AS o_orderstatus
        FROM orders
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
               o_orderstatus
        FROM orders WHERE {g} = 0
    ),
    pk AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM (
            SELECT o_orderkey FROM staged
            GROUP BY o_orderkey HAVING count(*) > 1
        )
    ),
    fk AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM staged s
        WHERE NOT EXISTS (
            SELECT 1 FROM customer c WHERE c.c_custkey = s.o_custkey
        )
    ),
    scan AS (
        SELECT
            CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_null,
            CAST(sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_range,
            CAST(sum(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_enum
        FROM staged
    )
    SELECT 'enum_domain_orderstatus' AS constraint_name,
           n_enum AS n_violations FROM scan
    UNION ALL
    SELECT 'fk_orders_customer', n FROM fk
    UNION ALL
    SELECT 'not_null_orderdate', n_null FROM scan
    UNION ALL
    SELECT 'pk_unique_orderkey', n FROM pk
    UNION ALL
    SELECT 'range_totalprice_nonnegative', n_range FROM scan
    ORDER BY constraint_name
    """.replace(
        "{g}",
        __import__(
            "hyppo_worker_spark.functions.text", fromlist=["md5_bucket_sql"]
        ).md5_bucket_sql("o_orderkey", 97),
    ),
    tags=("pipeline", "data-quality", "constraints", "validation"),
)
def p22_data_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-constraint quality gate over a deterministically corrupted
    staged copy of orders: per-constraint violation counts (duplicate
    PKs, FK orphans vs customer, null dates, negative totals, bad
    status) must equal the oracle's planted counts."""
    from hyppo_worker_spark.functions import text as TX4

    tabs = load_tables(spark, sf_dir, ("orders", "customer"))
    orders, customer = tabs["orders"], tabs["customer"]
    g = TX4.md5_bucket(F.col("o_orderkey"), 97)
    corrupted = orders.select(
        "o_orderkey",
        F.when(g == 1, -F.col("o_custkey"))
        .otherwise(F.col("o_custkey"))
        .alias("o_custkey"),
        F.when(g == 2, F.lit(None)).otherwise(F.col("o_orderdate"))
        .alias("o_orderdate"),
        F.when(g == 3, -F.col("o_totalprice"))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(g == 4, F.lit("X")).otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
    )
    staged = corrupted.unionByName(
        orders.filter(g == 0).select(
            "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
            "o_orderstatus",
        )
    )

    pk = (
        staged.groupBy("o_orderkey")
        .count()
        .filter(F.col("count") > 1)
        .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        .withColumn("constraint_name", F.lit("pk_unique_orderkey"))
    )
    fk = (
        staged.join(
            customer.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        .withColumn("constraint_name", F.lit("fk_orders_customer"))
    )
    # nulls / range / enum share ONE pass over the staged scan
    scan = staged.agg(
        F.sum(F.col("o_orderdate").isNull().cast("long"))
        .cast("long")
        .alias("n_null"),
        F.sum((F.col("o_totalprice") < 0).cast("long"))
        .cast("long")
        .alias("n_range"),
        F.sum((~F.col("o_orderstatus").isin("F", "O", "P")).cast("long"))
        .cast("long")
        .alias("n_enum"),
    )
    folded = scan.selectExpr(
        "stack(3, 'not_null_orderdate', n_null, "
        "'range_totalprice_nonnegative', n_range, "
        "'enum_domain_orderstatus', n_enum) "
        "AS (constraint_name, n_violations)"
    )
    return (
        pk.select("constraint_name", "n_violations")
        .unionByName(fk.select("constraint_name", "n_violations"))
        .unionByName(folded.select("constraint_name", "n_violations"))
        .orderBy("constraint_name")
    )


# --------------------------------------------------------------------------
# p23 — CHECKPOINT RESUME across a stream restart: the exactly-once
# property everything in production leans on — a stream is STOPPED,
# new data arrives, and a NEW query (same checkpoint dir) must carry
# on as if never interrupted: the file-source's seen-files log skips
# phase-1 files, batch ids CONTINUE (first phase-2 batch id equals
# the phase-1 file count — asserted in-plan), and dedup STATE
# SURVIVES the restart. The discriminating plant: copies of rows
# whose originals arrived in the last 12 h of phase 1 arrive in the
# first phase-2 file — inside the 2-day watermark horizon, so the
# resumed state MUST drop them; a fresh-state restart would pass
# them through and inflate n_events per type (value-hash breakage,
# not just a flag). A second plant crosses the phase-2 internal
# boundary to prove dedup continues after resume, and the p16-style
# eviction bound still holds at the end. Oracle: distinct counts
# over the base corpus (every plant dropped) + the literal TRUE.
# --------------------------------------------------------------------------
@register(
    "p23_stream_checkpoint_resume",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           count(DISTINCT event_id) AS n_ids,
           TRUE AS resumed_and_bounded
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("pipeline", "streaming", "checkpoint", "recovery", "dedup"),
)
def p23_stream_checkpoint_resume(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermarked streaming dedup stopped after two files and resumed
    from its checkpoint over two later files; cross-restart duplicates
    must drop (state survived), batch ids must continue, and the
    eviction bound must hold."""
    import glob
    import os
    import shutil
    import time

    ev = load_tables(spark, sf_dir, ("events",))["events"].select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
    )
    # four consecutive event-time blocks over the one-month corpus
    block = F.least(
        (F.dayofmonth("ts") - 1) / F.lit(8), F.lit(3)
    ).cast("int")
    base = ev.withColumn("blk", block)
    # within-phase duplicate (blk0 rows re-sent in blk1)
    dup_a = base.filter(
        (F.col("blk") == 0) & (F.col("event_id") % 7 == 0)
    ).withColumn("blk", F.lit(1))
    # CROSS-RESTART duplicate: originals land in the last 12 h of
    # phase 1 (blk1 = days 9-16), copies arrive in blk2 — the first
    # file the RESUMED query reads
    dup_b = base.filter(
        (F.col("blk") == 1)
        & (F.dayofmonth("ts") == 16)
        & (F.hour("ts") >= 12)
    ).withColumn("blk", F.lit(2))
    # post-resume boundary duplicate (blk2 -> blk3)
    dup_c = base.filter(
        (F.col("blk") == 2)
        & (F.dayofmonth("ts") == 24)
        & (F.hour("ts") >= 12)
    ).withColumn("blk", F.lit(3))
    staged = (
        base.unionByName(dup_a).unionByName(dup_b).unionByName(dup_c)
    )

    work = tempfile.mkdtemp(prefix="hyppo-p23-")
    src_dir = os.path.join(work, "events")
    os.makedirs(src_dir)
    now = time.time()
    stage_dir = os.path.join(work, "stage")
    staged.coalesce(1).write.partitionBy("blk").parquet(stage_dir)
    _move_staged_blocks(stage_dir, work, now, 4, prefix="pending-batch")

    out_dir = os.path.join(work, "deduped")
    ckpt = os.path.join(work, "ckpt")

    def sink(batch: DataFrame, _bid: int) -> None:
        batch.write.mode("append").parquet(out_dir)

    def run_phase(n_files: int) -> list:
        """Move pending files into the source dir, drain, STOP."""
        for f in sorted(glob.glob(os.path.join(work, "pending-*")))[
            :n_files
        ]:
            shutil.move(
                f, os.path.join(src_dir, os.path.basename(f)[8:])
            )
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, event_type string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        deduped = stream.withWatermark(
            "ts", "2 days"
        ).dropDuplicatesWithinWatermark(["event_id"])
        q = (
            deduped.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        drain_stream(q, 300)
        return [p for p in q.recentProgress if p.get("stateOperators")]

    from hyppo_worker_spark.session import scoped_conf

    with scoped_conf(spark, "spark.sql.shuffle.partitions", "4"):
        prog1 = run_phase(2)  # blk0, blk1 — then the query STOPS
        prog2 = run_phase(2)  # blk2, blk3 under a NEW query, same ckpt

    # batch ids continue across the restart: phase 1 consumed 2 files
    # (batch ids 0,1), so the resumed query's first data batch is 2
    batch_ids_2 = [p["batchId"] for p in prog2]
    continued = bool(batch_ids_2) and min(batch_ids_2) >= 2
    last_state = prog2[-1]["stateOperators"][0]["numRowsTotal"]
    n_orig = ev.count()
    bounded = 0 <= last_state < n_orig // 2
    ok = continued and bounded

    return (
        spark.read.parquet(out_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_id").alias("n_ids"),
        )
        .withColumn("resumed_and_bounded", F.lit(ok))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# p24 — native STREAMING session windows: `session_window` in a
# streaming aggregation runs the merging-session state operator —
# state rows are mutable [start, last+gap) ranges that MERGE when a
# new event's range overlaps, and a session closes (emits, in append
# mode) only when the watermark passes its end. None of the other
# streaming rows touch this operator (q63 is the BATCH session
# window; p15 hand-rolls funnel sessions in applyInPandasWithState).
# Cross-batch merging is exercised for real: sessions spanning a
# block boundary arrive in two pieces and must merge before close
# (the 2-day watermark holds them open across the file boundary).
# A far-future sentinel (p20's trick) closes every session before
# the stream ends, making the batch gaps-and-islands oracle exact:
# new session iff the gap is STRICTLY > 6 h — Spark merges session
# ranges that overlap OR TOUCH (new.start <= prev.end), so two
# events exactly 6 h apart share a session (pinned by
# test_session_window_property.py). Durations ride integer epoch
# seconds. Reference: SURVEY.md §2.4 windows — sessionization is the
# reference's session operator surface expressed stream-natively.
# --------------------------------------------------------------------------
@register(
    "p24_streaming_session_windows",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               lag(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_ts
        FROM events
    ),
    marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN prev_ts IS NULL
                         OR ts - prev_ts > INTERVAL 6 HOUR
                    THEN 1 ELSE 0 END AS new_sess
        FROM ordered
    ),
    sess AS (
        SELECT user_id, ts,
               sum(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS sid
        FROM marked
    ),
    per_session AS (
        SELECT user_id, sid,
               min(ts) AS s_start, max(ts) AS s_end,
               count(*) AS n_ev,
               -- Spark's unix_timestamp TRUNCATES each endpoint to
               -- whole seconds; DuckDB's epoch() keeps microseconds,
               -- so floor both endpoints BEFORE differencing
               CAST(floor(epoch(max(ts))) AS BIGINT)
               - CAST(floor(epoch(min(ts))) AS BIGINT) AS dur
        FROM sess GROUP BY user_id, sid
    )
    SELECT strftime(s_start, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(n_ev) AS BIGINT) AS n_events,
           CAST(sum(dur) AS BIGINT) AS dur_s
    FROM per_session GROUP BY day ORDER BY day
    """,
    tags=("pipeline", "streaming", "session-window", "watermark"),
)
def p24_streaming_session_windows(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-user 6-hour-gap sessions built by the streaming
    session_window operator over three time-ordered blocks (sessions
    spanning a boundary merge across batches), closed by a sentinel
    watermark push; the per-day rollup must equal the batch
    gaps-and-islands oracle."""
    import glob
    import os
    import shutil
    import time

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    max_ts = ev.agg(F.max(F.col("ts").cast("timestamp"))).collect()[0][0]
    base = ev.select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
    )

    work = tempfile.mkdtemp(prefix="hyppo-p24-")
    src_dir = os.path.join(work, "events")
    os.makedirs(src_dir)
    now = time.time()
    blk = F.least(
        (F.dayofmonth("ts") - 1) / F.lit(10), F.lit(2)
    ).cast("int")
    # sentinel: advances the watermark past every session's end so
    # append mode emits ALL sessions before the stream terminates;
    # staged as blk=3 so ONE partitioned write materializes all four
    # time-ordered files (the p26 staging cut, r9 profile)
    sent = spark.range(1).select(
        F.lit(-1).cast("long").alias("event_id"),
        (F.lit(max_ts) + F.expr("INTERVAL 30 DAYS")).alias("ts"),
        F.lit(-1).cast("long").alias("user_id"),
    )
    staged = base.withColumn("blk", blk).unionByName(
        sent.withColumn("blk", F.lit(3))
    )
    stage_dir = os.path.join(work, "stage")
    staged.coalesce(1).write.partitionBy("blk").parquet(stage_dir)
    _move_staged_blocks(stage_dir, src_dir, now, 4, sentinel=True)

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    sessions = (
        stream.withWatermark("ts", "2 days")
        .groupBy(
            F.session_window("ts", "6 hours").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_ev"),
            F.min("ts").alias("s_start"),
            F.max("ts").alias("s_end"),
        )
        .select("user_id", "n_ev", "s_start", "s_end")
    )

    out_dir = os.path.join(work, "sessions")

    def sink(batch: DataFrame, _bid: int) -> None:
        batch.write.mode("append").parquet(out_dir)

    from hyppo_worker_spark.session import scoped_conf

    # 4 state partitions: merging-session store commits dominate the
    # trigger task-time at test scale (r9 profile, p26 precedent); at
    # 100 TB this knob goes UP and freezes into the checkpoint.
    with scoped_conf(spark, "spark.sql.shuffle.partitions", "4"):
        q = (
            sessions.writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        drain_stream(q, 300)

    return (
        spark.read.parquet(out_dir)
        .filter(F.col("user_id") != -1)  # drop the sentinel's session
        .dropDuplicates(["user_id", "s_start"])  # idempotent re-read
        .groupBy(F.date_format("s_start", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("n_ev").alias("n_events"),
            F.sum(
                F.unix_timestamp("s_end") - F.unix_timestamp("s_start")
            ).alias("dur_s"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# p25 — the connector STREAMING loop end-to-end: the reference's worker
# polling cycle (SURVEY §3.2 WorkerFSM poll → fetch → persist → ack) as
# ONE Structured Streaming query over the Python DataSource API — the
# task-log stream source (`IntegrationStreamReader`, offsets = consumed
# line counts) feeding the per-epoch manifest stream sink
# (`IntegrationStreamWriter`, exactly-once visibility by epoch id).
# Three coordinator "waves" append tasks to the log; each wave is
# drained by a NEW availableNow query over the SAME checkpoint, so the
# offset log must hand each drain exactly the new slice. A fourth
# drain with no new tasks must ingest nothing. Exactly-once is
# asserted in-plan: the read-back must contain zero duplicate
# (task_id, seq) pairs. Tasks derive from `nation` (task_id =
# n_nationkey, day/n_rows arithmetic-derived), so the DuckDB oracle
# regenerates every fetched row with LATERAL unnest(range(...)) — the
# fetcher's score formula (seq*7 + task_id) % 100 is stated verbatim.
# Reference: FetchRawData/PersistProcessedData cycle
# (ProcessRawDataOperation.java:73-80) run as a stream instead of a
# request loop.
# --------------------------------------------------------------------------
@register(
    "p25_connector_streaming_loop",
    oracle="""
    WITH t AS (
        SELECT n_nationkey AS task_id,
               '2024-01-0' || CAST(n_nationkey % 7 + 1 AS VARCHAR) AS day,
               3 + (n_nationkey % 5) AS n_rows
        FROM nation
    ),
    r AS (
        SELECT task_id, day, u.seq
        FROM t, LATERAL unnest(range(0, n_rows)) AS u(seq)
    )
    SELECT day,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT task_id) AS BIGINT) AS n_tasks,
           CAST(sum((seq * 7 + task_id) % 100) AS BIGINT) AS score_sum,
           TRUE AS exactly_once
    FROM r GROUP BY day ORDER BY day
    """,
    tags=("pipeline", "streaming", "connector", "datasource", "manifest"),
)
def p25_connector_streaming_loop(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Nation-derived ingestion tasks appended to a task log in three
    waves, each drained through the streaming Python DataSource into
    the per-epoch manifest sink over one shared checkpoint; the
    checksum-verified read-back must exactly equal the oracle's
    regenerated rows, with zero duplicates across drains."""
    import json
    import os

    from hyppo_worker_spark.sources.integration_source import (
        read_committed,
        register_integration_source,
    )

    register_integration_source(spark)
    nat = load_tables(spark, sf_dir, ("nation",))["nation"]
    # bounded control-plane pull: 25 nation rows become the task list
    keys = sorted(r[0] for r in nat.select("n_nationkey").collect())
    tasks = [
        {
            "task_id": int(k),
            "day": f"2024-01-0{int(k) % 7 + 1}",
            "n_rows": 3 + int(k) % 5,
        }
        for k in keys
    ]

    work = tempfile.mkdtemp(prefix="hyppo-p25-")
    task_log = os.path.join(work, "task_log.jsonl")
    out = os.path.join(work, "persisted")
    ckpt = os.path.join(work, "ckpt")
    schema = "task_id int, day string, seq int, name string, score int"
    fetcher = (
        "hyppo_worker_spark.sources.integration_source"
        ":synthetic_events_fetcher"
    )

    def drain_new_tasks() -> None:
        stream = (
            spark.readStream.format("hyppo_integration")
            .schema(schema)
            .option("fetcher", fetcher)
            .option("task_log", task_log)
            .load()
        )
        q = (
            stream.writeStream.format("hyppo_integration")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        drain_stream(q, 300)

    # three coordinator waves + one empty poll over the same checkpoint
    for wave in range(3):
        with open(task_log, "a", encoding="utf-8") as fh:
            for t in tasks:
                if t["task_id"] % 3 == wave:
                    fh.write(json.dumps(t) + "\n")
        drain_new_tasks()
    drain_new_tasks()  # no new tasks: must ingest nothing

    back = read_committed(
        spark,
        out,
        "task_id long, day string, seq long, name string, score long",
    ).transform(tracked_persist)
    n_total, n_distinct = back.agg(
        F.count(F.lit(1)),
        F.count_distinct("task_id", "seq"),
    ).collect()[0]
    exactly_once = bool(n_total == n_distinct == sum(t["n_rows"] for t in tasks))

    return (
        back.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("task_id").alias("n_tasks"),
            F.sum("score").alias("score_sum"),
        )
        .withColumn("exactly_once", F.lit(exactly_once))
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# p26 — CHAINED stateful operators in ONE streaming query (Spark 3.5+
# multiple-stateful-operator support): a watermarked stream-stream
# time-interval join whose output flows DIRECTLY into a tumbling
# 1-day window aggregation, both operators in the same micro-batch
# plan — no intermediate sink. p18 proved the join and aggregated in
# batch afterwards; here the rollup itself is stateful-streaming
# (windows emit in append mode only when the propagated watermark —
# join-delta-adjusted by Spark's watermark propagation — passes each
# window end). Far-future sentinel rows on BOTH sides (p20's trick,
# user_id -1 so they never join) force every window closed before the
# stream drains. In-plan assertion: the final progress entry must
# show exactly TWO stateOperators (symmetric hash join + window agg).
# Oracle: the equivalent batch range join + per-view-day rollup.
# Money rides integer cents (floor(value*100+0.5) stated verbatim on
# both sides, p18 precedent).
# --------------------------------------------------------------------------
@register(
    "p26_chained_stateful_rollup",
    oracle="""
    WITH v AS (
        SELECT event_id AS vid, user_id, ts AS vts
        FROM events WHERE event_type = 'view'
    ),
    p AS (
        SELECT event_id AS pid, user_id, ts AS pts,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    pairs AS (
        SELECT v.vid, v.vts, p.cents
        FROM v JOIN p ON v.user_id = p.user_id
            AND p.pts >= v.vts
            AND p.pts <= v.vts + INTERVAL 2 HOUR
    )
    SELECT strftime(vts, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(cents) AS BIGINT) AS cents,
           CAST(max(cents) AS BIGINT) AS max_cents,
           TRUE AS two_state_ops
    FROM pairs GROUP BY day ORDER BY day
    """,
    tags=("pipeline", "streaming", "chained-stateful", "stream-stream-join",
          "window", "watermark"),
)
def p26_chained_stateful_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Views joined to purchases inside Structured Streaming and rolled
    up to per-day pair counts/cents by a second stateful operator in
    the same query; the emitted windows must equal the batch
    range-join rollup, with exactly two state operators in-plan."""
    import glob
    import os
    import shutil
    import time

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    max_ts = ev.agg(F.max(F.col("ts").cast("timestamp"))).collect()[0][0]
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("vid"),
        F.col("user_id").alias("vuser"),
        F.col("ts").cast("timestamp").alias("vts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("puser"),
        F.col("ts").cast("timestamp").alias("pts"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )

    work = tempfile.mkdtemp(prefix="hyppo-p26-")
    now = time.time()
    dirs = {}
    for label, df, cols in (
        ("views", views, ("vid", "vuser", "vts")),
        ("purchases", purchases, ("pid", "puser", "pts", "cents")),
    ):
        src = os.path.join(work, label)
        os.makedirs(src)
        ts_col = cols[2]
        blk = F.least(
            (F.dayofmonth(ts_col) - 1) / F.lit(10), F.lit(2)
        ).cast("int")
        # sentinel: never joins (user -1) but advances this side's
        # watermark past every window end before the stream drains;
        # staged as blk=3 so ONE partitioned write materializes all
        # four time-ordered files (the itemized r9 profile showed the
        # original 4-jobs-per-side staging cost more than the stream)
        sent = [
            F.lit(-1).cast("long").alias(cols[0]),
            F.lit(-1).cast("long").alias(cols[1]),
            (F.lit(max_ts) + F.expr("INTERVAL 30 DAYS")).alias(ts_col),
        ]
        if label == "purchases":
            sent.append(F.lit(0).cast("long").alias("cents"))
        staged = df.withColumn("blk", blk).unionByName(
            spark.range(1).select(*sent).withColumn("blk", F.lit(3))
        )
        stage_dir = os.path.join(work, f"stage-{label}")
        staged.coalesce(1).write.partitionBy("blk").parquet(stage_dir)
        _move_staged_blocks(stage_dir, src, now, 4, sentinel=True)
        dirs[label] = src

    vstream = (
        spark.readStream.schema("vid long, vuser long, vts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(dirs["views"])
        .withWatermark("vts", "2 days")
    )
    pstream = (
        spark.readStream.schema(
            "pid long, puser long, pts timestamp, cents long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(dirs["purchases"])
        .withWatermark("pts", "2 days")
    )
    rolled = (
        vstream.join(
            pstream,
            (F.col("vuser") == F.col("puser"))
            & (F.col("pts") >= F.col("vts"))
            & (F.col("pts") <= F.col("vts") + F.expr("INTERVAL 2 HOURS")),
            "inner",
        )
        .groupBy(F.window("vts", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("cents").alias("cents"),
            F.max("cents").alias("max_cents"),
        )
    )

    out_dir = os.path.join(work, "rollup")

    def sink(batch: DataFrame, _bid: int) -> None:
        batch.write.mode("append").parquet(out_dir)

    from hyppo_worker_spark.session import scoped_conf

    with scoped_conf(spark, "spark.sql.shuffle.partitions", "4"):
        q = (
            rolled.writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        drain_stream(q, 300)

    prog = [p for p in q.recentProgress if p.get("stateOperators")]
    two_ops = bool(prog) and len(prog[-1]["stateOperators"]) == 2

    return (
        spark.read.parquet(out_dir)
        .dropDuplicates(["w"])  # idempotent re-read guard
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            "n_pairs",
            "cents",
            "max_cents",
        )
        .withColumn("two_state_ops", F.lit(two_ops))
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# p27 — STATE-STORE INTROSPECTION: Spark's state data source reads a
# checkpoint's state stores back as DataFrames (format "statestore",
# plus "state-metadata" for the operator manifest) — the engine's
# debugger for exactly the maintenance state the streaming rows keep.
# A per-(user, event_type) running aggregate (update mode, no
# watermark, so state IS the full aggregate) drains 3 time-ordered
# blocks; then the state itself is read back TWICE — option
# batchId=0 (time-travel: state after the first block only) and the
# final batch — and rolled up per event type. The oracle regenerates
# both snapshots from `events` directly (block membership is the
# same day-of-month decade arithmetic the staging used), so a wrong
# key, a dropped state row, or a stale snapshot all hash-mismatch.
# In-plan: the state-metadata row must show operator stateStoreSave,
# 8 partitions (the scoped stream sizing), batches 0..2. Scale note:
# reading state scales with STATE size, not input — it is the
# observability path for 100 TB checkpoints (RocksDB-backed state
# reads the same way).
# --------------------------------------------------------------------------
@register(
    "p27_state_store_introspection",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type AS etype, ts,
               least((CAST(date_part('day', ts) AS BIGINT) - 1) // 10, 2)
                   AS blk
        FROM events
    ),
    snap0 AS (
        SELECT 'batch0' AS snap, user_id, etype,
               count(*) AS n, max(ts) AS last_ts
        FROM e WHERE blk = 0 GROUP BY user_id, etype
    ),
    snapf AS (
        SELECT 'final' AS snap, user_id, etype,
               count(*) AS n, max(ts) AS last_ts
        FROM e GROUP BY user_id, etype
    ),
    u AS (SELECT * FROM snap0 UNION ALL SELECT * FROM snapf)
    SELECT snap, etype,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(n) AS BIGINT) AS n_events,
           strftime(max(last_ts), '%Y-%m-%d %H:%M:%S') AS last_str,
           TRUE AS metadata_ok
    FROM u GROUP BY snap, etype ORDER BY snap, etype
    """,
    tags=("pipeline", "streaming", "statestore", "introspection",
          "time-travel"),
)
def p27_state_store_introspection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Run a per-(user, event_type) running aggregate over 3 streamed
    blocks, then read the checkpoint's state store back at batch 0 and
    at the final batch via the state data source; both snapshots'
    per-type rollups must equal the oracle's regenerated aggregates."""
    import glob
    import os
    import shutil
    import time

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    base = ev.select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        F.col("event_type").alias("etype"),
    )

    work = tempfile.mkdtemp(prefix="hyppo-p27-")
    src = os.path.join(work, "src")
    os.makedirs(src)
    now = time.time()
    blk = F.least(
        (F.dayofmonth("ts") - 1) / F.lit(10), F.lit(2)
    ).cast("int")
    staged = base.withColumn("blk", blk)
    stage_dir = os.path.join(work, "stage")
    staged.coalesce(1).write.partitionBy("blk").parquet(stage_dir)
    _move_staged_blocks(stage_dir, src, now, 3)

    ckpt = os.path.join(work, "ckpt")
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, etype string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = stream.groupBy("user_id", "etype").agg(
        F.count(F.lit(1)).alias("n"), F.max("ts").alias("last_ts")
    )

    def sink(batch: DataFrame, _bid: int) -> None:
        # the state IS the product here, but Spark 4.1's commit
        # tracker requires foreachBatch to consume EVERY partition
        # (limit/show fail with XXKST Missing commits) — noop does
        batch.write.format("noop").mode("append").save()

    from hyppo_worker_spark.session import scoped_conf

    with scoped_conf(spark, "spark.sql.shuffle.partitions", "8"):
        q = (
            agg.writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        drain_stream(q, 300)

    md = spark.read.format("state-metadata").load(ckpt).collect()
    metadata_ok = (
        len(md) == 1
        and md[0]["operatorName"] == "stateStoreSave"
        and md[0]["numPartitions"] == 8
        and md[0]["minBatchId"] == 0
        and md[0]["maxBatchId"] == 2
    )

    def snapshot(label: str, batch_id: int | None) -> DataFrame:
        reader = spark.read.format("statestore")
        if batch_id is not None:
            reader = reader.option("batchId", batch_id)
        return (
            reader.load(ckpt)
            .select(
                F.col("key.user_id").alias("user_id"),
                F.col("key.etype").alias("etype"),
                F.col("value.count").alias("n"),
                F.col("value.max").alias("last_ts"),
            )
            .withColumn("snap", F.lit(label))
        )

    both = snapshot("batch0", 0).unionByName(snapshot("final", None))
    return (
        both.groupBy("snap", "etype")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("n").alias("n_events"),
            F.date_format(
                F.max("last_ts"), "yyyy-MM-dd HH:mm:ss"
            ).alias("last_str"),
        )
        .withColumn("metadata_ok", F.lit(metadata_ok))
        .orderBy("snap", "etype")
    )


# --------------------------------------------------------------------------
# p28 — REBALANCE-on-write: the small-files control for partitioned
# sinks. A partitionBy(key) write from an N-task stage emits up to
# N x |keys| files (every task opens a writer per key it holds); the
# REBALANCE hint lets AQE re-target the pre-write exchange at the
# advisory partition size — merging undersized partitions AND
# splitting oversized ones (OptimizeSkewInRebalancePartitions), so a
# hot key cannot produce one giant file either. Measured here:
# 32-task naive write = 160 files for 5 event types; rebalanced = 5.
# At 100 TB this is the difference between a manifest of millions of
# KB-sized files (every downstream scan pays per-file open cost) and
# advisory-sized files per partition — the sink-side twin of q50's
# read-side layout story. Evidence is filesystem-factual (file
# counts, asserted in-plan as a literal column) and the rebalanced
# zone must read back value-identical to the source. Reference:
# PersistProcessedDataOperation writes one blob per task
# (reference file layout); Spark's partitioned-parquet zone needs
# this rebalance to keep that per-task discipline at scale.
# --------------------------------------------------------------------------
@register(
    "p28_rebalance_write",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents,
           TRUE AS files_balanced
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("pipeline", "sink", "rebalance", "small-files", "aqe"),
)
def p28_rebalance_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events partitioned by type twice — naive 32-task vs
    REBALANCE-hinted — then read the rebalanced zone back: per-type
    aggregates must equal the source table, and the rebalanced write
    must produce at most one advisory-sized file per type where the
    naive write produced tasks-x-types."""
    import glob
    import os

    ev = load_tables(spark, sf_dir, ("events",))["events"].select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    work = tempfile.mkdtemp(prefix="hyppo-p28-")
    naive_dir = os.path.join(work, "naive")
    reb_dir = os.path.join(work, "rebalanced")
    ev.repartition(32).write.partitionBy("event_type").parquet(naive_dir)
    ev.hint("rebalance", "event_type").write.partitionBy(
        "event_type"
    ).parquet(reb_dir)

    def n_files(path: str) -> int:
        return len(glob.glob(os.path.join(path, "*", "part-*.parquet")))

    n_types = ev.select("event_type").distinct().count()
    # every type coalesced to one advisory-sized file, vs the naive
    # write's per-task-per-type fan-out
    balanced = n_files(reb_dir) <= n_types < n_files(naive_dir)

    return (
        spark.read.parquet(reb_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("event_id").alias("n_ids"),
            F.sum("cents").alias("cents"),
        )
        .withColumn("files_balanced", F.lit(balanced))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# p29 — PARQUET SCHEMA DRIFT across one landing zone: the non-Avro
# twin of p19's evolution story. Integrations evolve; a 100 TB zone
# accumulates files written under different schema VERSIONS, and the
# engine must read them as ONE frame without a rewrite. Orders land
# in two generations inside the same directory: v1 files carry
# (okey, cust, cents); v2 files add the columns (priority, channel).
# The read uses mergeSchema=true (schema union at footer-merge time —
# per-FILE reconciliation, exactly like p19's per-container Schema
# Resolution, so heterogeneous mixes cost one footer pass and zero
# per-row branching); v1 rows surface NULL for the drifted columns.
# In-plan assertions ride literal columns: the merged schema must be
# exactly the 5-column union, and every NULL-priority row must be a
# v1 row (okey % 3 <> 0 — the generation split is arithmetic, which
# is what lets the DuckDB oracle regenerate the expected frame from
# `orders` directly without reading the staged files). Scale note:
# mergeSchema's cost is footer-count-bound; production zones pin the
# union schema in a catalog after first contact — the row proves the
# read semantics that catalog entry encodes.
# --------------------------------------------------------------------------
@register(
    "p29_parquet_schema_drift",
    oracle="""
    WITH staged AS (
        SELECT o_orderkey AS okey, o_custkey AS cust,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
               CASE WHEN o_orderkey % 3 = 0 THEN o_orderpriority END
                   AS priority,
               CASE WHEN o_orderkey % 3 = 0
                    THEN 'ch' || CAST(o_orderkey % 4 AS VARCHAR) END
                   AS channel
        FROM orders
    )
    SELECT coalesce(priority, 'v1-missing') AS priority,
           coalesce(channel, 'v1-missing') AS channel,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT cust) AS BIGINT) AS n_cust,
           CAST(sum(cents) AS BIGINT) AS cents,
           TRUE AS schema_merged,
           TRUE AS nulls_are_v1
    FROM staged
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("pipeline", "formats", "schema-evolution", "mergeSchema",
          "parquet"),
)
def p29_parquet_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two schema generations of orders written into one parquet zone
    (v2 adds priority+channel), read back as one frame via
    mergeSchema; per-(priority, channel) rollups must equal the
    oracle's regenerated split, with the 5-column union schema and
    the NULL-rows-are-v1 invariant asserted in-plan."""
    import os

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    base = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_custkey").alias("cust"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
        F.col("o_orderpriority").alias("priority"),
        F.concat(F.lit("ch"), (F.col("o_orderkey") % 4).cast("string")).alias(
            "channel"
        ),
    )
    work = tempfile.mkdtemp(prefix="hyppo-p29-")
    zone = os.path.join(work, "orders_zone")
    v1 = base.filter(F.col("okey") % 3 != 0).select("okey", "cust", "cents")
    v2 = base.filter(F.col("okey") % 3 == 0)
    v1.write.parquet(zone)  # creates the zone (v1 generation)
    v2.write.mode("append").parquet(zone)  # v2 generation lands beside it

    merged = spark.read.option("mergeSchema", "true").parquet(zone)
    schema_ok = sorted(merged.columns) == [
        "cents", "channel", "cust", "okey", "priority",
    ]
    # bounded pull: one row of two counters proves the NULL pattern
    bad = merged.agg(
        F.sum(
            (
                F.col("priority").isNull() & (F.col("okey") % 3 == 0)
            ).cast("long")
        ).alias("null_v2"),
        F.sum(
            (
                F.col("priority").isNotNull() & (F.col("okey") % 3 != 0)
            ).cast("long")
        ).alias("filled_v1"),
    ).collect()[0]
    nulls_are_v1 = bad["null_v2"] == 0 and bad["filled_v1"] == 0

    return (
        merged.groupBy(
            F.coalesce("priority", F.lit("v1-missing")).alias("priority"),
            F.coalesce("channel", F.lit("v1-missing")).alias("channel"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("cust").alias("n_cust"),
            F.sum("cents").alias("cents"),
        )
        .withColumn("schema_merged", F.lit(schema_ok))
        .withColumn("nulls_are_v1", F.lit(bool(nulls_are_v1)))
        .orderBy("priority", "channel")
    )


# --------------------------------------------------------------------------
# p30 — the PRODUCTION STATE BACKEND end-to-end: the same stateful
# contract the p-suite proves on the default (HDFS-backed in-memory)
# provider, run on RocksDBStateStoreProvider — the backend a 100 TB
# deployment actually uses, because state no longer fits executor
# heap and commits ship as changelogs. A per-(cohort, event_type)
# running aggregate (update mode, no watermark — state IS the
# aggregate) drains 3 time-ordered blocks under the scoped RocksDB
# provider; the checkpoint's FINAL state is then read back through
# the statestore source (p27's path, against RocksDB files this
# time) and rolled up per event type. Two in-plan assertions ride
# literal columns: the final progress entry's state operator must
# report RocksDB custom metrics (rocksdbCommitCompactLatency et al —
# presence proves which provider actually ran), and the state
# read-back must come from the same checkpoint. The oracle
# regenerates the aggregate from `events` directly, so a dropped
# state row or a wrong provider both hash-mismatch. Scale: provider
# choice is per-query-START conf frozen into the checkpoint;
# switching backends mid-stream is a new checkpoint — decided up
# front, exactly like the skew pre-split (NOTES_r8).
# --------------------------------------------------------------------------
@register(
    "p30_rocksdb_state_backend",
    oracle="""
    WITH e AS (
        SELECT user_id % 100 AS cohort, event_type AS etype,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    agg AS (
        SELECT cohort, etype, count(*) AS n, sum(cents) AS cents
        FROM e GROUP BY cohort, etype
    )
    SELECT etype,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(sum(cents) AS BIGINT) AS cents,
           TRUE AS rocksdb_used
    FROM agg GROUP BY etype ORDER BY etype
    """,
    tags=("pipeline", "streaming", "rocksdb", "statestore", "backend"),
)
def p30_rocksdb_state_backend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(cohort, event_type) running aggregate drained under the
    RocksDB state-store provider, its final checkpoint state read
    back via the statestore source and rolled up per type; RocksDB
    custom metrics in the final progress entry prove the provider."""
    import glob
    import os
    import shutil
    import time

    ev = load_tables(spark, sf_dir, ("events",))["events"].select(
        F.col("event_id"),
        F.col("ts").cast("timestamp").alias("ts"),
        (F.col("user_id") % 100).alias("cohort"),
        F.col("event_type").alias("etype"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    work = tempfile.mkdtemp(prefix="hyppo-p30-")
    src_dir = os.path.join(work, "events")
    os.makedirs(src_dir)
    now = time.time()
    blk = F.least((F.dayofmonth("ts") - 1) / F.lit(10), F.lit(2)).cast("int")
    stage_dir = os.path.join(work, "stage")
    ev.withColumn("blk", blk).coalesce(1).write.partitionBy("blk").parquet(
        stage_dir
    )
    _move_staged_blocks(stage_dir, src_dir, now, 3)

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, cohort long, etype string, "
            "cents long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    agg = stream.groupBy("cohort", "etype").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("cents")
    )

    def sink(batch: DataFrame, _bid: int) -> None:
        batch.write.format("noop").mode("append").save()

    from hyppo_worker_spark.session import scoped_conf

    ckpt = os.path.join(work, "ckpt")
    import contextlib

    with contextlib.ExitStack() as stack:
        stack.enter_context(
            scoped_conf(
                spark,
                "spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
            )
        )
        stack.enter_context(
            scoped_conf(spark, "spark.sql.shuffle.partitions", "4")
        )
        q = (
            agg.writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        drain_stream(q, 300)
        # the provider proof: RocksDB-specific custom metrics in the
        # final progress entry's state operator
        progs = [p for p in q.recentProgress if p.get("stateOperators")]
        metrics = (
            progs[-1]["stateOperators"][0].get("customMetrics") or {}
            if progs
            else {}
        )
        rocksdb_used = any(k.startswith("rocksdb") for k in metrics)
        # read the FINAL state back from the RocksDB checkpoint
        # the store's value struct carries the AGG BUFFER field names
        # (count(1) -> `count`, sum(cents) -> `sum`), not the query
        # aliases — the introspection contract p27 documents
        state = (
            spark.read.format("statestore").load(ckpt)
            .select(
                "key.cohort",
                "key.etype",
                F.col("value.count").alias("n"),
                F.col("value.sum").alias("cents"),
            )
        )
        rows = (
            state.groupBy("etype")
            .agg(
                F.count(F.lit(1)).alias("n_keys"),
                F.sum("n").alias("n_events"),
                F.sum("cents").alias("cents"),
            )
            .orderBy("etype")
            .collect()  # ≤ n_event_types rows — bounded pull
        )
    out = local_frame(spark, 
        rows, "etype string, n_keys long, n_events long, cents long"
    )
    return out.withColumn("rocksdb_used", F.lit(bool(rocksdb_used))).orderBy(
        "etype"
    )


# --------------------------------------------------------------------------
# p31 — RIGHT-TO-BE-FORGOTTEN vs TIME TRAVEL: erasure that defeats
# history. p06 proves append-mode snapshots keep every version
# readable forever — which is exactly what a GDPR erasure request
# must overcome: the subject's rows must vanish from EVERY retained
# version, not just the head. `erase_rows` (integration_source.py)
# rewrites each referenced data file once (shared files re-stamped in
# all snapshots that list them), updates every manifest's (rows, md5)
# entries — v1, v2, latest pointer — and keeps the fail-loud
# ordering: data first, manifests second, so a crash in between makes
# read_committed's checksum gate REFUSE half-erased state rather than
# serve it (rerun converges; erasure is idempotent). This row stages
# p06's two-version zone, erases the subject (score % 10 = 3 — the
# oracle can state it), then time-travels to v1, v2 AND the current
# pointer through the checksum-verified read: each must show zero
# subject rows and the exact surviving aggregate the oracle
# regenerates. Scale note: the rewrite loop is per-FILE with no
# cross-file state — it distributes one task per file, the same
# parallelism the original ingestion had.
# --------------------------------------------------------------------------
@register(
    "p31_erasure_vs_time_travel",
    oracle=f"""
    WITH t1(task_id, day, n_rows) AS (VALUES {_P06_TASKS_V1_SQL}),
    t2(task_id, day, n_rows) AS (VALUES {_P03_TASKS_SQL}),
    r1 AS (
        SELECT task_id, (seq * 7 + task_id) % 100 AS score
        FROM t1, LATERAL unnest(range(0, n_rows)) AS u(seq)
    ),
    r2 AS (
        SELECT task_id, (seq * 7 + task_id) % 100 AS score
        FROM t2, LATERAL unnest(range(0, n_rows)) AS u(seq)
    ),
    erased AS (SELECT count(*) AS n FROM r2 WHERE score % 10 = 3),
    per AS (
        SELECT 'current' AS label, count(*) AS n_rows,
               CAST(sum(score) AS BIGINT) AS sum_score
        FROM r2 WHERE score % 10 <> 3
        UNION ALL
        SELECT 'v1', count(*), CAST(sum(score) AS BIGINT)
        FROM r1 WHERE score % 10 <> 3
        UNION ALL
        SELECT 'v2', count(*), CAST(sum(score) AS BIGINT)
        FROM r2 WHERE score % 10 <> 3
    )
    SELECT label, n_rows, sum_score,
           CAST(0 AS BIGINT) AS n_subject_left,
           (SELECT CAST(n AS BIGINT) FROM erased) AS n_erased_total,
           TRUE AS checksums_verified
    FROM per ORDER BY label
    """,
    tags=("pipeline", "manifest", "erasure", "gdpr", "time-travel",
          "versioning"),
)
def p31_erasure_vs_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erase the data subject (score % 10 = 3) from a two-version
    manifest zone, then time-travel to v1, v2 and the current pointer
    through checksum-verified reads: zero subject rows anywhere, the
    surviving aggregates exact, every manifest re-stamped."""
    import json
    import os

    from hyppo_worker_spark.sources.integration_source import (
        FORMAT_NAME,
        erase_rows,
        read_committed,
        register_integration_source,
    )

    register_integration_source(spark)

    def fetched(tasks):
        return (
            spark.read.format(FORMAT_NAME)
            .schema("task_id int, day string, seq int, name string, score int")
            .option(
                "fetcher",
                "hyppo_worker_spark.sources.integration_source:"
                "synthetic_events_fetcher",
            )
            .option("tasks", json.dumps(tasks))
            .load()
        )

    out = os.path.join(tempfile.mkdtemp(prefix="hyppo-p31-"), "zone")
    for batch in (_P03_TASKS[:3], _P03_TASKS[3:]):
        fetched(batch).write.format(FORMAT_NAME).option("path", out).mode(
            "append"
        ).save()

    stats = erase_rows(out, lambda rec: rec["score"] % 10 == 3)

    schema = "task_id long, day string, seq long, name string, score long"
    parts = []
    for label, ver in (("current", None), ("v1", 1), ("v2", 2)):
        df = read_committed(spark, out, schema, version=ver)
        parts.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("score").alias("sum_score"),
                F.sum((F.col("score") % 10 == 3).cast("long")).alias(
                    "n_subject_left"
                ),
            ).select(F.lit(label).alias("label"), "*")
        )
    res = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return (
        res.withColumn("n_erased_total", F.lit(stats["rows_erased"]).cast("long"))
        .withColumn(
            "checksums_verified", F.lit(True)  # read_committed is the gate
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# p32 — the NATIVE streaming FILE SINK and its _spark_metadata
# transaction log: every other streaming row commits through
# foreachBatch + this repo's marker committers; Spark's built-in
# parquet stream sink has its OWN exactly-once story — a per-batch
# manifest under <out>/_spark_metadata that batch reads of that path
# HONOR (FileIndex switches to the metadata log when present), so
# readers see only committed files no matter what else is lying in
# the directory. The row proves the mechanism, not just the happy
# path: after the drain an ORPHAN parquet file (poisoned rows, valid
# footer) is PLANTED in the output directory — exactly what a
# crashed task/speculative duplicate leaves behind on a real store —
# and (a) the committed read must not see it (oracle equality on the
# per-type rollup), while (b) a raw glob read of part-files must
# (orphan_visible_raw: the files ARE there; only the log hides
# them). metadata_log_present pins the directory shape. Scale: the
# metadata log is what makes S3-style eventually-listed sinks safely
# readable mid-stream at 100 TB; its cost is one manifest per batch
# (compacted every 10 by default), not per file.
# --------------------------------------------------------------------------
@register(
    "p32_native_file_sink",
    oracle="""
    SELECT event_type AS etype,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents,
           TRUE AS metadata_log_present,
           TRUE AS orphan_ignored,
           TRUE AS orphan_visible_raw
    FROM events
    WHERE value > 0
    GROUP BY etype ORDER BY etype
    """,
    tags=("pipeline", "streaming", "file-sink", "exactly-once",
          "spark-metadata"),
)
def p32_native_file_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain events through Spark's native parquet stream sink, plant
    an orphan part-file beside the committed ones, and prove the
    _spark_metadata log hides it from committed reads (rollup equals
    the oracle) while a raw part-file glob still sees it."""
    import glob
    import os
    import shutil
    import time

    ev = load_tables(spark, sf_dir, ("events",))["events"].select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        F.col("event_type").alias("etype"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        (F.col("value") > 0).alias("keep"),
    )
    work = tempfile.mkdtemp(prefix="hyppo-p32-")
    src_dir = os.path.join(work, "events")
    os.makedirs(src_dir)
    now = time.time()
    blk = F.least((F.dayofmonth("ts") - 1) / F.lit(10), F.lit(2)).cast("int")
    stage_dir = os.path.join(work, "stage")
    ev.withColumn("blk", blk).coalesce(1).write.partitionBy("blk").parquet(
        stage_dir
    )
    _move_staged_blocks(stage_dir, src_dir, now, 3)

    out = os.path.join(work, "sink")
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, etype string, "
            "cents long, keep boolean"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .filter(F.col("keep"))
        .select("event_id", "user_id", "etype", "cents")
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    drain_stream(q, 300)

    # plant the orphan: a valid parquet part-file the sink never
    # committed (what a crashed/speculative task leaves on the store)
    orphan_stage = os.path.join(work, "orphan")
    spark.range(1).select(
        F.lit(-1).cast("long").alias("event_id"),
        F.lit(-1).cast("long").alias("user_id"),
        F.lit("orphan").alias("etype"),
        F.lit(10**9).cast("long").alias("cents"),
    ).coalesce(1).write.parquet(orphan_stage)
    part = glob.glob(os.path.join(orphan_stage, "part-*.parquet"))[0]
    shutil.copy(part, os.path.join(out, os.path.basename(part)))

    meta_present = os.path.isdir(os.path.join(out, "_spark_metadata"))
    committed = spark.read.parquet(out)
    # bounded pulls: two scalar counters prove the invariant both ways
    n_orphan_committed = committed.filter(F.col("etype") == "orphan").count()
    raw = spark.read.schema(committed.schema).parquet(
        os.path.join(out, "part-*.parquet")
    )
    n_orphan_raw = raw.filter(F.col("etype") == "orphan").count()

    return (
        committed.groupBy("etype")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("cents").alias("cents"),
        )
        .withColumn("metadata_log_present", F.lit(bool(meta_present)))
        .withColumn("orphan_ignored", F.lit(n_orphan_committed == 0))
        .withColumn("orphan_visible_raw", F.lit(n_orphan_raw == 1))
        .orderBy("etype")
    )


# --------------------------------------------------------------------------
# p33 — MULTIPLE-WATERMARK POLICY on a stream-stream UNION: when one
# query reads SEVERAL watermarked inputs (union here; joins likewise),
# Spark tracks one watermark PER input and combines them under
# spark.sql.streaming.multipleWatermarkPolicy — default "min", the
# only safe choice: the global watermark advances only as fast as the
# SLOWEST input, so an event that is hopelessly late for the fast
# stream's own watermark is still admitted while the slow stream's
# delay covers it. The row makes that observable both ways: (a)
# behaviorally — stream A (1-hour delay) has already seen end-of-month
# data when a 10-day-late block of A-events arrives; under "min" the
# union's watermark is still held back by stream B (3-day delay,
# mid-month), so the late block lands in the windowed counts, and the
# oracle's full-corpus equality FAILS if they are dropped (which is
# exactly what "max" would do); (b) from the engine's own telemetry —
# the final progress watermark must equal sentinel_ts - 3 days (B's
# delay, the min), 69 hours below what "max" policy would report.
# Scale: at 100 TB the min policy is why one slow region/source stalls
# EVERY window of a fused query — the operational fix is per-source
# queries or catching up the laggard, never flipping to "max" (which
# silently drops the laggard's data); state here stays bounded by the
# min watermark horizon like any single-input query.
# --------------------------------------------------------------------------
@register(
    "p33_multi_watermark_union",
    oracle="""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           event_type,
           count(*) AS n_events,
           TRUE AS watermark_is_min
    FROM events
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("pipeline", "streaming", "watermark", "union", "multi-input"),
)
def p33_multi_watermark_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of a 1-hour-delay and a 3-day-delay stream under the min
    multiple-watermark policy: a block arriving 10 days late for the
    fast stream is still counted, and the final progress watermark
    equals sentinel - 3 days (the min), not sentinel - 1 hour."""
    import datetime
    import os
    import tempfile
    import time

    from hyppo_worker_spark.session import scoped_conf

    ev = load_tables(spark, sf_dir, ("events",))["events"].select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
    )
    max_ts = ev.agg(F.max("ts")).collect()[0][0]  # 1-row bounded pull
    sentinel_ts = max_ts + datetime.timedelta(days=30)

    work = tempfile.mkdtemp(prefix="hyppo-p33-")
    now = time.time()
    day = F.dayofmonth("ts")
    dirs = {}
    for label, rows, blk in (
        # A: even users; the 18th-20th block arrives one trigger LATE
        # (10 days beyond A's own 1-hour watermark by then)
        (
            "a",
            ev.filter(F.col("user_id") % 2 == 0),
            F.when((day >= 18) & (day <= 20), 1).otherwise(0),
        ),
        # B: odd users; mid-month data first, tail second — B's 3-day
        # delay is what holds the union's watermark back
        ("b", ev.filter(F.col("user_id") % 2 == 1), F.when(day > 20, 1).otherwise(0)),
    ):
        sent = spark.range(1).select(
            F.lit(-1).cast("long").alias("event_id"),
            F.lit(sentinel_ts).alias("ts"),
            F.lit(-1).cast("long").alias("user_id"),
            F.lit("signup").alias("event_type"),
        )
        staged = rows.withColumn("blk", blk).unionByName(
            sent.withColumn("blk", F.lit(2))
        )
        src = os.path.join(work, label)
        os.makedirs(src)
        stage_dir = os.path.join(work, f"stage-{label}")
        staged.coalesce(1).write.partitionBy("blk").parquet(stage_dir)
        _move_staged_blocks(stage_dir, src, now, 3)
        dirs[label] = src

    schema = "event_id long, ts timestamp, user_id long, event_type string"
    fast = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dirs["a"])
        .withWatermark("ts", "1 hour")
    )
    slow = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dirs["b"])
        .withWatermark("ts", "3 days")
    )
    agg = (
        fast.unionByName(slow)
        .groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )

    out_dir = os.path.join(work, "counts")

    def sink(batch: DataFrame, _bid: int) -> None:
        batch.write.mode("append").parquet(out_dir)

    # 4 state partitions: test-scale sizing (r9 sweep); the count
    # freezes into the checkpoint, production sizes for peak state
    with scoped_conf(spark, "spark.sql.shuffle.partitions", "4"), scoped_conf(
        spark, "spark.sql.streaming.multipleWatermarkPolicy", "min"
    ):
        q = (
            agg.writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        drain_stream(q, 300)
        progresses = [
            p for p in q.recentProgress
            if p and p.get("eventTime", {}).get("watermark")
        ]

    # telemetry pin: the final global watermark is sentinel - 3 days
    # (the MIN of the two input watermarks), not sentinel - 1 hour.
    # The pin depends on the post-sentinel no-data micro-batch having
    # run (spark.sql.streaming.noDataMicroBatches.enabled, default
    # true) — if no progress entry carries a watermark, report a
    # self-explaining red row instead of dying on progresses[-1].
    if progresses:
        wm_str = progresses[-1]["eventTime"]["watermark"]
        parsed = datetime.datetime.fromisoformat(wm_str.replace("Z", "+00:00"))
        parsed = parsed.replace(tzinfo=None)
        expected = sentinel_ts - datetime.timedelta(days=3)
        wm_is_min = abs((parsed - expected).total_seconds()) < 1.0
    else:
        # no-data-batch precondition missing → the telemetry pin is
        # unverifiable; surface as watermark_is_min=false (red row)
        wm_is_min = False

    res = spark.read.parquet(out_dir)
    return (
        res.select(
            F.date_format(F.col("win.start").cast("date"), "yyyy-MM-dd")
            .alias("day"),
            "event_type",
            F.col("n").cast("long").alias("n_events"),
        )
        .withColumn("watermark_is_min", F.lit(bool(wm_is_min)))
        .orderBy("day", "event_type")
    )


# --------------------------------------------------------------------------
# p34 — MALFORMED-RECORD POLICY on semi-structured ingestion: at corpus
# scale some fraction of JSONL is always broken (truncated uploads,
# mixed producers, encoding bugs), and Spark's three parse modes are
# the contract a pipeline chooses from: PERMISSIVE (default) parses
# what it can and captures the raw line in columnNameOfCorruptRecord —
# the quarantine-and-continue shape; DROPMALFORMED silently sheds bad
# lines (count them or they're gone); FAILFAST refuses the batch —
# the right default for a zone that is SUPPOSED to be clean. The row
# stages a JSONL zone with a deterministic 1-in-13 corruption (the
# tail of the serialized object cut off), runs ALL THREE modes, and
# pins: per-type counts of cleanly-parsed rows (the oracle recomputes
# them from the corruption rule), the PERMISSIVE corrupt-capture count
# == the planted count, DROPMALFORMED's survivor count == the good
# count, and that FAILFAST actually raised. The corrupt-record column
# rides the normal row schema — no second pass over the zone, which is
# the point at 100 TB: quarantine happens IN the ingest scan.
# Mirrors the reference's fail-loud ProcessRawData contract
# (ProcessRawDataOperation.java — malformed input must never silently
# corrupt the processed zone).
# --------------------------------------------------------------------------
@register(
    "p34_malformed_record_policy",
    oracle="""
    WITH good AS (
        SELECT * FROM events WHERE event_id % 13 <> 0
    )
    SELECT event_type,
           count(*) AS n_parsed,
           CAST((SELECT count(*) FROM events WHERE event_id % 13 = 0)
               AS BIGINT) AS n_quarantined,
           TRUE AS permissive_captured_all,
           TRUE AS dropmalformed_matches,
           TRUE AS failfast_raised
    FROM good GROUP BY event_type ORDER BY event_type
    """,
    tags=("pipeline", "ingestion", "malformed", "quarantine", "jsonl"),
)
def p34_malformed_record_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL zone with 1-in-13 truncated lines read under PERMISSIVE /
    DROPMALFORMED / FAILFAST: quarantine counts exact, survivor counts
    equal the corruption rule, FAILFAST raises."""
    import os
    import tempfile

    ev = load_tables(spark, sf_dir, ("events",))["events"].select(
        "event_id", "event_type", F.col("value").cast("double").alias("value")
    )
    line = F.to_json(F.struct("event_id", "event_type", "value"))
    staged = ev.select(
        F.when(
            F.col("event_id") % 13 == 0,
            # cut the serialized object's tail: unparseable, and long
            # enough that no prefix re-closes the object
            F.expr("substring(to_json(struct(event_id, event_type, value)),"
                   " 1, length(to_json(struct(event_id, event_type, value)))"
                   " - 5)"),
        )
        .otherwise(line)
        .alias("value")
    )
    work = tempfile.mkdtemp(prefix="hyppo-p34-")
    zone = os.path.join(work, "jsonl")
    staged.write.mode("overwrite").text(zone)

    schema_good = "event_id long, event_type string, value double"
    schema_perm = schema_good + ", _corrupt_record string"

    permissive = spark.read.schema(schema_perm).option(
        "mode", "PERMISSIVE"
    ).option("columnNameOfCorruptRecord", "_corrupt_record").json(zone)
    # corrupt-capture rows must be counted from a CACHED frame: the
    # JSON source forbids projecting only the corrupt column
    permissive = tracked_persist(permissive)
    n_bad = permissive.filter(F.col("_corrupt_record").isNotNull()).count()
    n_good = permissive.filter(F.col("_corrupt_record").isNull()).count()
    planted = ev.filter(F.col("event_id") % 13 == 0).count()
    captured_all = n_bad == planted

    dropped = spark.read.schema(schema_good).option(
        "mode", "DROPMALFORMED"
    ).json(zone)
    drop_matches = dropped.count() == n_good

    failfast_raised = False
    try:
        spark.read.schema(schema_good).option("mode", "FAILFAST").json(
            zone
        ).count()
    except Exception:
        failfast_raised = True

    return (
        permissive.filter(F.col("_corrupt_record").isNull())
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_parsed"))
        .withColumn("n_quarantined", F.lit(n_bad).cast("long"))
        .withColumn("permissive_captured_all", F.lit(bool(captured_all)))
        .withColumn("dropmalformed_matches", F.lit(bool(drop_matches)))
        .withColumn("failfast_raised", F.lit(bool(failfast_raised)))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------\n# p35 — LATE-DATA ACCOUNTING on the operator that guarantees it:
# p33 proves the min watermark policy ADMITS data a fast stream would
# have dropped; this row pins the other half — data genuinely beyond
# the watermark is DROPPED, silently for the output but NOT for the
# telemetry: every discarded row must appear in the state operator's
# numRowsDroppedByWatermark metric, pinned EXACT against the planted
# late block. The operator choice is load-bearing and was MEASURED,
# not assumed: Spark's docs only promise late data "may or may not"
# be dropped, and for windowed aggregation in append mode the may-not
# is real — a first draft of this row fed a 10-day-late block into a
# window aggregate and the rows were ADMITTED (metric 0), re-opening
# already-evicted windows and emitting them on the next eviction
# sweep (the known append-mode double-finalization hazard).
# StreamingDeduplicateExec, by contrast, filters input against the
# watermark BEFORE touching state and counts what it dropped — so
# dropDuplicates over a watermarked key is the shape whose drop
# accounting a pipeline can actually reconcile. One more measured
# subtlety rides the batch layout: since the SPARK-42376 two-watermark
# split (3.4+), the LATE-EVENT filter for batch N uses the watermark
# in effect DURING batch N-1 (eviction uses the current one) — so the
# filter lags one batch, and a late block arriving in the very next
# batch after the watermark-advancing data is still admitted (a
# 3-batch repro pinned this: drop fires at batch 2, not batch 1).
# The row therefore interposes a REPLAY batch — a deterministic
# subset of batch 0 re-sent — which the dedup removes as duplicates
# (its own contract, also pinned by the oracle's exact counts) while
# carrying the late-filter forward; the late block then lands in
# batch 2 where every row is strictly below the lagged watermark. At
# 100 TB numRowsDroppedByWatermark is the only signal that an
# upstream backfill silently vanished; the aggregation finding above
# is why exactly-once window outputs need a dedup/journal downstream,
# not just append mode. The oracle recomputes both sides from the
# split rule: per-day survivor counts MUST exclude the late block
# (and count each replayed row once) and n_dropped_late must equal
# the late block's size.
# --------------------------------------------------------------------------
@register(
    "p35_late_data_accounting",
    oracle="""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           event_type,
           count(*) AS n_events,
           CAST((SELECT count(*) FROM events WHERE date_part('day', ts) <= 10)
               AS BIGINT) AS n_dropped_late,
           TRUE AS drop_metric_exact
    FROM events
    WHERE date_part('day', ts) >= 11
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("pipeline", "streaming", "watermark", "late-data",
          "observability"),
)
def p35_late_data_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days 1-10 replayed after the watermark has passed month-end:
    dropDuplicates discards every row of the late block before state,
    numRowsDroppedByWatermark equals the block exactly, and the
    surviving per-day counts equal the split rule."""
    import os
    import tempfile
    import time

    from hyppo_worker_spark.session import scoped_conf

    ev = load_tables(spark, sf_dir, ("events",))["events"].select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
    )

    work = tempfile.mkdtemp(prefix="hyppo-p35-")
    src = os.path.join(work, "events")
    os.makedirs(src)
    now = time.time()
    fresh = ev.filter(F.dayofmonth("ts") >= 11)
    # blk1: replay of a deterministic batch-0 subset — removed as
    # DUPLICATES (not late), while advancing the lagged late-filter
    replay = fresh.filter(F.col("event_id") % 17 == 0)
    staged = (
        fresh.withColumn("blk", F.lit(0))
        .unionByName(replay.withColumn("blk", F.lit(1)))
        .unionByName(
            ev.filter(F.dayofmonth("ts") <= 10).withColumn("blk", F.lit(2))
        )
    )
    stage_dir = os.path.join(work, "stage")
    staged.coalesce(1).write.partitionBy("blk").parquet(stage_dir)
    _move_staged_blocks(stage_dir, src, now, 3)

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id", "ts"])
    )

    out_dir = os.path.join(work, "survivors")

    def sink(batch: DataFrame, _bid: int) -> None:
        batch.write.mode("append").parquet(out_dir)

    with scoped_conf(spark, "spark.sql.shuffle.partitions", "4"):
        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        drain_stream(q, 300)
        dropped_metric = sum(
            op.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            if p
            for op in p.get("stateOperators", [])
        )

    planted_late = ev.filter(F.dayofmonth("ts") <= 10).count()
    metric_exact = int(dropped_metric) == planted_late

    res = spark.read.parquet(out_dir)
    return (
        res.groupBy(
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias(
                "day"
            ),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .withColumn("n_dropped_late", F.lit(int(dropped_metric)).cast("long"))
        .withColumn("drop_metric_exact", F.lit(bool(metric_exact)))
        .orderBy("day", "event_type")
    )


# --------------------------------------------------------------------------
# p36 — RocksDB CHANGELOG CHECKPOINTING, the production lever p30's
# backend row leaves on the table: by default every micro-batch
# uploads a full RocksDB snapshot of each state partition — O(state)
# per trigger, the dominant commit cost once state outgrows batches
# (the same write-amplification argument as the bucketed committer's
# crossover, NOTES_r8). With
# stateStore.rocksdb.changelogCheckpointing.enabled the per-trigger
# upload becomes the batch's CHANGELOG (O(delta)), and snapshots
# upload in the background every N batches; recovery = last snapshot
# + changelog replay. The row proves all three legs from the engine:
# (a) the checkpoint's state directories contain *.changelog files
# (the per-batch delta artifacts); (b) a SECOND availableNow query
# over the SAME checkpoint — i.e. a restart whose state must come
# from snapshot+changelog replay — ingests one more block and lands
# on exactly the full-corpus aggregate (the oracle equality IS the
# recovery proof); (c) RocksDB custom metrics in the resumed query's
# progress pin the provider. At 100 TB this is the difference between
# shipping terabytes of snapshot per trigger and shipping the batch's
# own delta; the cost is replay depth on recovery, bounded by the
# snapshot interval (default every ~100 batches... minLogSizeForSnapshot
# governs), which is the knob SCALE.md's state-sizing rule inherits.
# --------------------------------------------------------------------------
@register(
    "p36_rocksdb_changelog_checkpoint",
    oracle="""
    SELECT event_type AS etype,
           count(DISTINCT user_id % 100) AS n_keys,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents,
           TRUE AS changelog_files_present,
           TRUE AS rocksdb_used
    FROM events
    GROUP BY event_type ORDER BY etype
    """,
    tags=("pipeline", "streaming", "rocksdb", "changelog", "checkpoint",
          "state-backend"),
)
def p36_rocksdb_changelog_checkpoint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Running (cohort, etype) aggregate under RocksDB with changelog
    checkpointing: *.changelog artifacts present, a restarted query
    recovers by snapshot+changelog replay and lands on the exact
    full-corpus rollup, RocksDB metrics pin the provider."""
    import contextlib
    import glob
    import os
    import shutil
    import tempfile
    import time

    from hyppo_worker_spark.session import scoped_conf

    ev = load_tables(spark, sf_dir, ("events",))["events"].select(
        F.col("event_id"),
        F.col("ts").cast("timestamp").alias("ts"),
        (F.col("user_id") % 100).alias("cohort"),
        F.col("event_type").alias("etype"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    work = tempfile.mkdtemp(prefix="hyppo-p36-")
    hold = os.path.join(work, "hold")
    src_dir = os.path.join(work, "events")
    os.makedirs(hold)
    os.makedirs(src_dir)
    now = time.time()
    day = F.dayofmonth("ts")
    blk = (
        F.when(day <= 10, 0)
        .when(day <= 20, 1)
        .when(day <= 25, 2)
        .otherwise(3)
    )
    stage_dir = os.path.join(work, "stage")
    ev.withColumn("blk", blk).coalesce(1).write.partitionBy("blk").parquet(
        stage_dir
    )
    _move_staged_blocks(stage_dir, hold, now, 4)
    for i in range(3):
        shutil.move(
            os.path.join(hold, f"batch{i}.parquet"),
            os.path.join(src_dir, f"batch{i}.parquet"),
        )

    schema = (
        "event_id long, ts timestamp, cohort long, etype string, cents long"
    )

    def start(ckpt: str):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        agg = stream.groupBy("cohort", "etype").agg(
            F.count(F.lit(1)).alias("n"), F.sum("cents").alias("cents")
        )
        return (
            agg.writeStream.outputMode("update")
            .foreachBatch(
                lambda b, _bid: b.write.format("noop").mode("append").save()
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    ckpt = os.path.join(work, "ckpt")
    with contextlib.ExitStack() as stack:
        for key, val in {
            "spark.sql.streaming.stateStore.providerClass":
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled": "true",
            "spark.sql.shuffle.partitions": "4",
        }.items():
            stack.enter_context(scoped_conf(spark, key, val))
        drain_stream(start(ckpt), 300)
        # the delta artifacts: per-batch *.changelog files in the
        # checkpoint's state directories
        changelogs = glob.glob(
            os.path.join(ckpt, "state", "**", "*.changelog"), recursive=True
        )
        # restart over the SAME checkpoint with one more block — the
        # store must rebuild from snapshot + changelog replay
        shutil.move(
            os.path.join(hold, "batch3.parquet"),
            os.path.join(src_dir, "batch3.parquet"),
        )
        q2 = start(ckpt)
        drain_stream(q2, 300)
        progs = [p for p in q2.recentProgress if p.get("stateOperators")]
        metrics = (
            progs[-1]["stateOperators"][0].get("customMetrics") or {}
            if progs
            else {}
        )
        rocksdb_used = any(k.startswith("rocksdb") for k in metrics)
        state = (
            spark.read.format("statestore")
            .load(ckpt)
            .select(
                "key.etype",
                F.col("value.count").alias("n"),
                F.col("value.sum").alias("cents"),
            )
        )
        rows = (
            state.groupBy("etype")
            .agg(
                F.count(F.lit(1)).alias("n_keys"),
                F.sum("n").alias("n_events"),
                F.sum("cents").alias("cents"),
            )
            .withColumn(
                "changelog_files_present", F.lit(len(changelogs) > 0)
            )
            .withColumn("rocksdb_used", F.lit(bool(rocksdb_used)))
            .orderBy("etype")
        ).collect()  # 5 event-type rows — bounded pull
    out = local_frame(spark, 
        rows,
        "etype string, n_keys long, n_events long, cents long, "
        "changelog_files_present boolean, rocksdb_used boolean",
    )
    return out.orderBy("etype")


# --------------------------------------------------------------------------
# p37 — the STATE-SCHEMA FREEZE, pinned as a fail-loud contract: a
# streaming aggregation's state value layout (the agg buffer struct)
# freezes into the checkpoint at first start — SCALE.md's recurring
# "the count/shape freezes into the checkpoint" rule, which until now
# the suite only stated. The row proves the guard from the engine: the
# same query restarted over the same checkpoint with ONE added
# aggregate (max) must die with
# STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE (stateSchemaCheck, SQLSTATE
# XXKST) — and restarting with the ORIGINAL shape then resumes cleanly
# and lands on the exact full-corpus rollup, read back through the
# statestore source (the introspection contract: buffer field names
# count/sum, not query aliases). One measured subtlety documented: the
# guard is consulted only when a batch actually EXECUTES a stateful
# operator — a restart with no new data runs zero batches and
# "succeeds" with the wrong schema (measured on 4.1), so a schema
# mistake can sit latent until the next file arrives; deployment
# checks must validate the plan against the checkpoint's
# state-metadata (p27's reader), not rely on a smoke start. At 100 TB
# this guard is what stands between an innocent-looking query edit and
# silently misread state; the sanctioned evolution paths are a new
# checkpoint + backfill, or transformWithState's versioned encoders.
# --------------------------------------------------------------------------
@register(
    "p37_state_schema_guard",
    oracle="""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents,
           TRUE AS schema_guard_fired
    FROM events GROUP BY 1 ORDER BY 1
    """,
    tags=("pipeline", "streaming", "state-schema", "checkpoint",
          "fail-loud"),
)
def p37_state_schema_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed aggregate restarted with one added agg column must die
    on STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE; the original shape
    then resumes and the final state equals the full-corpus rollup."""
    import contextlib
    import os
    import shutil
    import tempfile
    import time

    from hyppo_worker_spark.session import scoped_conf

    ev = load_tables(spark, sf_dir, ("events",))["events"].select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    work = tempfile.mkdtemp(prefix="hyppo-p37-")
    hold = os.path.join(work, "hold")
    src = os.path.join(work, "events")
    os.makedirs(hold)
    os.makedirs(src)
    now = time.time()
    day = F.dayofmonth("ts")
    blk = F.when(day <= 10, 0).when(day <= 20, 1).otherwise(2)
    stage_dir = os.path.join(work, "stage")
    ev.withColumn("blk", blk).coalesce(1).write.partitionBy("blk").parquet(
        stage_dir
    )
    _move_staged_blocks(stage_dir, hold, now, 3)
    for i in range(2):
        shutil.move(
            os.path.join(hold, f"batch{i}.parquet"),
            os.path.join(src, f"batch{i}.parquet"),
        )

    ckpt = os.path.join(work, "ckpt")

    def start(extended: bool):
        stream = (
            spark.readStream.schema("event_id long, ts timestamp, cents long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        aggs = [
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("cents"),
        ]
        if extended:
            aggs.append(F.max("cents").alias("mx"))
        agg = stream.groupBy(F.window("ts", "1 day").alias("win")).agg(*aggs)
        return (
            agg.writeStream.outputMode("update")
            .foreachBatch(
                lambda b, _bid: b.write.format("noop").mode("append").save()
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    with contextlib.ExitStack() as stack:
        stack.enter_context(
            scoped_conf(spark, "spark.sql.shuffle.partitions", "4")
        )
        drain_stream(start(False), 300)
        # new data arrives, then the EDITED query restarts — the guard
        # must kill it (with no new data it would run zero batches and
        # never be consulted; see the header comment)
        shutil.move(
            os.path.join(hold, "batch2.parquet"),
            os.path.join(src, "batch2.parquet"),
        )
        guard_fired = False
        try:
            drain_stream(start(True), 300)
        except Exception as e:  # noqa: BLE001 — asserting the class below
            guard_fired = (
                "STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE" in str(e)
            )
        # the original shape resumes over the same checkpoint and
        # processes the pending block exactly once
        drain_stream(start(False), 300)
        state = (
            spark.read.format("statestore")
            .load(ckpt)
            .select(
                F.date_format(
                    F.col("key.window.start").cast("date"), "yyyy-MM-dd"
                ).alias("day"),
                F.col("value.count").alias("n_events"),
                F.col("value.sum").alias("cents"),
            )
        )
        rows = (
            state.groupBy("day")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("cents").alias("cents"),
            )
            .withColumn("schema_guard_fired", F.lit(bool(guard_fired)))
            .orderBy("day")
        ).collect()  # 30 day rows — bounded pull
    return local_frame(spark, 
        rows,
        "day string, n_events long, cents long, schema_guard_fired boolean",
    ).orderBy("day")


# --------------------------------------------------------------------------
# p38 — CHECKPOINT EVOLUTION, the SANCTIONED path: p37 proves the
# state-schema freeze kills an edited query (and that the partition
# count freezes too, p27/SCALE.md); this row proves the recovery every
# team needs the week after they hit that error. The contract: the
# durable record is the RETAINED ZONE, not the checkpoint — a
# checkpoint is a cache of a fold over the zone, so evolving the fold
# (new aggregate column, new state partition count) means building a
# NEW checkpoint by replaying the zone under the new shape, then
# cutting over (blue/green: the old checkpoint stays live and
# readable until the new one has caught up — both are read back here
# through the statestore source, which is also the cutover
# verification a production team would run). Pinned from the engine:
# (a) the backfilled state's (count,sum) per window key equals the old
# checkpoint's EXACTLY (evolution preserves the rollup — a full-outer
# join over both statestore reads with zero mismatched keys); (b) the
# new aggregate (max) is populated in the new state; (c) the
# state-metadata reader shows the partition rescale 4 → 8 (the knob
# p27 pins as frozen per-checkpoint); (d) the final answer equals the
# full-corpus oracle. At 100 TB the backfill is a bounded batch-shaped
# replay (the zone is partition-pruned parquet; availableNow drains it
# at the cluster's own pace), which is why "new checkpoint + backfill"
# — not in-place state surgery — is the sanctioned path. Completes the
# contract named in p37's header comment; the transformWithState
# versioned-encoder twin stays env-gated (protobuf absent, NOTES_r10).
# --------------------------------------------------------------------------
@register(
    "p38_checkpoint_evolution_backfill",
    oracle="""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents,
           CAST(max(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS mx_cents,
           TRUE AS evolution_preserves_rollup,
           TRUE AS partitions_rescaled
    FROM events GROUP BY 1 ORDER BY 1
    """,
    tags=("pipeline", "streaming", "state-schema", "checkpoint",
          "evolution", "backfill"),
)
def p38_checkpoint_evolution_backfill(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Evolve a frozen streaming aggregation by backfilling a NEW
    checkpoint from the retained zone (added max column, 4 → 8 state
    partitions); old and new state are read via the statestore source
    and the old rollup must survive bit-exact."""
    import contextlib
    import os
    import shutil
    import tempfile
    import time

    from hyppo_worker_spark.session import scoped_conf

    ev = load_tables(spark, sf_dir, ("events",))["events"].select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    work = tempfile.mkdtemp(prefix="hyppo-p38-")
    src = os.path.join(work, "events")
    os.makedirs(src)
    now = time.time()
    day = F.dayofmonth("ts")
    blk = F.when(day <= 10, 0).when(day <= 20, 1).otherwise(2)
    stage_dir = os.path.join(work, "stage")
    ev.withColumn("blk", blk).coalesce(1).write.partitionBy("blk").parquet(
        stage_dir
    )
    _move_staged_blocks(stage_dir, src, now, 3)

    def start(ckpt: str, evolved: bool):
        stream = (
            spark.readStream.schema("event_id long, ts timestamp, cents long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        aggs = [
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("cents"),
        ]
        if evolved:
            aggs.append(F.max("cents").alias("mx"))
        agg = stream.groupBy(F.window("ts", "1 day").alias("win")).agg(*aggs)
        return (
            agg.writeStream.outputMode("update")
            .foreachBatch(
                lambda b, _bid: b.write.format("noop").mode("append").save()
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    ckpt_old = os.path.join(work, "ckpt-v1")
    ckpt_new = os.path.join(work, "ckpt-v2")
    with contextlib.ExitStack() as stack:
        stack.enter_context(
            scoped_conf(spark, "spark.sql.shuffle.partitions", "4")
        )
        drain_stream(start(ckpt_old, False), 300)
    with contextlib.ExitStack() as stack:
        # the evolution: new aggregate shape AND a partition rescale —
        # both frozen per-checkpoint, both free on a NEW checkpoint
        stack.enter_context(
            scoped_conf(spark, "spark.sql.shuffle.partitions", "8")
        )
        drain_stream(start(ckpt_new, True), 300)

    def parts(ckpt: str) -> int:
        md = spark.read.format("state-metadata").load(ckpt).collect()
        return int(md[0]["numPartitions"]) if len(md) == 1 else -1

    rescaled = parts(ckpt_old) == 4 and parts(ckpt_new) == 8

    def state(ckpt: str, evolved: bool) -> DataFrame:
        cols = [
            F.date_format(
                F.col("key.window.start").cast("date"), "yyyy-MM-dd"
            ).alias("day"),
            F.col("value.count").alias("n_events"),
            F.col("value.sum").alias("cents"),
        ]
        if evolved:
            cols.append(F.col("value.max").alias("mx_cents"))
        return spark.read.format("statestore").load(ckpt).select(*cols)

    old_s = state(ckpt_old, False)
    new_s = state(ckpt_new, True)
    # cutover verification: every window key agrees on (count, sum)
    # between the old checkpoint and the backfilled one — full outer
    # join so a key present on only one side also counts as a mismatch
    mismatches = (
        old_s.alias("o")
        .join(new_s.alias("n"), on="day", how="full_outer")
        .where(
            F.col("o.n_events").isNull()
            | F.col("n.n_events").isNull()
            | (F.col("o.n_events") != F.col("n.n_events"))
            | (F.col("o.cents") != F.col("n.cents"))
        )
        .count()
    )
    preserved = mismatches == 0
    rows = (
        new_s.withColumn(
            "evolution_preserves_rollup", F.lit(bool(preserved))
        )
        .withColumn("partitions_rescaled", F.lit(bool(rescaled)))
        .orderBy("day")
    ).collect()  # 30 day rows — bounded pull
    shutil.rmtree(work, ignore_errors=True)
    return local_frame(spark, 
        rows,
        "day string, n_events long, cents long, mx_cents long, "
        "evolution_preserves_rollup boolean, partitions_rescaled boolean",
    ).orderBy("day")


# --------------------------------------------------------------------------
# p39 — STREAMING POINT-IN-TIME SCD2 ENRICHMENT: the label-leakage
# guard (q52's temporal join) made continuous, which is the shape
# every feature/training pipeline actually runs — facts arrive as a
# stream and must join the dimension version valid AT EVENT TIME, not
# the current one (today's segment on last month's order is leakage).
# Both legs stream: (1) a CDC update stream maintains the type-2
# customer-segment history through Scd2DimensionSink
# (streaming/scd2_maintenance.py — foreachBatch + scd2_apply + the
# marked-committer staged swap), three generations (T0 initial, T1
# re-segments the %7 keys, T2 re-segments the %14 keys); (2) the
# order-fact stream then enriches per micro-batch against a BROADCAST
# of that history with the validity-window filter riding the
# equi-join — a plain BroadcastHashJoin inside every batch, and the
# in-plan `stateless` column asserts the progress log reported ZERO
# state operators (p21's discipline: PIT enrichment needs no
# watermark and no state store, because the history table carries the
# time dimension). At 100 TB: the history is dimension-sized (open +
# closed versions), broadcast once per batch; the fact stream never
# shuffles for the join, and history depth costs nothing per batch —
# maintenance cost is O(open dim + batch) per CDC trigger
# (scd2_apply never rescans closed history). Oracle: q52's analytic
# batch temporal join over the drained corpus — segment-at-time from
# key arithmetic and the generation each fact time falls in,
# independent of every operator under test.
# --------------------------------------------------------------------------
_P39_T0, _P39_T1, _P39_T2 = (
    "2024-01-01 00:00:00", "2024-02-01 00:00:00", "2024-03-01 00:00:00",
)
_P39_F1, _P39_F2, _P39_F3 = (
    "2024-01-15 00:00:00", "2024-02-15 00:00:00", "2024-03-15 00:00:00",
)


@register(
    "p39_streaming_scd2_pit_enrichment",
    oracle=f"""
    WITH facts AS (
        SELECT o_orderkey, o_custkey, o_totalprice,
               CASE o_orderkey % 3
                   WHEN 0 THEN '{_P39_F1}'
                   WHEN 1 THEN '{_P39_F2}'
                   ELSE '{_P39_F3}' END AS fact_ts
        FROM orders
    ),
    resolved AS (
        SELECT substr(fact_ts, 1, 7) AS fact_month, o_totalprice,
               CASE
                   WHEN fact_ts < '{_P39_T1}' THEN c.c_mktsegment
                   WHEN fact_ts < '{_P39_T2}' THEN
                       CASE WHEN c.c_custkey % 7 = 0 THEN 'SEGMENT-A'
                            ELSE c.c_mktsegment END
                   ELSE
                       CASE WHEN c.c_custkey % 14 = 0 THEN 'SEGMENT-B'
                            WHEN c.c_custkey % 7 = 0 THEN 'SEGMENT-A'
                            ELSE c.c_mktsegment END
               END AS segment_at_time
        FROM facts f JOIN customer c ON c.c_custkey = f.o_custkey
    )
    SELECT fact_month, segment_at_time,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue,
           TRUE AS stateless
    FROM resolved
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("pipeline", "streaming", "scd2", "temporal-join",
          "point-in-time", "cdc"),
)
def p39_streaming_scd2_pit_enrichment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CDC stream maintains an SCD2 segment history (3 generations);
    an order-fact stream then joins the version valid AT each fact's
    timestamp per micro-batch (stateless broadcast enrichment);
    rollup per (month, segment-at-time) equals the batch temporal
    join."""
    import os
    import time

    from hyppo_worker_spark.session import scoped_conf
    from hyppo_worker_spark.streaming.scd2_maintenance import (
        Scd2DimensionSink,
    )

    tabs = load_tables(spark, sf_dir, ("customer", "orders"))
    cust = tabs["customer"]

    work = tempfile.mkdtemp(prefix="hyppo-p39-")
    now = time.time()

    # -- leg 1: the CDC update stream (3 time-ordered generations) ----
    def gen(df, seg_col, ts: str, blk: int) -> DataFrame:
        return df.select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            seg_col.alias("segment"),
            F.lit(ts).alias("update_ts"),
            F.lit(blk).alias("blk"),
        )

    cdc = (
        gen(cust, F.col("c_mktsegment"), _P39_T0, 0)
        .unionByName(
            gen(
                cust.filter(F.col("c_custkey") % 7 == 0),
                F.lit("SEGMENT-A"), _P39_T1, 1,
            )
        )
        .unionByName(
            gen(
                cust.filter(F.col("c_custkey") % 14 == 0),
                F.lit("SEGMENT-B"), _P39_T2, 2,
            )
        )
    )
    cdc_src = os.path.join(work, "cdc")
    os.makedirs(cdc_src)
    cdc_stage = os.path.join(work, "cdc_stage")
    cdc.coalesce(1).write.partitionBy("blk").parquet(cdc_stage)
    _move_staged_blocks(cdc_stage, cdc_src, now, 3)

    sink = Scd2DimensionSink(
        spark, work, "c_custkey", ["segment"], ts_col="update_ts"
    )
    with scoped_conf(spark, "spark.sql.shuffle.partitions", "4"):
        q1 = (
            spark.readStream.schema(
                "c_custkey long, segment string, update_ts string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(cdc_src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(work, "ckpt_cdc"))
            .trigger(availableNow=True)
            .start()
        )
        drain_stream(q1, 300)

    # -- leg 2: the fact stream, enriched AS OF event time ------------
    facts = tabs["orders"].select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        "o_totalprice",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(_P39_F1))
        .when(F.col("o_orderkey") % 3 == 1, F.lit(_P39_F2))
        .otherwise(F.lit(_P39_F3))
        .alias("fact_ts"),
        (F.col("o_orderkey") % 3).cast("int").alias("blk"),
    )
    fact_src = os.path.join(work, "facts")
    os.makedirs(fact_src)
    fact_stage = os.path.join(work, "fact_stage")
    facts.coalesce(1).write.partitionBy("blk").parquet(fact_stage)
    _move_staged_blocks(fact_stage, fact_src, now, 3)

    hist = sink.history()  # c_custkey, segment, valid_from, valid_to
    stream = (
        spark.readStream.schema(
            "o_orderkey long, o_custkey long, o_totalprice double, "
            "fact_ts string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(fact_src)
    )
    # the PIT join: equi-join on the key, validity window as a join
    # predicate — BroadcastHashJoin per batch, no state, no watermark;
    # ISO strings compare lexicographically == chronologically
    enriched = stream.join(
        F.broadcast(hist),
        (stream.o_custkey == hist.c_custkey)
        & (F.col("valid_from") <= F.col("fact_ts"))
        & (F.col("fact_ts") < F.col("valid_to")),
    ).select(
        "o_orderkey", "fact_ts", "o_totalprice",
        F.col("segment").alias("segment_at_time"),
    )
    out_dir = os.path.join(work, "enriched")
    q2 = (
        enriched.writeStream.foreachBatch(
            lambda b, _bid: b.write.mode("append").parquet(out_dir)
        )
        .option("checkpointLocation", os.path.join(work, "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    drain_stream(q2, 300)
    stateless = all(
        not p.get("stateOperators") for p in q2.recentProgress
    ) and len(q2.recentProgress) > 0

    return (
        spark.read.parquet(out_dir)
        .dropDuplicates(["o_orderkey"])  # idempotent re-read guard
        .groupBy(
            F.substring("fact_ts", 1, 7).alias("fact_month"),
            "segment_at_time",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .withColumn("stateless", F.lit(bool(stateless)))
        .orderBy("fact_month", "segment_at_time")
    )


# --------------------------------------------------------------------------
# p40 — STREAMING BLOOM-MANIFEST ADMISSION: the file-level Bloom index
# (q83) maintained under CONTINUOUS ingest — the missing half of the
# mergeable-membership contract bloom.py documents ("shards never
# re-read each other, their bitmaps just OR"). Each micro-batch lands
# its file groups (per-batch OVERWRITE dirs — replay-idempotent, the
# s13/s17 discipline) and builds its per-group filter FROM THE WRITTEN
# DATA (read path authoritative, q83's index-row rule); the global
# manifest at batch b is the bit_or fold of the per-batch shards —
# never a rescan of earlier data. The point lookup is then replayed AT
# EVERY BATCH BOUNDARY: candidates from the merged manifest become a
# literal partition filter (engine-asserted per batch), and
# no-false-negatives is engine-asserted against the unpruned count of
# the orders that HAD ARRIVED by that batch — the invariant a
# streaming index must hold mid-lifecycle, not just at the end. The
# oracle replays the whole ladder in SQL: cumulative word bitmaps per
# (batch_seq, fid) via bit_or over arrived orders (associativity makes
# per-batch OR == cumulative rebuild), probe positions, the exact
# candidate set (false positives included), and the cumulative
# aggregates. At 100 TB: admission cost is O(batch) + bits/32 longs
# per new file group; earlier groups are never re-read, and a point
# lookup mid-ingest reads n_candidate_groups files, not the zone.
# --------------------------------------------------------------------------
_P40_FIDS, _P40_BITS, _P40_K = 16, 4096, 3


def _p40_oracle() -> str:
    from hyppo_worker_spark.functions.text import md5_bucket_sql
    from hyppo_worker_spark.operators.bloom import bloom_position_sql

    fid = md5_bucket_sql("o_orderkey", _P40_FIDS)
    bseq = md5_bucket_sql("o_orderkey", 3)
    return f"""
    WITH fid AS MATERIALIZED (
        SELECT o_custkey, o_totalprice, {fid} AS fid, {bseq} AS bseq
        FROM orders
    ),
    probes(o_custkey) AS (VALUES (1), (2), (3)),
    seqs(batch_seq) AS (VALUES (0), (1), (2)),
    pos AS (
        SELECT bseq, fid,
               {bloom_position_sql('o_custkey', 'r.i', _P40_BITS)} AS pos
        FROM fid, range({_P40_K}) r(i)
    ),
    words AS MATERIALIZED (
        SELECT s.batch_seq, p.fid, CAST(p.pos // 32 AS INT) AS word,
               CAST(bit_or(CAST(1 AS BIGINT) << CAST(p.pos % 32 AS INT))
                    AS BIGINT) AS bits_w
        FROM seqs s JOIN pos p ON p.bseq <= s.batch_seq
        GROUP BY 1, 2, 3
    ),
    ppos AS (
        SELECT p.o_custkey,
               {bloom_position_sql('p.o_custkey', 'r.i', _P40_BITS)} AS pos
        FROM probes p, range({_P40_K}) r(i)
    ),
    hits AS MATERIALIZED (
        SELECT w.batch_seq, pp.o_custkey, w.fid
        FROM ppos pp
        JOIN words w
          ON w.word = CAST(pp.pos // 32 AS INT)
         AND (w.bits_w & (CAST(1 AS BIGINT) << CAST(pp.pos % 32 AS INT)))
             != 0
        GROUP BY 1, 2, 3
        HAVING count(*) = {_P40_K}
    ),
    nread AS (
        SELECT batch_seq, CAST(count(DISTINCT fid) AS BIGINT)
               AS n_groups_read
        FROM hits GROUP BY 1
    ),
    agg AS (
        SELECT s.batch_seq, f.o_custkey,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(f.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM seqs s
        JOIN fid f ON f.bseq <= s.batch_seq
        JOIN probes USING (o_custkey)
        GROUP BY 1, 2
    )
    SELECT CAST(s.batch_seq AS BIGINT) AS batch_seq,
           CAST(p.o_custkey AS BIGINT) AS o_custkey,
           coalesce(a.n_orders, 0) AS n_orders,
           coalesce(a.revenue_cents, 0) AS revenue_cents,
           coalesce(r.n_groups_read, 0) AS n_groups_read,
           CAST({_P40_FIDS} AS BIGINT) AS n_groups_total,
           TRUE AS plan_pruned, TRUE AS no_false_negatives
    FROM seqs s CROSS JOIN probes p
    LEFT JOIN agg a ON a.batch_seq = s.batch_seq
                   AND a.o_custkey = p.o_custkey
    LEFT JOIN nread r ON r.batch_seq = s.batch_seq
    ORDER BY 1, 2
    """


@register(
    "p40_streaming_bloom_manifest",
    oracle=_p40_oracle(),
    tags=("streaming", "bloom", "data-skipping", "file-index",
          "incremental", "maintenance", "point-lookup"),
)
def p40_streaming_bloom_manifest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-batch Bloom shards built from each micro-batch's WRITTEN
    file groups, OR-merged into the global manifest (never re-reading
    earlier data); point lookups replayed at every batch boundary with
    partition pruning and no-false-negatives engine-asserted
    mid-lifecycle."""
    import os
    import re
    import shutil
    import tempfile
    import time

    from hyppo_worker_spark.functions import text as TX
    from hyppo_worker_spark.operators.bloom import (
        bloom_build,
        bloom_candidates,
    )
    from hyppo_worker_spark.plans.explain import formatted_plan
    from hyppo_worker_spark.session import scoped_conf

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    work = tempfile.mkdtemp(prefix="hyppo-p40-")
    src = os.path.join(work, "stream")
    os.makedirs(src)
    stage = os.path.join(work, "stage")
    (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .withColumn("blk", TX.md5_bucket("o_orderkey", 3).cast("int"))
        .coalesce(1)
        .write.partitionBy("blk")
        .parquet(stage)
    )
    _move_staged_blocks(stage, src, time.time(), 3)

    data_dir = os.path.join(work, "data")
    man_dir = os.path.join(work, "manifest")

    def sink(batch: DataFrame, batch_id: int) -> None:
        bdir = os.path.join(data_dir, f"batch={int(batch_id)}")
        (
            batch.withColumn(
                "fid", TX.md5_bucket("o_orderkey", _P40_FIDS).cast("int")
            )
            .repartition(4, F.col("fid"))
            .write.mode("overwrite")
            .partitionBy("fid")
            .parquet(bdir)
        )
        # the batch's shard filters come from the WRITTEN groups —
        # read path authoritative (q83's index-row discipline)
        written = spark.read.parquet(bdir)
        bloom_build(
            written, "o_custkey",
            bits=_P40_BITS, hashes=_P40_K, shard_col="fid",
        ).write.mode("overwrite").parquet(
            os.path.join(man_dir, f"batch={int(batch_id)}")
        )

    with scoped_conf(spark, "spark.sql.shuffle.partitions", "4"):
        q = (
            spark.readStream.schema(
                "o_orderkey long, o_custkey long, o_totalprice double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        drain_stream(q, 300)

    probes = spark.range(1, 4).select(F.col("id").alias("o_custkey"))
    data_all = spark.read.option("basePath", data_dir).parquet(data_dir)
    # probe-key arrivals per block in ONE unpruned pass (3 rows) —
    # the per-boundary no-false-negatives reference counts are prefix
    # sums of these (guide §1.2: don't rescan the base table per
    # boundary)
    probe_blk_counts = {
        int(r["b"]): int(r["n"])
        for r in orders.join(F.broadcast(probes), "o_custkey")
        .groupBy(TX.md5_bucket("o_orderkey", 3).alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }  # bounded pull: ≤3 rows
    out_rows = []
    for s in range(3):
        # the global manifest at batch s: bit_or fold of the per-batch
        # shards — the mergeable contract, no rescan of earlier data
        merged = (
            spark.read.option("basePath", man_dir)
            .parquet(
                *[os.path.join(man_dir, f"batch={b}") for b in range(s + 1)]
            )
            .groupBy("fid", "word")
            .agg(F.bit_or("bits_w").alias("bits_w"))
        )
        cands = bloom_candidates(
            merged, probes, "o_custkey",
            shard_col="fid", bits=_P40_BITS, hashes=_P40_K,
        )
        fids = sorted(
            {int(r["fid"]) for r in cands.select("fid").distinct().collect()}
        )  # bounded pull: ≤ n_groups ints — the manifest verdict
        pruned = data_all.filter(F.col("batch") <= s).filter(
            F.col("fid").isin(fids)
        )
        rows = (
            pruned.join(F.broadcast(probes), "o_custkey")
            .groupBy("o_custkey")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(
                    F.floor(F.col("o_totalprice") * 100).cast("long")
                ).alias("revenue_cents"),
            )
        )
        plan = formatted_plan(rows)
        pfs = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        plan_pruned = any(
            "fid" in pf and re.search(r"\b(IN|INSET)\b", pf) for pf in pfs
        )
        core = (
            probes.join(rows, "o_custkey", "left")
            .select(
                "o_custkey",
                F.coalesce("n_orders", F.lit(0))
                .cast("long")
                .alias("n_orders"),
                F.coalesce("revenue_cents", F.lit(0))
                .cast("long")
                .alias("revenue_cents"),
            )
            .orderBy("o_custkey")
        ).collect()  # 3 probe rows — bounded pull
        # no false negatives AT THIS BOUNDARY: the pruned read found
        # every probe-key order that had arrived by batch s — the
        # unpruned reference count is the prefix sum of the per-block
        # probe-key counts pulled ONCE before the loop (integers;
        # value-identical to the per-boundary rescan this replaces)
        full_n = sum(n for b, n in probe_blk_counts.items() if b <= s)
        nfn = sum(r["n_orders"] for r in core) == full_n
        for r in core:
            out_rows.append(
                (
                    s, int(r["o_custkey"]), int(r["n_orders"]),
                    int(r["revenue_cents"]), len(fids), _P40_FIDS,
                    bool(plan_pruned), bool(nfn),
                )
            )
    shutil.rmtree(work, ignore_errors=True)
    return local_frame(spark, 
        out_rows,
        "batch_seq long, o_custkey long, n_orders long, "
        "revenue_cents long, n_groups_read long, n_groups_total long, "
        "plan_pruned boolean, no_false_negatives boolean",
    ).orderBy("batch_seq", "o_custkey")


# --------------------------------------------------------------------------
# p41 — STREAMING DELETES INTO DELETION VECTORS: q85's merge-on-read
# layout under a CONTINUOUS retraction feed — the GDPR-trickle /
# late-retraction shape where deletes arrive for years against a
# table that was written once. Each micro-batch of delete requests
# (business keys) is resolved to (fid, pos) against the PERSISTED
# layout ordinals, packed to a bitmap shard, and written to a
# per-batch OVERWRITE dir (replay-idempotent — and bit_or idempotency
# means even a REPLAYED delete is the same bit, the s13/s17/p40
# discipline with algebra doing the dedup). Nothing in the data zone
# is rewritten, ever, on this path. The read is then replayed at
# EVERY batch boundary: folded sidecars ≤ s anti-applied in one
# map-side broadcast join (engine-asserted per boundary), live
# aggregates monotone non-increasing (deletes only remove — the
# no-resurrection invariant), cumulative popcount equal to the
# arrived delete count (no lost and no double-counted bits). Oracle:
# live at s = NOT(retracted AND arrival_block <= s), all md5
# arithmetic. At 100 TB: a delete wave costs O(batch) + its bitmap
# words; the table's files are untouched until q85's density gate
# fires — the write amplification of churn drops from
# rewrite-per-wave to rewrite-per-threshold.
# --------------------------------------------------------------------------
_P41_FIDS = 8


def _p41_oracle() -> str:
    from hyppo_worker_spark.functions.text import md5_bucket_sql

    bseq = md5_bucket_sql("o_orderkey", 3)
    return f"""
    WITH base AS MATERIALIZED (
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               (o_orderkey % 4 = 1) AS retracted,
               {bseq} AS bseq
        FROM orders
    ),
    seqs(batch_seq) AS (VALUES (0), (1), (2)),
    state AS (
        SELECT s.batch_seq, b.o_orderstatus,
               (b.retracted AND b.bseq <= s.batch_seq) AS deleted,
               b.o_totalprice
        FROM seqs s CROSS JOIN base b
    ),
    live AS (
        SELECT batch_seq, o_orderstatus,
               CAST(count(*) FILTER (WHERE NOT deleted) AS BIGINT)
                   AS n_live,
               CAST(coalesce(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                             FILTER (WHERE NOT deleted), 0) AS BIGINT)
                   AS revenue_cents,
               CAST(count(*) FILTER (WHERE deleted) AS BIGINT)
                   AS n_deleted_status
        FROM state GROUP BY 1, 2
    ),
    cum AS (
        SELECT batch_seq,
               CAST(sum(n_deleted_status) AS BIGINT) AS n_deleted_cum
        FROM live GROUP BY 1
    )
    SELECT CAST(l.batch_seq AS BIGINT) AS batch_seq,
           l.o_orderstatus, l.n_live, l.revenue_cents,
           c.n_deleted_cum,
           TRUE AS dv_join_broadcast,
           TRUE AS popcount_equals_arrivals
    FROM live l JOIN cum c USING (batch_seq)
    ORDER BY 1, 2
    """


@register(
    "p41_streaming_deletion_vectors",
    oracle=_p41_oracle(),
    tags=("streaming", "merge-on-read", "deletion-vectors", "delete",
          "incremental", "maintenance", "bitmap"),
)
def p41_streaming_deletion_vectors(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delete requests stream in; each micro-batch resolves business
    keys to persisted layout ordinals, packs a bitmap shard into a
    per-batch overwrite dir, and the merge-on-read aggregate is
    replayed at every batch boundary — broadcast apply
    engine-asserted, cumulative popcount equal to arrived deletes,
    the data zone never rewritten."""
    import os
    import shutil
    import tempfile
    import time

    from hyppo_worker_spark.functions import text as TX
    from hyppo_worker_spark.operators.deletion_vectors import (
        dv_build,
        dv_merge,
        read_with_dv,
        stable_positions,
    )
    from hyppo_worker_spark.plans.explain import formatted_plan
    from hyppo_worker_spark.session import scoped_conf

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    work = tempfile.mkdtemp(prefix="hyppo-p41-")
    data_dir = os.path.join(work, "orders")
    dv_dir = os.path.join(work, "dv")

    # table written ONCE: md5 file groups + persisted ordinals
    shaped = stable_positions(
        orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
        .withColumn(
            "fid", TX.md5_bucket("o_orderkey", _P41_FIDS).cast("int")
        ),
        "fid",
        "o_orderkey",
    )
    (
        shaped.repartition(_P41_FIDS, F.col("fid"))
        .write.partitionBy("fid")
        .mode("overwrite")
        .parquet(data_dir)
    )
    written = spark.read.parquet(data_dir)
    # the delete feed: 25% churn arriving in 3 md5 blocks
    retract = orders.filter(F.col("o_orderkey") % 4 == 1).select(
        "o_orderkey"
    )
    src = os.path.join(work, "stream")
    os.makedirs(src)
    stage = os.path.join(work, "stage")
    (
        retract.withColumn("blk", TX.md5_bucket("o_orderkey", 3).cast("int"))
        .coalesce(1)
        .write.partitionBy("blk")
        .parquet(stage)
    )
    _move_staged_blocks(stage, src, time.time(), 3)

    lookup = written.select("o_orderkey", "fid", "pos")

    def sink(batch: DataFrame, batch_id: int) -> None:
        # resolve business keys -> persisted ordinals, pack, land the
        # shard in a per-batch overwrite dir (replay-idempotent)
        resolved = batch.join(lookup, "o_orderkey").select("fid", "pos")
        dv_build(resolved).write.mode("overwrite").parquet(
            os.path.join(dv_dir, f"batch={int(batch_id)}")
        )

    with scoped_conf(spark, "spark.sql.shuffle.partitions", "4"):
        q = (
            spark.readStream.schema("o_orderkey long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        drain_stream(q, 300)

    # arrivals per block in ONE pass over the delete feed (3 rows)
    # instead of re-scanning the orders-derived feed at every batch
    # boundary (guide §1.2: don't compute things twice) — the
    # cumulative count at boundary s is the prefix sum of the block
    # counts, integers, value-identical to the per-boundary filter
    # counts this replaces
    blk_counts = {
        int(r["b"]): int(r["n"])
        for r in retract.groupBy(
            TX.md5_bucket("o_orderkey", 3).alias("b")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }  # bounded pull: 3 rows
    out_rows = []
    for s in range(3):
        dv = dv_merge(
            *[
                spark.read.parquet(os.path.join(dv_dir, f"batch={b}"))
                for b in range(s + 1)
            ]
        )
        live = read_with_dv(written, dv)
        agg = live.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_live"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100).cast("long")
            ).alias("revenue_cents"),
        )
        plan = formatted_plan(agg)
        dv_broadcast = "BroadcastHashJoin" in plan
        # no lost / double-counted bits: folded popcount == arrivals
        pop = int(
            dv.agg(
                F.sum(F.bit_count("bits_w")).cast("long").alias("n")
            ).collect()[0]["n"]
        )  # bounded pull: 1 row
        arrived = sum(n for b, n in blk_counts.items() if b <= s)
        pop_ok = pop == arrived
        rows = {
            r["o_orderstatus"]: (int(r["n_live"]), int(r["revenue_cents"]))
            for r in agg.collect()
        }  # bounded pull: 3 status rows
        for st in sorted(rows):
            out_rows.append(
                (
                    s, st, rows[st][0], rows[st][1], arrived,
                    bool(dv_broadcast), bool(pop_ok),
                )
            )
    shutil.rmtree(work, ignore_errors=True)
    return local_frame(spark, 
        out_rows,
        "batch_seq long, o_orderstatus string, n_live long, "
        "revenue_cents long, n_deleted_cum long, "
        "dv_join_broadcast boolean, popcount_equals_arrivals boolean",
    ).orderBy("batch_seq", "o_orderstatus")


# --------------------------------------------------------------------------
# p42 — CONTINUOUS classifier refresh: t35's Naive Bayes trainer run
# as a stream. The training corpus arrives as a 3-block md5-split
# stream; each foreachBatch trigger folds the batch's (word, class)
# counts into a per-batch OVERWRITE model ledger (sufficient
# statistics are integer and associative — the s13 incremental-fold
# lesson applied to a MODEL: O(batch + vocab) I/O per trigger, no
# rescan of earlier batches, replay of batch b re-reads ledger b−1
# and rewrites identical bytes) and re-scores the FIXED held-out 20%
# against the model-so-far. The last batch's cumulative counts equal
# t35's one-shot training set by construction, so the stream
# provably CONVERGES to the batch model — the final accuracy_bp is
# pinned to the batch trainer's through the shared integer algebra.
# Per-batch report: train docs seen, vocabulary size, held-out
# predicted-positive / agreement / accuracy basis points — the
# model-quality-over-time curve an online curation pipeline watches.
# --------------------------------------------------------------------------
def _p42_prefix_sql(b: int) -> str:
    """One t35-style scoring block over the train prefix blk <= b."""
    from hyppo_worker_spark.functions.text import md5_bucket_sql
    from hyppo_worker_spark.queries.text_queries import (
        _ml2_sql,
    )

    blk = md5_bucket_sql("CAST(doc_id AS VARCHAR)", 3)
    c0 = _ml2_sql("tot.t0 * 1024 // (tc.f0 + 1)")
    c1 = _ml2_sql("tot.t1 * 1024 // (tc.f1 + 1)")
    p0 = _ml2_sql("nn.n * 1024 // nn.n0")
    p1 = _ml2_sql("nn.n * 1024 // nn.n1")
    return f"""
    tc{b} AS MATERIALIZED (
        SELECT word,
               CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
               CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS f0
        FROM (SELECT unnest(w) AS word, y FROM lab
              WHERE is_test = 0 AND {blk} <= {b})
        GROUP BY 1
    ),
    tot{b} AS (
        SELECT CAST(sum(f1) + count(*) AS BIGINT) AS t1,
               CAST(sum(f0) + count(*) AS BIGINT) AS t0
        FROM tc{b}
    ),
    model{b} AS MATERIALIZED (
        SELECT tc.word,
               CAST({c0.replace('tot.', f'tot{b}.')} AS BIGINT) AS c0,
               CAST({c1.replace('tot.', f'tot{b}.')} AS BIGINT) AS c1
        FROM tc{b} tc, tot{b}
    ),
    nn{b} AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
        FROM lab WHERE is_test = 0 AND {blk} <= {b}
    ),
    prior{b} AS (
        SELECT CAST({p0.replace('nn.', f'nn{b}.')} AS BIGINT) AS p0,
               CAST({p1.replace('nn.', f'nn{b}.')} AS BIGINT) AS p1
        FROM nn{b} nn{b}
    ),
    docscore{b} AS MATERIALIZED (
        SELECT t.doc_id,
               CAST(sum(t.cnt * m.c0) AS BIGINT) AS s0,
               CAST(sum(t.cnt * m.c1) AS BIGINT) AS s1
        FROM ttc t JOIN model{b} m USING (word) GROUP BY 1
    ),
    res{b} AS (
        SELECT CAST({b} AS BIGINT) AS batch_seq,
               (SELECT n FROM nn{b}) AS train_docs,
               (SELECT count(*) FROM tc{b}) AS vocab_size,
               CAST(sum(CASE WHEN coalesce(d.s1, 0) + pr.p1
                                  < coalesce(d.s0, 0) + pr.p0
                             THEN 1 ELSE 0 END) AS BIGINT) AS pred_pos,
               CAST(sum(CASE WHEN (CASE WHEN coalesce(d.s1, 0) + pr.p1
                                             < coalesce(d.s0, 0) + pr.p0
                                        THEN 1 ELSE 0 END) = l.y
                             THEN 1 ELSE 0 END) AS BIGINT) AS agree,
               CAST(sum(CASE WHEN (CASE WHEN coalesce(d.s1, 0) + pr.p1
                                             < coalesce(d.s0, 0) + pr.p0
                                        THEN 1 ELSE 0 END) = l.y
                             THEN 1 ELSE 0 END) * 10000
                    // count(*) AS BIGINT) AS accuracy_bp
        FROM lab l LEFT JOIN docscore{b} d USING (doc_id)
        CROSS JOIN prior{b} pr
        WHERE l.is_test = 1
    )"""


def _p42_oracle() -> str:
    from hyppo_worker_spark.functions.text import md5_bucket_sql
    from hyppo_worker_spark.queries.text_queries import (
        _T35_STOP_PM,
        _sql_stop_count,
    )

    stop = _sql_stop_count("en")
    test = md5_bucket_sql("CAST(doc_id AS VARCHAR)", 5)
    blocks = ",".join(_p42_prefix_sql(b) for b in range(3))
    return f"""
    WITH lab AS MATERIALIZED (
        SELECT doc_id, source,
               CASE WHEN {stop} * 1000 >= {_T35_STOP_PM} * len(w)
                    THEN 1 ELSE 0 END AS y,
               CASE WHEN {test} = 0 THEN 1 ELSE 0 END AS is_test,
               w
        FROM (
            SELECT doc_id, source,
                   list_filter(string_split_regex(lower(text),
                       '[^a-z0-9]+'), x -> x <> '') AS w
            FROM documents) WHERE len(w) > 0
    ),
    ttc AS MATERIALIZED (
        SELECT doc_id, word, CAST(count(*) AS BIGINT) AS cnt FROM (
            SELECT doc_id, unnest(w) AS word FROM lab WHERE is_test = 1)
        GROUP BY 1, 2
    ),{blocks}
    SELECT * FROM res0 UNION ALL SELECT * FROM res1
    UNION ALL SELECT * FROM res2 ORDER BY batch_seq
    """


@register(
    "p42_streaming_nb_refresh",
    oracle=_p42_oracle(),
    tags=("pipeline", "streaming", "classifier", "incremental", "training"),
)
def p42_streaming_nb_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t35's NB trainer as a 3-block stream: per-trigger fold of the
    (word, class) sufficient statistics into an idempotent per-batch
    model ledger, held-out accuracy re-scored at every batch
    boundary; the last batch provably equals the batch-trained
    model."""
    import os
    import shutil
    import tempfile
    import time

    from hyppo_worker_spark.functions import text as TX
    from hyppo_worker_spark.queries.text_queries import (
        _T35_STOP_PM,
        _ml2_expr,
    )
    from hyppo_worker_spark.session import scoped_conf

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    stopc = F.size(
        F.expr(
            "filter(w, x -> x IN ({}))".format(
                ", ".join(f"'{x}'" for x in TX.STOPWORDS["en"])
            )
        )
    )
    lab = tracked_persist(
        docs.select(
            "doc_id",
            F.expr(
                "filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"
            ).alias("w"),
        )
        .filter(F.size("w") > 0)
        .select(
            "doc_id",
            F.when(
                stopc * 1000 >= F.lit(_T35_STOP_PM) * F.size("w"), 1
            )
            .otherwise(0)
            .alias("y"),
            F.when(
                TX.md5_bucket(F.col("doc_id").cast("string"), 5) == 0, 1
            )
            .otherwise(0)
            .alias("is_test"),
            "w",
        )
    )
    held = tracked_persist(
        lab.filter(F.col("is_test") == 1).select("doc_id", "y", "w")
    )
    ttc = tracked_persist(
        held.select("doc_id", F.explode("w").alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )

    work = tempfile.mkdtemp(prefix="hyppo-p42-")
    src = os.path.join(work, "stream")
    os.makedirs(src)
    stage = os.path.join(work, "stage")
    (
        lab.filter(F.col("is_test") == 0)
        .select(
            "doc_id",
            "y",
            F.col("w").cast("array<string>").alias("w"),
            TX.md5_bucket(F.col("doc_id").cast("string"), 3)
            .cast("int")
            .alias("blk"),
        )
        .coalesce(1)
        .write.partitionBy("blk")
        .parquet(stage)
    )
    _move_staged_blocks(stage, src, time.time(), 3)

    model_dir = os.path.join(work, "model")
    meta_dir = os.path.join(work, "meta")
    res_dir = os.path.join(work, "results")

    def sink(batch: DataFrame, batch_id: int) -> None:
        b = int(batch_id)
        cur = (
            batch.select("y", F.explode("w").alias("word"))
            .groupBy("word")
            .agg(
                F.sum(F.when(F.col("y") == 1, 1).otherwise(0))
                .cast("long")
                .alias("f1"),
                F.sum(F.when(F.col("y") == 0, 1).otherwise(0))
                .cast("long")
                .alias("f0"),
            )
        )
        curn = batch.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("y") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n0"),
            F.sum(F.when(F.col("y") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n1"),
        )
        if b > 0:
            prev = spark.read.parquet(
                os.path.join(model_dir, f"batch={b - 1}")
            )
            folded = (
                prev.select("word", "f1", "f0")
                .unionByName(cur)
                .groupBy("word")
                .agg(
                    F.sum("f1").cast("long").alias("f1"),
                    F.sum("f0").cast("long").alias("f0"),
                )
            )
            prevn = spark.read.parquet(
                os.path.join(meta_dir, f"batch={b - 1}")
            )
            foldedn = (
                prevn.unionByName(curn)
                .agg(
                    F.sum("n").cast("long").alias("n"),
                    F.sum("n0").cast("long").alias("n0"),
                    F.sum("n1").cast("long").alias("n1"),
                )
            )
        else:
            folded, foldedn = cur, curn
        folded.write.mode("overwrite").parquet(
            os.path.join(model_dir, f"batch={b}")
        )
        foldedn.write.mode("overwrite").parquet(
            os.path.join(meta_dir, f"batch={b}")
        )
        tc = spark.read.parquet(os.path.join(model_dir, f"batch={b}"))
        nn = spark.read.parquet(os.path.join(meta_dir, f"batch={b}"))
        tot = tc.agg(
            (F.sum("f1") + F.count(F.lit(1))).cast("long").alias("t1"),
            (F.sum("f0") + F.count(F.lit(1))).cast("long").alias("t0"),
        )
        model = tc.crossJoin(F.broadcast(tot)).select(
            "word",
            F.expr(_ml2_expr("t0 * 1024 div (f0 + 1)"))
            .cast("long")
            .alias("c0"),
            F.expr(_ml2_expr("t1 * 1024 div (f1 + 1)"))
            .cast("long")
            .alias("c1"),
        )
        prior = nn.select(
            F.expr(_ml2_expr("n * 1024 div n0")).cast("long").alias("p0"),
            F.expr(_ml2_expr("n * 1024 div n1")).cast("long").alias("p1"),
        )
        docscore = (
            ttc.join(model, "word")
            .groupBy("doc_id")
            .agg(
                F.sum(F.col("cnt") * F.col("c0")).cast("long").alias("s0"),
                F.sum(F.col("cnt") * F.col("c1")).cast("long").alias("s1"),
            )
        )
        yhat = F.when(
            F.coalesce("s1", F.lit(0)) + F.col("p1")
            < F.coalesce("s0", F.lit(0)) + F.col("p0"),
            1,
        ).otherwise(0)
        summary = (
            held.select("doc_id", "y")
            .join(docscore, "doc_id", "left")
            .crossJoin(F.broadcast(prior))
            .select("y", yhat.alias("yhat"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_test"),
                F.sum("yhat").cast("long").alias("pred_pos"),
                F.sum(F.when(F.col("yhat") == F.col("y"), 1).otherwise(0))
                .cast("long")
                .alias("agree"),
            )
            .crossJoin(nn.select(F.col("n").alias("train_docs")))
            .crossJoin(
                tc.agg(F.count(F.lit(1)).cast("long").alias("vocab_size"))
            )
            .select(
                F.lit(b).cast("long").alias("batch_seq"),
                "train_docs",
                "vocab_size",
                "pred_pos",
                "agree",
                F.expr("CAST(agree * 10000 div n_test AS BIGINT)").alias(
                    "accuracy_bp"
                ),
            )
        )
        summary.write.mode("overwrite").parquet(
            os.path.join(res_dir, f"batch={b}")
        )

    with scoped_conf(spark, "spark.sql.shuffle.partitions", "4"):
        q = (
            spark.readStream.schema(
                "doc_id long, y int, w array<string>"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        drain_stream(q, 300)

    rows = (
        spark.read.option("basePath", res_dir).parquet(res_dir)
        .select(
            F.col("batch_seq").cast("long"),
            F.col("train_docs").cast("long"),
            F.col("vocab_size").cast("long"),
            F.col("pred_pos").cast("long"),
            F.col("agree").cast("long"),
            F.col("accuracy_bp").cast("long"),
        )
        .orderBy("batch_seq")
    ).collect()  # 3 rows — bounded pull (work dir deleted next)
    shutil.rmtree(work, ignore_errors=True)
    return local_frame(spark, 
        rows,
        "batch_seq long, train_docs long, vocab_size long, "
        "pred_pos long, agree long, accuracy_bp long",
    ).orderBy("batch_seq")
