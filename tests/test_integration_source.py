"""Python DataSource connector: one InputPartition per ingestion
task, executor-side fetch, equality-pushdown task pruning."""

import pytest
from pyspark.sql import functions as F

from hyppo_worker_spark.sources.integration_source import (
    IntegrationReader,
    register_integration_source,
    resolve_fetcher,
)

SCHEMA = "task_id int, day string, seq int, name string, score int"
TASKS = (
    '[{"task_id": 1, "day": "2024-01-01", "n_rows": 4},'
    ' {"task_id": 2, "day": "2024-01-02", "n_rows": 3},'
    ' {"task_id": 3, "day": "2024-01-02", "n_rows": 5}]'
)
FETCHER = "hyppo_worker_spark.sources.integration_source:synthetic_events_fetcher"


@pytest.fixture(scope="module")
def registered(spark):
    register_integration_source(spark)
    return spark


def test_no_direct_register_in_queries():
    """Queries must route through register_integration_source: a direct
    dataSource.register leaves spark.sql.python.filterPushdown.enabled
    unset on a bare (driver-harness) session and Spark 4.1 then raises
    DATA_SOURCE_PUSHDOWN_DISABLED because IntegrationReader implements
    pushFilters() (the round-6 p06 driver failure)."""
    import pathlib

    import hyppo_worker_spark.queries as q

    qdir = pathlib.Path(q.__file__).parent
    offenders = [
        p.name
        for p in qdir.glob("*.py")
        if "dataSource.register(" in p.read_text(encoding="utf-8")
    ]
    assert offenders == [], (
        f"direct dataSource.register call in query modules {offenders}; "
        "use sources.integration_source.register_integration_source"
    )


def test_register_helper_sets_pushdown_conf(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")
    register_integration_source(spark)
    assert spark.conf.get("spark.sql.python.filterPushdown.enabled") == "true"


def _read(spark, tasks=TASKS):
    return (
        spark.read.format("hyppo_integration")
        .schema(SCHEMA)
        .option("fetcher", FETCHER)
        .option("tasks", tasks)
        .load()
    )


def test_rows_and_parallelism(registered):
    df = _read(registered)
    assert df.count() == 12  # 4 + 3 + 5
    # one partition per ingestion task: the fetch is distributed
    n_parts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert n_parts == 3


def test_task_pruning_via_filter_pushdown(registered):
    """day is constant-per-task (declared by the task params), so an
    equality filter must prune tasks 2+3's fetches entirely — visible
    as a single surviving input partition."""
    df = _read(registered).filter(F.col("day") == "2024-01-01")
    rows = df.collect()
    assert len(rows) == 4
    assert {r.task_id for r in rows} == {1}
    n_parts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert n_parts == 1


def test_in_filter_prunes_multiple_tasks(registered):
    """IN-list pushdown keeps exactly the matching tasks' partitions."""
    df = _read(registered).filter(F.col("day").isin("2024-01-02", "2099-12-31"))
    rows = df.collect()
    assert {r.task_id for r in rows} == {2, 3}  # both 2024-01-02 tasks
    assert len(rows) == 8  # 3 + 5; task 1's fetch never ran
    n_parts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert n_parts == 2


def test_non_param_filters_still_apply(registered):
    """Filters the source can't take (seq is not constant-per-task)
    must be evaluated by Spark above the scan — results stay exact."""
    df = _read(registered).filter((F.col("seq") >= 2) & (F.col("day") == "2024-01-02"))
    rows = df.collect()
    assert sorted((r.task_id, r.seq) for r in rows) == [(2, 2), (3, 2), (3, 3), (3, 4)]


def test_fetcher_constant_violation_fails_loud(registered):
    """A fetcher emitting a value that contradicts its task's declared
    constant column must error, not silently corrupt pruned reads.
    (emit_day makes the demo fetcher lie about the day column.)"""
    bad_tasks = (
        '[{"task_id": 1, "day": "2024-12-31", "emit_day": "1999-01-01",'
        ' "n_rows": 2}]'
    )
    df = _read(registered, tasks=bad_tasks)
    with pytest.raises(Exception, match="constant-per-task"):
        df.collect()


def test_reader_option_validation():
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL(SCHEMA)
    with pytest.raises(ValueError, match="fetcher"):
        IntegrationReader(schema, {"tasks": "[]"})
    with pytest.raises(ValueError, match="non-empty"):
        IntegrationReader(schema, {"fetcher": FETCHER, "tasks": "[]"})
    with pytest.raises(ValueError, match="valid JSON"):
        IntegrationReader(schema, {"fetcher": FETCHER, "tasks": "{"})
    with pytest.raises(ValueError, match="callable"):
        resolve_fetcher("hyppo_worker_spark.sources.integration_source:nope")
    with pytest.raises(ValueError, match="module.path:callable"):
        resolve_fetcher("no_colon_here")


def test_streaming_polling_loop(registered, tmp_path):
    """Appended tasks are ingested incrementally: a resumed stream (same
    checkpoint) processes ONLY the tasks appended after its last
    offset — the reference's worker polling loop, with replayable
    offsets."""
    import json as _json

    log = tmp_path / "tasks.jsonl"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    t1 = {"task_id": 1, "day": "2024-01-01", "n_rows": 3}
    t2 = {"task_id": 2, "day": "2024-01-02", "n_rows": 4}
    log.write_text(_json.dumps(t1) + "\n" + _json.dumps(t2) + "\n")

    def run_once():
        q = (
            registered.readStream.format("hyppo_integration")
            .schema(SCHEMA)
            .option("fetcher", FETCHER)
            .option("task_log", str(log))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(60)

    run_once()
    first = registered.read.parquet(out)
    assert first.count() == 7  # 3 + 4

    # coordinator appends one more task; the resumed stream ingests
    # exactly that task's rows (offsets from the checkpoint)
    t3 = {"task_id": 3, "day": "2024-01-03", "n_rows": 5}
    with open(log, "a", encoding="utf-8") as fh:
        fh.write(_json.dumps(t3) + "\n")
    run_once()
    rows = registered.read.parquet(out).collect()
    assert len(rows) == 12
    by_task = {}
    for r in rows:
        by_task[r.task_id] = by_task.get(r.task_id, 0) + 1
    assert by_task == {1: 3, 2: 4, 3: 5}  # no re-ingestion of 1/2


def test_range_filter_prunes_tasks(registered):
    """Range pushdown — the date-window case: day >= '2024-01-02'
    must prune task 1's fetch entirely (string comparison matches
    the ISO date ordering Spark itself uses)."""
    df = _read(registered).filter(F.col("day") >= "2024-01-02")
    rows = df.collect()
    assert {r.task_id for r in rows} == {2, 3}
    assert len(rows) == 8
    n_parts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert n_parts == 2


def test_range_and_equality_compose(registered):
    """day < upper bound composed with a residual Spark-side filter:
    pruning keeps only in-range tasks, the seq predicate still
    evaluates above the scan."""
    df = _read(registered).filter(
        (F.col("day") < "2024-01-02") & (F.col("seq") <= 1)
    )
    rows = df.collect()
    assert sorted((r.task_id, r.seq) for r in rows) == [(1, 0), (1, 1)]
    n_parts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert n_parts == 1


def test_range_on_mixed_type_params_falls_back(registered):
    """task_id is int in the params; a >= filter against a LONG
    literal from Spark still returns exact results whether or not the
    source could prune (mixed/mismatched types fall back to
    Spark-side evaluation — never wrong, just unpruned)."""
    df = _read(registered).filter(F.col("task_id") >= 2)
    rows = df.collect()
    assert {r.task_id for r in rows} == {2, 3}
    assert len(rows) == 8
