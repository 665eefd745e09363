"""Python DataSource connector: one InputPartition per ingestion
task, executor-side fetch, equality-pushdown task pruning."""

import pytest
from pyspark.sql import functions as F

from hyppo_worker_spark.sources.integration_source import (
    IntegrationDataSource,
    IntegrationReader,
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
    spark.dataSource.register(IntegrationDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    return spark


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
