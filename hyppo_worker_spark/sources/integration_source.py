"""Custom integration connector via the Python DataSource API
(Spark 4): the reference's ingestion-task fetch as a first-class
``spark.read.format("hyppo_integration")`` source.

Reference shape (cited for parity, not ported): the coordinator
creates ingestion tasks centrally
(``CreateIngestionTasksOperation.java:46-55``) and each task's raw
data is fetched by integration callback
(``FetchRawDataOperation``/``RawDataProcessor``,
``ProcessRawDataOperation.java:73-80``) — a pull-based, per-task,
arbitrary-Python data plane. The Spark-native expression of that
contract is a DataSource whose ``partitions()`` is the task list: ONE
InputPartition per ingestion task, so the fetch itself runs
DISTRIBUTED on executors (1000 tasks = 1000-way parallel ingestion),
with the DataFrame API (and Catalyst's pruning/pushdown) layered on
top instead of an opaque driver-side loop.

Contract:

- ``fetcher`` option — ``"module.path:callable"`` resolved by
  importlib ON THE EXECUTOR (the executor imports the integration's
  code, the analog of the reference's executor jar loading,
  ``registry.py:105-121``). Signature:
  ``fetcher(params: dict, schema: StructType) -> Iterator[tuple]``,
  tuples in schema column order.
- ``tasks`` option — JSON list of per-task param dicts (the
  coordinator-created task list).
- ``schema`` option — DDL string; explicit, never inferred.
- Filter pushdown: a task-param key that matches a schema column name
  declares that column CONSTANT per task (the directory-partition
  analog). Equality/IN filters on such columns prune whole tasks
  before any fetch runs — the 100 TB point: a date-filtered read of a
  10-year task list fetches only the matching days. The fetcher must
  emit the declared constant value in that column; a guard row-check
  enforces it at read time (fail loud, not wrong).
"""

from __future__ import annotations

import importlib
import json
from dataclasses import dataclass
from typing import Any, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

FORMAT_NAME = "hyppo_integration"


def resolve_fetcher(path: str):
    """``"module.sub:callable"`` → the callable (executor-side)."""
    mod_name, _, fn_name = path.partition(":")
    if not mod_name or not fn_name:
        raise ValueError(
            f"fetcher must be 'module.path:callable', got {path!r}"
        )
    fn = getattr(importlib.import_module(mod_name), fn_name, None)
    if fn is None or not callable(fn):
        raise ValueError(f"fetcher {path!r} does not resolve to a callable")
    return fn


@dataclass
class IngestionTaskPartition(InputPartition):
    """One ingestion task == one Spark input partition."""

    index: int
    params: dict


class IntegrationReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._fetcher_path = options.get("fetcher")
        if not self._fetcher_path:
            raise ValueError("hyppo_integration requires a 'fetcher' option")
        try:
            tasks = json.loads(options.get("tasks", "[]"))
        except json.JSONDecodeError as e:
            raise ValueError(f"'tasks' option is not valid JSON: {e}") from None
        if not isinstance(tasks, list) or not all(
            isinstance(t, dict) for t in tasks
        ):
            raise ValueError("'tasks' must be a JSON list of objects")
        if not tasks:
            raise ValueError(
                "hyppo_integration requires a non-empty 'tasks' JSON list"
            )
        self._tasks: list[dict] = tasks
        # schema columns a task-param key may pin as constant-per-task
        self._param_cols = {
            f.name for f in schema.fields
        } & {k for t in tasks for k in t}

    # -- filter pushdown → task pruning --------------------------------

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Prune whole ingestion tasks with equality/IN filters on
        constant-per-task columns; every other filter is returned to
        Spark to evaluate above the scan."""
        for flt in filters:
            accepted = False
            if isinstance(flt, (EqualTo, In)) and len(flt.attribute) == 1:
                col = flt.attribute[0]
                if col in self._param_cols and all(
                    col in t for t in self._tasks
                ):
                    wanted = (
                        {flt.value}
                        if isinstance(flt, EqualTo)
                        else set(flt.value)  # In.value is a tuple
                    )
                    self._tasks = [
                        t for t in self._tasks if t[col] in wanted
                    ]
                    accepted = True
            if not accepted:
                yield flt

    # -- scan -----------------------------------------------------------

    def partitions(self) -> Sequence[IngestionTaskPartition]:
        return [
            IngestionTaskPartition(i, t) for i, t in enumerate(self._tasks)
        ]

    def read(self, partition: IngestionTaskPartition) -> Iterator[tuple]:
        fetcher = resolve_fetcher(self._fetcher_path)
        names = [f.name for f in self._schema.fields]
        pinned = [
            (i, partition.params[n])
            for i, n in enumerate(names)
            if n in partition.params
        ]
        for row in fetcher(partition.params, self._schema):
            # enforce the constant-per-task declaration the pushdown
            # relied on — a fetcher emitting a different value would
            # silently corrupt pruned reads.
            for i, want in pinned:
                if row[i] != want:
                    raise ValueError(
                        f"fetcher emitted {names[i]}={row[i]!r} in a task "
                        f"declaring {names[i]}={want!r} — constant-per-task "
                        "columns must match their task param"
                    )
            yield row


class IntegrationStreamReader(SimpleDataSourceStreamReader):
    """The reference's worker POLLING loop (SURVEY §3.2:
    ``WorkerFSM``/requeue poll → execute) as a Structured Streaming
    source: the coordinator appends ingestion tasks to a JSON-lines
    ``task_log``; every microbatch ingests exactly the newly-appended
    tasks. Offsets are consumed line counts, so retry replays the same
    task slice (``readBetweenOffsets``) — at-least-once end-to-end,
    exactly-once into transactional sinks, the streaming twin of the
    batch reader's at-least-once requeue semantics.

    The task log must be append-only: rewriting consumed lines breaks
    replay determinism (same rule as any replayable source).
    """

    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._fetcher_path = options.get("fetcher")
        self._task_log = options.get("task_log")
        if not self._fetcher_path or not self._task_log:
            raise ValueError(
                "streaming hyppo_integration requires 'fetcher' and 'task_log'"
            )

    def initialOffset(self) -> dict:
        return {"index": 0}

    def _tasks(self) -> list[dict]:
        try:
            with open(self._task_log, encoding="utf-8") as fh:
                return [json.loads(line) for line in fh if line.strip()]
        except FileNotFoundError:
            return []

    def _rows(self, tasks: list[dict]) -> list[tuple]:
        # materialized (not a generator): Spark's prefetch cache copies
        # the returned iterable when a replay overlaps the cache, and a
        # generator can't be copied. Microbatch task slices are small
        # by contract (the polling loop drains a queue, not a corpus).
        fetcher = resolve_fetcher(self._fetcher_path)
        return [row for t in tasks for row in fetcher(t, self._schema)]

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        tasks = self._tasks()
        return iter(self._rows(tasks[start["index"]:])), {"index": len(tasks)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter(self._rows(self._tasks()[start["index"]:end["index"]]))


class IntegrationDataSource(DataSource):
    """``spark.dataSource.register(IntegrationDataSource)`` then
    ``spark.read.format("hyppo_integration").schema(...).options(...)``
    for batch, ``spark.readStream`` with a ``task_log`` option for the
    polling-loop stream."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        ddl = self.options.get("schema")
        if not ddl:
            raise ValueError("hyppo_integration requires a 'schema' option (DDL)")
        return ddl

    def reader(self, schema: StructType) -> IntegrationReader:
        return IntegrationReader(schema, dict(self.options))

    def simpleStreamReader(self, schema: StructType) -> IntegrationStreamReader:
        return IntegrationStreamReader(schema, dict(self.options))


# -- demo fetcher (used by tests; deterministic, no I/O) ----------------


def synthetic_events_fetcher(params: dict, schema: StructType) -> Iterator[tuple]:
    """Deterministic per-task rows: ``n_rows`` events for task
    ``task_id`` on day ``day`` (constant-per-task column). Stands in
    for a real integration's API-paging fetch in tests."""
    task_id = params["task_id"]
    # "emit_day" (not a schema column) lets tests exercise the
    # constant-per-task guard with a fetcher that contradicts its task.
    day = params.get("emit_day", params["day"])
    n = int(params.get("n_rows", 10))
    for i in range(n):
        yield (task_id, day, i, f"evt-{task_id}-{i}", (i * 7 + task_id) % 100)
