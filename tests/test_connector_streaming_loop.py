"""End-to-end connector streaming loop: the polling-loop stream
source (task-log offsets) feeding the manifest-committed stream sink —
the reference's fetch→persist cycle as one Structured Streaming query,
with exactly-once visibility on the persist side."""

from __future__ import annotations

import json
import os

import pytest

from hyppo_worker_spark.sources.integration_source import (
    read_committed,
    register_integration_source,
)

SCHEMA = "task_id int, day string, seq int, name string, score int"
READBACK_SCHEMA = (
    "task_id long, day string, seq long, name string, score long"
)
FETCHER = "hyppo_worker_spark.sources.integration_source:synthetic_events_fetcher"


@pytest.fixture(scope="module")
def registered(spark):
    register_integration_source(spark)
    return spark


def _append_tasks(task_log: str, tasks: list[dict]) -> None:
    with open(task_log, "a", encoding="utf-8") as fh:
        for t in tasks:
            fh.write(json.dumps(t) + "\n")


def _run_loop(spark, task_log, out, ckpt):
    stream = (
        spark.readStream.format("hyppo_integration")
        .schema(SCHEMA)
        .option("fetcher", FETCHER)
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
    q.awaitTermination(180)


def test_fetch_to_persist_streaming_loop(registered, tmp_path):
    task_log = str(tmp_path / "task_log.jsonl")
    out = str(tmp_path / "persisted")
    ckpt = str(tmp_path / "ckpt")

    _append_tasks(
        task_log,
        [
            {"task_id": 1, "day": "2024-01-01", "n_rows": 4},
            {"task_id": 2, "day": "2024-01-02", "n_rows": 3},
        ],
    )
    _run_loop(registered, task_log, out, ckpt)
    back = read_committed(registered, out, READBACK_SCHEMA)
    assert back.count() == 7
    assert {r.task_id for r in back.collect()} == {1, 2}

    # the coordinator appends more tasks; a SECOND drain of the SAME
    # checkpoint ingests only the new slice (offset = consumed lines)
    _append_tasks(task_log, [{"task_id": 3, "day": "2024-01-03", "n_rows": 5}])
    _run_loop(registered, task_log, out, ckpt)
    back2 = read_committed(registered, out, READBACK_SCHEMA)
    assert back2.count() == 12
    names = {r.name for r in back2.collect()}
    # no task-1/2 duplicates (exactly-once visibility across restarts)
    assert len(names) == 12
    assert {r.task_id for r in back2.collect()} == {1, 2, 3}

    # every committed file is manifest-listed with verified checksums
    manifests = [f for f in os.listdir(out) if f.startswith("_MANIFEST-")]
    assert manifests
    total = sum(
        json.load(open(os.path.join(out, m)))["total_rows"] for m in manifests
    )
    assert total == 12


def test_rotated_task_log_directory(registered, tmp_path):
    """The task log as a DIRECTORY of generation files: offsets count
    across sorted-name files, so rotation (close gen-0, open gen-1)
    is invisible to a checkpointed consumer."""
    log_dir = str(tmp_path / "task_logs")
    os.makedirs(log_dir)
    out = str(tmp_path / "persisted")
    ckpt = str(tmp_path / "ckpt")

    _append_tasks(
        os.path.join(log_dir, "gen-000.jsonl"),
        [
            {"task_id": 1, "day": "2024-01-01", "n_rows": 4},
            {"task_id": 2, "day": "2024-01-02", "n_rows": 3},
        ],
    )
    _run_loop(registered, log_dir, out, ckpt)
    assert read_committed(registered, out, READBACK_SCHEMA).count() == 7

    # ROTATE: gen-0 is now immutable; new tasks land in gen-1 (sorts
    # after). The same checkpoint must ingest exactly the new slice.
    _append_tasks(
        os.path.join(log_dir, "gen-001.jsonl"),
        [{"task_id": 3, "day": "2024-01-03", "n_rows": 5}],
    )
    _run_loop(registered, log_dir, out, ckpt)
    back = read_committed(registered, out, READBACK_SCHEMA)
    rows = back.collect()
    assert len(rows) == 12
    assert len({r.name for r in rows}) == 12  # no replays
    assert {r.task_id for r in rows} == {1, 2, 3}

    # a second rotation plus an append to the OPEN generation both
    # flow through one drain
    _append_tasks(
        os.path.join(log_dir, "gen-001.jsonl"),
        [{"task_id": 4, "day": "2024-01-04", "n_rows": 2}],
    )
    _append_tasks(
        os.path.join(log_dir, "gen-002.jsonl"),
        [{"task_id": 5, "day": "2024-01-05", "n_rows": 1}],
    )
    _run_loop(registered, log_dir, out, ckpt)
    back3 = read_committed(registered, out, READBACK_SCHEMA)
    assert back3.count() == 15
    assert {r.task_id for r in back3.collect()} == {1, 2, 3, 4, 5}


def test_stream_reader_replay_across_rotation(tmp_path):
    """Unit-level replay contract: readBetweenOffsets must return the
    SAME slice as the original read even when the slice spans a
    generation-file boundary (a crashed micro-batch replays from the
    checkpointed offsets)."""
    from pyspark.sql.types import StructType

    from hyppo_worker_spark.sources.integration_source import (
        IntegrationStreamReader,
    )

    log_dir = str(tmp_path / "logs")
    os.makedirs(log_dir)
    _append_tasks(
        os.path.join(log_dir, "gen-000.jsonl"),
        [{"task_id": 1, "day": "2024-01-01", "n_rows": 2},
         {"task_id": 2, "day": "2024-01-02", "n_rows": 1}],
    )
    reader = IntegrationStreamReader(
        StructType(), {"fetcher": FETCHER, "task_log": log_dir}
    )
    start = reader.initialOffset()
    it1, end1 = reader.read(start)
    first = list(it1)
    assert end1 == {"index": 2}
    assert len(first) == 3  # 2 + 1 rows

    # rotate, then a second micro-batch spanning into the new file
    _append_tasks(
        os.path.join(log_dir, "gen-001.jsonl"),
        [{"task_id": 3, "day": "2024-01-03", "n_rows": 4}],
    )
    it2, end2 = reader.read(end1)
    second = list(it2)
    assert end2 == {"index": 3}
    assert len(second) == 4

    # replay BOTH slices from offsets alone — byte-identical rows
    assert list(reader.readBetweenOffsets(start, end1)) == first
    assert list(reader.readBetweenOffsets(end1, end2)) == second
    # and a spanning replay returns the concatenation
    assert list(reader.readBetweenOffsets(start, end2)) == first + second


def test_fold_archives_prefix_and_preserves_offsets(tmp_path):
    """fold_task_log_generations: folded generations disappear from
    disk but checkpointed GLOBAL offsets keep their meaning (base +
    retained lines), replay into the folded range fails loud, and the
    prefix/open-file safety rules reject illegal folds."""
    from pyspark.sql.types import StructType

    from hyppo_worker_spark.sources.integration_source import (
        IntegrationStreamReader,
        fold_task_log_generations,
    )

    log_dir = str(tmp_path / "logs")
    os.makedirs(log_dir)
    _append_tasks(
        os.path.join(log_dir, "gen-000.jsonl"),
        [{"task_id": 1, "day": "2024-01-01", "n_rows": 2},
         {"task_id": 2, "day": "2024-01-02", "n_rows": 1}],
    )
    _append_tasks(
        os.path.join(log_dir, "gen-001.jsonl"),
        [{"task_id": 3, "day": "2024-01-03", "n_rows": 4}],
    )
    reader = IntegrationStreamReader(
        StructType(), {"fetcher": FETCHER, "task_log": log_dir}
    )
    it1, end1 = reader.read(reader.initialOffset())
    consumed = list(it1)
    assert end1 == {"index": 3}

    # illegal folds fail before touching anything
    with pytest.raises(ValueError, match="prefix"):
        fold_task_log_generations(log_dir, ["gen-001.jsonl"])
    with pytest.raises(ValueError, match="not present"):
        fold_task_log_generations(log_dir, ["gen-999.jsonl"])
    with pytest.raises(ValueError, match="at least one file"):
        fold_task_log_generations(
            log_dir, ["gen-000.jsonl", "gen-001.jsonl"]
        )

    # legal fold: gen-000's 2 lines move into the base offset
    assert fold_task_log_generations(log_dir, ["gen-000.jsonl"]) == 2
    assert not os.path.exists(os.path.join(log_dir, "gen-000.jsonl"))

    # the checkpointed global offset still means the same position
    _append_tasks(
        os.path.join(log_dir, "gen-002.jsonl"),
        [{"task_id": 4, "day": "2024-01-04", "n_rows": 2}],
    )
    it2, end2 = reader.read(end1)
    assert end2 == {"index": 4}
    second = list(it2)
    assert len(second) == 2  # exactly task 4's rows, no replays
    # replay of the post-fold slice from offsets alone still works
    assert list(reader.readBetweenOffsets(end1, end2)) == second
    # ...but a replay reaching into the folded range fails LOUD
    with pytest.raises(ValueError, match="predates the folded base"):
        list(reader.readBetweenOffsets({"index": 1}, end2))

    # a second fold accumulates (gen-001: 1 line -> base 3)
    assert fold_task_log_generations(log_dir, ["gen-001.jsonl"]) == 3
    with pytest.raises(ValueError, match="already archived"):
        fold_task_log_generations(log_dir, ["gen-001.jsonl"])
    it3, end3 = reader.read(end2)
    assert list(it3) == [] and end3 == {"index": 4}
    assert len(consumed) == 7
