"""Running-state watchdog + graceful shutdown + poison-message policy
(reference analogs: ``WorkerFSM.scala:125`` work-timeout bounding the
Running state, ``HyppoConfig.scala:55-60`` shutdown budget,
``IdempotentWorkQueueingTests.scala:38-64`` work-returns-to-queue-on-
worker-death, ``QueueItemHeaders.scala:11-26`` redelivery surfacing)."""

import threading
import time

import pytest

from hyppo_worker_spark.model import (
    CreateIngestionTasksRequest,
    DataIngestionJob,
    FailureResponse,
    FetchProcessedDataRequest,
    IngestionSource,
)
from hyppo_worker_spark.registry import IntegrationRegistry
from hyppo_worker_spark.scheduler.scheduler import EngineConfig, HyppoEngine
from tests.fixtures import SlowSparkStub


@pytest.fixture(autouse=True)
def _flush_poisoned_python_workers(spark):
    """Every test here interrupt-kills running attempts, which can
    leave half-dead python workers in the shared session's reuse pool;
    the NEXT python-side job scheduled onto one dies spuriously
    (CancelledKeyException) — observed as a later test's fetch failing
    terminally the instant it starts. Absorb after EVERY test, same as
    HyppoEngine.reset_for_restart does between engine generations."""
    yield
    from hyppo_worker_spark.scheduler.scheduler import flush_python_worker_pools

    flush_python_worker_pools(spark)


def _engine(spark, storage, stub, **cfg):
    registry = IntegrationRegistry()
    registry.register(stub)
    return HyppoEngine(spark, registry, storage, EngineConfig(**cfg))


def _make_task(engine, details, stub):
    job = DataIngestionJob(source=IngestionSource(name=stub.source_name))
    engine.submit(CreateIngestionTasksRequest(integration=details, job=job))
    engine.run_until_idle()
    return engine.results_log[-1].tasks[0]


@pytest.mark.slow
def test_watchdog_kills_hung_work_and_dead_letters_after_max(spark, storage):
    """A hung Spark job is cancelled at the work-timeout; the
    idempotent item is requeued (silent redelivery), and after
    max_deliveries attempts it dead-letters to the expired handlers
    with the attempt count on the final FailureResponse."""
    stub = SlowSparkStub(sleep_s=60.0)
    engine = _engine(
        spark, storage, stub, run_timeout_s=1.5, max_deliveries=2
    )
    details = stub.details()
    task = _make_task(engine, details, stub)

    failures, expired = [], []
    engine.responses.on_failed(failures.append)
    engine.responses.on_expired(expired.append)

    engine.submit(FetchProcessedDataRequest(integration=details, task=task))
    t0 = time.monotonic()
    engine.run_until_idle()
    elapsed = time.monotonic() - t0

    # Both attempts ran the connector; neither waited out the 60s sleep.
    assert stub.fetch_attempts == 2
    assert elapsed < 30.0, f"watchdog did not bound the running state ({elapsed:.1f}s)"
    # Attempt 1: silent redelivery (no failure dispatched). Attempt 2:
    # dead-lettered -> one FailureResponse marked timed_out, attempt=2.
    assert len(failures) == 1
    assert failures[0].timed_out is True
    assert failures[0].attempt == 2
    # Poison message landed in the expired handlers.
    assert len(expired) == 1
    assert expired[0].operation is failures[0].input.operation
    # Slot is freed and nothing is left queued or unacked.
    assert engine._slots[0].state == "idle"
    assert all(d.size == 0 for d in engine.queues.all_details())


@pytest.mark.slow
def test_graceful_shutdown_requeues_running_idempotent_work(spark, storage):
    """shutdown(): stop delegation, wait <=80% of the budget, cancel
    stragglers, requeue their unacked idempotent deliveries — then a
    restarted engine (the 'next worker process') completes the item."""
    stub = SlowSparkStub(sleep_s=60.0)
    engine = _engine(spark, storage, stub, run_timeout_s=None, shutdown_timeout_s=3.0)
    details = stub.details()
    task = _make_task(engine, details, stub)

    engine.submit(FetchProcessedDataRequest(integration=details, task=task))
    drain = threading.Thread(target=engine.run_until_idle, daemon=True)
    drain.start()
    deadline = time.monotonic() + 10.0
    while engine._slots[0].current_delivery is None:
        assert time.monotonic() < deadline, "slot never picked up the item"
        time.sleep(0.01)

    summary = engine.shutdown()
    drain.join(timeout=30.0)
    assert not drain.is_alive(), "drain loop did not stop after shutdown"
    assert summary["cancelled"] == 1
    assert not summary["drained"]

    # The item is back on its queue (requeued by shutdown or by the
    # unwinding slot — both paths are idempotent), not lost, not acked.
    qname = engine.queues.queue_for(
        FetchProcessedDataRequest(integration=details, task=task)
    )
    d = engine.queues.details(qname)
    assert d.ready == 1 and d.unacknowledged == 0
    assert stub.fetch_attempts == 1

    # 'Next worker process': restart, integration now healthy -> the
    # redelivered item completes (at-least-once).
    stub.sleep_s = 0.0
    engine.reset_for_restart()
    n = engine.run_until_idle()
    assert n == 1
    assert not isinstance(engine.results_log[-1], FailureResponse)
    assert stub.fetch_attempts == 2


def test_shutdown_when_idle_is_clean(spark, storage):
    stub = SlowSparkStub(sleep_s=0.0)
    engine = _engine(spark, storage, stub, shutdown_timeout_s=1.0)
    summary = engine.shutdown()
    assert summary == {"drained": True, "cancelled": 0, "requeued": 0}


@pytest.mark.slow
def test_multislot_shutdown_requeues_every_straggler(spark, storage):
    """Three busy slots at shutdown: every stuck attempt is cancelled
    via its own delivery-derived job group, all three items are
    requeued un-acked, and a restarted engine completes all of them —
    no straggler's cancel may leak onto another slot's redelivery."""
    stub = SlowSparkStub(sleep_s=60.0)
    engine = _engine(
        spark, storage, stub,
        worker_count=3, run_timeout_s=None, shutdown_timeout_s=3.0,
    )
    details = stub.details()
    task = _make_task(engine, details, stub)

    for _ in range(3):
        engine.submit(FetchProcessedDataRequest(integration=details, task=task))
    drain = threading.Thread(target=engine.run_until_idle, daemon=True)
    drain.start()
    deadline = time.monotonic() + 15.0
    while sum(s.current_delivery is not None for s in engine._slots) < 3:
        assert time.monotonic() < deadline, "slots never picked up all items"
        time.sleep(0.01)

    summary = engine.shutdown()
    drain.join(timeout=45.0)
    assert not drain.is_alive(), "drain loop did not stop after shutdown"
    # Usually all 3 stragglers are force-cancelled; rarely one fails on
    # its own inside the stop window (cancel-storm collateral) before
    # its cancel lands — then it is REQUEUED by the shutdown-failure
    # rule rather than counted cancelled. Either way nothing may be
    # lost: the queue-conservation asserts below are the contract.
    assert 1 <= summary["cancelled"] <= 3
    assert not summary["drained"]

    qname = engine.queues.queue_for(
        FetchProcessedDataRequest(integration=details, task=task)
    )
    d = engine.queues.details(qname)
    assert d.ready == 3 and d.unacknowledged == 0
    assert stub.fetch_attempts == 3

    stub.sleep_s = 0.0
    engine.reset_for_restart()
    n = engine.run_until_idle()
    assert n == 3
    assert stub.fetch_attempts == 6
    assert all(s.state == "idle" for s in engine._slots)
