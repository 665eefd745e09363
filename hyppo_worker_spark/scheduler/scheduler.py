"""The engine: worker slots, delegation, ack semantics, typed
response dispatch.

Composition of the pieces (queue table + prioritizer + delegation +
resource pool) into the reference's execution loop:

- Worker slots poll for work (``WorkerFSM.scala:252-259``; slot count
  = ``worker-count``, ``reference.conf:22``), with warm-integration
  affinity inside ``work-affinity-timeout``
  (``WorkerFSM.scala:161-199,267-279``; default 10 min,
  ``reference.conf:68``).
- Delegation walks the priority-ordered queue iterator doing
  basicGet-without-ack + all-or-nothing resource leasing with
  rollback-and-requeue on contention
  (``WorkDelegation.scala:93-121``, ``ResourceLeasing.scala:13-27``).
- Ack timing per idempotency (``TaskFSM.scala:102-115``): idempotent
  work acks AFTER the result (at-least-once; requeued if the worker
  dies mid-run), unsafe persists ack BEFORE execution (at-most-once;
  never re-run — a failure after start is reported, not retried).
- Results and expirations dispatch to a typed callback registry
  (``coordinator/DelegatingWorkResponseHandler.scala:25-77``,
  ``ResponseQueueConsumer.scala:77-130``).
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from hyppo_worker_spark.model import (
    FailureResponse,
    Operation,
    StatusUpdate,
    WorkInput,
    WorkResponse,
)
from hyppo_worker_spark.operations import run_operation
from hyppo_worker_spark.registry import IntegrationRegistry
from hyppo_worker_spark.scheduler.delegation import (
    BackoffConfig,
    DefaultDelegationStrategy,
    WorkQueueMetrics,
)
from hyppo_worker_spark.scheduler.priority import WorkQueuePrioritizer
from hyppo_worker_spark.scheduler.queues import QueueNaming, WorkQueueTable
from hyppo_worker_spark.scheduler.resources import (
    RecentResourceContention,
    ResourcePool,
    ResourceUnavailable,
)
from hyppo_worker_spark.storage import DataFileHandler


@dataclass
class EngineConfig:
    """Defaults mirror ``reference.conf``."""

    worker_count: int = 1  # reference.conf:22
    work_timeout_s: float = 3600.0  # reference.conf:19
    task_polling_interval_s: float = 5.0  # reference.conf:72
    work_affinity_timeout_s: float = 600.0  # reference.conf:68
    backoff: BackoffConfig = field(default_factory=BackoffConfig)


class ResponseHandler:
    """Typed callback registry (completed / failed / expired),
    keyed by operation (``WorkResponseHandler.scala:8-16``)."""

    def __init__(self):
        self._completed: dict[Operation | None, list[Callable[[WorkResponse], None]]] = {}
        self._failed: list[Callable[[FailureResponse], None]] = []
        self._expired: list[Callable[[WorkInput], None]] = []
        self._status: list[Callable[[StatusUpdate], None]] = []

    def on_completed(self, fn: Callable[[WorkResponse], None], operation: Operation | None = None):
        self._completed.setdefault(operation, []).append(fn)
        return fn

    def on_failed(self, fn: Callable[[FailureResponse], None]):
        self._failed.append(fn)
        return fn

    def on_expired(self, fn: Callable[[WorkInput], None]):
        self._expired.append(fn)
        return fn

    def on_status(self, fn: Callable[[StatusUpdate], None]):
        """Mid-operation progress frames (StatusUpdate phases)."""
        self._status.append(fn)
        return fn

    def dispatch_status(self, update: StatusUpdate) -> None:
        for fn in self._status:
            fn(update)

    def dispatch_response(self, response: WorkResponse) -> None:
        if isinstance(response, FailureResponse):
            for fn in self._failed:
                fn(response)
            return
        op = response.input.operation
        for fn in self._completed.get(op, []):
            fn(response)
        for fn in self._completed.get(None, []):
            fn(response)

    def dispatch_expired(self, item: WorkInput) -> None:
        for fn in self._expired:
            fn(item)


@dataclass
class _WorkerSlot:
    """Worker slot with an explicit state machine — the in-process
    analog of the reference's WorkerFSM lifecycle
    Idle→LoadingCode→Running→Available (``WorkerFSM.scala:52-259``;
    code loading collapses to registry resolution in-process)."""

    index: int
    state: str = "idle"  # idle | running | publishing
    affinity_source: str | None = None
    affinity_version: int | None = None
    affinity_at: float = 0.0
    transitions: list = field(default_factory=list)

    def transition(self, state: str) -> None:
        self.state = state
        self.transitions.append(state)


class HyppoEngine:
    """Single-driver engine: submit work, let slots drain it through
    Spark, collect typed responses."""

    def __init__(
        self,
        spark: SparkSession,
        registry: IntegrationRegistry,
        handler: DataFileHandler,
        config: EngineConfig | None = None,
        naming: QueueNaming | None = None,
        clock=time.monotonic,
    ):
        self.spark = spark
        self.registry = registry
        self.data_handler = handler
        self.config = config or EngineConfig()
        self.queues = WorkQueueTable(naming or QueueNaming(), clock=clock)
        self.resources = ResourcePool(clock=clock)
        self.contention = RecentResourceContention(
            self.config.backoff.max_wait_s, clock=clock
        )
        self.prioritizer = WorkQueuePrioritizer.default()
        self.strategy = DefaultDelegationStrategy(
            self.prioritizer, self.contention, self.config.backoff, clock=clock
        )
        self.responses = ResponseHandler()
        self.results_log: list[WorkResponse] = []
        self._clock = clock
        self._lock = threading.Lock()
        self._slots = [_WorkerSlot(i) for i in range(self.config.worker_count)]

    # -- submission (WorkDispatcher.enqueue parity) --------------------

    def submit(self, item: WorkInput, ttl_s: float | None = None) -> str:
        return self.queues.enqueue(
            item, ttl_s=ttl_s if ttl_s is not None else self.config.work_timeout_s
        )

    # -- delegation ----------------------------------------------------

    def _queue_metrics(self) -> tuple[WorkQueueMetrics, list[WorkQueueMetrics]]:
        details = self.queues.all_details()
        general = None
        integrations = []
        for d in details:
            m = WorkQueueMetrics(
                details=d, resources=self.queues.resources_of(d.queue_name)
            )
            if d.queue_name == self.queues.naming.general:
                general = m
            elif self.queues.naming.is_integration_queue(d.queue_name):
                integrations.append(m)
        assert general is not None
        return general, integrations

    def _next_delivery(self, slot: _WorkerSlot):
        """Walk the delegated queue order; lease resources; first
        successful (delivery, leases) wins. Contention requeues and
        remembers the blocking resource."""
        general, integrations = self._queue_metrics()
        now = self._clock()
        if (
            slot.affinity_source is not None
            and (now - slot.affinity_at) < self.config.work_affinity_timeout_s
        ):
            order = self.strategy.priority_order_with_preference(
                lambda qn: self.queues.naming.belongs_to_integration(
                    slot.affinity_source, slot.affinity_version, qn
                ),
                general,
                integrations,
            )
        else:
            order = self.strategy.priority_order_without_affinity(general, integrations)
        for details in order:
            delivery = self.queues.basic_get(details.queue_name)
            if delivery is None:
                continue
            res = list(delivery.item.input.resources)
            try:
                leases = self.resources.acquire_all(res)
            except ResourceUnavailable as e:
                self.contention.failed_to_acquire(e.resource)
                self.queues.reject_requeue(delivery)
                continue
            self.contention.successfully_acquired(res)
            return delivery, leases
        return None

    # -- execution -----------------------------------------------------

    def _execute(self, slot: _WorkerSlot, delivery, leases) -> None:
        item: WorkInput = delivery.item.input
        slot.transition("running")
        acked_early = False
        if not item.idempotent:
            # Unsafe persist: ack BEFORE running (at-most-once).
            self.queues.ack(delivery)
            acked_early = True
        try:
            response = run_operation(
                self.spark,
                self.registry,
                self.data_handler,
                item,
                on_status=self.responses.dispatch_status,
            )
        finally:
            self.resources.release_all(leases)
        slot.transition("publishing")
        if not acked_early:
            self.queues.ack(delivery)
        slot.affinity_source = item.integration.source_name
        slot.affinity_version = item.integration.version_number
        slot.affinity_at = self._clock()
        with self._lock:
            self.results_log.append(response)
        self.responses.dispatch_response(response)
        slot.transition("idle")

    def _sweep_expired(self) -> None:
        for _queue_name, qitem in self.queues.sweep_expired():
            self.responses.dispatch_expired(qitem.input)

    # -- drain loops ---------------------------------------------------

    def run_once(self, slot_index: int = 0) -> bool:
        """One delegation+execution cycle; returns True if work ran."""
        self._sweep_expired()
        got = self._next_delivery(self._slots[slot_index])
        if got is None:
            return False
        self._execute(self._slots[slot_index], *got)
        return True

    def run_until_idle(self, max_items: int | None = None) -> int:
        """Synchronously drain all queues (single- or multi-slot).
        Returns the number of items executed."""
        executed = 0
        if self.config.worker_count <= 1:
            while (max_items is None or executed < max_items) and self.run_once(0):
                executed += 1
            self._sweep_expired()
            return executed

        counter_lock = threading.Lock()
        counters = [0]
        active = [0]

        def slot_loop(idx: int):
            while True:
                with counter_lock:
                    if max_items is not None and counters[0] >= max_items:
                        return
                    active[0] += 1
                try:
                    ran = self.run_once(idx)
                finally:
                    with counter_lock:
                        active[0] -= 1
                        if ran:
                            counters[0] += 1
                if not ran:
                    # Idle — but a busy slot may still submit follow-up
                    # work (response-chained pipelines). Only exit when
                    # nobody is executing.
                    with counter_lock:
                        if active[0] == 0:
                            return
                    time.sleep(0.01)

        threads = [
            threading.Thread(target=slot_loop, args=(i,), daemon=True)
            for i in range(self.config.worker_count)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        self._sweep_expired()
        return counters[0]
