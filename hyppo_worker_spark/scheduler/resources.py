"""Resource leasing: concurrency semaphores, throttle token buckets,
deterministic multi-resource acquisition, and contention memory.

Parity targets:

- Concurrency resource = counting semaphore realized in the reference
  as a token queue (``QueueHelpers.scala:93-114,243-249``;
  lease/release ``ResourceLeasing.scala:34-41``).
- Throttled resource = token bucket where a released token only
  becomes available again after ``throttle_rate`` — the reference
  round-trips the token through a TTL'd "deferred" queue
  (``QueueHelpers.scala:125-145,224-241``); here it's a
  ``next_available_at`` timestamp.
- Acquisition order is deterministic to avoid deadlock: concurrency
  resources sorted by name, then throttled sorted by name,
  all-or-nothing with rollback on the first failure
  (``ResourceLeasing.scala:13-27,57-65``).
- ``RecentResourceContention`` (``RecentResourceContention.scala:10-38``):
  remembers the last failed acquisition per resource, cleared on
  success, expired after a retention maximum.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass

from hyppo_worker_spark.model import (
    ConcurrencyWorkResource,
    ResourceKind,
    ThrottledWorkResource,
    WorkResource,
)


@dataclass(frozen=True)
class ResourceLease:
    resource: WorkResource
    acquired_at: float


class ResourceUnavailable(Exception):
    def __init__(self, resource: WorkResource):
        super().__init__(f"resource unavailable: {resource.name}")
        self.resource = resource


class ResourcePool:
    """Thread-safe lease manager for both resource kinds."""

    def __init__(self, clock=time.monotonic):
        self._lock = threading.Lock()
        self._clock = clock
        self._sem_held: dict[str, int] = {}
        self._sem_cap: dict[str, int] = {}
        self._throttle_next: dict[str, float] = {}
        self._throttle_rate: dict[str, float] = {}

    def ensure(self, resource: WorkResource) -> None:
        """Create backing state on demand (the reference creates
        resource queues lazily on enqueue — ``EnqueueWorkQueueProxy.scala:56-75``)."""
        with self._lock:
            if resource.kind is ResourceKind.CONCURRENCY:
                self._sem_cap.setdefault(resource.name, resource.concurrency)
                self._sem_held.setdefault(resource.name, 0)
            else:
                self._throttle_rate.setdefault(
                    resource.name, resource.throttle_rate_ms / 1000.0
                )
                self._throttle_next.setdefault(resource.name, 0.0)

    def _try_acquire_one(self, resource: WorkResource) -> bool:
        if resource.kind is ResourceKind.CONCURRENCY:
            if self._sem_held[resource.name] < self._sem_cap[resource.name]:
                self._sem_held[resource.name] += 1
                return True
            return False
        now = self._clock()
        if now >= self._throttle_next[resource.name]:
            # token leaves the bucket; release() schedules its return
            self._throttle_next[resource.name] = float("inf")
            return True
        return False

    def _release_one(self, resource: WorkResource) -> None:
        if resource.kind is ResourceKind.CONCURRENCY:
            self._sem_held[resource.name] = max(0, self._sem_held[resource.name] - 1)
        else:
            # Token re-enters the bucket after the throttle interval —
            # the analog of the deferred-queue TTL dead-lettering.
            self._throttle_next[resource.name] = (
                self._clock() + self._throttle_rate[resource.name]
            )

    @staticmethod
    def acquisition_order(resources: list[WorkResource]) -> list[WorkResource]:
        """Concurrency-by-name then throttled-by-name — the reference's
        deadlock-avoiding deterministic order."""
        conc = sorted(
            (r for r in resources if isinstance(r, ConcurrencyWorkResource)),
            key=lambda r: r.name,
        )
        thr = sorted(
            (r for r in resources if isinstance(r, ThrottledWorkResource)),
            key=lambda r: r.name,
        )
        return [*conc, *thr]

    def acquire_all(self, resources: list[WorkResource]) -> list[ResourceLease]:
        """All-or-nothing: on the first unavailable resource, roll back
        every lease taken so far and raise ``ResourceUnavailable``
        naming the blocker."""
        ordered = self.acquisition_order(resources)
        for r in ordered:
            self.ensure(r)
        taken: list[ResourceLease] = []
        with self._lock:
            for r in ordered:
                if self._try_acquire_one(r):
                    taken.append(ResourceLease(resource=r, acquired_at=self._clock()))
                else:
                    for lease in reversed(taken):
                        self._rollback_one(lease.resource)
                    raise ResourceUnavailable(r)
        return taken

    def _rollback_one(self, resource: WorkResource) -> None:
        """Rollback ≠ release for throttles: an unused token goes back
        immediately (``basicReject(requeue=true)`` on the token),
        without restarting the throttle interval."""
        if resource.kind is ResourceKind.CONCURRENCY:
            self._sem_held[resource.name] = max(0, self._sem_held[resource.name] - 1)
        else:
            self._throttle_next[resource.name] = 0.0

    def release_all(self, leases: list[ResourceLease]) -> None:
        with self._lock:
            for lease in reversed(leases):
                self._release_one(lease.resource)

    def available(self, resource: WorkResource) -> bool:
        with self._lock:
            if resource.kind is ResourceKind.CONCURRENCY:
                cap = self._sem_cap.get(resource.name, resource.concurrency)
                return self._sem_held.get(resource.name, 0) < cap
            return self._clock() >= self._throttle_next.get(resource.name, 0.0)


class RecentResourceContention:
    """Sliding memory of per-resource acquisition failures."""

    def __init__(self, retention_max_s: float, clock=time.monotonic):
        if retention_max_s < 0:
            raise ValueError("retention max must be >= 0")
        self._retention = retention_max_s
        self._clock = clock
        self._timing: dict[str, float] = {}

    def failed_to_acquire(self, resource: WorkResource) -> None:
        self._timing[resource.name] = self._clock()

    def successfully_acquired(self, resources: list[WorkResource]) -> None:
        for r in resources:
            self._timing.pop(r.name, None)

    def reset_contents(self, known: set[str]) -> None:
        """Drop unknown resources and entries older than retention."""
        now = self._clock()
        self._timing = {
            name: t
            for name, t in self._timing.items()
            if name in known and (now - t) < self._retention
        }

    def time_of_last_contention(self, resource: WorkResource) -> float | None:
        return self._timing.get(resource.name)
