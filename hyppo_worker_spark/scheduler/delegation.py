"""Delegation strategy: which queue should a free worker slot pull
from next.

Behavior parity with
``worker/.../scheduling/DelegationStrategy.scala:35-114``:

- Without affinity: general queue first (if it has work), then the
  filtered+prioritized integration queues.
- With an affinity preference (worker just ran integration X and its
  caches are warm): X's queues first, then general, then the rest.
- Queues whose resources recently hit contention are filtered
  probabilistically: below the hard minimum delay they are always
  skipped; past it they pass with probability
  ``gompertz_backoff_factor(seconds_waited, scale, min_delay)``.
  The include/skip decision is memoized per resource within one pass
  so multiple queues sharing a resource get one coherent verdict
  (the stateful filter in ``DelegationStrategy.scala:74-114``).
"""

from __future__ import annotations

import random
import time
from collections.abc import Iterator
from dataclasses import dataclass

from hyppo_worker_spark.model import WorkResource
from hyppo_worker_spark.scheduler.priority import QueueDetails, WorkQueuePrioritizer
from hyppo_worker_spark.scheduler.resources import RecentResourceContention
from hyppo_worker_spark.scheduler.sigmoid import gompertz_backoff_factor


@dataclass(frozen=True)
class WorkQueueMetrics:
    details: QueueDetails
    resources: tuple[WorkResource, ...] = ()

    @property
    def has_work(self) -> bool:
        return self.details.ready > 0


@dataclass(frozen=True)
class BackoffConfig:
    """``reference.conf:84-88`` defaults."""

    scale_factor: float = 0.2
    min_delay_s: float = 5.0
    max_wait_s: float = 60.0


class DefaultDelegationStrategy:
    def __init__(
        self,
        prioritizer: WorkQueuePrioritizer,
        contention: RecentResourceContention,
        backoff: BackoffConfig = BackoffConfig(),
        rng: random.Random | None = None,
        clock=time.monotonic,
    ):
        self.prioritizer = prioritizer
        self.contention = contention
        self.backoff = backoff
        self.rng = rng or random.Random()
        self._clock = clock

    def priority_order_without_affinity(
        self, general: WorkQueueMetrics, integrations: list[WorkQueueMetrics]
    ) -> Iterator[QueueDetails]:
        if general.has_work:
            yield general.details
        yield from self._filter_and_prioritize(integrations)

    def priority_order_with_preference(
        self,
        prefer_queue_match,
        general: WorkQueueMetrics,
        integrations: list[WorkQueueMetrics],
    ) -> Iterator[QueueDetails]:
        """``prefer_queue_match(queue_name) -> bool`` marks the warm
        integration's queues."""
        affinity = [m for m in integrations if prefer_queue_match(m.details.queue_name)]
        others = [m for m in integrations if not prefer_queue_match(m.details.queue_name)]
        yield from self._filter_and_prioritize(affinity)
        if general.has_work:
            yield general.details
        yield from self._filter_and_prioritize(others)

    def _filter_and_prioritize(
        self, metrics: list[WorkQueueMetrics]
    ) -> Iterator[QueueDetails]:
        with_work = [m for m in metrics if m.has_work]
        available = self._filter_for_contention(with_work)
        yield from self.prioritizer.prioritize([m.details for m in available])

    def _filter_for_contention(
        self, metrics: list[WorkQueueMetrics]
    ) -> list[WorkQueueMetrics]:
        attempt: set[str] = set()
        ignore: set[str] = set()

        def allow(resource: WorkResource) -> bool:
            last = self.contention.time_of_last_contention(resource)
            if last is None:
                return True
            if resource.name in attempt:
                return True
            if resource.name in ignore:
                return False
            waited = self._clock() - last
            if waited < self.backoff.min_delay_s:
                ignore.add(resource.name)
                return False
            threshold = gompertz_backoff_factor(
                int(waited), self.backoff.scale_factor, self.backoff.min_delay_s
            )
            if self.rng.random() <= threshold:
                attempt.add(resource.name)
                return True
            ignore.add(resource.name)
            return False

        return [m for m in metrics if all(allow(r) for r in m.resources)]
