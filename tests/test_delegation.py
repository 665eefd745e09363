"""Delegation-strategy properties (reference analog:
``DefaultDelegationStrategyTests.scala:25-60``): general-first without
affinity, affinity-first with preference, contention filtering."""

import random
from datetime import datetime, timezone

from hyppo_worker_spark.model import ConcurrencyWorkResource
from hyppo_worker_spark.scheduler.delegation import (
    BackoffConfig,
    DefaultDelegationStrategy,
    WorkQueueMetrics,
)
from hyppo_worker_spark.scheduler.priority import QueueDetails, WorkQueuePrioritizer
from hyppo_worker_spark.scheduler.resources import RecentResourceContention

_now = datetime(2026, 1, 1, tzinfo=timezone.utc)


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t

    def advance(self, s):
        self.t += s


def _metrics(name, ready=1, resources=()):
    return WorkQueueMetrics(
        details=QueueDetails(name, size=ready, rate=1.0, ready=ready,
                             unacknowledged=0, idle_since=_now),
        resources=tuple(resources),
    )


def _strategy(clock=None, rng=None):
    clock = clock or FakeClock()
    return (
        DefaultDelegationStrategy(
            WorkQueuePrioritizer.default(random.Random(7)),
            RecentResourceContention(60.0, clock=clock),
            BackoffConfig(),
            rng=rng or random.Random(7),
            clock=clock,
        ),
        clock,
    )


def test_general_first_without_affinity():
    s, _ = _strategy()
    general = _metrics("hyppo.general", ready=2)
    ints = [_metrics("hyppo.integration.a-v1"), _metrics("hyppo.integration.b-v1")]
    order = [q.queue_name for q in s.priority_order_without_affinity(general, ints)]
    assert order[0] == "hyppo.general"
    assert set(order[1:]) == {"hyppo.integration.a-v1", "hyppo.integration.b-v1"}


def test_general_skipped_when_empty():
    s, _ = _strategy()
    general = _metrics("hyppo.general", ready=0)
    ints = [_metrics("hyppo.integration.a-v1")]
    order = [q.queue_name for q in s.priority_order_without_affinity(general, ints)]
    assert order == ["hyppo.integration.a-v1"]


def test_affinity_queues_first_then_general_then_others():
    s, _ = _strategy()
    general = _metrics("hyppo.general", ready=1)
    ints = [
        _metrics("hyppo.integration.warm-v1"),
        _metrics("hyppo.integration.warm-v1.abcd1234"),
        _metrics("hyppo.integration.cold-v1"),
    ]
    order = [
        q.queue_name
        for q in s.priority_order_with_preference(
            lambda qn: qn.startswith("hyppo.integration.warm-v1"), general, ints
        )
    ]
    assert set(order[:2]) == {
        "hyppo.integration.warm-v1",
        "hyppo.integration.warm-v1.abcd1234",
    }
    assert order[2] == "hyppo.general"
    assert order[3] == "hyppo.integration.cold-v1"


def test_contended_resource_filtered_inside_min_delay():
    s, clock = _strategy()
    r = ConcurrencyWorkResource(name="db", concurrency=1)
    s.contention.failed_to_acquire(r)
    clock.advance(1.0)  # < min_delay (5s)
    general = _metrics("hyppo.general", ready=0)
    ints = [_metrics("hyppo.integration.a-v1", resources=[r]), _metrics("hyppo.integration.b-v1")]
    order = [q.queue_name for q in s.priority_order_without_affinity(general, ints)]
    assert order == ["hyppo.integration.b-v1"]


def test_contended_resource_passes_after_long_wait():
    s, clock = _strategy(rng=random.Random(3))
    r = ConcurrencyWorkResource(name="db", concurrency=1)
    s.contention.failed_to_acquire(r)
    clock.advance(120.0)  # way past min delay: threshold ≈ 1
    general = _metrics("hyppo.general", ready=0)
    ints = [_metrics("hyppo.integration.a-v1", resources=[r])]
    order = [q.queue_name for q in s.priority_order_without_affinity(general, ints)]
    assert order == ["hyppo.integration.a-v1"]


def test_shared_resource_single_verdict():
    """Two queues on one contended resource get one coherent verdict
    per delegation pass (the stateful filter)."""
    s, clock = _strategy()
    r = ConcurrencyWorkResource(name="db", concurrency=1)
    s.contention.failed_to_acquire(r)
    clock.advance(7.0)  # past min delay; probabilistic zone
    general = _metrics("hyppo.general", ready=0)
    ints = [
        _metrics("hyppo.integration.a-v1", resources=[r]),
        _metrics("hyppo.integration.b-v1", resources=[r]),
    ]
    for trial_rng in (random.Random(n) for n in range(20)):
        s.rng = trial_rng
        order = [q.queue_name for q in s.priority_order_without_affinity(general, ints)]
        assert len(order) in (0, 2)  # both or neither


class _HalfRng:
    def random(self):
        return 0.5


def test_half_coin_gompertz_boundary():
    """The p14 driver row pins its oracle on this exact rule: with the
    contention coin fixed at 0.5 and reference backoff params
    (scale 0.2, min delay 5s), integer waits 0-9 are filtered and
    waits >= 10 pass (0.5 <= e^(-5 e^(-0.2 t)) first holds at t=10)."""
    for age, expect in ((4, False), (5, False), (9, False), (10, True), (20, True)):
        clock = FakeClock()
        contention = RecentResourceContention(1e9, clock=clock)
        res = ConcurrencyWorkResource(name="r", concurrency=1)
        contention.failed_to_acquire(res)
        clock.advance(float(age))
        s = DefaultDelegationStrategy(
            WorkQueuePrioritizer.default(random.Random(7)),
            contention,
            BackoffConfig(),
            rng=_HalfRng(),
            clock=clock,
        )
        general = _metrics("hyppo.general", ready=0)
        q = _metrics("hyppo.integration.x-v1", ready=1, resources=(res,))
        got = [d.queue_name for d in s.priority_order_without_affinity(general, [q])]
        assert (len(got) == 1) is expect, f"age={age}"
