"""Resource leasing invariants (reference analog:
``queue/ResourceTests.scala`` + ``ResourceLeasing.scala`` ordering)."""

import pytest

from hyppo_worker_spark.model import ConcurrencyWorkResource, ThrottledWorkResource
from hyppo_worker_spark.scheduler.resources import (
    RecentResourceContention,
    ResourcePool,
    ResourceUnavailable,
)


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t

    def advance(self, s):
        self.t += s


def test_concurrency_semaphore_cap():
    pool = ResourcePool()
    r = ConcurrencyWorkResource(name="db", concurrency=2)
    l1 = pool.acquire_all([r])
    l2 = pool.acquire_all([r])
    with pytest.raises(ResourceUnavailable):
        pool.acquire_all([r])
    pool.release_all(l1)
    l3 = pool.acquire_all([r])
    assert l3
    pool.release_all(l2)
    pool.release_all(l3)


def test_throttle_token_interval():
    clock = FakeClock()
    pool = ResourcePool(clock=clock)
    r = ThrottledWorkResource(name="api", throttle_rate_ms=1000)
    lease = pool.acquire_all([r])
    # token is out: nobody else can take it
    with pytest.raises(ResourceUnavailable):
        pool.acquire_all([r])
    pool.release_all(lease)
    # released but throttled: still unavailable until the interval passes
    with pytest.raises(ResourceUnavailable):
        pool.acquire_all([r])
    clock.advance(1.1)
    assert pool.acquire_all([r])


def test_acquisition_order_deterministic():
    rs = [
        ThrottledWorkResource(name="z-throttle", throttle_rate_ms=10),
        ConcurrencyWorkResource(name="b-conc", concurrency=1),
        ThrottledWorkResource(name="a-throttle", throttle_rate_ms=10),
        ConcurrencyWorkResource(name="a-conc", concurrency=1),
    ]
    ordered = ResourcePool.acquisition_order(rs)
    assert [r.name for r in ordered] == ["a-conc", "b-conc", "a-throttle", "z-throttle"]


def test_all_or_nothing_rollback():
    clock = FakeClock()
    pool = ResourcePool(clock=clock)
    c = ConcurrencyWorkResource(name="c", concurrency=1)
    t = ThrottledWorkResource(name="t", throttle_rate_ms=1000)
    blocker = pool.acquire_all([t])  # token now out
    with pytest.raises(ResourceUnavailable) as ei:
        pool.acquire_all([c, t])
    assert ei.value.resource.name == "t"
    # the concurrency slot taken during the failed attempt was rolled back
    assert pool.acquire_all([c])
    pool.release_all(blocker)


def test_rollback_does_not_restart_throttle():
    clock = FakeClock()
    pool = ResourcePool(clock=clock)
    t = ThrottledWorkResource(name="t", throttle_rate_ms=1000)
    c = ConcurrencyWorkResource(name="c", concurrency=1)
    hold_c = pool.acquire_all([c])
    # t is free; acquisition of [t, c] takes t then fails on c → t must
    # come back immediately (requeue, not throttle-release)
    with pytest.raises(ResourceUnavailable):
        pool.acquire_all([t, c])
    pool.release_all(hold_c)
    assert pool.acquire_all([t, c])


def test_contention_memory():
    clock = FakeClock()
    mem = RecentResourceContention(60.0, clock=clock)
    r = ConcurrencyWorkResource(name="db", concurrency=1)
    assert mem.time_of_last_contention(r) is None
    mem.failed_to_acquire(r)
    assert mem.time_of_last_contention(r) == 0.0
    clock.advance(10)
    mem.successfully_acquired([r])
    assert mem.time_of_last_contention(r) is None
    mem.failed_to_acquire(r)
    clock.advance(61)
    mem.reset_contents({"db"})
    assert mem.time_of_last_contention(r) is None  # expired by retention
    mem.failed_to_acquire(r)
    mem.reset_contents(set())  # unknown resources dropped
    assert mem.time_of_last_contention(r) is None
