"""Work-queue table semantics: naming, TTL dead-lettering, ack/requeue,
redelivery flags, rate EMA, logical rollup (reference analogs:
``QueueCreationTests`` / ``QueueNamingTests`` / queueing invariants)."""

from hyppo_worker_spark.model import (
    ConcurrencyWorkResource,
    IntegrationDetails,
    ValidateIntegrationRequest,
)
from hyppo_worker_spark.scheduler.queues import QueueNaming, WorkQueueTable


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t

    def advance(self, s):
        self.t += s


def _item(source="Src A", version=1, resources=()):
    return ValidateIntegrationRequest(
        integration=IntegrationDetails(
            source_name=source, version_number=version, is_raw_data_integration=False
        ),
        resources=tuple(resources),
    )


def test_naming_scheme():
    n = QueueNaming(prefix="p")
    assert n.general == "p.general"
    assert n.results == "p.results"
    assert n.expired == "p.expired"
    assert n.integration("My Source.x", 3) == "p.integration.My_Source-x-v3"
    r = ConcurrencyWorkResource(name="db", concurrency=1)
    with_res = n.integration("S", 1, (r,))
    assert with_res.startswith("p.integration.S-v1.")
    suffix = with_res.rsplit(".", 1)[1]
    assert len(suffix) == 8
    # same resource set → same suffix (deterministic md5)
    assert with_res == n.integration("S", 1, (r,))
    assert n.belongs_to_integration("S", 1, with_res)
    assert not n.belongs_to_integration("S", 2, with_res)


def test_enqueue_routes_to_integration_queue():
    q = WorkQueueTable()
    name = q.enqueue(_item("Src A"))
    assert name == "hyppo.integration.Src_A-v1"
    assert q.details(name).ready == 1


def test_basic_get_moves_to_unacked_and_ack_clears():
    q = WorkQueueTable()
    name = q.enqueue(_item())
    d = q.basic_get(name)
    assert d is not None and not d.redelivered
    st = q.details(name)
    assert st.ready == 0 and st.unacknowledged == 1 and st.size == 1
    q.ack(d)
    st = q.details(name)
    assert st.size == 0


def test_reject_requeue_sets_redelivered():
    q = WorkQueueTable()
    name = q.enqueue(_item())
    d1 = q.basic_get(name)
    q.reject_requeue(d1)
    assert q.details(name).ready == 1
    d2 = q.basic_get(name)
    assert d2.redelivered


def test_ttl_dead_letters_to_expired():
    clock = FakeClock()
    q = WorkQueueTable(clock=clock)
    name = q.enqueue(_item(), ttl_s=10.0)
    q.enqueue(_item(), ttl_s=100.0, queue=name)
    clock.advance(11.0)
    expired = q.sweep_expired()
    assert len(expired) == 1
    assert expired[0][0] == name
    assert q.details(name).ready == 1  # the long-TTL item survives


def test_rate_ema_updates_on_ack():
    clock = FakeClock()
    q = WorkQueueTable(clock=clock)
    name = q.enqueue(_item())
    q.enqueue(_item(), queue=name)
    d = q.basic_get(name)
    q.ack(d)
    assert q.details(name).rate == 0.0  # first completion: no interval yet
    clock.advance(2.0)
    d = q.basic_get(name)
    q.ack(d)
    assert q.details(name).rate > 0.0  # EMA of 1 completion / 2s


def test_logical_rollup_groups_resource_suffixes():
    q = WorkQueueTable()
    r = ConcurrencyWorkResource(name="db", concurrency=1)
    base = q.enqueue(_item("S"))
    suff = q.enqueue(_item("S", resources=(r,)))
    assert base != suff
    rollup = q.logical_rollup()
    assert rollup[base].size == 2  # both queues folded into the base entry


def test_merge_queue_details_reference_semantics():
    """MultiQueueDetails (QueueDetails.scala:50-92): summed sizes,
    size-WEIGHTED mean rate, EARLIEST idleSince."""
    from datetime import datetime, timezone

    from hyppo_worker_spark.scheduler.priority import QueueDetails
    from hyppo_worker_spark.scheduler.queues import merge_queue_details

    t1 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    t2 = datetime(2024, 2, 1, tzinfo=timezone.utc)
    a = QueueDetails("a", size=3, rate=2.0, ready=2, unacknowledged=1,
                     idle_since=t2)
    b = QueueDetails("b", size=1, rate=10.0, ready=1, unacknowledged=0,
                     idle_since=t1)
    m = merge_queue_details("logical", [a, b])
    assert m.size == 4 and m.ready == 3 and m.unacknowledged == 1
    # weighted: 2.0*(3/4) + 10.0*(1/4) = 4.0 — NOT the plain sum 12.0
    assert m.rate == 4.0
    assert m.idle_since == t1  # earliest, not latest


def test_merge_queue_details_zero_size_rate_is_zero():
    from hyppo_worker_spark.scheduler.priority import QueueDetails
    from hyppo_worker_spark.scheduler.queues import merge_queue_details

    empty = [
        QueueDetails("a", size=0, rate=5.0, ready=0, unacknowledged=0),
        QueueDetails("b", size=0, rate=7.0, ready=0, unacknowledged=0),
    ]
    assert merge_queue_details("l", empty).rate == 0.0


def test_logical_rollup_single_member_passes_through_unchanged():
    """Reference seq.head: a one-queue group IS its SingleQueueDetails,
    original queue_name included."""
    q = WorkQueueTable()
    name = q.enqueue(_item("Solo"))
    rollup = q.logical_rollup()
    assert rollup[name].queue_name == name
    assert rollup[name].size == 1


def test_logical_rollup_weighted_rate(clock=None):
    """Two same-source queues with different rates merge to the
    size-weighted mean through the real broker path."""
    clock = FakeClock()
    q = WorkQueueTable(clock=clock)
    r = ConcurrencyWorkResource(name="db", concurrency=1)
    base = q.enqueue(_item("W"))
    suff = q.enqueue(_item("W", resources=(r,)))
    # drive each queue's EMA with one completion pair: rate = 0.3/dt
    for name, dt in ((base, 2.0), (suff, 5.0)):
        q.enqueue(_item("W") if name == base
                  else _item("W", resources=(r,)))
        d = q.basic_get(name)
        q.ack(d)  # first ack: sets last_completion, rate stays 0
        clock.advance(dt)
        d = q.basic_get(name)
        q.ack(d)
    # both queues now have size 0 -> re-add one item each for weights
    q.enqueue(_item("W"))
    q.enqueue(_item("W", resources=(r,)))
    got = q.logical_rollup()[base]
    assert got.size == 2
    assert got.rate == (0.3 / 2.0) * 0.5 + (0.3 / 5.0) * 0.5


def test_stub_details_zeros():
    from hyppo_worker_spark.scheduler.queues import stub_details

    s = stub_details("never.created")
    assert (s.size, s.rate, s.ready, s.unacknowledged) == (0, 0.0, 0, 0)
    assert s.queue_name == "never.created"


def test_reject_requeue_max_deliveries_dead_letters():
    """Poison-message policy: the Nth redelivery dead-letters to the
    expired collection instead of requeuing."""
    q = WorkQueueTable()
    name = q.enqueue(_item())
    d1 = q.basic_get(name)
    assert d1.item.delivery_count == 1 and not d1.redelivered
    assert q.reject_requeue(d1, max_deliveries=2) == "requeued"
    d2 = q.basic_get(name)
    assert d2.item.delivery_count == 2 and d2.redelivered
    assert q.reject_requeue(d2, max_deliveries=2) == "dead_lettered"
    assert q.details(name).ready == 0
    expired = q.sweep_expired()
    assert len(expired) == 1 and expired[0][0] == name


def test_requeue_all_unacked_worker_death():
    """Worker death: every unacked in-flight delivery returns to its
    queue for redelivery (IdempotentWorkQueueingTests.scala:38-64)."""
    q = WorkQueueTable()
    name_a = q.enqueue(_item("A"))
    name_b = q.enqueue(_item("B"))
    da = q.basic_get(name_a)
    q.basic_get(name_b)
    assert q.details(name_a).unacknowledged == 1
    assert q.requeue_all_unacked() == 2
    assert q.details(name_a).ready == 1 and q.details(name_a).unacknowledged == 0
    assert q.details(name_b).ready == 1
    # the stale delivery handle is now inert
    assert q.reject_requeue(da) == "unknown"
    redelivered = q.basic_get(name_a)
    assert redelivered.redelivered
