"""Property tests for the prioritizer + Gompertz backoff — ports of
the reference's ScalaCheck suites
(``GompertzFunctionTests.scala:12-50``,
``WorkQueuePrioritizerTests.scala:14-31``) using hypothesis, with the
generator ranges from ``CustomGens.scala:74-98`` (FIXTURES.md F5)."""

import math
from collections import Counter
from datetime import datetime, timedelta, timezone

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hyppo_worker_spark.scheduler import (
    AbsoluteSizeOrdering,
    ExpectedCompletionOrdering,
    IdleSinceMinuteOrdering,
    QueueDetails,
    ShuffleOrdering,
    WorkQueuePrioritizer,
    gompertz,
    gompertz_backoff_factor,
)

_now = datetime(2026, 1, 1, tzinfo=timezone.utc)


@st.composite
def queue_details(draw):
    size = draw(st.integers(0, 100))
    ready = draw(st.integers(0, size))
    return QueueDetails(
        queue_name=draw(st.text("abcdef", min_size=1, max_size=8)),
        size=size,
        rate=draw(st.floats(0.0, 5.0, allow_nan=False)),
        ready=ready,
        unacknowledged=size - ready,
        idle_since=_now - timedelta(seconds=draw(st.integers(0, 3600))),
    )


@given(st.lists(queue_details(), max_size=30))
@settings(max_examples=200, deadline=None)
def test_prioritize_preserves_multiset(queues):
    p = WorkQueuePrioritizer.default()
    out = list(p.prioritize(queues))
    assert Counter(id(q) for q in out) == Counter(id(q) for q in queues)


@given(st.lists(queue_details(), min_size=1, max_size=30))
@settings(max_examples=200, deadline=None)
def test_head_minimizes_first_ordering(queues):
    first = ExpectedCompletionOrdering()
    p = WorkQueuePrioritizer([first, IdleSinceMinuteOrdering(), AbsoluteSizeOrdering()])
    head = next(p.prioritize(queues))
    assert first.key(head) == min(first.key(q) for q in queues)


@given(st.lists(queue_details(), min_size=1, max_size=30))
@settings(max_examples=100, deadline=None)
def test_nested_ordering_is_lexicographic(queues):
    chain = [ExpectedCompletionOrdering(), AbsoluteSizeOrdering()]
    p = WorkQueuePrioritizer(chain)
    out = list(p.prioritize(queues))
    keys = [(chain[0].key(q), chain[1].key(q)) for q in out]
    assert keys == sorted(keys)


def test_expected_completion_semantics():
    fast = QueueDetails("fast", size=10, rate=5.0, ready=10, unacknowledged=0, idle_since=_now)
    slow = QueueDetails("slow", size=10, rate=0.1, ready=10, unacknowledged=0, idle_since=_now)
    stuck = QueueDetails("stuck", size=5, rate=0.0, ready=5, unacknowledged=0, idle_since=_now)
    p = WorkQueuePrioritizer([ExpectedCompletionOrdering()])
    out = [q.queue_name for q in p.prioritize([fast, slow, stuck])]
    # longest ETA first; rate 0 → infinite ETA → very first
    assert out == ["stuck", "slow", "fast"]


def test_idle_since_minute_truncation_groups():
    a = QueueDetails("a", 1, 1.0, 1, 0, idle_since=_now.replace(second=5))
    b = QueueDetails("b", 2, 1.0, 2, 0, idle_since=_now.replace(second=40))
    o = IdleSinceMinuteOrdering()
    assert o.key(a) == o.key(b)  # same minute → equal group


@given(st.lists(queue_details(), max_size=20))
@settings(max_examples=100, deadline=None)
def test_shuffle_is_permutation(queues):
    p = WorkQueuePrioritizer([ShuffleOrdering()])
    out = list(p.prioritize(queues))
    assert Counter(id(q) for q in out) == Counter(id(q) for q in queues)


# -- Gompertz ----------------------------------------------------------


@given(st.integers(0, 100000), st.floats(1e-6, 10.0), st.floats(1e-6, 100.0))
@settings(max_examples=500, deadline=None)
def test_gompertz_backoff_in_unit_interval(seconds, scale, delay):
    # delay (the configured min-delay seconds) bounded to realistic
    # values: e^-b underflows to exactly 0.0 for b ≳ 745, which is
    # outside any configurable backoff window.
    y = gompertz_backoff_factor(seconds, scale, delay)
    assert 0.0 < y <= 1.0


@given(st.integers(0, 10000), st.integers(0, 10000))
@settings(max_examples=200, deadline=None)
def test_gompertz_monotone_in_time(t1, t2):
    lo, hi = sorted((t1, t2))
    y_lo = gompertz_backoff_factor(lo, 0.2, 5.0)
    y_hi = gompertz_backoff_factor(hi, 0.2, 5.0)
    assert y_lo <= y_hi + 1e-12


def test_gompertz_validation():
    with pytest.raises(ValueError):
        gompertz(0.0, 1.0, 1.0, 1.0)
    with pytest.raises(ValueError):
        gompertz(1.0, -1.0, 1.0, 1.0)
    with pytest.raises(ValueError):
        gompertz(1.0, 1.0, 0.0, 1.0)
    with pytest.raises(ValueError):
        gompertz_backoff_factor(-1, 0.2, 5.0)


def test_gompertz_reference_shape():
    """Defaults (scale 0.2, delay 5): near 0 at t=0, ~1 for large t."""
    assert gompertz_backoff_factor(0, 0.2, 5.0) == pytest.approx(math.exp(-5.0))
    assert gompertz_backoff_factor(60, 0.2, 5.0) > 0.99
