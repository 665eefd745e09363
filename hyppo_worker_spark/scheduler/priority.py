"""Work-queue priority orderings and the nested lexicographic
prioritizer.

Behavior parity with
``worker/.../scheduling/PriorityOrdering.scala:15-49`` and
``WorkQueuePrioritizer.scala:14-75``; default chain
ExpectedCompletion → IdleSinceMinute → AbsoluteSize → Shuffle
(``config/HyppoWorkerModule.scala:68-75``):

- **ExpectedCompletion**: descending estimated drain time
  ``ready / rate`` (rate 0 → +∞, i.e. first). Longest-ETA queues get
  attention first.
- **IdleSinceMinute**: ascending idle-since truncated to the minute —
  least recently active first.
- **AbsoluteSize**: ascending backlog size.
- **Shuffle**: random tie-break.

Each ordering only *groups* equal elements for the next ordering in
the chain; the nested application is what the property tests pin down
(head minimizes the first ordering; output is a permutation).
"""

from __future__ import annotations

import math
import random
from collections.abc import Callable, Iterable, Iterator, Sequence
from dataclasses import dataclass, field
from datetime import datetime, timezone


def _utcnow() -> datetime:
    return datetime.now(timezone.utc)


@dataclass(frozen=True)
class QueueDetails:
    """Per-queue stats record (parity:
    ``worker/.../actor/amqp/QueueDetails.scala:34-47``)."""

    queue_name: str
    size: int
    rate: float
    ready: int
    unacknowledged: int
    idle_since: datetime = field(default_factory=_utcnow)


class PriorityOrdering:
    """Key-based ordering; ``key(q)`` sorts ascending. Orderings that
    need randomization override ``arrange`` instead."""

    def key(self, q: QueueDetails):  # pragma: no cover - interface
        raise NotImplementedError

    def arrange(self, queues: Sequence[QueueDetails]) -> list[QueueDetails]:
        return sorted(queues, key=self.key)

    def group_key(self, q: QueueDetails):
        return self.key(q)


class ExpectedCompletionOrdering(PriorityOrdering):
    @staticmethod
    def estimated_completion(q: QueueDetails) -> float:
        return math.inf if q.rate == 0.0 else q.ready / q.rate

    def key(self, q: QueueDetails):
        return -self.estimated_completion(q)


class IdleSinceMinuteOrdering(PriorityOrdering):
    def key(self, q: QueueDetails):
        return int(q.idle_since.replace(second=0, microsecond=0).timestamp())


class AbsoluteSizeOrdering(PriorityOrdering):
    def key(self, q: QueueDetails):
        return q.size


class ShuffleOrdering(PriorityOrdering):
    """Random permutation; every element forms its own group."""

    def __init__(self, rng: random.Random | None = None):
        self.rng = rng or random.Random()

    def arrange(self, queues: Sequence[QueueDetails]) -> list[QueueDetails]:
        out = list(queues)
        self.rng.shuffle(out)
        return out

    def group_key(self, q: QueueDetails):
        return id(q)  # no two elements compare equal


class WorkQueuePrioritizer:
    """Lazily applies the ordering chain within equal groups
    (structural port of the recursive nesting prioritizer)."""

    def __init__(self, orderings: Sequence[PriorityOrdering]):
        if not orderings:
            raise ValueError("at least one ordering required")
        self.orderings = list(orderings)

    @classmethod
    def default(cls, rng: random.Random | None = None) -> "WorkQueuePrioritizer":
        return cls(
            [
                ExpectedCompletionOrdering(),
                IdleSinceMinuteOrdering(),
                AbsoluteSizeOrdering(),
                ShuffleOrdering(rng),
            ]
        )

    def prioritize(self, queues: Iterable[QueueDetails]) -> Iterator[QueueDetails]:
        yield from self._recurse(self.orderings, list(queues))

    def _recurse(
        self, chain: Sequence[PriorityOrdering], queues: list[QueueDetails]
    ) -> Iterator[QueueDetails]:
        if len(queues) <= 1:
            yield from queues
            return
        head, *tail = chain
        arranged = head.arrange(queues)
        for group in _equal_runs(arranged, head.group_key):
            if not tail or len(group) == 1:
                yield from group
            else:
                yield from self._recurse(tail, group)


def _equal_runs(
    arranged: Sequence[QueueDetails], keyfn: Callable
) -> Iterator[list[QueueDetails]]:
    """Split an arranged sequence into runs of equal ordering keys."""
    run: list[QueueDetails] = []
    run_key = None
    for q in arranged:
        k = keyfn(q)
        if run and k != run_key:
            yield run
            run = []
        run_key = k
        run.append(q)
    if run:
        yield run
