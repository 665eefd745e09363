"""Driver-side scheduler: queues, priorities, resources, delegation.

Re-expresses the reference's RabbitMQ/Akka control plane
(``worker/src/main/scala/com/harrys/hyppo/worker/scheduling/`` and
``.../actor/queue/``) as an in-driver scheduler: a queue table with
TTL expiry, the nested priority-ordering chain, semaphore/token-bucket
resources with Gompertz contention backoff, affinity-aware delegation,
and idempotency-aware ack semantics. Spark executes the data plane;
this layer decides what runs next.
"""

from hyppo_worker_spark.scheduler.priority import (
    AbsoluteSizeOrdering,
    ExpectedCompletionOrdering,
    IdleSinceMinuteOrdering,
    QueueDetails,
    ShuffleOrdering,
    WorkQueuePrioritizer,
)
from hyppo_worker_spark.scheduler.sigmoid import gompertz, gompertz_backoff_factor

__all__ = [
    "AbsoluteSizeOrdering",
    "ExpectedCompletionOrdering",
    "IdleSinceMinuteOrdering",
    "QueueDetails",
    "ShuffleOrdering",
    "WorkQueuePrioritizer",
    "gompertz",
    "gompertz_backoff_factor",
]
