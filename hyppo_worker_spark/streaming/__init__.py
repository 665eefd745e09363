"""Structured Streaming surface: windowed aggregations with
watermarks, session windows, stateful processing, and idempotent
foreachBatch sinks. The reference's streaming analog is its
queue-based at-least-once delivery with TTL expiry (SURVEY.md §2.4);
the engine exposes real stream processing on top of the same
idempotency contract."""

from pyspark.sql.streaming import StreamingQuery


def drain_stream(q: StreamingQuery, timeout: int = 300) -> None:
    """Block until the streaming query terminates, failing LOUDLY on
    timeout. ``awaitTermination(t)`` returns False when the query is
    still running after ``t`` seconds; ignoring that boolean lets a
    caller read a partially-written sink and the in-flight query's
    recentProgress — which surfaces downstream as a confusing oracle
    hash mismatch (and lets scoped_conf restore shuffle settings
    while state stores are still being created). Stop the straggler
    and raise instead."""
    if not q.awaitTermination(timeout):
        q.stop()
        raise RuntimeError(
            f"streaming query {q.name or q.id} did not drain within "
            f"{timeout}s — sink output would be partial"
        )
