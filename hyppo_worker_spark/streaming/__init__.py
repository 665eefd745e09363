"""Structured Streaming surface: windowed aggregations with
watermarks, session windows, stateful processing, and idempotent
foreachBatch sinks. The reference's streaming analog is its
queue-based at-least-once delivery with TTL expiry (SURVEY.md §2.4);
the engine exposes real stream processing on top of the same
idempotency contract."""
