"""Streaming retention cohorts: the pure step function must emit each
(user, day) cell exactly once and only after its cohort can no longer
be revised by a late earlier event; the end-to-end stream (checkpointed
sequential drains with watermark-pushing sentinels) must reproduce the
batch q42 triangle exactly."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from hyppo_worker_spark.session import load_tables
from hyppo_worker_spark.streaming.pipeline import EVENTS_SCHEMA
from hyppo_worker_spark.streaming.retention import (
    retention_step,
    retention_triangle,
    streaming_retention,
)

SF_DIR = "/root/testdata/sf0.001"


def test_nothing_emits_while_cohort_is_provisional():
    # cohort day 100 > wm_day 50: a late day-40 event could still
    # arrive and shift every offset — emit nothing, keep everything
    cohort, pending, emits = retention_step(None, [], [100, 103], 50)
    assert (cohort, pending, emits) == (100, [100, 103], [])


def test_final_cohort_emits_settled_days_once():
    cohort, pending, emits = retention_step(None, [], [100, 103, 110], 105)
    assert cohort == 100
    assert emits == [(100, 0), (100, 3)]  # 110 >= wm_day stays pending
    assert pending == [110]
    # wm advances past 110: the pending cell emits, nothing re-emits
    cohort, pending, emits = retention_step(cohort, pending, [], 111)
    assert emits == [(100, 10)]
    assert pending == []


def test_late_earlier_event_revises_cohort_before_finality():
    # batch 1 at wm 0: provisional cohort 100
    cohort, pending, _ = retention_step(None, [], [100, 102], 0)
    assert cohort == 100
    # batch 2 delivers a LATE day-90 event (admissible: 90 > wm_day 0)
    cohort, pending, _ = retention_step(cohort, pending, [90], 0)
    assert cohort == 90
    # finality: every offset is measured from the revised cohort
    _, _, emits = retention_step(cohort, pending, [], 200)
    assert emits == [(90, 0), (90, 10), (90, 12)]


def test_cohort_day_cell_waits_for_duplicate_safety():
    # cohort 100 is final at wm_day 100 (<=), but day 100 itself can
    # still receive events (day(ts) >= wm_day) -> cell must wait
    cohort, pending, emits = retention_step(None, [], [100], 100)
    assert (cohort, emits) == (100, [])
    assert pending == [100]
    _, pending, emits = retention_step(cohort, pending, [], 101)
    assert emits == [(100, 0)]
    assert pending == []


def test_chunked_delivery_equals_single_batch_property():
    """Hypothesis: for ANY day multiset split into ANY chunks delivered
    at wm 0 (everything admissible), a final huge-wm step emits exactly
    the single-batch cells — order, dedup, and offsets intact."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        days=st.lists(st.integers(1, 60), min_size=1, max_size=12),
        cuts=st.lists(st.integers(0, 11), max_size=3),
    )
    def run(days, cuts):
        lo = min(days)
        expected = sorted((lo, d - lo) for d in set(days))
        # single batch
        _, _, emits_w = retention_step(None, [], days, 1_000)
        assert sorted(emits_w) == expected
        # chunked: split at (wrapped) cut points, drain at wm 0, then
        # finalize with a huge watermark
        n_chunks = len(cuts) + 1
        chunks = [[] for _ in range(n_chunks)]
        for i, d in enumerate(days):
            which = sum(1 for c in cuts if i >= c % len(days)) % n_chunks
            chunks[which].append(d)
        cohort, pending = None, []
        got = []
        for ch in chunks:
            cohort, pending, emits = retention_step(cohort, pending, ch, 0)
            got.extend(emits)
        cohort, pending, emits = retention_step(cohort, pending, [], 1_000)
        got.extend(emits)
        assert sorted(got) == expected
        assert pending == []

    run()


def test_streaming_retention_matches_batch_triangle(spark, tmp_path):
    """Sequential checkpointed drains: file 1 carries every real event
    (wm 0 — nothing emits), files 2 and 3 carry far-future sentinel
    events whose only job is to push the watermark past all real days.
    Since no real event is ever late, nothing is watermark-dropped, and
    the emitted cells must equal the batch activity table EXACTLY."""
    src = str(tmp_path / "ret-src")
    sink = str(tmp_path / "ret-sink")
    ckpt = str(tmp_path / "ret-ckpt")

    ev = (
        load_tables(spark, SF_DIR, ("events",))["events"]
        .select("event_id", "ts", "user_id", "event_type", "value")
    )
    ev.coalesce(1).write.mode("overwrite").parquet(src)
    max_ts = ev.agg(F.max("ts")).first()[0]

    def sentinel(uid: int, days_ahead: int):
        return spark.createDataFrame(
            [
                Row(
                    event_id=-1,
                    ts=max_ts + datetime.timedelta(days=days_ahead),
                    user_id=uid,
                    event_type="noise",
                    value=0.0,
                )
            ],
            EVENTS_SCHEMA,
        )

    def drain():
        stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
        q = (
            streaming_retention(stream, delay="1 second")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drain()  # batch 1: wm 0, everything pending
    sentinel(-1, 40).coalesce(1).write.mode("append").parquet(src)
    drain()  # wm = real max - 1s: all but the last real day emit
    sentinel(-2, 80).coalesce(1).write.mode("append").parquet(src)
    drain()  # wm past every real day AND the first sentinel's day

    cells = spark.read.parquet(sink).filter(F.col("user_id") >= 0)
    got = sorted(
        (r.user_id, r.cohort_day.isoformat(), r.days_since)
        for r in cells.collect()
    )

    activity = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("day").alias("c"))
    expected = sorted(
        (r.user_id, r.c.isoformat(), (r.day - r.c).days)
        for r in activity.join(cohort, "user_id").collect()
    )
    assert got == expected  # one row per (user, day), exact offsets

    # and the aggregated triangle equals the batch q42 aggregation
    tri = {
        (r.cohort_day, r.days_since): r.n_active
        for r in retention_triangle(cells).collect()
    }
    batch_tri = {}
    for _, c, off in expected:
        if off <= 7:
            batch_tri[(c, off)] = batch_tri.get((c, off), 0) + 1
    assert tri == batch_tri
