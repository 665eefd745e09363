"""Structured Streaming drains: file source → windowed/session/stateful
aggregations → memory sink, verified against the equivalent batch
computation on the same data; idempotent foreachBatch guard."""

import pytest
from pyspark.sql import functions as F

from hyppo_worker_spark.session import load_tables
from hyppo_worker_spark.streaming.pipeline import (
    EVENTS_SCHEMA,
    IdempotentBatchSink,
    running_user_totals,
    session_windows,
    windowed_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def event_source_dir(spark, tmp_path_factory):
    """Events re-landed as micros-timestamp parquet (the raw table is
    TIMESTAMP(NANOS) which neither batch nor streaming Spark reads
    natively) split into 3 files to give the stream multiple batches."""
    out = str(tmp_path_factory.mktemp("events-stream"))
    ev = load_tables(spark, SF_DIR, ("events",))["events"]
    ev.repartition(3).write.mode("overwrite").parquet(out)
    return out


def _drain(stream_df, out_name, mode):
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(out_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_counts_match_batch(spark, event_source_dir):
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(event_source_dir)
    _drain(windowed_counts(stream), "win_out", "append")
    got = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    batch = (
        spark.read.parquet(event_source_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
    )
    expected = {
        (r.window_start, r.event_type): (r.n, r.v) for r in batch.collect()
    }
    # append mode emits only watermark-closed windows: every emitted
    # window must match the batch result exactly
    assert got
    for k, v in got.items():
        assert expected[k] == v


def test_running_user_totals_complete_mode(spark, event_source_dir):
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(event_source_dir)
    _drain(running_user_totals(stream), "tot_out", "complete")
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM tot_out").collect()
    }
    batch = (
        spark.read.parquet(event_source_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
    )
    expected = {r.user_id: (r.n, r.v) for r in batch.collect()}
    assert got == expected


def test_session_windows_emit(spark, event_source_dir):
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(event_source_dir)
    _drain(session_windows(stream), "sess_out", "append")
    rows = spark.sql("SELECT * FROM sess_out").collect()
    assert rows
    assert all(r.session_start <= r.session_end for r in rows)
    assert all(r.n_events >= 1 for r in rows)


def test_idempotent_batch_sink(spark, tmp_path):
    written = []
    sink = IdempotentBatchSink(str(tmp_path / "markers"), lambda df, bid: written.append(bid))
    df = spark.range(3)
    sink(df, 7)
    assert written == [7]
    sink(df, 7)  # replay of a started batch must be skipped
    assert written == [7]
    assert sink.skipped == [7]
    sink(df, 8)
    assert written == [7, 8]


def test_stateful_running_totals(spark, event_source_dir):
    """applyInPandasWithState: final per-user state must equal the
    batch aggregate; per-batch emissions must accumulate monotonically."""
    from hyppo_worker_spark.streaming.stateful import stateful_running_totals

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(event_source_dir)
    )
    out = stateful_running_totals(stream.select("user_id", "value"))
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("state_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM state_out").collect()
    assert rows
    # final cumulative state per user = last emission (max n_events)
    final = {}
    for r in rows:
        if r.user_id not in final or r.n_events > final[r.user_id][0]:
            final[r.user_id] = (r.n_events, r.total_value)
    from pyspark.sql import functions as F

    batch = (
        spark.read.parquet(event_source_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
    )
    expected = {r.user_id: (r.n, r.v) for r in batch.collect()}
    assert final == expected
    # monotone accumulation across batches per user
    per_user = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(r.n_events)
    assert all(ns == sorted(ns) for ns in per_user.values())


def test_stream_stream_interval_join(spark, event_source_dir):
    """Stream-stream join result must equal the equivalent batch join."""
    from hyppo_worker_spark.streaming.pipeline import click_purchase_interval_join

    def split(df):
        return (
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "purchase"),
        )

    sc, sp = split(spark.readStream.schema(EVENTS_SCHEMA).parquet(event_source_dir))
    out = click_purchase_interval_join(sc, sp, within="1 hour")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.click_id, r.purchase_ts) for r in spark.sql("SELECT * FROM ssj_out").collect()
    }
    bc, bp = split(spark.read.parquet(event_source_dir))
    batch = click_purchase_interval_join(
        bc.withColumnRenamed("x", "x"), bp
    )  # same builder works on batch DFs (watermark is a no-op)
    expected = {(r.click_id, r.purchase_ts) for r in batch.collect()}
    assert got == expected
    assert got  # non-trivial


def test_streaming_dedup_drops_replayed_events(spark, event_source_dir, tmp_path):
    """Replayed (at-least-once) events are dropped by the watermarked
    dedup: output matches batch-distinct on event_id, with bounded
    per-key state."""
    from hyppo_worker_spark.streaming.pipeline import streaming_dedup

    # double-land the source: every file delivered twice
    src = str(tmp_path / "replayed")
    ev = spark.read.parquet(event_source_dir)
    ev.write.mode("overwrite").parquet(src)
    ev.write.mode("append").parquet(src)

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    _drain(streaming_dedup(stream), "dedup_out", "append")
    got = spark.sql("SELECT event_id, count(*) AS n FROM dedup_out GROUP BY event_id")
    dupes = got.filter("n > 1").count()
    assert dupes == 0
    assert got.count() == ev.select("event_id").distinct().count()


def test_transform_with_state_user_profiles(spark, event_source_dir):
    """Spark 4 transformWithStateInPandas with composite state: runs
    end-to-end when protobuf is available; otherwise asserts the
    environment gate raises the documented NotImplementedError."""
    from hyppo_worker_spark.streaming.stateful import (
        _has_protobuf,
        user_event_profiles,
    )

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(event_source_dir)
    if not _has_protobuf():
        with pytest.raises(NotImplementedError, match="protobuf"):
            user_event_profiles(stream)
        return
    _drain(user_event_profiles(stream), "profile_out", "append")
    rows = spark.sql(
        """
        SELECT user_id, n_events, total_value, n_types, top_type
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY n_events DESC
            ) AS rn
            FROM profile_out
        ) WHERE rn = 1
        """
    ).collect()
    assert rows


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _FakeMapState:
    def __init__(self):
        self._m = {}

    def containsKey(self, k):
        return k in self._m

    def getValue(self, k):
        return self._m[k]

    def updateValue(self, k, v):
        self._m[k] = v

    def iterator(self):
        return iter(self._m.items())


class _FakeHandle:
    def getValueState(self, name, schema, ttlDurationMs=None):
        return _FakeValueState()

    def getMapState(self, name, ks, vs, ttlDurationMs=None):
        return _FakeMapState()


def test_user_profile_processor_logic_jvm_free():
    """Drive UserProfileProcessor directly with fake state handles:
    composite state accumulates across batches and the dominant type
    breaks ties deterministically (lexicographically last)."""
    import pandas as pd

    from hyppo_worker_spark.streaming.stateful import UserProfileProcessor

    p = UserProfileProcessor()
    p.init(_FakeHandle())
    b1 = pd.DataFrame(
        {"event_type": ["click", "view", "view"], "value": [1.0, 2.0, 3.0]}
    )
    out1 = list(p.handleInputRows((7,), iter([b1]), None))[0]
    assert out1.iloc[0].tolist() == [7, 3, 6.0, 2, "view"]

    # Second batch: clicks catch up to views -> tie -> "view" still
    # wins (lexicographically last); totals accumulate across batches.
    b2 = pd.DataFrame({"event_type": ["click"], "value": [4.0]})
    out2 = list(p.handleInputRows((7,), iter([b2]), None))[0]
    assert out2.iloc[0].tolist() == [7, 4, 10.0, 2, "view"]

    # Third batch: clicks pull ahead.
    b3 = pd.DataFrame({"event_type": ["click"], "value": [0.5]})
    out3 = list(p.handleInputRows((7,), iter([b3]), None))[0]
    assert out3.iloc[0].tolist() == [7, 5, 10.5, 2, "click"]


def test_drain_stream_raises_on_timeout(spark):
    """drain_stream must fail LOUDLY when the query outlives the
    timeout (a rate stream never self-terminates) and stop the
    straggler — silently reading a partial sink was the ADVICE r7
    failure mode."""
    from hyppo_worker_spark.streaming import drain_stream

    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .writeStream.format("noop")
        .start()
    )
    try:
        with pytest.raises(RuntimeError, match="did not drain"):
            drain_stream(q, 1)
        assert not q.isActive
    finally:
        if q.isActive:
            q.stop()


def test_drain_stream_returns_on_completion(spark, tmp_path):
    """An availableNow query that drains inside the timeout returns
    normally."""
    from hyppo_worker_spark.streaming import drain_stream

    src = str(tmp_path / "src")
    spark.range(10).write.parquet(src)
    q = (
        spark.readStream.schema("id bigint")
        .parquet(src)
        .writeStream.format("noop")
        .trigger(availableNow=True)
        .start()
    )
    drain_stream(q, 120)
    assert not q.isActive
