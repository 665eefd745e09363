"""The engine's stateful streaming operators on the RocksDB state
store — the production provider for state that exceeds executor heap
(Spark ships it built-in; at 100 TB-scale ingest, HDFS-backed
in-memory state is the toy and RocksDB the real deployment). These
tests pin that the operators the registry exercises
(dropDuplicatesWithinWatermark; the watermarked stream-stream join)
produce byte-identical results under
``RocksDBStateStoreProvider`` and the default provider, so switching
providers in production is a pure config change."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from hyppo_worker_spark.session import scoped_conf

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def _stage(df, src_dir: str, work: str, tag: str) -> None:
    os.makedirs(src_dir, exist_ok=True)
    stage = os.path.join(work, f"stage-{tag}")
    df.coalesce(1).write.parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(src_dir, f"{tag}.parquet"))


def _drain_dedup(spark, tmp: str, provider: str | None) -> list[tuple]:
    work = os.path.join(tmp, provider or "default")
    src = os.path.join(work, "src")
    rows = spark.range(200).select(
        (F.col("id") % 120).alias("event_id"),  # planted duplicates
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias(
            "ts"
        ),
    )
    _stage(rows, src, work, "b0")
    out = os.path.join(work, "out")

    def run():
        q = (
            spark.readStream.schema("event_id long, ts timestamp")
            .parquet(src)
            .withWatermark("ts", "1 hour")
            .dropDuplicatesWithinWatermark(["event_id"])
            .writeStream.foreachBatch(
                lambda b, _i: b.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    if provider:
        with scoped_conf(
            spark, "spark.sql.streaming.stateStore.providerClass", provider
        ):
            run()
    else:
        run()
    return sorted(
        tuple(r) for r in spark.read.parquet(out).collect()
    )


def test_dedup_identical_under_rocksdb(spark, tmp_path):
    default = _drain_dedup(spark, str(tmp_path), None)
    rocks = _drain_dedup(spark, str(tmp_path), ROCKSDB)
    assert len(default) == 120  # duplicates dropped
    assert rocks == default


def _drain_join(spark, tmp: str, provider: str | None) -> list[tuple]:
    work = os.path.join(tmp, (provider or "default") + "-join")
    left_src = os.path.join(work, "left")
    right_src = os.path.join(work, "right")
    base = F.lit(1_700_000_000)
    left = spark.range(50).select(
        F.col("id").alias("k"),
        F.timestamp_seconds(base + F.col("id") * 60).alias("lts"),
    )
    right = spark.range(150).select(
        (F.col("id") % 50).alias("k2"),
        F.timestamp_seconds(
            base + (F.col("id") % 50) * 60 + (F.col("id") % 3) * 30
        ).alias("rts"),
    )
    _stage(left, left_src, work, "l0")
    _stage(right, right_src, work, "r0")
    out = os.path.join(work, "out")

    def run():
        ls = (
            spark.readStream.schema("k long, lts timestamp")
            .parquet(left_src)
            .withWatermark("lts", "10 minutes")
        )
        rs = (
            spark.readStream.schema("k2 long, rts timestamp")
            .parquet(right_src)
            .withWatermark("rts", "10 minutes")
        )
        joined = ls.join(
            rs,
            (F.col("k") == F.col("k2"))
            & (F.col("rts") >= F.col("lts"))
            & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 1 MINUTE")),
            "inner",
        ).select("k", "lts", "rts")
        q = (
            joined.writeStream.foreachBatch(
                lambda b, _i: b.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    if provider:
        with scoped_conf(
            spark, "spark.sql.streaming.stateStore.providerClass", provider
        ):
            run()
    else:
        run()
    return sorted(tuple(r) for r in spark.read.parquet(out).collect())


def test_stream_stream_join_identical_under_rocksdb(spark, tmp_path):
    default = _drain_join(spark, str(tmp_path), None)
    rocks = _drain_join(spark, str(tmp_path), ROCKSDB)
    assert len(default) == 150  # every right row lands in-window
    assert rocks == default


def _drain_sessions(spark, tmp: str, provider: str | None) -> list[tuple]:
    """Merging session windows (p24's operator) + a sentinel close,
    drained under the given provider; returns the emitted sessions."""
    work = os.path.join(tmp, (provider or "default") + "-sess")
    src = os.path.join(work, "src")
    base = F.lit(1_700_000_000)
    # 20 users x 6 events; gaps alternate 10min (merge) / 2h (split)
    rows = spark.range(120).select(
        (F.col("id") % 20).alias("user_id"),
        F.timestamp_seconds(
            base
            + (F.col("id") % 20) * 7
            + (F.col("id") / 20).cast("long") * 600
            + ((F.col("id") / 60).cast("long") * 7200)
        ).alias("ts"),
    )
    _stage(rows, src, work, "b0")
    sentinel = spark.range(1).select(
        F.lit(-1).cast("long").alias("user_id"),
        F.timestamp_seconds(base + 10_000_000).alias("ts"),
    )
    _stage(sentinel, src, work, "b1")
    out = os.path.join(work, "out")

    def run():
        q = (
            spark.readStream.schema("user_id long, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .withWatermark("ts", "1 hour")
            .groupBy(F.session_window("ts", "30 minutes"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .select("user_id", "n", F.col("session_window.start").alias("s"))
            .writeStream.outputMode("append")
            .foreachBatch(lambda b, _i: b.write.mode("append").parquet(out))
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    if provider:
        with scoped_conf(
            spark, "spark.sql.streaming.stateStore.providerClass", provider
        ):
            run()
    else:
        run()
    return sorted(
        tuple(r)
        for r in spark.read.parquet(out).filter(F.col("user_id") >= 0).collect()
    )


def test_session_windows_identical_under_rocksdb(spark, tmp_path):
    default = _drain_sessions(spark, str(tmp_path), None)
    rocks = _drain_sessions(spark, str(tmp_path), ROCKSDB)
    # 20 users x 2 sessions (the 2h gap splits; 10min gaps merge)
    assert len(default) == 40
    assert rocks == default


def test_state_reader_works_on_rocksdb_checkpoint(spark, tmp_path):
    """p27's introspection path against a RocksDB-backed checkpoint:
    the state data source must read the same state rows back."""
    work = str(tmp_path / "rocks-read")
    src = os.path.join(work, "src")
    rows = spark.range(300).select(
        (F.col("id") % 30).alias("k"), F.col("id").alias("v")
    )
    _stage(rows, src, work, "b0")
    ckpt = os.path.join(work, "ckpt")

    with scoped_conf(
        spark, "spark.sql.streaming.stateStore.providerClass", ROCKSDB
    ):
        q = (
            spark.readStream.schema("k long, v long")
            .parquet(src)
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("v_sum"))
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda b, _i: b.write.format("noop").mode("append").save()
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    state = (
        spark.read.format("statestore")
        .load(ckpt)
        .select(
            F.col("key.k").alias("k"),
            F.col("value.count").alias("n"),
            F.col("value.sum").alias("v_sum"),
        )
    )
    got = {r["k"]: (r["n"], r["v_sum"]) for r in state.collect()}
    assert len(got) == 30
    for k in range(30):
        ids = [i for i in range(300) if i % 30 == k]
        assert got[k] == (len(ids), sum(ids))
