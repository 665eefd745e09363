"""Incremental HLL maintenance: after draining events in micro-batches
the per-day estimates must sit within the sketch tolerance of exact
batch distincts, event counts must be exact, and a replayed batch must
not double-count."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hyppo_worker_spark.session import load_tables
from hyppo_worker_spark.streaming.pipeline import EVENTS_SCHEMA
from hyppo_worker_spark.streaming.sketch_maintenance import (
    SketchRollupSink,
    maintain_sketches,
)

SF_DIR = "/root/testdata/sf0.001"


def test_incremental_sketches_match_batch(spark, tmp_path):
    src = str(tmp_path / "ev")
    ev = load_tables(spark, SF_DIR, ("events",))["events"]
    ev.repartition(3).write.mode("overwrite").parquet(src)

    sink = SketchRollupSink(spark, str(tmp_path / "store"))
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = maintain_sketches(stream, sink, str(tmp_path / "ckpt"))
    q.awaitTermination(240)

    got = {r.day: (r.est_users, r.n_events) for r in sink.estimates().collect()}

    batch = spark.read.parquet(src).select(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"), "user_id"
    )
    exact = {
        r.day: (r.d, r.n)
        for r in batch.groupBy("day")
        .agg(F.countDistinct("user_id").alias("d"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    exact["TOTAL"] = (
        batch.select("user_id").distinct().count(),
        batch.count(),
    )
    assert set(got) == set(exact)
    for day, (est, n) in got.items():
        d, n_exact = exact[day]
        assert n == n_exact  # counts are exact
        assert abs(est - d) * 20 <= d  # estimate within 5%


def test_replayed_batch_does_not_double_count(spark, tmp_path):
    sink = SketchRollupSink(spark, str(tmp_path / "store"))
    b = spark.createDataFrame(
        [(i, "2024-01-01 10:00:00") for i in range(100)],
        "user_id long, ts_s string",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"))
    sink(b, 0)
    sink(b, 0)  # replay
    rows = {r.day: (r.est_users, r.n_events) for r in sink.estimates().collect()}
    est, n = rows["2024-01-01"]
    assert n == 100  # not 200
    assert abs(est - 100) * 20 <= 100
    # a genuinely new batch still merges
    b2 = spark.createDataFrame(
        [(i, "2024-01-01 11:00:00") for i in range(100, 150)],
        "user_id long, ts_s string",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"))
    sink(b2, 1)
    est2, n2 = {
        r.day: (r.est_users, r.n_events) for r in sink.estimates().collect()
    }["2024-01-01"]
    assert n2 == 150
    assert abs(est2 - 150) * 20 <= 150
    assert os.path.isdir(sink.table_dir)
