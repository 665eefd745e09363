"""Observability surface: ``DataFrame.observe`` — in-flight metric
accumulators evaluated on the data AS IT FLOWS (no second scan),
batch via ``Observation`` and streaming via each progress event's
``observedMetrics``. This is how a 100 TB pipeline gets row counts /
null counts / invariant checks for free on the back of the real job
instead of paying a separate audit pass (contrast p22, which runs a
deliberate validation PASS over staged data — observe() is the
zero-extra-cost tier of the same quality story).
"""

from __future__ import annotations

import glob
import os
import shutil
import time

from pyspark.sql import functions as F
from pyspark.sql.observation import Observation


def test_batch_observation_piggybacks_on_the_job(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 7).alias("bucket"),
        F.when(F.col("id") % 100 == 0, None)
        .otherwise(F.col("id") * 2)
        .alias("val"),
    )
    obs = Observation("ingest_audit")
    audited = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("val").isNull().cast("long")).alias("n_null_val"),
        F.sum("val").alias("val_sum"),
    )
    # one action drives BOTH the real work and the metrics
    out = audited.groupBy("bucket").count().collect()
    assert len(out) == 7
    got = obs.get
    assert got["n_rows"] == 1000
    assert got["n_null_val"] == 10  # ids 0,100,...,900
    expected_sum = sum(i * 2 for i in range(1000) if i % 100 != 0)
    assert got["val_sum"] == expected_sum


def test_streaming_observed_metrics_per_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    now = time.time()
    for i in range(3):
        stage = str(tmp_path / f"stage{i}")
        spark.range(i * 100, i * 100 + 100).select(
            F.col("id"), (F.col("id") * 3).alias("v")
        ).coalesce(1).write.parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dest = os.path.join(src, f"b{i}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (now - 300 + 100 * i,) * 2)

    stream = (
        spark.readStream.schema("id long, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .observe(
            "batch_audit",
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("v_sum"),
            F.min("id").alias("id_min"),
        )
    )
    out = str(tmp_path / "out")

    def sink(batch, _bid):
        batch.write.mode("append").parquet(out)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)

    seen = [
        p["observedMetrics"]["batch_audit"]
        for p in q.recentProgress
        if p.get("observedMetrics", {}).get("batch_audit")
    ]
    # one metrics row per micro-batch, each auditing exactly its file
    assert sorted(m["id_min"] for m in seen) == [0, 100, 200]
    for m in seen:
        lo = m["id_min"]
        assert m["n"] == 100
        assert m["v_sum"] == sum(i * 3 for i in range(lo, lo + 100))
    # and the metrics never perturbed the data itself
    assert spark.read.parquet(out).count() == 300
