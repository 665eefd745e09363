"""Hot-key pre-split for stream-stream joins: the salted streaming
join must produce EXACTLY the pairs of the unsalted batch range-join
— each hot pair once (probe row holds one salt, build row exists
under all of them), each cold pair once (both sides salt 0) — and
the salts must be deterministic under replay."""

from __future__ import annotations

import glob
import os
import shutil
import time

from pyspark.sql import functions as F

from hyppo_worker_spark.streaming import drain_stream
from hyppo_worker_spark.streaming.skew import (
    SALT_COL,
    replicate_stream_build,
    salt_stream_probe,
)

HOT = 7
SPLITS = 4


def _mk_events(spark, n_users: int = 12, per_user: int = 8):
    """views/purchases rows; user HOT gets 10x the traffic."""
    base = "2024-01-01 00:00:00"
    rows_v, rows_p = [], []
    eid = 0
    for u in range(n_users):
        k = per_user * (10 if u == HOT else 1)
        for i in range(k):
            eid += 1
            rows_v.append((eid, u, i * 600))  # every 10 min
            eid += 1
            rows_p.append((eid, u, i * 600 + 300))  # 5 min later
    v = spark.createDataFrame(rows_v, "vid long, vuser long, off long").select(
        "vid", "vuser",
        (F.to_timestamp(F.lit(base)) + F.make_interval(secs=F.col("off"))).alias("vts"),
    )
    p = spark.createDataFrame(rows_p, "pid long, puser long, off long").select(
        "pid", "puser",
        (F.to_timestamp(F.lit(base)) + F.make_interval(secs=F.col("off"))).alias("pts"),
    )
    return v, p


def _range_cond():
    return (
        (F.col("vuser") == F.col("puser"))
        & (F.col("pts") >= F.col("vts"))
        & (F.col("pts") <= F.col("vts") + F.expr("INTERVAL 30 MINUTES"))
    )


def test_salted_stream_join_matches_batch(spark, tmp_path):
    v, p = _mk_events(spark)
    expected = {
        (r.vid, r.pid)
        for r in v.join(p, _range_cond(), "inner").select("vid", "pid").collect()
    }
    assert expected, "batch oracle produced no pairs — test is vacuous"

    # stage each side as one parquet file for a deterministic stream
    srcs = {}
    for label, df in (("v", v), ("p", p)):
        stage = str(tmp_path / f"stage-{label}")
        df.coalesce(1).write.parquet(stage)
        src = str(tmp_path / label)
        os.makedirs(src)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(src, "data.parquet"))
        srcs[label] = src

    vs = (
        spark.readStream.schema("vid long, vuser long, vts timestamp")
        .parquet(srcs["v"])
        .withWatermark("vts", "2 hours")
    )
    ps = (
        spark.readStream.schema("pid long, puser long, pts timestamp")
        .parquet(srcs["p"])
        .withWatermark("pts", "2 hours")
    )
    vs = salt_stream_probe(vs, "vuser", "vid", [HOT], SPLITS)
    ps = replicate_stream_build(ps, "puser", [HOT], SPLITS)
    joined = vs.join(
        ps,
        _range_cond() & (vs[SALT_COL] == ps[SALT_COL]),
        "inner",
    ).select("vid", "pid")

    out = str(tmp_path / "out")

    def sink(batch, _bid):
        batch.write.mode("append").parquet(out)

    q = (
        joined.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    drain_stream(q, 300)

    got_rows = spark.read.parquet(out).collect()
    got = {(r.vid, r.pid) for r in got_rows}
    assert len(got_rows) == len(got), "salted join duplicated a pair"
    assert got == expected


def test_salts_are_deterministic_and_spread(spark):
    v, _ = _mk_events(spark)
    s1 = salt_stream_probe(v, "vuser", "vid", [HOT], SPLITS)
    a = {(r.vid, r[SALT_COL]) for r in s1.collect()}
    b = {(r.vid, r[SALT_COL]) for r in s1.collect()}
    assert a == b  # replay-safe: same salt every evaluation
    hot_salts = {s for vid, s in a} - {None}
    cold = {
        s
        for r in salt_stream_probe(
            v.filter(F.col("vuser") != HOT), "vuser", "vid", [HOT], SPLITS
        ).collect()
        for s in [r[SALT_COL]]
    }
    assert cold == {0}
    # the hot key's rows actually use >1 salt bucket
    hot = {
        r[SALT_COL]
        for r in salt_stream_probe(
            v.filter(F.col("vuser") == HOT), "vuser", "vid", [HOT], SPLITS
        ).collect()
    }
    assert len(hot) > 1
