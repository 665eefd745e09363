"""Stream-stream join hot-key stress (VERDICT r7 item 3).

Builds a 10x amplification of sf0.1's events with 10% of all rows
deterministically remapped to ONE hot user, stages views/purchases as
three time-ordered blocks (the p18 shape), and runs the watermarked
symmetric hash join twice:

- PLAIN: join keyed by user alone — the hot user's state and match
  fan-out concentrate in the one partition the key hashes to;
- SALTED: `streaming/skew.py` pre-split (probe side salted
  deterministically, build side replicated, splits=8) — decided
  before the first run, because the state-key shape freezes into the
  checkpoint.

Reports per variant: wall seconds, final join-state rows
(stateOperators numRowsTotal), max single-task shuffle-read bytes
(event log), and verifies both variants produce IDENTICAL pair sets
(count + order-insensitive xxhash sum).

Usage: python tools/stress_p18_hotkey.py
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)

from stress import EVENT_DIR, parse_event_log, _fresh_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
WORK = "/tmp/hyppo-hotkey"
HOT_USER = 10**9
REPLICAS = 10
SPLITS = 8
HOT_FRACTION_MOD = 10  # 1-in-10 events remapped to the hot user


def build_corpus(spark) -> dict[str, str]:
    """10x events, 10% remapped to HOT_USER, staged as 3 blocks/side."""
    from pyspark.sql import functions as F

    from hyppo_worker_spark.session import load_tables

    if os.path.exists(os.path.join(WORK, "_READY")):
        return {
            "views": os.path.join(WORK, "views"),
            "purchases": os.path.join(WORK, "purchases"),
        }
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)

    ev = load_tables(spark, SF_DIR, ("events",))["events"]
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    amp = (
        ev.crossJoin(F.broadcast(reps))
        .withColumn("event_id", F.col("event_id") * REPLICAS + F.col("rep"))
        .withColumn(
            "user_id",
            F.when(
                F.pmod(F.xxhash64("event_id"), F.lit(HOT_FRACTION_MOD)) == 0,
                F.lit(HOT_USER),
            ).otherwise(F.col("user_id") * REPLICAS + F.col("rep")),
        )
        # jitter per replica so replicas aren't identical timestamps
        .withColumn(
            "ts",
            (F.col("ts").cast("timestamp"))
            + F.make_interval(secs=F.col("rep") * 7),
        )
        .drop("rep")
    )
    views = amp.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("vid"),
        F.col("user_id").alias("vuser"),
        F.col("ts").alias("vts"),
    )
    purchases = amp.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("puser"),
        F.col("ts").alias("pts"),
    )
    now = time.time()
    dirs = {}
    for label, df, ts_col in (
        ("views", views, "vts"), ("purchases", purchases, "pts")
    ):
        src = os.path.join(WORK, label)
        os.makedirs(src)
        blk = F.least(
            (F.dayofmonth(ts_col) - 1) / F.lit(10), F.lit(2)
        ).cast("int")
        staged = df.withColumn("blk", blk)
        for i in range(3):
            part_dir = os.path.join(WORK, f"stage-{label}-{i}")
            staged.filter(F.col("blk") == i).drop("blk").coalesce(1).write.mode(
                "overwrite"
            ).parquet(part_dir)
            part = glob.glob(os.path.join(part_dir, "part-*.parquet"))[0]
            dest = os.path.join(src, f"batch{i}.parquet")
            shutil.move(part, dest)
            os.utime(dest, (now - 300 + 100 * i,) * 2)
        dirs[label] = src
    with open(os.path.join(WORK, "_READY"), "w") as fh:
        fh.write("ok")
    return dirs


def run_variant(salted: bool, dirs: dict[str, str]) -> dict:
    from pyspark.sql import functions as F

    from hyppo_worker_spark.session import scoped_conf
    from hyppo_worker_spark.streaming import drain_stream
    from hyppo_worker_spark.streaming.skew import (
        SALT_COL,
        replicate_stream_build,
        salt_stream_probe,
    )

    spark = _fresh_session()
    tag = "salted" if salted else "plain"
    out_dir = os.path.join(WORK, f"pairs-{tag}")
    ckpt = os.path.join(WORK, f"ckpt-{tag}")
    shutil.rmtree(out_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)

    vs = (
        spark.readStream.schema("vid long, vuser long, vts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(dirs["views"])
        .withWatermark("vts", "3 days")
    )
    ps = (
        spark.readStream.schema("pid long, puser long, pts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(dirs["purchases"])
        .withWatermark("pts", "3 days")
    )
    cond = (
        (F.col("vuser") == F.col("puser"))
        & (F.col("pts") >= F.col("vts"))
        & (F.col("pts") <= F.col("vts") + F.expr("INTERVAL 2 HOURS"))
    )
    if salted:
        vs = salt_stream_probe(vs, "vuser", "vid", [HOT_USER], SPLITS)
        ps = replicate_stream_build(ps, "puser", [HOT_USER], SPLITS)
        joined = vs.join(
            ps, cond & (vs[SALT_COL] == ps[SALT_COL]), "inner"
        ).select("vid", "pid")
    else:
        joined = vs.join(ps, cond, "inner").select("vid", "pid")

    def sink(batch, _bid):
        batch.write.mode("append").parquet(out_dir)

    t0 = time.time()
    with scoped_conf(spark, "spark.sql.shuffle.partitions", "8"):
        q = (
            joined.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        drain_stream(q, 600)
    wall = round(time.time() - t0, 2)

    prog = [p for p in q.recentProgress if p.get("stateOperators")]
    state_rows = (
        prog[-1]["stateOperators"][0]["numRowsTotal"] if prog else -1
    )
    pairs = spark.read.parquet(out_dir)
    row = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("vid", "pid").cast("decimal(38,0)")).alias("h"),
    ).first()
    app_log = os.path.join(EVENT_DIR, spark.sparkContext.applicationId + "*")
    spark.stop()
    metrics = parse_event_log(app_log)
    return {
        "variant": tag,
        "wall_s": wall,
        "state_rows": state_rows,
        "n_pairs": row["n"],
        "pair_hash": str(row["h"]),
        **metrics,
    }


def main() -> None:
    os.makedirs(EVENT_DIR, exist_ok=True)
    spark = _fresh_session()
    dirs = build_corpus(spark)
    spark.stop()

    plain = run_variant(False, dirs)
    salted = run_variant(True, dirs)
    import json

    print(json.dumps(plain))
    print(json.dumps(salted))
    same = (
        plain["n_pairs"] == salted["n_pairs"]
        and plain["pair_hash"] == salted["pair_hash"]
    )
    print(f"outputs identical: {same}")
    if not same:
        sys.exit(1)


if __name__ == "__main__":
    main()
