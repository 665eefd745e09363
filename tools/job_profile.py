"""Per-job wall profile of one registry row via the Spark event log:
runs the row once (after the bench's sf0.001 warm-up), then itemizes
every job of the timed run — duration, job id, and the callsite of
its final stage — so a wall regression can be attributed to a
specific collect/checkpoint/count in the operator code.

This is the attribution instrument behind OPTIMIZATION_r12.md items
1-2: it showed d11/d16's CC edge-pull jobs going 0.4 -> 1.4s and
s21's candidate-pipeline counts 0.33 -> 1.6s each under the in-row
assignment/margin rewrites (reverted).

Usage: python tools/job_profile.py <row> [sf_dir]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    row = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    evdir = f"/tmp/spark-events-{os.getpid()}"
    os.makedirs(evdir, exist_ok=True)

    from hyppo_worker_spark.queries import load_all
    from hyppo_worker_spark.session import clear_cache, get_spark

    q = load_all().get(row)
    if q is None:
        print(f"unknown row: {row}", file=sys.stderr)
        return 2
    spark = get_spark(
        "job_profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("FATAL")

    q.spark_fn(spark, "/root/testdata/sf0.001").count()  # warm (bench.py)
    clear_cache(spark, include_rdd_blocks=True)

    t0 = time.time()
    q.spark_fn(spark, sf_dir).count()
    wall = time.time() - t0
    marker = t0 * 1000.0
    spark.stop()

    jobs: dict[int, dict] = {}
    paths = [
        p
        for p in glob.glob(os.path.join(evdir, "**", "*"), recursive=True)
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
    ]
    for path in paths:
        for line in open(path):
            try:
                e = json.loads(line)
            except ValueError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                jobs[e["Job ID"]] = {
                    "t0": e["Submission Time"],
                    "site": (e.get("Stage Infos") or [{}])[-1].get(
                        "Stage Name", "?"
                    ),
                }
            elif ev == "SparkListenerJobEnd" and e["Job ID"] in jobs:
                jobs[e["Job ID"]]["t1"] = e["Completion Time"]

    timed = sorted(
        (
            (j["t1"] - j["t0"], jid, j["site"])
            for jid, j in jobs.items()
            if "t1" in j and j["t0"] >= marker - 50  # timed run only
        ),
        reverse=True,
    )
    print(
        f"row={row} wall={wall:.2f}s jobs={len(timed)} "
        f"sum_job_ms={sum(t for t, _, _ in timed)}"
    )
    for t, jid, site in timed[:25]:
        print(f"  {t:7d} ms  job {jid:4d}  {site}")
    shutil.rmtree(evdir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
