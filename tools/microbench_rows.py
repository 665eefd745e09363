"""Quick per-row wall measurement (bench.py methodology: per-query
sf0.001 warm-up, min of N timed runs with `.count()`), plus a job/stage
count per timed run via the status tracker — the isolation harness for
optimization work. Not the official bench; bench.py stays the
comparable artifact.

Usage: python tools/microbench_rows.py [--runs 3] [--sf-dir ...] name...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from hyppo_worker_spark.queries import load_all
    from hyppo_worker_spark.session import clear_cache, get_spark

    registry = load_all()
    spark = get_spark("microbench")
    spark.sparkContext.setLogLevel("FATAL")
    warm_dir = "/root/testdata/sf0.001"
    tracker = spark.sparkContext.statusTracker()

    for name in args.names:
        q = registry.get(name)
        if q is None:
            print(f"SKIP {name}")
            continue
        spark.sparkContext.setJobDescription(f"micro: {name}")
        try:
            q.spark_fn(spark, warm_dir).count()
        except Exception as e:  # noqa: BLE001
            print(f"warmup {name} failed: {type(e).__name__}: {e}")
        clear_cache(spark, include_rdd_blocks=True)
        best, jobs = None, None
        for _ in range(args.runs):
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            ids0 = set(spark.sparkContext._jsc.sc().statusTracker()
                       .getJobIdsForGroup(None))
            t0 = time.time()
            df = q.spark_fn(spark, args.sf_dir)
            df.count()
            dt = time.time() - t0
            ids1 = set(spark.sparkContext._jsc.sc().statusTracker()
                       .getJobIdsForGroup(None))
            njobs = len(ids1 - ids0)
            if best is None or dt < best:
                best, jobs = dt, njobs
            clear_cache(spark, include_rdd_blocks=True)
            del j0
        print(f"{name}: {best:.3f}s  jobs/run={jobs}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
