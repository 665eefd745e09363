"""Capture `.explain("formatted")` output for named queries into
plans/<tag>/<name>_<suffix>.txt — the before/after plan evidence for
optimization rounds.

Usage:
    python tools/capture_plans.py --suffix before [--sf-dir ...] name...

Note: queries whose spark_fn performs imperative work (training jobs,
stream drains, writes) RUN that work at build time; the captured plan
is the plan of the RETURNED DataFrame — the same frame bench.py times
with `.count()` and the driver hashes.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--suffix", required=True, help="before | after")
    ap.add_argument("--out-dir", default="plans/r12")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from hyppo_worker_spark.queries import load_all
    from hyppo_worker_spark.session import clear_cache, get_spark

    registry = load_all()
    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out_dir, exist_ok=True)

    for name in args.names:
        q = registry.get(name)
        if q is None:
            print(f"SKIP {name}: not registered", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"capture_plans: {name}")
        df = q.spark_fn(spark, args.sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(args.out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain('formatted') at {args.sf_dir}\n")
            fh.write(buf.getvalue())
        n_ex = buf.getvalue().count("Exchange")
        print(f"WROTE {path} (Exchange count in text: {n_ex})")
        clear_cache(spark, include_rdd_blocks=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
