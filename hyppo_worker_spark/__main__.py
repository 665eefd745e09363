"""Command-line entry point: the operational surface a user of the
reference (which ships as a worker daemon + coordinator API) gets
here as subcommands over one Spark driver.

    python -m hyppo_worker_spark list
    python -m hyppo_worker_spark run q01_pricing_summary [--sf-dir DIR] [--explain]
    python -m hyppo_worker_spark pipeline [--sf-dir DIR]
    python -m hyppo_worker_spark bench
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="hyppo_worker_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    run = sub.add_parser("run", help="run one query and show the result")
    run.add_argument("name")
    run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    run.add_argument("--explain", action="store_true", help="print the physical plan")
    run.add_argument("--limit", type=int, default=20)

    pipe = sub.add_parser("pipeline", help="run the full ingestion pipeline demo")
    pipe.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    sub.add_parser("bench", help="run the benchmark harness")

    args = ap.parse_args(argv)

    from hyppo_worker_spark.queries import load_all

    registry = load_all()

    if args.cmd == "list":
        for name, q in sorted(registry.items()):
            oracle = "oracle" if q.oracle else "rows-only"
            doc = (q.doc or "").strip().splitlines()[0] if q.doc else ""
            print(f"{name:36s} [{oracle:9s}] {doc}")
        return 0

    from hyppo_worker_spark.session import get_spark

    spark = get_spark("hyppo-cli")

    if args.cmd == "run":
        q = registry.get(args.name)
        if q is None:
            print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
            return 2
        t0 = time.time()
        df = q.spark_fn(spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        df.show(args.limit, truncate=False)
        print(f"[{time.time() - t0:.2f}s] {args.name} on {args.sf_dir}")
        return 0

    if args.cmd == "pipeline":
        for name in ("p01_ingestion_pipeline", "p02_raw_pipeline"):
            t0 = time.time()
            rows = registry[name].spark_fn(spark, args.sf_dir).collect()
            print(f"{name}: {len(rows)} result rows in {time.time() - t0:.2f}s")
        return 0

    if args.cmd == "bench":
        import subprocess

        out = subprocess.run(
            [sys.executable, "bench.py"], capture_output=True, text=True
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "{}"
        print(json.dumps(json.loads(line), indent=2))
        return out.returncode

    return 2


if __name__ == "__main__":
    sys.exit(main())
