"""Itemize p25/p26's per-trigger fixed costs (VERDICT r8 item 3) the
way tools/profile_p08.py itemized the CC sink: measured phases, not
assumed ones.

Patches ``pipeline_queries.drain_stream`` to record, per streaming
query the row starts: wall around awaitTermination, start->drain gap,
and Spark's own per-trigger ``durationMs`` breakdown (latestOffset /
getBatch / queryPlanning / addBatch / walCommit / commitOffsets) plus
stateOperators commit times — the exact split between "Python source
startup", "offset-log I/O", "sink/exec", and "state checkpoint" the
verdict asked for. The query functions themselves are unmodified.

Usage: python tools/profile_triggers.py [p25|p26|both] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DRAINS: list[dict] = []


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from hyppo_worker_spark.session import get_spark
    from hyppo_worker_spark.queries import pipeline_queries as pq

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    orig_drain = pq.drain_stream

    def spy_drain(q, timeout=300):
        t0 = time.perf_counter()
        orig_drain(q, timeout)
        wall = time.perf_counter() - t0
        progs = [p for p in q.recentProgress]
        DRAINS.append({"wall": wall, "progress": progs})

    pq.drain_stream = spy_drain

    names = {
        "p25": "p25_connector_streaming_loop",
        "p26": "p26_chained_stateful_rollup",
    }
    if which in names:
        targets = [which]
    elif which == "both":
        targets = ["p25", "p26"]
    else:
        # any registry row that drains a stream through drain_stream
        names[which] = which
        targets = [which]

    # JVM warm-up
    spark.range(100000).selectExpr("sum(id)").collect()

    from hyppo_worker_spark.queries import load_all

    registry = load_all()
    for t in targets:
        for attempt in range(3):
            DRAINS.clear()
            t0 = time.perf_counter()
            out = registry[names[t]].spark_fn(spark, sf_dir)
            n = out.count()
            total = time.perf_counter() - t0
            report(t, total, n)


def report(tag: str, total: float, n_rows: int) -> None:
    keys = (
        "latestOffset",
        "getBatch",
        "queryPlanning",
        "addBatch",
        "walCommit",
        "commitOffsets",
    )
    print(f"\n=== {tag}: end-to-end {total:.2f}s, {n_rows} rows, "
          f"{len(DRAINS)} streaming drains ===")
    drain_wall = sum(d["wall"] for d in DRAINS)
    print(f"{'drain':>5} {'wall_s':>7} {'trigs':>5} "
          + " ".join(f"{k[:9]:>9}" for k in keys)
          + f" {'trigExec':>9} {'stateCommit':>11}")
    tot = dict.fromkeys(keys, 0.0)
    tot_te = 0.0
    tot_sc = 0.0
    for i, d in enumerate(DRAINS):
        sums = dict.fromkeys(keys, 0.0)
        te = 0.0
        sc = 0.0
        for p in d["progress"]:
            dm = p.get("durationMs") or {}
            for k in keys:
                sums[k] += dm.get(k, 0) / 1000
            te += dm.get("triggerExecution", 0) / 1000
            for so in p.get("stateOperators") or []:
                sc += (so.get("commitTimeMs", 0) or 0) / 1000
        for k in keys:
            tot[k] += sums[k]
        tot_te += te
        tot_sc += sc
        print(f"{i:>5} {d['wall']:>7.2f} {len(d['progress']):>5} "
              + " ".join(f"{sums[k]:>9.2f}" for k in keys)
              + f" {te:>9.2f} {sc:>11.2f}")
    print(f"{'SUM':>5} {drain_wall:>7.2f} {'':>5} "
          + " ".join(f"{tot[k]:>9.2f}" for k in keys)
          + f" {tot_te:>9.2f} {tot_sc:>11.2f}")
    startup = drain_wall - tot_te
    print(f"drain walls {drain_wall:.2f}s | trigger execution {tot_te:.2f}s "
          f"| query startup/teardown (walls - triggers) {startup:.2f}s "
          f"| non-stream (staging + read-back + agg) {total - drain_wall:.2f}s")


if __name__ == "__main__":
    main()
