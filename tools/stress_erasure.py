"""Erasure scale evidence (VERDICT r11 item 3): erase_rows runs both
passes as ONE SPARK TASK PER FILE — wall should stay ~flat as file
count grows at fixed per-file size while cores cover the files, and
the sequential fallback should scale linearly with file count.

Builds synthetic manifest zones (N jsonl files x fixed rows), then
times erase_rows distributed vs sequential at N in (4, 32).

Run: python tools/stress_erasure.py [rows_per_file]
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
import time
from unittest import mock

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hyppo_worker_spark.session import get_spark  # noqa: E402
from hyppo_worker_spark.sources.integration_source import (  # noqa: E402
    erase_rows,
)


def build_zone(path: str, n_files: int, rows_per_file: int) -> None:
    os.makedirs(path)
    entries = []
    for i in range(n_files):
        fname = f"task-{i:04d}.jsonl"
        h = hashlib.md5()
        with open(os.path.join(path, fname), "w", encoding="utf-8") as fh:
            for j in range(rows_per_file):
                rec = json.dumps(
                    {"task_id": i, "seq": j, "score": (j * 7 + i) % 100},
                    sort_keys=True,
                    separators=(",", ":"),
                )
                fh.write(rec + "\n")
                h.update(rec.encode())
        entries.append(
            {"file": fname, "rows": rows_per_file, "md5": h.hexdigest()}
        )
    with open(
        os.path.join(path, "_MANIFEST.json"), "w", encoding="utf-8"
    ) as fh:
        json.dump(
            {
                "files": entries,
                "total_rows": n_files * rows_per_file,
                "version": 1,
            },
            fh,
            indent=1,
            sort_keys=True,
        )


def timed_erase(path: str, *, sequential: bool) -> tuple[float, dict]:
    pred = lambda r: r["seq"] % 10 == 3  # noqa: E731
    t0 = time.monotonic()
    if sequential:
        with mock.patch.object(
            SparkSession, "getActiveSession", staticmethod(lambda: None)
        ):
            stats = erase_rows(path, pred)
    else:
        stats = erase_rows(path, pred)
    return time.monotonic() - t0, stats


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    spark = get_spark()
    spark.range(1).count()  # warm the JVM so timings are erasure-only
    work = tempfile.mkdtemp(prefix="hyppo-erasure-stress-")
    print(f"rows/file={rows}  cores=local[{os.cpu_count()}]")
    print(f"{'files':>6} {'mode':>12} {'wall_s':>8} {'erased':>9}")
    results: dict[tuple[int, str], float] = {}
    try:
        for n_files in (4, 32):
            for mode in ("distributed", "sequential"):
                zone = os.path.join(work, f"{n_files}-{mode}")
                build_zone(zone, n_files, rows)
                wall, stats = timed_erase(
                    zone, sequential=(mode == "sequential")
                )
                assert stats["files_rewritten"] == n_files
                assert stats["rows_erased"] == n_files * (rows // 10)
                results[(n_files, mode)] = wall
                print(
                    f"{n_files:>6} {mode:>12} {wall:>8.2f} "
                    f"{stats['rows_erased']:>9}"
                )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    d4, d32 = results[(4, "distributed")], results[(32, "distributed")]
    s4, s32 = results[(4, "sequential")], results[(32, "sequential")]
    print(
        f"distributed 4->32 files: {d32 / d4:.2f}x wall "
        f"(flat = per-file parallelism); sequential: {s32 / s4:.2f}x "
        f"(linear = driver-bound); speedup at 32 files: {s32 / d32:.1f}x"
    )


if __name__ == "__main__":
    main()
