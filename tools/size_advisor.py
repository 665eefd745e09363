"""Cluster sizing advisor: turn SCALE.md's rules into numbers.

Given a target dataset size and cluster shape, derive the confs the
engine's plans assume — shuffle partition count, scan split size,
broadcast threshold, and the prefix-sum bucket count — from the same
invariants the operators are written against:

- a shuffle partition should hold ~TARGET_SHUFFLE_PARTITION_BYTES
  post-filter (small enough to sort/hash in executor memory with
  headroom, large enough to amortize task overhead);
- partition count never drops below total cores (else cores idle) —
  AQE coalesces an over-provisioned count downward at runtime, which
  is why over- beats under-provisioning;
- scan splits aim at ~2-4 tasks per core per scan wave;
- the broadcast threshold must fit comfortably in the smallest
  executor heap alongside shuffle buffers (≤ ~5% of executor memory);
- prefix-sum/window buckets follow `operators/packing.py`'s
  un-splittable-window invariant.

Usage:
    python tools/size_advisor.py --tb 100 --executors 1000 \
        --cores-per-executor 4 --executor-gb 16

Pure functions; unit-tested JVM-free in tests/test_size_advisor.py.
"""

from __future__ import annotations

import argparse
import json
import math

TARGET_SHUFFLE_PARTITION_BYTES = 192 * 1024**2  # post-shuffle working set
TARGET_SCAN_WAVES = 3  # scan tasks per core per wave
MAX_BROADCAST_FRACTION = 0.05  # of executor memory
ROWS_PER_PSUM_BUCKET = 4_000_000  # packing.TARGET_ROWS_PER_BUCKET


def advise(
    dataset_bytes: int,
    executors: int,
    cores_per_executor: int,
    executor_mem_bytes: int,
    *,
    shuffled_fraction: float = 0.5,
    approx_rows: int | None = None,
) -> dict:
    """Recommended confs for ``dataset_bytes`` on the given cluster.

    ``shuffled_fraction`` is the share of the scanned bytes expected to
    survive filters into the widest shuffle (0.5 is a conservative
    default for the engine's aggregation/join plans; dedup paths
    shuffle digests only and need far less).
    """
    total_cores = executors * cores_per_executor
    shuffle_bytes = int(dataset_bytes * shuffled_fraction)
    parts_by_size = math.ceil(shuffle_bytes / TARGET_SHUFFLE_PARTITION_BYTES)
    shuffle_partitions = max(parts_by_size, total_cores)

    # scan split: dataset / (cores * waves), clamped to [16 MB, 1 GB]
    split = dataset_bytes // max(total_cores * TARGET_SCAN_WAVES, 1)
    max_partition_bytes = min(max(split, 16 * 1024**2), 1024**3)

    broadcast_threshold = min(
        int(executor_mem_bytes * MAX_BROADCAST_FRACTION), 512 * 1024**2
    )

    out = {
        "spark.sql.shuffle.partitions": shuffle_partitions,
        "spark.sql.files.maxPartitionBytes": max_partition_bytes,
        "spark.sql.autoBroadcastJoinThreshold": broadcast_threshold,
        "notes": {
            "total_cores": total_cores,
            "post_filter_shuffle_bytes": shuffle_bytes,
            "bytes_per_shuffle_partition": shuffle_bytes
            // max(shuffle_partitions, 1),
            "scan_tasks_per_wave": total_cores,
            "scan_waves": max(
                1, math.ceil(dataset_bytes / max(max_partition_bytes, 1) / max(total_cores, 1))
            ),
        },
    }
    if approx_rows is not None:
        out["prefix_sum_buckets"] = max(
            math.ceil(approx_rows / ROWS_PER_PSUM_BUCKET), shuffle_partitions, 1
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tb", type=float, required=True, help="dataset size in TB")
    ap.add_argument("--executors", type=int, required=True)
    ap.add_argument("--cores-per-executor", type=int, default=4)
    ap.add_argument("--executor-gb", type=float, default=16)
    ap.add_argument("--shuffled-fraction", type=float, default=0.5)
    ap.add_argument("--rows", type=int, default=None)
    args = ap.parse_args()
    print(
        json.dumps(
            advise(
                int(args.tb * 1024**4),
                args.executors,
                args.cores_per_executor,
                int(args.executor_gb * 1024**3),
                shuffled_fraction=args.shuffled_fraction,
                approx_rows=args.rows,
            ),
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
