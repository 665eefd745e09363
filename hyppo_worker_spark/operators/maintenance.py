"""Dataset maintenance: small-file compaction and size-targeted
writes.

At 100 TB the small-files problem is operational, not theoretical:
a streaming sink or a many-task ingestion job (each engine task writes
its own records file) leaves thousands of KB-sized parquet files, and
every downstream scan pays per-file open cost. ``compact`` rewrites a
dataset to approximately ``target_file_bytes`` per file; the analog of
the reference's HandleJobCompleted finalization hook ("commit
manifest, swap partitions" — SURVEY.md §2.A op 7) doing a VACUUM-style
rewrite.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import SparkSession


def dataset_file_stats(path: str) -> dict:
    """(file count, total bytes, mean bytes) for a written dataset."""
    files = [
        f
        for f in glob.glob(os.path.join(path, "**"), recursive=True)
        if os.path.isfile(f) and not f.endswith((".crc", "_SUCCESS"))
    ]
    total = sum(os.path.getsize(f) for f in files)
    return {
        "n_files": len(files),
        "total_bytes": total,
        "mean_bytes": total // max(len(files), 1),
    }


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> dict:
    """Rewrite a dataset into ~target-sized files.

    Partition count = ceil(current bytes / target); the rewrite goes
    through a temp sibling directory then swaps it in via two
    sequential renames. The swap is NOT atomic: a reader racing the
    swap can observe a brief window with no dataset at the path, and
    the rename scheme assumes a local POSIX filesystem (object stores
    need a manifest/versioned-directory indirection instead — the
    pattern table formats like Iceberg implement). Run compaction in a
    maintenance window or behind a catalog pointer. Returns
    before/after file stats.
    """
    before = dataset_file_stats(path)
    n_parts = max(1, -(-before["total_bytes"] // target_file_bytes))
    df = spark.read.format(fmt).load(path)
    tmp = path.rstrip("/") + ".__compacting__"
    (
        df.repartition(n_parts)
        .write.mode("overwrite")
        .format(fmt)
        .save(tmp)
    )
    old = path.rstrip("/") + ".__old__"
    os.rename(path, old)
    os.rename(tmp, path)
    import shutil

    shutil.rmtree(old)
    after = dataset_file_stats(path)
    return {"before": before, "after": after, "target_partitions": n_parts}
