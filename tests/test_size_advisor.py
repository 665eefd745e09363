"""Sizing advisor invariants (JVM-free): partition counts scale with
data, never drop below cluster cores, per-partition bytes stay inside
the working-set target, and the 100 TB reference point is sane."""

from __future__ import annotations

import importlib.util

spec = importlib.util.spec_from_file_location(
    "size_advisor", "tools/size_advisor.py"
)
sa = importlib.util.module_from_spec(spec)
spec.loader.exec_module(sa)

TB = 1024**4
GB = 1024**3


def test_100tb_reference_point():
    out = sa.advise(100 * TB, 1000, 4, 16 * GB, approx_rows=100_000_000_000)
    # 50 TB shuffled at ~192 MB/partition -> ~273k partitions
    assert out["spark.sql.shuffle.partitions"] >= 250_000
    per_part = out["notes"]["bytes_per_shuffle_partition"]
    assert per_part <= sa.TARGET_SHUFFLE_PARTITION_BYTES
    # broadcast threshold bounded by executor memory fraction
    assert out["spark.sql.autoBroadcastJoinThreshold"] <= 0.05 * 16 * GB
    # prefix-sum buckets follow the packing invariant (1e11 rows / 4M)
    assert out["prefix_sum_buckets"] >= 25_000
    # scan split stays in the clamp range
    assert 16 * 1024**2 <= out["spark.sql.files.maxPartitionBytes"] <= GB


def test_partitions_scale_linearly_with_data():
    small = sa.advise(1 * TB, 100, 4, 16 * GB)
    big = sa.advise(100 * TB, 100, 4, 16 * GB)
    assert (
        big["spark.sql.shuffle.partitions"]
        >= 90 * small["spark.sql.shuffle.partitions"]
    )


def test_partitions_never_below_cores():
    out = sa.advise(10 * GB, 1000, 8, 16 * GB)  # tiny data, big cluster
    assert out["spark.sql.shuffle.partitions"] >= 8000


def test_local32_testbed_shape():
    # the local[32] testbed at sf0.1 (~100 MB): 32 partitions (cores
    # floor), small scan splits clamped up to the 16 MB minimum
    out = sa.advise(100 * 1024**2, 1, 32, 16 * GB)
    assert out["spark.sql.shuffle.partitions"] == 32
    assert out["spark.sql.files.maxPartitionBytes"] == 16 * 1024**2
