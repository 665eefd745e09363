"""Distributed prefix sum + sequence packing vs the naive sequential
definition."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from hyppo_worker_spark.operators.packing import (
    derive_n_buckets,
    exclusive_prefix_sum,
    pack_sequences,
)


@pytest.fixture(scope="module")
def counts(spark):
    # irregular keys (gaps, unsorted input) and irregular values
    return spark.createDataFrame(
        [(k, (k * 7) % 13) for k in [3, 100, 7, 42, 999, 0, 55, 256, 12, 77]],
        "k long, v long",
    )


def naive(df):
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    return df.withColumn(
        "offset_before", F.coalesce(F.sum("v").over(w), F.lit(0)).cast("bigint")
    )


def test_matches_naive_global_window(spark, counts):
    got = exclusive_prefix_sum(counts, "k", "v", n_buckets=4)
    want = naive(counts)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_partitioning_independent(spark, counts):
    a = exclusive_prefix_sum(counts, "k", "v", n_buckets=4)
    b = exclusive_prefix_sum(counts.repartition(7), "k", "v", n_buckets=3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_empty_and_single_row(spark):
    empty = spark.createDataFrame([], "k long, v long")
    assert exclusive_prefix_sum(empty, "k", "v").count() == 0
    one = spark.createDataFrame([(5, 9)], "k long, v long")
    [row] = exclusive_prefix_sum(one, "k", "v").collect()
    assert row["offset_before"] == 0


def test_no_single_partition_window(spark, counts):
    """The plan must not contain a window over an unpartitioned
    full-data exchange (SinglePartition) for the big side — only the
    tiny per-bucket offset frame may do a global sort."""
    plan = exclusive_prefix_sum(counts, "k", "v", n_buckets=4)._jdf.queryExecution().executedPlan().toString()
    # the in-bucket window must be hash-partitioned by the bucket
    assert "hashpartitioning(_psum_bucket" in plan


def test_bucket_count_scales_with_input():
    """Window partitions cannot be split by AQE, so the per-bucket row
    bound must hold at ANY input size: buckets grow linearly with rows
    and a bucket never holds more than ~target rows."""
    target = 4_000_000
    for n_rows in (0, 1, 10**6, 10**9, 10**12):
        nb = derive_n_buckets(n_rows, target, parallelism=32)
        assert nb >= 32
        # the invariant: expected rows per bucket bounded by the target
        assert n_rows / nb <= target
    # 100 TB ~ 1e11 docs: ~25k buckets, each ~4M rows — not corpus/32
    assert derive_n_buckets(10**11, target, 32) == 25_000


def test_auto_buckets_used_and_correct(spark, counts):
    """Default call (no explicit n_buckets) derives the count and still
    matches the sequential definition."""
    got = exclusive_prefix_sum(counts, "k", "v")
    want = naive(counts)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_pack_sequences_ranges(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 0), (3, 25), (4, 7)], "doc long, n long"
    )
    rows = {
        r["doc"]: (r["offset_before"], r["seq_first"], r["seq_last"])
        for r in pack_sequences(df, "doc", "n", seq_len=16).collect()
    }
    # stream: doc1 tokens [0,10) ; doc2 empty at 10 ; doc3 [10,35) ; doc4 [35,42)
    assert rows[1] == (0, 0, 0)
    assert rows[2] == (10, 0, 0)  # empty doc occupies its boundary seq
    assert rows[3] == (10, 0, 2)  # spans sequences 0..2 (tokens 10..34)
    assert rows[4] == (35, 2, 2)


def test_prefix_sum_property(spark):
    """Random value tables: distributed scan == sequential definition."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=-(10**6), max_value=10**6),
                st.integers(min_value=0, max_value=10**6),
            ),
            min_size=1,
            max_size=40,
            unique_by=lambda t: t[0],
        ),
        st.integers(min_value=1, max_value=8),
    )
    def check(rows, n_buckets):
        df = spark.createDataFrame(rows, "k long, v long")
        got = {
            r["k"]: r["offset_before"]
            for r in exclusive_prefix_sum(
                df, "k", "v", n_buckets=n_buckets
            ).collect()
        }
        acc = 0
        for k, v in sorted(rows):
            assert got[k] == acc
            acc += v

    check()
