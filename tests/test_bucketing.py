"""Bucketed tables: the join on the bucket key must plan with zero
shuffle exchanges, and results must match the plain join."""

import pytest
from pyspark.sql import functions as F

from hyppo_worker_spark.operators.bucketing import bucketed_join, write_bucketed
from hyppo_worker_spark.plans.explain import count_exchanges, join_strategies


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    a = spark.range(10000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("a_val")
    )
    b = spark.range(5000).select(
        (F.col("id") % 500).alias("k"), (F.col("id") * 2).alias("b_val")
    )
    write_bucketed(a, "bt_a", "k", n_buckets=8, sort_col="k")
    write_bucketed(b, "bt_b", "k", n_buckets=8, sort_col="k")
    yield "bt_a", "bt_b"
    spark.sql("DROP TABLE IF EXISTS bt_a")
    spark.sql("DROP TABLE IF EXISTS bt_b")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    la, lb = bucketed_tables
    # keep the small side from broadcasting so the bucket join shows
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, la, lb, "k")
        assert count_exchanges(joined) == 0
        assert "SortMergeJoin" in join_strategies(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain(spark, bucketed_tables):
    la, lb = bucketed_tables
    bucketed = bucketed_join(spark, la, lb, "k").groupBy("k").count()
    a = spark.range(10000).select((F.col("id") % 500).alias("k"), F.col("id").alias("a_val"))
    b = spark.range(5000).select((F.col("id") % 500).alias("k"), (F.col("id") * 2).alias("b_val"))
    plain = a.join(b, "k").groupBy("k").count()
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))


def test_bucketed_agg_no_shuffle(spark, bucketed_tables):
    la, _ = bucketed_tables
    agg = spark.table(la).groupBy("k").agg(F.sum("a_val").alias("s"))
    assert count_exchanges(agg) == 0
