"""Salted aggregation/join equivalence with skewed input."""

import pytest
from pyspark.sql import functions as F

from hyppo_worker_spark.operators.skew import explain_skew, salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of rows share key 0 — the hot-key shape."""
    hot = spark.range(9000).select(
        F.lit(0).alias("k"), (F.col("id") % 100).cast("double").alias("v")
    )
    cold = spark.range(1000).select(
        (F.col("id") % 50 + 1).alias("k"), F.col("id").cast("double").alias("v")
    )
    return hot.unionByName(cold)


def test_salted_agg_matches_plain(spark, skewed):
    plain = {
        r.k: (r.s, r.c, r.mx)
        for r in skewed.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("c"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        r.k: (r.s, r.c, r.mx)
        for r in salted_agg(
            skewed, "k", [("sum", "v", "s"), ("count", "v", "c"), ("max", "v", "mx")]
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_non_combinable(skewed):
    with pytest.raises(ValueError):
        salted_agg(skewed, "k", [("avg", "v", "a")])


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.range(51).select(
        F.col("id").alias("k"), F.concat(F.lit("name-"), F.col("id")).alias("nm")
    )
    plain = skewed.join(dim, "k").groupBy("k", "nm").count()
    salted = salted_join(skewed, dim, "k").groupBy("k", "nm").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_dangling_fact_rows(spark, skewed):
    dim = spark.range(1).select(F.col("id").alias("k"), F.lit("only-zero").alias("nm"))
    out = salted_join(skewed, dim, "k", how="left")
    assert out.count() == skewed.count()
    assert out.filter("k = 0 AND nm IS NULL").count() == 0
    assert out.filter("k > 0 AND nm IS NOT NULL").count() == 0


def test_explain_skew_surfaces_hot_key(spark, skewed):
    top = explain_skew(skewed, "k", top=1).collect()
    assert top[0].k == 0
    assert top[0].pct == 90.0
