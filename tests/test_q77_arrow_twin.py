"""q77 (applyInArrow regression) pinned against its pure-JVM twin.

The Arrow UDF exists to carry NONTRIVIAL per-group computation; for
the regression sufficient statistics themselves a plain
groupBy().agg of integer sums is algebraic (partial-aggregatable,
skew-proof — no whole-group-in-one-task constraint). Equality of the
two pins both directions: the UDF computes the right statistics, and
the documented scale fallback (switch to the JVM shape when a group
outgrows a task) loses nothing.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _jvm_twin(spark, sf_dir):
    from hyppo_worker_spark.session import load_tables

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"].select(
        F.col("l_suppkey").cast("long").alias("suppkey"),
        F.col("l_quantity").cast("long").alias("qty"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("long")
        .alias("cents"),
    )
    g = li.groupBy("suppkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("qty").alias("sx"),
        F.sum("cents").alias("sy"),
        F.sum(F.col("qty") * F.col("cents")).alias("sxy"),
        F.sum(F.col("qty") * F.col("qty")).alias("sxx"),
    )
    num = F.col("n_items") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n_items") * F.col("sxx") - F.col("sx") * F.col("sx")
    return g.select(
        "suppkey",
        "n_items",
        num.alias("num"),
        den.alias("den"),
        F.when(den != 0, num.cast("double") / den.cast("double")).alias(
            "slope"
        ),
    ).orderBy("suppkey")


def test_q77_equals_jvm_integer_sums(spark):
    from hyppo_worker_spark.queries import load_all

    sf_dir = "/root/testdata/sf0.001"
    arrow = load_all()["q77_grouped_arrow_regression"].spark_fn(
        spark, sf_dir
    )
    twin = _jvm_twin(spark, sf_dir)
    a = arrow.collect()
    b = twin.collect()
    assert len(a) == len(b) > 0
    for ra, rb in zip(a, b):
        assert ra.asDict() == rb.asDict(), (ra, rb)
