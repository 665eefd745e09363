"""Parameterized SQL (Spark 3.4+/4): `spark.sql(query, args=...)`
binds named and positional parameter markers engine-side — the
injection-safe form of the SQL-text surface (q61/q62/q68/q71). The
binding is a literal in the plan, so Catalyst constant-folds and
pushes it down exactly like an inlined value.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_named_parameters_bind_and_push_down(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("bucket")
    )
    df.createOrReplaceTempView("t_param")
    out = spark.sql(
        "SELECT count(*) AS n, sum(id) AS s FROM t_param "
        "WHERE bucket = :b AND id >= :lo",
        args={"b": 3, "lo": 10},
    ).collect()[0]
    ids = [i for i in range(100) if i % 7 == 3 and i >= 10]
    assert (out["n"], out["s"]) == (len(ids), sum(ids))


def test_positional_parameters(spark):
    out = spark.sql(
        "SELECT ? + ? AS a, upper(?) AS b", args=[2, 40, "ok"]
    ).collect()[0]
    assert (out["a"], out["b"]) == (42, "OK")


def test_hostile_string_binds_as_value_not_sql(spark):
    spark.range(3).createOrReplaceTempView("t_inject")
    hostile = "' OR 1=1 --"
    rows = spark.sql(
        "SELECT count(*) AS n FROM t_inject WHERE CAST(id AS STRING) = :v",
        args={"v": hostile},
    ).collect()
    assert rows[0]["n"] == 0  # bound as a VALUE: matches nothing
