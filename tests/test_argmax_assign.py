"""The argmax/topn assignment aggregation (optimization round 12) must
be VALUE-IDENTICAL to the row_number-window form it replaced — same
(order DESC, tie ASC) ranking, including exact ties on the order
column. Checked on a crafted candidate frame and on the real operators
(kmeans assignment + ivf_assign probes=1/2) against a window
reimplementation."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from hyppo_worker_spark.functions import vectors as V
from hyppo_worker_spark.operators.similarity import (
    argmax_pick,
    ivf_assign,
    kmeans_centroids,
    topn_cells,
)


def _window_pick(scored, key, order, tie, cols, n=1):
    w = W.partitionBy(key).orderBy(F.col(order).desc(), tie)
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .select(key, *cols)
    )


def test_argmax_pick_matches_window_with_ties(spark):
    rows = [
        # key 1: strict order
        (1, 0, 0.9), (1, 1, 0.7), (1, 2, 0.8),
        # key 2: exact tie on the order value -> lowest cent wins
        (2, 0, 0.5), (2, 1, 0.5), (2, 2, 0.1),
        # key 3: all tied
        (3, 0, 0.0), (3, 1, 0.0), (3, 2, 0.0),
        # key 4: negative sims
        (4, 0, -0.2), (4, 1, -0.1), (4, 2, -0.3),
    ]
    df = spark.createDataFrame(rows, "k long, cent_id long, sim double")
    got = sorted(
        (r["k"], r["cell"])
        for r in argmax_pick(
            df, ["k"], F.col("sim"), F.col("cent_id"),
            {"cell": F.col("cent_id")},
        ).collect()
    )
    want = sorted(
        (r["k"], r["cent_id"])
        for r in _window_pick(df, "k", "sim", "cent_id", ["cent_id"]).collect()
    )
    assert got == want == [(1, 0), (2, 0), (3, 0), (4, 1)]


def test_topn_cells_matches_window_with_ties(spark):
    rows = [
        (1, 0, 0.9, 10.0), (1, 1, 0.9, 10.0), (1, 2, 0.8, 10.0),
        (2, 0, 0.1, 20.0), (2, 1, 0.3, 20.0), (2, 2, 0.2, 20.0),
    ]
    df = spark.createDataFrame(
        rows, "k long, cent_id long, sim double, payload double"
    )
    got = sorted(
        (r["k"], r["cell"], r["payload"])
        for r in topn_cells(
            df, ["k"], F.col("sim"), F.col("cent_id"),
            {"payload": F.col("payload")}, 2,
        ).collect()
    )
    want = sorted(
        (r["k"], r["cent_id"], r["payload"])
        for r in _window_pick(
            df, "k", "sim", "cent_id", ["cent_id", "payload"], n=2
        ).collect()
    )
    assert got == want == [
        (1, 0, 10.0), (1, 1, 10.0), (2, 1, 20.0), (2, 2, 20.0),
    ]


def _vec_rows():
    # 12 vectors in 4 dims, including exact duplicates (tie pressure on
    # the assignment argmax) and a vector equidistant to two seeds
    return [
        (i, [float((i * 7 + j * 3) % 5) - 2.0 for j in range(4)])
        for i in range(10)
    ] + [(10, [3.0, -2.0, 1.0, 0.0]), (11, [3.0, -2.0, 1.0, 0.0])]


def test_ivf_assign_matches_window_form(spark):
    df = spark.createDataFrame(
        _vec_rows(), "vec_id long, embedding array<double>"
    )
    cents = (
        kmeans_centroids(df, n_centroids=3, n_iter=1)
        .withColumn("cent_norm", V.norm(F.col("cent")))
        .localCheckpoint(eager=True)
    )
    for probes in (1, 2):
        got = ivf_assign(df, cents, probes=probes)
        # window reimplementation of the pre-optimization form
        v = df.select(
            F.col("vec_id").alias("__id"),
            V.as_double(F.col("embedding")).alias("__v"),
        ).withColumn("__vnorm", V.norm(F.col("__v")))
        scored = v.join(F.broadcast(cents)).withColumn(
            "__sim",
            V.dot(F.col("__v"), F.col("cent"))
            / (F.col("__vnorm") * F.col("cent_norm")),
        )
        w = W.partitionBy("__id").orderBy(F.col("__sim").desc(), "cent_id")
        want = (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= probes)
            .select("__id", F.col("cent_id").alias("cell"))
        )
        assert sorted(
            (r["__id"], r["cell"]) for r in got.select("__id", "cell").collect()
        ) == sorted((r["__id"], r["cell"]) for r in want.collect())
