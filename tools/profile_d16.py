"""Itemize d16's phases (VERDICT r10 item 6): train, flat assign +
within-cell pairwise + CC, two-level assign + pairwise + CC, and the
report joins — each phase forced with its own noop action so the wall
attributes to THAT phase (lineage up to the phase's inputs is
materialized first via localCheckpoint, mirroring the query's own
barriers).

Usage: python tools/profile_d16.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from hyppo_worker_spark.functions import vectors as V
    from hyppo_worker_spark.operators import dedup as D
    from hyppo_worker_spark.operators.similarity import (
        derive_n_centroids,
        kmeans_centroids,
    )
    from hyppo_worker_spark.session import get_spark, load_tables

    spark = get_spark("profile-d16")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    base = emb.select(
        "vec_id", V.as_double(F.col("embedding")).alias("v"), "label"
    )
    planted = base.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "v", lambda x, i: F.when(i == 0, x + F.lit(0.0625)).otherwise(x)
        ).alias("v"),
        "label",
    )
    times: dict[str, float] = {}

    def phase(name, fn):
        t0 = time.perf_counter()
        out = fn()
        times[name] = round(time.perf_counter() - t0, 2)
        print(f"  {name}: {times[name]}s", file=sys.stderr)
        return out

    # phase 0: corpus materialization (the query's tracked_persist)
    corpus = phase(
        "corpus_build+persist",
        lambda: base.unionByName(planted).localCheckpoint(eager=True),
    )
    n = phase("count", lambda: corpus.select("vec_id").count())
    k = derive_n_centroids(n)

    # phase 1: k-means training (2 Lloyd rounds, shared quantizer)
    cents = phase(
        f"kmeans_train(k={k})",
        lambda: kmeans_centroids(
            corpus, id_col="vec_id", vec_col="v", n_centroids=k, n_iter=2
        ).localCheckpoint(eager=True),
    )

    def dropped(assignment):
        comp = D.semantic_dedup_components(
            corpus, "vec_id", "v", n_iter=2, threshold=0.9,
            assignment=assignment, centroids=cents,
        )
        return comp.filter(F.col("node") != F.col("comp"))

    # phase 2/3: each full path (assign + in-cell pairwise + CC)
    flat_d = phase(
        "flat_assign+pairwise+CC",
        lambda: dropped("flat").localCheckpoint(eager=True),
    )
    two_d = phase(
        "two_level_assign+pairwise+CC",
        lambda: dropped("two_level").localCheckpoint(eager=True),
    )

    # phase 4: the report joins (bound + per-label rollup)
    def report():
        ft = flat_d.count()
        tt = two_d.count()
        per_label = (
            corpus.join(
                flat_d.select(F.col("node").alias("vec_id"))
                .withColumn("is_d", F.lit(1)),
                "vec_id",
                "left",
            )
            .groupBy("label")
            .agg(F.count(F.lit(1)).alias("n_vecs"))
            .count()
        )
        return ft, tt, per_label

    phase("report_joins", report)
    total = round(sum(times.values()), 2)
    print(f"TOTAL {total}s  phases={times}")


if __name__ == "__main__":
    main()
