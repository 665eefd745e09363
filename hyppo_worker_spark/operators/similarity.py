"""Similarity search over embedding columns.

Two tiers:

- **Brute-force top-k** for a small query set: broadcast the queries,
  score every (query, candidate) pair JVM-side, take top-k per query
  with a window. The corpus is scanned once, never shuffled (the only
  exchange is the tiny post-score top-k) — at 100 TB this is the
  standard "small query batch vs huge corpus" pattern.
- **Sign-bucket ANN**: partition the corpus by an LSH sign bucket of
  the embedding; a query only scores candidates in its own bucket.
  The bucket equi-join replaces the cross product, cutting compute by
  ~2^bits at some recall cost — the scale path for large query sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from hyppo_worker_spark.functions import vectors as V


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    Returns (q_id, neighbor_id, cos_sim, rank); self-matches excluded.
    """
    # Norms are precomputed per vector BEFORE the join: O(n+q) fold
    # evaluations instead of O(n*q), and the joined plan carries a
    # single dot-product expression (fast codegen).
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), V.as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cnorm", V.norm(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("q_id"), V.as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qnorm", V.norm(F.col("qv")))
    denom = F.col("qnorm") * F.col("cnorm")
    cos = F.when(denom > 0, V.dot(F.col("qv"), F.col("cv")) / denom).otherwise(F.lit(0.0))
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.round(cos, round_to))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cos_sim", "rank")
    )


def knn_sign_bucket(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bits: int = 6,
    round_to: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    sign bucket (equi-join on bucket id → shuffle-partitioned by
    bucket, no cross product)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        V.as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("bucket", V.sign_bucket(F.col("cv"), bits)).withColumn(
        "cnorm", V.norm(F.col("cv"))
    )
    q = queries.select(
        F.col(id_col).alias("q_id"), V.as_double(F.col(vec_col)).alias("qv")
    ).withColumn("bucket", V.sign_bucket(F.col("qv"), bits)).withColumn(
        "qnorm", V.norm(F.col("qv"))
    )
    denom = F.col("qnorm") * F.col("cnorm")
    cos = F.when(denom > 0, V.dot(F.col("qv"), F.col("cv")) / denom).otherwise(F.lit(0.0))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("q_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.round(cos, round_to))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cos_sim", "rank")
    )


def cosine_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    round_to: int = 6,
) -> DataFrame:
    """All embedding pairs with cosine ≥ threshold (exact, all-pairs).

    Quadratic by construction — correct as a validation oracle and for
    moderate corpora; the bucketed variant (``knn_sign_bucket``
    composition) is the scale path.
    """
    a = df.select(
        F.col(id_col).alias("a_id"), V.as_double(F.col(vec_col)).alias("av")
    ).withColumn("anorm", V.norm(F.col("av")))
    b = df.select(
        F.col(id_col).alias("b_id"), V.as_double(F.col(vec_col)).alias("bv")
    ).withColumn("bnorm", V.norm(F.col("bv")))
    denom = F.col("anorm") * F.col("bnorm")
    cos = F.when(denom > 0, V.dot(F.col("av"), F.col("bv")) / denom).otherwise(F.lit(0.0))
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .withColumn("cos_sim", F.round(cos, round_to))
        .filter(F.col("cos_sim") >= threshold)
        .select("a_id", "b_id", "cos_sim")
    )


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 8,
    round_to: int = 6,
) -> DataFrame:
    """IVF-style approximate KNN: the corpus is inverted-file
    partitioned by nearest centroid; a query only scores its own
    centroid's cell (nprobe=1).

    Centroids here are the first ``n_centroids`` corpus vectors
    (deterministic; a production build would k-means them — the
    partitioning/probing plumbing is identical). Plan shape: one
    broadcast of the tiny centroid set for assignment, one shuffle on
    cell id for the probe join — compute drops by ~n_centroids vs
    brute force.
    """
    cents = (
        corpus.filter(F.col(id_col) < n_centroids)
        .select(F.col(id_col).alias("cent_id"), V.as_double(F.col(vec_col)).alias("cent"))
        .withColumn("cent_norm", V.norm(F.col("cent")))
    )

    def assign(df: DataFrame, idc: str, vecc: str) -> DataFrame:
        v = df.select(F.col(idc).alias("__id"), V.as_double(F.col(vecc)).alias("__v"))
        v = v.withColumn("__vnorm", V.norm(F.col("__v")))
        scored = v.join(F.broadcast(cents)).withColumn(
            "__sim",
            V.dot(F.col("__v"), F.col("cent")) / (F.col("__vnorm") * F.col("cent_norm")),
        )
        w = W.partitionBy("__id").orderBy(F.col("__sim").desc(), "cent_id")
        return (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(F.col("__id"), F.col("__v"), F.col("__vnorm"), F.col("cent_id").alias("cell"))
        )

    c = assign(corpus, id_col, vec_col).select(
        F.col("__id").alias("neighbor_id"),
        F.col("__v").alias("cv"),
        F.col("__vnorm").alias("cnorm"),
        "cell",
    )
    q = assign(queries, id_col, vec_col).select(
        F.col("__id").alias("q_id"),
        F.col("__v").alias("qv"),
        F.col("__vnorm").alias("qnorm"),
        "cell",
    )
    cos = F.round(
        V.dot(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm")), round_to
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("q_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", cos)
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cos_sim", "rank")
    )
