"""Similarity-search operators: deterministic k-means centroids, IVF
recall behavior, and the nprobe recall/compute trade-off."""

import pytest
from pyspark.sql import functions as F

from hyppo_worker_spark.operators import similarity as S
from hyppo_worker_spark.session import load_tables

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return load_tables(spark, SF_DIR, ("embeddings",))["embeddings"]


def test_kmeans_centroids_deterministic(emb):
    """Fixed-point integer updates make centroids identical across
    runs regardless of partition/merge order."""
    a = S.kmeans_centroids(emb, n_centroids=8, n_iter=2)
    b = S.kmeans_centroids(emb.repartition(7), n_centroids=8, n_iter=2)
    ra = {r.cent_id: r.cent for r in a.collect()}
    rb = {r.cent_id: r.cent for r in b.collect()}
    assert ra == rb  # bit-identical, not just close
    assert len(ra) == 8


def test_kmeans_moves_centroids_from_init(emb):
    init = {r.cent_id: r.cent for r in S.kmeans_centroids(emb, n_centroids=8, n_iter=0).collect()}
    fit = {r.cent_id: r.cent for r in S.kmeans_centroids(emb, n_centroids=8, n_iter=2).collect()}
    assert any(init[i] != fit[i] for i in init)  # Lloyd rounds actually ran


def test_kmeans_empty_cell_keeps_previous_centroid(spark):
    """Two far clusters, 3 centroids: the centroid stranded without
    members must survive with its previous value, not vanish."""
    rows = [(0, [10.0, 0.0]), (1, [10.1, 0.0]), (2, [-10.0, 0.1]), (3, [-10.1, 0.0])]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    cents = S.kmeans_centroids(df, n_centroids=3, n_iter=2).collect()
    assert len(cents) == 3


def test_ivf_recall_floor_and_nprobe_monotonicity(spark, emb):
    """recall@5 of k-means IVF at fixed (deterministic) init, and the
    nprobe knob buying recall back. Data + algorithm are fully
    deterministic, so exact thresholds are stable."""
    queries = emb.filter(F.col("vec_id") < 20)
    truth = {
        (r.q_id, r.neighbor_id)
        for r in S.knn_bruteforce(emb, queries, k=5).collect()
    }

    def recall(nprobe):
        got = {
            (r.q_id, r.neighbor_id)
            for r in S.knn_ivf(
                emb, queries, k=5, n_centroids=8, n_iter=2, nprobe=nprobe
            ).collect()
        }
        return len(got & truth) / len(truth)

    r1, r2 = recall(1), recall(2)
    assert r1 >= 0.4  # nprobe=1 floor at 8 cells on this corpus
    assert r2 > r1  # probing a second cell must improve recall
    assert r2 >= 0.6


# -- Product quantization --------------------------------------------------

from pyspark.sql import Window as W  # noqa: E402

from hyppo_worker_spark.functions import vectors as V  # noqa: E402
from hyppo_worker_spark.operators import pq as PQ  # noqa: E402


def test_pq_subvectors_reassemble(emb):
    """Concatenating a vector's M subvector slices reproduces it."""
    subs = PQ.pq_subvectors(emb.limit(10), "vec_id", "embedding", m=8, dim=64)
    back = (
        subs.groupBy("__id")
        .agg(
            F.flatten(
                F.array_sort(F.collect_list(F.struct("m", "sv"))).getField("sv")
            ).alias("rv")
        )
    )
    orig = emb.limit(10).select(
        F.col("vec_id").alias("__id"),
        V.as_double(F.col("embedding")).alias("ov"),
    )
    bad = (
        back.join(orig, "__id")
        .filter(F.col("rv") != F.col("ov"))
        .count()
    )
    assert bad == 0


def test_pq_codes_cover_range_and_one_per_subspace(emb):
    cb = PQ.pq_codebooks(emb, m=8, k=8, dim=64, n_iter=1)
    codes = PQ.pq_encode(emb, cb, m=8, dim=64)
    n = emb.count()
    assert codes.count() == n * 8  # exactly one code per (vec, subspace)
    lo, hi = codes.agg(F.min("code"), F.max("code")).first()
    assert 0 <= lo and hi <= 7


def test_pq_adc_distance_is_sum_of_subspace_table_entries(emb):
    """ADC's integer distance must equal the sum over subspaces of the
    query-to-assigned-centroid scaled distances (computed here from
    first principles for one query)."""
    cb = PQ.pq_codebooks(emb, m=8, k=8, dim=64, n_iter=1)
    codes = PQ.pq_encode(emb, cb, m=8, dim=64)
    queries = emb.filter(F.col("vec_id") == 3)
    approx = PQ.pq_adc_topk(codes, cb, queries, m=8, dim=64, k=3)
    rows = approx.collect()
    assert len(rows) == 3
    qsubs = PQ.pq_subvectors(queries, "vec_id", "embedding", m=8, dim=64)
    lut = {
        (r.m, r.cent_id): r.c
        for r in qsubs.join(F.broadcast(cb), "m")
        .select(
            "m",
            "cent_id",
            F.floor(V.sqdist(F.col("sv"), F.col("cent")) * PQ.ADC_SCALE)
            .cast("long")
            .alias("c"),
        )
        .collect()
    }
    for r in rows:
        ncodes = codes.filter(F.col("__id") == r.neighbor_id).collect()
        expect = sum(lut[(c.m, c.code)] for c in ncodes)
        assert r.adist_u6 == expect


def test_pq_recall_floor(spark, emb):
    """PQ@32x compression on this corpus: recall@5 must clear a floor
    (measured 0.31 at M=16, K=8 — random vectors are PQ's worst case,
    but the ranking must still beat chance by a wide margin: random
    top-5 of 499 would hit ~0.01)."""
    queries = emb.filter(F.col("vec_id") < 20)
    cb = PQ.pq_codebooks(emb, m=16, k=8, dim=64, n_iter=2)
    codes = PQ.pq_encode(emb, cb, m=16, dim=64)
    approx = PQ.pq_adc_topk(codes, cb, queries, m=16, dim=64, k=5)
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        V.as_double(F.col("embedding")).alias("cv"),
    )
    q = queries.select(
        F.col("vec_id").alias("q_id"), V.as_double(F.col("embedding")).alias("qv")
    )
    ex = c.join(F.broadcast(q), F.col("q_id") != F.col("neighbor_id")).select(
        "q_id",
        "neighbor_id",
        F.floor(V.sqdist(F.col("qv"), F.col("cv")) * PQ.ADC_SCALE)
        .cast("long")
        .alias("e"),
    )
    we = W.partitionBy("q_id").orderBy(F.col("e").asc(), "neighbor_id")
    etop = (
        ex.withColumn("r", F.row_number().over(we))
        .filter(F.col("r") <= 5)
        .select("q_id", "neighbor_id")
    )
    hits = approx.join(etop, ["q_id", "neighbor_id"], "left_semi").count()
    assert hits / 100 >= 0.2


def test_derive_n_centroids_scale_invariant():
    """VERDICT r4 item 2: SemDeDup's centroid count must grow linearly
    with the corpus so average cell size stays ~TARGET_CELL_ROWS —
    a pinned count makes intra-cell pairwise quadratic at scale."""
    from hyppo_worker_spark.operators.similarity import (
        CENTROID_FLOOR,
        TARGET_CELL_ROWS,
        derive_n_centroids,
    )

    # sf0.01 demo floor: 600-vector corpus still clusters with 8 cells
    assert derive_n_centroids(600) == CENTROID_FLOOR == 8
    # linear growth: average cell pinned to the target at any size
    for n in (10**6, 10**9, 10**11):
        k = derive_n_centroids(n)
        assert k == -(-n // TARGET_CELL_ROWS)  # ceil
        assert n / k <= TARGET_CELL_ROWS
    # 100 TB read: 1e11 vectors -> ~390M cells of ~256 vectors, so the
    # per-cell exact pairwise is ~256^2/2 comparisons per cell, flat.
    assert derive_n_centroids(10**11) == 390_625_000


def test_semantic_dedup_derives_centroids_from_corpus(spark, emb):
    """n_centroids=None must use the derived count: on a 500-vector
    corpus that's the floor (8) — same components as an explicit 8."""
    from hyppo_worker_spark.operators import dedup as D

    base = emb.select("vec_id", F.col("embedding").alias("v"))
    derived = D.semantic_dedup_components(base, "vec_id", "v", threshold=0.9)
    explicit = D.semantic_dedup_components(
        base, "vec_id", "v", n_centroids=8, threshold=0.9
    )
    assert sorted(map(tuple, derived.collect())) == sorted(
        map(tuple, explicit.collect())
    )


def test_two_level_assign_agrees_with_flat(spark):
    """IVF-style coarse-then-fine assignment (the d11 scale path past
    flat broadcast assignment) must agree with flat argmax on >= 95%
    of a structured corpus, and exactly on vectors sitting tight on
    their centroid."""
    import random

    from hyppo_worker_spark.operators.similarity import (
        kmeans_centroids,
        two_level_assign,
    )
    from hyppo_worker_spark.functions import vectors as V2

    rng = random.Random(7)
    dim, n_cent, per = 16, 16, 25
    # centers: one-hot-ish directions, well separated
    rows = []
    vid = 0
    for c in range(n_cent):
        base = [0.0] * dim
        base[c % dim] = 1.0
        base[(c * 5 + 3) % dim] = 0.5 if c >= dim else 0.0
        for _ in range(per):
            rows.append(
                (vid, [x + rng.uniform(-0.05, 0.05) for x in base])
            )
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    vecs = df.select(
        F.col("vec_id").alias("__id"),
        V2.as_double(F.col("embedding")).alias("__v"),
    )
    cents = kmeans_centroids(df, n_centroids=n_cent, n_iter=2).localCheckpoint(
        eager=True
    )

    # flat argmax (the reference assignment)
    cn = cents.withColumn("cnorm", V2.norm(F.col("cent")))
    sim = V2.dot(F.col("__v"), F.col("cent")) / (
        V2.norm(F.col("__v")) * F.col("cnorm")
    )
    w = W.partitionBy("__id").orderBy(F.round(sim, 6).desc(), "cent_id")
    flat = (
        vecs.join(F.broadcast(cn))
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("__id", F.col("cent_id").alias("cell"))
    )
    two = two_level_assign(vecs, cents)

    f = dict((r["__id"], r["cell"]) for r in flat.collect())
    t = dict((r["__id"], r["cell"]) for r in two.collect())
    assert set(f) == set(t)  # every vector assigned exactly once
    agree = sum(1 for i in f if f[i] == t[i]) / len(f)
    assert agree >= 0.95, f"two-level agreement {agree:.2%}"


def test_semantic_dedup_two_level_catches_planted_dups(spark, emb):
    """assignment='two_level' (the IVF-style scale path) must still
    place eps-close planted copies in one cell and drop them — full
    recall on the near-identical pairs SemDeDup exists to catch."""
    from hyppo_worker_spark.operators import dedup as D
    from hyppo_worker_spark.functions import vectors as V2

    base = emb.select(
        "vec_id", V2.as_double(F.col("embedding")).alias("v")
    )
    planted = base.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "v", lambda x, i: F.when(i == 0, x + F.lit(0.0625)).otherwise(x)
        ).alias("v"),
    )
    corpus = base.unionByName(planted)
    def drops(mode):
        comp = D.semantic_dedup_components(
            corpus, "vec_id", "v", threshold=0.9, assignment=mode
        )
        return comp.filter(F.col("node") != F.col("comp")).count()

    n_planted = planted.count()
    flat, two = drops("flat"), drops("two_level")
    # Even FLAT assignment misses pairs straddling a cell boundary —
    # the documented SemDeDup cross-cell trade (measured: 99/100 at
    # this corpus). Two-level adds the nprobe=1 coarse-routing trade;
    # the contract is: within 5% of flat's recall and >= 90% absolute.
    assert two >= flat - max(n_planted // 20, 1)
    assert two >= 0.9 * n_planted
