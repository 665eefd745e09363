"""margin_bitext_mine: hand-computed ratio margins on crafted vectors.

Pins the three load-bearing pieces: the margin is the exact integer
algebra cos6 * 2k * 10000 div (fsum + bsum) recomputed here with
numpy + pure-python floor division, a pair must be MUTUAL argmax to
surface (x's best being y is not enough when y's best is some x'),
and a hub vector close to many queries is denominator-penalized out
of the mined set.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from hyppo_worker_spark.operators.similarity import margin_bitext_mine

K = 2
SCALE = 1_000_000


def _mine_reference(A, B, k=K):
    """Independent numpy twin of the operator's integer algebra."""
    ids_a, va = zip(*A)
    ids_b, vb = zip(*B)
    va = np.array(va, dtype=np.float64)
    vb = np.array(vb, dtype=np.float64)
    cos = va @ vb.T / (
        np.linalg.norm(va, axis=1)[:, None] * np.linalg.norm(vb, axis=1)[None, :]
    )
    cos6 = np.round(cos * SCALE).astype(np.int64)
    # top-k sums with id tie-breaks (ids here are distinct-valued
    # cosines, so plain sort on (-cos6, id) is enough)
    fsum = {}
    for i, aid in enumerate(ids_a):
        order = sorted(range(len(ids_b)), key=lambda j: (-cos6[i, j], ids_b[j]))
        fsum[aid] = int(sum(cos6[i, j] for j in order[:k]))
    bsum = {}
    for j, bid in enumerate(ids_b):
        order = sorted(range(len(ids_a)), key=lambda i: (-cos6[i, j], ids_a[i]))
        bsum[bid] = int(sum(cos6[i, j] for i in order[:k]))
    margins = {}
    for i, aid in enumerate(ids_a):
        for j, bid in enumerate(ids_b):
            c = int(cos6[i, j])
            den = fsum[aid] + bsum[bid]
            if c > 0 and den > 0:
                # positive operands: floor == trunc == Spark's div
                margins[(aid, bid)] = (c * 2 * k * 10000) // den
    fwd = {}
    for aid in ids_a:
        cand = [(m, b) for (a, b), m in margins.items() if a == aid]
        if cand:
            # tie-break: highest margin, then LOWEST b_id
            best = sorted(cand, key=lambda t: (-t[0], t[1]))[0]
            fwd[aid] = best[1]
    bwd = {}
    for bid in ids_b:
        cand = [(m, a) for (a, b), m in margins.items() if b == bid]
        if cand:
            best = sorted(cand, key=lambda t: (-t[0], t[1]))[0]
            bwd[bid] = best[1]
    return {
        (a, b): margins[(a, b)]
        for a, b in margins
        if fwd.get(a) == b and bwd.get(b) == a
    }


def _run(spark, A, B):
    a = spark.createDataFrame(
        [(i, list(map(float, v))) for i, v in A], "vec_id long, v array<double>"
    )
    b = spark.createDataFrame(
        [(i, list(map(float, v))) for i, v in B], "vec_id long, v array<double>"
    )
    out = margin_bitext_mine(a, b, vec_col="v", k=K).orderBy("a_id").collect()
    return {(r.a_id, r.b_id): r.margin_bp for r in out}


def test_matches_independent_integer_reference(spark):
    rng = np.random.default_rng(7)
    A = [(2 * i, rng.normal(size=32)) for i in range(12)]
    B = [(2 * i + 1, rng.normal(size=32)) for i in range(15)]
    # plant one twin: B[0] becomes a near-copy of A[3]
    B[0] = (B[0][0], A[3][1] + np.array([0.0625] + [0.0] * 31))
    got = _run(spark, A, B)
    want = _mine_reference(A, B)
    assert got == want
    # the planted twin must be mined with the ratio-margin lift
    # clearly visible (at 32 dims random cosines are small, so the
    # twin clears the 1.5x bar the s20 row uses)
    assert (A[3][0], B[0][0]) in got
    assert got[(A[3][0], B[0][0])] >= 15000
    assert got[(A[3][0], B[0][0])] == max(got.values())


def test_mutual_argmax_required(spark):
    # x0's best is y0, but y0's best is x1 (closer) -> (x0, y0) must
    # NOT be mined; (x1, y0) is mutual and must be.
    y0 = np.array([1.0, 0.0, 0.0, 0.0])
    x1 = np.array([0.999, 0.04, 0.0, 0.0])  # closest to y0
    x0 = np.array([0.97, 0.24, 0.0, 0.0])  # y0 is still x0's best
    far = np.array([0.0, 0.0, 1.0, 0.0])
    A = [(0, x0), (2, x1), (4, far)]
    B = [(1, y0), (3, np.array([0.0, 1.0, 0.0, 0.0])), (5, -far)]
    got = _run(spark, A, B)
    assert (2, 1) in got
    assert (0, 1) not in got
    assert got == _mine_reference(A, B)


def test_hub_is_denominator_penalized(spark):
    # a B-side hub equally close to every A vector: every A ranks it
    # top-1, but its OWN top-k average is as high as any single
    # cosine, so no pair with the hub clears a 1.5x margin.
    base = np.eye(4)
    hub = np.ones(4) / 2.0  # cos = 0.5 to every axis vector
    A = [(2 * i, base[i]) for i in range(4)]
    B = [(1, hub), (3, base[0] * 0.9 + 0.01)]  # 3 is a real twin of A0
    got = _run(spark, A, B)
    for (a, b), m in got.items():
        if b == 1:
            assert m < 15000
    assert got == _mine_reference(A, B)


def test_plan_broadcasts_candidate_side(spark):
    rng = np.random.default_rng(11)
    A = [(2 * i, rng.normal(size=4)) for i in range(5)]
    B = [(2 * i + 1, rng.normal(size=4)) for i in range(5)]
    a = spark.createDataFrame(
        [(i, list(map(float, v))) for i, v in A], "vec_id long, v array<double>"
    )
    b = spark.createDataFrame(
        [(i, list(map(float, v))) for i, v in B], "vec_id long, v array<double>"
    )
    plan = (
        margin_bitext_mine(a, b, vec_col="v", k=K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan  # all-pairs scoring side


def test_margin_mine_pairs_candidate_restriction(spark):
    # restricting the candidate set changes the DENOMINATORS (top-k
    # over candidates only), not just the pair universe: dropping a
    # high-cosine distractor pair raises the mined margin.
    rows_all = [(0, 1, 900000), (0, 3, 500000), (2, 1, 400000), (2, 3, 350000)]
    rows_sub = [(0, 1, 900000), (2, 3, 350000)]

    def mine(rows):
        df = spark.createDataFrame(rows, "a_id long, b_id long, cos6 long")
        from hyppo_worker_spark.operators.similarity import margin_mine_pairs

        return {
            (r.a_id, r.b_id): r.margin_bp
            for r in margin_mine_pairs(df, k=K).collect()
        }

    full = mine(rows_all)
    sub = mine(rows_sub)
    # hand-check (k=2): full fsum(0)=1400000, bsum(1)=1300000 ->
    # margin(0,1) = 900000*40000 // 2700000 = 13333
    assert full[(0, 1)] == 900000 * 40000 // (1400000 + 1300000)
    # subset: fsum(0)=900000, bsum(1)=900000 -> margin = 20000
    assert sub[(0, 1)] == 900000 * 40000 // (900000 + 900000)
    assert sub[(0, 1)] > full[(0, 1)]


def test_ivf_assign_multiprobe_cells(spark):
    from hyppo_worker_spark.operators.similarity import (
        ivf_assign,
        kmeans_centroids,
    )
    from hyppo_worker_spark.functions import vectors as V

    base = np.eye(4)
    rows = [(i, list(map(float, base[i % 4] + 0.01 * i))) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    cents = (
        kmeans_centroids(df, vec_col="v", n_centroids=4, n_iter=1)
        .withColumn("cent_norm", V.norm(F.col("cent")))
        .localCheckpoint(eager=True)
    )
    one = ivf_assign(df, cents, vec_col="v", probes=1).collect()
    two = ivf_assign(df, cents, vec_col="v", probes=2).collect()
    assert len(one) == 12 and len(two) == 24
    # probes=2 is a superset: every probes=1 (id, cell) survives
    s1 = {(r["__id"], r.cell) for r in one}
    s2 = {(r["__id"], r.cell) for r in two}
    assert s1 <= s2
    # and each vector's two probed cells are distinct
    from collections import Counter

    per = Counter(r["__id"] for r in two)
    assert set(per.values()) == {2}
    cells_per = {}
    for r in two:
        cells_per.setdefault(r["__id"], set()).add(r.cell)
    assert all(len(c) == 2 for c in cells_per.values())
