"""Operator-level dedup tests, including the rounding-boundary case
that distinguishes "filter on raw Jaccard" from "filter on rounded
Jaccard" (the two diverge for pairs in [threshold-0.0005, threshold)).
"""

from pyspark.sql import functions as F

from hyppo_worker_spark.operators.dedup import (
    connected_components,
    exact_dedup,
    minhash_lsh_pairs,
)


def _doc(words: list[str]) -> str:
    return " ".join(words)


def test_jaccard_threshold_uses_raw_not_rounded(spark):
    """A pair with true Jaccard 799/999 ≈ 0.79980 rounds to 0.800 at 3
    decimals. The filter must use the RAW ratio (exclude at threshold
    0.8), matching the oracle SQL which compares the unrounded ratio —
    otherwise the pair flips between engines."""
    # A: 1001 distinct words -> 999 distinct 3-shingles s1..s999.
    # B: the first 801 words of A -> shingles s1..s799, all shared.
    # intersection = 799, union = 999.
    words_a = [f"w{i:04d}" for i in range(1001)]
    words_b = words_a[:801]
    docs = spark.createDataFrame(
        [(1, _doc(words_a)), (2, _doc(words_b))], "doc_id int, text string"
    )

    # Sanity: the candidate IS generated and displays as 0.8 after
    # rounding (this is what makes the boundary case meaningful).
    below = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=12, bands=6, threshold=0.79
    ).collect()
    assert len(below) == 1
    assert abs(below[0].jaccard - 0.8) < 1e-9  # displayed (rounded) value

    # At threshold 0.8 the raw ratio 0.7998 must be excluded even
    # though the rounded display value equals the threshold.
    at = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=12, bands=6, threshold=0.8
    ).collect()
    assert at == []


def test_exact_dedup_keeps_min_id(spark):
    docs = spark.createDataFrame(
        [(3, "same text"), (1, "same text"), (2, "other")],
        "doc_id int, text string",
    )
    kept = sorted(r.doc_id for r in exact_dedup(docs, "doc_id", "text").collect())
    assert kept == [1, 2]


def test_connected_components_chain(spark):
    """A long chain exercises multi-round label propagation."""
    n = 12
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)] + [(100, 101)], "a_id int, b_id int"
    )
    comp = {
        r.node: r.comp for r in connected_components(edges).collect()
    }
    assert all(comp[i] == 0 for i in range(n + 1))
    assert comp[100] == comp[101] == 100


def test_connected_components_self_loop_only_node(spark):
    """A node appearing only in self-loop edges is a singleton
    component, not silently dropped."""
    edges = spark.createDataFrame(
        [(1, 2), (7, 7)], "a_id int, b_id int"
    )
    comp = {r.node: r.comp for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 7: 7}


def test_connected_components_max_iter_warns(spark):
    import warnings as w

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "a_id int, b_id int"
    )
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        connected_components(edges, max_iter=1).collect()
    assert any("not converged" in str(c.message) for c in caught)


def test_embedding_neardup_pairs_banded_recall(spark):
    """A near-identical copy perturbed only inside band 1 must be
    caught (bands 2-4 still match); an unrelated vector must not pair
    with anything at a 0.9 threshold."""
    from hyppo_worker_spark.operators.dedup import embedding_neardup_pairs

    base = [0.1] * 32
    copy = list(base)
    copy[0] = -0.01  # flips a band-1 sign bit; bands 2-4 untouched
    opposite = [-0.1] * 32
    vecs = spark.createDataFrame(
        [(1, base), (2, copy), (3, opposite)],
        "vec_id int, embedding array<double>",
    )
    pairs = embedding_neardup_pairs(
        vecs, "vec_id", "embedding", threshold=0.9, bands=4, bits=8
    ).collect()
    assert [(p.a_id, p.b_id) for p in pairs] == [(1, 2)]
    assert pairs[0].cos_sim > 0.9


def test_embedding_neardup_pairs_no_cross_band_match(spark):
    """Vectors agreeing on no complete band produce no candidates even
    when their cosine exceeds the threshold — documents the recall
    contract (any-band match) of the banded LSH candidate stage."""
    from hyppo_worker_spark.operators.dedup import embedding_neardup_pairs

    a = [0.1] * 32
    b = [0.1] * 32
    for start in (0, 8, 16, 24):  # flip one sign inside every band
        b[start] = -0.001  # cosine stays ≈ 0.93 — above the threshold
    vecs = spark.createDataFrame(
        [(1, a), (2, b)], "vec_id int, embedding array<double>"
    )
    pairs = embedding_neardup_pairs(
        vecs, "vec_id", "embedding", threshold=0.9, bands=4, bits=8
    ).collect()
    assert pairs == []


def test_incremental_lsh_matches_self_join_ground_truth(spark):
    """minhash_lsh_pairs_against(corpus, new) must find exactly the
    cross pairs that the full self-join finds on corpus ∪ new — the
    incremental path is an optimization, not a different semantics."""
    from hyppo_worker_spark.operators.dedup import minhash_lsh_pairs_against

    words = [f"w{i:03d}" for i in range(120)]
    corpus_rows = [
        (1, _doc(words[:100])),
        (2, _doc(words[10:110])),
        (3, _doc(["x%d" % i for i in range(100)])),
    ]
    new_rows = [
        (10, _doc(words[:95] + words[110:115])),  # near-dup of doc 1
        (11, _doc(["y%d" % i for i in range(100)])),  # unrelated
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id int, text string")
    new = spark.createDataFrame(new_rows, "doc_id int, text string")

    got = {
        (r.a_id, r.b_id): r.jaccard
        for r in minhash_lsh_pairs_against(
            corpus, new, "doc_id", "text", threshold=0.5
        ).collect()
    }
    full = {
        (r.a_id, r.b_id): r.jaccard
        for r in minhash_lsh_pairs(
            corpus.unionByName(new), "doc_id", "text", threshold=0.5
        ).collect()
    }
    corpus_ids = {r[0] for r in corpus_rows}
    # cross pairs: exactly one endpoint in the corpus. Normalize the
    # incremental output's (corpus_id, new_id) orientation to the
    # self-join's (min, max) before comparing.
    cross = {
        pair: j
        for pair, j in full.items()
        if (pair[0] in corpus_ids) != (pair[1] in corpus_ids)
    }
    got_normalized = {(min(a, b), max(a, b)): j for (a, b), j in got.items()}
    assert got, "incremental check found no pairs — expected (1, 10)"
    assert got_normalized == cross


def test_incremental_lsh_tolerates_overlapping_ids(spark):
    """An id present on both sides (a re-ingested doc) must not double
    its shingles in the verify union: Jaccard values for pairs touching
    it stay identical to the disjoint-id run, and no self-pair
    appears."""
    from hyppo_worker_spark.operators.dedup import minhash_lsh_pairs_against

    words = [f"w{i:03d}" for i in range(120)]
    corpus = spark.createDataFrame(
        [(1, _doc(words[:100])), (2, _doc(["x%d" % i for i in range(80)]))],
        "doc_id int, text string",
    )
    batch_doc = (10, _doc(words[:95] + words[110:115]))
    clean = spark.createDataFrame([batch_doc], "doc_id int, text string")
    # same batch plus doc 1 re-ingested verbatim
    overlapping = spark.createDataFrame(
        [batch_doc, (1, _doc(words[:100]))], "doc_id int, text string"
    )

    base = {
        (r.a_id, r.b_id): r.jaccard
        for r in minhash_lsh_pairs_against(
            corpus, clean, "doc_id", "text", threshold=0.5
        ).collect()
    }
    with_overlap = {
        (r.a_id, r.b_id): r.jaccard
        for r in minhash_lsh_pairs_against(
            corpus, overlapping, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert base  # (1, 10) found
    assert all(a != b for a, b in with_overlap)
    # every disjoint-run pair keeps its exact Jaccard under overlap
    for pair, j in base.items():
        assert with_overlap.get(pair) == j


def test_hot_band_cap_bounds_pathological_candidates(spark):
    """A band key shared by B docs emits B^2/2 candidate pairs — no
    partitioning trick fixes that (it's pair VOLUME, not skew).
    max_band_docs drops over-cap buckets: the pathological corpus
    (150 near-identical templated docs) collapses from ~11k verified
    pairs to zero, while a generous cap leaves a normal corpus's
    result untouched."""
    from hyppo_worker_spark.operators import dedup as D

    pathological = spark.createDataFrame(
        [
            (i, "the same templated boilerplate page content repeated "
                "for every listing with tiny suffix " + str(i % 3))
            for i in range(150)
        ],
        "doc_id long, text string",
    )
    uncapped = D.minhash_lsh_pairs(
        pathological, "doc_id", "text", num_hashes=12, bands=6, threshold=0.8
    ).count()
    capped = D.minhash_lsh_pairs(
        pathological,
        "doc_id",
        "text",
        num_hashes=12,
        bands=6,
        threshold=0.8,
        max_band_docs=20,
    ).count()
    assert uncapped > 10_000  # quadratic pair volume without the cap
    assert capped == 0  # over-cap buckets dropped entirely

    normal = spark.createDataFrame(
        [(i, f"distinct document number {i} with words {i * 7} and "
             f"{i * 13} plus filler tokens alpha beta gamma")
         for i in range(60)],
        "doc_id long, text string",
    )
    a = D.minhash_lsh_pairs(normal, "doc_id", "text", threshold=0.8)
    b = D.minhash_lsh_pairs(
        normal, "doc_id", "text", threshold=0.8, max_band_docs=1000
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_connected_components_adaptive_matches_distributed(spark):
    from hyppo_worker_spark.operators.dedup import (
        connected_components,
        connected_components_adaptive,
    )

    # chain + triangle + self-loop-only singleton + isolated pair
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10),
         (20, 20), (30, 31)],
        "a_id long, b_id long",
    )
    want = {
        (r.node, r.comp)
        for r in connected_components(edges).collect()
    }
    got_local = {
        (r.node, r.comp)
        for r in connected_components_adaptive(edges).collect()
    }
    # cap below the edge count -> distributed fallback, same answer
    got_fallback = {
        (r.node, r.comp)
        for r in connected_components_adaptive(
            edges, local_max_edges=3
        ).collect()
    }
    assert got_local == want
    assert got_fallback == want
    assert (20, 20) in want  # self-loop-only singleton kept


def test_projection_weights_deterministic_and_balanced():
    from hyppo_worker_spark.functions.vectors import projection_weights

    a = projection_weights(64, 4, 12)
    b = projection_weights(64, 4, 12)
    assert a == b  # pure function of (seed, indices)
    assert len(a) == 4 and len(a[0]) == 12 and len(a[0][0]) == 64
    flat = [x for band in a for bit in band for x in bit]
    assert set(flat) == {-1, 1}
    # md5 parity is ~balanced: neither sign dominates grossly
    pos = sum(1 for x in flat if x == 1)
    assert 0.4 < pos / len(flat) < 0.6
    # a different seed yields a different matrix
    assert projection_weights(64, 4, 12, seed="other") != a


def test_projection_banding_finds_planted_neardups(spark):
    from pyspark.sql import functions as F

    from hyppo_worker_spark.operators.dedup import embedding_neardup_pairs

    # deterministic 64-dim vectors + exact-plus-epsilon twins
    base = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), j -> "
            "(pmod(xxhash64(concat(cast(id as string), ':', "
            "cast(j as string))), 2001) - 1000) / 1000.0)"
        ).alias("v"),
    )
    twins = base.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.expr(
            "transform(v, (x, j) -> CASE WHEN j = 0 "
            "THEN x + 0.0625 ELSE x END)"
        ).alias("v"),
    )
    corpus = base.unionByName(twins)
    pairs = embedding_neardup_pairs(
        corpus, "vec_id", "v", threshold=0.9,
        bands=4, bits=12, projections=True, dim=64,
    ).collect()
    found = {(r.a_id, r.b_id) for r in pairs}
    planted = {(i, i + 1000) for i in range(0, 200, 10)}
    # S-curve recall: a 0.0625 shift on one of 64 components flips a
    # projection only near zero; with 4 independent 12-bit bands the
    # miss probability per pair is well under 1% — allow one miss
    assert len(planted - found) <= 1
    # precision exact: nothing else crosses cosine 0.9 (7 sigma out)
    assert not (found - planted)


def test_projections_require_dim(spark):
    import pytest as _pytest

    from hyppo_worker_spark.operators.dedup import embedding_neardup_pairs

    df = spark.createDataFrame(
        [(1, [0.1, 0.2])], "vec_id long, v array<double>"
    )
    with _pytest.raises(ValueError, match="dim"):
        embedding_neardup_pairs(df, "vec_id", "v", projections=True)
