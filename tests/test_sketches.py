"""Count-min sketch operator properties: one-sided error (estimate is
never below the true count, for EVERY key, not just heavy hitters),
merge-by-addition equivalence, and determinism of bucket placement."""

from __future__ import annotations

from pyspark.sql import functions as F

from hyppo_worker_spark.operators.sketches import (
    cms_counters,
    cms_estimate,
    merge_counters,
)

DEPTH, WIDTH = 3, 16  # small width forces real collisions


def _counts(spark, items: list[tuple[str, int]]):
    return spark.createDataFrame(items, "k string, cnt long")


def test_estimate_never_underestimates_any_key(spark):
    # 200 distinct keys into 16 buckets: collisions guaranteed.
    data = [(f"key{i:03d}", (i % 7) + 1) for i in range(200)]
    tc = _counts(spark, data)
    counters = cms_counters(tc, "k", "cnt", depth=DEPTH, width=WIDTH)
    est = cms_estimate(counters, tc, "k", depth=DEPTH, width=WIDTH)
    bad = est.filter(F.col("est") < F.col("cnt")).count()
    assert bad == 0
    # and at least one key must actually collide at this width
    assert est.filter(F.col("est") > F.col("cnt")).count() > 0


def test_merged_shards_equal_global_sketch(spark):
    data = [(f"k{i}", i + 1) for i in range(50)]
    whole = _counts(spark, data)
    a = _counts(spark, data[:20])
    b = _counts(spark, data[20:])
    merged = merge_counters(
        cms_counters(a, "k", "cnt", depth=DEPTH, width=WIDTH),
        cms_counters(b, "k", "cnt", depth=DEPTH, width=WIDTH),
    )
    direct = cms_counters(whole, "k", "cnt", depth=DEPTH, width=WIDTH)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_exact_when_no_collision(spark):
    # a single key cannot collide with anything: estimate == count
    tc = _counts(spark, [("only", 42)])
    counters = cms_counters(tc, "k", "cnt", depth=DEPTH, width=WIDTH)
    row = cms_estimate(counters, tc, "k", depth=DEPTH, width=WIDTH).first()
    assert row.est == 42
    assert counters.count() <= DEPTH  # one cell per depth row


# -- KMV ------------------------------------------------------------------

from hyppo_worker_spark.operators.sketches import (  # noqa: E402
    kmv_hash,
    kmv_merge,
    kmv_sketch,
)

KMV_K = 16


def _keys(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").cast("string").alias("k"))


def test_kmv_merge_equals_sketch_of_union(spark):
    a = _keys(spark, 0, 100)
    b = _keys(spark, 50, 150)
    merged = kmv_merge(
        kmv_sketch(a, "k", k=KMV_K), kmv_sketch(b, "k", k=KMV_K), k=KMV_K
    )
    direct = kmv_sketch(a.unionByName(b), "k", k=KMV_K)
    assert sorted(r.h for r in merged.collect()) == sorted(
        r.h for r in direct.collect()
    )


def test_kmv_small_set_is_the_set(spark):
    s = _keys(spark, 0, 5)
    rows = kmv_sketch(s, "k", k=KMV_K).collect()
    assert len(rows) == 5  # sketch holds everything -> estimates exact
    expected = sorted(
        r.h for r in s.select(kmv_hash("k").alias("h")).collect()
    )
    assert sorted(r.h for r in rows) == expected


def test_kmv_estimator_within_tolerance(spark):
    # 2000 keys, k=256: expected relative error ~ 1/sqrt(k) ~ 6%
    s = _keys(spark, 0, 2000)
    sk = kmv_sketch(s, "k", k=256)
    t = sk.agg(F.max("h").alias("t")).first().t
    est = (255 << 52) // t
    assert abs(est - 2000) * 5 <= 2000  # within 20%
