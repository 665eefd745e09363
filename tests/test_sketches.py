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


# -- Bloom ----------------------------------------------------------------

from pyspark.sql import Row  # noqa: E402

from hyppo_worker_spark.operators.bloom import (  # noqa: E402
    bloom_build,
    bloom_merge,
    bloom_might_contain,
)

BITS, K = 1 << 10, 3  # small filter forces real false positives


def _bf_keys(spark, keys):
    return spark.createDataFrame([Row(k=x) for x in keys], "k string")


def test_bloom_no_false_negatives(spark):
    keys = [f"member{i}" for i in range(100)]
    words = bloom_build(_bf_keys(spark, keys), "k", bits=BITS, hashes=K)
    out = bloom_might_contain(
        words, _bf_keys(spark, keys), "k", bits=BITS, hashes=K
    )
    assert out.filter(~F.col("bloom_pass")).count() == 0


def test_bloom_false_positives_exist_but_bounded(spark):
    # 300 members * 3 hashes into 1024 bits -> ~60% fill -> fpp ~ 0.2;
    # collisions are certain, but most non-members must still miss at
    # a fill below saturation.
    members = [f"m{i}" for i in range(300)]
    others = [f"x{i}" for i in range(500)]
    words = bloom_build(_bf_keys(spark, members), "k", bits=BITS, hashes=K)
    out = bloom_might_contain(
        words, _bf_keys(spark, others), "k", bits=BITS, hashes=K
    )
    fp = out.filter(F.col("bloom_pass")).count()
    assert 0 < fp < 300


def test_bloom_merge_equals_global_build(spark):
    keys = [f"k{i}" for i in range(80)]
    merged = bloom_merge(
        bloom_build(_bf_keys(spark, keys[:30]), "k", bits=BITS, hashes=K),
        bloom_build(_bf_keys(spark, keys[30:]), "k", bits=BITS, hashes=K),
    )
    direct = bloom_build(_bf_keys(spark, keys), "k", bits=BITS, hashes=K)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_bloom_sharded_build_merges_like_separate_builds(spark):
    rows = [Row(k=f"k{i}", shard=f"s{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "k string, shard string")
    sharded = bloom_build(df, "k", bits=BITS, hashes=K, shard_col="shard")
    assert sharded.select("shard").distinct().count() == 3
    merged = bloom_merge(sharded)
    direct = bloom_build(df, "k", bits=BITS, hashes=K)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_bloom_null_key_roundtrip(spark):
    # NULL keys hash as '' on both engines (md5_bucket convention):
    # inserting a NULL makes NULL (and '') probe-positive.
    df = spark.createDataFrame([Row(k=None), Row(k="a")], "k string")
    words = bloom_build(df, "k", bits=BITS, hashes=K)
    out = bloom_might_contain(words, df, "k", bits=BITS, hashes=K)
    assert out.filter(~F.col("bloom_pass")).count() == 0


def test_bloom_candidates_matches_per_shard_probe(spark):
    """bloom_candidates (sharded manifest probe) agrees with running
    bloom_might_contain per shard, and never drops a true member."""
    from pyspark.sql import functions as F

    from hyppo_worker_spark.operators.bloom import (
        bloom_build,
        bloom_candidates,
        bloom_might_contain,
    )

    bits, k = 256, 3
    data = spark.range(300).select(
        (F.col("id") % 40).alias("key"),
        (F.col("id") % 4).cast("int").alias("fid"),
    )
    manifest = bloom_build(
        data, "key", bits=bits, hashes=k, shard_col="fid"
    ).persist()
    probes = spark.range(0, 50, 7).select(F.col("id").alias("key"))
    got = {
        (r["key"], r["fid"])
        for r in bloom_candidates(
            manifest, probes, "key", shard_col="fid", bits=bits, hashes=k
        ).collect()
    }
    want = set()
    for fid in range(4):
        words = manifest.filter(F.col("fid") == fid).select(
            "word", "bits_w"
        )
        for r in bloom_might_contain(
            words, probes, "key", bits=bits, hashes=k
        ).collect():
            if r["bloom_pass"]:
                want.add((r["key"], fid))
    assert got == want
    # no false negatives: every true (key, fid) pair is a candidate
    truth = {
        (r["key"], r["fid"])
        for r in data.join(probes, "key").select("key", "fid").collect()
    }
    assert truth <= got
    manifest.unpersist()


def test_bloom_sharded_incremental_fold_equals_rebuild(spark):
    """p40's manifest maintenance: per-batch SHARDED filters OR-folded
    per (shard, word) must equal one sharded build over all arrived
    rows — bit_or associativity is what lets the streaming manifest
    never re-read earlier batches."""
    rows = [Row(k=f"k{i}", shard=f"s{i % 4}", b=i % 3) for i in range(90)]
    df = spark.createDataFrame(rows, "k string, shard string, b int")
    folded = None
    for b in range(3):
        t = bloom_build(
            df.filter(F.col("b") == b), "k",
            bits=BITS, hashes=K, shard_col="shard",
        )
        folded = t if folded is None else folded.unionByName(t)
    folded = folded.groupBy("shard", "word").agg(
        F.bit_or("bits_w").alias("bits_w")
    )
    direct = bloom_build(df, "k", bits=BITS, hashes=K, shard_col="shard")
    cols = ["shard", "word", "bits_w"]
    assert sorted(map(tuple, folded.select(*cols).collect())) == sorted(
        map(tuple, direct.select(*cols).collect())
    )
