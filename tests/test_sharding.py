"""Sharded training-data writer: deterministic placement, sizing,
round-trip fidelity, and balance."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from hyppo_worker_spark.operators.sharding import (
    SHARD_COL,
    assign_shards,
    plan_shards,
    write_shards,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"),
    )


def test_assignment_is_partitioning_independent(spark, corpus):
    a = assign_shards(corpus, "doc_id", 8)
    b = assign_shards(corpus.repartition(13), "doc_id", 8)
    assert set(map(tuple, a.collect())) == set(map(tuple, b.collect()))


def test_assignment_covers_and_balances(spark, corpus):
    counts = (
        assign_shards(corpus, "doc_id", 8)
        .groupBy(SHARD_COL)
        .count()
        .collect()
    )
    by_shard = {r[SHARD_COL]: r["count"] for r in counts}
    assert sorted(by_shard) == list(range(8))
    # md5 buckets over 1000 uniform keys: no shard should be pathological
    assert max(by_shard.values()) < 2 * min(by_shard.values())


def test_plan_shards_by_target_rows(spark, corpus):
    _, n = plan_shards(corpus, "doc_id", target_rows=300)
    assert n == 4  # ceil(1000 / 300)
    with pytest.raises(ValueError):
        plan_shards(corpus, "doc_id")
    with pytest.raises(ValueError):
        plan_shards(corpus, "doc_id", n_shards=4, target_rows=300)


def test_write_shards_roundtrip_and_layout(spark, corpus, tmp_path):
    path = str(tmp_path / "shards")
    n = write_shards(corpus, path, "doc_id", n_shards=4)
    assert n == 4
    dirs = sorted(
        os.path.basename(d)
        for d in glob.glob(os.path.join(path, f"{SHARD_COL}=*"))
    )
    assert dirs == [f"{SHARD_COL}={k}" for k in range(4)]
    # each shard directory is written by one task → one data file
    for d in dirs:
        files = [
            f
            for f in glob.glob(os.path.join(path, d, "*.parquet"))
            if os.path.isfile(f)
        ]
        assert len(files) == 1, f"{d} has {len(files)} files"
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert set(r["doc_id"] for r in back.select("doc_id").collect()) == set(
        range(1000)
    )


def test_write_is_deterministic_across_runs(spark, corpus, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_shards(corpus, p1, "doc_id", n_shards=4)
    write_shards(corpus.repartition(7), p2, "doc_id", n_shards=4)
    for k in range(4):
        r1 = spark.read.parquet(os.path.join(p1, f"{SHARD_COL}={k}"))
        r2 = spark.read.parquet(os.path.join(p2, f"{SHARD_COL}={k}"))
        assert sorted(map(tuple, r1.collect())) == sorted(map(tuple, r2.collect()))


def test_null_keys_get_deterministic_shard(spark):
    df = spark.createDataFrame(
        [(None, "a"), (None, "b"), (7, "c")], "doc_id long, text string"
    )
    rows = assign_shards(df, "doc_id", 4).collect()
    shards = {r["text"]: r[SHARD_COL] for r in rows}
    assert shards["a"] is not None and shards["a"] == shards["b"]
