"""operators/deletion_vectors.py: packed positional bitmaps.

The algebra that makes merge-on-read safe: build/merge are
idempotent (double-deletes are the same bit), fold equals a single
build (bit_or associativity), read_with_dv keeps exactly the
complement, and the reader's apply is a broadcast join (the fact
side must never shuffle for the read tax)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hyppo_worker_spark.operators.deletion_vectors import (
    dv_build,
    dv_density,
    dv_merge,
    read_with_dv,
    stable_positions,
)


def _data(spark, n=100, fids=3):
    return spark.createDataFrame(
        [(i, i % fids, i // fids, f"v{i}") for i in range(n)],
        "rid long, fid int, pos long, payload string",
    )


def test_read_with_dv_keeps_exact_complement(spark):
    data = _data(spark)
    deleted = data.filter(F.col("rid") % 7 == 0)
    dv = dv_build(deleted.select("fid", "pos"))
    live = read_with_dv(data, dv)
    got = sorted(r["rid"] for r in live.collect())
    want = sorted(i for i in range(100) if i % 7 != 0)
    assert got == want
    assert live.columns == data.columns


def test_double_delete_is_idempotent_and_fold_equals_build(spark):
    data = _data(spark)
    a = data.filter(F.col("rid") < 40)
    b = data.filter((F.col("rid") >= 20) & (F.col("rid") < 60))  # overlap
    folded = dv_merge(
        dv_build(a.select("fid", "pos")), dv_build(b.select("fid", "pos"))
    )
    direct = dv_build(
        a.unionByName(b).select("fid", "pos")  # duplicates included
    )
    cols = ["fid", "word", "bits_w"]
    assert sorted(map(tuple, folded.select(*cols).collect())) == sorted(
        map(tuple, direct.select(*cols).collect())
    )
    assert sorted(
        r["rid"] for r in read_with_dv(data, folded).collect()
    ) == list(range(60, 100))


def test_density_popcounts_per_group(spark):
    data = _data(spark, n=90, fids=3)  # 30 rows per fid
    deleted = data.filter(
        (F.col("fid") == 0) & (F.col("pos") < 6)
    )  # 6 of 30 in fid 0 -> 2000 bp
    dv = dv_build(deleted.select("fid", "pos"))
    counts = data.groupBy("fid").agg(F.count(F.lit(1)).alias("n_rows"))
    dens = {
        r["fid"]: (r["n_deleted"], r["density_bp"])
        for r in dv_density(dv, counts).collect()
    }
    assert dens[0] == (6, 2000)
    assert dens[1] == (0, 0) and dens[2] == (0, 0)  # layout-driven rows


def test_apply_is_broadcast_and_positions_stable(spark):
    from hyppo_worker_spark.plans.explain import formatted_plan

    data = _data(spark)
    dv = dv_build(
        data.filter(F.col("rid") % 3 == 0).select("fid", "pos")
    )
    plan = formatted_plan(read_with_dv(data, dv))
    assert "BroadcastHashJoin" in plan
    # stable_positions: dense 0..n-1 per fid, deterministic order
    pos = stable_positions(
        data.drop("pos"), "fid", "rid", pos_col="pos"
    )
    per_fid = (
        pos.groupBy("fid")
        .agg(
            F.min("pos").alias("lo"),
            F.max("pos").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    for r in per_fid:
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1
