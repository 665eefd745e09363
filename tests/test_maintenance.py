"""Compaction: many small files → few target-sized files, same rows."""

from pyspark.sql import functions as F

from hyppo_worker_spark.operators.maintenance import compact, dataset_file_stats


def test_compact_small_files(spark, tmp_path):
    p = str(tmp_path / "frag.parquet")
    # 64 tiny files
    spark.range(10000).select(
        "id", (F.col("id") % 7).alias("k"), F.rand(1).alias("v")
    ).repartition(64).write.parquet(p)
    before = dataset_file_stats(p)
    assert before["n_files"] >= 64

    total_before = spark.read.parquet(p).count()
    sum_before = spark.read.parquet(p).agg(F.sum("id")).first()[0]

    report = compact(spark, p, target_file_bytes=before["total_bytes"])  # → 1 file
    after = dataset_file_stats(p)
    assert after["n_files"] < before["n_files"]
    assert report["target_partitions"] == 1

    assert spark.read.parquet(p).count() == total_before
    assert spark.read.parquet(p).agg(F.sum("id")).first()[0] == sum_before
