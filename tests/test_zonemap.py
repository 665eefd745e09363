"""Zonemap manifest: footer stats must match the data exactly, pruned
reads must equal full filtered reads, and pruning must actually skip
files on a clustered layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from hyppo_worker_spark.operators.zonemap import (
    build_zonemap,
    list_parquet_files,
    prune_files,
)
from hyppo_worker_spark.operators.zorder import zorder_write


def _write_grid(spark, path: str) -> None:
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "a long, b long")
    zorder_write(df, path, "a", "b", bits=6, file_bits=4)


def test_zonemap_stats_match_data(spark, tmp_path):
    path = str(tmp_path / "z")
    _write_grid(spark, path)
    zm = build_zonemap(spark, path, ["a", "b"]).persist()
    files = list_parquet_files(path)
    assert zm.select("file").distinct().count() == len(files) == 16
    # per-file stats equal the file's true min/max and row count
    for f in files:
        df = spark.read.parquet(f)
        amin, amax, n = df.agg(F.min("a"), F.max("a"), F.count(F.lit(1))).first()
        row = zm.filter((F.col("file") == f) & (F.col("col") == "a")).first()
        assert (int(row.vmin), int(row.vmax), row.n_rows) == (amin, amax, n)


def test_pruned_read_equals_filtered_full_read(spark, tmp_path):
    path = str(tmp_path / "z")
    _write_grid(spark, path)
    zm = build_zonemap(spark, path, ["a", "b"])
    lo, hi = 20, 29
    surv = prune_files(zm, "b", lo, hi)
    files = [r.file for r in surv.collect()]
    # real skipping: a z-layout bounds b per file
    assert 0 < len(files) < 16
    pruned = (
        spark.read.parquet(*files)
        .filter((F.col("b") >= lo) & (F.col("b") <= hi))
    )
    full = (
        spark.read.parquet(path)
        .filter((F.col("b") >= lo) & (F.col("b") <= hi))
        .select("a", "b")
    )
    assert sorted(map(tuple, pruned.select("a", "b").collect())) == sorted(
        map(tuple, full.collect())
    )


def test_prune_is_conservative(spark, tmp_path):
    """A file outside the predicate range must never be a survivor;
    every matching row's file must be one."""
    path = str(tmp_path / "z")
    _write_grid(spark, path)
    zm = build_zonemap(spark, path, ["a"]).persist()
    surv = {r.file for r in prune_files(zm, "a", 0, 7).collect()}
    for f in list_parquet_files(path):
        has = (
            spark.read.parquet(f)
            .filter((F.col("a") >= 0) & (F.col("a") <= 7))
            .count()
        )
        if has:
            assert f in surv
