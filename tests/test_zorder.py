"""Z-order clustering: the Morton code must interleave bits exactly
(checked against a python-int reference), and a zorder_write layout
must bound every file's extent in BOTH dimensions — verified from the
actual parquet footers, not from the plan."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from hyppo_worker_spark.operators.zorder import (
    scale_to_bits,
    zfile_id,
    zorder_write,
    zvalue,
)


def _morton_ref(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_python_reference(spark):
    rows = [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 23)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zvalue(F.col("x"), F.col("y"), 8).alias("z")).collect()
    }
    for (x, y), z in got.items():
        assert z == _morton_ref(x, y, 8)


def test_scale_to_bits_covers_range(spark):
    df = spark.createDataFrame([(v,) for v in range(1000, 2001)], "v long")
    mm = df.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    s = df.crossJoin(F.broadcast(mm)).select(
        scale_to_bits(F.col("v"), F.col("lo"), F.col("hi"), 8).alias("s")
    )
    lo, hi = s.agg(F.min("s"), F.max("s")).first()
    assert (lo, hi) == (0, 255)
    # constant column: span clamps to 1, everything scales to 0
    c = spark.createDataFrame([(7,), (7,)], "v long")
    mmc = c.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    sc = c.crossJoin(F.broadcast(mmc)).select(
        scale_to_bits(F.col("v"), F.col("lo"), F.col("hi"), 8).alias("s")
    )
    assert [r.s for r in sc.collect()] == [0, 0]


def test_scale_to_bits_exact_above_2_53(spark):
    """ADVICE r5: the numerator ``(v-vmin)*(2^bits-1)`` may exceed 2^53
    within the documented domain bound; any hop through DOUBLE rounds
    it and the quotient can come out one low. Pin value-for-value
    equality with Python's integer ``//`` on microsecond-epoch-scale
    spans."""
    vmin, vmax = 0, (1 << 55) + 7919  # span*(2^8-1) ~ 2^63 bound edge
    vals = [vmin, 1, (1 << 53) + 1, (1 << 54) + 12345, vmax - 1, vmax]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = [
        r.s
        for r in df.select(
            scale_to_bits(F.col("v"), F.lit(vmin), F.lit(vmax), 8).alias("s")
        ).collect()
    ]
    span = vmax - vmin
    want = [((v - vmin) * 255) // span for v in vals]
    assert got == want


def test_zfile_extents_bound_both_dims(spark, tmp_path):
    """Write a 2-d uniform grid z-clustered into 16 files and check —
    from the parquet footers — that every file's extent covers at most
    ~1/4 of EACH dimension (a single-key sort would give full-range
    extents in the second dimension)."""
    path = str(tmp_path / "zout")
    rows = [(x, y) for x in range(128) for y in range(128)]
    df = spark.createDataFrame(rows, "a long, b long")
    zorder_write(df, path, "a", "b", bits=7, file_bits=4)

    parts = sorted(d for d in os.listdir(path) if d.startswith("zfile="))
    assert len(parts) == 16
    for d in parts:
        files = [
            f
            for f in os.listdir(os.path.join(path, d))
            if f.endswith(".parquet")
        ]
        assert files
        amin = bmin = 1 << 60
        amax = bmax = -(1 << 60)
        for f in files:
            meta = pq.ParquetFile(os.path.join(path, d, f)).metadata
            for rg in range(meta.num_row_groups):
                g = meta.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema
                    st = col.statistics
                    if name == "a":
                        amin, amax = min(amin, st.min), max(amax, st.max)
                    elif name == "b":
                        bmin, bmax = min(bmin, st.min), max(bmax, st.max)
        # top-4-bits-of-z buckets tile the 128x128 grid into 32x64
        # rectangles: extents are bounded in BOTH dims
        assert amax - amin <= 63
        assert bmax - bmin <= 63

    # and the deterministic file id is the top bits of z — spot-check
    # via the operator's own columns
    one = spark.createDataFrame([(0, 0), (127, 127)], "a long, b long")
    mm = one.agg(
        F.min("a").alias("xmin"), F.max("a").alias("xmax"),
        F.min("b").alias("ymin"), F.max("b").alias("ymax"),
    )
    z = one.crossJoin(F.broadcast(mm)).select(
        zfile_id(
            zvalue(
                scale_to_bits(F.col("a"), F.col("xmin"), F.col("xmax"), 7),
                scale_to_bits(F.col("b"), F.col("ymin"), F.col("ymax"), 7),
                7,
            ),
            bits=7,
            file_bits=4,
        ).alias("fid")
    )
    fids = sorted(r.fid for r in z.collect())
    assert fids == [0, 15]  # corners land in the first and last file


def test_second_dim_pruning_beats_single_key_sort(spark, tmp_path):
    """The measurable win: fraction of files a min-max scan on the
    SECOND dimension must read. Single-key layout reads all of them;
    z-order reads a bounded subset."""
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "l")
    rows = [(x, y) for x in range(128) for y in range(128)]
    df = spark.createDataFrame(rows, "a long, b long")
    zorder_write(df, zpath, "a", "b", bits=7, file_bits=4)
    # single-key clustering: 16 files by the top bits of a alone
    (
        df.withColumn("zfile", F.shiftright(F.col("a").cast("long"), 3))
        .repartition("zfile")
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .partitionBy("zfile")
        .parquet(lpath)
    )

    def surviving(path: str, lo: int, hi: int) -> int:
        n = 0
        for d in os.listdir(path):
            if not d.startswith("zfile="):
                continue
            bmin = 1 << 60
            bmax = -(1 << 60)
            for f in os.listdir(os.path.join(path, d)):
                if not f.endswith(".parquet"):
                    continue
                meta = pq.ParquetFile(os.path.join(path, d, f)).metadata
                for rg in range(meta.num_row_groups):
                    g = meta.row_group(rg)
                    for ci in range(g.num_columns):
                        col = g.column(ci)
                        if col.path_in_schema == "b":
                            st = col.statistics
                            bmin = min(bmin, st.min)
                            bmax = max(bmax, st.max)
            if bmax >= lo and bmin <= hi:
                n += 1
        return n

    assert surviving(lpath, 40, 49) == 16  # single-key: read everything
    assert surviving(zpath, 40, 49) <= 8  # z-order: at most half
