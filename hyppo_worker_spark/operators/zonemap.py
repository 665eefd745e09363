"""Zonemap manifest: file-level min/max statistics collected from the
ACTUAL parquet footers, distributed — manifest-based data skipping
without a table format.

Delta/Iceberg keep per-file column stats in their metadata layer and
prune files before the scan; plain parquet directories have the same
stats sitting in every footer, unread. This operator builds that
metadata layer as a DataFrame:

- **build**: file paths (driver-side listing — file NAMES are planner
  metadata in any engine) are distributed, and each executor reads
  ONLY the footers of its files via pyarrow inside ``mapInPandas`` —
  bytes read per file is KBs regardless of file size, so a 100 TB
  dataset's manifest builds in seconds per thousand files and the
  content is never touched;
- **prune**: a predicate range intersects the manifest (a tiny
  DataFrame — broadcastable, cacheable, incrementally appendable as
  new files land), yielding the file list a scan actually needs;
- read the survivors with ``spark.read.parquet(*files)``.

Composes with `operators.zorder`: a z-clustered layout bounds every
file's extent in each clustered dimension, so the zonemap prunes on
ANY of them (q54 cross-checks the REAL footer stats against the
analytically derived z-bucket extents).

Stats are stringified in the manifest (one schema for all column
types); ``prune_files`` casts both sides for the compare — numeric
casts of numeric-typed parquet stats are exact.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Iterator

import pandas as pd
from hyppo_worker_spark.session import local_frame
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ZONEMAP_SCHEMA = (
    "file string, n_rows long, col string, vmin string, vmax string"
)


def list_parquet_files(path: str) -> list[str]:
    return sorted(
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(f)
    )


def build_zonemap(
    spark: SparkSession, path: str, columns: list[str]
) -> DataFrame:
    """(file, n_rows, col, vmin, vmax) manifest from real footers."""
    files = list_parquet_files(path)
    if not files:
        raise ValueError(f"no parquet files under {path}")
    cols = list(columns)
    paths = local_frame(spark, [(f,) for f in files], "file string").repartition(
        min(len(files), 64)
    )

    def footers(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in it:
            rows = []
            for f in pdf["file"]:
                meta = pq.ParquetFile(f).metadata
                mins: dict[str, object] = {}
                maxs: dict[str, object] = {}
                for rg in range(meta.num_row_groups):
                    g = meta.row_group(rg)
                    for ci in range(g.num_columns):
                        c = g.column(ci)
                        name = c.path_in_schema
                        if name not in cols or c.statistics is None:
                            continue
                        st = c.statistics
                        if name not in mins or st.min < mins[name]:
                            mins[name] = st.min
                        if name not in maxs or st.max > maxs[name]:
                            maxs[name] = st.max
                for c in cols:
                    if c in mins:
                        rows.append(
                            (f, meta.num_rows, c, str(mins[c]), str(maxs[c]))
                        )
            yield pd.DataFrame(
                rows, columns=["file", "n_rows", "col", "vmin", "vmax"]
            )

    return paths.mapInPandas(footers, ZONEMAP_SCHEMA)


def prune_files(
    zonemap: DataFrame,
    col: str,
    lo,
    hi,
    cast: str = "bigint",
) -> DataFrame:
    """Files whose [vmin, vmax] range for ``col`` intersects
    [lo, hi] — the survivors a pruning scan reads. Returns
    (file, n_rows) rows."""
    z = zonemap.filter(F.col("col") == col)
    keep = (F.col("vmax").cast(cast) >= lo) & (F.col("vmin").cast(cast) <= hi)
    return z.filter(keep).select("file", "n_rows")
