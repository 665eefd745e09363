"""Count-min sketch as a DataFrame-native counter table.

Spark ships a JVM count_min_sketch aggregate, but its binary blob is
opaque to SQL (no estimate function) and not portable across engines.
This operator keeps the sketch RELATIONAL instead: a (depth, bucket,
count) table of depth*width rows. That representation is

- **mergeable**: sketches of shards/partitions/days combine by
  summing counts per (depth, bucket) — a tiny aggregation, the same
  contract as q44's HLL union;
- **probe-able in-plan**: estimate(key) = min over depth rows of the
  counter at (d, bucket_d(key)) — a broadcast join, no UDF;
- **engine-portable**: bucket placement is the shared md5_bucket
  primitive, so a DuckDB oracle reproduces every counter and estimate
  bit-for-bit (estimates are DETERMINISTIC given the hash family —
  the classic eps/delta guarantee still holds per Cormode &
  Muthukrishnan 2005, a public algorithm).

Scale shape: counters are built from the per-key count table (one
corpus-scale shuffle keyed by the key — distinct keys << occurrences),
then a depth-way fan-out of NARROW (d, bucket, cnt) rows feeds a
groupBy over at most depth*width groups. The finished sketch is
depth*width rows regardless of corpus size — it broadcasts anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hyppo_worker_spark.functions import text as TX


def cms_bucket_pairs(
    keyed: DataFrame, key_col: str, *, depth: int, width: int
) -> DataFrame:
    """Explode each key row into ``depth`` (d, bucket) rows, carrying
    every other column through. Bucket_d(key) = md5_bucket('d:key') —
    independent hash per row of the sketch."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                TX.md5_bucket(
                    F.concat(F.lit(f"{d}:"), F.col(key_col).cast("string")), width
                ).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    other = [c for c in keyed.columns]
    return keyed.select(*other, F.explode(pairs).alias("db")).select(
        *other, F.col("db.d").alias("d"), F.col("db.bucket").alias("bucket")
    )


def cms_counters(
    keyed_counts: DataFrame,
    key_col: str,
    count_col: str,
    *,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Build the (d, bucket, c) counter table from a per-key count
    frame. Merging sketches of disjoint shards = unionByName +
    groupBy(d, bucket).sum(c) — see ``merge_counters``."""
    return (
        cms_bucket_pairs(keyed_counts, key_col, depth=depth, width=width)
        .groupBy("d", "bucket")
        .agg(F.sum(count_col).cast("long").alias("c"))
    )


def merge_counters(*counter_tables: DataFrame) -> DataFrame:
    """Union shard-level counter tables into one sketch (counts add)."""
    out = counter_tables[0]
    for t in counter_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("d", "bucket").agg(F.sum("c").cast("long").alias("c"))


def cms_estimate(
    counters: DataFrame,
    probes: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-query the sketch for every probe row: join the probes'
    (d, bucket) pairs to the BROADCAST counter table, min over depth.
    A (d, bucket) cell no probe key hashed into simply never joins;
    a missing cell for a probed key cannot happen (its own inserts
    created the cell), so the min is always over ``depth`` rows."""
    pairs = cms_bucket_pairs(probes, key_col, depth=depth, width=width)
    carried = [c for c in probes.columns]
    return (
        pairs.join(F.broadcast(counters), ["d", "bucket"])
        .groupBy(*carried)
        .agg(F.min("c").alias("est"))
    )
