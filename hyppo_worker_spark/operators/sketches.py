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


# -- k-minimum-values (KMV) sketch ----------------------------------------
#
# The SET-OPERATIONS sketch (Bar-Yossef et al. 2002; Beyer et al. 2007
# — public algorithms): keep the k smallest hash values of a set.
# Mergeable (union = k smallest of the combined sketches) and, unlike
# HLL, it supports INTERSECTION estimates: the fraction of the merged
# sketch's members that belong to both sets estimates the Jaccard, and
# est(A∩B) = ρ * est(A∪B). With the shared md5 primitive the sketch
# content — and therefore every estimate — is deterministic and
# engine-portable, so oracles reproduce estimates exactly.
#
# Fixed-point estimator: hashes are 52-bit ints h ∈ [0, 2^52); with
# n >= k the k-th smallest hash t estimates n ≈ (k-1) * 2^52 / t,
# computed as ((k-1) << 52) div t — pure integer division. When the
# set has fewer than k distinct hashes the sketch IS the set and the
# estimate is exact by construction.

KMV_BITS = 52


def kmv_hash(key) -> "F.Column":
    """52-bit md5-derived hash — distinct per key, identical in DuckDB
    via ('0x' || substr(md5(k), 1, 13))::BIGINT."""
    from pyspark.sql import functions as F  # noqa: F811

    c = F.col(key) if isinstance(key, str) else key
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 13), 16, 10).cast(
        "bigint"
    )


def kmv_sketch(df: DataFrame, key_col: str, *, k: int = 256) -> DataFrame:
    """The k smallest distinct hash values of df[key_col] — a
    ``(h)`` frame of <= k rows. Scale shape: one distinct shuffle on
    the 8-byte hash, then TakeOrderedAndProject (top-k, no global
    sort materialization)."""
    return (
        df.select(kmv_hash(key_col).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_merge(*sketches: DataFrame, k: int = 256) -> DataFrame:
    """Union sketches: k smallest of the combined hash sets."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct().orderBy("h").limit(k)
